package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType
import scala.collection.concurrent.TrieMap

/** Function registry — the user-extension surface mirroring the
  * reference's `expr.FuncAdd(name, CustomFunc)`
  * (/root/reference/expr/funcs.go:84). Builtins self-register from
  * [[graft.functions.Builtins]]; users add their own with [[add]] /
  * [[addRaw]]. Builders return pure Columns (no serialized UDF cost)
  * unless a semantic genuinely needs a UDF.
  */
object FuncRegistry {

  /** Raw builder: gets the build context and un-built argument nodes so
    * schema-aware functions (len, match, filter) can dispatch on type. */
  type RawBuilder = (BuildCtx, Seq[Node]) => Column

  final case class Entry(
      build: RawBuilder,
      isAgg: Boolean = false,
      returnType: Option[DataType] = None)

  private val entries = TrieMap.empty[String, Entry]

  /** Simple registration: function of built argument Columns. */
  def add(name: String, isAgg: Boolean = false, returnType: Option[DataType] = None)(
      f: Seq[Column] => Column): Unit =
    entries.put(name.toLowerCase, Entry(
      (ctx, args) => f(args.map(ColumnBuilder.build(_, ctx))), isAgg, returnType))

  /** Schema-/AST-aware registration. */
  def addRaw(name: String, isAgg: Boolean = false, returnType: Option[DataType] = None)(
      f: RawBuilder): Unit =
    entries.put(name.toLowerCase, Entry(f, isAgg, returnType))

  def contains(name: String): Boolean = { ensureLoaded(); entries.contains(name.toLowerCase) }

  def isAgg(name: String): Boolean =
    { ensureLoaded(); entries.get(name.toLowerCase).exists(_.isAgg) }

  def build(name: String, args: Seq[Node], ctx: BuildCtx): Column = {
    ensureLoaded()
    entries.get(name.toLowerCase) match {
      case Some(e) => e.build(ctx, args)
      case None => throw BuildException(s"unknown function '$name'")
    }
  }

  def returnType(name: String, args: Seq[Node], ctx: BuildCtx): Option[DataType] =
    { ensureLoaded(); entries.get(name.toLowerCase).flatMap(_.returnType) }

  @volatile private var loaded = false
  private def ensureLoaded(): Unit = if (!loaded) synchronized {
    if (!loaded) { graft.functions.Builtins.register(); loaded = true }
  }
}
