package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative cross-check of the subquery LOWERINGS against a
  * driver-side BRUTE-FORCE ANSI reference: random small tables with
  * NULLs and duplicate keys, random comparison operators and
  * quantifiers — the engine's rewrite (per-key bounded aggregates +
  * joins) must agree row-for-row with a nested-loop three-valued-logic
  * evaluation written independently here. This is the adversarial gate
  * for exactly the NULL / empty-slice / duplicate-key edges
  * hand-written cases miss (the r11 `<> ANY` NULL-left bug class).
  */
class SubqueryPropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def check(prop: Prop, name: String, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  private type Tbl = List[(Long, Option[Int], Option[Int])] // (id, k, v)

  private val rowsGen: Gen[Tbl] =
    Gen.choose(0, 10).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.frequency(5 -> Gen.some(Gen.choose(0, 2)), 1 -> Gen.const(None))
        v <- Gen.frequency(5 -> Gen.some(Gen.choose(-2, 2)), 1 -> Gen.const(None))
      } yield (k, v))
    }.map(_.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) })

  private def session(outer: Tbl, inner: Tbl): graft.engine.GraftSession = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("k", IntegerType), StructField("v", IntegerType)))
    def df(rows: Tbl) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, k, v) =>
        Row(i, k.map(Integer.valueOf).orNull, v.map(Integer.valueOf).orNull)
      }: _*), schema)
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("pt", df(outer))
    gs.registerTable("pu", df(inner))
    gs
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  // ---- the independent reference: nested-loop + ANSI 3VL -------------

  private def cmp2(op: String, a: Int, b: Int): Boolean = op match {
    case ">" => a > b;  case ">=" => a >= b
    case "<" => a < b;  case "<=" => a <= b
    case "=" => a == b; case "!=" => a != b
  }
  /** x <op> v in three-valued logic (None = UNKNOWN). */
  private def cmp3(op: String, x: Option[Int], v: Option[Int]): Option[Boolean] =
    for { a <- x; b <- v } yield cmp2(op, a, b)
  /** ANY/ALL fold per ANSI: ANY = OR over the set (empty → FALSE),
    * ALL = AND over the set (empty → TRUE), UNKNOWN absorbs per 3VL. */
  private def quant3(op: String, q: String, x: Option[Int],
      set: Seq[Option[Int]]): Option[Boolean] = {
    val vs = set.map(cmp3(op, x, _))
    if (q == "ANY") {
      if (vs.contains(Some(true))) Some(true)
      else if (vs.contains(None)) None
      else Some(false)
    } else {
      if (vs.contains(Some(false))) Some(false)
      else if (vs.contains(None)) None
      else Some(true)
    }
  }
  /** The correlated slice: inner rows whose k equals the outer k
    * (NULL keys never match — the correlation conjunct is 3VL too). */
  private def slice(inner: Tbl, ok: Option[Int]): Tbl =
    ok.map(o => inner.filter(_._2.contains(o))).getOrElse(Nil)

  test("correlated AND uncorrelated quantified ANY/ALL vs brute-force ANSI") {
    // shape "plain": the raw values; "agg": a bare max(v) — ANSI gives
    // EVERY (outer row ×) evaluation exactly ONE aggregate row, even an
    // empty slice (max→NULL), so the set is a singleton; "grouped":
    // max(v) GROUP BY id % 2 — per-group rows, empty slice → EMPTY set
    def maxOpt(rows: Tbl): Option[Int] = {
      val vs = rows.flatMap(_._3)
      if (vs.isEmpty) None else Some(vs.max)
    }
    def theSet(shape: String, rows: Tbl, isCorr: Boolean): Seq[Option[Int]] =
      shape match {
        case "plain" => rows.map(_._3)
        case "agg" => Seq(maxOpt(rows)) // singleton, even when rows empty
        case "grouped" =>
          if (rows.isEmpty && isCorr) Nil
          else if (rows.isEmpty) Nil
          else rows.groupBy(_._1 % 2).values.map(maxOpt).toSeq
      }
    val ops = Gen.oneOf(">", ">=", "<", "<=", "=", "!=")
    val quants = Gen.oneOf("ANY", "ALL")
    val corr = Gen.oneOf(true, false)
    val shapes = Gen.oneOf("plain", "agg", "grouped")
    val prop = Prop.forAll(rowsGen, rowsGen, ops, quants, corr, shapes) {
      (o, u, op, q, isCorr, shape) =>
      val gs = session(o, u)
      val sel = shape match {
        case "plain" => "SELECT v FROM pu"
        case "agg" => "SELECT max(v) FROM pu"
        case "grouped" => "SELECT max(v) FROM pu"
      }
      val whereC = if (isCorr) " WHERE pu.k = pt.k" else ""
      val groupC = if (shape == "grouped") " GROUP BY id % 2" else ""
      val sql = s"SELECT id FROM pt WHERE v $op $q ($sel$whereC$groupC)"
      val engine = ids(gs.sql(sql))
      val expected = o.collect { case (id, k, x)
        if quant3(op, q, x,
          theSet(shape, if (isCorr) slice(u, k) else u, isCorr)).contains(true) => id }
      val same = engine == expected
      if (!same) println(s"MISMATCH $sql\n outer=$o\n inner=$u\n engine=$engine expected=$expected")
      same
    }
    check(prop, "quantified ANY/ALL", n = 80)
  }

  test("correlated IN / aggregate-IN / grouped-EXISTS vs brute-force ANSI") {
    val prop = Prop.forAll(rowsGen, rowsGen, Gen.choose(0, 3)) { (o, u, bar) =>
      val gs = session(o, u)
      // plain correlated IN (3VL membership over the slice)
      val inSql = "SELECT id FROM pt WHERE v IN (SELECT v FROM pu WHERE pu.k = pt.k)"
      val inExp = o.collect { case (id, k, x)
        if quant3("=", "ANY", x, slice(u, k).map(_._3)).contains(true) => id }
      // ANSI NOT IN ≡ <> ALL: UNKNOWN (NULL in slice / NULL x) drops
      val ninSql = "SELECT id FROM pt WHERE v NOT IN (SELECT v FROM pu WHERE pu.k = pt.k)"
      val ninExp = o.collect { case (id, k, x)
        if quant3("!=", "ALL", x, slice(u, k).map(_._3)).contains(true) => id }
      val ninuSql = "SELECT id FROM pt WHERE v NOT IN (SELECT v FROM pu)"
      val ninuExp = o.collect { case (id, _, x)
        if quant3("!=", "ALL", x, u.map(_._3)).contains(true) => id }
      // aggregate-valued IN without GROUP BY: one max per slice —
      // ANSI's single aggregate row; max over empty/all-NULL is NULL
      val aggSql = "SELECT id FROM pt WHERE v IN (SELECT max(v) FROM pu WHERE pu.k = pt.k)"
      val aggExp = o.collect { case (id, k, x)
        if {
          val vs = slice(u, k).flatMap(_._3)
          val mx = if (vs.isEmpty) None else Some(vs.max)
          quant3("=", "ANY", x, Seq(mx)).contains(true)
        } => id }
      // EXISTS … HAVING count(*) >= bar without GROUP BY: ANSI gives
      // the EMPTY slice an aggregate row too (count 0 — the COUNT bug)
      val exSql = s"SELECT id FROM pt WHERE EXISTS (SELECT 1 FROM pu WHERE pu.k = pt.k HAVING count(*) >= $bar)"
      val exExp = o.collect { case (id, k, _) if slice(u, k).size >= bar => id }
      val nexSql = s"SELECT id FROM pt WHERE NOT EXISTS (SELECT 1 FROM pu WHERE pu.k = pt.k HAVING count(*) >= $bar)"
      val nexExp = o.collect { case (id, k, _) if !(slice(u, k).size >= bar) => id }
      Seq((inSql, inExp), (ninSql, ninExp), (ninuSql, ninuExp),
        (aggSql, aggExp), (exSql, exExp), (nexSql, nexExp))
        .forall { case (sql, expected) =>
          val engine = ids(gs.sql(sql))
          val same = engine == expected
          if (!same) println(s"MISMATCH $sql\n outer=$o\n inner=$u\n engine=$engine expected=$expected")
          same
        }
    }
    check(prop, "IN / EXISTS shapes", n = 15)
  }

  test("boolean-position subqueries (projected / under OR) vs brute-force ANSI") {
    // the r12 expression-position lowering must agree with nested-loop
    // 3VL exactly — including the PROJECTED verdict (TRUE/FALSE/NULL
    // land in the output, not just in a filter) and OR-disjuncts where
    // UNKNOWN must not be rescued into TRUE
    def bools(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Boolean]] =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    def or3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      if (a.contains(true) || b.contains(true)) Some(true)
      else if (a.isEmpty || b.isEmpty) None
      else Some(false)
    val prop = Prop.forAll(rowsGen, rowsGen, Gen.choose(-1, 2)) { (o, u, bar) =>
      val gs = session(o, u)
      // projected correlated IN: the 3VL verdict is the output value
      val pin = bools(gs.sql(
        "SELECT id, v IN (SELECT v FROM pu WHERE pu.k = pt.k) AS m FROM pt"))
      val pinExp = o.map { case (id, k, x) =>
        id -> quant3("=", "ANY", x, slice(u, k).map(_._3)) }.toMap
      // projected uncorrelated NOT IN
      val pnin = bools(gs.sql(
        "SELECT id, v NOT IN (SELECT v FROM pu) AS m FROM pt"))
      val pninExp = o.map { case (id, _, x) =>
        id -> quant3("!=", "ALL", x, u.map(_._3)) }.toMap
      // projected correlated EXISTS (two-valued by definition)
      val pex = bools(gs.sql(
        "SELECT id, EXISTS (SELECT 1 FROM pu WHERE pu.k = pt.k) AS m FROM pt"))
      val pexExp = o.map { case (id, k, _) =>
        id -> Some(slice(u, k).nonEmpty) }.toMap
      // IN under OR in WHERE: UNKNOWN OR FALSE stays UNKNOWN → drop
      val orIds = ids(gs.sql(
        s"SELECT id FROM pt WHERE v IN (SELECT v FROM pu WHERE pu.k = pt.k) OR v > $bar"))
      val orExp = o.collect { case (id, k, x)
        if or3(quant3("=", "ANY", x, slice(u, k).map(_._3)),
               cmp3(">", x, Some(bar))).contains(true) => id }
      // NOT IN under OR (uncorrelated)
      val norIds = ids(gs.sql(
        s"SELECT id FROM pt WHERE v NOT IN (SELECT v FROM pu) OR v > $bar"))
      val norExp = o.collect { case (id, _, x)
        if or3(quant3("!=", "ALL", x, u.map(_._3)),
               cmp3(">", x, Some(bar))).contains(true) => id }
      val checks = Seq[(String, Any, Any)](
        ("projected IN", pin, pinExp), ("projected NOT IN", pnin, pninExp),
        ("projected EXISTS", pex, pexExp),
        ("IN under OR", orIds, orExp), ("NOT IN under OR", norIds, norExp))
      checks.forall { case (name, got, want) =>
        val same = got == want
        if (!same) println(s"MISMATCH $name\n outer=$o\n inner=$u\n engine=$got expected=$want")
        same
      }
    }
    check(prop, "boolean-position subqueries", n = 15)
  }

  test("projected quantified ANY/ALL verdicts vs brute-force ANSI 3VL") {
    // the quantified VALUE lowering must give the exact 3VL verdict —
    // the WHERE-conjunct guards may collapse UNKNOWN→FALSE (both drop
    // under a filter), but a projected verdict may not
    def bools(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Boolean]] =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    def maxOpt(rows: Tbl): Option[Int] = {
      val vs = rows.flatMap(_._3)
      if (vs.isEmpty) None else Some(vs.max)
    }
    def theSet(shape: String, rows: Tbl): Seq[Option[Int]] = shape match {
      case "plain" => rows.map(_._3)
      case "agg" => Seq(maxOpt(rows))
      case "grouped" =>
        if (rows.isEmpty) Nil else rows.groupBy(_._1 % 2).values.map(maxOpt).toSeq
    }
    val ops = Gen.oneOf(">", ">=", "<", "<=", "=", "!=")
    val quants = Gen.oneOf("ANY", "ALL")
    val corr = Gen.oneOf(true, false)
    val shapes = Gen.oneOf("plain", "agg", "grouped")
    val prop = Prop.forAll(rowsGen, rowsGen, ops, quants, corr, shapes) {
      (o, u, op, q, isCorr, shape) =>
      val gs = session(o, u)
      val selPart = if (shape == "plain") "SELECT v FROM pu" else "SELECT max(v) FROM pu"
      val whereC = if (isCorr) " WHERE pu.k = pt.k" else ""
      val groupC = if (shape == "grouped") " GROUP BY id % 2" else ""
      val sql = s"SELECT id, v $op $q ($selPart$whereC$groupC) AS m FROM pt"
      val got = bools(gs.sql(sql))
      val want = o.map { case (id, k, x) =>
        id -> quant3(op, q, x, theSet(shape, if (isCorr) slice(u, k) else u)) }.toMap
      val same = got == want
      if (!same) println(s"MISMATCH $sql\n outer=$o\n inner=$u\n engine=$got expected=$want")
      same
    }
    check(prop, "projected quantified", n = 80)
  }
}
