package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Differential-fuzz runner: executes arbitrary dialect SQL read from a
  * TSV (`name<TAB>sql` per line) through GraftSession against the sfDir
  * tables, dumping each result + `oracle_sql.json` in the exact layout
  * [[Verify]] uses — so `scripts/verify_local.py` replays the same
  * statements in DuckDB and compares bit-exact. Driven by
  * `scripts/fuzz_differential.py`, which generates seeded random
  * queries over the parity-safe grammar (r12). */
object SqlRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val tsv = args(1); val outDir = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val gs = new graft.engine.GraftSession(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => gs.registerLazy(t, () => graft.Tables(spark, sfDir, t)))
    // name<TAB>engineSql[<TAB>oracleSql] — a distinct oracle rendering
    // lets the fuzzer hand DuckDB an ANSI-equivalent FORMULATION of the
    // same query (e.g. quantified comparisons as CASE/EXISTS) when the
    // oracle engine's native form is unreliable
    val rows = Files.readAllLines(Paths.get(tsv)).asScala.toSeq
      .filter(_.nonEmpty).map { l =>
        l.split('\t') match {
          case Array(n, e)    => (n, e, e)
          case Array(n, e, o) => (n, e, o)
          case _ => throw new IllegalArgumentException(s"bad tsv line: $l")
        }
      }
    var failed = 0
    rows.foreach { case (name, sql, _) =>
      // sqlScript: a `;`-separated case (DDL + DML + final SELECT, the
      // r15 DML/MERGE fuzz family) runs statement by statement and the
      // LAST statement's frame is what lands in the parquet; a plain
      // single-statement case behaves exactly as before
      try gs.sqlScript(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[sqlrun] $name failed: ${e.getMessage}")
      }
    }
    val pairs = rows.map { case (n, _, o) => (n, o) }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      pairs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    println(s"[sqlrun] ${pairs.size - failed}/${pairs.size} executed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
