package graft

import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession

/** SQL/FilterQL CLI — the engine's `database/sql`-driver analog
  * (/root/reference/exec/sqldriver.go; SURVEY §3.1).
  *
  * Usage: runMain graft.QL "<statement>" [sfDir]
  * Registers the driver fixture tables from sfDir (default sf0.001)
  * and executes the statement through GraftSession.
  */
object QL {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QL <sql> [sfDir]")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val gs = new GraftSession(spark)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
        .foreach(t => gs.registerLazy(t, () => Tables(spark, sfDir, t)))
      gs.sql(args(0)).show(20, truncate = false)
    } finally spark.stop()
  }
}
