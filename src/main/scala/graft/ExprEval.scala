package graft

import org.apache.spark.sql.SparkSession
import graft.expr.{BuildCtx, ColumnBuilder, ExprParser}

/** Standalone expression evaluation CLI — the Spark-native analog of the
  * reference's `expr.MustParse` + `vm.Eval` entry point
  * (/root/reference/vm/vm.go:42-44; SURVEY §3.2).
  *
  * Usage: runMain graft.ExprEval "<expression>" [parquetPath]
  *   - with a parquet path: evaluates the expression as a derived column
  *     over the table and shows the first rows
  *   - without: evaluates against a literal single-row context
  */
object ExprEval {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExprEval <expression> [parquetPath]")
    val exprText = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val node = ExprParser.parse(exprText)
      val df = args.lift(1) match {
        case Some(path) => spark.read.parquet(path)
        case None => spark.range(1).toDF("_row")
      }
      val ctx = BuildCtx(schema = Some(df.schema))
      val out = df.select(ColumnBuilder.build(node, ctx).as("result"))
      println(s"parsed: ${node.text}")
      out.show(10, truncate = false)
    } finally spark.stop()
  }
}
