// VERDICT r14 #1 probe leg: dump the INNER executed plan that
// materializes pl_dedup_apply_incr's pair mining (the returned frame is
// a flat LogicalRDD since r13 — the inner execution is the plan under
// adjudication) plus the outer frame's plan. Runs the query once at
// EXPL_SF (default /tmp/graft_sf1). Works on both sides of the diff:
// the r15 build exposes Dedup.innerExecutionsFor, the r13 checkout the
// lastInnerExecution slot — resolved reflectively.
//   EXPL_SF=/tmp/graft_sf1 EXPL_OUT=/root/repo/bench_out/expl_r15.txt \
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 32g \
//     --conf spark.driver.extraClassPath=<classes> \
//     --conf spark.sql.shuffle.partitions=32 -I scripts/explain_incr_r15.scala
val sf = sys.env.getOrElse("EXPL_SF", "/tmp/graft_sf1")
val outPath = sys.env.getOrElse("EXPL_OUT", "/tmp/expl_incr.txt")
val df = graft.SparkEntry.queries("pl_dedup_apply_incr")(spark, sf)
val dedup = graft.operators.Dedup
val inner: String = {
  val cls = dedup.getClass
  val viaMap = scala.util.Try {
    val m = cls.getMethod("innerExecutionsFor", classOf[org.apache.spark.sql.DataFrame])
    m.invoke(dedup, df).asInstanceOf[Seq[org.apache.spark.sql.execution.QueryExecution]]
      .map(_.executedPlan.toString).mkString("\n=== next inner ===\n")
  }
  val viaSlot = scala.util.Try {
    val m = cls.getMethod("lastInnerExecution")
    m.invoke(dedup).asInstanceOf[Option[org.apache.spark.sql.execution.QueryExecution]]
      .map(_.executedPlan.toString).getOrElse("<empty slot>")
  }
  viaMap.orElse(viaSlot).getOrElse("<no inner-execution API>")
}
val outer = df.queryExecution.executedPlan.toString
val w = new java.io.PrintWriter(outPath, "UTF-8")
w.println("=== INNER (pair mining) executed plan ===")
w.println(inner)
w.println("=== OUTER executed plan ===")
w.println(outer)
w.close()
println(s"EXPLAIN_DUMP $outPath")
sys.exit(0)
