// Depth-200 recursion smoke (r12, VERDICT r11 demand #1): per-iteration
// wall time of WITH RECURSIVE must be FLAT in depth — the r11
// implementation's `except(result)` scanned an O(iters) union chain and
// its checkpoint blocks outlived the query, so per-iteration cost grew
// and warm reps swung 4→23 s. Run via:
//   spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=8 -I scripts/recursion_depth_smoke.scala
// Output committed to bench_out/recursion_depth200.txt.
val gs = new graft.engine.GraftSession(spark)
gs.sql("SET @@max_recursion = 300")

// UNION ALL series (no dedup): the plain iteration-cost floor
def series(depth: Int): Double = {
  val t0 = System.nanoTime()
  val n = gs.sql(s"""WITH RECURSIVE s(i) AS (
    SELECT 1 UNION ALL SELECT i + 1 FROM s WHERE i < $depth)
    SELECT count(*) AS n FROM s""").collect()(0).getLong(0)
  assert(n == depth, s"expected $depth rows, got $n")
  (System.nanoTime() - t0) / 1e9
}
// UNION (distinct) cycle: every round anti-joins the frontier against
// the accumulated result — the compaction-sensitive shape
def cycle(depth: Int): Double = {
  val t0 = System.nanoTime()
  val n = gs.sql(s"""WITH RECURSIVE c(i) AS (
    SELECT 0 UNION SELECT (i + 1) % $depth FROM c)
    SELECT count(*) AS n FROM c""").collect()(0).getLong(0)
  assert(n == depth, s"expected $depth rows, got $n")
  (System.nanoTime() - t0) / 1e9
}

series(10); cycle(10) // warm: codegen + first-query session setup

val depths = Seq(50, 100, 200)
println(f"${"depth"}%8s ${"all_sec"}%10s ${"all_ms/it"}%10s ${"dist_sec"}%10s ${"dist_ms/it"}%11s")
val rows = depths.map { d =>
  val a = series(d); val c = cycle(d)
  println(f"$d%8d $a%10.2f ${a / d * 1000}%10.1f $c%10.2f ${c / d * 1000}%11.1f")
  (d, a, c)
}
// flatness gate: per-iteration cost at depth 200 within 2x of depth 50
val (aPerIt50, aPerIt200) = (rows.head._2 / 50, rows.last._2 / 200)
val (cPerIt50, cPerIt200) = (rows.head._3 / 50, rows.last._3 / 200)
println(f"UNION ALL  per-iter ratio d200/d50: ${aPerIt200 / aPerIt50}%.2f (gate <= 2)")
println(f"UNION dist per-iter ratio d200/d50: ${cPerIt200 / cPerIt50}%.2f (gate <= 2)")
assert(aPerIt200 <= 2 * aPerIt50, "UNION ALL per-iteration time is not flat")
assert(cPerIt200 <= 2 * cPerIt50, "UNION distinct per-iteration time is not flat")
println("RECURSION_SMOKE_OK")
System.exit(0)
