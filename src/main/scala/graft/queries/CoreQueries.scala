package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.{exactSum, r4}

/** One named query per core operator from SURVEY.md §2 (scans,
  * projections, filters, joins, aggregation, sort/limit, scalar
  * functions), each with a DuckDB-equivalent oracle SQL.
  *
  * Scale notes (the queries run at sf0.01 for correctness but are
  * written for a 1000-executor / 100 TB cluster):
  *  - dimension tables (region/nation/supplier) are broadcast — no
  *    shuffle of the fact side for those joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once
  *    and reuse that partitioning for the following aggregation where
  *    possible;
  *  - every aggregate is a hash aggregate with map-side partial
  *    aggregation (Spark default) — no row explosion crosses the wire;
  *  - all filters/projections are plain Column exprs so they reach the
  *    parquet scan (PushedFilters / ReadSchema) and stay inside
  *    whole-stage codegen.
  *
  * Results are deterministically ordered and doubles are rounded to 4
  * decimals on BOTH sides so the driver's hash compare is stable.
  */
object CoreQueries {

  type QFn = (SparkSession, String) => DataFrame

  case class Q(fn: QFn, oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Map[String, Q] = Map(
    // ---- aggregation -------------------------------------------------
    // TPC-H Q1 shape: hash agg over the whole fact table, partial+final.
    // Mirrors reference GroupBy (exec/groupby.go:37-177) sum/avg/count.
    "q1_agg" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            r4(sum("l_quantity")).as("sum_qty"),
            r4(exactSum(col("l_extendedprice"))).as("sum_base_price"),
            r4(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
            r4(avg("l_quantity")).as("avg_qty"),
            r4(avg("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity),4) AS sum_qty,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE),4) AS sum_base_price,
             |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS DOUBLE),4) AS sum_disc_price,
             |  round(avg(l_quantity),4) AS avg_qty,
             |  round(avg(l_extendedprice),4) AS avg_price,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- filter + projection (pushdown) ------------------------------
    // WHERE filter (exec/where.go:87-147) + projection (exec/projection.go).
    "q2_filter_proj" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
                  col("l_discount") > 0.06 && col("l_quantity") < 5)
          .select(col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice*(1-l_discount),4) AS net_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.06 AND l_quantity < 5
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- joins -------------------------------------------------------
    // Fact⋈fact equi-join + agg + top-k. orders/customer join shuffles on
    // the key; customer is small relative to lineitem → broadcast at sf,
    // but written unhinted so AQE picks broadcast vs shuffle by stats.
    "q3_join_topk" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
        c.filter(col("c_mktsegment") === "BUILDING")
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
          .agg(r4(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
             |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS DOUBLE),4) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Semi join = WHERE IN (SELECT …) — parsed-but-unimplemented in the
    // reference (plan/planner_select.go:95-98); Spark left_semi is free.
    "q4_semi_join" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val li = t(s, d, "lineitem")
        o.join(li.filter(col("l_quantity") > 49).select("l_orderkey"),
               col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Star join: broadcast the tiny dims (region, nation) explicitly —
    // at 100 TB these stay < broadcast threshold while customer/orders/
    // lineitem shuffle on their keys.
    "q5_star_join" -> Q(
      (s, d) => {
        val r = t(s, d, "region"); val n = t(s, d, "nation"); val c = t(s, d, "customer")
        val o = t(s, d, "orders"); val li = t(s, d, "lineitem")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(r4(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
             |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS DOUBLE),4) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Global aggregate without GROUP BY (rel/sql.go:1141-1143 isAgg).
    "q6_global_agg" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(r4(exactSum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
             count(lit(1)).as("n")),
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(38,8))) AS DOUBLE),4) AS revenue, count(*) AS n
             |FROM lineitem
             |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)),

    // SELECT DISTINCT (rel/sql.go:89; no exec operator in reference).
    "q7_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // COUNT(DISTINCT) — broken (returns 0) in the reference, issue #56;
    // implemented correctly here (SURVEY §2.4 divergence note).
    "q8_count_distinct" -> Q(
      (s, d) => t(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             countDistinct(col("l_returnflag")).as("n_flags")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(DISTINCT l_returnflag) AS n_flags FROM lineitem""".stripMargin)),

    // ORDER BY + LIMIT = distributed top-k (Spark TakeOrderedAndProject:
    // per-partition heap, no full sort at 100 TB).
    "q9_topk" -> Q(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), r4(col("o_totalprice")).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20),
      Some("""SELECT o_orderkey, round(o_totalprice,4) AS o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // HAVING (exec/where.go:78-85 post-agg filter).
    "q10_having" -> Q(
      (s, d) => t(s, d, "customer")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"), r4(avg("c_acctbal")).as("avg_bal"))
        .filter(col("n") > 5)
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, count(*) AS n, round(avg(c_acctbal),4) AS avg_bal
             |FROM customer GROUP BY c_nationkey HAVING count(*) > 5
             |ORDER BY c_nationkey""".stripMargin)),

    // Anti join (NOT IN) — customers with no orders.
    "q11_anti_join" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    // LEFT OUTER join — parsed in the reference but silently executed as
    // inner (exec/join.go:237-251); implemented correctly here.
    "q12_left_join" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val li = t(s, d, "lineitem")
        o.join(li.select("l_orderkey", "l_quantity"),
               col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy("o_orderkey")
          .agg(count(col("l_orderkey")).as("n_items"),
               r4(coalesce(sum("l_quantity"), lit(0.0))).as("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(l_orderkey) AS n_items,
             |  round(coalesce(sum(l_quantity),0),4) AS sum_qty
             |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // Expression join keys (ON f(a) = f(b)) — rel/sql_rewrite.go:246-264.
    "q13_expr_join" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val su = t(s, d, "supplier")
        c.join(broadcast(su), (col("c_custkey") % 100) === (col("s_suppkey") % 100))
          .groupBy((col("c_custkey") % 100).as("k"))
          .agg(count(lit(1)).as("n"))
          .orderBy("k")
      },
      Some("""SELECT (c_custkey % 100) AS k, count(*) AS n
             |FROM customer JOIN supplier ON (c_custkey % 100) = (s_suppkey % 100)
             |GROUP BY (c_custkey % 100) ORDER BY k""".stripMargin)),

    // Exclusive BETWEEN — reference semantics v > a AND v < b (vm/vm.go:868).
    "q14_between_exclusive" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 10 && col("l_quantity") < 13)
        .select(col("l_orderkey"), col("l_linenumber"), r4(col("l_quantity")).as("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, round(l_quantity,4) AS l_quantity
             |FROM lineitem WHERE l_quantity > 10 AND l_quantity < 13
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // LIKE (reference uses glob matching, vm/vm.go:1113-1126; '%' works
    // identically for these patterns in both engines).
    "q15_like" -> Q(
      (s, d) => t(s, d, "part")
        .filter(col("p_type").like("%BRASS%") && col("p_name").like("s%"))
        .select("p_partkey", "p_name", "p_type").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_type LIKE '%BRASS%' AND p_name LIKE 's%'
             |ORDER BY p_partkey""".stripMargin)),

    // IN list (vm/vm.go:370-383).
    "q16_in_list" -> Q(
      (s, d) => t(s, d, "events")
        .filter(col("event_type").isin("signup", "error"))
        .groupBy("event_type").agg(count(lit(1)).as("n"), r4(exactSum(col("value"))).as("sum_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE),4) AS sum_value
             |FROM events WHERE event_type IN ('signup','error')
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // CASE WHEN — the Spark-representable form of the reference's column
    // guard `col IF boolexpr` (exec/projection.go:158-175).
    "q17_case_when" -> Q(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
             |  WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // String builtins (expr/builtins/string.go:15-374 family).
    "q18_string_funcs" -> Q(
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"),
          lower(col("c_name")).as("lname"),
          upper(col("c_mktsegment")).as("useg"),
          substring(col("c_name"), 1, 8).as("pref"),
          regexp_replace(col("c_name"), "#", "-").as("repl"),
          length(col("c_name")).cast("long").as("len"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
          col("c_name").startsWith("Customer").as("is_cust"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
             |  substr(c_name,1,8) AS pref, replace(c_name,'#','-') AS repl,
             |  length(c_name) AS len, concat_ws('|', c_name, c_mktsegment) AS joined,
             |  starts_with(c_name,'Customer') AS is_cust
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Time builtins (expr/builtins/time.go:19-617): yy/mm/dayofweek/hour.
    // Reference dayofweek is 0=Sunday (Go time.Weekday) = DuckDB dayofweek;
    // Spark's is 1=Sunday, hence the -1.
    "q19_time_funcs" -> Q(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("h"),
          (year(col("ts")) % 100).cast("long").as("yy"))
        .orderBy("event_id"),
      Some("""SELECT event_id, year(ts) AS y, month(ts) AS m,
             |  dayofweek(ts) AS dow, hour(ts) AS h, year(ts) % 100 AS yy
             |FROM events ORDER BY event_id""".stripMargin)),

    // JSON access (expr/builtins/json.go jmespath ≈ JsonPath subset).
    "q20_json" -> Q(
      (s, d) => t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Hash builtins (expr/builtins/hash_and_encode.go): md5/sha256/base64.
    "q21_hash" -> Q(
      (s, d) => t(s, d, "supplier")
        .select(col("s_suppkey"),
          md5(col("s_name").cast("binary")).as("h_md5"),
          sha2(col("s_name").cast("binary"), 256).as("h_sha256"),
          base64(col("s_name").cast("binary")).as("b64"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, md5(s_name) AS h_md5, sha256(s_name) AS h_sha256,
             |  to_base64(s_name::BLOB) AS b64
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // Math builtins (expr/builtins/math.go sqrt/pow + arithmetic ops).
    "q22_math" -> Q(
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          r4(sqrt(col("p_retailprice"))).as("sq"),
          r4(pow(col("p_size"), 2)).as("pw"),
          (col("p_partkey") % 7).as("md"),
          abs(col("p_size") - 25).as("ab"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, round(sqrt(p_retailprice),4) AS sq,
             |  round(pow(p_size,2),4) AS pw, p_partkey % 7 AS md, abs(p_size-25) AS ab
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Window functions — beyond the reference (SURVEY §2.5: none there),
    // core for pipeline work. row_number + running sum per partition.
    "q23_window" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by enough columns that the running sum is deterministic.
        val ord = Seq(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_partkey"), col("l_suppkey")).map(_.asc)
        val w = Window.partitionBy("l_orderkey").orderBy(ord: _*)
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            row_number().over(w).cast("long").as("rn"),
            r4(sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0))).as("run_qty"))
          .orderBy("l_orderkey", "l_linenumber", "rn")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  row_number() OVER (PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey) AS rn,
             |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
             |    ROWS UNBOUNDED PRECEDING),4) AS run_qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, rn""".stripMargin)),

    // LIMIT n OFFSET m (rel/parse_sql.go:1977-2034).
    "q24_offset" -> Q(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), r4(col("o_totalprice")).as("o_totalprice"))
        .orderBy("o_orderkey").offset(100).limit(50),
      Some("""SELECT o_orderkey, round(o_totalprice,4) AS o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin)),

    // UNION (set op — beyond reference, SURVEY §2.7).
    "q25_union" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        e.filter(col("event_type") === "signup").select("user_id")
          .union(e.filter(col("value") > 150).select("user_id"))
          .distinct().orderBy("user_id")
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             |UNION
             |SELECT user_id FROM events WHERE value > 150
             |ORDER BY user_id""".stripMargin)),

    // GROUP BY computed expressions (exec/groupby.go:122-128 evaluates
    // arbitrary exprs as group keys).
    "q26_groupby_expr" -> Q(
      (s, d) => t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
                 month(col("o_orderdate")).cast("long").as("m"))
        .agg(r4(exactSum(col("o_totalprice"))).as("rev"), count(lit(1)).as("n"))
        .orderBy("y", "m"),
      Some("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE),4) AS rev, count(*) AS n
             |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin)),

    // Subquery in FROM (rel/parse_sql.go:1229-1246) + LEFT JOIN + coalesce.
    "q27_from_subquery" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        val agg = o.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        c.join(agg, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, coalesce(x.n_orders, 0) AS n_orders
             |FROM customer LEFT JOIN
             |  (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) x
             |  ON c_custkey = x.o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // Cross join of tiny dims.
    "q28_cross_join" -> Q(
      (s, d) => {
        val r = t(s, d, "region")
        r.select(col("r_name").as("ra")).crossJoin(r.select(col("r_name").as("rb")))
          .orderBy("ra", "rb")
      },
      Some("""SELECT a.r_name AS ra, b.r_name AS rb
             |FROM region a CROSS JOIN region b ORDER BY ra, rb""".stripMargin)),

    // Analytic window functions (lag/lead/rank) — pipeline staples.
    "q30_window_analytics" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_orderkey", 1).over(w).as("prev_order"),
            lead("o_orderkey", 1).over(w).as("next_order"),
            rank().over(w).cast("long").as("rnk"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_orderkey, 1) OVER w AS prev_order,
             |  lead(o_orderkey, 1) OVER w AS next_order,
             |  rank() OVER w AS rnk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ROLLUP grouping sets (beyond the reference, SURVEY §2.4).
    "q31_rollup" -> Q(
      (s, d) => t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r4(exactSum(col("o_totalprice"))).as("rev"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE),4) AS rev
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Percentiles (median / p90) per group, through the shared
    // exact↔approx switch (Profiling.groupPercentiles): exact here —
    // 3 bounded groups, and the oracle replays quantile_cont — with
    // `exact = false` advertised as the 100 TB path (constant-size
    // per-group sketch instead of a buffer of every group value).
    "q32_percentile" -> Q(
      (s, d) => graft.operators.Profiling.groupPercentiles(
          t(s, d, "lineitem"), "l_returnflag", col("l_extendedprice"),
          Seq(0.5, 0.9), exact = true)
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.9),4) AS p90
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Tumbling time-window aggregation over the events table (batch shape
    // of the Structured Streaming query in graft.streaming).
    "q29_time_window" -> Q(
      (s, d) => t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("date").as("day"),
                 hour(col("ts")).cast("long").as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), r4(exactSum(col("value"))).as("sum_value"))
        .orderBy("day", "h", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', ts) AS DATE) AS day, hour(ts) AS h,
             |  event_type, count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE),4) AS sum_value
             |FROM events GROUP BY 1, 2, 3 ORDER BY day, h, event_type""".stripMargin)),
  )
}
