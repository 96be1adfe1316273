package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.GraftSession
import CoreQueries.Q

/** Queries that exercise the graft SQL/FilterQL ENGINE end-to-end (parse
  * → plan → DataFrame) against the driver's parquet tables, oracle-checked
  * by DuckDB. These prove dialect parity, not just DataFrame plumbing:
  * `==` equality, glob LIKE, exclusive BETWEEN, FilterQL AND(...) — all
  * through GraftSession.sql.
  */
object EngineQueries {

  private def session(s: SparkSession, dir: String): GraftSession = {
    val gs = new GraftSession(s)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")
      .foreach(t => gs.registerLazy(t, () => graft.Tables(s, dir, t)))
    gs
  }

  val all: Map[String, Q] = Map(
    // engine: filter + projection with qlbridge `==` and ORDER/LIMIT
    "ql_select_where" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_quantity > 45 AND l_returnflag == "R"
          |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity > 45 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // engine: group by + having + agg trio (sum over integer-valued
    // doubles stays exact — no float-rounding hazard)
    "ql_groupby" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem GROUP BY l_returnflag
          |HAVING count(*) > 10 ORDER BY l_returnflag""".stripMargin),
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag
             |HAVING count(*) > 10 ORDER BY l_returnflag""".stripMargin)),

    // engine: window functions through the DIALECT (OVER — beyond the
    // reference, whose row-at-a-time VM cannot see a partition):
    // ranking, running aggregate, and offset in one statement
    "ql_window" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey,
          |  row_number() OVER (PARTITION BY o_orderpriority
          |    ORDER BY o_totalprice DESC, o_orderkey) AS rk,
          |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS run_spend,
          |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price
          |FROM orders WHERE o_orderkey < 500
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey,
             |  row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rk,
             |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS run_spend,
             |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price
             |FROM orders WHERE o_orderkey < 500
             |ORDER BY o_orderkey""".stripMargin)),

    // engine: GROUP BY ROLLUP through the dialect — subtotal grouping
    // sets (beyond ref); the driver's order-insensitive compare absorbs
    // the engines' different NULL sort positions
    "ql_rollup" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
          |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // engine: QUALIFY with an INLINE window (the DuckDB dedup idiom —
    // no select-list alias needed): per-customer priciest order, the
    // ranking computed over UNPROJECTED source columns, filtered after
    // window evaluation per ANSI
    "ql_qualify_inline" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey, o_orderkey FROM orders
          |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) == 1
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, o_orderkey FROM orders
             |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
             |ORDER BY o_custkey""".stripMargin)),

    // engine: ANSI time/casting surface — EXTRACT(part FROM ts) (desugar
    // to extract_part), date_trunc with DuckDB-shared unit names, and
    // TRY_CAST (NULL, not error, on malformed input — props is JSON)
    "ql_extract_trunc" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT event_id,
          |  EXTRACT(YEAR FROM ts) AS y, EXTRACT(MONTH FROM ts) AS mo,
          |  EXTRACT(DOW FROM ts) AS dw, EXTRACT(WEEK FROM ts) AS wk,
          |  date_trunc("month", ts) AS mstart,
          |  try_cast(props AS bigint) AS props_num
          |FROM events ORDER BY event_id LIMIT 300""".stripMargin),
      Some("""SELECT event_id,
             |  EXTRACT(YEAR FROM ts) AS y, EXTRACT(MONTH FROM ts) AS mo,
             |  EXTRACT(DOW FROM ts) AS dw, EXTRACT(WEEK FROM ts) AS wk,
             |  date_trunc('month', ts) AS mstart,
             |  try_cast(props AS BIGINT) AS props_num
             |FROM events ORDER BY event_id LIMIT 300""".stripMargin)),

    // engine: deterministic TABLESAMPLE (extension): md5-of-key permill
    // bucket < n·10 — content-addressed, so the oracle replays the
    // exact row set (engine-random BERNOULLI never could); pure
    // scan-stage filter, no shuffle
    "ql_tablesample" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT doc_id, source FROM documents TABLESAMPLE (25 PERCENT) ON (doc_id)
          |ORDER BY doc_id""".stripMargin),
      Some("""SELECT doc_id, source FROM documents
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 < 250
             |ORDER BY doc_id""".stripMargin)),

    // engine: ILIKE (case-insensitive LIKE, DuckDB/Postgres dialect) —
    // pattern case differs from the data's on purpose
    "ql_ilike" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT p_partkey, p_name FROM part
          |WHERE p_name ILIKE "%WIDGET%" AND p_name NOT ILIKE "%COLD%"
          |ORDER BY p_partkey LIMIT 100""".stripMargin),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name ILIKE '%WIDGET%' AND p_name NOT ILIKE '%COLD%'
             |ORDER BY p_partkey LIMIT 100""".stripMargin)),

    // engine: ANSI INTERVAL literals — native timestamp arithmetic on
    // both engines (parser desugars to a real Spark interval Column)
    "ql_interval" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT event_id, ts + INTERVAL 1 DAY AS next_day,
          |  ts - INTERVAL 2 HOUR AS before2h
          |FROM events WHERE ts + INTERVAL 30 MINUTE > ts
          |ORDER BY event_id LIMIT 200""".stripMargin),
      Some("""SELECT event_id, ts + INTERVAL 1 DAY AS next_day,
             |  ts - INTERVAL 2 HOUR AS before2h
             |FROM events WHERE ts + INTERVAL 30 MINUTE > ts
             |ORDER BY event_id LIMIT 200""".stripMargin)),

    // engine: GROUPING() disambiguates rollup-generated NULLs from data
    // NULLs in ROLLUP output (the standard companion to ql_rollup)
    "ql_grouping_fn" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, l_linestatus,
          |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
          |  count(*) AS n
          |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag, l_linestatus, g_rf, g_ls""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus,
             |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
             |  count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag, l_linestatus, g_rf, g_ls""".stripMargin)),

    // engine: ANSI null-handling scalars (coalesce/nullif/greatest/least
    // — standard spellings beyond the reference's oneof)
    "ql_null_funcs" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT p_partkey,
          |  coalesce(nullif(p_brand, "Brand#13"), "OTHER") AS brand_or_other,
          |  greatest(p_size, 25) AS g_sz, least(p_size, 25) AS l_sz
          |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin),
      Some("""SELECT p_partkey,
             |  coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
             |  greatest(p_size, 25) AS g_sz, least(p_size, 25) AS l_sz
             |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin)),

    // engine: uncorrelated scalar subquery in WHERE (beyond ref) —
    // max(), not avg(): aggregate must be float-sum-order insensitive
    // for the cross-engine hash
    "ql_scalar_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_quantity >= (SELECT max(l_quantity) FROM lineitem)
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity >= (SELECT max(l_quantity) FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // engine: GROUP BY CUBE — all grouping-set combinations (beyond ref)
    "ql_cube" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // engine: CASE expressions through the dialect (searched + simple
    // forms — the simple form desugars to equality at parse time)
    "ql_case" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber,
          |  CASE WHEN l_quantity > 45 THEN "bulk"
          |       WHEN l_quantity > 20 THEN "mid" ELSE "small" END AS band,
          |  CASE l_returnflag WHEN "R" THEN 1 ELSE 0 END AS returned
          |FROM lineitem WHERE l_orderkey < 100
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity > 45 THEN 'bulk'
             |       WHEN l_quantity > 20 THEN 'mid' ELSE 'small' END AS band,
             |  CAST(CASE l_returnflag WHEN 'R' THEN 1 ELSE 0 END AS BIGINT) AS returned
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // engine: WITH common table expressions through the dialect
    // (chained CTEs + a join against a base table; aggregates are
    // order-insensitive — count/max — so the row hashes cross-engine)
    "ql_cte" -> Q(
      (s, d) => session(s, d).sql(
        """WITH highval AS (
          |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
          |), agg AS (
          |  SELECT o_custkey, count(*) AS n, max(o_totalprice) AS top
          |  FROM highval GROUP BY o_custkey
          |)
          |SELECT c.c_name, a.n, a.top
          |FROM customer c JOIN agg a ON c.c_custkey == a.o_custkey
          |ORDER BY c.c_name""".stripMargin),
      Some("""WITH highval AS (
             |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
             |), agg AS (
             |  SELECT o_custkey, count(*) AS n, max(o_totalprice) AS top
             |  FROM highval GROUP BY o_custkey
             |)
             |SELECT c.c_name, a.n, a.top
             |FROM customer c JOIN agg a ON c.c_custkey = a.o_custkey
             |ORDER BY c.c_name""".stripMargin)),

    // engine: QUALIFY — the window-dedup idiom through the dialect
    // (keep each customer's priciest order); DuckDB speaks QUALIFY too
    "ql_qualify" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey, o_orderkey, o_totalprice,
          |  row_number() OVER (PARTITION BY o_custkey
          |    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |FROM orders QUALIFY rk == 1
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |FROM orders QUALIFY rk = 1
             |ORDER BY o_custkey""".stripMargin)),

    // engine: join through the dialect (expression keys resolved by alias)
    "ql_join" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o.o_orderpriority, count(*) AS n
          |FROM orders o JOIN lineitem l ON o.o_orderkey == l.l_orderkey
          |WHERE l.l_quantity > 49
          |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin),
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_quantity > 49
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // engine: exclusive BETWEEN (reference semantics) through SQL text
    "ql_between" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT p_partkey, p_size FROM part WHERE p_size BETWEEN 10 AND 13
          |ORDER BY p_partkey""".stripMargin),
      Some("""SELECT p_partkey, p_size FROM part WHERE p_size > 10 AND p_size < 13
             |ORDER BY p_partkey""".stripMargin)),

    // engine: glob LIKE through SQL text ('%' and '*' both glob)
    "ql_like" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT s_suppkey, s_name FROM supplier WHERE s_name LIKE "Supplier#00000001%"
          |ORDER BY s_suppkey""".stripMargin),
      Some("""SELECT s_suppkey, s_name FROM supplier WHERE s_name LIKE 'Supplier#00000001%'
             |ORDER BY s_suppkey""".stripMargin)),

    // engine: IN-subquery planned as left_semi join
    "ql_in_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // engine: JOIN ... USING — coalesced key column, standard
    // semantics (TPC-H prefixes every column, so the shared name comes
    // from renaming subqueries; DuckDB runs the identical statement)
    "ql_join_using" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT custkey, c_name, o_orderkey
          |FROM (SELECT c_custkey AS custkey, c_name FROM customer) c
          |JOIN (SELECT o_custkey AS custkey, o_orderkey FROM orders) o USING (custkey)
          |ORDER BY custkey, o_orderkey""".stripMargin),
      Some("""SELECT custkey, c_name, o_orderkey
             |FROM (SELECT c_custkey AS custkey, c_name FROM customer) c
             |JOIN (SELECT o_custkey AS custkey, o_orderkey FROM orders) o USING (custkey)
             |ORDER BY custkey, o_orderkey""".stripMargin)),
    // engine: GROUP BY GROUPING SETS — the general grouping-set form
    // (ROLLUP/CUBE are its special cases); one Expand + one aggregate,
    // never a union of per-set scans
    "ql_grouping_sets" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // engine: window FRAME clauses (ROWS BETWEEN) through the dialect —
    // trailing sum over integer-valued doubles (exact in fp regardless
    // of the engines' frame-evaluation association order)
    "ql_window_frame" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber,
          |  sum(l_quantity) OVER (PARTITION BY l_orderkey
          |    ORDER BY l_linenumber, l_quantity
          |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail3
          |FROM lineitem WHERE l_orderkey < 500
          |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber,
             |  sum(l_quantity) OVER (PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_quantity
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail3
             |FROM lineitem WHERE l_orderkey < 500
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // engine: SQL-standard PIVOT through the dialect (beyond ref) —
    // explicit IN values so the output schema is fixed up front (no
    // distinct-scan job); sum over integer-valued doubles stays exact
    "ql_pivot" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT * FROM (SELECT l_linestatus, l_returnflag, l_quantity FROM lineitem) t
          |PIVOT (sum(l_quantity) FOR l_returnflag IN ("A" AS qty_a, "N" AS qty_n, "R" AS qty_r))
          |ORDER BY l_linestatus""".stripMargin),
      Some("""SELECT l_linestatus, "A" AS qty_a, "N" AS qty_n, "R" AS qty_r
             |FROM (SELECT l_linestatus, l_returnflag, l_quantity FROM lineitem) t
             |PIVOT (sum(l_quantity) FOR l_returnflag IN ('A', 'N', 'R'))
             |ORDER BY l_linestatus""".stripMargin)),

    // engine: SQL-standard UNPIVOT (beyond ref) — melt two measure
    // columns into (metric, v) rows, NULLs excluded per the standard
    "ql_unpivot" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber, metric, v
          |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem) t
          |UNPIVOT (v FOR metric IN (l_quantity AS qty, l_extendedprice AS price))
          |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber, metric, v
             |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem) t
             |UNPIVOT (v FOR metric IN (l_quantity AS 'qty', l_extendedprice AS 'price'))
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // engine: explode/unnest generator through the dialect (beyond
    // ref) — one row per array element, the SQL surface of the
    // tokenize-and-count shape every pipeline op uses internally
    "ql_explode" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT doc_id, explode(split(text, " ")) AS tok
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin),
      Some("""SELECT doc_id,
             |  unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
             |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)),

    // engine: CORRELATED IN-subquery — the equality conjunct pins the
    // subquery to the outer row; plans as one semi join on
    // (value, correlation) keys
    "ql_corr_in_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine: scalar subqueries in the SELECT list (beyond ref) — the
    // value substitutes as a literal, whole-column and inside
    // arithmetic; one bounded probe per subquery
    "ql_select_scalar_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, (SELECT max(o_totalprice) FROM orders) AS top_order,
          |  c_acctbal - (SELECT min(c_acctbal) FROM customer) AS bal_over_min
          |FROM customer ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, (SELECT max(o_totalprice) FROM orders) AS top_order,
             |  c_acctbal - (SELECT min(c_acctbal) FROM customer) AS bal_over_min
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // engine: correlated EXISTS planned as left_semi on the equality
    // conjunct (inner-only predicates stay inside the subquery frame)
    "ql_exists_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // engine: correlated NOT EXISTS planned as left_anti (customers
    // without any large order — the complement of ql_exists_subquery,
    // non-empty on every fixture)
    "ql_not_exists_subquery" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // engine: quantified comparison `> ANY (SELECT …)` — planned as ONE
    // bounded min/max/count aggregate of the subquery broadcast onto the
    // outer scan (never a row-count-shaped join); `x > ANY` ≡ x > min
    "ql_quant_any" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > ANY (SELECT l_extendedprice FROM lineitem WHERE l_quantity >= 49)
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > ANY (SELECT l_extendedprice FROM lineitem WHERE l_quantity >= 49)
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)),

    // engine: `>= ALL (SELECT …)` — the max-finding idiom (rows at or
    // above every F-status order's price); empty subquery keeps all rows
    // per ANSI, enforced by the count guard in the same one-row aggregate
    "ql_quant_all" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_orderstatus == "F")
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F')
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): CORRELATED quantified `> ANY` — per-customer
    // bounded min/max/count aggregate LEFT-joined on the correlation
    // equality (the aggregate-LATERAL lowering), never a per-row rescan
    "ql_quant_any_corr" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_totalprice FROM orders o
          |WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)
          |ORDER BY o_orderkey LIMIT 100""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders o
             |WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)
             |ORDER BY o_orderkey LIMIT 100""".stripMargin)),

    // engine (r12): correlated `>= ALL` — each customer's max-price
    // orders; the empty-group/NULL guards ride the same one aggregate
    "ql_quant_all_corr" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
          |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
             |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): correlated IN whose subquery GROUPs and HAVINGs —
    // correlation keys append to the grouping, HAVING evaluates per
    // (status × customer) group, then ONE semi join
    "ql_corr_in_having" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_totalprice FROM orders o
          |WHERE o_totalprice IN (SELECT max(o_totalprice) FROM orders
          |  WHERE o_custkey = o.o_custkey GROUP BY o_orderstatus HAVING count(*) >= 2)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_totalprice FROM orders o
             |WHERE o_totalprice IN (SELECT max(o_totalprice) FROM orders
             |  WHERE o_custkey = o.o_custkey GROUP BY o_orderstatus HAVING count(*) >= 2)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): HAVING with an IN-subquery — the aggregate refs
    // substitute to output columns, then the shared WHERE machinery
    // applies to the agg frame (one semi join post-aggregation)
    "ql_having_in" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
          |HAVING o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) AND count(*) >= 10
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
             |HAVING o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) AND count(*) >= 10
             |ORDER BY o_custkey""".stripMargin)),

    // engine (r12): HAVING with a CORRELATED scalar comparison — the
    // per-key aggregate LATERAL joins onto the agg frame (an empty
    // correlation slice yields NULL → UNKNOWN → group drops, ANSI)
    "ql_having_corr_scalar" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
          |HAVING count(*) >= (SELECT 0.002 * max(c_acctbal) FROM customer WHERE c_custkey = o_custkey)
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
             |HAVING count(*) >= (SELECT 0.002 * max(c_acctbal) FROM customer WHERE c_custkey = o_custkey)
             |ORDER BY o_custkey""".stripMargin)),

    // engine (r12): boolean subqueries as PROJECTED VALUES — a
    // correlated EXISTS and a correlated NOT EXISTS each lower to one
    // distinct-key LEFT join supplying a marker column (never a
    // per-row rescan); the booleans land in the output with exact
    // ANSI verdicts
    "ql_select_exists" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey,
          |  EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) AS has_bulk,
          |  NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') AS no_returns
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey,
             |  EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) AS has_bulk,
             |  NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') AS no_returns
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): IN / NOT IN as projected values with full ANSI
    // 3-valued logic — a NULL left operand and NULLs in the set both
    // verdict NULL (never TRUE/FALSE), pinned by CASE-built NULLs on
    // each side of the membership test
    "ql_select_in" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey,
          |  (CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END)
          |    IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS member,
          |  o_custkey NOT IN
          |    (SELECT CASE WHEN c_acctbal > 9000 THEN NULL ELSE c_custkey END FROM customer) AS uncovered
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey,
             |  (CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END)
             |    IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS member,
             |  o_custkey NOT IN
             |    (SELECT CASE WHEN c_acctbal > 9000 THEN NULL ELSE c_custkey END FROM customer) AS uncovered
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): SELECT DISTINCT + inline-window QUALIFY — the
    // window evaluates over the pre-distinct rows, QUALIFY filters,
    // then the dedup (DuckDB's native QUALIFY order)
    "ql_qualify_distinct" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT DISTINCT o_custkey FROM orders
          |QUALIFY max(o_totalprice) OVER (PARTITION BY o_custkey) > 300000
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT DISTINCT o_custkey FROM orders
             |QUALIFY max(o_totalprice) OVER (PARTITION BY o_custkey) > 300000
             |ORDER BY o_custkey""".stripMargin)),

    // engine (r12): correlated quantified over a GROUPED subquery —
    // correlation keys append to the grouping, the quantifier ranges
    // over the per-(group × slice) aggregate rows; slices whose groups
    // all fail HAVING give the ANSI empty-set verdict (ALL → TRUE)
    "ql_quant_corr_grouped" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey FROM orders o
          |WHERE o_totalprice / 100 > ALL (SELECT max(l_quantity) FROM lineitem
          |  WHERE l_orderkey = o.o_orderkey GROUP BY l_linenumber % 2 HAVING count(*) >= 2)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey FROM orders o
             |WHERE o_totalprice / 100 > ALL (SELECT max(l_quantity) FROM lineitem
             |  WHERE l_orderkey = o.o_orderkey GROUP BY l_linenumber % 2 HAVING count(*) >= 2)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): correlated quantified over a BARE AGGREGATE — ANSI
    // gives every outer row a SINGLETON set (empty slice → [NULL]), so
    // the lowering is the scalar comparison through the aggregate
    // LATERAL: customers with no orders verdict UNKNOWN and drop
    "ql_quant_corr_agg" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey FROM customer c
          |WHERE c_acctbal > ALL (SELECT max(o_totalprice) / 100 FROM orders WHERE o_custkey = c.c_custkey)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey FROM customer c
             |WHERE c_acctbal > ALL (SELECT max(o_totalprice) / 100 FROM orders WHERE o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // engine (r12): SELECT DISTINCT ordered by an inline WINDOW — the
    // window evaluates over the pre-distinct rows as a hidden carry
    // (DuckDB's semantics; replayable because the extremum is constant
    // per selected key)
    "ql_distinct_window_order" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT DISTINCT l_returnflag FROM lineitem
          |ORDER BY max(l_quantity) OVER (PARTITION BY l_returnflag) DESC, l_returnflag""".stripMargin),
      Some("""SELECT DISTINCT l_returnflag FROM lineitem
             |ORDER BY max(l_quantity) OVER (PARTITION BY l_returnflag) DESC, l_returnflag""".stripMargin)),

    // engine (r12): quantified ANY/ALL as PROJECTED 3VL values — the
    // correlated ALL reads one per-key extremum aggregate; the
    // uncorrelated ANY carries NULLs in the set, so the undecided rows
    // verdict NULL (never FALSE), exactly as DuckDB's native form
    "ql_select_quant" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey,
          |  o_totalprice > ALL (SELECT c_acctbal * 40 FROM customer WHERE c_custkey = o_custkey) AS beats_all,
          |  o_totalprice < ANY (SELECT CASE WHEN c_acctbal > 5000 THEN c_acctbal * 100 END FROM customer) AS under_some
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey,
             |  o_totalprice > ALL (SELECT c_acctbal * 40 FROM customer WHERE c_custkey = o_custkey) AS beats_all,
             |  o_totalprice < ANY (SELECT CASE WHEN c_acctbal > 5000 THEN c_acctbal * 100 END FROM customer) AS under_some
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): subqueries under OR in WHERE — disjunctive
    // membership/existence cannot be a semi join, so each side attaches
    // as a hidden boolean column and the OR filters as a plain predicate
    "ql_where_or_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
          |   OR EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
             |   OR EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): a CORRELATED scalar subquery nested inside
    // arithmetic in WHERE — the per-key aggregate LATERAL supplies a
    // hidden value column and the arithmetic comparison filters plain
    "ql_where_arith_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey FROM orders
          |WHERE o_totalprice > 50 * (SELECT max(c_acctbal) FROM customer WHERE c_custkey = o_custkey)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |WHERE o_totalprice > 50 * (SELECT max(c_acctbal) FROM customer WHERE c_custkey = o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r12): a CORRELATED scalar nested in HAVING arithmetic —
    // the lateral joins the AGGREGATED frame (count ints stay exact)
    "ql_having_nested_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
          |HAVING count(*) >= 9 + (SELECT count(*) FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
             |HAVING count(*) >= 9 + (SELECT count(*) FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
             |ORDER BY o_custkey""".stripMargin)),

    // engine (r12): CORRELATED scalar subqueries in the SELECT list —
    // each rewrites to an aggregate LATERAL (per-key grouped aggregate
    // left-joined back, empty groups completed: count → 0, max → NULL)
    "ql_corr_scalar_select" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_price
          |FROM customer ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey,
             |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
             |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_price
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // engine (r13): subqueries inline in ORDER BY — the last dialect
    // cliff closed. A correlated scalar (aggregate-LATERAL) and the
    // plain column tiebreak order the rows; LIMIT makes the ordering
    // hash-visible (the driver compare is order-insensitive, so the
    // kept-set must depend on the subquery). Exact row ORDER is pinned
    // by EngineSpec.
    "ql_order_by_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name FROM customer
          |ORDER BY (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) DESC, c_custkey
          |LIMIT 20""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer
             |ORDER BY (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) DESC, c_custkey
             |LIMIT 20""".stripMargin)),

    // engine (r13): subqueries inline in QUALIFY, mixed with an inline
    // window — both hoist to the pre-projection frame (the subquery
    // verdict as a hidden column, the window inside the hoisted
    // predicate), filter, then drop. Threshold is max/2: exact IEEE on
    // both engines (never a cross-row float sum).
    "ql_qualify_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
          |  AND o_totalprice > (SELECT max(o_totalprice) FROM orders) / 2
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
             |  AND o_totalprice > (SELECT max(o_totalprice) FROM orders) / 2
             |ORDER BY o_orderkey""".stripMargin)),

    // engine (r13): subqueries inside column guards (`col IF expr`,
    // the reference's per-column conditional projection) — a scalar
    // comparison and a correlated EXISTS verdict, each attached as a
    // hidden column the guard's CASE reads; oracle spells the guard as
    // ANSI CASE WHEN
    "ql_guard_subq" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey,
          |  c_acctbal IF c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.5 AS rich_bal,
          |  c_name IF EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS active_name
          |FROM customer ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.5 THEN c_acctbal END AS rich_bal,
             |  CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN c_name END AS active_name
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // engine (r12): correlated EXISTS whose subquery aggregates with
    // HAVING and no GROUP BY — the ANSI empty-slice verdict (the
    // decorrelation COUNT bug) is a broadcast constant; customers
    // WITHOUT any order above the bar come back through NOT EXISTS
    "ql_corr_exists_having" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey HAVING count(*) >= 12)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey HAVING count(*) >= 12)
             |ORDER BY c_custkey""".stripMargin)),

    // engine (r12): the COUNT-bug edge itself as an oracle row —
    // HAVING count(*) == 0 keeps exactly the ORDERLESS customers
    "ql_corr_exists_count0" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey HAVING count(*) == 0)
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey HAVING count(*) = 0)
             |ORDER BY c_custkey""".stripMargin)),

    // engine (r12): positional-placeholder query through the
    // database/sql-driver surface (exec/sqldriver.go queryArgsConvert
    // ≙) — the oracle replays the EXPANDED text
    "ql_placeholder_args" -> Q(
      (s, d) => session(s, d).sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > ? AND o_orderstatus = ? ORDER BY o_orderkey LIMIT 50",
        Seq(300000L, "F")),
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000 AND o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 50")),

    // engine: SQL-standard aggregate FILTER clause — parse-time desugar
    // to agg(CASE WHEN p THEN arg END), so the planner sees one ordinary
    // hash aggregate (partial+final, no extra scan per filtered agg)
    "ql_agg_filter" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag,
          |  count(*) AS n_all,
          |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
          |  max(l_extendedprice) FILTER (WHERE l_linestatus == "F") AS max_f_price
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      Some("""SELECT l_returnflag,
             |  count(*) AS n_all,
             |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
             |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
             |  max(l_extendedprice) FILTER (WHERE l_linestatus = 'F') AS max_f_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // engine: ANSI WINDOW clause — one named spec shared by three
    // window functions (substituted at parse time; the planner plans
    // ONE Window operator for the shared partition/order)
    "ql_named_window" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_orderkey, o_custkey,
          |  row_number() OVER w AS rk,
          |  sum(o_totalprice) OVER w AS run_spend,
          |  lag(o_totalprice) OVER w AS prev_price
          |FROM orders WHERE o_orderkey < 800
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
          |ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey,
             |  row_number() OVER w AS rk,
             |  sum(o_totalprice) OVER w AS run_spend,
             |  lag(o_totalprice) OVER w AS prev_price
             |FROM orders WHERE o_orderkey < 800
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // engine: IS [NOT] DISTINCT FROM — null-safe comparison over CASE
    // expressions that go NULL on the else branch (both engines treat
    // NULL vs NULL as NOT DISTINCT, NULL vs value as DISTINCT)
    "ql_is_distinct" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_orderkey, l_linenumber FROM lineitem
          |WHERE (CASE WHEN l_quantity > 25 THEN l_returnflag END)
          |  IS DISTINCT FROM (CASE WHEN l_discount > 0.05 THEN l_returnflag END)
          |ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE (CASE WHEN l_quantity > 25 THEN l_returnflag END)
             |  IS DISTINCT FROM (CASE WHEN l_discount > 0.05 THEN l_returnflag END)
             |ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin)),

    // scalar builtin families through the dialect: array/string/cast
    "ql_scalar_funcs" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT p_partkey,
          |  len(split(p_name, " ")) AS n_words,
          |  array.index(split(p_name, " "), 0) AS first_word,
          |  string.substr(p_type, 0, 5) AS type5,
          |  char_length(p_brand) AS blen,
          |  toint(tostring(p_size)) AS sz,
          |  oneof(NULL, p_brand) AS brand
          |FROM part ORDER BY p_partkey""".stripMargin),
      Some("""SELECT p_partkey,
             |  len(string_split(p_name, ' ')) AS n_words,
             |  string_split(p_name, ' ')[1] AS first_word,
             |  substr(p_type, 1, 5) AS type5,
             |  CAST(length(p_brand) AS BIGINT) AS blen,
             |  CAST(p_size AS BIGINT) AS sz,
             |  p_brand AS brand
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // column guard through the dialect (`col IF boolexpr`)
    "ql_column_guard" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey, c_name IF c_acctbal > 5000 AS rich_name
          |FROM customer ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal > 5000 THEN c_name END AS rich_name
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // FilterQL end-to-end: n-ary AND over the events table
    "ql_filterql" -> Q(
      (s, d) => {
        val gs = session(s, d)
        gs.sql("""FILTER AND(value > 150, event_type == "error") FROM events""")
          .select("event_id", "event_type", "value").orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE value > 150 AND event_type = 'error' ORDER BY event_id""".stripMargin)),

    // engine set operations (beyond the reference dialect)
    "ql_union" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT o_custkey FROM orders WHERE o_totalprice > 350000
          |UNION
          |SELECT c_custkey FROM customer WHERE c_acctbal > 9900
          |ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 350000
             |UNION
             |SELECT c_custkey FROM customer WHERE c_acctbal > 9900
             |ORDER BY o_custkey""".stripMargin)),

    // the statement printer inside the correctness gate: parse the
    // query, PRINT it back to SQL (rel.SqlWriter), re-parse and plan
    // the printed form — results must still hash-match the oracle, so
    // any precedence/quoting loss in toSql fails the gate, not just a
    // unit test. Exercises guards, grouped arithmetic, strings, joins.
    "ql_tosql_roundtrip" -> Q(
      (s, d) => {
        // the aggregate is DYADIC-valued on purpose: a float-product sum
        // rounded at fixed decimals is order-dependent at the last digit
        // (it flipped at sf0.1), while sums of halves (x.0 / x.5 terms
        // are exactly representable) are exact in ANY order/engine. The
        // `/ 2` term keeps division — with its parenthesization — under
        // the printer round-trip gate
        val text =
          """SELECT o.o_orderpriority, count(*) AS n,
            |  sum((l.l_quantity * (2 + l.l_linenumber)) / 2) AS qty_h
            |FROM orders o JOIN lineitem l ON o.o_orderkey == l.l_orderkey
            |WHERE l.l_returnflag IN ("R", "A") AND l.l_quantity > 40
            |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin
        val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(text))
        session(s, d).sql(printed)
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  sum((l_quantity * (2 + l_linenumber)) / 2) AS qty_h
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag IN ('R', 'A') AND l_quantity > 40
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // url/email builtin family through the dialect — synthesized inputs
    // so every function's output is reproducible in DuckDB string ops
    // (reference family: expr/builtins/url_email.go:20-857)
    "ql_url_email" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT c_custkey,
          |  email(tolower(c_name) + "@ex-mail.com") AS em,
          |  emaildomain(tolower(c_name) + "@ex-mail.com") AS edom,
          |  emailname(c_name + " <u@ex-mail.com>") AS ename,
          |  host("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b") AS h,
          |  domain("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b") AS dom,
          |  path("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b") AS p,
          |  qs("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b", "ref") AS ref,
          |  qs2("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b", "msg") AS msg_raw,
          |  urlmain("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b") AS mainurl,
          |  urlminusqs("http://www." + tolower(c_mktsegment) + ".example.com/seg/" + tostring(c_custkey) + "?ref=" + tostring(c_nationkey) + "&msg=a%20b", "ref") AS minus,
          |  urldecode("a%20b%2Bc") AS decoded
          |FROM customer ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey,
             |  lower(c_name) || '@ex-mail.com' AS em,
             |  'ex-mail.com' AS edom,
             |  c_name AS ename,
             |  'www.' || lower(c_mktsegment) || '.example.com' AS h,
             |  'example.com' AS dom,
             |  '/seg/' || CAST(c_custkey AS VARCHAR) AS p,
             |  CAST(c_nationkey AS VARCHAR) AS ref,
             |  'a%20b' AS msg_raw,
             |  'http://www.' || lower(c_mktsegment) || '.example.com/seg/' || CAST(c_custkey AS VARCHAR) AS mainurl,
             |  'http://www.' || lower(c_mktsegment) || '.example.com/seg/' || CAST(c_custkey AS VARCHAR) || '?msg=a%20b' AS minus,
             |  'a b+c' AS decoded
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // engine builtins in projection: string + time + hash families
    "ql_funcs" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT s_suppkey, string.uppercase(s_name) AS uname,
          |  hasprefix(s_name, "Supplier") AS is_supp,
          |  yy(todate("2015-10-25")) AS y2,
          |  hash.md5(s_name) AS h
          |FROM supplier ORDER BY s_suppkey""".stripMargin),
      Some("""SELECT s_suppkey, upper(s_name) AS uname,
             |  starts_with(s_name, 'Supplier') AS is_supp,
             |  CAST(15 AS BIGINT) AS y2, md5(s_name) AS h
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // both ES query-DSL generators inside the correctness gate: a fixed
    // FilterQL battery compiles through EsGenerator (modern bool shapes)
    // and Es2Generator (ES 2.x dialect, schema-aware) and the exact JSON
    // is pinned by the oracle — any emission drift fails the hash, same
    // contract as ql_tosql_roundtrip for the SQL printer.
    // (generators/elasticsearch/{esgen,es2gen}/esgenerator.go)
    "ql_es_dsl" -> Q(
      (s, d) => {
        import graft.rel.{FilterStatement, SqlParser}
        import graft.generators.{EsGenerator, Es2Generator}
        import graft.generators.Es2Generator.{EsField, MapColumns}
        val cols = MapColumns(Map(
          "age" -> EsField("age", typ = "int"),
          "state" -> EsField("state"),
          "url" -> EsField("url"),
          "map_events" -> EsField("map_events", typ = "map_value", path = "map_events")))
        val battery = Seq(
          "t1_bool" -> "FILTER AND(age > 21, state = \"CA\")",
          "t2_neg" -> "FILTER NOT url LIKE \"%google%\"",
          "t3_in" -> "FILTER OR(state IN (\"CA\", \"OR\"), EXISTS url)",
          "t4_between" -> "FILTER age BETWEEN 18 AND 65 LIMIT 25",
          "t5_nested" -> "FILTER map_events.open = \"x\"",
          "t6_missing" -> "FILTER AND(age >= 1, gone_column = 2)")
        import s.implicits._
        battery.map { case (n, fql) =>
          val st = SqlParser.parse(fql).asInstanceOf[FilterStatement]
          (n, EsGenerator.walk(st), Es2Generator.walk(st, cols))
        }.toDF("name", "es5", "es2").orderBy("name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('t1_bool',
             |   '{"size":0,"filter":{"bool":{"must":[{"range":{"age":{"gt":21}}},{"term":{"state":"CA"}}]}}}',
             |   '{"size":0,"filter":{"bool":{"filter":[{"range":{"age":{"gt":21}}},{"term":{"state":"CA"}}]}}}'),
             |  ('t2_neg',
             |   '{"size":0,"filter":{"bool":{"must_not":[{"wildcard":{"url":"*google*"}}]}}}',
             |   '{"size":0,"filter":{"bool":{"must_not":{"query":{"wildcard":{"url":"*google*"}}}}}}'),
             |  ('t3_in',
             |   '{"size":0,"filter":{"bool":{"should":[{"terms":{"state":["CA","OR"]}},{"exists":{"field":"url"}}]}}}',
             |   '{"size":0,"filter":{"bool":{"should":[{"terms":{"state":["CA","OR"]}},{"exists":{"field":"url"}}]}}}'),
             |  ('t4_between',
             |   '{"size":25,"filter":{"bool":{"must":[{"range":{"age":{"gt":18}}},{"range":{"age":{"lt":65}}}]}}}',
             |   '{"size":25,"filter":{"and":[{"range":{"age":{"gt":18}}},{"range":{"age":{"lt":65}}}]}}'),
             |  ('t5_nested',
             |   '{"size":0,"filter":{"term":{"map_events.open":"x"}}}',
             |   '{"size":0,"filter":{"nested":{"filter":{"and":[{"term":{"map_events.v":"x"}},{"term":{"map_events.k":"open"}}]},"path":"map_events"}}}'),
             |  ('t6_missing',
             |   '{"size":0,"filter":{"bool":{"must":[{"range":{"age":{"gte":1}}},{"term":{"gone_column":2}}]}}}',
             |   '{"size":0,"filter":{"bool":{"filter":[{"range":{"age":{"gte":1}}},{"bool":{"must_not":{"match_all":{}}}}]}}}')
             |) AS t(name, es5, es2) ORDER BY name""".stripMargin)),

    // engine: WITH RECURSIVE through the dialect (beyond ref AND beyond
    // stock Spark SQL, which has no recursive CTE) — a hierarchy walk:
    // parent(nk) = nk intdiv 2 shapes the 25 nations into a binary
    // tree; recursion labels every node with its depth. UNION ALL path.
    "ql_recursive_tree" -> Q(
      (s, d) => session(s, d).sql(
        """WITH RECURSIVE walk(nk, depth) AS (
          |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey == 0
          |  UNION ALL
          |  SELECT n.n_nationkey, w.depth + 1 FROM nation n
          |  JOIN walk w ON toint(n.n_nationkey / 2) == w.nk AND n.n_nationkey != 0
          |)
          |SELECT toint(w.nk) AS nk, toint(w.depth) AS depth, n.n_name
          |FROM walk w
          |JOIN nation n ON n.n_nationkey == w.nk
          |ORDER BY nk""".stripMargin),
      Some("""WITH RECURSIVE walk(nk, depth) AS (
             |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT n.n_nationkey, w.depth + 1 FROM nation n
             |  JOIN walk w ON n.n_nationkey // 2 = w.nk AND n.n_nationkey <> 0
             |)
             |SELECT CAST(w.nk AS BIGINT) AS nk, CAST(w.depth AS BIGINT) AS depth,
             |  n.n_name
             |FROM walk w
             |JOIN nation n ON n.n_nationkey = w.nk
             |ORDER BY nk""".stripMargin)),

    // engine: WITH RECURSIVE, UNION-distinct fixpoint — the functional
    // graph nk -> (2*nk+1) mod 25 cycles; distinct semantics (each
    // frontier EXCEPTs everything seen) is what terminates the walk
    "ql_recursive_fixpoint" -> Q(
      (s, d) => session(s, d).sql(
        """WITH RECURSIVE reach(nk) AS (
          |  SELECT n_nationkey FROM nation WHERE n_nationkey == 0
          |  UNION
          |  SELECT (reach.nk * 2 + 1) % 25 FROM reach
          |)
          |SELECT toint(r.nk) AS nk, n.n_name FROM reach r
          |JOIN nation n ON n.n_nationkey == r.nk
          |ORDER BY nk""".stripMargin),
      Some("""WITH RECURSIVE reach(nk) AS (
             |  SELECT n_nationkey FROM nation WHERE n_nationkey = 0
             |  UNION
             |  SELECT (reach.nk * 2 + 1) % 25 FROM reach
             |)
             |SELECT CAST(r.nk AS BIGINT) AS nk, n.n_name FROM reach r
             |JOIN nation n ON n.n_nationkey = r.nk
             |ORDER BY nk""".stripMargin)),

    // engine: WITH RECURSIVE arithmetic series (multi-column recursion
    // with a stop predicate in the recursive term) — factorials to 12!,
    // which stays inside int32 on both engines
    "ql_recursive_series" -> Q(
      (s, d) => session(s, d).sql(
        """WITH RECURSIVE f(i, fact) AS (
          |  SELECT 1, 1
          |  UNION ALL
          |  SELECT f.i + 1, f.fact * (f.i + 1) FROM f WHERE f.i < 12
          |)
          |SELECT toint(f.i) AS i, toint(f.fact) AS fact FROM f
          |ORDER BY i""".stripMargin),
      Some("""WITH RECURSIVE f(i, fact) AS (
             |  SELECT 1, 1
             |  UNION ALL
             |  SELECT f.i + 1, f.fact * (f.i + 1) FROM f WHERE f.i < 12
             |)
             |SELECT CAST(i AS BIGINT) AS i, CAST(fact AS BIGINT) AS fact
             |FROM f ORDER BY i""".stripMargin)),

    // engine: SEMI JOIN through the dialect (DuckDB spelling; Spark
    // left_semi) — customers that placed at least one high-value order;
    // only left columns survive, the filter rides the join condition
    "ql_semi_join" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT toint(c.c_custkey) AS ck, c.c_name FROM customer c
          |SEMI JOIN orders o
          |  ON c.c_custkey == o.o_custkey AND o.o_totalprice > 200000
          |ORDER BY ck LIMIT 50""".stripMargin),
      Some("""SELECT CAST(c.c_custkey AS BIGINT) AS ck, c.c_name FROM customer c
             |SEMI JOIN orders o
             |  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
             |ORDER BY ck LIMIT 50""".stripMargin)),

    // engine: ANTI JOIN through the dialect — customers with no orders
    // at all (the classic anti-join shape), counted
    "ql_anti_join" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT count(*) AS n FROM customer c
          |ANTI JOIN orders o ON c.c_custkey == o.o_custkey""".stripMargin),
      Some("""SELECT count(*) AS n FROM customer c
             |ANTI JOIN orders o ON c.c_custkey = o.o_custkey""".stripMargin)),

    // engine: inline VALUES table in FROM position, joined against a
    // real table — the portable form with a mandatory t(cols) alias
    // list (Spark would default to col1…, DuckDB to col0…)
    "ql_values_table" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT r.r_name, t.label, toint(t.pri) AS pri
          |FROM region r
          |JOIN (VALUES (0, "africa-x", 5), (1, "america-x", 4), (2, "asia-x", 3))
          |  AS t(rk, label, pri) ON r.r_regionkey == t.rk
          |ORDER BY pri""".stripMargin),
      Some("""SELECT r.r_name, t.label, CAST(t.pri AS BIGINT) AS pri
             |FROM region r
             |JOIN (VALUES (0, 'africa-x', 5), (1, 'america-x', 4), (2, 'asia-x', 3))
             |  AS t(rk, label, pri) ON r.r_regionkey = t.rk
             |ORDER BY pri""".stripMargin)),

    // engine: DISTINCT ON (DuckDB/Postgres dialect) — each customer's
    // most expensive order; the ORDER BY decides the kept row (price
    // desc, orderkey as the total tiebreak)
    "ql_distinct_on" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT DISTINCT ON (o_custkey)
          |  toint(o_custkey) AS ck, toint(o_orderkey) AS ok, o_totalprice
          |FROM orders
          |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin),
      Some("""SELECT DISTINCT ON (o_custkey)
             |  CAST(o_custkey AS BIGINT) AS ck, CAST(o_orderkey AS BIGINT) AS ok,
             |  o_totalprice
             |FROM orders
             |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // engine: DuckDB star modifiers — * EXCLUDE drops columns from the
    // expansion, * REPLACE substitutes in place keeping name+position
    "ql_star_modifiers" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT * EXCLUDE (n_regionkey) REPLACE (string.uppercase(n_name) AS n_name)
          |FROM nation ORDER BY n_nationkey""".stripMargin),
      Some("""SELECT * EXCLUDE (n_regionkey) REPLACE (upper(n_name) AS n_name)
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // engine: GROUP BY ALL (keys = every non-aggregate select expr)
    // plus ordinal ORDER BY — both the DuckDB spellings
    "ql_group_by_all" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, max(l_quantity) AS top_qty
          |FROM lineitem GROUP BY ALL ORDER BY 1, 2""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, max(l_quantity) AS top_qty
             |FROM lineitem GROUP BY ALL ORDER BY 1, 2""".stripMargin)),

    // engine: ORDER BY ALL (every select column, left to right) with an
    // ordinal GROUP BY
    "ql_order_by_all" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT n_regionkey, count(*) AS n FROM nation
          |GROUP BY 1 ORDER BY ALL""".stripMargin),
      Some("""SELECT n_regionkey, count(*) AS n FROM nation
             |GROUP BY 1 ORDER BY ALL""".stripMargin)),

    // engine: correlated-aggregate LATERAL — one row per outer row,
    // empty groups keep the row with count 0 (the rewrite completes the
    // aggregate side rather than rescanning per row)
    "ql_lateral_agg" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT r.r_name, l.n FROM region r,
          |LATERAL (SELECT count(*) AS n FROM nation
          |         WHERE n_regionkey == r.r_regionkey AND n_nationkey < 3) l
          |ORDER BY r.r_name""".stripMargin),
      Some("""SELECT r.r_name, l.n FROM region r,
             |LATERAL (SELECT count(*) AS n FROM nation
             |         WHERE n_regionkey = r.r_regionkey AND n_nationkey < 3) l
             |ORDER BY r.r_name""".stripMargin)),

    // engine: LIMIT-k LATERAL — top-2 orders per customer, planned as
    // ONE join + ONE rank window (never a per-outer-row rescan)
    "ql_lateral_topk" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT toint(c.c_custkey) AS ck, toint(l.ok) AS ok, l.price
          |FROM customer c,
          |LATERAL (SELECT o_orderkey AS ok, o_totalprice AS price FROM orders
          |         WHERE o_custkey == c.c_custkey
          |         ORDER BY price DESC, ok LIMIT 2) l
          |ORDER BY ck, price DESC, ok""".stripMargin),
      Some("""SELECT CAST(c.c_custkey AS BIGINT) AS ck, CAST(l.ok AS BIGINT) AS ok,
             |  l.price
             |FROM customer c,
             |LATERAL (SELECT o_orderkey AS ok, o_totalprice AS price FROM orders
             |         WHERE o_custkey = c.c_custkey
             |         ORDER BY price DESC, ok LIMIT 2) l
             |ORDER BY ck, price DESC, ok""".stripMargin)),

    // engine: CORRELATED scalar subquery in WHERE — rows carrying their
    // order's max quantity (ties kept); planned as one grouped
    // aggregate joined back (the aggregate-LATERAL shape), never a
    // per-row rescan
    "ql_corr_scalar_where" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity FROM lineitem l
          |WHERE l.l_quantity == (SELECT max(l2.l_quantity) FROM lineitem l2
          |                       WHERE l2.l_orderkey == l.l_orderkey)
          |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin),
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_quantity FROM lineitem l
             |WHERE l.l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
             |                      WHERE l2.l_orderkey = l.l_orderkey)
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    // engine: ASOF JOIN through the dialect — each click pairs with the
    // latest at-or-before signup of the same user; INNER drops clicks
    // with no prior signup. Planned as a tagged union + ONE window —
    // no join operator at all (PlanSpec gates the shape).
    "ql_asof_join" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT toint(l.event_id) AS eid, toint(l.user_id) AS uid2, sval
          |FROM (SELECT event_id, user_id, ts FROM events
          |      WHERE event_type == "click") AS l
          |ASOF JOIN (SELECT user_id AS uid, ts AS sts, value AS sval
          |           FROM events WHERE event_type == "signup") AS r
          |  ON l.user_id == uid AND l.ts >= sts
          |ORDER BY eid""".stripMargin),
      Some("""SELECT CAST(l.event_id AS BIGINT) AS eid,
             |  CAST(l.user_id AS BIGINT) AS uid2, r.sval
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click') l
             |ASOF JOIN (SELECT user_id AS uid, ts AS sts, value AS sval
             |           FROM events WHERE event_type = 'signup') r
             |  ON l.user_id = r.uid AND l.ts >= r.sts
             |ORDER BY eid""".stripMargin)),

    // engine: ASOF LEFT JOIN — clicks with no prior signup survive with
    // a NULL signup value
    "ql_asof_left_join" -> Q(
      (s, d) => session(s, d).sql(
        """SELECT toint(l.event_id) AS eid, sval
          |FROM (SELECT event_id, user_id, ts FROM events
          |      WHERE event_type == "click") AS l
          |ASOF LEFT JOIN (SELECT user_id AS uid, ts AS sts, value AS sval
          |                FROM events WHERE event_type == "signup") AS r
          |  ON l.user_id == uid AND l.ts >= sts
          |ORDER BY eid""".stripMargin),
      Some("""SELECT CAST(l.event_id AS BIGINT) AS eid, r.sval
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT user_id AS uid, ts AS sts, value AS sval
             |                FROM events WHERE event_type = 'signup') r
             |  ON l.user_id = r.uid AND l.ts >= r.sts
             |ORDER BY eid""".stripMargin)),
  )
}
