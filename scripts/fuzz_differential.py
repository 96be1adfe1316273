#!/usr/bin/env python3
"""Seeded randomized DIFFERENTIAL fuzz of the subquery/predicate grammar
against DuckDB.

Generates N random queries over the parity-safe idiom space (integer
columns and extrema only — no cross-row float sums, no LIMIT), runs
them through the engine via graft.SqlRun, then replays them in DuckDB
through scripts/verify_local.py's bit-exact comparator.

The grammar concentrates on exactly the machinery the curated oracle
rows gate one shape at a time: correlated/uncorrelated IN / NOT IN /
EXISTS / NOT EXISTS / quantified ANY-ALL / scalar subqueries — as
top-level WHERE conjuncts, under OR, inside arithmetic, projected as
3VL values, and in HAVING — with NULL injection on both operands.

Grammar v3 (r13) adds the round's new positions and the aggregate/
window outers the r12 VERDICT asked for: window FRAMES
(ROWS/RANGE BETWEEN, tie-stable items over unique order keys),
ROLLUP/CUBE outers, DISTINCT ON, subqueries inline in ORDER BY
(+LIMIT so ordering is hash-visible; count(*) values only — a NULL
sort key would expose the engines' different NULLS defaults, which is
an ORDER BY dialect difference, not a subquery bug), QUALIFY with
subquery atoms next to an inline window, and column guards
(`x IF pred` vs the oracle's `CASE WHEN pred THEN x END`).

Grammar v4 (r16) adds the legs the curated rows gate but randomized
runs never exercised: SELECT-position scalar subqueries (plain outers,
FROM-less statements, post-aggregate expressions, and INSIDE aggregate
arguments — the planner's lazy `__pasq` machinery and its r15
aggregate-arg passthrough), aggregate FILTER (WHERE) clauses,
GROUP BY GROUPING SETS with GROUPING() disambiguators, and inline
derived-table outers (correlated atoms resolving through a subquery
alias instead of a CTE name). Scalar value items stay on BIGINT
columns (SCALAR_BIGINT) so projected widths agree bit-exactly; sums
are excluded everywhere (DuckDB widens BIGINT sums to HUGEINT).

Quantified atoms hand DuckDB an ANSI-equivalent CASE/EXISTS
FORMULATION instead of its native ANY/ALL: DuckDB 1.0.0's decorrelated
quantified comparisons are wrong on two edges this fuzzer found on its
first run (NULL = ANY over a slice containing NULL keeps the row — it
NULL-matches; an empty slice with an extra inner conjunct verdicts
NULL instead of FALSE for projected > ANY), confirmed against both the
EXISTS rewrite in DuckDB itself and this engine's brute-force 3VL
property gate. Differential hygiene also improves: the engine's direct
lowering is checked against a structurally DIFFERENT formulation.

Oracle version pin (VERDICT r15 #7): this container's DuckDB is 1.0.0
and the environment has no egress (pip resolve against the offline
index fails with name-resolution errors — verified r16), so the
IS TRUE / CASE-EXISTS workarounds for 1.0.0's decorrelation bugs
(module notes above) stay. On a container with DuckDB >= 1.1, retry
the native renderings: drop the `(ne) IS TRUE` wrap below and
quant_pair's CASE/EXISTS formulation, run two seeds >= 250, and keep
whichever rendering agrees.

Usage:
  python3 scripts/fuzz_differential.py [sfDir] [N] [seed] [report]
Defaults: /root/testdata/sf0.001, 300, 12, no report file.
Exit 0 iff every generated query matches DuckDB.
"""
import random
import subprocess
import sys
import os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 12
REPORT = sys.argv[4] if len(sys.argv) > 4 else None
OUT = "/tmp/fuzz_differential_out"
TSV = "/tmp/fuzz_differential_queries.tsv"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

rng = random.Random(SEED)

# Big fixtures: the CASE/EXISTS oracle rendering of an UNCORRELATED
# quantified/IN atom whose inner item is a PLAIN COLUMN leaves DuckDB a
# non-decorrelatable `EXISTS(... WHERE (x op col) IS TRUE)` — a nested
# loop over |outer| x |inner| (hours at sf0.1; found live when the r13
# sf0.1 leg wedged). The ENGINE side is fine either way — this is an
# oracle-cost restriction only: at big SFs those atoms force an
# AGGREGATE item, whose rendering DuckDB hoists (uncorrelated agg
# computed once) or decorrelates (equality conjunct present).
BIG_SF = any(t in SF for t in ("sf0.1", "sf1", "sf10"))

# outer table -> (alias, key columns, [(inner table, correlation pred, inner int cols)])
SCOPES = {
    "orders": ("o", ["o_orderkey", "o_custkey"],
               [("customer", "c_custkey = o.o_custkey", ["c_custkey", "c_nationkey"]),
                ("lineitem", "l_orderkey = o.o_orderkey", ["l_quantity", "l_linenumber"])]),
    "customer": ("c", ["c_custkey", "c_nationkey"],
                 [("orders", "o_custkey = c.c_custkey", ["o_orderkey", "o_custkey"])]),
    "lineitem": ("l", ["l_orderkey", "l_linenumber", "l_quantity"],
                 [("orders", "o_orderkey = l.l_orderkey", ["o_orderkey", "o_custkey"])]),
}
OPS = ["=", "!=", "<", "<=", ">", ">="]


def int_expr(col):
    """An integer expression over col, sometimes NULL-injected."""
    r = rng.random()
    if r < 0.5:
        return col
    if r < 0.75:
        return f"{col} % {rng.randint(2, 9)}"
    return (f"(CASE WHEN {col} % {rng.randint(2, 7)} = 0 "
            f"THEN NULL ELSE {col} END)")


def inner_parts(inner, corr_pred, cols, correlated):
    """The pieces of a subquery body, composable into the native form
    and into the CASE/EXISTS oracle rewrite for quantified atoms."""
    c = rng.choice(cols)
    r = rng.random()
    if BIG_SF and not correlated:
        r = max(r, 0.5)  # force an aggregate item (see BIG_SF note)
    if r < 0.5:
        item, is_agg = int_expr(c), False
    elif r < 0.7:
        item, is_agg = f"max({int_expr(c)})", True
    elif r < 0.9:
        item, is_agg = f"min({int_expr(c)})", True
    else:
        item, is_agg = "count(*)", True
    conds = []
    if correlated:
        conds.append(corr_pred)
    if rng.random() < 0.5:
        conds.append(f"{int_expr(rng.choice(cols))} "
                     f"{rng.choice(OPS)} {rng.randint(0, 40)}")
    group = having = ""
    if is_agg and item != "count(*)" and rng.random() < 0.35:
        group = f"{rng.choice(cols)} % 2"
        if rng.random() < 0.5:
            having = f"count(*) >= {rng.randint(1, 3)}"
    return dict(inner=inner, item=item, is_agg=is_agg, conds=conds,
                group=group, having=having)


def native_sub(p):
    where = f" WHERE {' AND '.join(p['conds'])}" if p["conds"] else ""
    g = f" GROUP BY {p['group']}" if p["group"] else ""
    h = f" HAVING {p['having']}" if p["having"] else ""
    return f"(SELECT {p['item']} FROM {p['inner']}{where}{g}{h})"


def quant_pair(x, op, quant, p):
    """(engine_text, oracle_text) for `x op ANY|ALL (sub)`: the engine
    gets the native quantified form, the oracle an ANSI-exact
    CASE/EXISTS rendering (see module docstring)."""
    eng = f"{x} {op} {quant if quant != 'SOME' else rng.choice(['ANY', 'SOME'])} {native_sub(p)}"
    where = f" WHERE {' AND '.join(p['conds'])}" if p["conds"] else ""

    def ex(tv):
        test = f"({x} {op} {p['item']}) IS {tv}"
        if p["group"]:
            h = f"{p['having']} AND {test}" if p["having"] else test
            return (f"EXISTS (SELECT 1 FROM {p['inner']}{where} "
                    f"GROUP BY {p['group']} HAVING {h})")
        if p["is_agg"]:
            return f"EXISTS (SELECT 1 FROM {p['inner']}{where} HAVING {test})"
        conds = p["conds"] + [test]
        return f"EXISTS (SELECT 1 FROM {p['inner']} WHERE {' AND '.join(conds)})"

    if quant in ("ANY", "SOME"):
        ora = (f"(CASE WHEN {ex('TRUE')} THEN TRUE "
               f"WHEN {ex('NULL')} THEN NULL ELSE FALSE END)")
    else:
        ora = (f"(CASE WHEN {ex('FALSE')} THEN FALSE "
               f"WHEN {ex('NULL')} THEN NULL ELSE TRUE END)")
    return eng, ora


def in_pair(x, neg, p):
    """(engine_text, oracle_text) for `x [NOT] IN (sub)`. DuckDB's
    native correlated IN shares ANY's broken decorrelation (projected
    empty-slice verdicts NULL instead of FALSE when the value
    expression can be NULL — found live by this fuzzer), so the oracle
    side gets the same ANSI-exact CASE/EXISTS rendering: IN ≡ = ANY,
    NOT IN ≡ 3VL NOT of it."""
    eng = f"{x} {'NOT ' if neg else ''}IN " + native_sub(p)
    _, any_ora = quant_pair(x, "=", "ANY", p)
    ora = f"(NOT {any_ora})" if neg else any_ora
    return eng, ora


def bool_atom(table, alias, keys):
    """One boolean atom as an (engine_text, oracle_text) pair."""
    inner, corr_pred, icols = rng.choice(SCOPES[table][2])
    correlated = rng.random() < 0.6
    x = int_expr(rng.choice(keys))
    r = rng.random()
    if r < 0.18:
        s = f"{x} {rng.choice(OPS)} {rng.randint(0, 2000)}"
        return s, s
    if r < 0.42:
        neg = rng.random() < 0.4
        p = inner_parts(inner, corr_pred, icols, correlated)
        return in_pair(x, neg, p)
    if r < 0.62:
        neg = "NOT " if rng.random() < 0.4 else ""
        conds = [corr_pred] if correlated else []
        oconds = list(conds)
        # r15 grammar: NON-EQUALITY cross-scope conjuncts
        # (inner.col <op> outer.col) — the engine folds these into the
        # semi/anti-join condition (equality-keyed when corr_pred is
        # present, a deliberate nested loop otherwise). Small-SF only:
        # DuckDB's side is a nested loop too. The ORACLE side wraps the
        # conjunct in `(…) IS TRUE`: DuckDB 1.0.0's decorrelation of
        # equality + non-equality + inner-only correlated EXISTS is
        # WRONG (found live by this grammar's first run: a
        # contradictory `c = o.k AND c > o.k AND c < 15` matched 132
        # rows; drop the inner-only conjunct and it correctly matches
        # 0). IS TRUE blocks the broken rewrite and is conjunct-
        # equivalent (UNKNOWN→FALSE either way; operands un-NULLable
        # here anyway).
        if not BIG_SF and rng.random() < (0.4 if correlated else 0.15):
            # VERDICT r15 #3: keys may already carry a join alias
            # (`j2.<col>` when the outer is a JOIN shape) — prefixing
            # those again rendered the malformed 3-part `l.j2.<col>`
            # that DuckDB refuses (binder error) and the engine, pre-
            # r16, silently suffix-bound. Qualify bare keys only.
            ok = rng.choice(keys)
            oref = ok if "." in ok else f"{alias}.{ok}"
            ne = (f"{rng.choice(icols)} "
                  f"{rng.choice(['<', '<=', '>', '>=', '!='])} "
                  f"{oref}")
            conds.append(ne)
            oconds.append(f"({ne}) IS TRUE")
        if rng.random() < 0.5 or not conds:
            ic = f"{rng.choice(icols)} {rng.choice(OPS)} {rng.randint(0, 40)}"
            conds.append(ic)
            oconds.append(ic)
        s = f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE {' AND '.join(conds)})"
        o = f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE {' AND '.join(oconds)})"
        return s, o
    if r < 0.85:
        quant = rng.choice(["ANY", "ALL", "SOME"])
        p = inner_parts(inner, corr_pred, icols, correlated)
        return quant_pair(x, rng.choice(OPS), quant, p)
    # scalar comparison, sometimes nested in arithmetic
    p = inner_parts(inner, corr_pred, icols, correlated)
    if not p["is_agg"]:
        p["item"] = f"max({p['item']})"
        p["is_agg"] = True
    p["group"] = p["having"] = ""  # scalar: exactly one row
    sub = native_sub(p)
    if rng.random() < 0.4:
        sub = f"{rng.randint(1, 5)} + {sub}"
    s = f"{x} {rng.choice(OPS)} {sub}"
    return s, s


def combine(pairs, template):
    return (template.format(*[p[0] for p in pairs]),
            template.format(*[p[1] for p in pairs]))


def predicate(table, alias, keys):
    a = bool_atom(table, alias, keys)
    r = rng.random()
    if r < 0.45:
        return a
    b = bool_atom(table, alias, keys)
    if r < 0.65:
        return combine([a, b], "{0} AND {1}")
    if r < 0.85:
        return combine([a, b], "{0} OR {1}")
    c = bool_atom(table, alias, keys)
    return combine([a, b, c], "{0} AND ({1} OR {2})")


def filter_query(table, plain=False):
    alias, keys, _ = SCOPES[table]
    p = predicate(table, alias, keys)
    if not plain and rng.random() < 0.2:
        # DISTINCT path with a coarse projection so the dedup matters.
        # Dual text: the dialect promotes int arithmetic to BIGINT while
        # DuckDB keeps the column's width (and l_quantity is DECIMAL in
        # the fixture) — the oracle side casts to BIGINT explicitly,
        # the same idiom every curated oracle row uses
        m = rng.randint(2, 6)
        etext = f"SELECT DISTINCT {keys[0]} % {m} AS g FROM {table} {alias} WHERE {{0}}"
        otext = (f"SELECT DISTINCT CAST({keys[0]} % {m} AS BIGINT) AS g "
                 f"FROM {table} {alias} WHERE {{0}}")
        return (etext.format(p[0]), otext.format(p[1]))
    proj = ", ".join(keys)
    return combine([p], f"SELECT {proj} FROM {table} {alias} WHERE {{0}}")


# tie-stable window items (equal rows get equal values, so the
# order-insensitive multiset compare is deterministic); sum(int) is
# excluded — DuckDB widens it to HUGEINT while Spark keeps int64
WINDOW_ITEMS = ["count(*)", "max({v})", "min({v})", "rank()", "dense_rank()"]

# BIGINT-valued inner columns per (outer, inner) edge: scalar-subquery
# VALUE items project into the outer row, so their width must agree
# bit-exactly across engines (int32/double inner cols stay usable for
# inner-side conditions, where only the boolean verdict escapes)
SCALAR_BIGINT = {
    ("orders", "customer"): ["c_custkey"],
    ("orders", "lineitem"): ["l_orderkey", "l_partkey", "l_suppkey"],
    ("customer", "orders"): ["o_orderkey", "o_custkey"],
    ("lineitem", "orders"): ["o_orderkey", "o_custkey"],
}

# tables with a UNIQUE single key: window frames and ORDER BY+LIMIT
# shapes need a total order for determinism (lineitem has none —
# (l_orderkey, l_linenumber) is NOT unique in the fixtures)
UNIQUE_KEY = {"orders": "o_orderkey", "customer": "c_custkey"}
# BIGINT key columns per table (modulo arithmetic stays BIGINT in both
# engines; INTEGER columns would need CAST dual-text everywhere)
BIGINT_KEYS = {"orders": ["o_orderkey", "o_custkey"],
               "customer": ["c_custkey"],
               "lineitem": ["l_orderkey"]}


def frame_query(table):
    """Window FRAMES (v3): ROWS frames order by the unique key (every
    row its own frame — deterministic), RANGE frames may order by a
    coarse expression (peers share values — tie-stable)."""
    uk = UNIQUE_KEY[table]
    alias, keys, _ = SCOPES[table]
    v = rng.choice(BIGINT_KEYS[table])
    item = rng.choice(["count(*)", f"max({v})", f"min({v})"])
    part = f"{rng.choice(BIGINT_KEYS[table])} % {rng.randint(2, 5)}"
    if rng.random() < 0.6:
        lo = rng.randint(1, 4)
        fr = rng.choice([
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {lo} PRECEDING AND {rng.randint(1, 3)} FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"])
        ordc = uk
    else:
        fr = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        ordc = f"{rng.choice(BIGINT_KEYS[table])} % {rng.randint(2, 7)}"
    s = (f"SELECT {uk}, {item} OVER (PARTITION BY {part} "
         f"ORDER BY {ordc} {fr}) AS fv FROM {table} {alias}")
    return s, s


def rollup_query(table):
    """ROLLUP/CUBE outers (v3): super-aggregate rows with NULL keys,
    count/max aggregates (BIGINT-safe)."""
    alias, keys, _ = SCOPES[table]
    ks = BIGINT_KEYS[table]
    k1 = f"{rng.choice(ks)} % {rng.randint(2, 4)}"
    k2 = f"{rng.choice(ks)} % {rng.randint(5, 8)}"
    op = rng.choice(["ROLLUP", "CUBE"])
    aggs = "count(*) AS n, max(" + rng.choice(ks) + ") AS mx"
    if rng.random() < 0.5:
        s = (f"SELECT {k1} AS g1, {k2} AS g2, {aggs} FROM {table} {alias} "
             f"GROUP BY {op}({k1}, {k2})")
    else:
        s = (f"SELECT {k1} AS g1, {aggs} FROM {table} {alias} "
             f"GROUP BY {op}({k1})")
    if rng.random() < 0.4:
        s += f" HAVING count(*) >= {rng.randint(1, 3)}"
    return s, s


def distinct_on_query(table):
    """DISTINCT ON (v3): the kept row is the first under a TOTAL order
    (group expr, unique key) — deterministic winners in both engines."""
    uk = UNIQUE_KEY[table]
    alias, keys, _ = SCOPES[table]
    g = f"{rng.choice(BIGINT_KEYS[table])} % {rng.randint(2, 6)}"
    d = rng.choice(["", " DESC"])
    s = (f"SELECT DISTINCT ON ({g}) {g} AS g, {uk} FROM {table} {alias} "
         f"ORDER BY {g}, {uk}{d}")
    return s, s


def order_by_subq_query(table):
    """Subquery inline in ORDER BY + LIMIT (v3, the r13 position):
    count(*) correlated values only (never NULL — empty slices sort as
    0, so the engines' different NULLS defaults stay out of scope);
    unique-key tiebreak makes the LIMIT kept-set deterministic."""
    uk = UNIQUE_KEY[table]
    alias, keys, _ = SCOPES[table]
    inner, corr_pred, icols = rng.choice(SCOPES[table][2])
    conds = [corr_pred]
    if rng.random() < 0.5:
        conds.append(f"{rng.choice(icols)} {rng.choice(OPS)} {rng.randint(0, 40)}")
    d = rng.choice(["", " DESC"])
    sub = f"(SELECT count(*) FROM {inner} WHERE {' AND '.join(conds)})"
    if rng.random() < 0.3:
        sub = f"{sub} % {rng.randint(2, 5)}"
    s = (f"SELECT {uk} FROM {table} {alias} "
         f"ORDER BY {sub}{d}, {uk} LIMIT {rng.randint(10, 50)}")
    return s, s


def qualify_subq_query(table):
    """QUALIFY with subquery atoms next to an inline window (v3, the
    r13 position): row_number over a total order keeps determinism; the
    subquery atom rides the dual-text machinery (quantified atoms get
    the CASE/EXISTS oracle rendering inside QUALIFY too)."""
    uk = UNIQUE_KEY[table]
    alias, keys, _ = SCOPES[table]
    part = f"{rng.choice(BIGINT_KEYS[table])} % {rng.randint(2, 5)}"
    rk = rng.randint(1, 4)
    w = f"row_number() OVER (PARTITION BY {part} ORDER BY {uk}) <= {rk}"
    a = bool_atom(table, alias, keys)
    tmpl = (f"SELECT {uk} FROM {table} {alias} "
            f"QUALIFY {w} AND {{0}}")
    return combine([a], tmpl)


def scalar_sub(table):
    """A guaranteed-single-row scalar subquery (aggregate item, no
    GROUP BY) over a BIGINT value column; correlated against the outer
    alias 60% of the time. Text is engine/oracle-identical."""
    inner, corr_pred, icols = rng.choice(SCOPES[table][2])
    vcol = rng.choice(SCALAR_BIGINT[(table, inner)])
    correlated = rng.random() < 0.6
    item = rng.choice([f"max({int_expr(vcol)})", f"min({int_expr(vcol)})",
                       "count(*)"])
    conds = [corr_pred] if correlated else []
    if rng.random() < 0.6 or not conds:
        conds.append(f"{int_expr(rng.choice(icols))} "
                     f"{rng.choice(OPS)} {rng.randint(0, 40)}")
    sub = f"(SELECT {item} FROM {inner} WHERE {' AND '.join(conds)})"
    if rng.random() < 0.3:
        sub = f"{rng.randint(1, 5)} + {sub}"
    elif rng.random() < 0.2:
        sub = f"{sub} % {rng.randint(2, 7)}"
    return sub, correlated


def uncorr_scalar_sub(table):
    s, corr = scalar_sub(table)
    while corr:
        s, corr = scalar_sub(table)
    return s


def select_scalar_query(table):
    """SELECT-position scalar subqueries (v4): projected values through
    the planner's lazy `__pasq` path — plain outers, FROM-less
    statements, post-aggregate expressions, and inside aggregate
    arguments (the r15 passthrough)."""
    alias, keys, _ = SCOPES[table]
    r = rng.random()
    if r < 0.15:
        # FROM-less: the whole statement is one probe row
        subs = [uncorr_scalar_sub(table)
                for _ in range(rng.randint(1, 2))]
        items = ", ".join(f"{s} AS s{j}" for j, s in enumerate(subs))
        q = f"SELECT {items}"
        return q, q
    if r < 0.45:
        # grouped outer, scalar in the POST-AGGREGATE expression
        # (uncorrelated: hoisted once, added after the hash aggregate)
        k = rng.choice(BIGINT_KEYS[table])
        g = f"{k} % {rng.randint(2, 5)}"
        sub = uncorr_scalar_sub(table)
        q = (f"SELECT {g} AS g, max({int_expr(k)}) + {sub} AS s, "
             f"count(*) AS n FROM {table} {alias} GROUP BY {g}")
        return q, q
    if r < 0.6:
        # scalar INSIDE the aggregate argument (pre-agg passthrough)
        k = rng.choice(BIGINT_KEYS[table])
        g = f"{k} % {rng.randint(2, 5)}"
        sub = uncorr_scalar_sub(table)
        agg = rng.choice(["max", "min"])
        q = (f"SELECT {g} AS g, {agg}({k} + {sub}) AS s "
             f"FROM {table} {alias} GROUP BY {g}")
        return q, q
    # plain outer, 1-2 projected scalars (correlated exercises the
    # aggregate-LATERAL lowering with empty-group NULL completion)
    subs = [scalar_sub(table)[0] for _ in range(rng.randint(1, 2))]
    items = ", ".join(f"{s} AS s{j}" for j, s in enumerate(subs))
    w = (f" WHERE {keys[0]} % {rng.randint(2, 5)} = 0"
         if rng.random() < 0.4 else "")
    proj = ", ".join(keys)
    q = f"SELECT {proj}, {items} FROM {table} {alias}{w}"
    return q, q


def agg_filter_query(table):
    """Aggregate FILTER (WHERE …) clauses (v4): per-aggregate
    predicates, NULL-injected sometimes, next to unfiltered siblings
    and under HAVING. Text is engine/oracle-identical."""
    alias, keys, _ = SCOPES[table]
    k = rng.choice(BIGINT_KEYS[table])
    g = f"{k} % {rng.randint(2, 5)}"

    def pred():
        return (f"{int_expr(rng.choice(keys))} "
                f"{rng.choice(OPS)} {rng.randint(0, 2000)}")

    items = [f"count(*) AS n_all",
             f"count(*) FILTER (WHERE {pred()}) AS n_f",
             f"max({int_expr(k)}) FILTER (WHERE {pred()}) AS mx_f"]
    if rng.random() < 0.4:
        items.append(f"min({k}) FILTER (WHERE {pred()}) AS mn_f")
    q = (f"SELECT {g} AS g, {', '.join(items)} "
         f"FROM {table} {alias} GROUP BY {g}")
    if rng.random() < 0.35:
        q += f" HAVING count(*) >= {rng.randint(1, 3)}"
    return q, q


# low-cardinality grouping-set key columns (bare columns — both engines
# keep the parquet width, so int32/string keys are safe to project)
GSET_KEYS = {"orders": ["o_orderstatus", "o_orderpriority", "o_custkey"],
             "customer": ["c_mktsegment", "c_nationkey"],
             "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"]}


def grouping_sets_query(table):
    """GROUP BY GROUPING SETS + GROUPING() (v4): random set lists over
    two bare key columns, GROUPING() disambiguating the generated
    NULLs. Text is engine/oracle-identical."""
    alias, keys, _ = SCOPES[table]
    k1, k2 = rng.sample(GSET_KEYS[table], 2)
    # the full (k1, k2) set is always present: both engines require
    # every projected / GROUPING() column to appear in SOME set
    opts = [f"({k1})", f"({k2})", "()"]
    sets = [f"({k1}, {k2})"] + rng.sample(opts, rng.randint(1, 2))
    rng.shuffle(sets)
    aggs = f"count(*) AS n, max({rng.choice(BIGINT_KEYS[table])}) AS mx"
    q = (f"SELECT {k1} AS g1, {k2} AS g2, grouping({k1}) AS gg1, "
         f"grouping({k2}) AS gg2, {aggs} FROM {table} {alias} "
         f"GROUP BY GROUPING SETS ({', '.join(sets)})")
    if rng.random() < 0.3:
        q += f" HAVING count(*) >= {rng.randint(1, 3)}"
    return q, q


def derived_query(table):
    """Inline derived-table outers (v4): the CTE leg's scope test, but
    through a FROM-subquery alias — correlated atoms must resolve the
    outer reference into the derived relation."""
    alias, keys, _ = SCOPES[table]
    p = predicate(table, alias, keys)
    proj = ", ".join(keys)
    inner_w = f"{keys[-1]} % {rng.randint(2, 4)} != 1"
    tmpl = (f"SELECT {proj} FROM (SELECT * FROM {table} "
            f"WHERE {inner_w}) {alias} WHERE {{0}}")
    return combine([p], tmpl)


def gen_query(i):
    """Returns (engine_sql, oracle_sql)."""
    table = rng.choice(list(SCOPES))
    alias, keys, _ = SCOPES[table]
    shape = rng.random()
    if shape < 0.20:
        # filter shape
        return filter_query(table)
    if shape < 0.34:
        # projected 3VL values; sometimes as a column GUARD instead
        # (engine `x IF pred` ≡ oracle `CASE WHEN pred THEN x END`) —
        # guarded value is a BARE column so output widths agree
        cols = [bool_atom(table, alias, keys) for _ in range(rng.randint(1, 2))]
        w = (f" WHERE {keys[0]} % {rng.randint(2, 5)} = 0"
             if rng.random() < 0.4 else "")
        items = []
        for j in range(len(cols)):
            if rng.random() < 0.3:
                v = rng.choice(keys)
                items.append((f"{v} IF {{{j}}} AS b{j}",
                              f"CASE WHEN {{{j}}} THEN {v} END AS b{j}"))
            else:
                items.append((f"{{{j}}} AS b{j}",) * 2)
        etmpl = (f"SELECT {keys[0]}, " + ", ".join(it[0] for it in items)
                 + f" FROM {table} {alias}{w}")
        otmpl = (f"SELECT {keys[0]}, " + ", ".join(it[1] for it in items)
                 + f" FROM {table} {alias}{w}")
        return (etmpl.format(*[p[0] for p in cols]),
                otmpl.format(*[p[1] for p in cols]))
    if shape < 0.41:
        # v3 outers over unique-key tables
        t2 = rng.choice(list(UNIQUE_KEY))
        return rng.choice([frame_query, distinct_on_query,
                           order_by_subq_query, qualify_subq_query])(t2)
    if shape < 0.45:
        # v3 rollup/cube outers (any table)
        return rollup_query(table)
    if shape < 0.49:
        # v4 grouping-sets outers (any table)
        return grouping_sets_query(table)
    if shape < 0.55:
        # set operations over two filter shapes of the same table
        # (plain projections only — the sides must be union-compatible)
        setop = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        a, b = filter_query(table, plain=True), filter_query(table, plain=True)
        return f"{a[0]} {setop} {b[0]}", f"{a[1]} {setop} {b[1]}"
    if shape < 0.61:
        # v4 inline derived-table outers
        return derived_query(table)
    if shape < 0.68:
        # CTE: prefilter the outer table, then fuzz predicates over it
        # (the CTE's columns are the outer keys; correlations reference
        # the CTE alias, exercising scope resolution through WITH)
        p = predicate(table, alias, keys)
        cte = (f"WITH w{i % 7} AS (SELECT * FROM {table} "
               f"WHERE {keys[-1]} % {rng.randint(2, 4)} != 1) ")
        proj = ", ".join(keys)
        tmpl = cte + f"SELECT {proj} FROM w{i % 7} {alias} WHERE {{0}}"
        return combine([p], tmpl)
    if shape < 0.76:
        # JOIN (inner or left) + predicate over the merged scope; a
        # LEFT join makes the right side's keys genuinely nullable. The
        # joined side is ALIAS-QUALIFIED (j2) so atom expressions over
        # its columns cannot be captured by a same-table subquery's
        # inner scope in the CASE/EXISTS oracle renderings
        inner, corr_pred, icols = rng.choice(SCOPES[table][2])
        jt = rng.choice(["JOIN", "LEFT JOIN"])
        jkeys = keys + [f"j2.{icols[0]}"]
        p = predicate(table, alias, jkeys)
        proj = ", ".join(keys) + f", j2.{icols[0]} AS jv"
        tmpl = (f"SELECT {proj} FROM {table} {alias} {jt} {inner} j2 "
                f"ON j2.{corr_pred} WHERE {{0}}")
        return combine([p], tmpl)
    if shape < 0.82:
        # window functions projected (tie-stable items only), sometimes
        # next to a boolean subquery column
        part = rng.choice(keys)
        other = rng.choice([k for k in keys if k != part] or keys)
        item = rng.choice(WINDOW_ITEMS).format(v=other)
        ordc = f" ORDER BY {other}" if "rank" in item else ""
        wexpr = f"{item} OVER (PARTITION BY {part}{ordc}) AS wv"
        if rng.random() < 0.5:
            b = bool_atom(table, alias, keys)
            tmpl = f"SELECT {part}, {wexpr}, {{0}} AS b0 FROM {table} {alias}"
            return combine([b], tmpl)
        s = f"SELECT {part}, {wexpr} FROM {table} {alias}"
        return s, s
    if shape < 0.91:
        # v4 SELECT-position scalar subqueries
        return select_scalar_query(table)
    if shape < 0.95:
        # v4 aggregate FILTER clauses
        return agg_filter_query(table)
    # grouped shape with HAVING over the group key — the GROUP key must
    # BE the correlation key (post-agg, only group keys exist to
    # correlate on; anything else is invalid SQL in both engines)
    inner, corr_pred, icols = rng.choice(SCOPES[table][2])
    key = corr_pred.split(" = ")[1].replace(f"{alias}.", "")
    # correlate on the BARE group key name (alias is stripped post-agg)
    bare_corr = corr_pred.replace(f"{alias}.", "")
    head = (f"SELECT {key}, count(*) AS n FROM {table} {alias} "
            f"GROUP BY {key} HAVING ")
    r = rng.random()
    if r < 0.35:
        p = inner_parts(inner, bare_corr, icols, rng.random() < 0.5)
        s = f"{key} IN " + native_sub(p)
        return head + s, head + s
    if r < 0.6:
        p = inner_parts(inner, bare_corr, icols, rng.random() < 0.5)
        q = quant_pair(key, rng.choice(OPS), rng.choice(["ANY", "ALL"]), p)
        c = f"count(*) >= {rng.randint(1, 3)} AND "
        return head + c + q[0], head + c + q[1]
    if r < 0.8:
        item = rng.choice(["count(*)", f"max({rng.choice(icols)})"])
        conds = [bare_corr] if rng.random() < 0.7 else []
        if rng.random() < 0.5 or not conds:
            conds.append(f"{rng.choice(icols)} {rng.choice(OPS)} {rng.randint(0, 40)}")
        s = (f"count(*) >= {rng.randint(0, 2)} + "
             f"(SELECT {item} FROM {inner} WHERE {' AND '.join(conds)})")
        return head + s, head + s
    s = (f"EXISTS (SELECT 1 FROM {inner} WHERE {bare_corr}) "
         f"AND count(*) >= {rng.randint(1, 2)}")
    return head + s, head + s


def main():
    queries = [(f"fz{i:04d}",) + gen_query(i) for i in range(N)]
    with open(TSV, "w") as f:
        for name, esql, osql in queries:
            f.write(f"{name}\t{esql}\t{osql}\n")
    subprocess.run(["rm", "-rf", OUT], check=True)
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    run = subprocess.run(
        ["java", "-cp", cp, "graft.SqlRun", SF, TSV, OUT],
        capture_output=True, text=True)
    engine_fail = [l for l in run.stderr.splitlines() if "[sqlrun]" in l]
    cmp = subprocess.run(
        [sys.executable, f"{REPO}/scripts/verify_local.py", OUT, SF],
        capture_output=True, text=True)
    lines = cmp.stdout.splitlines()
    fails = [l for l in lines if l.startswith("FAIL")]
    summary = (f"fuzz_differential: seed={SEED} n={N} sf={SF} -> "
               f"{N - len(fails)} match, {len(fails)} mismatch, "
               f"{len(engine_fail)} engine errors")
    print(summary)
    byname = {n: (e, o) for n, e, o in queries}
    for l in engine_fail[:10]:
        print("  " + l)
    for l in fails[:10]:
        name = l.split()[1].rstrip(":")
        e, o = byname.get(name, ("?", "?"))
        print(f"  {l}\n    engine: {e}\n    oracle: {o}")
    if REPORT:
        with open(REPORT, "w") as f:
            f.write(summary + "\n")
            for l in engine_fail + fails:
                f.write(l + "\n")
    sys.exit(1 if (fails or engine_fail) else 0)


if __name__ == "__main__":
    main()
