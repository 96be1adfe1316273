#!/usr/bin/env python3
"""Seeded randomized DIFFERENTIAL fuzz of the DML/MERGE surface against
DuckDB (VERDICT r14 #4 — the one statement family with zero randomized
coverage through r14; GraftSession.runMerge and the DML WHERE/SET
machinery were oracle+spec gated on fixed shapes only).

Each case builds a randomized base table and CDC delta (deterministic
from the seed), applies 1-3 randomized DML statements — INSERT…SELECT,
UPDATE with correlated/uncorrelated subquery SET and subquery WHEREs,
DELETE with IN / NOT IN / EXISTS / quantified-ALL WHEREs, MERGE INTO
with matched-DELETE / matched-UPDATE / conditional NOT-MATCHED-INSERT
clauses — and compares the FINAL TABLE STATE bit-exactly via
scripts/verify_local.py's comparator (columns sorted, order-insensitive
rows). Engine cases run as one `;`-script through graft.SqlRun
(gs.sqlScript); every case uses its own table names so the shared
session carries no cross-case state.

Oracle formulation notes (differential hygiene — the oracle is a
structurally DIFFERENT rendering, same ANSI semantics):
  - This container's DuckDB is 1.0.0, which has NO native MERGE INTO
    (verified: `MERGE` is a parser error). MERGE therefore replays as
    a snapshot script: CREATE TEMP pre AS target; DELETE matched-del;
    UPDATE matched-rest via correlated scalar SET; INSERT NOT EXISTS
    against the PRE-merge snapshot — the all-at-once semantics MERGE
    defines. Clause-gating conditions replay with the same
    UNKNOWN→skip reading the engine implements (coalesce(cond,false)):
    kind IS DISTINCT FROM for the fall-through clause, plain WHERE for
    the gated one.
  - Quantified DELETE WHEREs pin `v IS NOT NULL` and non-NULL inner
    items so ANY/ALL stay 2-valued: DuckDB 1.0.0's native quantified
    decorrelation has known 3VL edges (found by fuzz_differential r12)
    and the NOT EXISTS rendering used here is only ANSI-equal on the
    non-NULL plane.
  - MERGE cases keep delta ids UNIQUE (the correlated-scalar UPDATE
    rendering needs one source row per target row — exactly MERGE's
    own precondition); a separate AMBIGUITY leg feeds duplicate-id
    deltas and asserts the ENGINE refuses with its ambiguity error
    (no oracle: DuckDB has no statement to disagree with).

Usage:
  python3 scripts/fuzz_dml.py [N] [seed] [report]
Defaults: 200, 9157, no report file. Exit 0 iff every differential
case matches DuckDB and every ambiguity case refuses.
"""
import random
import subprocess
import sys
import os

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 9157
REPORT = sys.argv[3] if len(sys.argv) > 3 else None
SF = "/root/testdata/sf0.001"  # tables come from VALUES; SF only seeds the session
OUT = "/tmp/fuzz_dml_out"
TSV = "/tmp/fuzz_dml_queries.tsv"
AMB_TSV = "/tmp/fuzz_dml_ambiguous.tsv"
AMB_OUT = "/tmp/fuzz_dml_amb_out"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

rng = random.Random(SEED)


def lit(v):
    return "NULL" if v is None else str(v)


def gen_tables(i, unique_delta_ids, allow_null_delta_id):
    """Base rows (id unique & non-null, grp/v nullable) + delta rows."""
    n_t = rng.randint(15, 45)
    t_ids = rng.sample(range(0, 100), n_t)
    t_rows = [(tid,
               None if rng.random() < 0.12 else rng.randint(0, 4),
               None if rng.random() < 0.12 else rng.randint(-50, 50))
              for tid in t_ids]
    # first row fully non-null so VALUES type inference never sees an
    # all-NULL leading column on either engine
    t_rows[0] = (t_rows[0][0], rng.randint(0, 4), rng.randint(-50, 50))
    n_d = rng.randint(6, 20)
    if unique_delta_ids:
        d_ids = rng.sample(range(0, 140), n_d)
    else:
        d_ids = [rng.randint(0, 140) for _ in range(n_d)]
    d_rows = []
    for j, did in enumerate(d_ids):
        if allow_null_delta_id and rng.random() < 0.08:
            did = None
        amount = None if rng.random() < 0.15 else rng.randint(-30, 80)
        kind = rng.choice(["del", "up", "new", None])
        d_rows.append((did, amount, kind))
    d_rows[0] = (d_rows[0][0], rng.randint(-30, 80), rng.choice(["del", "up", "new"]))
    return t_rows, d_rows


def values_sql(rows, render_str):
    return ", ".join(
        "(" + ", ".join(render_str(v) if isinstance(v, str) else lit(v)
                        for v in r) + ")" for r in rows)


def setup_sql(i, t_rows, d_rows):
    t, d = f"t{i}", f"d{i}"
    tv = values_sql(t_rows, lambda s: f"'{s}'")
    dv_e = values_sql(d_rows, lambda s: f"'{s}'")
    dv_o = values_sql(d_rows, lambda s: f"'{s}'")
    eng = (f"CREATE TABLE {t} AS SELECT * FROM (VALUES {tv}) AS vt(id, grp, v); "
           f"CREATE TABLE {d} AS SELECT * FROM (VALUES {dv_e}) AS vd(id, amount, kind)")
    # explicit BIGINT columns: DuckDB's VALUES would infer INT32 and the
    # final-select casts keep both engines on one physical type anyway,
    # but typed DDL also keeps NULL-only tails from collapsing a column
    ora = (f"CREATE TABLE {t}(id BIGINT, grp BIGINT, v BIGINT); "
           f"INSERT INTO {t} VALUES {tv}; "
           f"CREATE TABLE {d}(id BIGINT, amount BIGINT, kind VARCHAR); "
           f"INSERT INTO {d} VALUES {dv_o}")
    return eng, ora


def gen_stmt(i, has_merge_slot):
    """One randomized DML statement as (engine_sql, oracle_sql, used_merge)."""
    t, d, pre = f"t{i}", f"d{i}", f"pre{i}"
    fam = rng.choice((["merge"] if has_merge_slot else []) +
                     ["ins", "upd_in", "upd_corr", "upd_scalar",
                      "del_in", "del_notin", "del_exists", "del_notexists",
                      "del_all"])
    if fam == "ins":
        pred_e, pred_o = rng.choice([
            ("amount > 10", "amount > 10"),
            ("kind = 'new'", "kind = 'new'"),
            ("amount IS NOT NULL AND amount < 0", "amount IS NOT NULL AND amount < 0"),
            (f"id IN (SELECT id FROM {t})", f"id IN (SELECT id FROM {t})"),
        ])
        grp_e = rng.choice(["abs(amount) % 5", "0", "NULL"])
        s = (f"INSERT INTO {t} (id, grp, v) "
             f"SELECT id + 1000, {grp_e}, amount FROM {d} WHERE {pred_e}")
        o = (f"INSERT INTO {t} "
             f"SELECT id + 1000, {grp_e.replace('abs(amount)', 'abs(amount)')}, amount "
             f"FROM {d} WHERE {pred_o}")
        return s, o, False
    if fam == "upd_in":
        delta = rng.randint(1, 9)
        s = (f"UPDATE {t} SET v = v + {delta} WHERE id IN "
             f"(SELECT id FROM {d} WHERE kind = 'up')")
        return s, s, False
    if fam == "upd_corr":
        s = (f"UPDATE {t} SET v = (SELECT max(amount) FROM {d} "
             f"WHERE {d}.id = {t}.id) WHERE EXISTS "
             f"(SELECT 1 FROM {d} WHERE {d}.id = {t}.id AND amount IS NOT NULL)")
        return s, s, False
    if fam == "upd_scalar":
        g = rng.randint(5, 9)
        s = (f"UPDATE {t} SET grp = {g} WHERE v > "
             f"(SELECT max(amount) FROM {d} WHERE kind = 'up')")
        return s, s, False
    if fam == "del_in":
        s = f"DELETE FROM {t} WHERE id IN (SELECT id FROM {d} WHERE kind = 'del')"
        return s, s, False
    if fam == "del_notin":
        # 3VL: a NULL id in the delta makes NOT IN delete NOTHING
        s = f"DELETE FROM {t} WHERE id NOT IN (SELECT id FROM {d})"
        return s, s, False
    if fam == "del_exists":
        s = (f"DELETE FROM {t} WHERE EXISTS (SELECT 1 FROM {d} "
             f"WHERE {d}.id = {t}.id AND {d}.amount > {t}.v)")
        return s, s, False
    if fam == "del_notexists":
        # non-equality correlated NOT EXISTS (r15 grammar v2): keeps
        # only rows some delta row dominates
        s = (f"DELETE FROM {t} WHERE NOT EXISTS (SELECT 1 FROM {d} "
             f"WHERE {d}.id = {t}.id AND {d}.amount >= {t}.v)")
        return s, s, False
    if fam == "del_all":
        # non-NULL plane only (see module doc): engine gets native ALL,
        # oracle gets the NOT EXISTS rendering
        s = (f"DELETE FROM {t} WHERE v IS NOT NULL AND v >= ALL "
             f"(SELECT amount FROM {d} WHERE amount IS NOT NULL)")
        o = (f"DELETE FROM {t} WHERE v IS NOT NULL AND NOT EXISTS "
             f"(SELECT 1 FROM {d} WHERE amount IS NOT NULL AND {t}.v < amount)")
        return s, o, False
    # merge
    has_del = rng.random() < 0.5
    has_ins = rng.random() < 0.75
    ins_cond = has_ins and rng.random() < 0.4
    # r15 grammar v2: sometimes TWO conditional matched-UPDATE clauses
    # (first-match-wins; a NULL condition falls through — the engine's
    # coalesce(cond,false) reading, which the CASE oracle mirrors)
    two_upd = rng.random() < 0.35
    upd_e, upd_o = rng.choice([
        ("t.v + d.amount", f"v + (SELECT d.amount FROM {d} d WHERE d.id = {t}.id)"),
        ("d.amount", f"(SELECT d.amount FROM {d} d WHERE d.id = {t}.id)"),
        ("2 * d.amount - 1", f"2 * (SELECT d.amount FROM {d} d WHERE d.id = {t}.id) - 1"),
    ])
    eng = [f"MERGE INTO {t} t USING {d} d ON t.id == d.id"]
    if has_del:
        eng.append("WHEN MATCHED AND d.kind == 'del' THEN DELETE")
    if two_upd:
        thr = rng.randint(10, 40)
        eng.append(f"WHEN MATCHED AND d.amount > {thr} THEN UPDATE SET v = d.amount")
        eng.append("WHEN MATCHED THEN UPDATE SET v = t.v + 1")
        upd_o = (f"CASE WHEN (SELECT d.amount FROM {d} d WHERE d.id = {t}.id) > {thr} "
                 f"THEN (SELECT d.amount FROM {d} d WHERE d.id = {t}.id) "
                 f"ELSE v + 1 END")
    else:
        eng.append(f"WHEN MATCHED THEN UPDATE SET v = {upd_e}")
    if has_ins:
        cond = " AND d.amount > 0" if ins_cond else ""
        eng.append(f"WHEN NOT MATCHED{cond} THEN INSERT (id, grp, v) "
                   "VALUES (d.id, 0, d.amount)")
    ora = [f"CREATE TEMP TABLE {pre} AS SELECT * FROM {t}"]
    if has_del:
        ora.append(f"DELETE FROM {t} WHERE id IN (SELECT id FROM {d} WHERE kind = 'del')")
        upd_where = f"id IN (SELECT id FROM {d} WHERE kind IS DISTINCT FROM 'del')"
    else:
        upd_where = f"id IN (SELECT id FROM {d})"
    ora.append(f"UPDATE {t} SET v = {upd_o} WHERE {upd_where}")
    if has_ins:
        cond = " AND (d.amount > 0)" if ins_cond else ""
        ora.append(f"INSERT INTO {t} SELECT d.id, 0, d.amount FROM {d} d "
                   f"WHERE NOT EXISTS (SELECT 1 FROM {pre} p WHERE p.id = d.id){cond}")
    return " ".join(eng), "; ".join(ora), True


def gen_case(i):
    # MERGE keeps delta ids unique (its own ambiguity precondition — the
    # duplicate-id path is the separate ambiguity leg below); NULL delta
    # ids exercise the never-matches → NOT MATCHED edge
    will_merge = rng.random() < 0.55
    t_rows, d_rows = gen_tables(i, unique_delta_ids=will_merge,
                                allow_null_delta_id=True)
    setup_e, setup_o = setup_sql(i, t_rows, d_rows)
    n_stmt = rng.randint(1, 3)
    stmts_e, stmts_o = [], []
    merge_left = will_merge
    for _ in range(n_stmt):
        e, o, used = gen_stmt(i, merge_left)
        if used:
            merge_left = False
        stmts_e.append(e)
        stmts_o.append(o)
    t = f"t{i}"
    final = (f"SELECT cast(id AS bigint) AS id, cast(grp AS bigint) AS grp, "
             f"cast(v AS bigint) AS v FROM {t}")
    eng = "; ".join([setup_e] + stmts_e + [final])
    ora = "; ".join([setup_o] + stmts_o + [final])
    return eng, ora


def gen_ambiguous(i):
    """A MERGE whose delta holds duplicate ids overlapping the base —
    the engine must refuse with its ambiguity error."""
    t, d = f"at{i}", f"ad{i}"
    t_rows, d_rows = gen_tables(i + 100000, unique_delta_ids=True,
                                allow_null_delta_id=False)
    dup_id = t_rows[0][0]
    d_rows = d_rows + [(dup_id, 1, "up"), (dup_id, 2, "up")]
    tv = values_sql(t_rows, lambda s: f"'{s}'")
    dv = values_sql(d_rows, lambda s: f"'{s}'")
    return (f"CREATE TABLE {t} AS SELECT * FROM (VALUES {tv}) AS vt(id, grp, v); "
            f"CREATE TABLE {d} AS SELECT * FROM (VALUES {dv}) AS vd(id, amount, kind); "
            f"MERGE INTO {t} t USING {d} d ON t.id == d.id "
            f"WHEN MATCHED THEN UPDATE SET v = d.amount")


def main():
    n_amb = max(2, N // 20)
    cases = [(f"dml{i:04d}",) + gen_case(i) for i in range(N)]
    amb = [(f"amb{i:04d}", gen_ambiguous(i)) for i in range(n_amb)]
    with open(TSV, "w") as f:
        for name, esql, osql in cases:
            f.write(f"{name}\t{esql}\t{osql}\n")
    with open(AMB_TSV, "w") as f:
        for name, esql in amb:
            f.write(f"{name}\t{esql}\n")
    subprocess.run(["rm", "-rf", OUT, AMB_OUT], check=True)
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    run = subprocess.run(["java", "-cp", cp, "graft.SqlRun", SF, TSV, OUT],
                         capture_output=True, text=True)
    engine_fail = [l for l in run.stderr.splitlines() if "[sqlrun]" in l]
    cmp = subprocess.run(
        [sys.executable, f"{REPO}/scripts/verify_local.py", OUT, SF],
        capture_output=True, text=True)
    fails = [l for l in cmp.stdout.splitlines() if l.startswith("FAIL")]
    # ambiguity leg: every case must FAIL with the engine's MERGE
    # ambiguity error — a silent success here is a bug
    arun = subprocess.run(["java", "-cp", cp, "graft.SqlRun", SF, AMB_TSV, AMB_OUT],
                          capture_output=True, text=True)
    amb_lines = [l for l in arun.stderr.splitlines() if "[sqlrun]" in l]
    amb_refused = {l.split()[1] for l in amb_lines if "ambiguous" in l}
    amb_bad = [n for n, _ in amb if n not in amb_refused]
    summary = (f"fuzz_dml: seed={SEED} n={N} -> "
               f"{N - len(fails)} match, {len(fails)} mismatch, "
               f"{len(engine_fail)} engine errors; "
               f"ambiguity {n_amb - len(amb_bad)}/{n_amb} refused")
    print(summary)
    byname = {n: (e, o) for n, e, o in cases}
    for l in engine_fail[:10]:
        print("  " + l)
    for l in fails[:10]:
        name = l.split()[1].rstrip(":")
        e, o = byname.get(name, ("?", "?"))
        print(f"  {l}\n    engine: {e}\n    oracle: {o}")
    for n in amb_bad[:5]:
        print(f"  AMBIGUITY NOT REFUSED: {n}")
    if REPORT:
        with open(REPORT, "w") as f:
            f.write(summary + "\n")
            for l in engine_fail + fails + [f"amb-not-refused {n}" for n in amb_bad]:
                f.write(l + "\n")
    sys.exit(1 if (fails or engine_fail or amb_bad) else 0)


if __name__ == "__main__":
    main()
