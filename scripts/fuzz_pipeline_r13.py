#!/usr/bin/env python3
"""Pipeline-operator property fuzz, DuckDB half (VERDICT r12 #5).

Replays independent references for the artifacts the Scala half
(scripts/fuzz_pipeline_r13.scala) wrote:

  - cc_*:  connected components via DuckDB WITH RECURSIVE transitive
           closure — each node's component representative is its
           min-reachable id, which is exactly what min-label
           propagation converges to (labels initialized to own id).
  - ts_*:  sqrt-temperature sampling via the INTEGER formula the
           operator documents: n_i = whitespace token mass per source,
           w_i = floor(sqrt(n_i)), permill_i = min(1000,
           (1000 * target * w_i) // (sum_w * n_i)), keep iff
           md5-permill(id) < permill_i. All integer arithmetic.

The MinHash/LSH leg is verified entirely on the Scala side (all-pairs
exact Jaccard with the same shingle kernel) and reports through the
FPL_LSH line this script folds into the report.

Usage: python3 scripts/fuzz_pipeline_r13.py [outdir] [report] [scala_log]
Exit 0 iff every trial matches.
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_pipeline_r13"
REPORT = sys.argv[2] if len(sys.argv) > 2 else None
SCALA_LOG = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
lines = []
fails = 0


def log(s):
    print(s)
    lines.append(s)


# ---- CC: WITH RECURSIVE transitive closure vs engine labels ----------
con.execute(f"CREATE VIEW edges AS SELECT * FROM read_parquet('{OUT}/cc_edges.parquet/*.parquet')")
con.execute(f"CREATE VIEW labels AS SELECT * FROM read_parquet('{OUT}/cc_labels.parquet/*.parquet')")
ref = con.execute("""
WITH RECURSIVE
  sym AS (
    SELECT trial, src, dst FROM edges
    UNION ALL SELECT trial, dst AS src, src AS dst FROM edges),
  nodes AS (SELECT DISTINCT trial, src AS id FROM sym),
  reach(trial, id, r) AS (
    SELECT trial, id, id AS r FROM nodes
    UNION
    SELECT s.trial, rr.id, s.dst AS r
    FROM reach rr JOIN sym s ON s.trial = rr.trial AND s.src = rr.r)
SELECT trial, id, min(r) AS cluster_id FROM reach GROUP BY trial, id
""").fetchall()
eng = con.execute("SELECT trial, id, cluster_id FROM labels").fetchall()
ref_set, eng_set = set(ref), set(eng)
n_trials = con.execute("SELECT count(DISTINCT trial) FROM edges").fetchone()[0]
if ref_set == eng_set:
    log(f"FPL_CC_REF trials={n_trials} nodes={len(ref_set)} -> MATCH "
        f"(engine labels == DuckDB recursive-closure min-reachable ids)")
else:
    fails += 1
    log(f"FPL_CC_REF MISMATCH: engine-only={sorted(eng_set - ref_set)[:5]} "
        f"ref-only={sorted(ref_set - eng_set)[:5]}")

# ---- temperature sampling: integer md5/permill replay ----------------
con.execute(f"CREATE VIEW ts_docs AS SELECT * FROM read_parquet('{OUT}/ts_docs.parquet/*.parquet')")
con.execute(f"CREATE VIEW ts_kept AS SELECT * FROM read_parquet('{OUT}/ts_kept.parquet/*.parquet')")
con.execute(f"CREATE VIEW ts_target AS SELECT * FROM read_parquet('{OUT}/ts_target.parquet/*.parquet')")
ref = con.execute("""
WITH toks AS (
  SELECT trial, id, source,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS tok
  FROM ts_docs),
rates AS (
  SELECT t.trial, t.source, sum(t.tok) AS n,
         CAST(floor(sqrt(CAST(sum(t.tok) AS DOUBLE))) AS BIGINT) AS w
  FROM toks t GROUP BY t.trial, t.source),
rates2 AS (
  SELECT r.*, sum(w) OVER (PARTITION BY trial) AS sw, g.target
  FROM rates r JOIN ts_target g USING (trial)),
rates3 AS (
  SELECT trial, source,
         least(1000,
           (1000::HUGEINT * target::HUGEINT * w::HUGEINT)
             // (sw::HUGEINT * n::HUGEINT)) AS permill
  FROM rates2)
SELECT t.trial, t.id
FROM toks t JOIN rates3 r ON r.trial = t.trial AND r.source = t.source
WHERE ('0x' || substr(md5(CAST(t.id AS VARCHAR)), 1, 8))::BIGINT % 1000
      < r.permill
""").fetchall()
eng = con.execute("SELECT trial, id FROM ts_kept").fetchall()
ref_set, eng_set = set(ref), set(eng)
if ref_set == eng_set:
    log(f"FPL_TS_REF kept={len(eng_set)} -> MATCH "
        f"(engine kept-set == DuckDB integer permill replay)")
else:
    fails += 1
    log(f"FPL_TS_REF MISMATCH: engine-only={sorted(eng_set - ref_set)[:5]} "
        f"ref-only={sorted(ref_set - eng_set)[:5]}")

if SCALA_LOG:
    with open(SCALA_LOG) as f:
        for ln in f:
            if ln.startswith("FPL_"):
                log(ln.rstrip())
                if "FAIL" in ln or ("failures=" in ln and "failures=0" not in ln):
                    fails += 1

log(f"fuzz_pipeline_r13: {'PASS' if fails == 0 else f'{fails} FAILURES'}")
if REPORT:
    with open(REPORT, "w") as f:
        f.write("\n".join(lines) + "\n")
sys.exit(1 if fails else 0)
