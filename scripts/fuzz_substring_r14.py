#!/usr/bin/env python3
"""Substring/winnow-family property fuzz, DuckDB half (VERDICT r13 #6).

Replays independent references for the artifacts the Scala half
(scripts/fuzz_substring_r14.scala) wrote, per trial with that trial's
randomized (k, min_occ, w):

  - spans:     duplicated overlapping k-grams (total corpus-wide
               occurrence count >= min_occ) merged gaps-and-islands
               into maximal runs — the Lee et al. suffix-array
               semantics, declaratively.
  - drop:      remove every covered token position, reassemble.
  - keepfirst: row_number over each duplicated gram's occurrences in
               (doc_id, p) order; only rn > 1 occurrences cut.
  - winnow:    MOSS winnowing — packed key h*2^21 + (2^21-1-p), min
               over trailing w-row window per doc, keep p >= w-1 or
               the doc's last gram row, distinct, unpack. The 40-bit
               gram hash replays md5's first 10 hex chars via
               list_reduce hex parsing (integer-exact).

Usage: python3 scripts/fuzz_substring_r14.py [outdir] [report]
Exit 0 iff every trial matches.
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_substring_r14"
REPORT = sys.argv[2] if len(sys.argv) > 2 else None

con = duckdb.connect()
lines = []
fails = 0


def log(s):
    print(s)
    lines.append(s)


for name in ["ss_docs", "ss_params", "ss_spans", "ss_drop", "ss_keepfirst", "ss_winnow"]:
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{OUT}/{name}.parquet/*.parquet')")

params = con.execute("SELECT trial, k, min_occ, w FROM ss_params ORDER BY trial").fetchall()

# shared per-trial gram CTEs, parameterized on k / min_occ
GRAMS = """
WITH tok AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t
  FROM ss_docs WHERE trial = {t}
), g AS (
  SELECT doc_id, p, md5(array_to_string(t[(p+1):(p+{k})], ' ')) AS h
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {k} + 1)) AS p
        FROM tok WHERE len(t) >= {k})
), dup AS (
  SELECT h FROM g GROUP BY h HAVING count(*) >= {m}
), dg AS (
  SELECT doc_id, p FROM g SEMI JOIN dup USING (h)
)"""

for trial, k, min_occ, w in params:
    g = GRAMS.format(t=trial, k=k, m=min_occ)

    ref_spans = set(con.execute(g + f"""
, isl AS (
  SELECT doc_id, p, CASE WHEN p > coalesce(max(p) OVER (
      PARTITION BY doc_id ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -{k} - 1) + {k}
    THEN 1 ELSE 0 END AS brk
  FROM dg
), grp AS (
  SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
  FROM isl
), spans AS (
  SELECT doc_id, min(p) AS span_start, max(p) + {k} - 1 AS span_end
  FROM grp GROUP BY doc_id, gid
)
SELECT s.doc_id, s.span_start, s.span_end,
  array_to_string(t.t[(s.span_start+1):(s.span_end+1)], ' ') AS span_text
FROM spans s JOIN tok t USING (doc_id)""").fetchall())
    eng_spans = set(con.execute(
        "SELECT doc_id, span_start, span_end, span_text FROM ss_spans "
        f"WHERE trial = {trial}").fetchall())

    ref_drop = set(con.execute(g + f"""
, covered AS (
  SELECT DISTINCT dg.doc_id, dg.p + r.range AS pos
  FROM dg, range(0, {k}) r
), tokpos AS (
  SELECT doc_id, pos, t[pos+1] AS word
  FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS pos FROM tok)
), kept AS (
  SELECT doc_id, pos, word FROM tokpos ANTI JOIN covered USING (doc_id, pos)
)
SELECT doc_id, array_to_string(list(word ORDER BY pos), ' ') AS clean_text
FROM kept GROUP BY doc_id""").fetchall())
    eng_drop = set(con.execute(
        f"SELECT doc_id, clean_text FROM ss_drop WHERE trial = {trial}").fetchall())

    ref_keep = set(con.execute(g + f"""
, occ AS (
  SELECT doc_id, p,
    row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
  FROM g SEMI JOIN dup USING (h)
), rem AS (
  SELECT doc_id, p FROM occ WHERE rn > 1
), covered AS (
  SELECT DISTINCT rem.doc_id, rem.p + r.range AS pos
  FROM rem, range(0, {k}) r
), tokpos AS (
  SELECT doc_id, pos, t[pos+1] AS word
  FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS pos FROM tok)
), kept AS (
  SELECT doc_id, pos, word FROM tokpos ANTI JOIN covered USING (doc_id, pos)
)
SELECT doc_id, array_to_string(list(word ORDER BY pos), ' ') AS clean_text
FROM kept GROUP BY doc_id""").fetchall())
    eng_keep = set(con.execute(
        f"SELECT doc_id, clean_text FROM ss_keepfirst WHERE trial = {trial}").fetchall())

    # winnow: 40-bit hash = first 10 hex chars of md5, integer-parsed;
    # rightmost-min realized by the packed key, trailing w-row window
    POS = 1 << 21
    ref_win = set(con.execute(f"""
WITH tok AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t
  FROM ss_docs WHERE trial = {trial}
), g AS (
  SELECT doc_id, p,
    list_reduce(
      list_transform(range(1, 11),
        i -> CAST(strpos('0123456789abcdef',
               substr(md5(array_to_string(t[(p+1):(p+{k})], ' ')), i, 1)) - 1 AS BIGINT)),
      (a, b) -> a * 16 + b) AS h
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {k} + 1)) AS p
        FROM tok WHERE len(t) >= {k})
), keyed AS (
  SELECT doc_id, p, h * {POS} + ({POS} - 1 - p) AS key,
    max(p) OVER (PARTITION BY doc_id) AS last_p,
    min(h * {POS} + ({POS} - 1 - p)) OVER (
      PARTITION BY doc_id ORDER BY p
      ROWS BETWEEN {w} - 1 PRECEDING AND CURRENT ROW) AS m
  FROM g
), sel AS (
  SELECT DISTINCT doc_id, m FROM keyed WHERE p >= {w} - 1 OR p = last_p
)
SELECT doc_id, ({POS} - 1 - (m % {POS})) AS fp_pos, m // {POS} AS fp_hash
FROM sel""").fetchall())
    eng_win = set(con.execute(
        f"SELECT doc_id, fp_pos, fp_hash FROM ss_winnow WHERE trial = {trial}").fetchall())

    ok = True
    for tag, ref, eng in [("spans", ref_spans, eng_spans),
                          ("drop", ref_drop, eng_drop),
                          ("keepfirst", ref_keep, eng_keep),
                          ("winnow", ref_win, eng_win)]:
        if ref != eng:
            ok = False
            fails += 1
            log(f"FSS_FAIL trial={trial} {tag}: engine-only="
                f"{sorted(eng - ref)[:3]} ref-only={sorted(ref - eng)[:3]}")
    if ok:
        log(f"FSS_TRIAL trial={trial} k={k} min_occ={min_occ} w={w} -> MATCH "
            f"(spans={len(ref_spans)} drop={len(ref_drop)} "
            f"keepfirst={len(ref_keep)} winnow={len(ref_win)})")

log(f"FSS_SUMMARY trials={len(params)} failures={fails}")
if REPORT:
    with open(REPORT, "w") as f:
        f.write("\n".join(lines) + "\n")
sys.exit(1 if fails else 0)
