#!/usr/bin/env python3
"""Sweep every float-emitting verify output for latent signed-zero /
rounding-boundary exposure (round-10 lesson: pl_text_embed was
value-equal but hash-red on 84 components where DuckDB kept -0.0 and
Spark's round() emitted +0.0).

Usage: python3 scripts/float_boundary_sweep.py <outDir> <sfDir> [report]

For each query with both a Spark parquet output and an oracle SQL, and
for each float64 column, reports:
  - neg_zero counts on each side (ANY -0.0 is a latent hash risk: the
    other engine is one tiny-sign flip away from emitting +0.0);
  - signbit-at-zero DISAGREEMENT counts (an actual hash break today);
  - tiny nonzero magnitudes |v| < 1e-9 (values that a 6dp round would
    collapse to a signed zero at a different scale factor);
  - NaN count mismatches.
Exit code 1 if any column DISAGREES on zero signs today; the risk rows
are informational (they can only break if the underlying computation is
not order-exact, which the parity rules separately require).
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd


def float_cols(df):
    return [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]


def stats(v: np.ndarray):
    v = v.astype("float64")
    finite = v[np.isfinite(v)]
    zeros = finite[finite == 0.0]
    negz = int(np.signbit(zeros).sum())
    posz = int(len(zeros) - negz)
    tiny = int(((np.abs(finite) > 0) & (np.abs(finite) < 1e-9)).sum())
    return {"neg_zero": negz, "pos_zero": posz, "tiny": tiny,
            "nan": int(np.isnan(v).sum())}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    report_path = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    lines, disagreements, risks = [], 0, 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            continue
        try:
            got = pd.read_parquet(res_dir)
            want = con.execute(oracle[name]).df()
        except Exception as e:
            lines.append(f"SKIP {name}: {e}")
            continue
        for c in float_cols(got):
            if c not in want.columns or not pd.api.types.is_float_dtype(want[c]):
                continue
            g, w = stats(got[c].to_numpy()), stats(want[c].to_numpy())
            flags = []
            if g["neg_zero"] != w["neg_zero"] or g["pos_zero"] != w["pos_zero"]:
                flags.append("ZERO-SIGN-DISAGREE")
                disagreements += 1
            elif g["neg_zero"] or w["neg_zero"]:
                flags.append("neg-zero-present")
                risks += 1
            if g["tiny"] or w["tiny"]:
                flags.append("tiny-magnitude")
                risks += 1
            if g["nan"] != w["nan"]:
                flags.append("NAN-DISAGREE")
                disagreements += 1
            if flags:
                lines.append(
                    f"{name}.{c}: {','.join(flags)} spark={g} oracle={w}")
    lines.append(f"== {disagreements} disagreements, {risks} risk rows, "
                 f"{len(oracle)} queries swept")
    text = "\n".join(lines)
    print(text)
    if report_path:
        with open(report_path, "w") as f:
            f.write(text + "\n")
    sys.exit(1 if disagreements else 0)


if __name__ == "__main__":
    main()
