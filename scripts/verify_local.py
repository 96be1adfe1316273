#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/verify_local.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet dir written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares values column-sorted-by-name.

Floats compare BIT-EXACT (IEEE payload bytes), so -0.0 != +0.0 and any
sum-order noise fails — strictly at least as strict as the driver's
hash. Round-10 lesson: a pandas value-compare with round(6) passed
while the driver's hash failed on 84 signed zeros (pl_text_embed); any
row green here is green under ANY serialization the driver hashes.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].isna().all():
            # a FULLY-NULL column carries no value information but its
            # physical dtype differs by engine (pandas object-None vs
            # DuckDB float64-NaN vs datetime NaT) — and the object
            # branch below would coerce all-None to datetime64. One
            # canonical all-None object column on both sides.
            df[c] = pd.Series([None] * len(df), dtype=object)
            continue
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            # bit-exact: compare the IEEE-754 payload, not the value.
            # NaN stays NaN-for-NaN comparable because tobytes of the
            # same canonical NaN matches; -0.0 vs +0.0 differ.
            df[c] = df[c].astype("float64").map(
                lambda v: np.float64(v).tobytes().hex())
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.decode() if isinstance(v, bytes) else v)
            if df[c].map(lambda v: v is None or hasattr(v, "toordinal")).all():
                try:
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
                except Exception:
                    pass
    return df.reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(res_dir))
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # order-insensitive compare (sort by all columns), like a hash of
        # the sorted multiset of rows
        try:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        except Exception:
            g, w = got, want
        eq = g.equals(w)
        if not eq:
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any()
            badcols = [c for c in g.columns if bad.get(c, False)]
            dtb = {c: (str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                   if str(g[c].dtype) != str(w[c].dtype)}
            print(f"FAIL {name}: value mismatch in {badcols} dtype_diff={dtb}")
            for c in badcols[:2]:
                idx = diff[c].idxmax()
                print(f"   first diff col={c} row={idx}: got={g[c][idx]!r} want={w[c][idx]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
