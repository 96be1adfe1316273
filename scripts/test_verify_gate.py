#!/usr/bin/env python3
"""Self-test for verify_local.py's bit-exact float gate.

Reconstructs the EXACT failure class that shipped red in round 10
(pl_text_embed: Spark emitted +0.0 where DuckDB kept -0.0 —
value-equal, hash-different) and asserts the local gate now FAILS it,
plus a control where bit-identical output PASSES.

Usage: python3 scripts/test_verify_gate.py   (exit 0 = gate is faithful)
"""
import json
import os
import subprocess
import sys
import tempfile

import pandas as pd


def run_gate(out_dir, sf_dir):
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "verify_local.py"),
         out_dir, sf_dir],
        capture_output=True, text=True)
    return r.returncode, r.stdout


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(out_dir)
        # a one-table corpus the oracle reads
        pd.DataFrame({"doc_id": [1, 2]}).to_parquet(
            os.path.join(sf_dir, "documents.parquet"))
        # oracle emits -0.0 for doc 1 the way r10's red row actually
        # did: round() of a tiny negative keeps the sign in DuckDB
        # (a bare -0.0 literal is decimal and folds to +0.0)
        oracle = {"q_zero": (
            "SELECT doc_id, CASE WHEN doc_id = 1 THEN round(-1e-9, 6) "
            "ELSE 1.5 END AS v FROM documents ORDER BY doc_id")}
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump(oracle, f)
        # spark-side output with +0.0 — the r10 red-row shape
        os.makedirs(os.path.join(out_dir, "q_zero"))
        pd.DataFrame({"doc_id": [1, 2], "v": [0.0, 1.5]}).to_parquet(
            os.path.join(out_dir, "q_zero", "part-0.parquet"))
        rc, out = run_gate(out_dir, sf_dir)
        assert rc != 0 and "FAIL q_zero" in out, (
            f"gate MISSED the signed-zero class (rc={rc}):\n{out}")
        # control: bit-identical -0.0 passes
        pd.DataFrame({"doc_id": [1, 2], "v": [-0.0, 1.5]}).to_parquet(
            os.path.join(out_dir, "q_zero", "part-0.parquet"))
        rc2, out2 = run_gate(out_dir, sf_dir)
        assert rc2 == 0 and "PASS q_zero" in out2, (
            f"gate rejected bit-identical output (rc={rc2}):\n{out2}")
    print("verify_local gate is hash-faithful: signed-zero FAILS, bit-identical PASSES")


if __name__ == "__main__":
    main()
