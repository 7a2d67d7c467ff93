#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), replays
<verifyOutDir>/oracle_sql.json in DuckDB over the same parquet tables,
sorts columns by name and rows by value, and reports exact-match /
mismatch per query. Dev-only tool (driver-side python libs).
"""
import json
import os
import subprocess
import sys
import glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The DRIVER's comparator crashes on array cells (pandas sort_values:
    # "unhashable type: numpy.ndarray" — CORRECTNESS_r05 embed_quantize/
    # embed_project). Earlier versions of this stand-in tuple-ized arrays
    # and so passed rows the real gate rejects; fail loudly instead so a
    # registered output can never carry an array column unnoticed.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple))
                     or type(v).__name__ == 'ndarray').any():
            raise TypeError(
                f"array-typed column '{c}' would crash the driver's "
                "comparator — flatten it (concat_ws/array_to_string) "
                "in the registered query")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    # SWEEP_JSONL=<path>: also write one machine-readable line per
    # query (the committed cross-SF sweep artifact, r11 verdict #4)
    jsonl = open(os.environ["SWEEP_JSONL"], "w") \
        if os.environ.get("SWEEP_JSONL") else None
    # stamp each line with the tree the sweep ran against (r14 advice:
    # a deterministic re-run produces byte-identical content, so
    # "re-run at HEAD" was unverifiable from the committed artifact)
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip() or "unknown"

    def record(name, ok, reason=""):
        if jsonl:
            jsonl.write(json.dumps(
                {"name": name, "ok": ok, "reason": reason,
                 "sf_dir": sf_dir, "head": head}) + "\n")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # dev subset: mirror Verify's SPARK_GRAFT_ONLY so a filtered dump
    # isn't reported as 92 missing-output failures
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, "no spark output")
            n_bad += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        except TypeError as e:
            print(f"FAIL {name}: spark output: {e}")
            record(name, False, f"spark output: {e}")
            n_bad += 1
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            record(name, False, f"oracle sql error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            record(name, False, "column mismatch")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            record(name, False, f"rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        # exact value compare (driver hashes values)
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            # The driver hashes materialized values, so dtype FAMILY must
            # match too: an int64 32 vs a float64 32.0 (e.g. DuckDB HUGEINT
            # materialized as float) hash-differ even though `32 == 32.0`.
            fam = {'i': 'int', 'u': 'int', 'f': 'float', 'b': 'bool'}
            ka = fam.get(a.dtype.kind, a.dtype.kind)
            kb = fam.get(b.dtype.kind, b.dtype.kind)
            if ka != kb:
                eq = False
                print(f"FAIL {name}: col {c} dtype family {a.dtype} vs "
                      f"{b.dtype} (driver hash would mismatch)")
                continue
            try:
                same = (a.astype(object).where(pd.notnull(a), None).tolist() ==
                        b.astype(object).where(pd.notnull(b), None).tolist())
            except Exception:
                same = a.tolist() == b.tolist()
            if not same:
                eq = False
                diff = [(i, x, y) for i, (x, y) in
                        enumerate(zip(a.tolist(), b.tolist())) if x != y][:3]
                print(f"FAIL {name}: col {c} differs, e.g. {diff}")
        if eq:
            print(f"OK   {name} ({len(got)} rows)")
            record(name, True, f"{len(got)} rows")
            n_ok += 1
        else:
            record(name, False, "value mismatch")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if jsonl:
        jsonl.write(json.dumps(
            {"name": "__summary__", "ok": n_bad == 0, "n_ok": n_ok,
             "n_bad": n_bad, "sf_dir": sf_dir}) + "\n")
        jsonl.close()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
