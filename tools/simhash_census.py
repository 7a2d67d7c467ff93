#!/usr/bin/env python3
"""Chunk-collision candidate census: narrow (4x15-bit) vs wide
(4x20-bit) SimHash, replayed from the committed oracle SQL's
fingerprint CTEs over any documents dir (dev-only tool, driver-side
python libs; r11 evidence for the dedup_simhash_wide row).

Usage: python tools/simhash_census.py <docsDir> <verifyOutDir>
  docsDir      dir containing documents.parquet (file or dir of parts)
  verifyOutDir a Verify dump carrying oracle_sql.json

Prints the candidate-pair count (sum over chunk buckets of C(n,2))
for both widths — the quantity the 20-bit chunk space divides by 32
asymptotically (N^2 * 4 / 2^21 vs N^2 * 4 / 2^16 random pairs).
"""
import glob
import json
import os
import sys

import duckdb


def main(docs_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    con.execute("SET threads TO 24")
    p = os.path.join(docs_dir, "documents.parquet")
    src = p if os.path.isfile(p) else os.path.join(p, "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    def cand_count(name: str, chunk_exprs) -> float:
        s = sql[name]
        pre = s[: s.rindex("SELECT x.doc_id")]
        chunked = " UNION ALL ".join(
            f"SELECT {e} AS cv, {i} AS ck, doc_id FROM sh"
            for i, e in enumerate(chunk_exprs))
        q = pre + f""",
chunked AS ({chunked}),
b AS (SELECT ck, cv, COUNT(*) AS n FROM chunked GROUP BY 1, 2)
SELECT SUM(n * (n - 1) / 2) FROM b"""
        return con.execute(q).fetchone()[0]

    narrow = cand_count(
        "dedup_simhash",
        [f"(simhash >> {c * 15}) & 32767" for c in range(4)])
    wide = cand_count(
        "dedup_simhash_wide",
        ["sh_lo & 1048575", "(sh_lo >> 20) & 1048575",
         "(sh_lo >> 40) & 1048575", "sh_hi & 1048575"])
    print(f"candidate pairs  narrow(4x15): {narrow:.0f}  "
          f"wide(4x20): {wide:.0f}  cut: {narrow / max(wide, 1):.2f}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
