#!/usr/bin/env python3
"""Brute-force exact cosine-pair reference for the StressGen fixture.

Usage: python3 tools/stress_ref.py [stressDir]

Writes <stressDir>/brute_pairs.parquet: every (va < vb) pair with cosine
>= 0.45, computed exactly over all ~n^2/2 pairs with DuckDB's vectorized
fixed-array cosine. graft.StressProbe reads this as the recall reference
for the quantizer-pruned configurations.

Driver-side-only dependency (duckdb) — NOT used by the library itself,
same as tools/check.py.
"""
import sys

import duckdb


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/stressdata"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"""
        CREATE TABLE e AS SELECT vec_id, CAST(embedding AS FLOAT[64]) v
        FROM read_parquet('{d}/embeddings.parquet/*.parquet')""")
    con.execute(f"""
        COPY (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 array_cosine_similarity(a.v, b.v) AS cosine
          FROM e a, e b
          WHERE a.vec_id < b.vec_id
            AND array_cosine_similarity(a.v, b.v) >= 0.45
          ORDER BY va, vb
        ) TO '{d}/brute_pairs.parquet' (FORMAT PARQUET)""")
    n, dups = con.execute(f"""
        SELECT count(*), sum(CASE WHEN cosine >= 0.9 THEN 1 ELSE 0 END)
        FROM read_parquet('{d}/brute_pairs.parquet')""").fetchone()
    print(f"[stress_ref] {n} exact pairs ({dups} true near-dups) -> "
          f"{d}/brute_pairs.parquet")


if __name__ == "__main__":
    main()
