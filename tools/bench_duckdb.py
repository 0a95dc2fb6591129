#!/usr/bin/env python3
"""Dev-only: time the oracle SQL for the bench queries in DuckDB at a given
scale factor, as the ≤2×-of-DuckDB yardstick (BASELINE.md).

Usage: python3 tools/bench_duckdb.py /root/testdata/sf0.1 /tmp/verify_out/oracle_sql.json q01_pricing_summary q02_...
With no query names: times every oracle query.
"""
import json
import sys
import time

import duckdb


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    names = names or sorted(oracle)
    out = {}
    for name in names:
        if name not in oracle:
            continue
        con.sql(oracle[name]).fetchall()  # warm-up
        t0 = time.time()
        con.sql(oracle[name]).fetchall()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"sf": sf_dir, "total": round(sum(out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main()
