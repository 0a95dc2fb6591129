#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, runs the corresponding oracle SQL
from oracle_sql.json in DuckDB (tables = the sf parquet files), sorts columns
by name and rows by all columns, and compares values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [oracle_timeout_sec]

The optional third arg caps each ORACLE query's DuckDB runtime (via
connection.interrupt()); a timed-out oracle reports `skip` instead of
fail. Only meaningful for scale-replica gates (x10: the deliberate
O(n^2) brute oracles are 2.5G-pair scans DuckDB cannot finish) — the
driver-parity default runs every oracle to completion.
"""
import json
import math
import sys
import threading

import duckdb


def canon(rows, cols):
    """Sorted-rows, sorted-cols canonical form with NaN/None normalization."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return ("null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", round(v, 9))
        return (type(v).__name__[:1], str(v))

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            srows, scols = spark_rel.fetchall(), [c for c in spark_rel.columns]
            timer = (threading.Timer(timeout, con.interrupt)
                     if timeout else None)
            if timer:
                timer.start()
            try:
                duck_rel = con.sql(oracle[name])
                drows, dcols = (duck_rel.fetchall(),
                                [c for c in duck_rel.columns])
            finally:
                if timer:
                    timer.cancel()
        except duckdb.InterruptException:
            print(f"skip {name}: oracle exceeded {timeout}s in DuckDB "
                  "(scale-replica gate: brute oracle infeasible at this SF)")
            n_skip += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_bad += 1
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if len(cs) != len(cd):
            print(f"FAIL {name}: rows spark={len(cs)} duck={len(cd)}")
            n_bad += 1
        elif cs != cd:
            diff = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
            print(f"FAIL {name}: {len(diff)} mismatched rows of {len(cs)}; "
                  f"first: spark={cs[diff[0]]} duck={cd[diff[0]]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(cs)} rows)")
            n_ok += 1
    skip_note = f", {n_skip} skip(oracle-timeout)" if n_skip else ""
    print(f"== {n_ok} ok, {n_bad} fail{skip_note} ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
