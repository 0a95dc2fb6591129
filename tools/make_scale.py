#!/usr/bin/env python3
"""Replicate a driver-generated SF directory N-fold into a bench-only
scale rehearsal set (default: sf0.1 x10 ~ "sf1"). Primary/foreign keys are
offset consistently per copy so joins keep their selectivity; dims
(region/nation) are shared. Dev tooling only -- correctness always gates
on the driver's own parquet at sf0.01.

Usage: python3 tools/make_scale.py [src_dir] [dst_dir] [copies] [corpus_copies]
  corpus_copies (default = copies) applies to the corpus tables
  (documents/embeddings) only -- the x100-corpus rehearsal keeps the
  structured tables at x10 while pushing the index-bearing corpus a
  decade further out.
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
NCORPUS = int(sys.argv[4]) if len(sys.argv) > 4 else N
CORPUS = {"documents", "embeddings"}
OFF = 1_000_000_000  # far above any base id, and above q36's +100000 probe ids

# per-copy key offsets; unlisted columns pass through unchanged
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in SHARED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        n_t = NCORPUS if t in CORPUS else N
        sel = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c in keys else c for c in cols
        )
        if t == "events":
            # the driver's events.parquet stores ts as TIMESTAMP(NANOS) --
            # Spark reads that as a nanos LONG (Tables.load converts) and
            # DuckDB reads it natively. DuckDB's parquet writer downcasts
            # to micros, so route this table through pyarrow to keep the
            # exact physical type.
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = con.execute(
                f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
                f"range({n_t}) r(i)"
            ).arrow()
            i = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(
                i, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
            )
            pq.write_table(tbl, f"{DST}/{t}.parquet")
        else:
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
                f"range({n_t}) r(i)) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
