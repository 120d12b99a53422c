#!/usr/bin/env python
"""Synthesize a larger-sf replica of the driver testdata for volume
probes (VERDICT r4 item 9: convert "designed for 100x" into measured
evidence at the largest scale the sandbox fits).

/root/testdata is read-only and tops out at sf0.1, so this replicates
sf0.1 FACTOR times into $OUT with join-consistent key offsets (every
foreign key shifts by copy * (max key + 1), so per-copy relationships
are intact and keys stay globally unique); nation/region are fixed
dimensions and copy through. The documents corpus becomes a FACTOR-x
duplicated crawl — a realistic dedup stress, noted wherever dedup-family
row counts are read.

Usage: python scripts/make_volume_sf.py [OUT] [FACTOR]
       (defaults: /tmp/sf1.0, 10)
"""

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_VOLUME_SRC", "/root/testdata/sf0.1")

# table -> {column: key-space table (itself or the referenced table)}
OFFSETS = {
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "nation": {},
    "region": {},
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    spans = {}
    for t, cols in OFFSETS.items():
        for col, (kt, kc) in cols.items():
            if (kt, kc) not in spans:
                spans[(kt, kc)] = con.sql(
                    f"SELECT max({kc}) + 1 FROM "
                    f"'{SRC}/{kt}.parquet'").fetchone()[0]
    for t, cols in OFFSETS.items():
        src = f"'{SRC}/{t}.parquet'"
        if not cols:
            con.execute(f"COPY (SELECT * FROM {src}) TO "
                        f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        else:
            names = [c[0] for c in con.sql(
                f"DESCRIBE SELECT * FROM {src}").fetchall()]
            sel = ", ".join(
                f"{c} + c.i * {spans[cols[c]]} AS {c}" if c in cols else c
                for c in names)
            con.execute(
                f"COPY (SELECT {sel} FROM {src}, "
                f"(SELECT unnest(range({factor})) AS i) c) TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
