#!/usr/bin/env python
"""Volume probe (VERDICT r4 item 9): drive a query set at a LARGER
scale than the driver's sf0.1 gate and verify full value parity vs
duckdb there, plus non-degenerate row counts — the failure class being
hunted is fixed parameters that degenerate as sf grows (CLAUDE.md
traps). Input dir defaults to the sf1.0 replica from
scripts/make_volume_sf.py.

Usage: python scripts/volume_parity.py [SF_DIR] [KEY,KEY,... | headline]
Writes one JSON line per query: key, seconds, rows, hash_match.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    import bench
    from lib_gdal_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    sel = sys.argv[2] if len(sys.argv) > 2 else "headline"
    qs = em.queries()
    keys = (bench.HEADLINE + ["proj_datum", "nearblack_collar",
                              "rat_classify", "fgb_roundtrip"]
            if sel == "headline" else sel.split(","))
    oracles = em.oracle_sql()
    spark = get_spark("volume", cores=32, shuffle_partitions=32)
    con = duckdb.connect()
    # a quadratic oracle at 10x scale should ERROR, not OOM-kill the
    # process (hit: knn_ring's unpruned cross join at sf1.0)
    # 24GB default makes a quadratic oracle at 10x scale ERROR rather
    # than OOM-kill the process; raise via env for the few legitimately
    # memory-hungry oracles (grid_linear's TIN twin needs ~70GB at
    # sf0.1 if forced to spill — it finishes in-RAM with a high cap)
    con.execute("SET memory_limit='%s'"
                % os.environ.get("SPARK_GRAFT_DUCKDB_MEMLIMIT", "24GB"))
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = []
    for k in keys:
        t0 = time.time()
        try:
            g = qs[k](spark, sf_dir).toPandas()
            sec = round(time.time() - t0, 2)
            row = {"key": k, "sec": sec, "rows": len(g)}
            if k in oracles:
                e = con.sql(oracles[k]).df()
                cols = sorted(g.columns)
                g2 = (g.reindex(cols, axis=1).sort_values(cols)
                      .reset_index(drop=True))
                e2 = (e.reindex(cols, axis=1).sort_values(cols)
                      .reset_index(drop=True)
                      .astype(g2.dtypes.to_dict()))
                row["hash_match"] = bool(g2.equals(e2))
                row["oracle_rows"] = len(e2)
        except Exception as exc:   # record, keep sweeping
            row = {"key": k, "err": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps(row), flush=True)
        results.append(row)
        spark.catalog.clearCache()
    ok = sum(1 for r in results
             if r.get("hash_match") or ("rows" in r and "hash_match"
                                        not in r))
    print(json.dumps({"summary": {"n": len(results), "clean": ok,
                                  "sf_dir": sf_dir}}), flush=True)


if __name__ == "__main__":
    main()
