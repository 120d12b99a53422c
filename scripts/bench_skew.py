#!/usr/bin/env python
"""Skew-handling evidence: the salted shuffle join vs AQE skew-join.

The synthetic pages table is Zipf-clustered by host (pages/synth.py), so
at zoom 7 the hottest cell holds ~13% of ALL rows — exactly the hot-cell
skew the north rule requires the engine to handle. This probe measures
the NON-broadcast cover join (the path used when the polygon cover is too
big to broadcast) in four configs: {AQE off, AQE on} x {salt 0, salt 16}.

Usage: python scripts/bench_skew.py [n_pages] [pages_parquet_dir]
Writes BENCH/SKEW.md.
"""
import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INNER = r'''
import sys, time, json
sys.path.insert(0, "%(repo)s")
from pyspark.sql import SparkSession, functions as F
spark=(SparkSession.builder.master("local[8]").config("spark.ui.enabled","false")
       .config("spark.driver.memory","24g")
       .config("spark.sql.adaptive.enabled", "%(aqe)s")
       .config("spark.sql.adaptive.skewJoin.enabled", "%(aqe)s")
       .config("spark.sql.shuffle.partitions","16")
       .config("spark.sql.autoBroadcastJoinThreshold","-1")
       .config("spark.sql.execution.arrow.maxRecordsPerBatch","65536")
       .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
from lib_gdal_spark.operators import sjoin
from lib_gdal_spark.pages.synth import pages_df
src = "%(pages)s"
if src and __import__("os").path.exists(src):
    pages = spark.read.parquet(src)
else:
    pages = pages_df(spark, %(n)d, partitions=64)
pts = sjoin.with_tile(sjoin.geocode(pages.select("url","text"), fast=True), zoom=12).select("url","lon","lat")
pts = pts.persist(); total = pts.count()
# extreme profile: collapse 60 percent of rows into one dense cluster
# (inside rect 1) — the "dense URL cluster" regime the salting lever is
# for. Deterministic: xxhash64(url) picks the rows.
hot = F.pmod(F.xxhash64("url"), F.lit(10)) < 6
pts_x = pts.withColumn("lon", F.when(hot, (F.pmod(F.xxhash64("url","lon"), 1000))/1000.0 + 5.0).otherwise(F.col("lon"))) \
           .withColumn("lat", F.when(hot, (F.pmod(F.xxhash64("url","lat"), 1000))/1000.0 + 5.0).otherwise(F.col("lat")))
pts_x = pts_x.persist(); pts_x.count()
# warm-up: full operator over a slice (JIT + python workers), untimed
sjoin.spatial_join(pts.limit(200000), em._rect_polyset(), zoom=7, how="inner",
                   broadcast_cover=False).count()
for profile, frame in (("natural", pts), ("extreme", pts_x)):
    top = sjoin.with_tile(frame, 7).groupBy("cell").count() \
        .orderBy(F.col("count").desc()).limit(1).collect()[0]["count"]
    for salt in (None, 16):
        best = None
        for rep in range(2):
            t0=time.time()
            j = sjoin.spatial_join(frame, em._rect_polyset(), zoom=7, how="inner",
                                   broadcast_cover=False, salt=salt)
            n = j.count()
            dt = time.time()-t0
            best = dt if best is None or dt < best else best
        print(json.dumps({"aqe": "%(aqe)s", "profile": profile,
                          "salt": salt or 0, "rows": n, "sec": round(best,2),
                          "hot_cell_pct": round(top/total*100,1)}))
spark.stop()
'''


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    pages = sys.argv[2] if len(sys.argv) > 2 else ""
    rows = []
    for aqe in ("false", "true"):
        code = INNER % {"repo": REPO, "aqe": aqe, "n": n, "pages": pages}
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3600)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                rows.append(json.loads(line))
    if not rows:
        sys.stderr.write(r.stderr[-2000:])
        raise SystemExit(1)
    print(json.dumps(rows))
    md = f"""# BENCH/SKEW — hot-cell skew: when salting pays (measured)

Generated {datetime.now(timezone.utc).isoformat()} by scripts/bench_skew.py.
Measured: the NON-broadcast cover join (broadcast_cover=False — the
fallback when the polygon cover outgrows the broadcast threshold) at
local[8], 16 shuffle partitions, warm JVM, best of 2. Two skew profiles
over the same synthetic pages: "natural" (Zipf host clustering) and
"extreme" (60% of rows collapsed into one dense cluster — the hot-URL-
cluster regime).

| profile | hot-cell share | AQE | salt | wall sec |
|---|---|---|---|---|
""" + "\n".join(
        f"| {r['profile']} | {r['hot_cell_pct']}% | {r['aqe']} | {r['salt']} | {r['sec']} |"
        for r in rows
    )
    # derive the narrative FROM the measured rows (never a canned verdict
    # the table can contradict): per profile, does the salted join beat
    # the unsalted one at the same AQE setting?
    verdicts = []
    for profile in ("natural", "extreme"):
        per_aqe = []
        for aqe in ("false", "true"):
            sec = {r["salt"]: r["sec"] for r in rows
                   if r["profile"] == profile and r["aqe"] == aqe}
            if 0 in sec and 16 in sec:
                per_aqe.append((aqe, sec[0], sec[16]))
        if per_aqe:
            wins = [a for a, uns, sal in per_aqe if sal < uns]
            if wins:
                verdicts.append(
                    f"- **{profile}**: salting WINS (AQE={'/'.join(wins)}): "
                    + "; ".join(f"{sal:.2f}s salted vs {uns:.2f}s unsalted (AQE={a})"
                                for a, uns, sal in per_aqe))
            else:
                verdicts.append(
                    f"- **{profile}**: the UNSALTED join wins at every AQE "
                    "setting ("
                    + "; ".join(f"{uns:.2f}s vs {sal:.2f}s salted (AQE={a})"
                                for a, uns, sal in per_aqe) + ")")
    md += """

Reading (derived from the measured rows above):

""" + "\n".join(verdicts) + """

Salting is NOT free — the x-salt cover replication and wider join key
cost real time, so it only pays where one cell dwarfs
1/shuffle-partitions of the data AND that cost exceeds the replication
overhead. The engine therefore defaults to AQE + broadcast (zero skew
exposure on the default path) and exposes `salt=` as an explicit opt-in
for measured extreme skew, rather than salting unconditionally.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
