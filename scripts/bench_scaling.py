#!/usr/bin/env python
"""N-vs-4N scaling evidence (BASELINE.json north rule).

Runs the identical flagship job at local[8] and local[32] (the in-sandbox
stand-in for N and 4N executors) via `spark-submit --py-files`, computes
scaling efficiency = throughput(4N) / (4 * throughput(N)), and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "300000"))


def build_pyfiles_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "lib_gdal_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "lib_gdal_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return zpath


def run_at(cores: int, zpath: str, tmp: str) -> dict:
    out_dir = os.path.join(tmp, f"out_{cores}")
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "scaling_job.py"),
        str(N_PAGES), out_dir,
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"rows_per_sec"' in line:
            return json.loads(line)
    sys.stderr.write(res.stdout[-3000:] + "\n" + res.stderr[-3000:] + "\n")
    raise RuntimeError(f"no JSON line from scaling run at local[{cores}]")


def main():
    with tempfile.TemporaryDirectory() as tmp:
        zpath = build_pyfiles_zip(tmp)
        lo = run_at(8, zpath, tmp)
        hi = run_at(32, zpath, tmp)
    eff = hi["rows_per_sec"] / (4.0 * lo["rows_per_sec"])
    report = {
        "n_pages": N_PAGES,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    md = f"""# BENCH/BASELINE — measured numbers (this engine)

Generated {datetime.now(timezone.utc).isoformat()} by scripts/bench_scaling.py.
Same job, same deterministic input ({N_PAGES:,} synthetic pages), two
parallelism levels via `spark-submit --py-files` (local[8] vs local[32] —
the in-sandbox stand-in for N vs 4N executors per BASELINE.md row 12).

Job: pages -> geocode (JVM regex) -> z12 cell index -> broadcast exact-PIP
spatial join -> zoom 0-12 tile pyramid -> parquet sink partitioned by z,
with per-partition lineage metrics (`_metrics` table).

| parallelism | wall sec | pages | join rows | tiles | rows/sec |
|---|---|---|---|---|---|
| local[8] (N)  | {lo['sec']} | {lo['n_pages']:,} | {lo['join_rows']:,} | {lo['tiles']:,} | {lo['rows_per_sec']:,} |
| local[32] (4N) | {hi['sec']} | {hi['n_pages']:,} | {hi['join_rows']:,} | {hi['tiles']:,} | {hi['rows_per_sec']:,} |

**Scaling efficiency: {eff:.3f}** (target >= 0.8 -> {"PASS" if eff >= 0.8 else "FAIL"})

Notes: local-mode scaling under-reports true multi-executor scaling — all 32
threads share one JVM heap, one shuffle disk and the driver's Python; on a
real cluster the broadcast-join + map-side-combine design has no cross-node
chatter except the pyramid rollup shuffles (~1/3 of base tile count).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
