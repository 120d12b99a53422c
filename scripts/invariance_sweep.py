"""Partition-count invariance sweep: every __spark_entry__.queries()
entry must produce IDENTICAL normalized results at
spark.sql.shuffle.partitions = 4 and = 32 (CLAUDE.md invariant:
deterministic tie-breaks + DECIMAL sums make results independent of
physical parallelism — a violation means a nondeterministic window/agg
or an order-dependent float fold snuck in).

Usage:  python scripts/invariance_sweep.py [sf_dir]
Env:    SPARK_GRAFT_INV_PARTS="4,32"   the two partition counts
        SPARK_GRAFT_INV_ONLY="a,b"     restrict to named queries

Exit code 0 iff every query matches. ~2x the oracle-parity sweep cost;
run it when the contract changed (verify skill, surface 4).
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as em  # noqa: E402
from lib_gdal_spark.session import get_spark  # noqa: E402


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("int64")  # ns since epoch; NaT -> min
        elif pdf[c].dtype == object:
            # STRING compare, never pd.to_numeric: both passes are the
            # same engine, so dtypes already agree, and numeric coercion
            # would collapse DECIMAL values differing beyond float64's
            # 53 bits — masking exactly the violations this sweep exists
            # to catch (also handles arrays/lists via repr)
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort") \
              .reset_index(drop=True)


def _run_pass(sf_dir, names, parts):
    spark = get_spark(f"inv{parts}", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=parts)
    out = {}
    for name in names:
        try:
            out[name] = _normalize(
                em.queries()[name](spark, sf_dir).toPandas())
        except Exception as exc:  # keep sweeping; report at the end
            out[name] = f"ERR: {exc}"
        spark.catalog.clearCache()
    spark.stop()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    parts = [int(p) for p in
             os.environ.get("SPARK_GRAFT_INV_PARTS", "4,32").split(",")]
    only = os.environ.get("SPARK_GRAFT_INV_ONLY")
    names = sorted(only.split(",")) if only else sorted(em.queries())

    lo = _run_pass(sf_dir, names, parts[0])
    hi = _run_pass(sf_dir, names, parts[1])

    bad = []
    for name in names:
        a, b = lo[name], hi[name]
        if isinstance(a, str) or isinstance(b, str):
            bad.append((name, f"{a!r} vs {b!r}"))
            print(f"ERR  {name}")
            continue
        if list(a.columns) != list(b.columns) or len(a) != len(b):
            bad.append((name, f"shape {a.shape} vs {b.shape}"))
            print(f"FAIL {name} (shape {a.shape} vs {b.shape})")
            continue
        if len(a) == 0:
            # 0 rows passes invariance trivially and proves nothing —
            # the repo's known degenerate-parameter failure class
            # (CLAUDE.md); every contract query is nonzero by design
            bad.append((name, "0 rows (trivial pass; degenerate query)"))
            print(f"FAIL {name} (0 rows)")
            continue
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            try:
                if av.dtype.kind == "f":
                    ok = np.array_equal(av, bv, equal_nan=True)  # EXACT
                else:
                    ok = (pd.Series(av).astype(str)
                          == pd.Series(bv).astype(str)).all()
            except Exception as exc:  # compare failure = a finding, not a crash
                ok = False
                bad.append((name, f"column {c} uncomparable: {exc}"))
                break
            if not ok:
                bad.append((name, f"column {c} differs"))
                break
        print(f"{'FAIL' if bad and bad[-1][0] == name else 'ok  '} {name}"
              f" ({len(a)} rows)")

    if bad:
        print(f"\n{len(bad)} INVARIANCE VIOLATIONS:")
        for name, why in bad:
            print(f"  {name}: {why}")
        sys.exit(1)
    print(f"\nall {len(names)} queries partition-count invariant "
          f"({parts[0]} vs {parts[1]})")


if __name__ == "__main__":
    main()
