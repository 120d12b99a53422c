"""Local replica of the driver's correctness gate: every queries() entry vs
its oracle_sql() twin on duckdb, at sf0.01 — row count, column names, and
values (exact for ints/strings, 1e-9-tight for floats)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

# default sf0.01 (the driver's gate scale); override with
# SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.1 for the both-scales deep
# sweep (verify skill, surface 4)
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # unify decimal.Decimal / bytes etc to str or float
            try:
                pdf[c] = pd.to_numeric(pdf[c])
            except (ValueError, TypeError):
                pdf[c] = pdf[c].astype(str)
    sort_cols = list(pdf.columns)
    return pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


ALL = sorted(entrymod.queries())
WITH_ORACLE = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check
        return
    exp = ddb.sql(oracles[name]).df()
    g, e = _normalize(got), _normalize(exp)
    assert list(g.columns) == list(e.columns), f"{name}: columns {list(g.columns)} != {list(e.columns)}"
    assert len(g) == len(e), f"{name}: rows {len(g)} != {len(e)}"
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
            both_nan = pd.isna(gv.astype(float)) & pd.isna(ev.astype(float))
            ok = both_nan | np.isclose(gv.astype(float), ev.astype(float),
                                       rtol=1e-9, atol=1e-12, equal_nan=True)
            assert ok.all(), f"{name}.{c}: {gv[~ok][:5]} vs {ev[~ok][:5]}"
        else:
            mism = gv != ev
            assert not mism.any(), f"{name}.{c}: {gv[mism][:5]} vs {ev[mism][:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) >= {"z", "x", "y", "n_pages"}
