"""Contract-wide oracle output-type audit (VERDICT r3 item 1).

Root cause of every r3 hash fail: duckdb widens SUM(INTEGER/BIGINT) to
HUGEINT, which pandas converts to float64, so an integer column that is
value-identical to Spark's int64 can never hash-match (6.0 vs 6). The
three r3 reds (bpe_pairs, lm_xent, polygonize_rings) were exactly the
three HUGEINT-emitting oracles. This audit kills the trap class
structurally: BINDING (not executing) every oracle and asserting no
HUGEINT/UHUGEINT column ever reaches the driver's pandas compare.

duckdb's binder resolves output types without running the query, so the
full 148-oracle sweep is sub-second.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


ORACLES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLES)
def test_no_hugeint_output(ddb, name):
    sql = entrymod.oracle_sql()[name]
    rel = ddb.sql(sql)  # lazy: binder runs, query does not
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if str(t).upper() in BANNED]
    assert not bad, (
        f"{name}: oracle emits {bad} — pandas converts HUGEINT to "
        f"float64 and the driver value-hash can never match Spark's "
        f"int64. CAST the aggregate to BIGINT in the oracle SQL "
        f"(CLAUDE.md cross-engine trap list)."
    )
