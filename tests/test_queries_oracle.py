"""Differential test for every registered query with an oracle — the local
mirror of the driver's t2 gate, run at sf0.001 for speed (set
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 for the full-size run).
"""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["product_id", "total_quantity", "total_sale_amount"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert_matches_oracle(df, ORACLES[name], sf_smoke)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0
