"""Every oracle-paired catalog query must match DuckDB exactly at
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_connection


def _catalog_names():
    from transaq_clickhouse_exporter_spark.queries import parity

    return sorted(parity.catalog().keys())


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connection(sf_smoke)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


@pytest.mark.parametrize("name", _catalog_names())
def test_query_matches_oracle(spark, sf_smoke, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, sf_smoke)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    compare(df, duck, oracles[name])


def test_all_queries_have_oracles_or_reason():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    # every catalog entry is oracle-paired since round 5 (mm01's 'fake'
    # decoder is a pure function of the payload bytes, so even the
    # multimodal plumbing got a DuckDB twin); keep the set explicit so
    # future oracle-less additions are deliberate
    allowed_missing: set[str] = set()
    assert missing == allowed_missing, f"queries without oracle: {missing ^ allowed_missing}"
