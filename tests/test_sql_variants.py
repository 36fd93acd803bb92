"""Every SQL-text variant must be result-identical to its DataFrame
twin (same Catalyst, two front-ends)."""

from __future__ import annotations

import pytest

from transaq_clickhouse_exporter_spark.queries import dashboard as dash
from transaq_clickhouse_exporter_spark.queries import parity
from transaq_clickhouse_exporter_spark.queries import sql as dsql
from transaq_clickhouse_exporter_spark.testdata import register_views

FRM, TO, CODES, IV = parity.FRM, parity.TO, parity.SEC_CODES, parity.INTERVAL_MIN


@pytest.fixture(scope="module")
def views(spark, sf_smoke):
    register_views(spark, sf_smoke)
    parity.register_derived_views(spark, sf_smoke)
    return spark


def _same(df_a, df_b, allow_empty: bool = False):
    a = sorted(map(tuple, df_a.collect()))
    b = sorted(map(tuple, df_b.collect()))
    assert a == b
    assert allow_empty or len(a) > 0


def test_volume_by_interval(views):
    _same(
        views.sql(dsql.volume_by_interval(CODES, IV, FRM, TO, "B")),
        dash.volume_by_interval(views.table("trades"), views.table("securities"),
                                CODES, IV, FRM, TO, "B"),
    )


def test_netto_top10(views):
    _same(
        views.sql(dsql.netto_top10(IV, FRM, TO)),
        dash.netto_top10(views.table("trades"), views.table("securities"),
                         views.table("etf_codes"), IV, FRM, TO),
    )


def test_netto_union_top10(views):
    _same(
        views.sql(dsql.netto_union_top10(FRM, TO, "sell")),
        dash.netto_union_top10(views.table("trades"), views.table("securities"),
                               views.table("etf_codes"), FRM, TO, "sell"),
    )


def test_icebergs(views):
    # single-lot collisions are rare at sf0.001 — emptiness is data, not a bug
    _same(
        views.sql(dsql.icebergs(FRM, TO)),
        dash.icebergs(views.table("trades"), FRM, TO),
        allow_empty=True,
    )


def test_imoex_volume_by_interval(views):
    _same(
        views.sql(dsql.imoex_volume_by_interval(IV, FRM, TO, "S")),
        dash.imoex_volume_by_interval(views.table("trades"), views.table("etf_codes"),
                                      IV, FRM, TO, "S"),
    )


def test_distinct_codes(views):
    _same(
        views.sql(dsql.distinct_sec_codes(FRM, TO)),
        dash.distinct_sec_codes(views.table("trades"), FRM, TO),
    )


def test_parameterized_sql_binding(views):
    """SURVEY Q18: template-variable substitution via spark.sql bind
    parameters (no string interpolation of user values)."""
    df = views.sql(
        """
        SELECT sec_code, CAST(sum(quantity) AS BIGINT) AS lots
        FROM trades
        WHERE time BETWEEN :frm AND :to AND buy_sell = :side
        GROUP BY sec_code ORDER BY lots DESC, sec_code LIMIT :k
        """,
        args={"frm": FRM, "to": TO, "side": "B", "k": 5},
    )
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0]["lots"] >= rows[-1]["lots"]


def test_volume_diff_variants(views):
    _same(
        views.sql(dsql.volume_diff_by_interval(IV, FRM, TO, codes=CODES)),
        dash.volume_diff_by_interval(views.table("trades"), views.table("securities"),
                                     IV, FRM, TO, sec_codes=CODES),
    )
    _same(
        views.sql(dsql.volume_diff_by_interval(IV, FRM, TO, codes=CODES, day_shift=1)),
        dash.volume_diff_by_interval(views.table("trades"), views.table("securities"),
                                     IV, FRM, TO, sec_codes=CODES, day_shift=1),
        allow_empty=True,  # shifted day may fall outside the range
    )
    _same(
        views.sql(dsql.volume_diff_by_interval(IV, FRM, TO)),
        dash.volume_diff_by_interval(views.table("trades"), views.table("securities"),
                                     IV, FRM, TO, etf_codes=views.table("etf_codes")),
    )


def test_lots_and_counts(views):
    _same(
        views.sql(dsql.lots_by_time(CODES, FRM, TO, "S")),
        dash.lots_by_time(views.table("trades"), CODES, FRM, TO, "S"),
    )
    _same(
        views.sql(dsql.count_trades_by_time(CODES, FRM, TO, "B")),
        dash.count_trades_by_time(views.table("trades"), CODES, FRM, TO, "B"),
    )


def test_etf_and_imoex_time_series(views):
    _same(
        views.sql(dsql.etf_volume_by_interval(IV, FRM, TO, "B")),
        dash.imoex_volume_by_interval(views.table("trades"), views.table("etf_codes"),
                                      IV, FRM, TO, "B", in_etf=True),
    )
    _same(
        views.sql(dsql.imoex_volume_by_time(FRM, TO, "B")),
        dash.imoex_volume_by_time(views.table("trades"), views.table("etf_codes"),
                                  FRM, TO, "B"),
    )
    _same(
        views.sql(dsql.etf_sec_codes(FRM, TO)),
        dash.etf_sec_codes(views.table("trades"), views.table("securities"), FRM, TO),
    )
