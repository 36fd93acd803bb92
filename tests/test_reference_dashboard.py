"""Run the reference's OWN Grafana panel SQL through the CH
compatibility layer (queries/ch_compat.py) — loaded from
/root/reference at test time, never copied into this repo.

Evidence level: every rawSql panel runs verbatim against the engine's
views (20/20, including the topK panel via the ch_topk expansion), and
four panels are VALUE-equal to a DataFrame or plain-SQL twin under the
catalog's pinned parameters."""

from __future__ import annotations

import json
import os

import pytest

from transaq_clickhouse_exporter_spark.queries import ch_compat as cc
from transaq_clickhouse_exporter_spark.queries import dashboard as dash
from transaq_clickhouse_exporter_spark.queries.parity import (
    FRM,
    SEC_CODES,
    TO,
    register_derived_views,
)
from transaq_clickhouse_exporter_spark.testdata import register_views

_DASH = "/root/reference/etc/grafana-dashboard-trades.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_DASH), reason="reference dashboard not available"
)

TMAP = {
    "default.transaq_trades": "trades",
    "default.transaq_securities": "securities",
}


def _panels() -> list[str]:
    sqls: list[str] = []

    def walk(o):
        if isinstance(o, dict):
            if "rawSql" in o:
                sqls.append(o["rawSql"])
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(json.load(open(_DASH)))
    return sqls


def _params(spark):
    etf = sorted(r.sec_code for r in spark.table("etf_codes").collect())
    return {
        "interval": 5,
        "sec_code": SEC_CODES,
        "sec_code_etf": etf,
        "__fromTime": FRM,
        "__toTime": TO,
    }


def _setup(spark, sf_smoke):
    register_views(spark, sf_smoke)
    register_derived_views(spark, sf_smoke)


def test_every_panel_runs(spark, sf_smoke):
    _setup(spark, sf_smoke)
    panels = _panels()
    assert len(panels) == 20
    params = _params(spark)
    for sql in panels:
        assert cc.run_ch_sql(spark, sql, params, TMAP).count() >= 0


def test_topk_panel_values(spark, sf_t2):
    """The topK(10)(sec_code) panel (GDJ:374) — its GROUP BY includes
    sec_code, so each group's top list is exactly [sec_code]; verify
    the translated aggregate produces that and the rest of the row
    matches a plain Spark-SQL twin.  sf0.01: the panel's
    `quantity = 1 … HAVING vol > 1` needs repeated unit-quantity
    trades in one (time, sec_code) cell, which sf0.001 lacks."""
    _setup(spark, sf_t2)
    sql = next(s for s in _panels() if "topK" in s)
    got = _rows(cc.run_ch_sql(spark, sql, _params(spark), TMAP))
    assert len(got) > 0
    want = _rows(
        spark.sql(
            "SELECT time, array(CAST(sec_code AS STRING)) AS sec, "
            "sum(quantity) AS vol FROM trades "
            "WHERE quantity = 1 AND buy_sell = 'B' "
            f"AND time >= '{FRM}' AND time <= '{TO}' "
            "GROUP BY time, sec_code HAVING vol > 1 ORDER BY time"
        )
    )
    assert got == want


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_netto_top10_panel_equals_dataframe_twin(spark, sf_smoke):
    _setup(spark, sf_smoke)
    sql = next(
        s for s in _panels() if "LIMIT 10" in s and "not in [$sec_code_etf]" in s
    )
    got = cc.run_ch_sql(spark, sql, _params(spark), TMAP)
    want = dash.netto_top10(
        spark.table("trades"),
        spark.table("securities"),
        spark.table("etf_codes"),
        5,
        FRM,
        TO,
        "buy",
    )
    assert _rows(got) == _rows(want) and got.count() == 10


def test_count_trades_panels_equal_dataframe_twin(spark, sf_smoke):
    _setup(spark, sf_smoke)
    panels = [s for s in _panels() if "count(price)" in s]
    assert len(panels) == 2  # buy and sell variants
    for sql in panels:
        bs = "B" if "'B'" in sql else "S"
        got = cc.run_ch_sql(spark, sql, _params(spark), TMAP)
        want = dash.count_trades_by_time(
            spark.table("trades"), SEC_CODES, FRM, TO, bs
        )
        assert _rows(got) == _rows(want)
        assert got.count() > 0


def test_imoex_volume_panels_equal_dataframe_twin(spark, sf_smoke):
    _setup(spark, sf_smoke)
    panels = [
        s
        for s in _panels()
        if "sum(price * quantity)" in s
        and "not in [$sec_code_etf]" in s
        and "toStartOfInterval" not in s
        and "lotsize" not in s
    ]
    assert len(panels) == 2  # buy and sell variants
    for sql in panels:
        bs = "B" if "'B'" in sql else "S"
        got = cc.run_ch_sql(spark, sql, _params(spark), TMAP)
        want = dash.imoex_volume_by_time(
            spark.table("trades"), spark.table("etf_codes"), FRM, TO, bs
        )
        assert _rows(got) == _rows(want)
        assert got.count() > 0


def test_run_dashboard_end_to_end(spark, sf_smoke):
    """The public migration entry (queries/grafana.py): load the
    reference's own dashboard JSON, run EVERY panel, collect each."""
    from transaq_clickhouse_exporter_spark.queries.grafana import (
        extract_panels,
        run_dashboard,
    )

    _setup(spark, sf_smoke)
    panels = extract_panels(_DASH)
    assert len(panels) == 20
    assert all(title for title in panels)          # every panel keyed by title
    dfs = run_dashboard(spark, _DASH, _params(spark), TMAP)
    assert len(dfs) == 20
    n_nonempty = sum(1 for df in dfs.values() if df.count() > 0)
    assert n_nonempty >= 15                        # sf0.001: a few legit empties
