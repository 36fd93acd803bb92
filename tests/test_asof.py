"""As-of join vs pandas merge_asof golden + edge cases."""

from __future__ import annotations

import pandas as pd

from transaq_clickhouse_exporter_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("SBER", 100, 1), ("SBER", 150, 2), ("SBER", 200, 3),
            ("GAZP", 100, 4),  # no prior quote → NULL
            ("SBER", 90, 5),   # before first quote → NULL
        ],
        "sec string, ts long, trade_no long",
    )
    quotes = spark.createDataFrame(
        [("SBER", 95, 10.0), ("SBER", 150, 11.0), ("SBER", 160, 12.0), ("GAZP", 120, 5.0)],
        "sec string, ts long, px double",
    )
    return trades, quotes


def test_asof_basic_inclusive_and_nulls(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_no"]: r["px"]
        for r in asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts").collect()
    }
    # trade@100 → quote@95; trade@150 → quote@150 (inclusive); trade@200 → quote@160
    assert out == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_matches_pandas(spark):
    trades, quotes = _frames(spark)
    got = (
        asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts")
        .toPandas().sort_values("trade_no").reset_index(drop=True)
    )
    lp = trades.toPandas().sort_values("ts", kind="stable")
    rp = quotes.toPandas().sort_values("ts", kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="sec").sort_values("trade_no").reset_index(drop=True)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_no"]: r["px"]
        for r in asof_join(
            trades, quotes, by=["sec"], left_ts="ts", right_ts="ts", tolerance_seconds=10
        ).collect()
    }
    # trade@200's latest quote is @160 → 40s stale → NULL; @150 exact → kept
    assert out == {1: 10.0, 2: 11.0, 3: None, 4: None, 5: None}


def test_asof_single_shuffle_plan(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no join node at all — union + window; exactly one exchange on the key
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
