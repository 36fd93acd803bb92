from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.queries import analytics as an
from transaq_clickhouse_exporter_spark.queries import parity
from transaq_clickhouse_exporter_spark.testdata import register_views


def test_approx_percentiles_within_bound(spark, sf_smoke):
    register_views(spark, sf_smoke)
    parity.register_derived_views(spark, sf_smoke)
    trades = spark.table("trades")
    exact = {r["sec_code"]: (r["p50"], r["p90"]) for r in an.price_percentiles(trades).collect()}
    approx = {
        r["sec_code"]: (r["p50"], r["p90"])
        for r in an.price_percentiles_approx(trades, accuracy=10000).collect()
    }
    assert set(exact) == set(approx)
    for sec, (p50, p90) in exact.items():
        a50, a90 = approx[sec]
        # prices span ~[100, 1000); high accuracy → within a few price steps
        assert abs(a50 - p50) <= 20 and abs(a90 - p90) <= 20


def test_vwap_bounds(spark, sf_smoke):
    register_views(spark, sf_smoke)
    parity.register_derived_views(spark, sf_smoke)
    trades = spark.table("trades")
    out = an.vwap_by_interval(trades, 5)
    joined = out.join(
        trades.groupBy("sec_code").agg(F.min("price").alias("lo"), F.max("price").alias("hi")),
        "sec_code",
    )
    bad = joined.filter((F.col("vwap") < F.col("lo")) | (F.col("vwap") > F.col("hi"))).count()
    assert bad == 0  # VWAP always inside the price envelope


def test_cumulative_volume_monotone(spark, sf_smoke):
    register_views(spark, sf_smoke)
    parity.register_derived_views(spark, sf_smoke)
    from pyspark.sql import Window

    out = an.cumulative_volume(spark.table("trades"), 5)
    w = Window.partitionBy("sec_code").orderBy("minute")
    dec = out.withColumn("prev", F.lag("cum_vol").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("cum_vol") < F.col("prev"))
    )
    assert dec.count() == 0
