"""window_funnel (functions/funnel.py) and the histogram quantile
sketch (functions/quantiles.py): crafted-chain semantics, window
anchoring, merge property, accuracy vs exact percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.funnel import (
    funnel_level_counts,
    window_funnel,
)
from transaq_clickhouse_exporter_spark.functions.quantiles import (
    histogram_sketch,
    quantile_sketch,
    quantiles_from_histogram,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts_s long")


def test_window_funnel_chain_semantics(spark):
    rows = [
        # u1: full chain inside the window
        (1, "a", 100), (1, "b", 200), (1, "c", 300),
        # u2: stage order violated (b before a) -> level 1 only
        (2, "b", 100), (2, "a", 200),
        # u3: b falls outside the window anchored at a -> level 1
        (3, "a", 100), (3, "b", 5000),
        # u4: never does a -> absent
        (4, "b", 100), (4, "c", 200),
        # u5: strictness — b at the same second as a does not count
        (5, "a", 100), (5, "b", 100),
    ]
    conds = [F.col("event_type") == t for t in ("a", "b", "c")]
    lv = {
        r.user_id: r.level
        for r in window_funnel(_ev(spark, rows), conds, window=1000).collect()
    }
    assert lv == {1: 3, 2: 1, 3: 1, 5: 1}


def test_window_funnel_anchor_is_first_stage(spark):
    # c is within window of b but NOT of a -> chain stops at b
    rows = [(1, "a", 0), (1, "b", 900), (1, "c", 1500)]
    conds = [F.col("event_type") == t for t in ("a", "b", "c")]
    lv = window_funnel(_ev(spark, rows), conds, window=1000).collect()
    assert [(r.user_id, r.level) for r in lv] == [(1, 2)]
    counts = dict(
        map(tuple, funnel_level_counts(_ev(spark, rows), conds, window=1000).collect())
    )
    assert counts == {2: 1}


def test_quantile_sketch_accuracy_vs_exact(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    est = {
        (r.l_returnflag, r.q): r.est
        for r in quantile_sketch(
            li, "l_extendedprice", qs=(0.5, 0.9), group_cols=("l_returnflag",)
        ).collect()
    }
    exact = {
        r.l_returnflag: (r.p50, r.p90)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    for k, (p50, p90) in exact.items():
        assert abs(est[(k, 0.5)] - p50) / p50 < 0.02  # bucket-width bound
        assert abs(est[(k, 0.9)] - p90) / p90 < 0.02


def test_histogram_merge_property(spark, sf_smoke):
    # same bounds -> per-day histograms sum to the whole; quantiles of
    # the merged histogram equal quantiles of the one-shot histogram
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    whole = histogram_sketch(li, "l_extendedprice")
    stats = whole.select("mn", "mx").limit(1)
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    mn, mx = stats.collect()[0]

    def hist_with_bounds(df):
        s = spark.createDataFrame([(mn, mx)], "mn double, mx double")
        x = F.col("l_extendedprice").cast("double")
        idx = F.least(F.lit(127), F.floor((x - F.col("mn")) * 128 / (F.col("mx") - F.col("mn")))).cast("int")
        return (
            df.crossJoin(F.broadcast(s))
            .select(idx.alias("bucket"), "mn", "mx")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("mn").alias("mn"), F.min("mx").alias("mx"))
        )

    merged = (
        hist_with_bounds(a)
        .unionAll(hist_with_bounds(b))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"), F.min("mn").alias("mn"), F.min("mx").alias("mx"))
    )
    q_whole = sorted(map(tuple, quantiles_from_histogram(whole, (0.5, 0.9)).collect()))
    q_merge = sorted(map(tuple, quantiles_from_histogram(merged, (0.5, 0.9)).collect()))
    assert q_whole == q_merge


def test_quantiles_use_histogram_own_bucket_count(spark, sf_smoke):
    # a 64-bucket sketch estimated by a caller who forgot buckets= must
    # still scale by 64 (the n_buckets column), not the default 128
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    h64 = histogram_sketch(li, "l_extendedprice", buckets=64)
    a = sorted(map(tuple, quantiles_from_histogram(h64, (0.5,)).collect()))
    b = sorted(
        map(tuple, quantiles_from_histogram(h64, (0.5,), buckets=64).collect())
    )
    assert a == b
    exact = li.agg(F.expr("percentile(l_extendedprice, 0.5)")).collect()[0][0]
    assert abs(a[0][1] - exact) / exact < 0.03


def test_weighted_quantiles_exact(spark):
    from transaq_clickhouse_exporter_spark.functions.quantiles import (
        weighted_quantiles,
    )

    # values 1..4 with weights 1,1,6,2 (total 10): cum = 1,2,8,10
    # q=0.5 -> first cum >= 5 is value 3; q=0.9 -> cum >= 9 is value 4;
    # q=0.2 -> cum >= 2 is value 2 (peers-inclusive tie handling below)
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 6), ("g", 4.0, 2)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = {
        r.q: r.est
        for r in weighted_quantiles(df, "v", "w", (0.2, 0.5, 0.9), ("k",)).collect()
    }
    assert got == {0.2: 2.0, 0.5: 3.0, 0.9: 4.0}


def test_weighted_quantiles_tied_values_merge_weights(spark):
    from transaq_clickhouse_exporter_spark.functions.quantiles import (
        weighted_quantiles,
    )

    # two rows of value 2.0 (weights 3 and 3) act as one value with
    # weight 6 — the RANGE-default peers-inclusive cumsum
    rows = [("g", 1.0, 1), ("g", 2.0, 3), ("g", 2.0, 3), ("g", 9.0, 1)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = {
        r.q: r.est for r in weighted_quantiles(df, "v", "w", (0.5,), ("k",)).collect()
    }
    assert got == {0.5: 2.0}
