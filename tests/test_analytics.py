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


def test_rolling_channel_frame(spark):
    from transaq_clickhouse_exporter_spark.queries import analytics as an

    rows = [
        # sec, time_s, price, quantity — 3 minutes of bars for one sec
        ("A", 0, 10.0, 1), ("A", 30, 12.0, 1),       # minute 0: high 12 low 10
        ("A", 60, 8.0, 2),                            # minute 60: high/low 8
        ("A", 120, 15.0, 1),                          # minute 120
    ]
    t = spark.createDataFrame(rows, "sec_code string, time_s long, price double, quantity long")
    out = {r.minute_s: r for r in an.rolling_channel(t, window_minutes=2).collect()}
    assert out[0].roll_high == 12.0 and out[0].roll_low == 10.0
    # trailing 2-bar frame: minute 60 sees minutes 0+60
    assert out[60].roll_high == 12.0 and out[60].roll_low == 8.0
    # minute 120 sees minutes 60+120 only
    assert out[120].roll_high == 15.0 and out[120].roll_low == 8.0
    assert out[120].roll_vol == 8.0 * 2 + 15.0


def test_ema_recurrence_and_partition_invariance(spark):
    from transaq_clickhouse_exporter_spark.queries.analytics import ema

    rows = [("A", t, float(v)) for t, v in enumerate([10, 12, 11, 15, 14])]
    rows += [("B", t, float(v)) for t, v in enumerate([100, 90])]
    df = spark.createDataFrame(rows, "sec_code string, bucket_s long, close double")
    got = {(r.sec_code, r.bucket_s): r.ema for r in ema(df, alpha=0.5).collect()}

    def ref(xs, a=0.5):
        e, out = None, []
        for x in xs:
            e = x if e is None else e + a * (x - e)
            out.append(e)
        return out

    want_a = ref([10, 12, 11, 15, 14])
    want_b = ref([100, 90])
    assert [got[("A", t)] for t in range(5)] == want_a
    assert [got[("B", t)] for t in range(2)] == want_b
    shuffled = sorted(
        map(tuple, ema(df.repartition(7), alpha=0.5).collect())
    )
    assert shuffled == sorted(map(tuple, ema(df, alpha=0.5).collect()))


def test_ema_stream_matches_batch_across_restart(spark, tmp_path):
    from transaq_clickhouse_exporter_spark.queries.analytics import ema, ema_stream
    from transaq_clickhouse_exporter_spark.sources.replay import write_jsonl_fixture

    b1 = [{"sec_code": "A", "bucket_s": t, "close": float(v)}
          for t, v in enumerate([10, 12, 11])]
    b1 += [{"sec_code": "B", "bucket_s": t, "close": float(v)}
           for t, v in enumerate([100, 90])]
    b2 = [{"sec_code": "A", "bucket_s": t + 3, "close": float(v)}
          for t, v in enumerate([15, 14])]
    b2 += [{"sec_code": "B", "bucket_s": 2, "close": 95.0}]
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    write_jsonl_fixture(f"{src}/a.jsonl", b1, mtime=1_000)

    def run():
        stream = (
            spark.readStream.schema("sec_code string, bucket_s long, close double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            ema_stream(stream, alpha=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # phase 1, then "kill" (availableNow terminates)
    write_jsonl_fixture(f"{src}/b.jsonl", b2, mtime=2_000)
    run()  # phase 2 resumes the recurrence from checkpointed state

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    whole = spark.createDataFrame(
        b1 + b2, "sec_code string, bucket_s long, close double"
    )
    want = sorted(map(tuple, ema(whole, alpha=0.5).collect()))
    assert got == want  # state crossed the restart: EMA identical to batch


def test_trailing_time_stats_range_semantics(spark):
    from transaq_clickhouse_exporter_spark.queries.analytics import trailing_time_stats

    rows = [
        # same-second peers see each other symmetrically (RANGE frame)
        ("S", 100, 1.0, 10),
        ("S", 100, 1.0, 20),
        # 399 is inside (100, 399] trailing-300 window of t=399? frame is
        # [t-299, t]: for t=399 the frame starts at 100 -> includes both
        ("S", 399, 1.0, 5),
        # 400: frame [101, 400] excludes the t=100 pair
        ("S", 400, 1.0, 7),
        ("T", 100, 1.0, 1),
    ]
    df = spark.createDataFrame(rows, "sec_code string, time_s long, price double, quantity long")
    got = {
        (r.sec_code, r.time_s, r.vol_trailing, r.n_trailing)
        for r in trailing_time_stats(df, seconds=300).collect()
    }
    assert got == {
        ("S", 100, 30, 2),
        ("S", 100, 30, 2),
        ("S", 399, 35, 3),
        ("S", 400, 12, 2),
        ("T", 100, 1, 1),
    }
