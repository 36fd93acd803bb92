"""HyperLogLog sketch (functions/hll.py): accuracy against exact
distinct counts, sketch mergeability, and the small-range
linear-counting branch.  Everything is deterministic (seed-free md5
hashing), so the assertions are exact reruns, not statistical luck."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.hll import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
)


def test_hll_accuracy_large_range(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    est = {
        r.l_returnflag: r.est
        for r in hll_distinct(li, "l_orderkey", ("l_returnflag",)).collect()
    }
    true = {
        r.l_returnflag: r.t
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("t"))
        .collect()
    }
    for k, t in true.items():
        assert abs(est[k] - t) / t < 0.1  # ~3σ of the p=10 error bound


def test_hll_merge_equals_whole(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    whole = sorted(
        map(tuple, hll_distinct(li, "l_orderkey", ("l_returnflag",)).collect())
    )
    a = hll_registers(li.filter("l_orderkey % 2 = 0"), "l_orderkey", ("l_returnflag",))
    b = hll_registers(li.filter("l_orderkey % 2 = 1"), "l_orderkey", ("l_returnflag",))
    merged = sorted(
        map(
            tuple,
            hll_estimate_from_registers(hll_merge(a, b), ("l_returnflag",)).collect(),
        )
    )
    assert merged == whole  # max-merge of registers is lossless


def test_hll_small_range_linear_counting(spark):
    # 150 true distincts at m=1024 buckets -> the linear-counting
    # branch; it is near-exact in this regime
    df = spark.range(5000).select((F.col("id") % 150).alias("u"))
    est = hll_distinct(df, "u").collect()[0].est
    assert abs(est - 150) <= 8


def test_hll_exact_small_sets(spark):
    df = spark.createDataFrame([(i,) for i in range(3)], "v long")
    assert hll_distinct(df, "v").collect()[0].est == 3


def test_hll_streaming_windowed_matches_batch(spark, tmp_path):
    from transaq_clickhouse_exporter_spark.functions.hll import (
        hll_registers_windowed,
    )
    from transaq_clickhouse_exporter_spark.sources.replay import (
        write_jsonl_fixture,
    )

    rows1 = [
        {"user_id": i % 37, "ts": f"2024-01-01 10:{i % 60:02d}:00"} for i in range(200)
    ]
    rows2 = [
        {"user_id": i % 61, "ts": f"2024-01-01 11:{i % 60:02d}:00"} for i in range(200)
    ]
    src = str(tmp_path / "src")
    write_jsonl_fixture(f"{src}/a.jsonl", rows1, mtime=1_000)
    write_jsonl_fixture(f"{src}/b.jsonl", rows2, mtime=2_000)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    regs = hll_registers_windowed(stream, "user_id", "ts", window="1 hour")
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("hll_regs").select(
        F.col("win.start").cast("string").alias("w"), "bucket", "m_rho"
    )
    est = {
        r.w: r.est
        for r in hll_estimate_from_registers(got, ("w",)).collect()
    }
    # the streamed per-window registers must equal a batch sketch of the
    # same rows (incremental max == batch max), hence identical estimates
    batch = spark.createDataFrame(
        [(r["user_id"], r["ts"][:14] + "00:00") for r in rows1 + rows2],
        "user_id long, w string",
    )
    want = {
        r.w: r.est for r in hll_distinct(batch, "user_id", ("w",)).collect()
    }
    assert est == want and len(est) == 2
    # sanity: estimates are near the true distinct counts (37 and 61)
    assert abs(est["2024-01-01 10:00:00"] - 37) <= 4
    assert abs(est["2024-01-01 11:00:00"] - 61) <= 6
