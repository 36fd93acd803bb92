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
