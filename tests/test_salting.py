from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.salting import (
    explode_salt,
    salted_agg,
    salted_broadcast_join,
)


def _skewed(spark, n=20000):
    # 90% of rows on one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))).alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def test_salted_agg_equals_direct(spark):
    df = _skewed(spark)
    direct = {
        (r["k"]): (r["s"], r["mn"], r["mx"], r["c"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.min("v").alias("mn"),
            F.max("v").alias("mx"), F.count(F.lit(1)).alias("c"),
        ).collect()
    }
    salted = {
        (r["k"]): (r["s"], r["mn"], r["mx"], r["c"])
        for r in salted_agg(
            df, ["k"],
            {"s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v"), "c": ("count", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_mergeable(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(_skewed(spark), ["k"], {"a": ("avg", "v")})


def test_salted_join_paths(spark):
    big = _skewed(spark, 5000)
    dim = spark.createDataFrame([("HOT", 1)] + [(f"k{i}", 2) for i in range(50)], "k string, grp int")
    bj = salted_broadcast_join(big, dim, ["k"])
    assert "BroadcastHashJoin" in bj._jdf.queryExecution().executedPlan().toString()
    assert bj.count() == 5000

    salted_dim = explode_salt(dim, 4)
    big_s = big.withColumn("__salt", (F.rand(42) * 4).cast("int"))
    out = big_s.join(salted_dim, ["k", "__salt"]).drop("__salt")
    assert out.count() == 5000  # every row matched exactly once
