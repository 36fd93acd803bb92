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


def test_salted_lsh_band_join_hot_bucket(spark):
    """VERDICT r5 item 7: the one shuffle the dedup family has is the
    banding self-join — prove its skew story by salting a deliberately
    viral bucket and getting the identical pair set.  The 10M-row
    measurement of the same shape (SCALE.md "Round-8 rehearsal",
    tools/scale_rehearsal_round8.py) pins WHEN the salt pays: the
    right side replicates ×g, which dominates before the hot reducer
    does — keep g ≤ 8 and treat monster buckets as boilerplate
    shingles first."""
    from transaq_clickhouse_exporter_spark.datapipe.dedup import (
        _pairs_from_banded,
        minhash_near_dups,
    )

    # one hot (band, bucket): 60 ids → 1770 pairs on a single reducer
    # in the plain join; plus scattered singleton/pair buckets
    rows = [(i, 0, 777) for i in range(60)]
    rows += [(100 + i, 1, 1000 + i // 2) for i in range(20)]  # 10 small pairs
    rows += [(200 + i, 2, 2000 + i) for i in range(15)]       # singletons
    banded = spark.createDataFrame(rows, "doc_id long, band int, bucket long")

    def pairs(df):
        return {(r.id_a, r.id_b) for r in df.collect()}

    plain = pairs(_pairs_from_banded(banded))
    assert len(plain) == 60 * 59 // 2 + 10
    for g in (2, 8):
        assert pairs(_pairs_from_banded(banded, salt_buckets=g)) == plain

    # end-to-end: the salted path through minhash_near_dups is
    # output-identical on a corpus with a viral near-dup cluster
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base) for i in range(12)]                 # viral cluster
        + [(100, "totally unrelated text about columnar engines and shuffles")],
        "doc_id long, text string",
    )
    out_plain = pairs(minhash_near_dups(docs, threshold=0.9))
    out_salted = pairs(minhash_near_dups(docs, threshold=0.9, salt_buckets=4))
    assert out_salted == out_plain and len(out_plain) == 12 * 11 // 2
