"""Aggregating/SummingMergeTree semantics (operators/aggregating.py):
merge must be state-path-independent — any batching of the input rows
merges to the same final answer, and that answer equals direct
aggregation over the whole data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.aggregating import (
    finalize,
    merge_states,
    partial_states,
)


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        (i, f"K{i % 5}", float(100 + (i * 37) % 50), (i * 13) % 7 + 1)
        for i in range(400)
    ]
    return spark.createDataFrame(
        data, "rid long, key string, price double, qty long"
    )


def _final(states):
    return {
        r.key: (r.n, r.sum_qty, r.min_price, r.max_price, r.distinct_est)
        for r in finalize(states, ("key",))
        .withColumnRenamed("sum_qty", "sum_qty")
        .collect()
    }


def _parts(df, splits):
    return [
        partial_states(
            df.filter(cond),
            ("key",),
            sum_cols=("qty",),
            min_cols=("price",),
            max_cols=("price",),
            hll_col="rid",
        ).withColumnRenamed("sum_qty", "sum_qty")
        for cond in splits
    ]


def test_split_invariance_and_direct_equality(rows):
    whole = _parts(rows, [F.lit(True)])[0]
    by3 = _parts(rows, [F.pmod(F.col("rid"), F.lit(3)) == i for i in range(3)])
    skewed = _parts(
        rows, [F.col("rid") < 7, (F.col("rid") >= 7) & (F.col("rid") < 9),
               F.col("rid") >= 9]
    )
    a = _final(whole)
    b = _final(by3[0].unionAll(by3[1]).unionAll(by3[2]))
    c = _final(skewed[0].unionAll(skewed[1]).unionAll(skewed[2]))
    assert a == b == c
    # direct truth: counts/sums/extrema exact; rid is unique per row so
    # the HLL estimate must sit within the sketch's error band
    direct = {
        r.key: (r.n, r.sq, r.mn, r.mx)
        for r in rows.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sq"),
            F.min("price").alias("mn"), F.max("price").alias("mx"),
        )
        .collect()
    }
    for k, (n, sq, mn, mx, est) in a.items():
        assert (n, sq, mn, mx) == direct[k]
        assert abs(est - n) <= max(3, 0.15 * n)


def test_merge_is_associative(rows):
    p = _parts(rows, [F.pmod(F.col("rid"), F.lit(4)) == i for i in range(4)])
    left = merge_states(
        merge_states(p[0].unionAll(p[1]), ("key",)).unionAll(
            merge_states(p[2].unionAll(p[3]), ("key",))
        ),
        ("key",),
    )
    flat = merge_states(p[0].unionAll(p[1]).unionAll(p[2]).unionAll(p[3]), ("key",))
    assert _final(left) == _final(flat)


def test_rejects_unmergeable_columns(rows):
    bad = partial_states(rows, ("key",), sum_cols=("qty",)).withColumn(
        "avg_qty", F.lit(1.0)
    )
    with pytest.raises(ValueError):
        merge_states(bad, ("key",))


def test_scalar_only_states(rows):
    st = partial_states(rows, ("key",), sum_cols=("qty",))
    out = {r.key: (r.n, r.sum_qty) for r in finalize(st, ("key",)).collect()}
    want = {
        r.key: (r.n, r.sq)
        for r in rows.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sq"))
        .collect()
    }
    assert out == want
