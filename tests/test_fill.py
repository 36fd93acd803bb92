"""Gap filling (functions/fill.py): spine completeness, zero vs
forward-fill strategies, leading-gap NULL, is_gap marking, per-key
independence, and strategy validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.fill import fill_gaps


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, vol long, px double")


def test_fill_semantics(spark):
    rows = [
        ("A", 0, 5, 10.0),
        ("A", 300, 7, 11.0),    # 100,200 missing? step 100: gaps at 100,200
        ("B", 100, 1, 2.0),
    ]
    out = fill_gaps(
        _series(spark, rows), "ts", 100, keys=("k",),
        fill={"vol": "zero", "px": "ffill"},
    )
    got = {(r.k, r.ts): (r.vol, r.px, r.is_gap) for r in out.collect()}
    assert got == {
        ("A", 0): (5, 10.0, False),
        ("A", 100): (0, 10.0, True),   # zero-filled vol, carried px
        ("A", 200): (0, 10.0, True),
        ("A", 300): (7, 11.0, False),
        ("B", 100): (1, 2.0, False),   # B's axis is its own [min,max]
    }


def test_unlisted_column_stays_null_and_leading_gap(spark):
    # ffill has nothing to carry before the first observation — a key
    # whose axis starts at its own min never has a leading gap, but an
    # unlisted column must stay NULL in generated rows.
    rows = [("A", 0, 5, 10.0), ("A", 200, 7, 11.0)]
    out = fill_gaps(_series(spark, rows), "ts", 100, keys=("k",))
    gap = [r for r in out.collect() if r.is_gap][0]
    assert (gap.ts, gap.vol, gap.px) == (100, None, None)


def test_bad_strategy_raises(spark):
    with pytest.raises(ValueError):
        fill_gaps(_series(spark, [("A", 0, 1, 1.0)]), "ts", 100, keys=("k",),
                  fill={"vol": "interp"})


def test_axis_is_complete_on_driver_data(spark, sf_smoke):
    from transaq_clickhouse_exporter_spark.queries.parity import (
        register_derived_views,
    )
    from transaq_clickhouse_exporter_spark.testdata import register_views

    register_views(spark, sf_smoke)
    register_derived_views(spark, sf_smoke)
    b = (
        spark.table("trades")
        .filter(F.col("quantity") >= 40)
        .withColumn("bucket_s", F.expr("time_s DIV 300 * 300"))
        .groupBy("sec_code", "bucket_s")
        .agg(F.sum("quantity").cast("long").alias("vol"))
    )
    out = fill_gaps(b, "bucket_s", 300, keys=("sec_code",), fill={"vol": "zero"})
    chk = out.groupBy("sec_code").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.max("bucket_s") - F.min("bucket_s")) / 300 + 1).alias("want"),
        F.sum(F.col("is_gap").cast("int")).alias("gaps"),
    )
    assert chk.filter(F.col("n") != F.col("want")).count() == 0
    assert chk.agg(F.sum("gaps")).collect()[0][0] > 0  # fixture really has gaps
