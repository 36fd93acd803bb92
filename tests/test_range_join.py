"""Range (interval) join: binned decomposition ≡ naive theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.range_join import interval_join


def _points(spark):
    rows = [
        # (pid, key, t)
        (1, "A", 100),
        (2, "A", 119),   # bin boundary (w=60: bin 1)
        (3, "A", 120),   # exactly at an interval end -> excluded (half-open)
        (4, "A", 239),
        (5, "B", 100),   # right key, same times as A
        (6, "A", 500),   # matches nothing
    ]
    return spark.createDataFrame(rows, "pid long, k string, t long")


def _intervals(spark):
    rows = [
        # (iid, key, s, e)  — widths not multiples of the bin
        (10, "A", 90, 120),
        (11, "A", 100, 250),   # overlapping windows: points match BOTH
        (12, "B", 95, 101),
        (13, "A", 400, 450),   # empty window
    ]
    return spark.createDataFrame(rows, "iid long, k string, s long, e long")


def _run(spark, strategy):
    out = interval_join(
        _points(spark), _intervals(spark),
        point_ts="t", start_col="s", end_col="e", by=["k"],
        bin_width=60, strategy=strategy,
    )
    return sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())


def test_bin_equals_theta(spark):
    got = _run(spark, "bin")
    assert got == _run(spark, "theta")
    # half-open semantics: t=120 not in [90,120); overlap -> two matches
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (4, 11), (5, 12)]


def test_no_key_join(spark):
    pts = _points(spark).drop("k")
    iv = _intervals(spark).drop("k").filter(F.col("iid") == 11)
    out = interval_join(pts, iv, point_ts="t", start_col="s", end_col="e", bin_width=60)
    assert sorted(r.pid for r in out.collect()) == [1, 2, 3, 4, 5]


def test_column_collision_raises(spark):
    import pytest

    pts = _points(spark).withColumnRenamed("pid", "iid")
    with pytest.raises(ValueError):
        interval_join(pts, _intervals(spark), "t", "s", "e", by=["k"])


def test_theta_schema_matches_bin_with_keys(spark):
    """Both strategies emit ONE merged copy of each `by` column, so a
    downstream reference to the key is never ambiguous."""
    bin_out = interval_join(_points(spark), _intervals(spark), "t", "s", "e",
                            by=["k"], bin_width=60, strategy="bin")
    theta_out = interval_join(_points(spark), _intervals(spark), "t", "s", "e",
                              by=["k"], strategy="theta")
    assert bin_out.columns == theta_out.columns
    # the key survives a direct reference (would raise AnalysisException
    # if both sides' copies were retained)
    assert theta_out.filter(F.col("k") == "A").groupBy("k").count().collect()


def test_malformed_intervals_guarded(spark):
    """end <= start intervals are dropped before the bin explode —
    a huge negative span must not blow up `sequence`."""
    pts = _points(spark)
    bad = spark.createDataFrame(
        [(20, "A", 100, 100), (21, "A", 10**9, -(10**9))],
        "iid long, k string, s long, e long",
    )
    iv = _intervals(spark).unionAll(bad)
    out = interval_join(pts, iv, "t", "s", "e", by=["k"], bin_width=60)
    got = sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (4, 11), (5, 12)]


def test_bin_equals_theta_randomized(spark):
    """Seeded randomized corpus: the binned decomposition and the
    naive theta join agree pair-for-pair."""
    import random

    rng = random.Random(42)
    pts = [(i, rng.choice("AB"), rng.randrange(0, 2000)) for i in range(120)]
    ivs = [
        (100 + i, rng.choice("AB"), s := rng.randrange(0, 1900), s + rng.randrange(1, 300))
        for i in range(40)
    ]
    p = spark.createDataFrame(pts, "pid long, k string, t long")
    iv = spark.createDataFrame(ivs, "iid long, k string, s long, e long")

    def run(strategy):
        out = interval_join(p, iv, "t", "s", "e", by=["k"], bin_width=64, strategy=strategy)
        return sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())

    got = run("bin")
    assert got == run("theta") and len(got) > 0
