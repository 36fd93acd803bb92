"""exponentialMovingAverage through the dialect (r14, second drain of
the named-raise tail).

Reference semantics: ClickHouse ``ExponentiallySmoothedAverage``
(src/Common/ExponentiallySmoothedCounter.h): with T = latest timeunit,
result = Σᵢ vᵢ·2^((tᵢ−T)/x) · (1 − 2^(−1/x)) — the docs table's h=1
series over all-ones values gives 0.5, 0.75, 0.875, … (1 − 2^(−k)).
Documented deviation: CH folds in block/merge order (float result
order-dependent in the last ulps); this build folds in sorted
(timeunit, value) order — bitwise-reproducible, and the DuckDB mirror
replays the identical fold, so equality checks are exact.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def test_docs_series(spark):
    for k in (1, 2, 3, 4, 8):
        got = run_ch_sql(spark, (
            "SELECT exponentialMovingAverage(1)(v, t) AS ema FROM"
            f" (SELECT 1.0 AS v, number AS t FROM numbers({k}))"
        )).collect()[0].ema
        assert got == 1 - 2.0 ** -k


def test_single_point_and_half_decay(spark):
    assert run_ch_sql(
        spark, "SELECT exponentialMovingAverage(1)(8.0, 5) AS e"
    ).collect()[0].e == 4.0
    # h=2: single point weight 1 - 2^(-1/2).  Non-integer exponent →
    # JVM Math.pow may differ from CPython pow in the last ulp, so
    # this one check is approx; the engineered-exact paths (integer
    # exponents) stay bit-equal (randomized test below, ev30 oracle)
    got = run_ch_sql(
        spark, "SELECT exponentialMovingAverage(2)(1.0, 0) AS e"
    ).collect()[0].e
    assert got == pytest.approx(1 - 2.0 ** -0.5, rel=1e-14)


def test_empty_and_null_pairs(spark):
    # empty input answers NULL (module-wide Spark empty-agg deviation)
    assert run_ch_sql(spark, (
        "SELECT exponentialMovingAverage(1)(v, t) AS e FROM"
        " (SELECT 1.0 AS v, 1 AS t WHERE 1 = 0)")).collect()[0].e is None
    # NULL value/time pairs drop, the rest fold
    got = run_ch_sql(spark, (
        "SELECT exponentialMovingAverage(1)(v, t) AS e FROM (SELECT"
        " 8.0 AS v, 5 AS t UNION ALL SELECT NULL, 6 UNION ALL"
        " SELECT 3.0, NULL)")).collect()[0].e
    assert got == 4.0


def test_equal_times_add_like_ch_merge(spark):
    # two points at the same time: values add (CH merge a.time==b.time)
    got = run_ch_sql(spark, (
        "SELECT exponentialMovingAverage(1)(v, t) AS e FROM (SELECT"
        " 2.0 AS v, 7 AS t UNION ALL SELECT 6.0, 7)")).collect()[0].e
    assert got == (2.0 + 6.0) * 0.5


def test_randomized_vs_duckdb_fold(spark):
    rng = random.Random(1440)
    con = duckdb.connect()
    for trial in range(5):
        rows = [(g, rng.randint(0, 50), round(rng.uniform(1, 999), 2))
                for g in range(3) for _ in range(rng.randint(0, 12))]
        if not rows:
            continue
        vals = ", ".join(f"({g}, {t}, {v})" for g, t, v in rows)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(g, t, v)"
        ).createOrReplaceTempView("ema_rand")
        con.execute("CREATE OR REPLACE TABLE ema_rand(g INT, t INT, v DOUBLE)")
        con.executemany("INSERT INTO ema_rand VALUES (?, ?, ?)", rows)
        got = sorted(tuple(r) for r in run_ch_sql(spark, (
            "SELECT g, exponentialMovingAverage(1)(v, t) AS e"
            " FROM ema_rand GROUP BY g")).collect())
        want = sorted(con.execute("""
            WITH agg AS (SELECT g, list(struct_pack(t := t::DOUBLE,
                                v := v::DOUBLE) ORDER BY t, v) AS arr
                         FROM ema_rand GROUP BY g)
            SELECT g, list_reduce(list_transform(arr,
                     x -> struct_pack(s := x.v, t := x.t)),
                   (acc, x) -> struct_pack(s := x.s + acc.s *
                     pow(2.0::DOUBLE, (acc.t - x.t) / 1.0::DOUBLE),
                     t := x.t)).s
                 * (1.0::DOUBLE - pow(2.0::DOUBLE, -1.0::DOUBLE)) AS e
            FROM agg""").fetchall())
        assert got == want, f"trial {trial}"


def test_named_raises():
    for bad, rx in [
        ("exponentialMovingAverage(v, t)", "params"),
        ("exponentialMovingAverage(x)(v, t)", "numeric literal"),
        ("exponentialMovingAverage(1)(v)", "value, timeunit"),
        ("exponentialTimeDecayedAvg(1)(v, t)", "exponentialTimeDecayed"),
    ]:
        with pytest.raises(UnsupportedChSql, match=rx):
            translate_ch_sql(f"SELECT {bad} FROM s GROUP BY g")
