"""largestTriangleThreeBuckets / lttb through the dialect (r14,
fourth drain of the named-raise tail).

Reference semantics: Steinarsson's canonical LTTB (the algorithm
ClickHouse's AggregateFunctionLargestTriangleThreeBuckets implements
over x-sorted points): keep first and last; per middle bucket pick the
point maximizing the triangle area with the previously selected point
and the next bucket's average (strict >, first max wins).
Determinism contract: duplicate x values RAISE at runtime (CH sorts by
x only — candidate order and the tie pick are undefined there).
"""

from __future__ import annotations

import random

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def _ref(pts, nb):
    pts = sorted(pts)
    n = len(pts)
    if n <= nb:
        return pts
    every = (n - 2) / (nb - 2)
    a, out = 0, [pts[0]]
    for i in range(nb - 2):
        rs = int((i + 1) * every) + 1
        re_ = min(int((i + 2) * every) + 1, n)
        avx = sum(p[0] for p in pts[rs:re_]) / (re_ - rs)
        avy = sum(p[1] for p in pts[rs:re_]) / (re_ - rs)
        lo = int(i * every) + 1
        hi = int((i + 1) * every) + 1
        pa = pts[a]
        best, barea = None, -1.0
        for j in range(lo, hi):
            area = abs((pa[0] - avx) * (pts[j][1] - pa[1])
                       - (pa[0] - pts[j][0]) * (avy - pa[1])) * 0.5
            if area > barea:
                barea, best = area, j
        a = best
        out.append(pts[best])
    out.append(pts[-1])
    return out


def test_randomized_vs_reference(spark):
    rng = random.Random(1477)
    for trial in range(8):
        n = rng.randint(3, 40)
        nb = rng.randint(3, 12)
        xs = sorted(rng.sample(range(100), n))
        pts = [(float(x), float(rng.randint(0, 50))) for x in xs]
        vals = ", ".join(f"({x}, {y})" for x, y in pts)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(x, y)"
        ).createOrReplaceTempView("lttb_rand")
        got = run_ch_sql(spark, (
            f"SELECT largestTriangleThreeBuckets({nb})(x, y) AS r"
            " FROM lttb_rand")).collect()[0].r
        assert [(p.x, p.y) for p in got] == _ref(pts, nb), (
            f"trial {trial} n={n} nb={nb}")


def test_small_input_passthrough_and_alias(spark):
    spark.sql(
        "SELECT * FROM VALUES (3.0, 1.0), (1.0, 2.0), (2.0, 0.0)"
        " AS t(x, y)"
    ).createOrReplaceTempView("lttb_small")
    got = run_ch_sql(
        spark, "SELECT lttb(10)(x, y) AS r FROM lttb_small"
    ).collect()[0].r
    # n <= buckets: all points, sorted by x
    assert [(p.x, p.y) for p in got] == [(1.0, 2.0), (2.0, 0.0), (3.0, 1.0)]


def test_duplicate_x_raises(spark):
    spark.sql(
        "SELECT * FROM VALUES (1.0, 1.0), (1.0, 2.0), (2.0, 1.0),"
        " (3.0, 1.0) AS t(x, y)"
    ).createOrReplaceTempView("lttb_tied")
    with pytest.raises(Exception, match="duplicate x"):
        run_ch_sql(spark, (
            "SELECT largestTriangleThreeBuckets(3)(x, y) AS r"
            " FROM lttb_tied")).collect()


def test_empty_and_null_pairs(spark):
    got = run_ch_sql(spark, (
        "SELECT largestTriangleThreeBuckets(3)(x, y) AS r FROM"
        " (SELECT 1.0 AS x, 2.0 AS y WHERE 1 = 0)")).collect()[0].r
    assert got == []
    got = run_ch_sql(spark, (
        "SELECT largestTriangleThreeBuckets(5)(x, y) AS r FROM"
        " (SELECT 1.0 AS x, 2.0 AS y UNION ALL SELECT NULL, 9.0"
        " UNION ALL SELECT 3.0, NULL UNION ALL SELECT 2.0, 1.0)"
    )).collect()[0].r
    assert [(p.x, p.y) for p in got] == [(1.0, 2.0), (2.0, 1.0)]


def test_named_raises():
    for bad, rx in [
        ("largestTriangleThreeBuckets(x)(a, b)", "integer literal"),
        ("largestTriangleThreeBuckets(2)(a, b)", "3 buckets"),
        ("largestTriangleThreeBuckets(5)(a)", r"\(x, y\)"),
        ("largestTriangleThreeBuckets(5, 6)(a, b)", "bucket-count"),
    ]:
        with pytest.raises(UnsupportedChSql, match=rx):
            translate_ch_sql(f"SELECT {bad} FROM t")
