"""Spark-builtin name-collision sweep pins (VERDICT r10 item 2).

The ``monthname`` bug class generalized: the dialect lets unknown CH
function names pass through (loud unresolved-function errors guide
users), but a pass-through name that case-insensitively matches a
Spark builtin is SILENTLY CAPTURED by it.  ``tools/collision_sweep.py``
enumerates a curated public-CH-function universe against the live
session's ``spark.catalog.listFunctions()``; this suite

1. asserts the classification is CLEAN — every captured name is
   either audited value-equal (``COLLISION_ALLOWLIST``) or
   neutralized by a rewrite/raise (``COLLISION_FIXES``) — so a NEW
   Spark builtin capturing a today-loud CH name FAILS the suite
   instead of silently changing query results; and
2. value-pins each r11a fix against the public CH documented value.

Reference semantics: https://clickhouse.com/docs/sql-reference (the
values asserted below are CH's documented outputs; provenance per
entry in tools/collision_sweep.py).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.collision_sweep import (  # noqa: E402
    CH_FUNCTIONS,
    COLLISION_ALLOWLIST,
    COLLISION_FIXES,
    classify,
)
from transaq_clickhouse_exporter_spark.queries.ch_compat import (  # noqa: E402
    UnsupportedChSql,
    run_ch_sql,
)


def _one(spark, sql):
    return run_ch_sql(spark, sql).collect()[0][0]


def test_sweep_is_clean(spark):
    """Every Spark-builtin capture of a CH name is audited.

    This is the forward-compat pin: upgrading Spark adds builtins;
    any new one that captures a CH name this engine currently lets
    through loudly lands in UNAUDITED and fails here, forcing a
    value audit before it can ship as a silent diff.
    """
    report = classify(spark)
    assert report["UNAUDITED"] == [], (
        "unaudited Spark-builtin captures of CH names:\n  "
        + "\n  ".join(report["UNAUDITED"])
    )
    assert report["TRANSLATE-CRASH"] == [], (
        "translator crashed (non-UnsupportedChSql) on simple call "
        "shapes:\n  " + "\n  ".join(report["TRANSLATE-CRASH"])
    )
    # the universe + audit lists only grow; a shrink is a red flag
    assert len(CH_FUNCTIONS) >= 600
    assert len(COLLISION_ALLOWLIST) >= 90
    assert len(COLLISION_FIXES) >= 15
    # fixed names must actually be intercepted, not allowlisted twice
    assert not set(COLLISION_FIXES) & set(COLLISION_ALLOWLIST)


def test_round_is_bankers_for_floats_half_away_for_decimals(spark):
    # CH round() on Float64 is banker's: round(2.5)=2, round(3.5)=4
    assert _one(spark, "SELECT round(2.5) AS r") == 2.0
    assert _one(spark, "SELECT round(3.5) AS r") == 4.0
    assert _one(spark, "SELECT round(-2.5) AS r") == -2.0
    assert _one(spark, "SELECT round(2.567, 2) AS r") == 2.57
    # integers are fixed points of both modes
    assert _one(spark, "SELECT round(toInt64(7)) AS r") == 7
    # a DOUBLE column takes the banker's branch too (typeof dispatch)
    assert _one(
        spark,
        "SELECT round(x) AS r FROM (SELECT toFloat64(0.5) AS x)",
    ) == 0.0
    # roundBankers stays the explicit spelling
    assert _one(spark, "SELECT roundBankers(2.5) AS r") == 2.0


def test_trunc_truncate_numeric_toward_zero(spark):
    # CH trunc is NUMERIC truncation — Spark's trunc is DATE truncation
    assert _one(spark, "SELECT trunc(23.98) AS r") == 23.0
    assert _one(spark, "SELECT trunc(-23.98) AS r") == -23.0
    assert _one(spark, "SELECT truncate(1.77, 1) AS r") == 1.7
    assert _one(spark, "SELECT trunc(-1.77, 1) AS r") == -1.7
    assert _one(spark, "SELECT trunc(CAST(NULL AS Float64)) AS r") is None


def test_dayname_full_and_dayofweek_monday_first(spark):
    # 2024-05-17 is a Friday; 2024-05-19 a Sunday
    assert _one(spark, "SELECT dayName(toDate('2024-05-17')) AS r") == "Friday"
    # CH DAYOFWEEK (= toDayOfWeek): Monday=1 … Sunday=7; Spark's
    # captured dayofweek would answer Sunday=1 … Saturday=7
    assert _one(spark, "SELECT DAYOFWEEK(toDate('2024-05-17')) AS r") == 5
    assert _one(spark, "SELECT dayOfWeek(toDate('2024-05-19')) AS r") == 7
    assert _one(spark, "SELECT DAYOFWEEK(toDate('2024-05-13')) AS r") == 1


def test_left_right_negative_lengths(spark):
    # Spark's captured left/right answer '' for negative lengths
    assert _one(spark, "SELECT left('hello', 3) AS r") == "hel"
    assert _one(spark, "SELECT left('hello', -2) AS r") == "hel"
    assert _one(spark, "SELECT left('hello', -9) AS r") == ""
    assert _one(spark, "SELECT right('hello', 3) AS r") == "llo"
    assert _one(spark, "SELECT right('hello', -2) AS r") == "llo"
    assert _one(spark, "SELECT right('hello', -9) AS r") == ""
    assert _one(spark, "SELECT leftUTF8('привет', 4) AS r") == "прив"
    assert _one(spark, "SELECT rightUTF8('привет', -1) AS r") == "ривет"
    assert _one(spark, "SELECT reverseUTF8('привет') AS r") == "тевирп"


def test_greatest_least_null_propagation(spark):
    # CH: NULL if ANY argument is NULL; Spark's builtins skip NULLs
    assert _one(spark, "SELECT greatest(1, NULL) AS r") is None
    assert _one(spark, "SELECT least(NULL, 3) AS r") is None
    assert _one(spark, "SELECT greatest(1, 2, 3) AS r") == 3
    assert _one(spark, "SELECT least(1.5, 0.5, 2.5) AS r") == 0.5
    assert _one(spark, "SELECT max2(1, NULL) AS r") is None
    assert _one(spark, "SELECT max2(5, 2) AS r") == 5
    assert _one(spark, "SELECT min2(NULL, 2) AS r") is None
    assert _one(spark, "SELECT min2(5, 2) AS r") == 2
    with pytest.raises(UnsupportedChSql):
        run_ch_sql(spark, "SELECT max2(1, 2, 3) AS r")


def test_concat_with_separator_null_propagation(spark):
    # ADVICE r10: Spark concat_ws skips NULLs; CH returns NULL
    assert _one(spark,
                "SELECT concatWithSeparator('-', 'a', NULL) AS r") is None
    assert _one(spark,
                "SELECT concatWithSeparator('-', 'a', 'b') AS r") == "a-b"
    assert _one(spark, "SELECT concat_ws('-', 'x', NULL, 'y') AS r") is None
    assert _one(spark, "SELECT concat_ws('-', 'x', 'y') AS r") == "x-y"


def test_isnan_null_propagation(spark):
    assert _one(spark, "SELECT isNaN(NULL) AS r") is None
    assert bool(_one(spark, "SELECT isNaN(divide(0, 0)) AS r")) is True
    assert bool(_one(spark, "SELECT isNaN(1.5) AS r")) is False


def test_hex_unhex_bin(spark):
    # string/binary hex is byte-identical on both engines
    assert _one(spark, "SELECT hex('abc') AS r") == "616263"
    assert _one(spark, "SELECT unhex('303132') AS r") == "012"
    # integer hex: CH pads to the source type's width, which Spark's
    # BIGINT cannot know — the integer path raises at RUNTIME (loud)
    with pytest.raises(Exception, match="hex\\(\\) over"):
        run_ch_sql(spark, "SELECT hex(10) AS r").collect()
    with pytest.raises(UnsupportedChSql, match="bin"):
        run_ch_sql(spark, "SELECT bin(10) AS r")


def test_rand_family_is_uint32_bridged(spark):
    # pre-r11 structural bridge (test_ch_compat_scalars pins depth);
    # the sweep's job here is just that Spark's rand() can't capture
    v = _one(spark, "SELECT rand() AS r")
    assert 0 <= v < 2**32 and v == int(v)
    v = _one(spark, "SELECT rand32() AS r")
    assert 0 <= v < 2**32 and v == int(v)
    v = _one(spark, "SELECT randCanonical() AS r")
    assert 0.0 <= v < 1.0


def test_extract_nonliteral_pattern_raises(spark):
    # literal pattern: whole match (no group) / first group
    assert _one(spark,
                "SELECT extract('hello123world', '[0-9]+') AS r") == "123"
    assert _one(spark,
                "SELECT extract('key=val', 'key=([a-z]+)') AS r") == "val"
    with pytest.raises(UnsupportedChSql, match="LITERAL pattern"):
        run_ch_sql(spark, "SELECT extract(c, p) AS r FROM "
                          "(SELECT 'a1' AS c, '[0-9]' AS p)")


def test_review_r11a_case_insensitive_and_null_length(spark):
    """Review r11a findings: CH registers the MySQL/SQL-standard
    members of the batch CASE-INSENSITIVELY, so uppercase spellings
    must hit the same bridges (ROUND(2.5) is valid CH and answers 2);
    a NULL length NULL-propagates through left/right (Spark's
    greatest() in the negative branch would have swallowed it); and
    float-literal EXPRESSIONS take the banker's branch like CH's
    float-contaminated typing, not just bare literals."""
    assert _one(spark, "SELECT ROUND(2.5) AS r") == 2.0
    assert _one(spark, "SELECT round((2.5)) AS r") == 2.0
    assert _one(spark, "SELECT round(2.5 + 0) AS r") == 2.0
    assert _one(spark, "SELECT round(0.5 * 5) AS r") == 2.0
    assert _one(spark, "SELECT TRUNC(-1.77, 1) AS r") == -1.7
    assert _one(spark, "SELECT LEFT('hello', -2) AS r") == "hel"
    assert _one(spark, "SELECT RIGHT('hello', -2) AS r") == "llo"
    assert _one(spark, "SELECT GREATEST(1, NULL) AS r") is None
    assert _one(spark, "SELECT LEAST(NULL, 2) AS r") is None
    assert _one(spark, "SELECT CONCAT_WS('-', 'a', NULL) AS r") is None
    assert _one(spark, "SELECT HEX('ab') AS r") == "6162"
    assert _one(spark, "SELECT UNHEX('6162') AS r") == "ab"
    assert _one(spark, "SELECT MONTHNAME(toDate('2024-03-01')) AS r") \
        == "March"
    assert _one(spark, "SELECT DAYNAME(toDate('2024-05-17')) AS r") \
        == "Friday"
    assert _one(spark, "SELECT POSITION('Hello, world!', 'o') AS r") == 5
    assert _one(spark, "SELECT ISNAN(NULL) AS r") is None
    assert 0 <= _one(spark, "SELECT RAND() AS r") < 2**32
    with pytest.raises(UnsupportedChSql, match="bin"):
        run_ch_sql(spark, "SELECT BIN(10) AS r")
    assert str(_one(
        spark,
        "SELECT toDate(DATE_ADD(YEAR, 3, toDate('2018-01-01'))) AS r",
    )) == "2021-01-01"
    # NULL length propagates (both directions)
    assert _one(spark,
                "SELECT left('hello', CAST(NULL AS Int32)) AS r") is None
    assert _one(spark,
                "SELECT right('hello', CAST(NULL AS Int32)) AS r") is None
    # NULL string propagates through the negative branch too
    assert _one(spark,
                "SELECT left(CAST(NULL AS String), -2) AS r") is None


def test_r11b_star_apply_and_columns_resolve_from_catalog(spark):
    """VERDICT r10 item 3: `* [EXCEPT] APPLY (fn)` and `COLUMNS('re')
    [APPLY]` expand from the session catalog when the FROM is a plain
    registered table/view; unresolvable sources keep the named raise.
    Output columns carry CH's names (`sum(a)`); APPLY chains compose
    left-to-right; COLUMNS matches by regex SEARCH like CH's re2."""
    spark.sql(
        "SELECT 1 AS a, 2 AS b, 'x' AS name, CAST(3.5 AS DOUBLE) AS "
        "price UNION ALL SELECT 4, 5, 'y', CAST(4.5 AS DOUBLE)"
    ).createOrReplaceTempView("tv_r11b")
    df = run_ch_sql(spark, "SELECT * EXCEPT (name) APPLY(sum) FROM tv_r11b")
    assert df.columns == ["sum(a)", "sum(b)", "sum(price)"]
    assert [tuple(r) for r in df.collect()] == [(5, 7, 8.0)]
    # APPLY chain composes left-to-right with nested CH names
    df = run_ch_sql(spark, "SELECT * EXCEPT (name, price) APPLY(sum)"
                           " APPLY(toString) FROM tv_r11b")
    assert df.columns == ["toString(sum(a))", "toString(sum(b))"]
    assert [tuple(r) for r in df.collect()] == [("5", "7")]
    # COLUMNS: regex SEARCH, bare and with APPLY
    df = run_ch_sql(spark,
                    "SELECT COLUMNS('^[ab]$') FROM tv_r11b ORDER BY a")
    assert df.columns == ["a", "b"]
    assert [tuple(r) for r in df.collect()] == [(1, 2), (4, 5)]
    df = run_ch_sql(spark, "SELECT COLUMNS('^pr') APPLY(avg) FROM tv_r11b")
    assert df.columns == ["avg(price)"]
    assert [tuple(r) for r in df.collect()] == [(4.0,)]
    # nested block + outer WHERE-subquery don't confuse the FROM scan
    df = run_ch_sql(spark, "SELECT x FROM (SELECT * EXCEPT (name, "
                           "price) APPLY(max) FROM tv_r11b) AS s(x, y)")
    assert [tuple(r) for r in df.collect()] == [(4,)]
    # unresolvable sources keep the NAMED raise
    for bad in (
        "SELECT * APPLY(sum) FROM tv_r11b a JOIN tv_r11b b ON a.a = b.a",
        "SELECT * APPLY(sum) FROM (SELECT 1 AS z)",
        "SELECT COLUMNS('a') FROM (SELECT 1 AS a)",
    ):
        with pytest.raises(UnsupportedChSql):
            run_ch_sql(spark, bad)
    # lambda APPLY raises by name; no-match COLUMNS raises by name
    with pytest.raises(UnsupportedChSql, match="plain aggregate"):
        run_ch_sql(spark, "SELECT * APPLY(x -> x + 1) FROM tv_r11b")
    with pytest.raises(UnsupportedChSql, match="matches no column"):
        run_ch_sql(spark, "SELECT COLUMNS('zzz') FROM tv_r11b")
    spark.catalog.dropTempView("tv_r11b")


def test_dateadd_family_unit_first_and_interval_forms(spark):
    # CH date_add(unit, n, ts): Spark's captured date_add(date, days)
    # has the argument roles REVERSED — must route to timestampadd
    r = _one(spark,
             "SELECT toDate(date_add(YEAR, 3, toDate('2018-01-01'))) AS r")
    assert str(r) == "2018-01-01".replace("2018", "2021")
    r = _one(spark,
             "SELECT toDate(date_sub(DAY, 2, toDate('2018-01-03'))) AS r")
    assert str(r) == "2018-01-01"
    # 2-arg INTERVAL form is type-preserving (stays a DATE)
    r = _one(spark,
             "SELECT date_add(toDate('2018-01-01'), INTERVAL 3 YEAR) AS r")
    assert str(r) == "2021-01-01"
    r = _one(spark, "SELECT timestamp_sub(MONTH, 5, "
                    "toDateTime('2018-12-18 01:02:03')) AS r")
    assert "2018-07-18 01:02:03" in str(r)
    with pytest.raises(UnsupportedChSql, match="unit"):
        run_ch_sql(spark, "SELECT date_add(FORTNIGHT, 1, today()) AS r")
