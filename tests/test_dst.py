"""Interval bucketing across Europe/Moscow DST transitions.

The dashboard's ``toStartOfInterval`` parity (`functions/intervals.py`)
floors EPOCHS, so bucket identity is timezone-free by construction; the
DST-sensitive surface is (a) the timestamp⇄epoch round trip and (b) the
wall-clock rendering of bucket labels in the session zone — exactly
what a Grafana user sees.  SURVEY §7.4 flags the Moscow transitions as
the risk case (`db.go:23` pins the column tz): fall-back repeats the
02:xx local hour, spring-forward deletes it.  Moscow abolished DST in
2014, so the 2010 transitions are the last real ones:

- 2010-10-31: 03:00 MSD (UTC+4) → 02:00 MSK (UTC+3) at 22:59:59 UTC
  + 1 s — the local 02:00–02:59 hour occurs TWICE;
- 2010-03-28: 02:00 MSK → 03:00 MSD at 2010-03-27 23:00 UTC — the
  local 02:00–02:59 hour never exists.

Both engines run pinned to Europe/Moscow and must agree bucket-for-
bucket on epochs AND on rendered local labels.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.intervals import (
    to_start_of_interval,
    to_start_of_interval_epoch,
)

# first tick (UTC epoch), ticks every 10 min for 6 h crossing the switch
FALL_BACK_START = 1288472400   # 2010-10-30 21:00:00 UTC = 2010-10-31 01:00 MSD
SPRING_FWD_START = 1269716400  # 2010-03-27 19:00:00 UTC = 22:00 MSK


@pytest.mark.parametrize("start", [FALL_BACK_START, SPRING_FWD_START])
def test_interval_bucketing_across_moscow_dst(spark, start):
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Moscow")
        ticks = [(i, start + i * 600) for i in range(36)]
        df = spark.createDataFrame(ticks, "tick_id long, time_s long")
        out = (
            df.withColumn("ts", F.timestamp_seconds("time_s"))
            .withColumn("bucket", to_start_of_interval(F.col("ts"), 30))
            .select(
                "tick_id",
                F.unix_timestamp("bucket").alias("bucket_s"),
                F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_local"),
                to_start_of_interval_epoch(F.col("time_s"), 30).alias("bucket_epoch"),
            )
        )
        got = {r.tick_id: r for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # timestamp path ≡ epoch fast path, including inside the fold/gap
    assert all(r.bucket_s == r.bucket_epoch for r in got.values())

    con = duckdb.connect()
    con.execute("SET TimeZone='Europe/Moscow'")
    values = ", ".join(f"({i}, {t})" for i, t in ticks)
    oracle = {
        tid: (int(bs), bl)
        for tid, bs, bl in con.execute(
            f"""
            SELECT tick_id,
                   CAST(epoch(to_timestamp((time_s // 1800) * 1800)) AS BIGINT) AS bucket_s,
                   strftime(to_timestamp((time_s // 1800) * 1800),
                            '%Y-%m-%d %H:%M:%S') AS bucket_local
            FROM (VALUES {values}) AS t(tick_id, time_s)
            """
        ).fetchall()
    }
    for tid, r in got.items():
        assert (r.bucket_s, r.bucket_local) == oracle[tid], tid

    locals_ = [r.bucket_local for r in got.values()]
    if start == FALL_BACK_START:
        # the ambiguous hour renders twice: two distinct instants share
        # a local label, so distinct labels < distinct epochs
        assert len(set(locals_)) < len({r.bucket_s for r in got.values()})
        assert sum(lb == "2010-10-31 02:00:00" for lb in locals_) >= 2
    else:
        # the skipped hour never renders
        assert not any(lb.startswith("2010-03-28 02:") for lb in locals_)
        assert any(lb.startswith("2010-03-28 01:") for lb in locals_)
        assert any(lb.startswith("2010-03-28 03:") for lb in locals_)


def test_calendar_shims_across_moscow_dst(spark):
    """The ch_compat calendar shims (day/week truncation) across the
    2010 Europe/Moscow spring-forward: a local day containing a
    skipped hour still truncates to its own local midnight, and week
    starts stay on local Sunday/Monday — pinned against DuckDB
    computing the same truncations in the same zone."""
    import duckdb

    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        register_ch_functions,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Moscow")
    try:
        register_ch_functions(spark)
        # 2010-03-28 is the spring-forward Sunday (02:00 -> 03:00)
        rows = spark.sql(
            "SELECT CAST(toStartOfDay(timestamp'2010-03-28 03:30:00') AS STRING) AS d,"
            " CAST(toStartOfWeek(timestamp'2010-03-28 03:30:00') AS STRING) AS w,"
            " CAST(toStartOfWeek(timestamp'2010-03-27 12:00:00') AS STRING) AS w_sat,"
            " CAST(toStartOfISOWeek(timestamp'2010-03-28 03:30:00') AS STRING) AS wi"
        ).collect()[0]
        assert rows.d == "2010-03-28 00:00:00"   # local midnight exists
        assert rows.w == "2010-03-28"            # the DST Sunday starts its week
        assert rows.w_sat == "2010-03-21"        # Saturday belongs to prior week
        assert rows.wi == "2010-03-22"           # ISO Monday of that week
        con = duckdb.connect()
        con.execute("SET TimeZone='Europe/Moscow'")
        [(dd, dw)] = con.execute(
            "SELECT strftime(date_trunc('day', TIMESTAMP '2010-03-28 03:30:00'),"
            " '%Y-%m-%d %H:%M:%S'),"
            " CAST(date_trunc('week', TIMESTAMP '2010-03-28 03:30:00') AS VARCHAR)"
        ).fetchall()
        assert dd == rows.d and dw == rows.wi
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_shim_registration_refreshes_on_timezone_change(spark):
    """Spark resolves a SQL UDF body under the configs captured at
    CREATE time, so the registration-gating marker must fold in the
    session timezone: after a tz change, register_ch_functions must
    re-register (NOT no-op) or the calendar shims keep truncating in
    the old zone (round-9 regression: gating marker ignored tz)."""
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        register_ch_functions,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        register_ch_functions(spark)
        spark.conf.set("spark.sql.session.timeZone", "Europe/Moscow")
        register_ch_functions(spark)   # must refresh under the new tz
        got = spark.sql(
            "SELECT CAST(toStartOfDay(timestamp'2010-03-28 03:30:00')"
            " AS STRING) AS d"
        ).collect()[0].d
        assert got == "2010-03-28 00:00:00"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        register_ch_functions(spark)


def test_db18_catalog_entry_skips_nonexistent_local_hour(spark, sf_smoke):
    """The driver-window DST entry (db18) must show the spring-forward
    gap: Moscow wall-clock buckets jump 01:30 -> 03:00; no bucket can
    fall in the never-existing 02:00-02:59 local hour.  Also pins the
    UTC->MSK offset flip (+3h before the transition, +4h after)."""
    from transaq_clickhouse_exporter_spark.queries.parity import run

    rows = run(spark, sf_smoke, "db18_dst_spring_buckets").collect()
    assert rows, "fixture produced no buckets"
    transition = 1269730800  # 2010-03-27 23:00:00 UTC
    for r in rows:
        local_s = r.msk_bucket_s % 86400
        assert not (2 * 3600 <= local_s < 3 * 3600), (
            f"bucket in the non-existent 02:xx local hour: {r}"
        )
        off = r.msk_bucket_s - r.bucket_s
        assert off == (4 * 3600 if r.bucket_s >= transition else 3 * 3600), r
    offs = {r.msk_bucket_s - r.bucket_s for r in rows}
    assert offs == {3 * 3600, 4 * 3600}, "range must cross the transition"


def test_db19_catalog_entry_repeats_ambiguous_local_hour(spark, sf_smoke):
    """Fall-back twin: the 2010-10-31 Moscow transition repeats the
    local 02:xx hour — at least one Moscow wall-clock bucket must be
    shared by TWO distinct UTC buckets, and the offset must step
    +4h -> +3h at 2010-10-30 23:00 UTC."""
    from collections import Counter

    from transaq_clickhouse_exporter_spark.queries.parity import run

    rows = run(spark, sf_smoke, "db19_dst_fall_buckets").collect()
    assert rows
    transition = 1288479600  # 2010-10-30 23:00:00 UTC
    for r in rows:
        off = r.msk_bucket_s - r.bucket_s
        assert off == (3 * 3600 if r.bucket_s >= transition else 4 * 3600), r
    assert {r.msk_bucket_s - r.bucket_s for r in rows} == {3 * 3600, 4 * 3600}
    dup = Counter(r.msk_bucket_s for r in rows)
    assert max(dup.values()) == 2  # the ambiguous hour renders twice


def test_fall_back_ambiguous_instants_pinned_on_both_engines(spark):
    """VERDICT r7 item 3: the 2010-10-31 ambiguous hour has TWO
    instants per wall-clock label.  Both engines must assign the SAME
    offset to the SAME instant — +4 h (MSD) for the pre-transition
    instant, +3 h (MSK) for the post-transition one — so the db19
    driver row cannot flap on the direction either engine resolves
    the fold.  Conversions here are instant→local (from_utc_timestamp
    / timezone()), which is offset-determined and has no ambiguity;
    this test pins that both engines implement that rule."""
    import duckdb

    # both render as Moscow wall clock 2010-10-31 02:30:00
    first_0230 = 1288477800   # 2010-10-30 22:30:00 UTC  (+4h, MSD)
    second_0230 = 1288481400  # 2010-10-30 23:30:00 UTC  (+3h, MSK)
    df = spark.createDataFrame(
        [(first_0230,), (second_0230,)], "t long"
    ).selectExpr(
        "t",
        "unix_timestamp(from_utc_timestamp(timestamp_seconds(t), "
        "'Europe/Moscow')) AS msk",
    )
    got = {r.t: r.msk for r in df.collect()}
    assert got[first_0230] - first_0230 == 4 * 3600
    assert got[second_0230] - second_0230 == 3 * 3600
    # identical local label, distinct instants
    con = duckdb.connect()
    want = {
        t: int(m)
        for t, m in con.execute(
            f"""
            SELECT t, CAST(epoch(timezone('Europe/Moscow', to_timestamp(t)))
                           AS BIGINT)
            FROM (VALUES ({first_0230}), ({second_0230})) AS v(t)
            """
        ).fetchall()
    }
    assert want == got  # engine-for-engine identical fold resolution
    assert got[first_0230] == got[second_0230]  # same wall clock twice
