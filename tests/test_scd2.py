"""SCD2 history (operators/scd2.py): version collapse, change-run
collapse, interval close, time-travel read, and composition with the
range join (op05's operator) for as-of enrichment."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.range_join import interval_join
from transaq_clickhouse_exporter_spark.operators.scd2 import as_of_state, scd2_history


def _quotes(spark, rows):
    return spark.createDataFrame(
        rows, "sec_code string, time_s long, price double, _ingest_seq long"
    )


def test_history_runs_and_intervals(spark):
    rows = [
        # SBER: 100 @t0, retry of t0 with newer seq wins (101),
        # unchanged re-quote at t10 collapses, change at t20, back at t30
        ("SBER", 0, 100.0, 1),
        ("SBER", 0, 101.0, 2),
        ("SBER", 10, 101.0, 3),
        ("SBER", 20, 105.0, 4),
        ("SBER", 30, 101.0, 5),
        ("GAZP", 5, 50.0, 6),
    ]
    h = scd2_history(_quotes(spark, rows), ("sec_code",), "time_s", ("price",))
    got = {
        (r.sec_code, r.valid_from_s): (r.valid_to_s, r.price) for r in h.collect()
    }
    assert got == {
        ("SBER", 0): (20, 101.0),     # re-quote at t10 did NOT fragment
        ("SBER", 20): (30, 105.0),
        ("SBER", 30): (None, 101.0),  # current run open
        ("GAZP", 5): (None, 50.0),
    }


def test_as_of_state(spark):
    rows = [("SBER", 0, 100.0, 1), ("SBER", 20, 105.0, 2)]
    h = scd2_history(_quotes(spark, rows), ("sec_code",), "time_s", ("price",))
    at = {t: as_of_state(h, t).select("price").collect() for t in (0, 19, 20)}
    assert [r.price for r in at[0]] == [100.0]
    assert [r.price for r in at[19]] == [100.0]
    assert [r.price for r in at[20]] == [105.0]


def test_composes_with_interval_join(spark):
    """Closed SCD2 runs are interval rows; point events join to the
    run that was valid at their timestamp."""
    rows = [("SBER", 0, 100.0, 1), ("SBER", 20, 105.0, 2)]
    h = scd2_history(_quotes(spark, rows), ("sec_code",), "time_s", ("price",))
    closed = h.filter(F.col("valid_to_s").isNotNull())
    pts = spark.createDataFrame(
        [("SBER", 5), ("SBER", 19)], "sec_code string, t long"
    )
    out = interval_join(
        pts, closed.drop("sec_code"), "t", "valid_from_s", "valid_to_s",
        bin_width=10,
    )
    assert [r.price for r in out.collect()] == [100.0, 100.0]


def test_multi_value_and_null_transitions(spark):
    rows = [
        ("A", 0, None, 1.0),
        ("A", 10, None, 1.0),   # no change
        ("A", 20, 5.0, 1.0),    # NULL -> 5.0 is a change
        ("A", 30, 5.0, 2.0),    # second value changes
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v1 double, v2 double")
    h = scd2_history(df, ("k",), "ts", ("v1", "v2"), order_col=None)
    got = sorted((r.valid_from_s, r.valid_to_s, r.v1, r.v2) for r in h.collect())
    assert got == [(0, 20, None, 1.0), (20, 30, 5.0, 1.0), (30, None, 5.0, 2.0)]


def test_twap_over_history(spark):
    from transaq_clickhouse_exporter_spark.queries.analytics import twap

    rows = [("SBER", 0, 100.0, 1), ("SBER", 60, 110.0, 2), ("SBER", 180, 120.0, 3)]
    h = scd2_history(_quotes(spark, rows), ("sec_code",), "time_s", ("price",))
    # window [30, 210): 100 for 30s, 110 for 120s, 120 (open) for 30s
    r = twap(h, 30, 210, keys=("sec_code",)).collect()[0]
    want = (100 * 30 + 110 * 120 + 120 * 30) / 180
    assert r.covered_s == 180 and abs(r.twap - round(want, 6)) < 1e-12
    # window entirely before/after the history contributes nothing
    assert twap(h, -100, -50, keys=("sec_code",)).count() == 0
