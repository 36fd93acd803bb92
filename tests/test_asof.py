"""As-of join vs pandas merge_asof golden + edge cases."""

from __future__ import annotations

import pandas as pd

from transaq_clickhouse_exporter_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("SBER", 100, 1), ("SBER", 150, 2), ("SBER", 200, 3),
            ("GAZP", 100, 4),  # no prior quote → NULL
            ("SBER", 90, 5),   # before first quote → NULL
        ],
        "sec string, ts long, trade_no long",
    )
    quotes = spark.createDataFrame(
        [("SBER", 95, 10.0), ("SBER", 150, 11.0), ("SBER", 160, 12.0), ("GAZP", 120, 5.0)],
        "sec string, ts long, px double",
    )
    return trades, quotes


def test_asof_basic_inclusive_and_nulls(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_no"]: r["px"]
        for r in asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts").collect()
    }
    # trade@100 → quote@95; trade@150 → quote@150 (inclusive); trade@200 → quote@160
    assert out == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_matches_pandas(spark):
    trades, quotes = _frames(spark)
    got = (
        asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts")
        .toPandas().sort_values("trade_no").reset_index(drop=True)
    )
    lp = trades.toPandas().sort_values("ts", kind="stable")
    rp = quotes.toPandas().sort_values("ts", kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="sec").sort_values("trade_no").reset_index(drop=True)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_no"]: r["px"]
        for r in asof_join(
            trades, quotes, by=["sec"], left_ts="ts", right_ts="ts", tolerance_seconds=10
        ).collect()
    }
    # trade@200's latest quote is @160 → 40s stale → NULL; @150 exact → kept
    assert out == {1: 10.0, 2: 11.0, 3: None, 4: None, 5: None}


def test_asof_single_shuffle_plan(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no join node at all — union + window; exactly one exchange on the key
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matched_row_travels_whole(spark):
    """ADVICE r11 #1: when the MATCHED right row holds a NULL in one
    payload column, that NULL must survive — per-column ignorenulls
    windows would silently pull the column from an OLDER right row,
    mixing two right rows into one output row (CH ASOF JOIN returns
    the matched row whole, incl. its NULLs).  Pinned across all four
    direction/strict modes, multi-column payload, and tolerance."""
    trades = spark.createDataFrame(
        [("SBER", 150, 1)], "sec string, ts long, trade_no long")
    quotes = spark.createDataFrame(
        [("SBER", 95, 10.0, 100.0), ("SBER", 140, None, 200.0),
         ("SBER", 160, 12.0, None), ("SBER", 210, None, 400.0)],
        "sec string, ts long, bid double, ask double",
    )
    # backward: match is quote@140 → bid NULL (not 10.0 from @95), ask 200
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts").collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (None, 200.0, 140)
    # forward: match is quote@160 → ask NULL (not 400.0 from @210), bid 12
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts", direction="forward").collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (12.0, None, 160)
    # strict modes pick the same rows here (no ts collision) — same pins
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts", strict=True).collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (None, 200.0, 140)
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts", direction="forward", strict=True).collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (12.0, None, 160)
    # tolerance rides the matched row's own timestamp: gap 150-140=10
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts", tolerance_seconds=10).collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (None, 200.0, 140)
    row = asof_join(trades, quotes, by=["sec"], left_ts="ts", right_ts="ts",
                    right_ts_out="qts", tolerance_seconds=5).collect()[0]
    assert (row["bid"], row["ask"], row["qts"]) == (None, None, None)


def test_asof_four_comparators_vs_duckdb(spark):
    """r11e (VERDICT r10 item 8): CH's four ASOF comparators —
    ``>=`` (closest at-or-before), ``>`` (strictly before), ``<=``
    (closest at-or-after), ``<`` (strictly after) — through BOTH the
    operator (direction/strict) and the SQL bridge, value-pinned
    against DuckDB's own ASOF JOIN on randomized data with
    deliberate equal-timestamp collisions."""
    import random

    import duckdb

    from transaq_clickhouse_exporter_spark.queries.ch_compat import run_ch_sql

    rng = random.Random(0xA50F)
    lrows = [(k, rng.randint(0, 40), i)
             for i, k in enumerate(rng.choices(range(5), k=60))]
    rrows = [(k, rng.randint(0, 40), f"v{j}")
             for j, k in enumerate(rng.choices(range(5), k=40))]
    # dedup right (k, ts) so the pick is deterministic on both engines
    seen, rdedup = set(), []
    for k, ts, v in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts, v))
    spark.createDataFrame(lrows, "k int, ts int, lid int"
                          ).createOrReplaceTempView("asof_l")
    spark.createDataFrame(rdedup, "k int, ts int, v string"
                          ).createOrReplaceTempView("asof_r")
    con = duckdb.connect()
    con.execute("CREATE TABLE asof_l(k int, ts int, lid int)")
    con.executemany("INSERT INTO asof_l VALUES (?, ?, ?)", lrows)
    con.execute("CREATE TABLE asof_r(k int, ts int, v varchar)")
    con.executemany("INSERT INTO asof_r VALUES (?, ?, ?)", rdedup)

    for op in (">=", ">", "<=", "<"):
        for kw, dj in (("", "ASOF JOIN"), ("LEFT ", "ASOF LEFT JOIN")):
            got = sorted(map(tuple, run_ch_sql(
                spark,
                f"SELECT l.lid AS lid, l.ts AS lts, v FROM asof_l AS l"
                f" ASOF {kw}JOIN asof_r AS r"
                f" ON l.k = r.k AND l.ts {op} r.ts",
            ).select("lid", "lts", "v").collect()), key=repr)
            want = sorted(map(tuple, con.execute(
                f"SELECT l.lid, l.ts, r.v FROM asof_l l {dj} asof_r r"
                f" ON l.k = r.k AND l.ts {op} r.ts"
            ).fetchall()), key=repr)
            assert got == want, (op, kw)
    # mirrored spelling (r.ts OP l.ts) normalizes to the same join
    got = sorted(map(tuple, run_ch_sql(
        spark,
        "SELECT l.lid AS lid, v FROM asof_l AS l ASOF JOIN asof_r AS r"
        " ON l.k = r.k AND r.ts < l.ts",
    ).select("lid", "v").collect()), key=repr)
    want = sorted(map(tuple, con.execute(
        "SELECT l.lid, r.v FROM asof_l l ASOF JOIN asof_r r"
        " ON l.k = r.k AND l.ts > r.ts").fetchall()), key=repr)
    assert got == want


def test_asof_randomized_null_payload_vs_duckdb(spark):
    """ADVICE r11 #1 follow-up: randomized multi-column payload WITH
    NULLs across all four comparators and both join kinds, pinned
    against DuckDB's native ASOF JOIN (which returns the matched row
    whole, incl. its NULLs) — the fixed pins cover the mechanism,
    this covers the space."""
    import random

    import duckdb

    from transaq_clickhouse_exporter_spark.queries.ch_compat import run_ch_sql

    rng = random.Random(0xBEEF)
    lrows = [(k, rng.randint(0, 30), i)
             for i, k in enumerate(rng.choices(range(4), k=50))]
    rrows, seen = [], set()
    for j, k in enumerate(rng.choices(range(4), k=40)):
        ts = rng.randint(0, 30)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        rrows.append((k, ts,
                      None if rng.random() < 0.4 else float(j),
                      None if rng.random() < 0.4 else j * 10))
    spark.createDataFrame(lrows, "k int, ts int, lid int"
                          ).createOrReplaceTempView("asofn_l")
    spark.createDataFrame(rrows, "k int, ts int, bid double, ask int"
                          ).createOrReplaceTempView("asofn_r")
    con = duckdb.connect()
    con.execute("CREATE TABLE asofn_l(k int, ts int, lid int)")
    con.executemany("INSERT INTO asofn_l VALUES (?, ?, ?)", lrows)
    con.execute("CREATE TABLE asofn_r(k int, ts int, bid double, ask int)")
    con.executemany("INSERT INTO asofn_r VALUES (?, ?, ?, ?)", rrows)
    for op in (">=", ">", "<=", "<"):
        for kw, dj in (("", "ASOF JOIN"), ("LEFT ", "ASOF LEFT JOIN")):
            got = sorted(map(tuple, run_ch_sql(
                spark,
                f"SELECT l.lid AS lid, bid, ask FROM asofn_l AS l"
                f" ASOF {kw}JOIN asofn_r AS r"
                f" ON l.k = r.k AND l.ts {op} r.ts",
            ).select("lid", "bid", "ask").collect()), key=repr)
            want = sorted(map(tuple, con.execute(
                f"SELECT l.lid, r.bid, r.ask FROM asofn_l l {dj} asofn_r r"
                f" ON l.k = r.k AND l.ts {op} r.ts"
            ).fetchall()), key=repr)
            assert got == want, (op, kw)
