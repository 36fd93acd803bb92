"""Oracle-paired query catalog: the driver's correctness gate.

The driver's testdata has no transaq-shaped tables, so this module
*derives* them deterministically from the TPC-H-ish base tables with
pure integer/CASE arithmetic that parses identically in Spark SQL and
DuckDB (one shared text per view).  Every dashboard query from
:mod:`.dashboard` then runs twice — Spark (DataFrame API, via the real
implementation) and DuckDB (the oracle SQL with the same derivation as
a CTE prefix) — and must hash-match.

Determinism rules that make exact value-hash matching possible:

- **Integer-valued doubles.**  Derived ``price`` is
  ``floor(l_extendedprice/100)`` cast to double, so every
  ``price*quantity*lotsize`` product is an integer ≤ 5e7 and sums stay
  < 2^53 — double addition is then exact and order-independent, which
  removes cross-engine float-sum drift entirely.
- **Epoch bigints, not timestamps, in outputs.**  Timestamp columns are
  converted with ``unix_timestamp`` (session tz pinned UTC) before
  returning, so no timezone or timestamp-encoding assumption of the
  driver's hasher is load-bearing.
- **Total tie-breaks** on every ORDER BY … LIMIT query (the reference
  orders by value only; we add the key so the selected *set* is unique).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_write_wins
from ..testdata import register_views
from . import dashboard as dash

# --------------------------------------------------------------------------
# Derived transaq views — shared Spark/DuckDB SQL texts
# --------------------------------------------------------------------------

#: One synthetic trading day 2024-12-20 10:00:00–18:39:00 UTC, minute
#: granularity (520 minutes), 40 securities.  secid ≥ 33 trades 2/3 on
#: TQTF (the ETF set), secid ≤ 4 on FUT, the rest on TQBR — so the
#: dashboard's NOT-IN-ETF anti-join genuinely removes rows.
#:
#: Every value column is a pure function of the ReplacingMergeTree key
#: (secid/board/sec_code/trade_no/time_s/buy_sell derive from
#: (l_orderkey, l_linenumber, l_partkey)): the driver's lineitem has
#: duplicate (orderkey, linenumber, partkey) rows, so key-tied rows must
#: be value-identical for last-write-wins to be engine-independent.
TRADES_CORE_SQL = """
SELECT
  CAST(1734688800 + ((l_orderkey * 7 + l_linenumber * 13) % 520) * 60 AS BIGINT) AS time_s,
  CAST((l_partkey % 40) + 1 AS INT) AS secid,
  concat('SEC', lpad(CAST((l_partkey % 40) + 1 AS STRING), 3, '0')) AS sec_code,
  CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS trade_no,
  CASE WHEN (l_partkey % 40) + 1 >= 33 AND (l_orderkey * 10 + l_linenumber) % 3 <> 0 THEN 'TQTF'
       WHEN (l_partkey % 40) + 1 <= 4 THEN 'FUT'
       ELSE 'TQBR' END AS board,
  CAST(((l_orderkey * 10 + l_linenumber) * 7 + l_partkey % 40) % 900 + 100 AS DOUBLE) AS price,
  CAST((l_orderkey * 10 + l_linenumber + l_partkey % 40) % 50 + 1 AS BIGINT) AS quantity,
  CASE WHEN (l_orderkey + l_linenumber) % 2 = 0 THEN 'B' ELSE 'S' END AS buy_sell,
  CAST(CASE WHEN (l_partkey % 40) + 1 <= 4
            THEN (l_orderkey * 10 + l_linenumber) % 1000 ELSE 0 END AS INT) AS open_interest,
  'N' AS period
FROM lineitem
"""

SECURITIES_SQL = """
SELECT secid, sec_code AS seccode, board,
  CASE WHEN board = 'FUT' THEN 'F' ELSE 'E' END AS instrclass,
  CAST(CASE WHEN board = 'FUT' THEN 4 ELSE 1 END AS INT) AS market,
  concat('Security ', sec_code) AS shortname,
  CAST(secid % 5 AS INT) AS decimals,
  CAST(secid AS DOUBLE) / 100.0 AS minstep,
  CAST(CASE WHEN secid % 3 = 0 THEN 1 WHEN secid % 3 = 1 THEN 10 ELSE 100 END AS INT) AS lotsize,
  CAST(secid AS DOUBLE) * 1.5 AS point_cost,
  CASE WHEN board = 'FUT' THEN 'FUT' WHEN board = 'TQTF' THEN 'ETF' ELSE 'SHARE' END AS sectype,
  CAST(secid % 2 AS INT) AS quotestype
FROM (SELECT DISTINCT secid, sec_code, board FROM trades_core) AS d
"""

ETF_CODES_SQL = "SELECT DISTINCT seccode AS sec_code FROM securities WHERE board = 'TQTF'"

#: ReplacingMergeTree test table: every 50th trade gets a later version
#: with price+1 (same dedup key, higher _ingest_seq).
TRADES_DUP_SQL = """
SELECT time_s, secid, sec_code, trade_no, board, price, quantity, buy_sell,
       open_interest, period, CAST(1 AS BIGINT) AS _ingest_seq
FROM trades_core
UNION ALL
SELECT time_s, secid, sec_code, trade_no, board, price + 1.0, quantity, buy_sell,
       open_interest, period, CAST(2 AS BIGINT) AS _ingest_seq
FROM trades_core WHERE trade_no % 50 = 0
"""


def _trades_wrap(ts_expr: str) -> str:
    return f"SELECT c.*, {ts_expr} AS time FROM trades_core c"


#: Spark rendering: NTZ timestamp via epoch (session tz pinned UTC).
_SPARK_TS = "CAST(timestamp_seconds(time_s) AS TIMESTAMP_NTZ)"
#: DuckDB rendering: naive timestamp from exact microseconds.
_DUCK_TS = "make_timestamp(time_s * 1000000)"

#: CTE prefix prepended to every oracle SQL body.
ORACLE_CTE = (
    "WITH trades_core AS (" + TRADES_CORE_SQL + "), "
    "trades AS (" + _trades_wrap(_DUCK_TS) + "), "
    "securities AS (" + SECURITIES_SQL + "), "
    "etf_codes AS (" + ETF_CODES_SQL + "), "
    "trades_dup AS (" + TRADES_DUP_SQL + ") "
)


def register_derived_views(spark: SparkSession) -> None:
    spark.sql(f"CREATE OR REPLACE TEMP VIEW trades_core AS {TRADES_CORE_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW trades AS {_trades_wrap(_SPARK_TS)}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW securities AS {SECURITIES_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW etf_codes AS {ETF_CODES_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW trades_dup AS {TRADES_DUP_SQL}")


# --------------------------------------------------------------------------
# Shared query parameters (the Grafana template variables, GDJ:3764-3890)
# --------------------------------------------------------------------------

FRM, TO = "2024-12-20 11:00:00", "2024-12-20 17:00:00"
F_S, T_S = 1734692400, 1734714000
INTERVAL_MIN = 5
STEP = INTERVAL_MIN * 60
SEC_CODES = ["SEC005", "SEC012", "SEC023"]
_CODES_IN = "('SEC005', 'SEC012', 'SEC023')"
TRADES_DEDUP_KEYS = ("secid", "board", "sec_code", "trade_no", "time_s", "buy_sell")


def _epoch(df: DataFrame, col: str, out: str) -> DataFrame:
    """Timestamp column → epoch-seconds bigint output column."""
    cols = [
        F.unix_timestamp(c).alias(out) if c == col else F.col(c) for c in df.columns
    ]
    return df.select(*cols)


# --------------------------------------------------------------------------
# Catalog
# --------------------------------------------------------------------------


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession], DataFrame]
    #: DuckDB oracle body (``ORACLE_CTE`` is prepended); None → the
    #: driver records a weaker rows-only check.
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


def _t(spark: SparkSession) -> DataFrame:
    return spark.table("trades")


def _s(spark: SparkSession) -> DataFrame:
    return spark.table("securities")


def _e(spark: SparkSession) -> DataFrame:
    return spark.table("etf_codes")


def _dashboard_specs() -> list[QuerySpec]:
    sp: list[QuerySpec] = []

    # ---- flagship: GDJ:1069 «Volume trades by interval» (buys) ----
    sp.append(
        QuerySpec(
            "db01_volume_by_interval_buy",
            lambda s: _epoch(
                dash.volume_by_interval(_t(s), _s(s), SEC_CODES, INTERVAL_MIN, FRM, TO, "B"),
                "minute",
                "minute_s",
            ),
            f"""
            SELECT (time_s // {STEP}) * {STEP} AS minute_s,
                   sum(t.price * t.quantity * s.lotsize) AS vol
            FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
            WHERE t.sec_code IN {_CODES_IN} AND t.board = 'TQBR' AND t.buy_sell = 'B'
              AND (time_s // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
            GROUP BY 1
            """,
            tags=("dashboard", "join", "interval"),
        )
    )
    # ---- GDJ:1220 sells, ×-1 ----
    sp.append(
        QuerySpec(
            "db02_volume_by_interval_sell",
            lambda s: _epoch(
                dash.volume_by_interval(_t(s), _s(s), SEC_CODES, INTERVAL_MIN, FRM, TO, "S"),
                "minute",
                "minute_s",
            ),
            f"""
            SELECT (time_s // {STEP}) * {STEP} AS minute_s,
                   sum(t.price * t.quantity * s.lotsize) * -1 AS vol
            FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
            WHERE t.sec_code IN {_CODES_IN} AND t.board = 'TQBR' AND t.buy_sell = 'S'
              AND (time_s // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
            GROUP BY 1
            """,
            tags=("dashboard", "join", "interval"),
        )
    )
    # ---- GDJ:113 netto top-10 (two-level signed agg + HAVING + top-k) --
    inner_113 = f"""
        SELECT (time_s // {STEP}) * {STEP} AS minute_s, t.sec_code, t.buy_sell,
               (CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END)
                 * sum(t.price * t.quantity * s.lotsize) AS vol
        FROM trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
        WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
          AND (time_s // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
        GROUP BY 1, t.sec_code, t.buy_sell
    """
    sp.append(
        QuerySpec(
            "db03_netto_buy_top10",
            lambda s: dash.netto_top10(_t(s), _s(s), _e(s), INTERVAL_MIN, FRM, TO, "buy"),
            f"""
            SELECT sec_code, vol FROM (
              SELECT sec_code, sum(vol) AS vol FROM ({inner_113}) i
              GROUP BY sec_code HAVING sum(vol) > 0
            ) f ORDER BY vol DESC, sec_code LIMIT 10
            """,
            tags=("dashboard", "two-level-agg", "topk", "anti-join"),
        )
    )
    # ---- GDJ:136 / GDJ:219 union-all form, buy + sell directions ----
    union_136 = f"""
        SELECT sec_code, sum(t.price * t.quantity * s.lotsize) AS vol
        FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
        WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
          AND time_s BETWEEN {F_S} AND {T_S} AND t.buy_sell = 'B'
        GROUP BY sec_code
        UNION ALL
        SELECT sec_code, sum(t.price * t.quantity * s.lotsize) * -1 AS vol
        FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
        WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
          AND time_s BETWEEN {F_S} AND {T_S} AND t.buy_sell = 'S'
        GROUP BY sec_code
    """
    for name, d in (("db04_netto_union_buy_top10", "buy"), ("db05_netto_union_sell_top10", "sell")):
        sgn = 1 if d == "buy" else -1
        sp.append(
            QuerySpec(
                name,
                (lambda dd: lambda s: dash.netto_union_top10(_t(s), _s(s), _e(s), FRM, TO, dd))(d),
                f"""
                SELECT sec_code, sum(vol) * {sgn} AS vol FROM ({union_136}) u
                GROUP BY sec_code ORDER BY vol DESC, sec_code LIMIT 10
                """,
                tags=("dashboard", "union", "topk"),
            )
        )
    # ---- GDJ:374 «Айсберги» ----
    sp.append(
        QuerySpec(
            "db06_icebergs",
            lambda s: _epoch(dash.icebergs(_t(s), FRM, TO), "time", "time_s"),
            f"""
            SELECT time_s, sec_code AS sec, CAST(sum(quantity) AS BIGINT) AS vol
            FROM trades
            WHERE quantity = 1 AND buy_sell = 'B' AND time_s BETWEEN {F_S} AND {T_S}
            GROUP BY time_s, sec_code HAVING sum(quantity) > 1
            """,
            tags=("dashboard", "having"),
        )
    )
    # ---- GDJ:643 / GDJ:794 signed per-minute diff for chosen codes ----
    def _diff_inner(time_expr: str) -> str:
        return f"""
            SELECT ({time_expr} // {STEP}) * {STEP} AS minute_s, t.buy_sell,
                   (CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END)
                     * sum(t.price * t.quantity * s.lotsize) AS vol
            FROM trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
            WHERE t.sec_code IN {_CODES_IN} AND t.board = 'TQBR'
              AND ({time_expr} // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
            GROUP BY 1, t.buy_sell
        """

    sp.append(
        QuerySpec(
            "db07_volume_diff_by_interval",
            lambda s: _epoch(
                dash.volume_diff_by_interval(
                    _t(s), _s(s), INTERVAL_MIN, FRM, TO, sec_codes=SEC_CODES
                ),
                "minute",
                "minute_s",
            ),
            f"SELECT minute_s, sum(vol) AS vol FROM ({_diff_inner('time_s')}) i GROUP BY minute_s",
            tags=("dashboard", "two-level-agg"),
        )
    )
    sp.append(
        QuerySpec(
            "db08_volume_diff_day_shifted",
            lambda s: _epoch(
                dash.volume_diff_by_interval(
                    _t(s), _s(s), INTERVAL_MIN, FRM, TO, sec_codes=SEC_CODES, day_shift=1
                ),
                "minute",
                "minute_s",
            ),
            f"SELECT minute_s, sum(vol) AS vol FROM ({_diff_inner('(time_s + 86400)')}) i "
            "GROUP BY minute_s",
            tags=("dashboard", "two-level-agg", "time-arith"),
        )
    )
    # ---- GDJ:2322 IMOEX diff (anti-join form) ----
    imoex_inner = f"""
        SELECT (time_s // {STEP}) * {STEP} AS minute_s, t.buy_sell,
               (CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END)
                 * sum(t.price * t.quantity * s.lotsize) AS vol
        FROM trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
        WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
          AND (time_s // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
        GROUP BY 1, t.buy_sell
    """
    sp.append(
        QuerySpec(
            "db09_imoex_diff_by_interval",
            lambda s: _epoch(
                dash.volume_diff_by_interval(
                    _t(s), _s(s), INTERVAL_MIN, FRM, TO, etf_codes=_e(s)
                ),
                "minute",
                "minute_s",
            ),
            f"SELECT minute_s, sum(vol) AS vol FROM ({imoex_inner}) i GROUP BY minute_s",
            tags=("dashboard", "two-level-agg", "anti-join"),
        )
    )
    # ---- GDJ:2748 / GDJ:2899 / GDJ:3174 IMOEX & ETF volume, no dim join ----
    for name, bs, in_etf in (
        ("db10_imoex_volume_by_interval_buy", "B", False),
        ("db11_imoex_volume_by_interval_sell", "S", False),
        ("db12_etf_volume_by_interval_buy", "B", True),
    ):
        sgn = 1 if bs == "B" else -1
        etf_pred = (
            "sec_code IN (SELECT sec_code FROM etf_codes)"
            if in_etf
            else "sec_code NOT IN (SELECT sec_code FROM etf_codes) AND board = 'TQBR'"
        )
        sp.append(
            QuerySpec(
                name,
                (lambda b, ie: lambda s: _epoch(
                    dash.imoex_volume_by_interval(
                        _t(s), _e(s), INTERVAL_MIN, FRM, TO, b, in_etf=ie
                    ),
                    "minute",
                    "minute_s",
                ))(bs, in_etf),
                f"""
                SELECT (time_s // {STEP}) * {STEP} AS minute_s,
                       sum(price * quantity) * {sgn} AS vol
                FROM trades WHERE buy_sell = '{bs}' AND {etf_pred}
                  AND (time_s // {STEP}) * {STEP} BETWEEN {F_S} AND {T_S}
                GROUP BY 1
                """,
                tags=("dashboard", "semi-join" if in_etf else "anti-join"),
            )
        )
    # ---- GDJ:3584 per-timestamp IMOEX volume ----
    sp.append(
        QuerySpec(
            "db13_imoex_volume_by_time",
            lambda s: _epoch(
                dash.imoex_volume_by_time(_t(s), _e(s), FRM, TO, "B"), "time", "time_s"
            ),
            f"""
            SELECT time_s, sum(price * quantity) AS vol
            FROM trades
            WHERE buy_sell = 'B' AND sec_code NOT IN (SELECT sec_code FROM etf_codes)
              AND time_s BETWEEN {F_S} AND {T_S}
            GROUP BY time_s
            """,
            tags=("dashboard", "anti-join"),
        )
    )
    # ---- GDJ:1477 lots / GDJ:1885 counts per raw timestamp ----
    sp.append(
        QuerySpec(
            "db14_lots_by_time_sell",
            lambda s: _epoch(
                dash.lots_by_time(_t(s), SEC_CODES, FRM, TO, "S"), "time", "time_s"
            ),
            f"""
            SELECT time_s, CAST(sum(quantity) * -1 AS BIGINT) AS lots
            FROM trades
            WHERE sec_code IN {_CODES_IN} AND buy_sell = 'S' AND time_s BETWEEN {F_S} AND {T_S}
            GROUP BY time_s
            """,
            tags=("dashboard",),
        )
    )
    sp.append(
        QuerySpec(
            "db15_count_trades_by_time_buy",
            lambda s: _epoch(
                dash.count_trades_by_time(_t(s), SEC_CODES, FRM, TO, "B"), "time", "time_s"
            ),
            f"""
            SELECT time_s, CAST(count(price) AS BIGINT) AS cnt
            FROM trades
            WHERE sec_code IN {_CODES_IN} AND buy_sell = 'B' AND time_s BETWEEN {F_S} AND {T_S}
            GROUP BY time_s
            """,
            tags=("dashboard", "count"),
        )
    )
    # ---- template variables GDJ:3766 / GDJ:3879 ----
    sp.append(
        QuerySpec(
            "db16_distinct_sec_codes",
            lambda s: dash.distinct_sec_codes(_t(s), FRM, TO),
            f"""
            SELECT DISTINCT sec_code FROM trades
            WHERE time_s BETWEEN {F_S} AND {T_S}
            ORDER BY sec_code LIMIT 1000
            """,
            tags=("dashboard", "distinct"),
        )
    )
    sp.append(
        QuerySpec(
            "db17_etf_template_var",
            lambda s: dash.etf_sec_codes(_t(s), _s(s), FRM, TO),
            f"""
            SELECT DISTINCT t.sec_code FROM trades t
            JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
            WHERE s.board = 'TQTF' AND time_s BETWEEN {F_S} AND {T_S}
            ORDER BY t.sec_code LIMIT 1000
            """,
            tags=("dashboard", "semi-join", "distinct"),
        )
    )
    # ---- ReplacingMergeTree FINAL dedup (SURVEY §1.5 / O-12) ----
    sp.append(
        QuerySpec(
            "op01_dedup_last_write_wins",
            lambda s: dedup_last_write_wins(
                s.table("trades_dup"), TRADES_DEDUP_KEYS, "_ingest_seq"
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("price") * F.col("quantity")).alias("checksum"),
            ),
            f"""
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   sum(price * quantity) AS checksum
            FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY {', '.join(TRADES_DEDUP_KEYS)}
                  ORDER BY _ingest_seq DESC) AS rn
              FROM trades_dup
            ) d WHERE rn = 1
            """,
            tags=("operator", "dedup"),
        )
    )
    return sp


def catalog() -> dict[str, QuerySpec]:
    specs = _dashboard_specs()
    out = {s.name: s for s in specs}
    assert len(out) == len(specs), "duplicate query names"
    return out


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver entry: register base + derived views, run one catalog query."""
    register_views(spark, sf_dir)
    register_derived_views(spark)
    return catalog()[name].build(spark)


def oracle_map() -> dict[str, str]:
    return {
        name: ORACLE_CTE + spec.oracle
        for name, spec in catalog().items()
        if spec.oracle is not None
    }
