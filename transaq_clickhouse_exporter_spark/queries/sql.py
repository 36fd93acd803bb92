"""SQL-text variants of the dashboard queries (SURVEY §3.3: each panel
expressed twice — DataFrame API primary, ``spark.sql`` secondary; both
reach the same Catalyst plan).

Each builder returns a Spark SQL string over session views named
``trades`` / ``securities`` / ``etf_codes`` (shaped per
:mod:`..schemas`), with the Grafana template variables as Python
parameters.  ``tests/test_sql_variants.py`` asserts every text is
result-identical to its DataFrame twin.
"""

from __future__ import annotations

from collections.abc import Sequence


def _lit(value: str) -> str:
    """Quote a string value as a SQL literal, doubling embedded single
    quotes (the one escape ANSI SQL defines).  Every template-variable
    interpolation below goes through this, so a hostile ``$sec_code`` /
    ``$__from`` value cannot terminate the literal and splice SQL text
    — the same guarantee Grafana's own variable escaping gives the
    reference's rawSql panels."""
    return "'" + str(value).replace("'", "''") + "'"


def _in_list(codes: Sequence[str]) -> str:
    return "(" + ", ".join(_lit(c) for c in codes) + ")"


def _bucket(col: str, interval_min: int) -> str:
    step = interval_min * 60
    return f"timestamp_seconds(CAST(unix_timestamp({col}) / {step} AS BIGINT) * {step})"


def volume_by_interval(codes: Sequence[str], interval: int, frm: str, to: str, buy_sell: str) -> str:
    """GDJ:1069/1220 «Volume trades by interval»."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT minute, sum(price * quantity * lotsize) * {sgn} AS vol FROM (
      SELECT {_bucket('t.time', interval)} AS minute, t.price, t.quantity, s.lotsize
      FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
      WHERE t.sec_code IN {_in_list(codes)} AND t.board = 'TQBR' AND t.buy_sell = {_lit(buy_sell)}
    ) b
    WHERE minute >= {_lit(frm)} AND minute <= {_lit(to)}
    GROUP BY minute ORDER BY minute
    """


def netto_top10(interval: int, frm: str, to: str) -> str:
    """GDJ:113 «Нетто покупки в IMOEX» — two-level signed aggregation."""
    return f"""
    SELECT sec_code, vol FROM (
      SELECT sec_code, sum(vol) AS vol FROM (
        SELECT {_bucket('t.time', interval)} AS minute, t.sec_code, t.buy_sell,
               (CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END)
                 * sum(t.price * t.quantity * s.lotsize) AS vol
        FROM trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
        WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
          AND {_bucket('t.time', interval)} BETWEEN {_lit(frm)} AND {_lit(to)}
        GROUP BY 1, t.sec_code, t.buy_sell
      ) i GROUP BY sec_code HAVING sum(vol) > 0
    ) f ORDER BY vol DESC, sec_code LIMIT 10
    """


def netto_union_top10(frm: str, to: str, direction: str = "buy") -> str:
    """GDJ:136/219 — union-all form."""
    sgn = 1 if direction == "buy" else -1
    branch = """
      SELECT sec_code, sum(t.price * t.quantity * s.lotsize) * {m} AS vol
      FROM trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board
      WHERE t.sec_code NOT IN (SELECT sec_code FROM etf_codes) AND t.board = 'TQBR'
        AND t.time BETWEEN {frm} AND {to} AND t.buy_sell = '{bs}'
      GROUP BY sec_code
    """
    return f"""
    SELECT sec_code, sum(vol) * {sgn} AS vol FROM (
      {branch.format(m=1, bs='B', frm=_lit(frm), to=_lit(to))}
      UNION ALL
      {branch.format(m=-1, bs='S', frm=_lit(frm), to=_lit(to))}
    ) u GROUP BY sec_code ORDER BY vol DESC, sec_code LIMIT 10
    """


def icebergs(frm: str, to: str) -> str:
    """GDJ:374 «Айсберги»."""
    return f"""
    SELECT time, sec_code AS sec, sum(quantity) AS vol
    FROM trades
    WHERE quantity = 1 AND buy_sell = 'B' AND time BETWEEN {_lit(frm)} AND {_lit(to)}
    GROUP BY time, sec_code HAVING sum(quantity) > 1
    ORDER BY time, sec
    """


def imoex_volume_by_interval(interval: int, frm: str, to: str, buy_sell: str) -> str:
    """GDJ:2748/2899 — anti-join ETF, no dim join, LIMIT 10000 guard."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT minute, sum(price * quantity) * {sgn} AS vol FROM (
      SELECT {_bucket('time', interval)} AS minute, price, quantity
      FROM trades
      WHERE buy_sell = {_lit(buy_sell)} AND board = 'TQBR'
        AND sec_code NOT IN (SELECT sec_code FROM etf_codes)
    ) b WHERE minute >= {_lit(frm)} AND minute <= {_lit(to)}
    GROUP BY minute ORDER BY minute LIMIT 10000
    """


def distinct_sec_codes(frm: str, to: str) -> str:
    """GDJ:3766 template variable."""
    return f"""
    SELECT sec_code FROM trades WHERE time BETWEEN {_lit(frm)} AND {_lit(to)}
    GROUP BY sec_code ORDER BY sec_code LIMIT 1000
    """


def volume_diff_by_interval(
    interval: int, frm: str, to: str, codes: Sequence[str] | None = None, day_shift: int = 0
) -> str:
    """GDJ:643/794 (code list) and GDJ:2322/2473 (NOT IN ETF): signed
    per-minute diff, optionally with yesterday's trades day-shifted onto
    today's axis."""
    time_expr = f"t.time + INTERVAL {day_shift} DAY" if day_shift else "t.time"
    pred = (
        f"t.sec_code IN {_in_list(codes)}"
        if codes is not None
        else "t.sec_code NOT IN (SELECT sec_code FROM etf_codes)"
    )
    return f"""
    SELECT minute, sum(vol) AS vol FROM (
      SELECT {_bucket(f'({time_expr})', interval)} AS minute, t.buy_sell,
             (CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END)
               * sum(t.price * t.quantity * s.lotsize) AS vol
      FROM trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
      WHERE {pred} AND t.board = 'TQBR'
        AND {_bucket(f'({time_expr})', interval)} BETWEEN {_lit(frm)} AND {_lit(to)}
      GROUP BY 1, t.buy_sell
    ) i GROUP BY minute ORDER BY minute
    """


def lots_by_time(codes: Sequence[str], frm: str, to: str, buy_sell: str) -> str:
    """GDJ:1477/1628: lots per raw timestamp (sells ×−1)."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT time, sum(quantity) * {sgn} AS lots FROM trades
    WHERE sec_code IN {_in_list(codes)} AND buy_sell = {_lit(buy_sell)}
      AND time BETWEEN {_lit(frm)} AND {_lit(to)}
    GROUP BY time ORDER BY time
    """


def count_trades_by_time(codes: Sequence[str], frm: str, to: str, buy_sell: str) -> str:
    """GDJ:1885/2036: trade counts per raw timestamp (sells ×−1)."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT time, count(price) * {sgn} AS cnt FROM trades
    WHERE sec_code IN {_in_list(codes)} AND buy_sell = {_lit(buy_sell)}
      AND time BETWEEN {_lit(frm)} AND {_lit(to)}
    GROUP BY time ORDER BY time
    """


def etf_volume_by_interval(interval: int, frm: str, to: str, buy_sell: str) -> str:
    """GDJ:3174/3325: ETF-only (semi-join), no board filter."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT minute, sum(price * quantity) * {sgn} AS vol FROM (
      SELECT {_bucket('time', interval)} AS minute, price, quantity
      FROM trades
      WHERE buy_sell = {_lit(buy_sell)} AND sec_code IN (SELECT sec_code FROM etf_codes)
    ) b WHERE minute >= {_lit(frm)} AND minute <= {_lit(to)}
    GROUP BY minute ORDER BY minute LIMIT 10000
    """


def imoex_volume_by_time(frm: str, to: str, buy_sell: str) -> str:
    """GDJ:3584/3735: per-timestamp IMOEX volume (NOT IN ETF, no board
    filter)."""
    sgn = 1 if buy_sell == "B" else -1
    return f"""
    SELECT time, sum(price * quantity) * {sgn} AS vol FROM trades
    WHERE buy_sell = {_lit(buy_sell)} AND sec_code NOT IN (SELECT sec_code FROM etf_codes)
      AND time BETWEEN {_lit(frm)} AND {_lit(to)}
    GROUP BY time ORDER BY time
    """


def etf_sec_codes(frm: str, to: str) -> str:
    """GDJ:3879 template variable: codes trading on board TQTF."""
    return f"""
    SELECT DISTINCT t.sec_code FROM trades t
    JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board
    WHERE s.board = 'TQTF' AND t.time BETWEEN {_lit(frm)} AND {_lit(to)}
    ORDER BY t.sec_code LIMIT 1000
    """
