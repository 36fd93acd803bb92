"""The reference's analytical query surface: all 20 Grafana panel queries
and 3 template-variable queries, as parameterized DataFrame builders.

Source: ``/root/reference/etc/grafana-dashboard-trades.json`` (GDJ).
Panel SQL lives at GDJ:113, 136, 219, 374, 643, 794, 1069, 1220, 1477,
1628, 1885, 2036, 2322, 2473, 2748, 2899, 3174, 3325, 3584, 3735;
template variables at GDJ:3764-3890.

Conventions
-----------
- ``trades`` / ``securities`` are DataFrames shaped per
  :mod:`..schemas` (``time`` may be TimestampType or TimestampNTZType).
- ``etf_codes`` (the ``$sec_code_etf`` template variable, GDJ:3879) is a
  one-column DataFrame ``sec_code`` — ClickHouse's ``NOT IN [$var]``
  becomes a broadcast **anti-join** (IN → semi-join), which is the plan
  that survives when the list stops fitting in a literal.
- ``frm``/``to`` are inclusive bounds (``$__fromTime``/``$__toTime``),
  naive-timestamp strings or datetimes.
- The securities dimension is tiny (~hundreds of rows) → every
  fact⋈dim join is explicitly ``F.broadcast``; at 100 TB the fact side
  never shuffles for these joins.

Catalyst notes: the two-level aggregations (GDJ:113 etc.) are expressed
as chained groupBys — Spark plans partial→final hash aggregation
map-side automatically; top-K ``ORDER BY … LIMIT k`` plans as
``TakeOrderedAndProject`` (no total sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.intervals import to_start_of_interval
from ..functions.signed import signed

# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


def _time_range(df: DataFrame, frm, to, col: str = "time") -> DataFrame:
    """``time >= $__fromTime AND time <= $__toTime`` — on a
    time-partitioned store this is the partition-pruning predicate."""
    return df.filter((F.col(col) >= F.lit(frm)) & (F.col(col) <= F.lit(to)))


def join_lotsize(trades: DataFrame, securities: DataFrame, on_secid: bool = False) -> DataFrame:
    """``trades JOIN securities s ON (sec_code = s.seccode AND board =
    s.board)`` (GDJ:113) or the secid variant (GDJ:136) — broadcast hash
    join, keeping ``lotsize`` for money-volume arithmetic."""
    dim_cols = ["secid" if on_secid else "seccode", "board", "lotsize"]
    dim = F.broadcast(securities.select(*dim_cols).dropDuplicates(dim_cols[:2]))
    if on_secid:
        return trades.join(dim, on=["secid", "board"], how="inner")
    return trades.join(
        dim, on=(trades["sec_code"] == dim["seccode"]) & (trades["board"] == dim["board"]),
        how="inner",
    ).drop(dim["board"]).drop("seccode")


def _not_in_etf(trades: DataFrame, etf_codes: DataFrame) -> DataFrame:
    """``sec_code not in [$sec_code_etf]`` → broadcast left-anti join."""
    return trades.join(F.broadcast(etf_codes), on="sec_code", how="left_anti")


def _in_etf(trades: DataFrame, etf_codes: DataFrame) -> DataFrame:
    """``sec_code in [$sec_code_etf]`` → broadcast left-semi join."""
    return trades.join(F.broadcast(etf_codes), on="sec_code", how="left_semi")


def money_volume() -> F.Column:
    """``price * quantity * s.lotsize`` (GDJ:113)."""
    return F.col("price") * F.col("quantity") * F.col("lotsize")


# --------------------------------------------------------------------------
# panels
# --------------------------------------------------------------------------


def netto_top10(
    trades: DataFrame,
    securities: DataFrame,
    etf_codes: DataFrame,
    interval: int,
    frm,
    to,
    direction: str = "buy",
) -> DataFrame:
    """Panels «Нетто покупки в IMOEX» (GDJ:113): two-level aggregation —
    signed money volume per (minute, sec_code, buy_sell), re-aggregated
    per sec_code, ``HAVING > 0``, top-10.  ``direction='sell'`` flips
    the ranking (net sells)."""
    # NB: GDJ:113 applies the time range to the *bucketed* minute, not
    # the raw time (`WHERE ... minute >= $__fromTime`), so bucket first.
    inner = (
        _not_in_etf(trades, etf_codes)
        .filter(F.col("board") == "TQBR")
        .transform(lambda df: join_lotsize(df, securities))
        .withColumn("minute", to_start_of_interval(F.col("time"), interval))
        .transform(lambda df: _time_range(df, frm, to, col="minute"))
        .groupBy("minute", "sec_code", "buy_sell")
        .agg((signed("buy_sell") * F.sum(money_volume())).alias("vol"))
    )
    sgn = F.lit(1) if direction == "buy" else F.lit(-1)
    return (
        inner.groupBy("sec_code")
        .agg((sgn * F.sum("vol")).alias("vol"))
        .filter(F.col("vol") > 0)
        # the reference orders by vol alone; the sec_code tie-break makes
        # the selected top-10 *set* deterministic (SURVEY §7.4)
        .orderBy(F.desc("vol"), "sec_code")
        .limit(10)
    )


def netto_union_top10(
    trades: DataFrame,
    securities: DataFrame,
    etf_codes: DataFrame,
    frm,
    to,
    direction: str = "buy",
) -> DataFrame:
    """Panels GDJ:136 («Нетто покупки», union form) / GDJ:219 («Нетто
    продажи»): buy-sum branch UNION ALL negated sell-sum branch over the
    secid-keyed dim join, re-aggregated per sec_code, top-10."""
    base = (
        _not_in_etf(_time_range(trades, frm, to), etf_codes)
        .filter(F.col("board") == "TQBR")
        .transform(lambda df: join_lotsize(df, securities, on_secid=True))
    )
    buys = (
        base.filter(F.col("buy_sell") == "B")
        .groupBy("sec_code")
        .agg(F.sum(money_volume()).alias("vol"))
    )
    sells = (
        base.filter(F.col("buy_sell") == "S")
        .groupBy("sec_code")
        .agg((F.sum(money_volume()) * -1).alias("vol"))
    )
    sgn = F.lit(1) if direction == "buy" else F.lit(-1)
    return (
        buys.unionAll(sells)
        .groupBy("sec_code")
        .agg((sgn * F.sum("vol")).alias("vol"))
        .orderBy(F.desc("vol"), "sec_code")
        .limit(10)
    )


def icebergs(trades: DataFrame, frm, to) -> DataFrame:
    """Panel «Айсберги» (GDJ:374): single-lot buys grouped by (time,
    sec_code), ``HAVING vol > 1``.  The reference's ``topK(10)(sec_code)``
    is degenerate here — sec_code is in the GROUP BY, so each group's
    sketch holds exactly its own code (SURVEY Q16)."""
    return (
        _time_range(trades, frm, to)
        .filter((F.col("quantity") == 1) & (F.col("buy_sell") == "B"))
        .groupBy("time", "sec_code")
        .agg(F.sum("quantity").alias("vol"))
        .filter(F.col("vol") > 1)
        .select("time", F.col("sec_code").alias("sec"), "vol")
        .orderBy("time", "sec")
    )


def volume_diff_by_interval(
    trades: DataFrame,
    securities: DataFrame,
    interval: int,
    frm,
    to,
    sec_codes: Sequence[str] | None = None,
    etf_codes: DataFrame | None = None,
    day_shift: int = 0,
) -> DataFrame:
    """Per-minute net (buy − sell) money volume.

    Covers four panels: GDJ:643/794 (``sec_code in [$sec_code]``, today /
    yesterday-shifted) and GDJ:2322/2473 (IMOEX: ``not in
    [$sec_code_etf]``).  ``day_shift=1`` reproduces
    ``timestamp_add(day, 1, time)`` — yesterday's trades on today's axis.
    """
    t = trades
    if day_shift:
        t = t.withColumn("time", F.col("time") + F.expr(f"INTERVAL {int(day_shift)} DAY"))
    t = t.filter(F.col("board") == "TQBR")
    if sec_codes is not None:
        t = t.filter(F.col("sec_code").isin(list(sec_codes)))
    if etf_codes is not None:
        t = _not_in_etf(t, etf_codes)
    inner = (
        join_lotsize(t, securities)
        .withColumn("minute", to_start_of_interval(F.col("time"), interval))
        .transform(lambda df: _time_range(df, frm, to, col="minute"))
        .groupBy("minute", "buy_sell")
        .agg((signed("buy_sell") * F.sum(money_volume())).alias("vol"))
    )
    return inner.groupBy("minute").agg(F.sum("vol").alias("vol")).orderBy("minute")


def volume_by_interval(
    trades: DataFrame,
    securities: DataFrame,
    sec_codes: Sequence[str],
    interval: int,
    frm,
    to,
    buy_sell: str,
) -> DataFrame:
    """Panels GDJ:1069 (buys) / GDJ:1220 (sells ×−1): per-minute money
    volume for chosen codes on TQBR, secid-keyed dim join."""
    sgn = 1 if buy_sell == "B" else -1
    return (
        trades.filter(
            F.col("sec_code").isin(list(sec_codes))
            & (F.col("board") == "TQBR")
            & (F.col("buy_sell") == buy_sell)
        )
        .transform(lambda df: join_lotsize(df, securities, on_secid=True))
        .withColumn("minute", to_start_of_interval(F.col("time"), interval))
        .transform(lambda df: _time_range(df, frm, to, col="minute"))
        .groupBy("minute")
        .agg((F.sum(money_volume()) * sgn).alias("vol"))
        .orderBy("minute")
    )


def lots_by_time(
    trades: DataFrame, sec_codes: Sequence[str], frm, to, buy_sell: str
) -> DataFrame:
    """Panels GDJ:1477/1628: lots traded per raw timestamp (sells ×−1)."""
    sgn = 1 if buy_sell == "B" else -1
    return (
        _time_range(trades, frm, to)
        .filter(F.col("sec_code").isin(list(sec_codes)) & (F.col("buy_sell") == buy_sell))
        .groupBy("time")
        .agg((F.sum("quantity") * sgn).alias("lots"))
        .orderBy("time")
    )


def count_trades_by_time(
    trades: DataFrame, sec_codes: Sequence[str], frm, to, buy_sell: str
) -> DataFrame:
    """Panels GDJ:1885/2036: trade count per raw timestamp (sells ×−1)."""
    sgn = 1 if buy_sell == "B" else -1
    return (
        _time_range(trades, frm, to)
        .filter(F.col("sec_code").isin(list(sec_codes)) & (F.col("buy_sell") == buy_sell))
        .groupBy("time")
        .agg((F.count("price") * sgn).alias("cnt"))
        .orderBy("time")
    )


def imoex_volume_by_interval(
    trades: DataFrame,
    etf_codes: DataFrame,
    interval: int,
    frm,
    to,
    buy_sell: str,
    in_etf: bool = False,
) -> DataFrame:
    """Panels GDJ:2748/2899 (IMOEX: NOT IN ETF, board TQBR) and
    GDJ:3174/3325 (``in_etf=True``: ETF only, no board filter): per-minute
    ``sum(price*quantity)`` — no dim join — with the reference's
    ``LIMIT 10000`` series guard."""
    t = trades.filter(F.col("buy_sell") == buy_sell)
    if in_etf:
        t = _in_etf(t, etf_codes)
    else:
        t = _not_in_etf(t, etf_codes).filter(F.col("board") == "TQBR")
    sgn = 1 if buy_sell == "B" else -1
    return (
        t.withColumn("minute", to_start_of_interval(F.col("time"), interval))
        .transform(lambda df: _time_range(df, frm, to, col="minute"))
        .groupBy("minute")
        .agg((F.sum(F.col("price") * F.col("quantity")) * sgn).alias("vol"))
        .orderBy("minute")
        .limit(10000)
    )


def imoex_volume_by_time(
    trades: DataFrame, etf_codes: DataFrame, frm, to, buy_sell: str
) -> DataFrame:
    """Panels GDJ:3584/3735: ``sum(price*quantity)`` per raw timestamp,
    NOT IN ETF (no board filter)."""
    sgn = 1 if buy_sell == "B" else -1
    return (
        _not_in_etf(_time_range(trades, frm, to), etf_codes)
        .filter(F.col("buy_sell") == buy_sell)
        .groupBy("time")
        .agg((F.sum(F.col("price") * F.col("quantity")) * sgn).alias("vol"))
        .orderBy("time")
    )


# --------------------------------------------------------------------------
# template variables (GDJ:3764-3890)
# --------------------------------------------------------------------------


def distinct_sec_codes(trades: DataFrame, frm, to) -> DataFrame:
    """``$sec_code`` (GDJ:3766): distinct codes in range, ordered,
    LIMIT 1000."""
    return (
        _time_range(trades, frm, to)
        .select("sec_code")
        .distinct()
        .orderBy("sec_code")
        .limit(1000)
    )


def etf_sec_codes(trades: DataFrame, securities: DataFrame, frm, to) -> DataFrame:
    """``$sec_code_etf`` (GDJ:3879): distinct codes trading on board
    TQTF in range (trades ⋈ securities on (sec_code, board))."""
    dim = F.broadcast(
        securities.filter(F.col("board") == "TQTF").select(
            F.col("seccode").alias("sec_code"), "board"
        ).dropDuplicates(["sec_code", "board"])
    )
    return (
        _time_range(trades, frm, to)
        .join(dim, on=["sec_code", "board"], how="left_semi")
        .select("sec_code")
        .distinct()
        .orderBy("sec_code")
        .limit(1000)
    )
