"""Explicit StructType schemas for the five reference tables and the raw
streaming event shapes.

Reference DDL: ``/root/reference/db.go:22-108`` (five ClickHouse
``ReplacingMergeTree`` tables).  Type-mapping policy (SURVEY §1.4):

=======================  ==============  =========================================
ClickHouse (reference)   Spark           rationale
=======================  ==============  =========================================
DateTime('Europe/Moscow') TimestampType  session tz pinned to Europe/Moscow
FixedString(N)           StringType      padding is a storage artifact
LowCardinality(T)        underlying T    encoding hint only (parquet dict enc.)
UInt8/UInt16             IntegerType     fits with headroom
UInt32 / UInt64          LongType        UInt32 max > Int32 max; volumes << 2^63
Int8/Int16/Int32         IntegerType
Int64                    LongType
Float32                  FloatType       reference prices are Float32 (db.go:57)
String                   StringType
=======================  ==============  =========================================

Known reference quirks normalized here (SURVEY §1.3): the
``transaq_quotes`` mixed-case ``Sell`` column (``db.go:105``) becomes
lowercase ``sell``; ``transaq_securities_info`` implements the declared
28-column DDL, not the off-by-one insert binding (``db.go:19`` has 27
placeholders, ``db.go:161-162`` passes 29 args).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Table schemas (at-rest, post-ingest)
# --------------------------------------------------------------------------

#: ``transaq_candles`` — db.go:22-32.  Dedup key ORDER BY (date, sec_code, period).
CANDLES = T.StructType(
    [
        T.StructField("date", T.TimestampType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("period", T.IntegerType(), False),
        T.StructField("open", T.FloatType(), True),
        T.StructField("close", T.FloatType(), True),
        T.StructField("high", T.FloatType(), True),
        T.StructField("low", T.FloatType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)

#: ``transaq_securities`` — db.go:34-48 (the dimension table).
SECURITIES = T.StructType(
    [
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("seccode", T.StringType(), False),
        T.StructField("instrclass", T.StringType(), True),
        T.StructField("board", T.StringType(), False),
        T.StructField("market", T.IntegerType(), True),
        T.StructField("shortname", T.StringType(), True),
        T.StructField("decimals", T.IntegerType(), True),
        T.StructField("minstep", T.FloatType(), True),
        T.StructField("lotsize", T.IntegerType(), True),
        T.StructField("point_cost", T.FloatType(), True),
        T.StructField("sectype", T.StringType(), True),
        T.StructField("quotestype", T.IntegerType(), True),
    ]
)

#: ``transaq_trades`` — db.go:50-62 (the main fact table).
TRADES = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("trade_no", T.LongType(), False),
        T.StructField("board", T.StringType(), False),
        T.StructField("price", T.FloatType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("buy_sell", T.StringType(), True),
        T.StructField("open_interest", T.IntegerType(), True),
        T.StructField("period", T.StringType(), True),
    ]
)

#: ``transaq_securities_info`` — db.go:64-94, declared 28-column schema.
SECURITIES_INFO = T.StructType(
    [
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("sec_name", T.StringType(), True),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("market", T.IntegerType(), True),
        T.StructField("pname", T.StringType(), True),
        T.StructField("mat_date", T.TimestampType(), True),
        T.StructField("clearing_price", T.FloatType(), True),
        T.StructField("minprice", T.FloatType(), True),
        T.StructField("maxprice", T.FloatType(), True),
        T.StructField("buy_deposit", T.FloatType(), True),
        T.StructField("sell_deposit", T.FloatType(), True),
        T.StructField("bgo_c", T.FloatType(), True),
        T.StructField("bgo_nc", T.FloatType(), True),
        T.StructField("bgo_buy", T.FloatType(), True),
        T.StructField("accruedint", T.FloatType(), True),
        T.StructField("coupon_value", T.FloatType(), True),
        T.StructField("coupon_date", T.TimestampType(), True),
        T.StructField("coupon_period", T.IntegerType(), True),
        T.StructField("facevalue", T.FloatType(), True),
        T.StructField("put_call", T.StringType(), True),
        T.StructField("point_cost", T.FloatType(), True),
        T.StructField("opt_type", T.StringType(), True),
        T.StructField("lot_volume", T.IntegerType(), True),
        T.StructField("isin", T.StringType(), True),
        T.StructField("regnumber", T.StringType(), True),
        T.StructField("buybackprice", T.FloatType(), True),
        T.StructField("buybackdate", T.TimestampType(), True),
        T.StructField("currencyid", T.StringType(), True),
    ]
)

#: ``transaq_trades_enriched`` — engine extension (r16): every trade
#: row plus the latest quote per (sec_code, board) at-or-before the
#: trade, joined IN the stream (operators/asof_stream) instead of at
#: query time the way the reference's dashboard panels join
#: trades⋈quotes.  Quote payloads carry a ``quote_`` prefix so the
#: trade columns stay verbatim.
TRADES_ENRICHED = T.StructType(
    list(TRADES.fields)
    + [
        T.StructField("quote_price", T.FloatType(), True),
        T.StructField("quote_buy", T.IntegerType(), True),
        T.StructField("quote_sell", T.IntegerType(), True),
        T.StructField("quote_yield", T.IntegerType(), True),
        T.StructField("quote_source", T.StringType(), True),
        T.StructField("quote_time", T.TimestampType(), True),
    ]
)

#: ``transaq_quotes`` — db.go:96-108; ``Sell`` normalized to ``sell``.
QUOTES = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("board", T.StringType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("price", T.FloatType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("yield", T.IntegerType(), True),
        T.StructField("buy", T.IntegerType(), True),
        T.StructField("sell", T.IntegerType(), True),
    ]
)

# --------------------------------------------------------------------------
# Raw streaming event shapes (pre-parse, as delivered by txmlconnector)
# --------------------------------------------------------------------------

#: Raw trade event — fields consumed at db.go:124-137; ``time`` is a
#: ``'dd.MM.yyyy HH:mm:ss'`` string (db.go:13, parsed db.go:125).
RAW_TRADE = T.StructType(
    [
        T.StructField("time", T.StringType(), False),
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("trade_no", T.LongType(), False),
        T.StructField("board", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("buy_sell", T.StringType(), True),
        T.StructField("open_interest", T.IntegerType(), True),
        T.StructField("period", T.StringType(), True),
    ]
)

#: Raw quote event — fields consumed at db.go:111-123; the event time is
#: the enclosing batch's receipt time (process.go:59), stamped by the
#: pipeline, so the raw row has no time column of its own.
RAW_QUOTE = T.StructType(
    [
        T.StructField("batch_time", T.StringType(), False),
        T.StructField("secid", T.IntegerType(), False),
        T.StructField("board", T.StringType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("yield", T.IntegerType(), True),
        T.StructField("buy", T.IntegerType(), True),
        T.StructField("sell", T.IntegerType(), True),
    ]
)

#: Raw candle page row — process.go:103-125; ``date`` is a
#: ``'dd.MM.yyyy HH:mm:ss'`` string (process.go:109).
RAW_CANDLE = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("period", T.IntegerType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)

#: Raw quotation tick — input to the stateful OHLCV candle builder
#: (process.go:126-169).  ``time`` is a wall-clock ``'HH:MM:SS'`` string;
#: the reference emits on ticks whose time ends in ``':00'``.
RAW_QUOTATION = T.StructType(
    [
        T.StructField("sec_id", T.IntegerType(), False),
        T.StructField("sec_code", T.StringType(), False),
        T.StructField("time", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("last", T.DoubleType(), True),
        T.StructField("quantity", T.LongType(), True),
    ]
)

#: Raw securities-directory row — fields consumed at main.go:126-176.
#: ``active`` is input-only (filtered at main.go:141, not persisted).
RAW_SECURITY = T.StructType(
    list(SECURITIES.fields) + [T.StructField("active", T.StringType(), True)]
)

#: Raw sec-info event — db.go:139-174; dates are 'dd.MM.yyyy' strings
#: (db.go:14, parsed db.go:140-142).
RAW_SEC_INFO = T.StructType(
    [
        f
        if f.name not in ("mat_date", "coupon_date", "buybackdate")
        else T.StructField(f.name, T.StringType(), True)
        for f in SECURITIES_INFO.fields
    ]
)

#: Positions snapshot — process.go:74-102: seven optional sub-lists,
#: merged field-wise (empty list does NOT overwrite prior state).  Kept
#: opaque as JSON-string payloads per sub-list; the merge operator only
#: needs presence/absence.
POSITIONS_SNAPSHOT_FIELDS = [
    "united_limits",
    "sec_positions",
    "forts_money",
    "money_position",
    "forts_position",
    "forts_collaterals",
    "spot_limit",
]
RAW_POSITIONS = T.StructType(
    [T.StructField("seq", T.LongType(), False), T.StructField("client", T.StringType(), False)]
    + [T.StructField(f, T.StringType(), True) for f in POSITIONS_SNAPSHOT_FIELDS]
)
