"""The switch-over test: run the reference daemon's full lifecycle on
this engine — bootstrap → streaming ingest → candle builder → dashboard
query over the stored tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark import jobs, schemas, storage
from transaq_clickhouse_exporter_spark.queries import dashboard
from transaq_clickhouse_exporter_spark.sources.replay import write_jsonl_fixture

from tests.oracle import utc_str


def _raw_securities(spark):
    rows = [
        (1, "SBER", "E", "TQBR", 1, "Сбербанк", 2, 0.01, 10, 1.0, "SHARE", 1, "true"),
        (2, "GAZP", "E", "TQBR", 1, "Газпром", 2, 0.01, 10, 1.0, "SHARE", 1, "true"),
        (0, "BAD", "E", "TQBR", 1, "Zero", 2, 0.01, 1, 1.0, "SHARE", 1, "true"),
    ]
    return spark.createDataFrame(rows, schema=schemas.RAW_SECURITY)


def test_full_lifecycle(spark, tmp_path):
    cfg = jobs.EngineConfig(data_dir=str(tmp_path / "data"), export_sec_codes=["ALL"])

    # phase 1: bootstrap
    subs = jobs.bootstrap_job(spark, _raw_securities(spark), cfg)
    assert subs["quotations"] == [1, 2]
    dim = storage.read_table_range(spark, cfg.table_path("transaq_securities"),
                                   "transaq_securities")
    assert dim.count() == 2

    # phase 3: stream trades + quotes from replay fixtures
    trades_rows = [
        {"time": f"20.12.2024 11:{m:02d}:00", "secid": 1 + (m % 2), "sec_code": ["SBER", "GAZP"][m % 2],
         "trade_no": 100 + m, "board": "TQBR", "price": 250.0 + m, "quantity": 5 + m,
         "buy_sell": "BS"[m % 2], "open_interest": 0, "period": "N"}
        for m in range(10)
    ]
    write_jsonl_fixture(str(tmp_path / "events" / "trades" / "t0.json"), trades_rows, mtime=1000)
    quote_rows = [
        {"batch_time": "20.12.2024 11:00:05", "secid": 1, "board": "TQBR", "sec_code": "SBER",
         "price": 250.5, "source": "", "yield": 0, "buy": 100, "sell": -50}
    ]
    write_jsonl_fixture(str(tmp_path / "events" / "quotes" / "q0.json"), quote_rows, mtime=1000)

    secinfo_rows = [{f.name: None for f in schemas.RAW_SEC_INFO.fields}
                    | {"secid": 6, "sec_code": "RU01", "market": 1,
                       "mat_date": "15.06.2025", "coupon_period": 182}]
    write_jsonl_fixture(str(tmp_path / "events" / "sec_info" / "s0.json"), secinfo_rows, mtime=1000)
    candle_rows = [{"date": "20.12.2024 10:00:00", "sec_code": "SBER", "period": 60,
                    "open": 1.0, "close": 2.0, "high": 3.0, "low": 0.5, "volume": 1000}]
    write_jsonl_fixture(str(tmp_path / "events" / "candles" / "c0.json"), candle_rows, mtime=1000)

    # all four event pipelines run concurrently (the reference's single
    # select-loop becomes four independent streaming queries)
    queries = jobs.streaming_job(
        spark, str(tmp_path / "events"), str(tmp_path / "ck"), cfg,
        pipelines=("trades", "quotes", "sec_info", "candles"),
    )
    for q in queries:
        q.awaitTermination(120)

    # phase 3b: stateful candle builder on quotation ticks
    tick_rows = [
        {"sec_id": 1, "sec_code": "SBER", "time": "11:00:30", "open": 0.0, "last": 250.0,
         "quantity": 3, "seq": 1},
        {"sec_id": 1, "sec_code": "SBER", "time": "11:01:00", "open": 0.0, "last": 251.0,
         "quantity": 2, "seq": 2},
    ]
    write_jsonl_fixture(str(tmp_path / "ticks" / "k0.json"), tick_rows, mtime=1000)
    q = jobs.candle_builder_job(spark, str(tmp_path / "ticks"), str(tmp_path / "ck_cb"), cfg,
                                emit_date="2024-12-20")
    q.awaitTermination(120)

    # query the stored tables like a dashboard user
    trades = storage.read_table_range(
        spark, cfg.table_path("transaq_trades"), "transaq_trades",
        frm="2024-12-20 11:00:00", to="2024-12-20 11:05:00",
    )
    assert trades.count() == 6  # minutes 0..5 within range
    all_trades = storage.read_table_range(
        spark, cfg.table_path("transaq_trades"), "transaq_trades"
    )
    out = dashboard.volume_by_interval(
        all_trades, dim, ["SBER", "GAZP"], 5, "2024-12-20 11:00:00", "2024-12-20 11:05:00", "B"
    ).collect()
    assert len(out) == 2  # buckets 11:00 (m∈{0,2,4}) and 11:05 (m∈{6,8})
    assert out[0]["vol"] == sum((250.0 + m) * (5 + m) * 10 for m in (0, 2, 4))
    assert out[1]["vol"] == sum((250.0 + m) * (5 + m) * 10 for m in (6, 8))

    quotes = storage.read_table_range(spark, cfg.table_path("transaq_quotes"), "transaq_quotes")
    assert quotes.count() == 1 and quotes.first()["sell"] == -50

    si = storage.read_table_range(
        spark, cfg.table_path("transaq_securities_info"), "transaq_securities_info"
    )
    r = si.first()
    assert len(si.columns) == 28 and utc_str(r["mat_date"]).startswith("2025-06-15")

    candles = storage.read_table_range(
        spark, cfg.table_path("transaq_candles"), "transaq_candles", final=False
    )
    by_period = {r["period"]: r for r in candles.collect()}
    assert by_period[60]["volume"] == 1000  # history page
    c = by_period[1]  # builder emission
    assert utc_str(c["date"]) == "2024-12-20 11:01:00"
    assert (c["open"], c["close"], c["volume"]) == (250.0, 251.0, 3)


def test_config_from_env(spark):
    env = {"EXPORT_SEC_BOARDS": "TQBR,TQTF", "EXPORT_ALL_TRADES": "SBER,GAZP"}
    cfg = jobs.EngineConfig.from_env("/tmp/x", env=env)
    assert cfg.boards == ("TQBR", "TQTF")
    assert cfg.alltrades_codes == ("SBER", "GAZP")
    assert cfg.export_sec_codes == ()
