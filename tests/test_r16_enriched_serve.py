"""serve --enrich-trades E2E (r16 — VERDICT r15 item 4): the daemon
streams trades AND quotes, and the optional enrichment pipeline lands
each trade in ``transaq_trades_enriched`` already carrying the latest
quote per (sec_code, board) at-or-before the trade — the materialized
twin of the reference dashboard's query-time trades⋈quotes join."""

from __future__ import annotations

import json

from transaq_clickhouse_exporter_spark.__main__ import main
from transaq_clickhouse_exporter_spark.sources.replay import (
    write_jsonl_fixture,
)


def _trades_fixture(path):
    rows = [
        {"time": f"20.12.2024 11:{m:02d}:00", "secid": 1 + (m % 2),
         "sec_code": ["SBER", "GAZP"][m % 2], "trade_no": 100 + m,
         "board": "TQBR", "price": 250.0 + m, "quantity": 5 + m,
         "buy_sell": "BS"[m % 2], "open_interest": 0, "period": "N"}
        for m in range(10)
    ]
    write_jsonl_fixture(path, rows, mtime=1000)


def _quotes_fixture(path):
    rows = [
        {"batch_time": "20.12.2024 11:00:30", "secid": 1,
         "board": "TQBR", "sec_code": "SBER", "price": 249.5,
         "source": "", "yield": 0, "buy": 10, "sell": 12},
        {"batch_time": "20.12.2024 11:05:30", "secid": 1,
         "board": "TQBR", "sec_code": "SBER", "price": 260.5,
         "source": "", "yield": 0, "buy": 11, "sell": 13},
        {"batch_time": "20.12.2024 11:02:30", "secid": 2,
         "board": "TQBR", "sec_code": "GAZP", "price": 150.0,
         "source": "", "yield": 0, "buy": 5, "sell": 6},
    ]
    write_jsonl_fixture(path, rows, mtime=1000)


def test_serve_enrich_trades_e2e(spark, tmp_path, capsys):
    data = str(tmp_path / "data")
    _trades_fixture(str(tmp_path / "events" / "trades" / "t0.json"))
    _quotes_fixture(str(tmp_path / "events" / "quotes" / "q0.json"))

    rc = main([
        "--tz", "UTC", "serve", "--data-dir", data,
        "--events-dir", str(tmp_path / "events"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--timeout", "180", "--no-env", "--enrich-trades",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = main([
        "--tz", "UTC", "query", "--data-dir", data, "--format", "json",
        "--sql",
        "SELECT sec_code, trade_no, price, quote_price, quote_buy "
        "FROM default.transaq_trades_enriched FINAL "
        "ORDER BY trade_no",
    ])
    assert rc == 0
    rows = [json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")]
    assert len(rows) == 10
    got = {r["trade_no"]: (r.get("quote_price"), r.get("quote_buy"))
           for r in rows}
    # SBER trades (even minutes 0..8): 11:00 precedes the 11:00:30
    # quote -> NULL; 11:02/11:04 -> 249.5; 11:06/11:08 -> 260.5
    assert got[100] == (None, None)
    assert got[102] == (249.5, 10) and got[104] == (249.5, 10)
    assert got[106] == (260.5, 11) and got[108] == (260.5, 11)
    # GAZP trades (odd minutes): 11:01 precedes the 11:02:30 quote
    assert got[101] == (None, None)
    for tn in (103, 105, 107, 109):
        assert got[tn] == (150.0, 5)

    # the plain trades table was written by the same serve run — the
    # enrichment pipeline is ADDITIVE, not a replacement
    capsys.readouterr()
    rc = main([
        "--tz", "UTC", "query", "--data-dir", data, "--format", "json",
        "--sql", "SELECT count(*) AS n FROM default.transaq_trades FINAL",
    ])
    assert rc == 0
    n = [json.loads(line)
         for line in capsys.readouterr().out.strip().splitlines()
         if line.startswith("{")]
    assert n[0]["n"] == 10
