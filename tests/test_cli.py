"""The __main__ CLI — the reference's daemon UX (serve) plus the
ClickHouse-user front doors (query / dashboard) driven end to end
through ``main(argv)``: bootstrap from a securities dump, stream a
trades fixture into storage, then answer CH-dialect SQL over it."""

from __future__ import annotations

import json

from transaq_clickhouse_exporter_spark.__main__ import main
from transaq_clickhouse_exporter_spark.sources.replay import write_jsonl_fixture


def _securities_dump(path):
    rows = [
        {"secid": 1, "seccode": "SBER", "instrclass": "E", "board": "TQBR",
         "market": 1, "shortname": "Сбербанк", "decimals": 2, "minstep": 0.01,
         "lotsize": 10, "point_cost": 1.0, "sectype": "SHARE", "quotestype": 1,
         "active": "true"},
        {"secid": 2, "seccode": "GAZP", "instrclass": "E", "board": "TQBR",
         "market": 1, "shortname": "Газпром", "decimals": 2, "minstep": 0.01,
         "lotsize": 10, "point_cost": 1.0, "sectype": "SHARE", "quotestype": 1,
         "active": "true"},
    ]
    write_jsonl_fixture(path, rows, mtime=900)


def _trades_fixture(path):
    rows = [
        {"time": f"20.12.2024 11:{m:02d}:00", "secid": 1 + (m % 2),
         "sec_code": ["SBER", "GAZP"][m % 2], "trade_no": 100 + m,
         "board": "TQBR", "price": 250.0 + m, "quantity": 5 + m,
         "buy_sell": "BS"[m % 2], "open_interest": 0, "period": "N"}
        for m in range(10)
    ]
    write_jsonl_fixture(path, rows, mtime=1000)


def test_cli_serve_then_query(spark, tmp_path, capsys):
    data = str(tmp_path / "data")
    _securities_dump(str(tmp_path / "sec.jsonl"))
    _trades_fixture(str(tmp_path / "events" / "trades" / "t0.json"))

    rc = main([
        "--tz", "UTC", "serve", "--data-dir", data,
        "--events-dir", str(tmp_path / "events"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--bootstrap", str(tmp_path / "sec.jsonl"),
        "--timeout", "120", "--no-env",
    ])
    assert rc == 0
    capsys.readouterr()  # drop the serve-side subscription summary

    rc = main([
        "--tz", "UTC", "query", "--data-dir", data, "--format", "json",
        "--sql", "SELECT sec_code, sumIf(quantity, buy_sell = 'B') AS bought, "
                 "count(*) AS n FROM default.transaq_trades FINAL "
                 "GROUP BY sec_code ORDER BY sec_code",
    ])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    by_code = {r["sec_code"]: r for r in rows}
    # B trades are even m → SBER (secid 1): quantities 5,7,9,11,13
    assert by_code["SBER"]["bought"] == 5 + 7 + 9 + 11 + 13
    assert by_code["SBER"]["n"] == 5 and by_code["GAZP"]["n"] == 5
    assert by_code["GAZP"]["bought"] == 0

    # the securities dimension also landed and joins through CH SQL
    rc = main([
        "--tz", "UTC", "query", "--data-dir", data, "--format", "json",
        "--sql", "SELECT t.sec_code, anyLast(s.lotsize) AS lot "
                 "FROM default.transaq_trades t "
                 "JOIN default.transaq_securities s ON t.secid = s.secid "
                 "GROUP BY t.sec_code ORDER BY t.sec_code",
    ])
    assert rc == 0
    lots = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert [(r["sec_code"], r["lot"]) for r in lots] == [("GAZP", 10), ("SBER", 10)]


def test_cli_dashboard_runs_reference_json(spark, tmp_path, capsys):
    """dashboard subcommand over the reference's own JSON with string
    --param values (numerics must coerce bare for INTERVAL $interval)."""
    import os

    if not os.path.exists("/root/reference/etc/grafana-dashboard-trades.json"):
        import pytest

        pytest.skip("reference dashboard unavailable")
    data = str(tmp_path / "data")
    _securities_dump(str(tmp_path / "sec.jsonl"))
    _trades_fixture(str(tmp_path / "events" / "trades" / "t0.json"))
    assert main([
        "--tz", "UTC", "serve", "--data-dir", data,
        "--events-dir", str(tmp_path / "events"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--bootstrap", str(tmp_path / "sec.jsonl"),
        "--timeout", "120", "--no-env",
    ]) == 0
    capsys.readouterr()
    rc = main([
        "--tz", "UTC", "dashboard", "--data-dir", data,
        "--json", "/root/reference/etc/grafana-dashboard-trades.json",
        "--param", "interval=5",
        "--param", "sec_code=SBER,GAZP",
        "--param", "sec_code_etf=NONE1,NONE2",
        "--param", "__fromTime=2024-12-20 00:00:00",
        "--param", "__toTime=2024-12-21 00:00:00",
        "--format", "json",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("== ") == 20          # every panel rendered
