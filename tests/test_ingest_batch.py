"""Bootstrap-path filters (O-1..O-4) against hand-computed expectations
from the reference logic at main.go:126-176."""

from __future__ import annotations

import pytest

from transaq_clickhouse_exporter_spark import schemas
from transaq_clickhouse_exporter_spark.ingest import batch


@pytest.fixture(scope="module")
def raw_securities(spark):
    cols = [f.name for f in schemas.RAW_SECURITY.fields]
    rows = [
        # secid seccode instrclass board market shortname decimals minstep lotsize point_cost sectype quotestype active
        (1, "SBER", "E", "TQBR", 1, "Сбербанк", 2, 0.01, 10, 1.0, "SHARE", 1, "true"),
        (2, "GAZP", "E", "TQBR", 1, "Газпром", 2, 0.01, 10, 1.0, "SHARE", 1, "true"),
        (0, "BAD0", "E", "TQBR", 1, "ZeroId", 2, 0.01, 1, 1.0, "SHARE", 1, "true"),  # secid=0
        (3, "DEAD", "E", "TQBR", 1, "Inactive", 2, 0.01, 1, 1.0, "SHARE", 1, "false"),  # inactive
        (4, "WAYTOOLONGSECCODE9999", "E", "TQBR", 1, "Long", 2, 0.01, 1, 1.0, "SHARE", 1, "true"),  # >16
        (5, "OFF1", "E", "SPBFUT", 7, "OffBoard", 2, 0.01, 1, 1.0, "FUT", 0, "true"),  # board not exported
        (6, "RU000A0JX0J2", "B", "TQCB", 1, "Система МТС", 0, 0.01, 1, 1.0, "BOND", 0, "true"),  # bond, МТС suffix
        (7, "SiH5", "F", "FUT", 4, "Si-3.25", 0, 1.0, 1, 1.0, "FUT", 0, "true"),
        (8, "SBERP", "E", "TQBR", 1, "Сбербанк-п", 2, 0.01, 10, 1.0, "SHARE", 1, "true"),
    ]
    return spark.createDataFrame(rows, schema=schemas.RAW_SECURITY)


def test_valid_securities_filter_and_projection(raw_securities):
    out = batch.valid_securities(raw_securities)
    # validity gate (main.go:141-143) keeps 1,2,5,6,7,8
    assert sorted(r.secid for r in out.collect()) == [1, 2, 5, 6, 7, 8]
    assert [f.name for f in out.schema.fields] == [f.name for f in schemas.SECURITIES.fields]
    assert "active" not in out.columns  # input-only column


def test_quotation_subscription_code_match(raw_securities):
    # equality, contains, shortname-equality, ALL (main.go:166-175)
    ids = lambda df: sorted(r.secid for r in df.collect())
    assert ids(batch.quotation_subscription(raw_securities, export_sec_codes=["SBER"])) == [1, 8]  # SBER + contains(SBERP)
    assert ids(batch.quotation_subscription(raw_securities, export_sec_codes=["Газпром"])) == [2]  # shortname equality
    assert ids(batch.quotation_subscription(raw_securities, export_sec_codes=["ALL"])) == [1, 2, 6, 7, 8]  # valid ∩ boards
    assert ids(batch.quotation_subscription(raw_securities, export_sec_codes=[])) == []  # empty ⇒ none (main.go:162)


def test_alltrades_subscription_pre_validity(raw_securities):
    # checked BEFORE validity: inactive DEAD on TQBR still matches
    out = batch.alltrades_subscription(raw_securities, alltrades_codes=["DEAD", "SBER", "OFF1"])
    assert sorted(r.secid for r in out.collect()) == [1, 3]  # OFF1's board not exported


def test_sec_info_subscription_bond_suffix(raw_securities):
    out = batch.sec_info_subscription(raw_securities, info_names=["МТС"])
    assert [r.secid for r in out.collect()] == [6]
    assert batch.sec_info_subscription(raw_securities, info_names=[]).count() == 0


def test_backfill_paging_handshake():
    # S8: stop when a page returns fewer rows than requested (main.go:204-213)
    data = list(range(23))
    calls = []

    def fetch(offset, n):
        calls.append(offset)
        return data[offset : offset + n]

    out = batch.backfill_candles(fetch, page_size=10)
    assert out == data
    assert calls == [0, 10, 20]


def test_filter_candle_kinds():
    kinds = [{"id": 1, "period": 60}, {"id": 2, "period": 300}, {"id": 3, "period": 3600}]
    assert batch.filter_candle_kinds(kinds, []) == kinds  # empty ⇒ all (main.go:178)
    assert [k["id"] for k in batch.filter_candle_kinds(kinds, ["60", "3600"])] == [1, 3]
    assert batch.filter_candle_kinds(kinds, ["999"]) == []


def test_lotsize_uint8_range_passes_through_widened(spark):
    """SURVEY §1.3 / VERDICT r7 item 6: the reference declares
    ``lotsize UInt8`` (db.go:43) — ClickHouse would WRAP an
    out-of-range value mod 256 (300 → 44).  This engine's documented
    type policy (schemas.py: UInt8 → IntegerType, 'fits with
    headroom') PASSES the value THROUGH unchanged: no wrap, no clamp,
    no NULL.  Pinned so the choice stays deliberate."""
    cols = [f.name for f in schemas.RAW_SECURITY.fields]
    rows = [
        (21, "BIGL", "E", "TQBR", 1, "BigLot", 2, 0.01, 300, 1.0, "SHARE", 1, "true"),
        (22, "EDGE", "E", "TQBR", 1, "Edge", 2, 0.01, 255, 1.0, "SHARE", 1, "true"),
        (23, "NULL0", "E", "TQBR", 1, "NoLot", 2, 0.01, None, 1.0, "SHARE", 1, "true"),
    ]
    out = batch.valid_securities(
        spark.createDataFrame(rows, schema=schemas.RAW_SECURITY)
    )
    got = {r.secid: r.lotsize for r in out.collect()}
    assert got == {21: 300, 22: 255, 23: None}
    [f] = [f for f in out.schema.fields if f.name == "lotsize"]
    assert f.dataType.simpleString() == "int"
