"""Signed-volume helpers — the dashboard's ``if(buy_sell == 'S', -1, 1)``
pattern (``etc/grafana-dashboard-trades.json:113,643``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def signed(buy_sell: Column | str) -> Column:
    """+1 for buys, -1 for sells."""
    c = F.col(buy_sell) if isinstance(buy_sell, str) else buy_sell
    return F.when(c == "S", F.lit(-1)).otherwise(F.lit(1))


def signed_volume(buy_sell: Column | str, volume: Column) -> Column:
    return signed(buy_sell) * volume
