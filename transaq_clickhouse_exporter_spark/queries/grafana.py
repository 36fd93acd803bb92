"""Run a Grafana dashboard's ClickHouse panels on the Spark engine.

The reference ships its entire query surface as one Grafana dashboard
JSON (``etc/grafana-dashboard-trades.json``: 20 ``rawSql`` panels +
3 template variables).  A reference user migrating here points this
module at that same file: every panel's CH SQL runs verbatim through
the dialect layer (:mod:`.ch_compat`) against the engine's views —
the drop-in path that needs no query rewriting at all.

``extract_panels`` is pure JSON walking (works on any Grafana
dashboard using a SQL datasource's ``rawSql``); ``run_dashboard``
substitutes the template variables and returns lazy DataFrames, so
rendering N panels stays N independent Catalyst plans — share the
session and the dedup-on-read views across them.
"""

from __future__ import annotations

import json
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from .ch_compat import run_ch_sql


def extract_panels(dashboard_json_path: str) -> dict[str, str]:
    """``{panel title (deduped): rawSql}`` for every SQL panel."""
    with open(dashboard_json_path) as f:
        doc = json.load(f)
    out: dict[str, str] = {}

    def walk(node, title):
        if isinstance(node, dict):
            title = node.get("title", title) or title
            if "rawSql" in node:
                key, i = title or "panel", 2
                while key in out:
                    key, i = f"{title} ({i})", i + 1
                out[key] = node["rawSql"]
            for v in node.values():
                walk(v, title)
        elif isinstance(node, list):
            for v in node:
                walk(v, title)

    walk(doc, "")
    return out


def run_dashboard(
    spark: SparkSession,
    dashboard_json_path: str,
    params: Mapping[str, object],
    table_map: Mapping[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Translate + plan every panel; returns ``{title: DataFrame}``
    (lazy — nothing executes until a panel is collected/displayed).

    ``params``: the dashboard's template variables plus Grafana's
    built-in ``__fromTime``/``__toTime`` range.  ``table_map``: CH
    table names → engine view names (e.g. ``{"default.transaq_trades":
    "trades"}``)."""
    return {
        title: run_ch_sql(spark, sql, params, table_map)
        for title, sql in extract_panels(dashboard_json_path).items()
    }
