"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the oracle-paired catalog from
``transaq_clickhouse_exporter_spark.queries.parity`` — the dashboard
panel queries of the reference (re-expressed over deterministically
derived transaq-shaped views of the driver tables), the engine operators,
and the data-pipeline operators.  ``oracle_sql()`` returns the matching
DuckDB SQL with the same derivation as a CTE prefix.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-anchor: keep the package importable even when this module is
# loaded by file path from a foreign working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): «Volume trades by interval»
    (GDJ:1069) — scan → broadcast dim join → time bucket → agg → sort —
    on /root/testdata/sf0.001."""
    return parity.run(spark, "/root/testdata/sf0.001", "db01_volume_by_interval_buy")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def make(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return parity.run(spark, sf_dir, name)

        q.__name__ = f"query_{name}"
        return q

    return {name: make(name) for name in parity.catalog()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (same column aliases)."""
    return parity.oracle_map()
