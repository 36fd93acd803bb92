"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: ``region nation customer supplier part orders lineitem events
documents embeddings`` — one parquet each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

``events.parquet``'s ``ts`` column has shipped in two generations of
the driver testdata: parquet ``TIMESTAMP(NANOS)`` (arrives as LongType
nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong=true``) and
``timestamp[us]`` (arrives as TIMESTAMP_NTZ).  :func:`load_table`
detects which one it got and exposes the same extra exact
epoch-seconds column ``ts_s`` either way — integer division / floor,
no double rounding — matching DuckDB's ``epoch_us(ts) // 1000000``.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure_session

#: Registration mutates session catalog state; serialize it in case a
#: harness issues catalog queries from multiple threads.
REGISTRY_LOCK = threading.Lock()

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Exact epoch-seconds regardless of which generation of the
        # testdata we got: LongType nanos (nanosAsLong) or a
        # TIMESTAMP/_NTZ column.  `DIV` / `unix_micros` are integer —
        # bit-exact, unlike a double-precision `/` at 1e18 magnitudes.
        # The NTZ→TIMESTAMP cast resolves in the session time zone,
        # which configure_session pins to UTC before any load.
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts_s", F.expr("ts DIV 1000000000"))
        else:
            df = df.withColumn(
                "ts_s",
                F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Pin session confs and register every driver table as a temp view
    under its own name.  Idempotent per (session, sf_dir): repeated
    calls (the driver runs the catalog one query at a time) keep the
    existing views — and therefore any caches built on them — intact."""
    configure_session(spark, tz="UTC")
    marker = "spark.tce.registered_sf_dir"
    with REGISTRY_LOCK:
        try:
            if spark.conf.get(marker) == sf_dir:
                return
        except Exception:
            pass
        for name in DRIVER_TABLES:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        spark.conf.set(marker, sf_dir)
