"""PySpark-native analytics engine with the query and data-processing
capabilities of ``kmlebedev/transaq-clickhouse-exporter``.

The reference is a Go daemon that streams MOEX market events into five
ClickHouse ``ReplacingMergeTree`` tables and answers 23 Grafana/ClickHouse
SQL queries over them (see SURVEY.md).  This package re-expresses that
whole surface Spark-first:

- ``schemas``    — explicit StructTypes for the five tables + raw events
                   (reference DDL: ``db.go:22-108``).
- ``tables``     — table registry, dedup-on-read (ReplacingMergeTree
                   ``FINAL`` parity), ClickHouse DDL bootstrap strings.
- ``functions``  — scalar/aggregate helpers (``toStartOfInterval``,
                   reference timestamp formats, exact top-k).
- ``operators``  — engine-level relational operators (last-write-wins
                   dedup and friends).
- ``queries``    — the 20 dashboard panel queries + 3 template variables
                   as parameterized DataFrame builders
                   (``etc/grafana-dashboard-trades.json``).
- ``ingest``     — batch bootstrap and Structured Streaming pipelines
                   (``main.go``, ``process.go``), including the stateful
                   OHLCV candle builder (``process.go:126-169``).
- ``sources``    — replay source for tests, ClickHouse JDBC sink wiring.
- ``datapipe``   — large-scale training-data operators (dedup families,
                   similarity search, text analysis, multimodal columns)
                   designed for 100 TB operation.
"""

__version__ = "0.1.0"
