"""CLI — run the engine the way the reference is run as a daemon
(``/root/reference/main.go``: one binary, EXPORT_* env config), plus
the query-side front doors a ClickHouse/Grafana user expects:

* ``serve``     — phases 1+3 of the daemon: optional securities
  bootstrap, then one streaming pipeline per event type replaying
  ``--events-dir/<name>/`` into day-partitioned storage.  The
  proprietary gRPC bridge is the one deliberate absence (SURVEY §2
  S1): any adapter that lands JSONL/parquet in the events directory —
  or any streaming DataFrame wired through ``jobs.streaming_job`` —
  takes its place.  EXPORT_SEC_BOARDS / EXPORT_SEC_CODES /
  EXPORT_ALL_TRADES / EXPORT_SEC_INFO_NAMES are read from the
  environment exactly as the reference reads them (main.go:79-120).
* ``query``     — paste ClickHouse SQL (``default.transaq_*`` table
  names work) and print the result; the dialect layer translates.
* ``dashboard`` — run every panel of a Grafana dashboard JSON.

Examples::

    python -m transaq_clickhouse_exporter_spark serve \
        --data-dir /data/tce --events-dir /data/events \
        --checkpoint /data/ckpt --bootstrap /data/securities.jsonl \
        --timeout 60
    python -m transaq_clickhouse_exporter_spark query --data-dir /data/tce \
        --sql "SELECT sec_code, sum(quantity) FROM default.transaq_trades \
               FINAL GROUP BY sec_code ORDER BY 2 DESC LIMIT 5"
"""

from __future__ import annotations

import argparse
import json
import sys

from .jobs import EngineConfig, bootstrap_job, streaming_job
from .session import get_spark
from .tables import TABLES


def _register_tables(spark, data_dir: str) -> dict[str, str]:
    """Register each stored table (dedup-on-read views) and return the
    CH-name → view-name map the dialect layer needs."""
    from . import storage

    tmap: dict[str, str] = {}
    for name in TABLES:
        try:
            df = storage.read_table_range(spark, f"{data_dir}/{name}", name)
        except Exception:
            continue  # table not written yet — queries just won't see it
        df.createOrReplaceTempView(name)
        tmap[f"default.{name}"] = name
    return tmap


def _print_df(df, fmt: str) -> None:
    if fmt == "json":
        for row in df.toJSON().toLocalIterator():
            print(row)
    else:
        df.show(100, truncate=False)


def cmd_serve(args) -> int:
    spark = get_spark(app="tce-serve", tz=args.tz)
    cfg = EngineConfig(data_dir=args.data_dir) if args.no_env else (
        EngineConfig.from_env(args.data_dir)
    )
    if args.bootstrap:
        from . import schemas

        raw = (
            spark.read.parquet(args.bootstrap)
            if args.bootstrap.endswith(".parquet")
            else spark.read.schema(schemas.RAW_SECURITY).json(args.bootstrap)
        )
        subs = bootstrap_job(spark, raw, cfg)
        print(json.dumps({k: len(v) for k, v in subs.items()}), file=sys.stderr)
    import os

    from .jobs import PIPELINES

    live = tuple(
        name for name in PIPELINES
        if os.path.isdir(os.path.join(args.events_dir, name))
    )
    if not live:
        print("no event directories found — nothing to stream", file=sys.stderr)
        return 1
    # the reference's primary write path: CLICKHOUSE_URL set → every
    # batch ALSO appends to ClickHouse over JDBC (main.go:42,
    # etc/*.service); storage stays the engine's own query substrate
    sink_factory = None
    ch_url = os.environ.get("CLICKHOUSE_URL")
    if ch_url and not args.no_env:
        from .jobs import _storage_sink
        from .sources.clickhouse import ClickHouseSink, from_clickhouse_url

        jdbc, user, pw = from_clickhouse_url(ch_url)

        def sink_factory(cfg_, table):
            store = _storage_sink(cfg_, table)
            ch = ClickHouseSink(url=jdbc, table=table, user=user, password=pw)

            def both(df, batch_id):
                store(df, batch_id)
                ch(df, batch_id)

            return both

    queries = streaming_job(
        spark, args.events_dir, args.checkpoint, cfg, pipelines=live,
        sink_factory=sink_factory,
    )
    # r16: optional stream-side trades⋈quotes enrichment — the
    # materialized twin of the dashboard's query-time ASOF join
    # (--enrich-trades or EXPORT_ENRICH_TRADES=1, both event dirs live)
    enrich = args.enrich_trades or (
        not args.no_env
        and os.environ.get("EXPORT_ENRICH_TRADES", "") in ("1", "true"))
    if enrich:
        if {"trades", "quotes"} <= set(live):
            from .jobs import enriched_trades_job

            queries = list(queries) + [enriched_trades_job(
                spark, args.events_dir,
                os.path.join(args.checkpoint, "trades_enriched"), cfg,
                sink_factory=sink_factory,
            )]
        else:
            print("--enrich-trades needs both trades/ and quotes/ "
                  "event directories — skipped", file=sys.stderr)
    try:
        if args.timeout:
            # one SHARED deadline for the whole pipeline set (ADVICE
            # r6: per-query awaits stacked up to N x timeout); each
            # await gets only what remains of the window
            import time

            deadline = time.monotonic() + args.timeout
            for q in queries:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                q.awaitTermination(remaining)
        else:
            for q in queries:
                q.awaitTermination()
    finally:
        for q in queries:
            if q.isActive:
                q.stop()
    return 0


def cmd_query(args) -> int:
    from .queries.ch_compat import run_ch_sql

    spark = get_spark(app="tce-query", tz=args.tz)
    tmap = _register_tables(spark, args.data_dir)
    sql = args.sql if args.sql else sys.stdin.read()
    _print_df(run_ch_sql(spark, sql, table_map=tmap), args.format)
    return 0


def cmd_dashboard(args) -> int:
    from .queries.grafana import run_dashboard

    spark = get_spark(app="tce-dashboard", tz=args.tz)
    tmap = _register_tables(spark, args.data_dir)

    def _coerce(v: str):
        # numeric template vars must render bare (INTERVAL $interval
        # minute); comma lists become IN-list sequences
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v.split(",") if "," in v else v

    params = {
        k: _coerce(v)
        for k, v in (kv.split("=", 1) for kv in (args.param or []))
    }
    for title, df in run_dashboard(spark, args.json, params, tmap).items():
        print(f"== {title}")
        _print_df(df, args.format)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="transaq_clickhouse_exporter_spark")
    p.add_argument("--tz", default="Europe/Moscow", help="session timezone (db.go:23)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="bootstrap + streaming ingest daemon")
    s.add_argument("--data-dir", required=True)
    s.add_argument("--events-dir", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--bootstrap", help="securities directory dump (.jsonl/.parquet)")
    s.add_argument("--timeout", type=int, help="seconds to run (default: forever)")
    s.add_argument("--no-env", action="store_true",
                   help="ignore the EXPORT_* environment surface")
    s.add_argument("--enrich-trades", action="store_true",
                   help="also stream trades ASOF-enriched with the "
                        "latest quote into transaq_trades_enriched "
                        "(or EXPORT_ENRICH_TRADES=1)")
    s.set_defaults(fn=cmd_serve)

    q = sub.add_parser("query", help="run ClickHouse-dialect SQL on the stored tables")
    q.add_argument("--data-dir", required=True)
    q.add_argument("--sql", help="SQL text (default: read stdin)")
    q.add_argument("--format", choices=("table", "json"), default="table")
    q.set_defaults(fn=cmd_query)

    d = sub.add_parser("dashboard", help="run every panel of a Grafana dashboard JSON")
    d.add_argument("--data-dir", required=True)
    d.add_argument("--json", required=True)
    d.add_argument("--param", action="append",
                   help="template variable, repeatable: name=value")
    d.add_argument("--format", choices=("table", "json"), default="table")
    d.set_defaults(fn=cmd_dashboard)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
