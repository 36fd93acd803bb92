#!/usr/bin/env python3
"""Round-12 continuation rehearsal: the ASOF bridge's NEW side
resolutions (r12h/r12i) at 10M rows.

Structural claims under test (SCALE.md):

* **Named-view sides (the pre-existing path) are untouched** — same
  union + one keyed window plan, no lineage truncation.
* **Subquery sides keep full Catalyst lineage**: a parenthesized side
  whose plan carries no CTE defs is NOT checkpointed — the physical
  plan scans Range directly (no ExistingRDD), so column pruning and
  the single keyed exchange survive exactly as in the named path.
* **Def-bearing CTE sides pay one bounded materialization**: a side
  whose recursive evaluation embeds WithCTE (an entry chained onto a
  previous entry) truncates to a LogicalRDD via LAZY localCheckpoint
  (the r12j InlineCTE insulation).  The cost is one extra
  materialization of the SIDE (what ClickHouse itself does with a
  join's right table); the join above it is unchanged.  At cluster
  scale the guidance stands: hot keyed ASOF paths should name their
  sides (views/tables) — the dialect's CTE/subquery acceptance is a
  correctness surface, not the bulk path.

Run: python tools/scale_rehearsal_r12_asof_sides.py   (local[32], ~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries.ch_compat import (  # noqa: E402
    run_ch_sql,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N_LEFT = 10_000_000
N_RIGHT = 1_000_000
G = 100_000

LEFT = (f"(SELECT number % {G} AS g, number AS ts"
        f" FROM numbers({N_LEFT}))")
RIGHT_BODY = (f"SELECT number % {G} AS g,"
              f" number * 7 % {N_LEFT} AS rts FROM numbers({N_RIGHT})")


def timed(label: str, sql: str, spark) -> None:
    df = run_ch_sql(spark, sql)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_rdd = "ExistingRDD" in plan or "LogicalRDD" in plan
    df.collect()  # warm
    t0 = time.perf_counter()
    rows = run_ch_sql(spark, sql).collect()
    dt = time.perf_counter() - t0
    print(f"{label:46} {dt:7.2f} s   side-materialized={has_rdd}"
          f"   s={rows[0][0]}", flush=True)


def main() -> None:
    spark = get_spark(app="rehearse-r12-asof-sides")
    spark.sparkContext.setLogLevel("ERROR")

    head = ("SELECT CAST(sum(rts) AS BIGINT) AS s, count() AS c FROM"
            " (SELECT l.g AS g, ts, rts FROM ")
    on = " ON l.g = r.g AND l.ts >= r.rts)"

    # 1) named-view sides (baseline, unchanged path)
    spark.sql(f"CREATE OR REPLACE TEMP VIEW __ar_l AS"
              f" SELECT id % {G} AS g, id AS ts FROM range({N_LEFT})")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW __ar_r AS"
              f" SELECT id % {G} AS g, id * 7 % {N_LEFT} AS rts"
              f" FROM range({N_RIGHT})")
    timed("named-view sides (baseline)",
          head + "__ar_l AS l ASOF LEFT JOIN __ar_r AS r" + on, spark)

    # 2) subquery sides: full lineage, no materialization expected
    timed("subquery sides (full lineage)",
          head + f"{LEFT} AS l ASOF LEFT JOIN ({RIGHT_BODY}) AS r" + on,
          spark)

    # 3) def-bearing CTE side: chained entry -> recursive eval embeds
    #    WithCTE -> lazy localCheckpoint (materialized once)
    cte_sql = (f"WITH base AS (SELECT number AS x FROM"
               f" numbers({N_RIGHT})), r AS (SELECT x % {G} AS g,"
               f" x * 7 % {N_LEFT} AS rts FROM base) "
               + head + f"{LEFT} AS l ASOF LEFT JOIN r" + on)
    timed("chained-CTE side (checkpointed)", cte_sql, spark)

    spark.stop()


if __name__ == "__main__":
    main()
