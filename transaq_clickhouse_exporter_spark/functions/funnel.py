"""Generic event-chain funnel — the ClickHouse ``windowFunnel``
aggregate (GDJ dashboards use fixed panels; CH exposes the generic
aggregate) re-expressed as relational composition.

Semantics (earliest-anchor, deterministic): per user,
``t_1 = min(ts | cond_1)``; for i > 1,
``t_i = min(ts | cond_i, ts > t_{i-1}, ts <= t_1 + window)`` —
every later stage must fall inside ``window`` of the FIRST stage and
strictly after the previous one.  ``level`` = the longest prefix
reached.  (ClickHouse's DP scan can find later anchors that reach
deeper; the earliest-anchor rule is the deterministic, SQL-mirrorable
contract — each stage is a pure min-aggregation.  For CH-exact
default-mode semantics — max over ALL anchors, equal timestamps
allowed — use :func:`window_funnel_ch`, which the ``windowFunnel``
SQL bridge in ``queries/ch_compat.py`` mirrors.)

Plan shape (r16): ONE hash aggregation keyed on the user id — per
user, one array of matching timestamps per stage condition
(``collect_list`` with map-side partial merge), then the whole
earliest-anchor recurrence folds as array expressions
(``array_min(filter(...))``) inside the same codegen stage.  The
previous shape (k−1 joins of per-user min-aggregates) re-scanned the
event table k times and — decisive at scale — joined against a
per-user aggregate whose size GROWS with the user population, so the
planner's broadcast became a driver/executor memory wall and the
fallback sort-merge cost k keyed shuffles.  One exchange of the
cond-matching event timestamps replaces all of it; per-user state is
bounded by that user's matching events, the same envelope ClickHouse's
own ``windowFunnel`` state holds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    conds: list[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    window: int = 3600,
) -> DataFrame:
    """Per-user funnel depth: ``(user_col, level int)`` for every user
    that reached stage 1, ``level`` in [1, len(conds)].

    Single-pass: per user one ``collect_list`` of matching timestamps
    per stage (nulls from the unmatched ``when`` are skipped by
    ``collect_list``, mirroring the old per-stage ``filter``), then
    ``t_i = array_min(filter(c_i, t_{i-1} < x <= t_1 + window))`` —
    textually the recurrence from the module docstring.  ``t_{i-1}``
    NULL propagates through the lambda comparison, so a broken prefix
    yields NULL for every deeper stage exactly like the old inner-join
    chain dropping the user.

    Skew envelope (ADVICE r16, documented tradeoff): ONE pathological
    user with millions of stage-matching events concentrates that
    user's whole timestamp array in a single task — the same state
    envelope ClickHouse's ``windowFunnel`` holds per user, but worth
    knowing when a feed has bot-grade hot users; pre-capping events to
    ``[t1, t1 + window]`` per user upstream bounds it."""
    assert len(conds) >= 1
    aggs = [
        F.collect_list(F.when(cond, F.col(ts_col))).alias(f"__c{i}")
        for i, cond in enumerate(conds)
    ]
    g = events.groupBy(user_col).agg(*aggs)
    g = g.withColumn("__t1", F.array_min(F.col("__c0")))

    def _next_stage(arr: Column, prev_t: Column, hi: Column) -> Column:
        return F.array_min(F.filter(arr, lambda x: (x > prev_t) & (x <= hi)))

    prev = "__t1"
    for i in range(1, len(conds)):
        g = g.withColumn(
            f"__t{i + 1}",
            _next_stage(
                F.col(f"__c{i}"), F.col(prev), F.col("__t1") + F.lit(window)
            ),
        )
        prev = f"__t{i + 1}"
    level = reduce(
        lambda acc, i: F.when(F.col(f"__t{i}").isNotNull(), F.lit(i)).otherwise(acc),
        range(2, len(conds) + 1),
        F.lit(1),
    )
    return (
        g.filter(F.col("__t1").isNotNull())
        .select(F.col(user_col), level.cast("int").alias("level"))
    )


def window_funnel_ch(
    events: DataFrame,
    conds: list[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    window: int = 3600,
) -> DataFrame:
    """ClickHouse ``windowFunnel`` DEFAULT-MODE exact semantics
    (AggregateFunctionWindowFunnel.h): the level is the deepest stage
    reachable over ALL cond₁ anchors — not just the earliest —, equal
    timestamps are allowed between consecutive stages, and one event
    may fill consecutive stages.  :func:`window_funnel` keeps the
    stricter earliest-anchor contract as a separately documented
    operator.

    Derivation (anchor dominance): in default mode the only state a
    level-``i`` chain carries forward is its ANCHOR timestamp (the
    stage-``i+1`` check is ``ts <= anchor + window``; the previous
    stage's own timestamp never appears), and anchors propagate
    monotonically, so the chain with the LATEST viable anchor dominates
    every other — exactly CH's single events_timestamp[] slot per
    level.  That makes the whole aggregate a chain of per-user RUNNING
    MAXES: A₁(t) = max{c₁ ts ≤ t}; stage i is viable at an event iff
    ``ts <= A_{i-1}(ts) + window``; A_i = running max of the viable
    anchors.  Equal-timestamp ties: all events at the same timestamp
    are mutually visible (RANGE frame) — deterministic, inside CH's
    own insertion-order tie envelope.

    Plan shape: the k−1 RANGE running-max windows share ONE per-user
    sort (a single Exchange+Sort feeding chained Window operators),
    then one hash aggregation — no joins, no repeated shuffles, no
    per-anchor expansion: at 100 TB this is one shuffle of the
    (pruned) event rows regardless of how many cond₁ anchors exist."""
    assert len(conds) >= 1
    w = (
        Window.partitionBy(user_col)
        .orderBy("__t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.withColumn("__t", F.col(ts_col).cast("double"))
    df = df.withColumn("__a", F.max(F.when(conds[0], F.col("__t"))).over(w))
    stage_aggs = [F.max(F.when(conds[0], F.lit(1)))]
    for i, cond in enumerate(conds[1:], start=2):
        v = f"__v{i}"
        df = df.withColumn(
            v,
            cond
            & F.col("__a").isNotNull()
            & (F.col("__t") <= F.col("__a") + F.lit(float(window))),
        )
        stage_aggs.append(F.max(F.when(F.col(v), F.lit(i))))
        if i < len(conds):  # anchor for the next stage's viability check
            df = df.withColumn(
                "__a", F.max(F.when(F.col(v), F.col("__a"))).over(w)
            )
    # CH returns level 0 for a user whose events never match cond₁ —
    # keep those rows (coalesce, not filter) so this operator and its
    # SQL twin (the windowFunnel fold in ch_compat) agree on zero-level
    # users exactly as ClickHouse does (ADVICE r7)
    level = (
        F.greatest(*stage_aggs) if len(stage_aggs) > 1 else stage_aggs[0]
    )
    return df.groupBy(user_col).agg(
        F.coalesce(level, F.lit(0)).cast("int").alias("level")
    )


def funnel_level_counts(
    events: DataFrame,
    conds: list[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    window: int = 3600,
) -> DataFrame:
    """Funnel report: users per reached depth, ``(level, n_users)``."""
    lv = window_funnel(events, conds, ts_col, user_col, window)
    return lv.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


def retention_flags(
    events: DataFrame,
    conds: list[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(cond1…condN)`` parity: per user, one
    held-on-ANY-row flag per condition (CH's bitmask aggregate state),
    paired so ``r1 = flag_1`` and ``r_i = flag_1 AND flag_i`` — the CH
    docs' rule.  Output ``(user_col, r1 … rN int)``, one row per user
    (CH emits the array; scalar columns here so every downstream
    compare/hashing path stays engine-portable).

    Plan shape: ONE hash aggregation with map-side partial ``max`` per
    condition — no join, no window; at 100 TB this is a single narrow
    shuffle of (user, N small ints).
    """
    if not conds:
        raise ValueError("retention needs at least one condition")
    flags = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__f{i}")
        for i, c in enumerate(conds)
    ]
    agg = events.groupBy(user_col).agg(*flags)
    cols = [F.col(user_col), F.col("__f0").cast("int").alias("r1")]
    cols += [
        (F.col("__f0") * F.col(f"__f{i}")).cast("int").alias(f"r{i + 1}")
        for i in range(1, len(conds))
    ]
    return agg.select(*cols)
