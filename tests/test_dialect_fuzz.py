"""Generative differential fuzz vs DuckDB (r12f): random compositions
of bridged constructs — nested subqueries, UNION branches, CTEs,
PREWHERE/SETTINGS/LIMIT BY/WITH TOTALS/ARRAY JOIN tails, quantified
subquery comparisons — mirrored into DuckDB-native SQL and
value-compared.  Seeded: a failure reproduces with
``python tools/dialect_fuzz.py <n> <seed>``."""

from __future__ import annotations

from tools.dialect_fuzz import run_fuzz


def test_fuzz_batch_seed_12(spark):
    assert run_fuzz(60, 12, spark) == []


def test_fuzz_batch_seed_777(spark):
    assert run_fuzz(60, 777, spark) == []


def test_with_totals_empty_input_contract(spark):
    """The documented empty-input deviation the first fuzz run
    surfaced: WITH TOTALS over an empty input emits NO rows at all
    (Spark grouping-sets semantics) where CH renders a totals block
    of aggregate defaults — pinned so a future bridge change is a
    conscious decision, and module-docstring-documented."""
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        run_ch_sql)

    rows = run_ch_sql(
        spark,
        "SELECT g, sum(v) AS sv FROM (SELECT number % 2 AS g,"
        " number AS v FROM numbers(4)) WHERE v > 99"
        " GROUP BY g WITH TOTALS").collect()
    assert rows == []
    # non-empty input: groups + exactly one NULL-key totals row
    rows = run_ch_sql(
        spark,
        "SELECT g, sum(v) AS sv FROM (SELECT number % 2 AS g,"
        " number AS v FROM numbers(4)) GROUP BY g WITH TOTALS"
        ).collect()
    assert sorted([(r.g, r.sv) for r in rows], key=repr) == sorted(
        [(0, 2), (1, 4), (None, 6)], key=repr)


def test_fuzz_batch_seed_5150(spark):
    """Third pinned batch, added with the r12h vocabulary growth
    (windowed / joined / IN-subquery / array-HOF wraps / DISTINCT
    set ops / CTE-sided ASOF LEFT JOIN mirrored to DuckDB's native
    ASOF) so the new kinds hold a standing seed of their own."""
    assert run_fuzz(60, 5150, spark) == []


def test_fuzz_batch_seed_1301(spark):
    """r13 vocabulary batch (VERDICT r12 item 2): quantified under
    CASE arms and set-op branches, CORRELATED quantifiers, parallel
    ASOF legs sharing a CTE side, WITH FILL over a UNION body.  Seed
    1301's first run caught two real bridge bugs (pinned in
    tests/test_r13_fuzz_finds.py): the alias-in-WHERE inliner
    descending into subqueries, and the ASOF qualifier strip
    reaching sibling branches."""
    assert run_fuzz(60, 1301, spark) == []


def test_fuzz_batch_seed_1307(spark):
    """Second standing r13-vocabulary seed."""
    assert run_fuzz(60, 1307, spark) == []


def test_fuzz_batch_seed_2401(spark):
    """r13 second-wave vocabulary: WITH TIES pagination (incl. nested
    blocks — its first run caught the top-level-only raise), ternary
    inside QUALIFY, CORRELATED quantifiers in CASE arms, WITH FILL …
    INTERPOLATE (LOCF) finals."""
    assert run_fuzz(60, 2401, spark) == []


def test_fuzz_batch_seed_3501(spark):
    """r13 chained-ASOF vocabulary: the asof kind gained a `chain`
    form (link 2's left side is link 1's result, DuckDB parses the
    same text left-associatively)."""
    assert run_fuzz(60, 3501, spark) == []


def test_fuzz_batch_seed_6001(spark):
    """r13 third-wave vocabulary: GROUP BY … WITH ROLLUP pass-through
    and lagInFrame/leadInFrame full-frame windows."""
    assert run_fuzz(60, 6001, spark) == []


def test_fuzz_batch_seed_6101(spark):
    """r14 vocabulary: sequenceNextNode (head/first_match over
    DISTINCT-deduped sources, mirrored to a row_number + offset-join
    DuckDB formulation)."""
    assert run_fuzz(60, 6101, spark) == []


def test_fuzz_batch_seed_7101(spark):
    """r14 second-wave vocabulary (VERDICT r13 item 2): chained ASOF
    as a direct set-op branch / with a CTE-head left side, WITH TIES
    inside parenthesized set-op branches, correlated quantifiers
    inside QUALIFY, and ARRAY JOIN x ASOF in one statement."""
    assert run_fuzz(60, 7101, spark) == []


def test_rollup_empty_input_contract(spark):
    """r14 fuzz seed 7106/1: the empty-input grouping-sets deviation
    extends to native ROLLUP pass-through — Spark emits NO rows over
    an empty input (no grand-total row) where ClickHouse and DuckDB
    emit one.  Pinned like the r12f TOTALS twin so an engine change
    is a conscious decision."""
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        run_ch_sql)

    rows = run_ch_sql(
        spark,
        "SELECT coalesce(g, -1) AS g, sum(v) AS sv FROM"
        " (SELECT number % 2 AS g, number AS v FROM numbers(4))"
        " WHERE v > 99 GROUP BY g WITH ROLLUP").collect()
    assert rows == []
    rows = run_ch_sql(
        spark,
        "SELECT coalesce(g, -1) AS g, sum(v) AS sv FROM"
        " (SELECT number % 2 AS g, number AS v FROM numbers(4))"
        " GROUP BY g WITH ROLLUP").collect()
    assert sorted([(r.g, r.sv) for r in rows]) == [(-1, 6), (0, 2), (1, 4)]


def test_fuzz_batch_seed_8301(spark):
    """r14 third-wave vocabulary: the ema kind (sorted-fold EMA vs a
    DuckDB list_reduce mirror, bit-exact integer exponents) and the
    max_intersections kind's two variants (bare-call -> the window
    sweep; packed arithmetic -> the fold)."""
    assert run_fuzz(60, 8301, spark) == []


def test_fuzz_batch_seed_151510_focused(spark):
    """r15 composition kinds hold a standing FOCUSED seed of their
    own: sequenceNextNode over ASOF / shared-CTE sources,
    maxIntersections under set ops and HAVING (the inverted
    combinator guard), WITH FILL x QUALIFY, WITH-scope shadowing.
    Seed 151510 is the one whose first run caught the zip-ARRAY-JOIN
    nested-alias find (index 144, pinned in test_r15_fuzz_finds)."""
    focus = ["snn_over_asof", "snn_shared_cte", "maxint_setop",
             "maxint_having", "with_scope_shadow", "fill_qualify"]
    assert run_fuzz(40, 151510, spark, focus=focus) == []


def test_fuzz_batch_seed_91601_focused(spark):
    """r16 kinds hold a standing FOCUSED seed: time-guarded
    sequenceMatch/sequenceCount vs independent DuckDB mirrors (2-way
    EXISTS join / recursive-CTE greedy scan), the guarded aggregate
    over a shared CTE, mixed-comparator ASOF chains (asof_multi fast
    path vs per-link fallback vs DuckDB native ASOF), and
    maxIntersections known-scalar guard-path equivalence."""
    focus = ["seq_time", "seq_time_match", "seq_time_cte",
             "asof_multi_mixed", "maxint_guard_paths"]
    assert run_fuzz(40, 91601, spark, focus=focus) == []


def test_fuzz_batch_seed_771002_focused(spark):
    """r17 kinds hold a standing FOCUSED seed: ASOF right-side
    pure-dedup accept/decline paths over the shared duplicate-bearing
    fz_dup table (`_asof_right_sans_distinct`), ANY-LEFT-JOIN eager
    aggregation accept/decline paths (`_defer_any_left_join` — bare vs
    aliased fact, HAVING), and maxIntersections parallel-vs-flat
    equivalence under hostile group keys (expression keys, qualified
    keys, __mi_-prefixed output names)."""
    focus = ["asof_right_dedup", "maxint_parallel_keys",
             "anyjoin_defer"]
    assert run_fuzz(40, 771002, spark, focus=focus) == []
