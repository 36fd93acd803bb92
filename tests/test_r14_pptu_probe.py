"""Round-14 (VERDICT r13 item 4): session-cached probe for the second
pinned Spark 4.1.2 bug — PushProjectionThroughUnion crashing on a
correlated scalar subquery projected over a UNION child.  The dialect
fuzzer's correlated kinds keep leaf-shaped outer sources on a buggy
build and widen to union-bearing blocks the moment the probe reports
a fixed build — no code change on upgrade (same self-healing pattern
as the InlineCTE probe)."""

from __future__ import annotations

import random
import re

import duckdb

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    _PPTU_MARKER,
    spark_pptu_bug,
)


def test_probe_expected_value_matches_duckdb():
    """The probe's pinned expected rows are the CORRECT answer for its
    statement — DuckDB (no PPTU bug) is ground truth."""
    q = (
        "SELECT g, coalesce(v, 0) AS v FROM (SELECT g, v FROM"
        " (SELECT (SELECT max(u.x) FROM (SELECT 1 AS k, 2 AS x) u"
        " WHERE u.k = t1.g) AS v, g"
        " FROM (SELECT 1 AS g UNION ALL SELECT 2 AS g) AS t1) AS w)"
        " UNION ALL SELECT 9 AS g, 9 AS v")
    got = sorted(duckdb.connect().execute(q).fetchall())
    assert got == [(1, 2), (2, 0), (9, 9)]


def test_probe_detects_bug_on_this_build_and_caches(spark):
    spark.conf.unset(_PPTU_MARKER)
    assert spark_pptu_bug(spark) is True  # Spark 4.1.2 has the bug
    assert spark.conf.get(_PPTU_MARKER) == "buggy"
    # cached path reads the conf, not the probe
    spark.conf.set(_PPTU_MARKER, "clean")
    assert spark_pptu_bug(spark) is False
    spark.conf.set(_PPTU_MARKER, "buggy")
    assert spark_pptu_bug(spark) is True


def test_fuzzer_envelope_gated_on_probe():
    """corr_outer_source: leaf-only while buggy; union-bearing blocks
    allowed when the probe reports clean.  Seed-agnostic (the kinds
    list grows across rounds, shifting RNG draws): scan seeds until a
    set-op source appears in the widened envelope."""
    from tools.dialect_fuzz import Gen

    setop_rx = re.compile(r"\bUNION ALL\b|\bINTERSECT\b|\bEXCEPT\b")
    # buggy build: leaf-shaped for every seed
    for seed in range(60):
        c, d = Gen(random.Random(seed)).corr_outer_source(3)
        assert not setop_rx.search(c), f"leaf gate leaked a set-op (seed {seed})"
    # clean build: the envelope includes set-op outer sources…
    found = None
    for seed in range(400):
        c, d = Gen(random.Random(seed), pptu_clean=True).corr_outer_source(3)
        if setop_rx.search(c):
            found = d
            break
    assert found is not None, "no set-op outer source in 400 widened seeds"
    # …and the DuckDB mirror of the widened source is valid SQL with
    # the (g, v) contract every kind splices into
    rows = duckdb.connect().execute(
        f"SELECT g, v FROM {found} AS probe_src ORDER BY g, v"
    ).fetchall()
    assert rows  # non-empty, two named columns resolve
