"""Time-guarded sequenceMatch/sequenceCount (r16 — VERDICT r15 item 2).

Three independent checks on the greedy chain fold:

* crafted-case semantics per guard operator and separator kind;
* a transparent pure-Python greedy reference (earliest-completion
  scan, written against the documented contract, not the fold code)
  over randomized events and patterns;
* the guard-free differential: a ``(?t>=0)`` guard is a no-op on a
  time-sorted sequence, so pattern P (regex path) and P+guard (fold
  path) must agree exactly — pinning the fold to the long-verified
  regex semantics.

The SQL dialect twin (``sequenceMatch('…(?t…)…')(ts, c…)`` through
``run_ch_sql``) is checked against the DataFrame operator on the same
data.  The DuckDB k-way-join + recursive-CTE oracle lives in the
``ev33`` catalog entry (parity.py).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.seqmatch import (
    parse_chain,
    sequence_match,
)

OPS = {"<": lambda a, b: a < b, ">": lambda a, b: a > b,
       "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
       "==": lambda a, b: a == b, "!=": lambda a, b: a != b}


def ref_count(toks, steps, seps):
    """Greedy earliest-completion count over ``toks`` =
    [(ts, tok), …] in kept order — the documented contract, written
    independently of the Spark fold."""
    n, k = len(toks), len(steps)

    def ok(sep, p, q):
        if sep["kind"] == "adj" and q != p + 1:
            return False
        if sep["kind"] == "plus" and q < p + 2:
            return False
        if sep["kind"] == "star" and q <= p:
            return False
        return all(OPS[op](toks[q][0] - toks[p][0], s)
                   for op, s in sep["guards"])

    count, start = 0, 0
    while start < n:
        feas = [set() for _ in range(k)]
        end = None
        for q in range(start, n):
            hit_final = False
            for j in reversed(range(k)):  # descending: q never
                if toks[q][1] != steps[j]:  # chains to itself
                    continue
                if j == 0:
                    feas[0].add(q)
                elif any(ok(seps[j - 1], p, q) for p in feas[j - 1]):
                    if j == k - 1:
                        hit_final = True
                    else:
                        feas[j].add(q)
            if k == 1 and toks[q][1] == steps[0]:
                hit_final = True
            if hit_final:
                end = q
                break
        if end is None:
            break
        count, start = count + 1, end + 1
    return count


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s long, event_id long")


def _run(spark, rows, pattern):
    conds = [F.col("event_type") == "view",
             F.col("event_type") == "purchase",
             F.col("event_type") == "click"]
    out = sequence_match(_ev(spark, rows), pattern, conds)
    return {r.user_id: (r.matched, r.n_chains) for r in out.collect()}


def test_guard_operators(spark):
    rows = [(1, "view", 0, 1), (1, "purchase", 100, 2)]
    for pat, want in [
        ("(?1)(?t>=100)(?2)", True),
        ("(?1)(?t>100)(?2)", False),
        ("(?1)(?t<=100)(?2)", True),
        ("(?1)(?t<100)(?2)", False),
        ("(?1)(?t==100)(?2)", True),
        ("(?1)(?t!=100)(?2)", False),
        ("(?1)(?t>50)(?t<200)(?2)", True),   # stacked guards AND
        ("(?1)(?t>50)(?t<100)(?2)", False),
    ]:
        got = _run(spark, rows, pat)
        assert got == {1: (want, 1 if want else 0)}, pat


def test_guard_with_adjacency_and_wildcards(spark):
    # view@0  click@10  purchase@100: '(?1)(?t>=100)(?2)' needs the
    # purchase ADJACENT to the view in kept order — click intervenes
    rows = [(1, "view", 0, 1), (1, "click", 10, 2),
            (1, "purchase", 100, 3)]
    assert _run(spark, rows, "(?1)(?t>=100)(?2)")[1] == (False, 0)
    assert _run(spark, rows, "(?1).*(?t>=100)(?2)")[1] == (True, 1)
    assert _run(spark, rows, "(?1)(?t>=100).*(?2)")[1] == (True, 1)
    assert _run(spark, rows, "(?1).+(?t>=100)(?2)")[1] == (True, 1)
    # .+ needs an intervening kept event: none between click and
    # purchase
    assert _run(spark, rows, "(?3).+(?t>=90)(?2)")[1] == (False, 0)


def test_non_overlap_reset(spark):
    # chains may not share events: v@0 p@60 v@70 p@130 -> the greedy
    # first chain consumes v@0,p@60; second is v@70,p@130
    rows = [(1, "view", 0, 1), (1, "purchase", 60, 2),
            (1, "view", 70, 3), (1, "purchase", 130, 4)]
    assert _run(spark, rows, "(?1).*(?t>=60)(?2)")[1] == (True, 2)
    # but with a guard only satisfiable ACROSS the pairs, still the
    # greedy scan: v@0..p@130 is >=100, v@70..p@130 is 60 -> after
    # the first chain completes at p@130 nothing remains
    assert _run(spark, rows, "(?1).*(?t>=100)(?2)")[1] == (True, 1)


def test_backtracking_upper_bound_guard(spark):
    # an upper-bound guard where the EARLIEST step-1 anchor fails but
    # a later one succeeds — the set-based fold must keep all anchors
    rows = [(1, "view", 0, 1), (1, "view", 900, 2),
            (1, "purchase", 1000, 3)]
    assert _run(spark, rows, "(?1).*(?t<200)(?2)")[1] == (True, 1)


def test_users_without_tokens_absent(spark):
    rows = [(1, "view", 0, 1), (2, "other", 0, 2)]
    got = _run(spark, rows, "(?1)(?t<10)(?2)")
    assert set(got) == {1} and got[1] == (False, 0)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_vs_python_reference(spark, seed):
    rng = random.Random(1000 + seed)
    types = ["view", "purchase", "click"]
    rows = []
    for u in range(8):
        t = 0
        for i in range(rng.randint(0, 25)):
            t += rng.choice([0, 1, 30, 60, 61, 300])
            rows.append((u, rng.choice(types + ["noise"]), t, i))
    pats = []
    for _ in range(4):
        k = rng.randint(1, 4)
        steps = [rng.randint(1, 3) for _ in range(k)]
        seps = []
        for _ in range(k - 1):
            kind = rng.choice(["adj", "star", "plus"])
            guards = [(rng.choice(list(OPS)), rng.choice([0, 30, 60, 300]))
                      for _ in range(rng.randint(0, 2))]
            seps.append({"kind": kind, "guards": guards})
        pat = f"(?{steps[0]})"
        for sep, s in zip(seps, steps[1:]):
            wild = {"adj": "", "star": ".*", "plus": ".+"}[sep["kind"]]
            pat += "".join(f"(?t{op}{n})" for op, n in sep["guards"])
            pat += wild + f"(?{s})"
        pats.append((pat, steps, seps))
    conds = {"view": 1, "purchase": 2, "click": 3}
    for pat, steps, seps in pats:
        got = _run(spark, rows, pat)
        by_user = {}
        for u, et, ts, _ in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
            if et in conds:
                by_user.setdefault(u, []).append((ts, conds[et]))
        want = {u: ref_count(toks, steps, seps)
                for u, toks in by_user.items()}
        got_counts = {u: c for u, (_, c) in got.items()}
        assert got_counts == want, (pat, got_counts, want)
        assert all(m == (c >= 1) for m, c in got.values())


@pytest.mark.parametrize("seed", range(4))
def test_guard_free_fold_equals_regex(spark, seed):
    # (?t>=0) is a no-op on a time-sorted token sequence, so P (regex
    # path) and P with an injected (?t>=0) (fold path) must agree
    rng = random.Random(2000 + seed)
    types = ["view", "purchase", "click"]
    rows = []
    for u in range(10):
        t = 0
        for i in range(rng.randint(1, 30)):
            t += rng.randint(1, 100)  # strictly increasing: dt >= 0
            rows.append((u, rng.choice(types + ["noise"]), t, i))
    for _ in range(5):
        k = rng.randint(2, 4)
        steps = [rng.randint(1, 3) for _ in range(k)]
        wilds = [rng.choice(["", ".*", ".+"]) for _ in range(k - 1)]
        plain = f"(?{steps[0]})" + "".join(
            w + f"(?{s})" for w, s in zip(wilds, steps[1:]))
        guarded = f"(?{steps[0]})" + "".join(
            f"(?t>=0){w}(?{s})" for w, s in zip(wilds, steps[1:]))
        assert not any(s["guards"] for s in parse_chain(plain, 3)[1])
        assert all(s["guards"] for s in parse_chain(guarded, 3)[1])
        got_rx = _run(spark, rows, plain)
        got_dp = _run(spark, rows, guarded)
        assert got_rx == got_dp, (plain, got_rx, got_dp)


def test_sql_dialect_equals_dataframe(spark):
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        run_ch_sql,
    )
    rng = random.Random(3)
    rows = []
    for u in range(12):
        t = 0
        for i in range(rng.randint(0, 20)):
            # strictly increasing ts: the SQL path pins ties by (ts,
            # tok), the DataFrame path by (ts, event_id) — avoid
            # cross-type ties so both orders coincide
            t += rng.choice([1, 45, 60, 120])
            rows.append((u, rng.choice(["view", "purchase", "noise"]), t, i))
    df = _ev(spark, rows)
    df.createOrReplaceTempView("sm16")
    pat = "(?1)(?t>=60).*(?2).*(?t<300)(?1)"
    want = _run(spark, rows, pat)
    got = {r.user_id: (r.m, r.c) for r in run_ch_sql(
        spark,
        f"SELECT user_id, "
        f"sequenceMatch('{pat}')(ts_s, event_type='view', "
        f"event_type='purchase') AS m, "
        f"sequenceCount('{pat}')(ts_s, event_type='view', "
        f"event_type='purchase') AS c "
        f"FROM sm16 GROUP BY user_id").collect()}
    # SQL path has no order column: equality holds because random ts
    # ties here are same-type (token order within a tie irrelevant
    # only when types equal) — restrict comparison to count+match
    assert got == {u: v for u, v in want.items()}
