"""sequenceNextNode('forward', 'head' | 'first_match') through the
dialect (r14, VERDICT r13 item 5).

Reference semantics: ClickHouse AggregateFunctionSequenceNextNode
(docs.clickhouse.com parametric-functions#sequencenextnode) — nodes
sorted by timestamp; 'head' anchors the chain at the group's first
node (which must satisfy base_cond), 'first_match' at the first node
satisfying BOTH event1 and base_cond; event_i must hold at consecutive
nodes; the answer is the event-column value of the node right after
the chain, else NULL.  Determinism contract: duplicate timestamps in a
group RAISE at runtime (CH's node order is undefined there).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)

FLOW_ROWS = [
    (1, 1, "A"), (1, 2, "B"), (1, 3, "C"), (1, 4, "D"),
    (2, 1, "B"), (2, 2, "B"), (2, 3, "D"),
    (3, 1, "A"), (3, 2, "B"),
]


@pytest.fixture()
def flow(spark):
    vals = ", ".join(f"({i}, {t}, '{p}')" for i, t, p in FLOW_ROWS)
    spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(id, dt, page)"
    ).createOrReplaceTempView("snn_flow")
    return "snn_flow"


def _rows(spark, q):
    return sorted(tuple(r) for r in run_ch_sql(spark, q).collect())


def test_head_docs_example(spark, flow):
    """The CH docs' canonical A→B flow: the value after the chain."""
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','head')(dt, page,"
        " page='A', page='A', page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    # id1: head A, then B -> next is C; id2: head is B, base fails;
    # id3: chain matches but there is no next node
    assert got == [(1, "C"), (2, None), (3, None)]


def test_first_match_anchors_mid_stream(spark, flow):
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','first_match')(dt, page,"
        " page='B', page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    # id1: first B at t=2 -> next C; id2: first B at t=1 -> next B;
    # id3: B is the last node -> NULL
    assert got == [(1, "C"), (2, "B"), (3, None)]


def test_first_match_base_condition_gates_the_anchor(spark, flow):
    # base_cond dt >= 2 skips id2's t=1 'B': anchor moves to t=2
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','first_match')(dt, page,"
        " dt >= 2, page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    assert got == [(1, "C"), (2, "D"), (3, None)]


def test_zero_event_conditions_returns_base(spark, flow):
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','head')(dt, page,"
        " page='A') AS nxt"
        f" FROM {flow} GROUP BY id"))
    assert got == [(1, "A"), (2, None), (3, "A")]


def test_null_timestamp_rows_drop(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS INT), 'Z'), (1, 1, 'A'),"
        " (1, 2, 'B') AS t(id, dt, page)"
    ).createOrReplaceTempView("snn_nullts")
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','head')(dt, page,"
        " page='A', page='A') AS nxt FROM snn_nullts GROUP BY id"))
    assert got == [(1, "B")]


def test_duplicate_timestamps_raise(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 1, 'A'), (1, 1, 'B')"
        " AS t(id, dt, page)"
    ).createOrReplaceTempView("snn_tied")
    with pytest.raises(Exception, match="duplicate timestamps"):
        run_ch_sql(spark, (
            "SELECT id, sequenceNextNode('forward','head')(dt, page,"
            " page='A', page='A') AS nxt FROM snn_tied GROUP BY id"
        )).collect()


def test_named_raises():
    # (backward/tail and the *_match mirrors are SUPPORTED since the
    # r14 second phase — see test_all_six_direction_base_pairs)
    for bad, rx in [
        ("sequenceNextNode('backward','head')(dt, page, page='A')",
         "rejects"),
        ("sequenceNextNode('forward','tail')(dt, page, page='A')",
         "rejects"),
        ("sequenceNextNode('forward','first_match')(dt, page, page='A')",
         "needs at least event1"),
        ("sequenceNextNode('backward','last_match')(dt, page, page='A')",
         "needs at least event1"),
        ("sequenceNextNode('forward')(dt, page, page='A')",
         "direction, base"),
        ("sequenceNextNode('forward','head')(dt)", "expects"),
        ("sequenceNextNode('sideways','head')(dt, p, p='A')",
         "recognized"),
    ]:
        with pytest.raises(UnsupportedChSql, match=rx):
            translate_ch_sql(f"SELECT {bad} FROM t GROUP BY id")


def test_randomized_vs_duckdb_mirror(spark):
    """Randomized event streams vs a row_number/self-join mirror on
    DuckDB — both base modes, 1–2 chain conditions, unique ts by
    construction."""
    rng = random.Random(1414)
    con = duckdb.connect()
    pages = ["A", "B", "C"]
    for trial in range(6):
        rows = []
        for g in range(1, 6):
            n = rng.randint(0, 7)
            ts = rng.sample(range(1, 30), n)
            for t in ts:
                rows.append((g, t, rng.choice(pages)))
        if not rows:
            continue
        vals = ", ".join(f"({g}, {t}, '{p}')" for g, t, p in rows)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(id, dt, page)"
        ).createOrReplaceTempView("snn_rand")
        con.execute("CREATE OR REPLACE TABLE snn_rand(id INT, dt INT, page VARCHAR)")
        con.executemany("INSERT INTO snn_rand VALUES (?, ?, ?)", rows)
        base = rng.choice(["head", "first_match"])
        n_ev = rng.randint(1, 2)
        conds = [f"page = '{rng.choice(pages)}'" for _ in range(1 + n_ev)]
        got = _rows(spark, (
            f"SELECT id, sequenceNextNode('forward','{base}')(dt, page,"
            f" {', '.join(conds)}) AS nxt FROM snn_rand GROUP BY id"))
        if base == "head":
            b_sql = (f"SELECT id, 1 AS brn FROM o WHERE rn = 1"
                     f" AND ({conds[0]})")
        else:
            b_sql = (f"SELECT id, min(rn) AS brn FROM o WHERE"
                     f" ({conds[1]}) AND ({conds[0]}) GROUP BY id")
        chain = " AND ".join(
            f"({conds[j + 1].replace('page', f'e{j + 1}.page')})"
            for j in range(n_ev))
        ejoins = " ".join(
            f"LEFT JOIN o e{j + 1} ON e{j + 1}.id = og.id"
            f" AND e{j + 1}.rn = b.brn + {j}"
            for j in range(n_ev))
        want = sorted(tuple(r) for r in con.execute(
            f"WITH o AS (SELECT id, page, row_number() OVER ("
            f"PARTITION BY id ORDER BY dt) AS rn FROM snn_rand),"
            f" b AS ({b_sql})"
            f" SELECT og.id, CASE WHEN {chain} THEN nx.page END AS nxt"
            f" FROM (SELECT DISTINCT id FROM snn_rand) og"
            f" LEFT JOIN b ON b.id = og.id {ejoins}"
            f" LEFT JOIN o nx ON nx.id = og.id AND nx.rn = b.brn + {n_ev}"
        ).fetchall())
        assert got == want, f"trial {trial} base={base} conds={conds}"


def test_all_six_direction_base_pairs(spark, flow):
    """r14 second phase: nodes always sort ascending (CH data.sort());
    direction sets the chain step sign and the answer offset.  CH's
    factory rejects backward+head and forward+tail."""
    # backward + tail: anchor the LATEST node, walk back D <- C,
    # answer = the node one step further back
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('backward','tail')(dt, page,"
        " page='D', page='D', page='C') AS nxt"
        f" FROM {flow} GROUP BY id"))
    assert got == [(1, "B"), (2, None), (3, None)]
    # backward + last_match: anchor the LAST 'B', answer = previous node
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('backward','last_match')(dt, page,"
        " dt >= 1, page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    assert got == [(1, "A"), (2, "B"), (3, "A")]
    # forward + last_match: anchor the LAST 'B', answer = next node
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('forward','last_match')(dt, page,"
        " dt >= 1, page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    assert got == [(1, "C"), (2, "D"), (3, None)]
    # backward + first_match: anchor the FIRST 'B', walk back
    got = _rows(spark, (
        "SELECT id, sequenceNextNode('backward','first_match')(dt, page,"
        " dt >= 1, page='B') AS nxt"
        f" FROM {flow} GROUP BY id"))
    # id1: first B at t=2 -> previous node A; id2: first B at t=1 ->
    # runs off the front -> NULL; id3: first B at t=2 -> previous A
    assert got == [(1, "A"), (2, None), (3, "A")]
    for d, b in [("backward", "head"), ("forward", "tail")]:
        with pytest.raises(UnsupportedChSql, match="rejects"):
            translate_ch_sql(
                f"SELECT sequenceNextNode('{d}','{b}')(dt, p, p='A')"
                " FROM t GROUP BY g")


def test_backward_randomized_vs_duckdb_mirror(spark):
    """Randomized backward+tail vs a row_number mirror anchored at the
    per-group maximum rn."""
    rng = random.Random(1515)
    con = duckdb.connect()
    pages = ["A", "B", "C"]
    for trial in range(5):
        rows = []
        for g in range(1, 6):
            for t in rng.sample(range(1, 25), rng.randint(0, 6)):
                rows.append((g, t, rng.choice(pages)))
        if not rows:
            continue
        vals = ", ".join(f"({g}, {t}, '{p}')" for g, t, p in rows)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(id, dt, page)"
        ).createOrReplaceTempView("snn_bw")
        con.execute("CREATE OR REPLACE TABLE snn_bw(id INT, dt INT, page VARCHAR)")
        con.executemany("INSERT INTO snn_bw VALUES (?, ?, ?)", rows)
        c0, c1 = (f"page = '{rng.choice(pages)}'" for _ in range(2))
        got = _rows(spark, (
            "SELECT id, sequenceNextNode('backward','tail')(dt, page,"
            f" {c0}, {c1}) AS nxt FROM snn_bw GROUP BY id"))
        want = sorted(tuple(r) for r in con.execute(
            f"WITH o AS (SELECT id, page, row_number() OVER ("
            f"PARTITION BY id ORDER BY dt) AS rn,"
            f" count(*) OVER (PARTITION BY id) AS m FROM snn_bw)"
            f" SELECT og.id, CASE WHEN ({c0.replace('page', 'ot.page')})"
            f" AND ({c1.replace('page', 'ot.page')})"
            f" THEN pv.page END AS nxt"
            f" FROM (SELECT DISTINCT id FROM snn_bw) og"
            f" LEFT JOIN o ot ON ot.id = og.id AND ot.rn = ot.m"
            f" LEFT JOIN o pv ON pv.id = og.id AND pv.rn = ot.m - 1"
        ).fetchall())
        assert got == want, f"trial {trial} c0={c0} c1={c1}"


def test_all_null_timestamp_group_each_base(spark):
    """r14 fuzz seed 5150/27: a group whose every timestamp is NULL
    has an EMPTY node set — the tail base's size(nodes) lookup must
    not evaluate try_element_at(nodes, 0) (INVALID_INDEX_OF_ZERO even
    through the try_ variant)."""
    spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS INT), 'A'),"
        " (1, CAST(NULL AS INT), 'B') AS t(id, dt, page)"
    ).createOrReplaceTempView("snn_allnull")
    for d, b in [("forward", "head"), ("backward", "tail"),
                 ("forward", "first_match"), ("backward", "last_match")]:
        got = _rows(spark, (
            f"SELECT id, sequenceNextNode('{d}','{b}')(dt, page,"
            " page='A', page='A') AS nxt FROM snn_allnull GROUP BY id"))
        assert got == [(1, None)], (d, b)
