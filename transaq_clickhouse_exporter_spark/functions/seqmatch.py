"""ClickHouse ``sequenceMatch`` / ``sequenceCount`` parity — event-chain
pattern matching, the last of the reference stack's funnel-family
aggregates not yet covered (``windowFunnel`` → `funnel.py`,
``retention``-shape → ev07; the reference's own dashboard panels never
call these, but any ClickHouse analytics user has them available, so a
drop-in engine needs them: see the aggregate list CH ships next to the
``topK``/``uniq`` functions this repo already mirrors).

Semantics (the portable subset — documented contract):

* A *pattern* is the ClickHouse chain dialect: ``(?N)`` condition
  refs joined by ``.*`` / ``.+`` — e.g. ``"(?1).*(?2).*(?3)"`` —
  where each separator region may also carry time guards
  ``(?t op N)`` (op ∈ <, >, <=, >=, ==, !=; N integer seconds)
  constraining ``ts(step_{i+1}) − ts(step_i)`` between the adjacent
  matched condition-events, e.g. ``"(?1)(?t>=60).*(?2)"`` (r16;
  guard-free patterns keep the regex path, guarded ones run the
  greedy chain fold — see :func:`chain_count_fold_sql`).
* Per user, events matching **at least one** condition are kept and
  ordered by ``(ts, order_col)``; events matching none are ignored —
  exactly ClickHouse's storage rule ("events not described by any
  condition are not considered").  Ties on the timestamp are pinned by
  the unique ``order_col`` so results are deterministic (CH leaves
  same-second order undefined; we don't).
* Each kept event becomes one token — the digit of its FIRST matching
  condition (conditions are expected to be mutually exclusive, as in
  every practical funnel; first-match-wins is the tie rule otherwise,
  where CH would set multiple bits).
* ``sequenceMatch`` = unanchored regex search of the translated
  pattern over the per-user token string.
* ``sequenceCount`` = number of non-overlapping left-to-right matches
  with SHORTEST-chain semantics (``.*`` → lazy ``.*?``), which is the
  chain-counting rule CH's scan implements.

Why a regex over a token string and not k-1 joins (the windowFunnel
plan): ``sequenceMatch`` patterns allow repeats and arbitrary chain
alphabets (``(?1).*(?2).*(?1)``), which joins can't express without
per-pattern codegen — while the token string per user is tiny (only
condition-matching events survive the filter).

Plan shape at 100 TB: one narrow filtered scan (the condition
disjunction pushes to parquet), one hash aggregation keyed on the user
id (partial ``collect_list`` map-side, merge on the reducer), then a
per-row regex — no window over raw events, no join.  State per user is
O(condition-matching events), the same bound ClickHouse's aggregate
state has.  The regexes land in both Java's engine (Spark) and RE2
(DuckDB oracle) inside the dialect-intersection subset the PII scrub
already relies on (`datapipe/text.py`).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokens for condition 1..9 — single digits keep the regex readable
#: and identical across engines.
_PATTERN_RE = re.compile(r"\(\?(\d)\)|\.\*|\.\+")

#: full chain grammar including time guards ``(?t op N)`` (r16):
#: condition refs joined by separator regions that may mix at most one
#: wildcard (``.*`` / ``.+``) with any number of time guards.
_CHAIN_RE = re.compile(
    r"\(\?(\d)\)|(\.\*)|(\.\+)|\(\?t\s*(<=|>=|==|!=|<|>)\s*(\d+)\)")


def translate_pattern(pattern: str, n_conds: int, lazy: bool = False) -> str:
    """CH chain pattern → plain regex over the token alphabet.

    ``"(?1).*(?2)"`` → ``"1.*2"`` (or ``"1.*?2"`` when ``lazy``, the
    sequenceCount form).  Raises on anything outside the portable
    subset (time guards, alternation, anchors)."""
    out: list[str] = []
    pos = 0
    for m in _PATTERN_RE.finditer(pattern):
        if m.start() != pos:
            raise ValueError(f"unsupported pattern fragment: {pattern[pos:m.start()]!r}")
        pos = m.end()
        if m.group(1) is not None:
            idx = int(m.group(1))
            if not (1 <= idx <= n_conds):
                raise ValueError(f"(?{idx}) out of range for {n_conds} conditions")
            out.append(str(idx))
        else:
            frag = m.group(0)
            out.append(frag + "?" if lazy else frag)
    if pos != len(pattern):
        raise ValueError(f"unsupported pattern fragment: {pattern[pos:]!r}")
    if not out:
        raise ValueError("empty pattern")
    return "".join(out)


def parse_chain(
    pattern: str, n_conds: int
) -> tuple[list[int], list[dict]]:
    """Parse the FULL chain grammar — ``(?N)`` refs joined by
    separator regions mixing at most one wildcard (``.*`` any gap,
    ``.+`` at least one intervening kept event) with any number of
    time guards ``(?t op N)`` (op ∈ <, >, <=, >=, ==, !=; N integer
    seconds) — into ``(steps, seps)``:

    * ``steps``: 1-based condition index per chain step;
    * ``seps[i]``: dict ``{"kind": "adj"|"star"|"plus", "guards":
      [(op, seconds), …]}`` for the region between steps i and i+1.

    Guard placement is free within its region (``(?1)(?t>60).*(?2)``
    ≡ ``(?1).*(?t>60)(?2)``): ClickHouse's scan compares the NEXT
    matched condition-event against the LAST matched one
    (AggregateFunctionSequenceMatch.h time actions), so with
    backtracking over the wildcard both spellings constrain
    ``ts(step_{i+1}) − ts(step_i)``.  Raises ValueError outside the
    grammar (leading/trailing separators, two wildcards in a region,
    alternation, anchors)."""
    steps: list[int] = []
    seps: list[dict] = []
    cur: dict | None = None  # separator region being accumulated
    pos = 0
    for m in _CHAIN_RE.finditer(pattern):
        if m.start() != pos:
            raise ValueError(
                f"unsupported pattern fragment: {pattern[pos:m.start()]!r}")
        pos = m.end()
        if m.group(1) is not None:  # (?N)
            idx = int(m.group(1))
            if not (1 <= idx <= n_conds):
                raise ValueError(
                    f"(?{idx}) out of range for {n_conds} conditions")
            if steps:
                seps.append(cur if cur is not None
                            else {"kind": "adj", "guards": []})
            cur = None
            steps.append(idx)
        else:
            if not steps:
                raise ValueError(
                    "pattern must start with a condition ref (?N)")
            if cur is None:
                cur = {"kind": "adj", "guards": []}
            if m.group(2) or m.group(3):  # wildcard
                if cur["kind"] != "adj":
                    raise ValueError(
                        "at most one wildcard per separator region")
                cur["kind"] = "star" if m.group(2) else "plus"
            else:  # time guard
                cur["guards"].append((m.group(4), int(m.group(5))))
    if pos != len(pattern):
        raise ValueError(f"unsupported pattern fragment: {pattern[pos:]!r}")
    if not steps:
        raise ValueError("empty pattern")
    if cur is not None:
        raise ValueError("pattern must end with a condition ref (?N)")
    return steps, seps


_GUARD_OPS = {"<": "<", ">": ">", "<=": "<=", ">=": ">=",
              "==": "=", "!=": "<>"}


def _sep_cond_sql(sep: dict, p: str = "p", e: str = "e") -> str:
    """SQL predicate: kept-token ``p`` (struct t, i) may be the
    previous chain step for token ``e`` under separator ``sep``."""
    if sep["kind"] == "adj":
        parts = [f"{p}.i = {e}.i - 1"]
    elif sep["kind"] == "star":
        parts = [f"{p}.i < {e}.i"]
    else:  # plus: at least one kept event strictly between
        parts = [f"{p}.i < {e}.i - 1"]
    for op, secs in sep["guards"]:
        parts.append(
            f"({e}.t - {p}.t) {_GUARD_OPS[op]} CAST({secs} AS DOUBLE)")
    return " AND ".join(parts)


def chain_count_fold_sql(steps: list[int], seps: list[dict],
                         arr_sql: str) -> str:
    """SQL expression (Spark dialect) counting non-overlapping
    leftmost-shortest chain matches over ``arr_sql`` — an expression
    of type ``array<struct<t double, tok int, i int>>`` already sorted
    by kept-event order with ``i`` the 0-based position.

    The fold is the greedy earliest-completion machine: the
    accumulator carries, per non-final step j, the set ``sj`` of kept
    tokens matched as step j since the last completed chain; a token
    completing the final step increments the count and RESETS every
    set (ClickHouse's sequenceCount resumes its scan after the
    match-ending event).  Greedy earliest completion counts the
    maximum number of non-overlapping matches — the exchange argument
    for interval scheduling — which is the leftmost-shortest rule the
    regex twin (``.*?``) implements for guard-free chains (pinned by
    the differential property test).  State per group is
    O(kept tokens), the bound ClickHouse's own aggregate state has
    (it stores every condition-matching event)."""
    k = len(steps)
    if k == 1:
        return (f"size(filter({arr_sql}, e -> e.tok = {steps[0]}))")
    empty = "CAST(array() AS ARRAY<STRUCT<t: DOUBLE, i: INT>>)"
    init = ("named_struct('cnt', CAST(0 AS BIGINT), "
            + ", ".join(f"'s{j}', {empty}" for j in range(1, k))
            + ")")
    completed = (
        f"e.tok = {steps[k - 1]} AND exists(acc.s{k - 1}, "
        f"p -> {_sep_cond_sql(seps[k - 2])})")
    reset = ("named_struct('cnt', acc.cnt + CAST(1 AS BIGINT), "
             + ", ".join(f"'s{j}', {empty}" for j in range(1, k)) + ")")
    grown = []
    for j in range(1, k):
        gate = f"e.tok = {steps[j - 1]}"
        if j > 1:
            gate += (f" AND exists(acc.s{j - 1}, "
                     f"p -> {_sep_cond_sql(seps[j - 2])})")
        grown.append(
            f"'s{j}', CASE WHEN {gate} THEN concat(acc.s{j}, "
            f"array(named_struct('t', e.t, 'i', e.i))) ELSE acc.s{j} END")
    keep = ("named_struct('cnt', acc.cnt, " + ", ".join(grown) + ")")
    return (f"aggregate({arr_sql}, {init}, (acc, e) -> "
            f"CASE WHEN {completed} THEN {reset} ELSE {keep} END, "
            f"acc -> acc.cnt)")


def _token_col(conds: Sequence[Column]) -> Column:
    """First-matching-condition digit, NULL when no condition matches."""
    if not 1 <= len(conds) <= 9:
        raise ValueError("1..9 conditions supported (single-digit tokens)")
    tok: Column = F.lit(None).cast("string")
    for i in range(len(conds) - 1, -1, -1):
        tok = F.when(conds[i], F.lit(str(i + 1))).otherwise(tok)
    return tok


def sequence_strings(
    events: DataFrame,
    conds: Sequence[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user ordered token string: ``(user_col, seq)``.

    Only users with at least one condition-matching event appear —
    ClickHouse's aggregate likewise has no state for them."""
    toks = events.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(order_col).alias("__ord"),
        _token_col(conds).alias("__tok"),
    ).filter(F.col("__tok").isNotNull())
    return toks.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ts", "__ord", "__tok"))),
                lambda x: x["__tok"],
            ),
            "",
        ).alias("seq")
    )


def sequence_match(
    events: DataFrame,
    pattern: str,
    conds: Sequence[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user ``sequenceMatch`` + ``sequenceCount`` in one pass:
    ``(user_col, matched boolean, n_chains bigint)``.

    Guard-free patterns run the regex path (one ``rlike`` +
    ``regexp_extract_all`` per group string); patterns with time
    guards ``(?t op N)`` run the greedy chain fold
    (:func:`chain_count_fold_sql`) over the same deterministic
    ``(ts, order_col)`` token order — ``matched`` is then
    ``n_chains >= 1`` (greedy earliest completion finds a chain iff
    one exists).  Both are one filtered scan + one hash aggregation +
    a per-group JVM expression: no join, no window over raw events."""
    steps, seps = parse_chain(pattern, len(conds))
    if not any(sep["guards"] for sep in seps):
        rx = translate_pattern(pattern, len(conds))
        rx_lazy = translate_pattern(pattern, len(conds), lazy=True)
        seqs = sequence_strings(events, conds, ts_col, user_col, order_col)
        return seqs.select(
            user_col,
            F.col("seq").rlike(rx).alias("matched"),
            F.size(F.regexp_extract_all("seq", F.lit(rx_lazy), F.lit(0)))
            .cast("long")
            .alias("n_chains"),
        )
    arrs = sequence_token_arrays(
        events, conds, ts_col, user_col, order_col)
    cnt = F.expr(chain_count_fold_sql(steps, seps, "__arr")).cast("long")
    return arrs.select(
        user_col,
        (cnt >= 1).alias("matched"),
        cnt.alias("n_chains"),
    )


def sequence_token_arrays(
    events: DataFrame,
    conds: Sequence[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user ordered kept-token array for the chain fold:
    ``(user_col, __arr array<struct<t double, tok int, i int>>)`` with
    ``i`` the 0-based kept-sequence position — the struct twin of
    :func:`sequence_strings` (same filter, same ``(ts, order_col)``
    tie pin)."""
    toks = events.select(
        F.col(user_col),
        F.col(ts_col).cast("double").alias("__ts"),
        F.col(order_col).alias("__ord"),
        _token_col(conds).cast("int").alias("__tok"),
    ).filter(F.col("__tok").isNotNull())
    sorted_arr = F.array_sort(
        F.collect_list(F.struct("__ts", "__ord", "__tok")))
    indexed = F.transform(
        sorted_arr,
        lambda x, i: F.struct(
            x["__ts"].alias("t"), x["__tok"].alias("tok"),
            i.cast("int").alias("i")),
    )
    return toks.groupBy(user_col).agg(indexed.alias("__arr"))


def sequence_match_summary(
    events: DataFrame,
    pattern: str,
    conds: Sequence[Column],
    ts_col: str = "ts_s",
    user_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Corpus rollup: ``(n_users, n_matched, n_chains)`` — one row."""
    per_user = sequence_match(events, pattern, conds, ts_col, user_col, order_col)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if("matched").alias("n_matched"),
        F.sum("n_chains").alias("n_chains"),
    )
