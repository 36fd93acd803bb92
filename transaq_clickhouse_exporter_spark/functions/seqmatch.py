"""ClickHouse ``sequenceMatch`` / ``sequenceCount`` parity — event-chain
pattern matching, the last of the reference stack's funnel-family
aggregates not yet covered (``windowFunnel`` → `funnel.py`,
``retention``-shape → ev07; the reference's own dashboard panels never
call these, but any ClickHouse analytics user has them available, so a
drop-in engine needs them: see the aggregate list CH ships next to the
``topK``/``uniq`` functions this repo already mirrors).

Semantics (the portable subset — documented contract):

* A *pattern* is the ClickHouse chain dialect restricted to
  ``(?N)`` condition refs joined by ``.*`` / ``.+`` — e.g.
  ``"(?1).*(?2).*(?3)"``.  Time guards ``(?t<=N)`` are NOT supported
  (they need a DP scan, not a regex; ``windowFunnel`` covers the
  time-bounded case).
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
    ``(user_col, matched boolean, n_chains bigint)``."""
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
