"""ClickHouse SQL dialect compatibility — run the reference's panel
SQL (and a user's ad-hoc CH queries) on Spark with minimal editing.

The reference's entire query surface is CH SQL inside Grafana panels
(``etc/grafana-dashboard-trades.json``: ``toStartOfInterval(time,
INTERVAL $interval minute)``, ``topK``, signed sums, ``FINAL`` reads).
:mod:`..queries.dashboard` re-expresses each panel as a DataFrame
builder and :mod:`.sql` as Spark-dialect text — this module closes the
last gap: paste CH-dialect SQL, run it.

Two mechanisms, used together by :func:`run_ch_sql`:

1. **Scalar shims as native SQL UDFs** (:func:`register_ch_functions`)
   — Spark ≥4.0 ``CREATE TEMPORARY FUNCTION … RETURN <expr>`` defines
   them JVM-side: they inline into the Catalyst plan (constant-folded,
   codegen'd, pushdown-friendly) with ZERO Python overhead — these are
   not Python UDFs.  Covers ``toStartOfInterval`` (any day-time
   INTERVAL literal), ``toDateTime``/``toDate``/``toUnixTimestamp``,
   ``intDiv``/``modulo``, ``toInt64``/``toFloat64``/``toString``,
   ``toStartOfMinute/Hour/Day``.
2. **A conservative text translator** (:func:`translate_ch_sql`) for
   what a scalar UDF cannot express — aggregate renames and CH's
   parameterized-aggregate syntax — using a real paren-matching
   scanner, not regex-over-nested-parens:

   - ``uniqExact(x[, y…])``      → ``count(DISTINCT x[, y…])``
   - ``uniq/uniqCombined/uniqHLL12(x)`` → ``approx_count_distinct(x)``
   - ``quantile(q)(x)`` / ``quantileExact(q)(x)`` → ``percentile(x, q)``
   - ``countIf(c)``              → ``count_if(c)``
   - ``sumIf/avgIf/minIf/maxIf(x, c)`` → ``agg(CASE WHEN c THEN x END)``
   - ``any(x)``                  → ``any_value(x)``
   - ``FROM t FINAL``            → ``FROM t`` (the engine's views
     already apply ReplacingMergeTree FINAL on read — op01/op02)

   Anything it does not recognize passes through untouched, so plain
   ANSI stays intact; CH features with no Spark equivalent in this
   subset (``topK(k)(x)``, ``quantileTiming``, array-join dialect)
   raise ``UnsupportedChSql`` with the offending name rather than
   mistranslating — use the DataFrame operators (`functions/topk.py`,
   …) for those.

Template variables: ``substitute(sql, params)`` fills Grafana-style
``$var`` / ``${var}`` through the same quoting discipline as
:mod:`.sql` (``_lit``), so a hostile value cannot splice SQL.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from .sql import _lit

#: scalar CH functions as native SQL UDFs (name → CREATE body).
_SCALAR_SHIMS: dict[str, str] = {
    # bucket a timestamp to interval starts — the dashboard's core
    # primitive (GDJ: every time-series panel).  CAST(day-time
    # interval AS BIGINT) yields whole seconds.
    "toStartOfInterval": (
        "(ts TIMESTAMP, iv INTERVAL DAY TO SECOND) RETURNS TIMESTAMP RETURN "
        "timestamp_seconds((CAST(unix_timestamp(ts) AS BIGINT) DIV CAST(iv AS BIGINT))"
        " * CAST(iv AS BIGINT))"
    ),
    "toDateTime": "(x STRING) RETURNS TIMESTAMP RETURN CAST(x AS TIMESTAMP)",
    "toDate": "(x STRING) RETURNS DATE RETURN CAST(x AS DATE)",
    "toUnixTimestamp": "(ts TIMESTAMP) RETURNS BIGINT RETURN unix_timestamp(ts)",
    "intDiv": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a DIV b",
    "modulo": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a % b",
    "toInt32": "(x DOUBLE) RETURNS INT RETURN CAST(x AS INT)",
    "toInt64": "(x DOUBLE) RETURNS BIGINT RETURN CAST(x AS BIGINT)",
    "toFloat64": "(x DOUBLE) RETURNS DOUBLE RETURN x",
    "toString": "(x STRING) RETURNS STRING RETURN x",
    "toStartOfMinute": "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('minute', ts)",
    "toStartOfHour": "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('hour', ts)",
    "toStartOfDay": "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('day', ts)",
}


def register_ch_functions(spark: SparkSession) -> None:
    """Idempotently register the scalar CH shims as SQL UDFs."""
    for name, body in _SCALAR_SHIMS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")


class UnsupportedChSql(ValueError):
    """A CH construct this subset deliberately refuses to guess at."""


#: simple renames: same arity/arg order, different name.
_RENAMES = {
    "uniq": "approx_count_distinct",
    "uniqCombined": "approx_count_distinct",
    "uniqHLL12": "approx_count_distinct",
    "countIf": "count_if",
    # NOT mapped: bare `any(…)` — ANSI quantified comparisons
    # (`> ANY (SELECT …)`) use the same spelling; CH users should
    # write any_value directly.
    "anyLast": "any_value",
}

#: `aggIf(x, cond)` → `agg(CASE WHEN cond THEN x END)`
_IF_AGGS = {"sumIf": "sum", "avgIf": "avg", "minIf": "min", "maxIf": "max"}

#: parameterized aggregates `name(params)(args)` we map to Spark.
_PARAMETERIZED = {"quantile", "quantileExact", "quantileDeterministic"}

#: recognized-but-unsupported: raise instead of mistranslating.
_UNSUPPORTED = {"topK", "quantileTiming", "quantileTDigest", "arrayJoin",
                "sequenceMatch", "sequenceCount", "windowFunnel", "retention"}


def _find_close(sql: str, open_idx: int) -> int:
    """Index of the ')' matching sql[open_idx] == '(', respecting
    nested parens and single-quoted literals."""
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise UnsupportedChSql("unbalanced parentheses in SQL text")


def _split_args(args: str) -> list[str]:
    """Split a call's argument text on TOP-LEVEL commas."""
    out, depth, cur, i, n = [], 0, [], 0, len(args)
    while i < n:
        c = args[i]
        if c == "'":
            j = i + 1
            while j < n:
                if args[j] == "'":
                    if j + 1 < n and args[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(args[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur).strip())
    return out


def translate_ch_sql(sql: str) -> str:
    """Rewrite the CH-dialect constructs described in the module
    docstring into Spark SQL.  Pure text-to-text; unknown functions
    pass through (the scalar shims handle them at run time)."""
    import re

    # `FROM t FINAL` → `FROM t`: dedup-on-read views already implement
    # ReplacingMergeTree FINAL (operators/dedup.py).  Anchored on the
    # FROM clause so a column/alias named "final" is untouched.
    sql = re.sub(r"(?i)(\bFROM\s+[A-Za-z_][\w.]*)\s+FINAL\b", r"\1", sql)

    out = []
    i, n = 0, len(sql)
    ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
    while i < n:
        c = sql[i]
        if c == "'":  # copy string literals verbatim
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = ident.match(sql, i)
        if not m:
            out.append(c)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        # look ahead for a call
        k = j
        while k < n and sql[k] in " \t\n":
            k += 1
        if k >= n or sql[k] != "(":
            out.append(name)
            i = j
            continue
        close = _find_close(sql, k)
        inner = translate_ch_sql(sql[k + 1 : close])
        # parameterized form: name(params)(args)?
        k2 = close + 1
        while k2 < n and sql[k2] in " \t\n":
            k2 += 1
        has_second = k2 < n and sql[k2] == "("
        if name in _UNSUPPORTED:
            raise UnsupportedChSql(
                f"{name}() has no faithful SQL mapping here — use the "
                f"DataFrame operator (see functions/ and datapipe/)"
            )
        if name in _PARAMETERIZED and has_second:
            close2 = _find_close(sql, k2)
            args = translate_ch_sql(sql[k2 + 1 : close2])
            out.append(f"percentile({args}, {inner.strip()})")
            i = close2 + 1
            continue
        if name in _PARAMETERIZED:  # CH `quantile(x)` defaults to median
            out.append(f"percentile({inner}, 0.5)")
            i = close + 1
            continue
        if name in _IF_AGGS:
            parts = _split_args(inner)
            if len(parts) != 2:
                raise UnsupportedChSql(f"{name}() expects 2 arguments")
            out.append(f"{_IF_AGGS[name]}(CASE WHEN {parts[1]} THEN {parts[0]} END)")
            i = close + 1
            continue
        if name == "uniqExact":
            out.append(f"count(DISTINCT {inner})")
            i = close + 1
            continue
        # untouched/renamed plain call: keep original spacing between
        # the name and its paren (e.g. ANSI `> ANY (SELECT …)`)
        out.append(f"{_RENAMES.get(name, name)}{sql[j:k]}({inner})")
        i = close + 1
    return "".join(out)


def substitute(sql: str, params: Mapping[str, object]) -> str:
    """Fill Grafana-style ``$var`` / ``${var}`` template variables.
    Strings are quoted via the :mod:`.sql` literal escaper; ints/floats
    render bare; sequences become quoted IN-lists."""
    import re

    def render(v: object) -> str:
        if isinstance(v, (int, float)):
            return str(v)
        if isinstance(v, (list, tuple, set)):
            return ", ".join(render(x) for x in sorted(map(str, v)))
        return _lit(str(v))

    def repl(m: "re.Match[str]") -> str:
        key = m.group(1) or m.group(2)
        if key not in params:
            raise KeyError(f"missing template variable ${key}")
        return render(params[key])

    return re.sub(r"\$\{(\w+)\}|\$(\w+)", repl, sql)


def run_ch_sql(
    spark: SparkSession, sql: str, params: Mapping[str, object] | None = None
) -> DataFrame:
    """One-call entry: substitute template variables, translate the
    dialect, register the scalar shims, run."""
    if params:
        sql = substitute(sql, params)
    register_ch_functions(spark)
    return spark.sql(translate_ch_sql(sql))
