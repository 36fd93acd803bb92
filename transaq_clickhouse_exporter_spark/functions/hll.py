"""HyperLogLog distinct-count sketch — deterministic and
engine-reproducible (the ClickHouse ``uniq``/``uniqHLL12`` family the
reference's dashboards get for free; Flajolet et al. 2007).

Spark has ``approx_count_distinct`` built in, but its HLL++ registers
are opaque and its estimate is not reproducible outside Spark.  This
implementation makes the sketch itself a first-class, PORTABLE table:

- hash = the first 60 bits of ``md5(value)`` (hex-parsed via ``conv``)
  — seed-free, PYTHONHASHSEED-proof, recomputable in any engine (the
  same md5 discipline as the MinHash/SimHash family);
- ``bucket`` = low ``p`` bits, ``rho`` = leading-zero count + 1 of the
  remaining ``R = 60 − p`` bits, computed with INTEGER/STRING ops only
  (``bin()`` length — no float log2, whose ulp errors would corrupt
  registers above 2^53);
- registers = ``max(rho)`` per bucket: one map-side-combinable
  aggregation, mergeable across shards/days by another ``max`` —
  the property that lets a 100 TB deployment keep per-partition
  sketch tables and answer distinct-count queries without rescanning
  (:func:`hll_merge`);
- the estimator's harmonic sum is computed as an exact INTEGER sum of
  powers of two (``Σ 2^(R+1−M_j)`` ≤ 2^61) and divided once at the
  end, so two engines produce bit-identical estimates — no float
  summation-order ulps (the sq_topk integer-domain trick applied to
  the HLL estimator).

Standard bias handling: small-range linear counting when
``E ≤ 2.5·m`` and empty buckets exist; the 60-bit hash space makes
large-range correction unnecessary at any realistic cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 constants; precision >= 7 keeps the single
    # closed form applicable
    return 0.7213 / (1.0 + 1.079 / m)


def _bucket_rho(df: DataFrame, col: str, keep_cols: list, precision: int) -> DataFrame:
    """The ONE definition of the register projection — (keep_cols…,
    bucket, __rho) — shared by the batch and streaming builders so the
    hash discipline can never desynchronize between them (their
    registers must stay :func:`hll_merge`-compatible)."""
    assert 7 <= precision <= 16, "precision must be in [7, 16]"
    m = 1 << precision
    r_bits = 60 - precision
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    step = df.select(*keep_cols, h.alias("__h")).select(
        *keep_cols,
        (F.col("__h") % m).cast("int").alias("bucket"),
        F.expr(f"__h DIV {m}").alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(r_bits + 1))
        .otherwise(F.lit(r_bits) - F.length(F.bin(F.col("__w"))) + 1)
        .cast("int")
    )
    return step.select(*keep_cols, "bucket", rho.alias("__rho"))


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    precision: int = 10,
) -> DataFrame:
    """Per-group HLL registers: ``(group_cols…, bucket int, m_rho int)``.
    One narrow projection + one max-aggregation (map-side combine)."""
    return (
        _bucket_rho(df, col, list(group_cols), precision)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("m_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches (same group/precision): union + per-bucket max —
    the distributive op that makes per-shard/per-day sketch tables
    composable without touching raw data."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionAll(t)
    keys = [c for c in out.columns if c != "m_rho"]
    return out.groupBy(*keys).agg(F.max("m_rho").alias("m_rho"))


def hll_estimate_from_registers(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    precision: int = 10,
) -> DataFrame:
    """Estimate per group from a register table: ``(group_cols…, est
    bigint)``.  Exact-integer harmonic sum (see module docstring)."""
    m = 1 << precision
    r_bits = 60 - precision
    scale = r_bits + 1  # harmonic terms scaled by 2^scale -> integers
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(scale) - F.col("m_rho")).cast("long")).alias(
            "__s_present"
        ),
        F.count(F.lit(1)).alias("__nb"),
    )
    s_total = (F.col("__s_present") + (F.lit(m) - F.col("__nb")) * (1 << scale)).cast(
        "double"
    )
    e_raw = F.lit(_alpha(m) * m * m * float(1 << scale)) / s_total
    v = F.lit(m) - F.col("__nb")  # empty buckets
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v)),
    ).otherwise(F.round(e_raw))
    return per_group.select(*group_cols, est.cast("long").alias("est"))


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    precision: int = 10,
) -> DataFrame:
    """approx-count-distinct of ``col`` per ``group_cols`` — relative
    error ~1.04/sqrt(2^precision) (3.2% at the default p=10)."""
    return hll_estimate_from_registers(
        hll_registers(df, col, group_cols, precision), group_cols, precision
    )


def hll_registers_windowed(
    stream: DataFrame,
    col: str,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    precision: int = 10,
) -> DataFrame:
    """Streaming HLL: per-time-window register tables from a streaming
    DataFrame.  Because a register is just ``max(rho)``, HLL composes
    with Spark's native streaming aggregation — no custom state
    operator: ``groupBy(window(ts), bucket).agg(max(rho))`` maintains
    the registers incrementally, the watermark bounds state, and the
    emitted register rows feed :func:`hll_estimate_from_registers`
    (grouped by the window column) exactly like a batch sketch.  This
    is the "distinct users per hour" dashboard at any event rate: state
    is O(windows x 2^precision), independent of cardinality."""
    windowed = stream.withWatermark(ts_col, watermark).select(
        F.window(ts_col, window).alias("win"), F.col(col)
    )
    return (
        _bucket_rho(windowed, col, ["win"], precision)
        .groupBy("win", "bucket")
        .agg(F.max("__rho").alias("m_rho"))
    )
