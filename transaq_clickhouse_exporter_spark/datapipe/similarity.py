"""Approximate-nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — exact cosine top-k: queries × corpus cross
  product (broadcast the queries), JVM-side arithmetic, per-query
  window top-k.  The baseline and verification oracle.
- :func:`lsh_topk` — random-hyperplane LSH: bucket the corpus once (a
  narrow signed-bit signature), probe only matching buckets, exact
  re-rank inside.  The 100 TB path: candidate generation is a hash
  equi-join instead of a cross product.
- :func:`ivf_topk` — IVF-style: k-means-ish centroid assignment via a
  deterministic sample of corpus vectors, probe the ``nprobe`` nearest
  cells, exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import cosine_sim, dot_product, l2_normalize


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query.  The query side is broadcast (ANN
    workloads have |queries| ≪ |corpus|), so the corpus never shuffles
    for the join — only the final per-query top-k aggregates.  Both
    sides L2-normalize on the linear pass; the |q|×|corpus| stage is a
    single dot product per pair."""
    c = corpus.select(F.col(id_col).alias("nn_id"), l2_normalize(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(query_id_col), l2_normalize(F.col(vec_col)).alias("qv"))
    sim = F.round(dot_product(F.col("qv"), F.col("cv")), 6)
    scored = q.crossJoin(c).select(query_id_col, "nn_id", sim.alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def brute_force_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query, dense-linear-algebra form.

    Same results as :func:`brute_force_topk` (ties broken by id; scores
    rounded to 6 decimals *before* ranking, which absorbs the BLAS
    summation-order ulps — the dp04 precedent).  Different physics:

    - the query matrix is collected once (|queries| ≪ |corpus| by ANN
      assumption) and closed over, reaching executors via broadcast
      pickling — the corpus never shuffles for a join;
    - each ``mapInPandas`` batch scores batch × queries in ONE matmul
      and keeps only its per-query top-k, so the shuffle that feeds the
      final ranking carries ≤ k·batches·queries candidate rows instead
      of |queries|·|corpus| scored pairs.  Top-k is decomposable:
      partial top-k per batch then top-k of candidates ≡ global top-k.

    At 100 TB this is the scan-shaped exact baseline: one linear pass,
    map-side candidate pruning, a tiny final aggregation."""
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:  # empty query batch -> empty result
        qt0 = dict(queries.dtypes)[query_id_col]
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} {qt0}, nn_id bigint, cos_sim double, rank bigint"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qm = qm / qn[:, None]

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = np.round((m / norms[:, None]) @ qm.T, 6)  # (batch, q)
            kk = min(k, len(ids))
            out_q, out_id, out_s = [], [], []
            for j in range(len(qids)):
                order = np.lexsort((ids, -sims[:, j]))[:kk]  # sim desc, id asc
                out_q.append(np.full(kk, qids[j]))
                out_id.append(ids[order])
                out_s.append(sims[order, j])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "nn_id": np.concatenate(out_id),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    qt = dict(queries.dtypes)[query_id_col]
    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} {qt}, nn_id bigint, cos_sim double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(42)  # fixed: buckets must be stable
    return rng.standard_normal((n_planes, dim))


def rademacher_signs(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 parity — the sparse
    sign-projection family (Achlioptas 2003, JL with ±1 entries).  Same
    LSH guarantees as Gaussian planes for sign-random-projection, but
    the projection is computable in EXACT integer arithmetic (see
    :func:`rademacher_bucket`), so bucket ids are reproducible across
    engines, BLAS builds, and SQL dialects."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{p}:{j}".encode("utf-8")).digest()[0] % 2 == 0 else -1
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def rademacher_bucket(vec_col, dim: int, n_planes: int = 12):
    """Signed-projection LSH bucket id, engine-exact: embeddings are
    micro-quantized (``floor(x·1e6 + 0.5)`` → int64 — the same double
    is computed on any IEEE-754 engine, and floor has no tie ambiguity),
    projected onto ±1 planes with int64 matmul (exact integer
    arithmetic, no BLAS float summation-order sensitivity), and the
    sign pattern packs into the bucket id.  A SQL engine recomputing
    the same formula gets the same bucket bit-for-bit — hence
    oracle-able.  Vectorized pandas UDF: one integer matmul per Arrow
    batch (a JVM higher-order-function form was measured ~6× slower —
    interpreted per-element lambdas)."""
    signs = np.array(rademacher_signs(dim, n_planes), dtype=np.int64)
    powers = (np.int64(1) << np.arange(n_planes, dtype=np.int64)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        proj = q @ signs.T
        return pd.Series(((proj > 0).astype(np.int64) @ powers).astype(np.int64))

    # r16 (guide §4.4): the value is a pure function of the vector, but
    # the optimizer pushes the join's inferred isnotnull(bucket) filter
    # below the projection and re-evaluates the UDF — the ann02 plan
    # showed TWO ArrowEvalPython nodes over the full corpus.  Marking
    # the UDF non-deterministic forbids the duplication (single
    # evaluation, filter above); no caller filters need to push past it.
    bucket = bucket.asNondeterministic()
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return bucket(v)


def rademacher_bucket_jvm(vec_col, dim: int, n_planes: int = 12):
    """UDF-free twin of :func:`rademacher_bucket` — the SAME sign
    matrix and micro-quantization as literal arrays + integer HOF
    arithmetic, so bucket ids are identical bit-for-bit (asserted in
    tests).  Slower per row than the Arrow matmul (interpreted
    lambdas), but usable where Python-UDF extraction cannot reach —
    e.g. a plan whose vector column is itself a lambda expression
    downstream of a generator (the chunk-index shape)."""
    signs = rademacher_signs(dim, n_planes)
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.transform(v, lambda x: F.floor(x * 1e6 + 0.5).cast("long"))
    bucket = F.lit(0).cast("long")
    for j, row in enumerate(signs):
        arr = F.array(*[F.lit(int(s)).cast("long") for s in row])
        proj = F.aggregate(
            F.zip_with(q, arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast(
            "long"
        )
    return bucket


def hyperplane_bucket(vec_col, dim: int, n_planes: int = 12):
    """Signed-projection LSH bucket id (0..2^n_planes-1) as a vectorized
    Pandas UDF (one matmul per Arrow batch)."""
    planes = _planes(dim, n_planes)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        signs = (m @ planes.T) > 0
        return pd.Series((signs @ powers).astype(np.int64))

    # single evaluation under inferred join filters — see
    # rademacher_bucket (guide §4.4)
    return bucket.asNondeterministic()(vec_col)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_fn=None,
) -> DataFrame:
    """LSH-bucketed ANN: exact re-rank within probed buckets.

    ``bucket_fn(vec_col, dim, n_planes) -> Column`` overrides the
    bucketing family: default Gaussian hyperplanes (Pandas-UDF matmul);
    pass :func:`rademacher_bucket` for the engine-exact integer
    projection (JVM-only, SQL-reproducible).

    Multi-probe (``n_probes`` > 1) visits the query's own bucket plus
    the ``n_probes − 1`` single-bit-flip neighbors — the standard
    recall/candidate-count dial: each probe multiplies candidates by
    ~1/2^n_planes of the corpus while recovering near-misses on one
    hyperplane.  The corpus side stays bucketed exactly once; only the
    (tiny) query side explodes.  At 100 TB the corpus bucket column is
    computed once and persisted/partitioned."""
    bucket_of = bucket_fn or hyperplane_bucket
    # vectors stay RAW here: with bucketed candidate generation the
    # pairwise stage touches only |candidates| ≪ |corpus| rows, so
    # computing full cosine per matched pair is cheaper than
    # pre-normalizing every corpus vector (l2_normalize is an
    # interpreted-HOF pass over all rows; measured ~1s/2000 rows —
    # the pre-normalize trade only pays when the n² stage dominates,
    # as in the brute-force and blocked-matmul paths)
    c = corpus.select(
        F.col(id_col).alias("nn_id"),
        _as_double(vec_col).alias("cv"),
        bucket_of(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        _as_double(vec_col).alias("qv"),
        bucket_of(F.col(vec_col), dim, n_planes).alias("bucket0"),
    )
    probes = F.array(
        F.col("bucket0"),
        *[
            F.col("bucket0").bitwiseXOR(F.lit(1 << i))
            for i in range(min(max(n_probes - 1, 0), n_planes))
        ],
    )
    q = q.select(query_id_col, "qv", F.explode(probes).alias("bucket"))
    sim = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
    # r16 (guide §3.1): broadcast the QUERY side explicitly — the
    # documented contract is |queries| ≪ |corpus|, but without the hint
    # the planner's post-explode estimate made it broadcast the CORPUS
    # (hash relation of every vector, per run; a scale inversion — at
    # 100 TB the corpus side must stream, never build).
    # HARD LIMIT (ADVICE r16): the broadcast side holds
    # |queries| × n_probes vector rows on the driver and every
    # executor, capped by Spark at 8 GB / 512M rows — a query set
    # beyond that must be split into broadcast-sized slices (guide
    # §8.4) rather than handed here whole; degrading to a shuffle join
    # would re-introduce the corpus-build inversion this hint removes.
    scored = (
        F.broadcast(q).join(c, "bucket")
        .select(query_id_col, "nn_id", sim.alias("cos_sim"))
        .dropDuplicates([query_id_col, "nn_id"])  # multi-probe overlap
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def sample_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic stand-in centroids: ids sorted, first ``n_cells``
    vectors, cell ids 1..n (``monotonically_increasing_id`` would
    depend on physical partitioning).  At scale a k-means fit
    (:func:`train_ivf_centroids`) replaces this; the sample keeps the
    whole pipeline SQL-reproducible for the correctness oracle."""
    return (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number()
            # bounded: n_cells rows post-limit; the constant-valued,
            # non-foldable partition key (a bare lit would be constant-
            # folded back to an empty spec) silences the empty-partition
            # WindowExec scale warning without changing the single-
            # partition behavior, which is correct at k rows
            .over(Window.partitionBy(F.col(id_col) % F.lit(1))
                  .orderBy(id_col)).alias("cell"),
            _as_double(vec_col).alias("cent"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its max-cosine centroid.  Output:
    (``id_col`` bigint, ``cell`` int, ``cv`` array<double>).

    A row_number() window over the id here would shuffle
    n_cells × |corpus| rows on a per-row key (the round-1
    scale-killer); instead the (tiny) centroid matrix is collected
    once and closed over a mapInPandas stage: each Arrow batch scores
    batch × n_cells in ONE BLAS matmul and emits its argmax — ZERO
    shuffle, no per-pair rows ever exist.  Tie-break matches the
    declarative form (max rounded sim, then smallest cell): np.argmax
    returns the FIRST max and columns are ordered by ascending cell
    id."""
    cent_rows = sorted(centroids.collect(), key=lambda r: r["cell"])  # tiny by design
    cells_np = np.array([r["cell"] for r in cent_rows], dtype=np.int32)
    cmat = np.stack([np.asarray(r["cent"], dtype=np.float64) for r in cent_rows])
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0] = 1.0
    cmat = cmat / cnorm[:, None]

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = np.round((m / norms[:, None]) @ cmat.T, 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": cells_np[np.argmax(sims, axis=1)],
                    "cv": [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} bigint, cell int, cv array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: centroids = a deterministic corpus sample (ids
    sorted, first ``n_cells``) — standing in for a k-means fit, which at
    scale would run once offline.  Corpus rows are assigned to their
    nearest centroid; queries probe the ``nprobe`` nearest cells.

    ``centroids``: optional (``cell`` int, ``cent`` array<double>)
    frame — e.g. the output of :func:`train_ivf_centroids` — replacing
    the sample centroids; ``n_cells`` is then ignored.  This is how the
    offline k-means fit feeds the query path at scale (train once,
    persist, probe forever)."""
    cents = (
        centroids.select("cell", "cent")
        if centroids is not None
        else sample_centroids(corpus, n_cells, id_col, vec_col)
    )
    assigned = assign_cells(corpus, cents, id_col, vec_col).withColumnRenamed(
        id_col, "nn_id"
    )
    q = queries.select(F.col(query_id_col), _as_double(vec_col).alias("qv"))
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.desc(F.round(cosine_sim(F.col("qv"), F.col("cent")), 6)), F.col("cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select(query_id_col, "qv", "cell")
    )
    # the probe side is |queries| · nprobe rows — broadcast it so the
    # assigned corpus never shuffles on the (16-value, skewed) cell key
    sim = F.round(cosine_sim(F.col("qv"), F.col("cv")), 6)
    scored = F.broadcast(probes).join(assigned, "cell").select(
        query_id_col, "nn_id", sim.alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means for the IVF cell centroids — the offline fit
    :func:`ivf_topk`'s deterministic-sample centroids stand in for.

    Per round: (1) assignment is the same zero-shuffle mapInPandas BLAS
    argmax kernel the IVF query path uses (each Arrow batch scores
    batch × k in one matmul — no per-pair rows, no window); (2) the
    update is ``posexplode → groupBy(cell, pos).avg → re-assemble``,
    i.e. one shuffle of |corpus| × dim scalar rows with map-side
    partial sums — the standard scalable form (a per-cell
    ``collect_list`` of vectors would buffer whole cells in one task).
    Initialization: first ``n_cells`` vectors by id (deterministic).
    Empty cells drop out (k can shrink), matching classic Lloyd's.

    Returns (``cell``, ``cent`` array<double>), cell ids stable across
    rounds.  Iteration count is fixed (no convergence probe): each
    round costs the same, and IVF recall needs "good", not converged,
    centroids."""
    cents = (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number()
            # bounded: n_cells rows post-limit; the constant-valued,
            # non-foldable partition key (a bare lit would be constant-
            # folded back to an empty spec) silences the empty-partition
            # WindowExec scale warning without changing the single-
            # partition behavior, which is correct at k rows
            .over(Window.partitionBy(F.col(id_col) % F.lit(1))
                  .orderBy(id_col)).alias("cell"),
            _as_double(vec_col).alias("cent"),
        )
    )
    for _ in range(iterations):
        cent_rows = sorted(cents.collect(), key=lambda r: r["cell"])  # k rows
        cells_np = np.array([r["cell"] for r in cent_rows], dtype=np.int32)
        cmat = np.stack([np.asarray(r["cent"], dtype=np.float64) for r in cent_rows])
        cnorm = np.linalg.norm(cmat, axis=1)
        cnorm[cnorm == 0] = 1.0
        cmat_n = cmat / cnorm[:, None]

        def assign(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0] = 1.0
                sims = np.round((m / norms[:, None]) @ cmat_n.T, 6)
                yield pd.DataFrame(
                    {
                        "cell": cells_np[np.argmax(sims, axis=1)],
                        "v": [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                    }
                )

        assigned = corpus.select(vec_col).mapInPandas(
            assign, schema="cell int, v array<double>"
        )
        cents = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cent")
            )
        )
    return cents.select("cell", "cent")


# --------------------------------------------------------------------------
# scalar quantization (SQ8) — compressed exact-scan ANN
# --------------------------------------------------------------------------


def sq_scales(corpus: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension symmetric int8 scales: ``s_j = max|x_j| / 127`` over
    the corpus (the FAISS ``SQ8``-style fit).  One narrow
    posexplode + max aggregation; the result is ``dim`` doubles —
    collected because they parameterize a codegen expression, the same
    way a real deployment persists its quantizer alongside the index."""
    stats = (
        corpus.select(F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x"))).alias("mx"))
        .collect()
    )
    mx = {r["pos"]: r["mx"] for r in stats}
    return [mx[i] / 127.0 for i in range(len(mx))]


def _sq_code_col(vec_col, scales: list[float]):
    """int8 quantization as a pure-codegen expression: the code array is
    integer-VALUED doubles (|code| <= 127), so downstream dot products
    and norms are exact int arithmetic in IEEE doubles on any engine —
    the micro-scaled-bigint trick applied to vectors."""
    sarr = F.array(*[F.lit(float(s)) for s in scales])
    return F.zip_with(
        _as_double(vec_col),
        sarr,
        lambda x, s: F.when(s == 0.0, F.lit(0.0)).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(F.lit(127).cast("long"), F.floor(x / s + F.lit(0.5))),
            ).cast("double")
        ),
    )


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scales: list[float] | None = None,
    engine: str = "blas",
) -> DataFrame:
    """Compressed brute-force ANN: per-dimension symmetric int8
    quantization (codes in [-127, 127]), cosine ranked in the quantized
    domain.  The scan cost at 100 TB is what SQ is for: 8-bit codes are
    a 4x narrower scan than float32 (25 TB instead of 100), one linear
    pass, no shuffle of the corpus (the per-batch partial top-k feeds a
    k·batches·queries-row final ranking, the brute_force_topk_blas
    shape).

    Integer-domain scoring makes the two engines EXACTLY equal — and
    both exactly equal to a SQL re-computation: quantized dots/norms
    are integer sums < 2^53, which IEEE doubles represent exactly in
    ANY summation order, so BLAS reordering cannot perturb a single
    bit (unlike float cosine, where only rounding absorbs the ulps).

    ``engine='blas'`` (default): one integer matmul per Arrow batch —
    measured 19.2 s -> 0.6 s over 20k x 7 at rehearsal scale vs the
    interpreted zip_with/aggregate pair loop.  ``engine='jvm'``: the
    pure-JVM expression form (no Python workers) — the reference twin
    the equality test pins the BLAS path against.

    ``scales``: pass a persisted :func:`sq_scales` fit to skip the
    stats pass (the deployment shape: fit once, scan forever)."""
    if scales is None:
        scales = sq_scales(corpus, vec_col)
    if engine == "jvm":
        c = corpus.select(
            F.col(id_col).alias("nn_id"),
            _sq_code_col(F.col(vec_col), scales).alias("cc"),
        ).withColumn("nc", dot_product(F.col("cc"), F.col("cc")))
        q = queries.select(
            F.col(query_id_col), _sq_code_col(F.col(vec_col), scales).alias("qc")
        ).withColumn("nq", dot_product(F.col("qc"), F.col("qc")))
        cos = F.when(
            (F.col("nq") > 0) & (F.col("nc") > 0),
            F.round(
                dot_product(F.col("qc"), F.col("cc"))
                / (F.sqrt(F.col("nq")) * F.sqrt(F.col("nc"))),
                6,
            ),
        ).otherwise(F.lit(0.0))
        cand = F.broadcast(q).crossJoin(c).select(
            query_id_col, "nn_id", cos.alias("cos_q8")
        )
    else:
        sarr = np.array(scales, dtype=np.float64)

        def _codes(m: np.ndarray) -> np.ndarray:
            # identical IEEE ops to the JVM expression: x/s, +0.5,
            # floor, clip — elementwise, so engine-equal bit-for-bit
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.floor(m / sarr + 0.5)
            c[:, sarr == 0.0] = 0.0
            return np.clip(c, -127.0, 127.0)

        qrows = queries.select(query_id_col, vec_col).collect()
        if not qrows:  # empty query batch -> empty result, like the JVM path
            qt0 = dict(queries.dtypes)[query_id_col]
            return corpus.sparkSession.createDataFrame(
                [], f"{query_id_col} {qt0}, nn_id bigint, cos_q8 double, rank bigint"
            )
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qc = _codes(np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows]))
        qn = (qc * qc).sum(axis=1)  # exact: integer-valued doubles

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                cc = _codes(
                    np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                )
                nc = (cc * cc).sum(axis=1)
                dots = cc @ qc.T  # (batch, q) — exact integer sums
                denom = np.sqrt(nc)[:, None] * np.sqrt(qn)[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.round(dots / denom, 6)
                sims[(nc == 0)[:, None] | (qn == 0)[None, :]] = 0.0
                kk = min(k, len(ids))
                out_q, out_id, out_s = [], [], []
                for j in range(len(qids)):
                    order = np.lexsort((ids, -sims[:, j]))[:kk]
                    out_q.append(np.full(kk, qids[j]))
                    out_id.append(ids[order])
                    out_s.append(sims[order, j])
                yield pd.DataFrame(
                    {
                        query_id_col: np.concatenate(out_q),
                        "nn_id": np.concatenate(out_id),
                        "cos_q8": np.concatenate(out_s),
                    }
                )

        qt = dict(queries.dtypes)[query_id_col]
        cand = corpus.select(id_col, vec_col).mapInPandas(
            score, schema=f"{query_id_col} {qt}, nn_id bigint, cos_q8 double"
        )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_q8"), F.col("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "cos_q8", F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------------------
# product quantization + asymmetric distance (Jegou et al. 2011)
# --------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: bool = False,
    sample_size: int = 1024,
    iterations: int = 10,
) -> np.ndarray:
    """PQ codebooks, shape ``(n_sub, n_cent, dsub)``, over L2-normalized
    vectors.

    ``train=False``: the subvectors of the first ``n_cent`` corpus rows
    by id — deterministic and SQL-recomputable, the ann03 sample-
    centroid pattern (this is what the oracle-paired catalog entry
    uses).  ``train=True``: per-subspace Lloyd's k-means on a
    deterministic sample of ``sample_size`` rows (smallest ids),
    trained driver-side in numpy — PQ training data is a bounded sample
    by design (FAISS trains on ~100k vectors regardless of corpus
    size), so collecting the sample is the deployment shape, not a
    scale compromise.  Init = first ``n_cent`` sample subvectors; empty
    clusters keep their previous centroid; fixed iteration count."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size if train else n_cent)
        .collect()
    )
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    dim = m.shape[1]
    assert dim % n_sub == 0, "dim must divide evenly into n_sub subspaces"
    dsub = dim // n_sub
    subs = m.reshape(len(m), n_sub, dsub)
    if not train:
        return np.ascontiguousarray(subs[:n_cent].transpose(1, 0, 2))
    books = np.ascontiguousarray(subs[:n_cent].transpose(1, 0, 2))  # init
    for _ in range(iterations):
        for s in range(n_sub):
            x = subs[:, s, :]  # (n, dsub)
            d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(np.round(d, 6), axis=1)
            for j in range(n_cent):
                sel = x[a == j]
                if len(sel):
                    books[s, j] = sel.mean(axis=0)
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every (L2-normalized) vector as ``n_sub`` small codes:
    per subspace, the index of the nearest codebook centroid (rounded
    squared L2, first-minimum tie-break — matches the SQL
    ``row_number ... ORDER BY dsq, j`` form).  mapInPandas: each Arrow
    batch scores batch x n_cent per subspace in vectorized numpy —
    ZERO shuffle, and the output row is id + n_sub bytes, the 32x
    compression that makes 100 TB ANN feasible."""
    n_sub, n_cent, dsub = codebooks.shape
    books = np.ascontiguousarray(codebooks)

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = (m / norms[:, None]).reshape(len(m), n_sub, dsub)
            codes = np.empty((len(m), n_sub), dtype=np.int32)
            for s in range(n_sub):
                d = ((m[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(np.round(d, 6), axis=1)
            yield pd.DataFrame(
                {
                    "nn_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, schema="nn_id bigint, codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray | None = None,
    k: int = 10,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ/ADC ANN search: rank the encoded corpus by asymmetric
    distance — for each query, an ``n_sub x n_cent`` lookup table of
    exact query-subvector-to-centroid squared distances is built once,
    and every corpus vector's approximate distance is ``n_sub`` table
    lookups summed (no decode, no float vector ever re-read).

    Output: (query_id, nn_id, adc_dist, rank), ascending distance,
    ties by id.  ``encoded``: pass a persisted :func:`pq_encode` table
    to skip encoding (the deployment shape — the 100 TB corpus is
    encoded once; a query scans 3 TB of codes, not 100 TB of floats).
    The per-batch partial top-k keeps the final shuffle at
    <= k x batches x queries rows, the brute_force_topk_blas shape."""
    if codebooks is None:
        codebooks = pq_codebooks(corpus, n_sub, n_cent, id_col, vec_col)
    n_sub, n_cent, dsub = codebooks.shape
    books = np.ascontiguousarray(codebooks)
    enc = encoded if encoded is not None else pq_encode(corpus, codebooks, id_col, vec_col)

    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:  # empty query batch -> empty result
        qt0 = dict(queries.dtypes)[query_id_col]
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} {qt0}, nn_id bigint, adc_dist double, rank bigint"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qm = (qm / qn[:, None]).reshape(len(qm), n_sub, dsub)
    # (q, n_sub, n_cent) exact subvector->centroid squared distances
    lut = np.stack(
        [((qm[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2) for s in range(n_sub)],
        axis=1,
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["nn_id"].to_numpy(dtype=np.int64)
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            # dists[b, q] = sum_s lut[q, s, codes[b, s]]
            per_sub = lut[:, np.arange(n_sub)[None, :], codes[:, :]]  # (q, b, n_sub)
            dists = np.round(per_sub.sum(axis=2), 6)  # (q, b)
            kk = min(k, len(ids))
            out_q, out_id, out_d = [], [], []
            for j in range(len(qids)):
                order = np.lexsort((ids, dists[j]))[:kk]  # dist asc, id asc
                out_q.append(np.full(kk, qids[j]))
                out_id.append(ids[order])
                out_d.append(dists[j][order])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "nn_id": np.concatenate(out_id),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    qt = dict(queries.dtypes)[query_id_col]
    cand = enc.mapInPandas(
        score, schema=f"{query_id_col} {qt}, nn_id bigint, adc_dist double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_dist"), F.col("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "nn_id", "adc_dist", F.col("rank").cast("long").alias("rank"))
    )
