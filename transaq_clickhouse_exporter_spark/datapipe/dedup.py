"""Document deduplication families.

- :func:`exact_dedup` — hash-groupBy (one shuffle on the content hash;
  map-side partial aggregation makes this the cheapest possible dedup
  at any scale).
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash +
  banded LSH: shingle → 64 minhashes (vectorized numpy over Arrow
  batches) → band buckets → candidate pairs via bucket self-join.  The
  band join is the only shuffle; the quadratic step is confined to
  per-bucket groups.
- :func:`simhash_signatures` — 64-bit SimHash (token-hash bit voting),
  near-dups = signatures within Hamming distance ``d`` via band join on
  16-bit chunks.
- :func:`ngram_jaccard` — exact word-shingle Jaccard on candidate
  pairs (the verifier for the sketch-based families).
- :func:`embedding_near_dup_pairs` — cosine near-dups over an embedding
  column with blocked candidate generation.

Hashing is deterministic and seed-pinned everywhere (md5 in the pandas
kernels, xxhash64 in the JVM engine) so signatures are stable across
runs, partitions, and Python versions — a requirement for incremental
dedup at 100 TB (re-shingling yesterday's corpus must reproduce
yesterday's signatures).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import normalize_text

MERSENNE = (1 << 61) - 1


def _perm_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)  # fixed: signatures must be stable
    a = rng.integers(1, MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _hash64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of token strings.  md5 runs in C
    (hashlib) — ~100× the throughput of a per-char Python loop — and is
    stable across runs/partitions/Python builds (PYTHONHASHSEED-proof),
    which incremental 100 TB dedup requires."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
    return out


def word_shingles(text: str, k: int = 3) -> list[str]:
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Exact (optionally normalized) content dedup: one row per content
    hash, keeping the smallest id — plus the group size for auditing."""
    key = F.md5(normalize_text(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.select(key.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = True,
) -> DataFrame:
    """Dedup a NEW ingest batch against the historical corpus without
    ever re-reading the corpus documents: ``seen_hashes`` is the
    persisted one-column ``content_hash`` table that each run appends
    its survivors' hashes to.

    Two stages, both shuffle-minimal: dedup *within* the batch
    (hash-groupBy, map-side combine — batches are small), then one
    ``left_anti`` join against the hash table.  At 100 TB the hash
    table is itself stored bucketed/sorted by ``content_hash`` so the
    anti-join is a bucket-local probe, and the batch side (tiny) is the
    build side.  Content hashing is md5 — stable across runs, so the
    incremental run chain reproduces exactly.

    Returns the surviving new rows with their ``content_hash`` attached
    (append these hashes to ``seen_hashes`` after the batch commits)."""
    key = F.md5(normalize_text(text_col)) if normalized else F.md5(F.col(text_col))
    in_batch = (
        new_docs.withColumn("content_hash", key)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return in_batch.join(
        seen_hashes.select("content_hash").distinct(), "content_hash", "left_anti"
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures via a vectorized Pandas UDF (Arrow batches;
    numpy broadcasting does n_hashes × n_shingles in one shot)."""
    a, b = _perm_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        # One permutation pass for the WHOLE Arrow batch, then
        # per-document segment minima (np.minimum.reduceat) — the same
        # (a*h + b) mod p minwise math as a per-doc loop; measured
        # equal-speed at ~50-shingle docs, and batch-shaped so longer
        # documents amortize (per-doc numpy dispatch dominates the loop
        # form at small shingle counts).
        shingle_lists = [word_shingles(t or "", shingle_k) for t in texts]
        lens = np.array([len(sh) for sh in shingle_lists], dtype=np.int64)
        out = np.zeros((len(shingle_lists), n_hashes), dtype=np.int64)
        flat = [tok for sh in shingle_lists for tok in sh]
        if flat:
            h = _hash64(flat).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
            m = (a[:, None] * (h[None, :] % MERSENNE) + b[:, None]) % MERSENNE
            nz = lens > 0
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
            # empty docs contribute no columns, so consecutive non-empty
            # segments stay adjacent — reduceat spans are exact
            out[nz] = np.minimum.reduceat(m, starts, axis=1).T
        return pd.Series([row.tolist() for row in out])

    return df.select(F.col(id_col), sig(F.col(text_col)).alias("minhash"))


def band_buckets(
    signatures: DataFrame, bands: int = 16, id_col: str = "doc_id",
    n_hashes: int | None = None,
) -> DataFrame:
    """Explode signatures into (id, band, bucket) rows — one per band.
    All-primitive columns, so this level caches through Spark's
    columnar in-memory format at full speed (caching the ``array<long>``
    signatures instead costs ~4× the materialization time: nested
    columnar encoding is per-element).

    Pass ``n_hashes`` when known — probing it from the data costs an
    extra job through the (Python-UDF) signature stage."""
    n = n_hashes or signatures.select(F.size("minhash")).first()[0]
    rows_per_band = n // bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(F.slice("minhash", i * rows_per_band + 1, rows_per_band)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


#: 31-bit Mersenne prime for the JVM-side permutation math: with
#: ``a, b, h < 2^31`` the product ``a*h + b`` stays under 2^62, so the
#: arithmetic is exact in ANSI int64 (the 61-bit prime the pandas
#: kernel uses would overflow ``a*h`` JVM-side).  A 31-bit minwise
#: space is ample: per-shingle collision odds are ~n_shingles/2^31.
P31 = (1 << 31) - 1


def _perm_params31(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)  # fixed: signatures must be stable
    a = rng.integers(1, P31, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, P31, size=n_hashes, dtype=np.int64)
    return a, b


def band_buckets_jvm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash band buckets computed entirely JVM-side — no Python
    workers, no Arrow transfer, no repartition shuffle on the corpus.

    Shape: shingle (HOF codegen) → hash each shingle ONCE with
    ``xxhash64`` → explode to (id, h) rows → ``groupBy(id)`` with one
    ``min((a_i*h + b_i) mod p)`` aggregate per permutation.  The 64 min
    aggregates are primitive buffers, so the whole pipeline stays in
    WholeStageCodegen HashAggregate with a map-side partial combine —
    the shuffle carries exactly ``n_hashes`` longs per document
    regardless of document length.  (The tempting per-row form — 64
    nested ``array_min(transform(...))`` — leaves codegen: higher-order
    functions evaluate interpreted, and measured 25 s vs 1 s for this
    form at sf0.01.)  Band buckets hash consecutive ``n/bands``-sized
    signature slices, same banding semantics as :func:`band_buckets`.

    ``xxhash64`` is stable across runs, partitions, JVM versions and
    languages (seed 42 fixed by Spark), which incremental 100 TB dedup
    requires — strictly stronger reproducibility than the Python
    kernel's md5 (also stable, but only reachable through a Python
    worker)."""
    a, b = _perm_params31(n_hashes)
    rows = n_hashes // bands
    hs = F.transform(
        shingle_array(text_col, shingle_k),
        lambda s: F.pmod(F.xxhash64(s), F.lit(P31)),
    )
    exploded = df.select(F.col(id_col), F.explode(hs).alias("__h"))
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.pmod(int(a[i]) * F.col("__h") + int(b[i]), F.lit(P31))).alias(f"__m{i}")
            for i in range(n_hashes)
        ]
    )
    bucket_structs = [
        F.struct(
            F.lit(bd).alias("band"),
            F.hash(*[F.col(f"__m{i}") for i in range(bd * rows, (bd + 1) * rows)]).alias(
                "bucket"
            ),
        )
        for bd in range(bands)
    ]
    return mins.select(
        F.col(id_col), F.explode(F.array(*bucket_structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def _pairs_from_banded(
    banded: DataFrame, id_col: str = "doc_id", salt_buckets: int | None = None
) -> DataFrame:
    """Self-join band buckets into candidate pairs (id_a < id_b).

    ``salt_buckets=g`` switches to the SALTED self-join for hot-bucket
    skew (a viral near-dup cluster puts m docs in one (band, bucket),
    making one reducer enumerate m²/2 pairs): the left side takes a
    random salt in [0, g), the right side replicates across all g salts
    (``operators/salting.py::explode_salt``), and the join adds the
    salt to the key — each ordered pair still meets EXACTLY once (at
    the left row's salt), so the output is identical, but the hot
    bucket's pair enumeration spreads over g reducers.  Cost: the
    banded table shuffles g× on the right side — the standard salting
    trade — and MEASUREMENT says that cost dominates long before the
    hot reducer does (SCALE.md "Round-8 rehearsal": a 72M-pair bucket
    enumerates in seconds of one codegen'd SMJ task, while salt=32
    doubles wall time at 10M banded rows; AQE's skew split never fires
    because the hot key is byte-small).  Keep g ≤ 8, reserve for a
    bucket so viral that one task's enumeration threatens the executor
    wall, and treat such a bucket as a data-quality signal (a
    boilerplate shingle) first."""
    if salt_buckets:
        from ..operators.salting import explode_salt

        left = banded.withColumn(
            "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
        ).alias("l")
        right = explode_salt(banded, salt_buckets).alias("r")
        extra = F.col("l.__salt") == F.col("r.__salt")
    else:
        left = banded.alias("l")
        right = banded.alias("r")
        extra = F.lit(True)
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & extra
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, id_col: str = "doc_id",
    n_hashes: int | None = None, salt_buckets: int | None = None,
) -> DataFrame:
    """Band the signatures and self-join on (band, band-hash): documents
    sharing any band become a candidate pair.  Scale shape: explode is
    linear; the join shuffles on the band key; bucket skew (a viral
    near-dup cluster) is handled by AQE skew-join splitting, or
    explicitly by ``salt_buckets`` (see :func:`_pairs_from_banded`)."""
    return _pairs_from_banded(
        band_buckets(signatures, bands, id_col, n_hashes), id_col, salt_buckets
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    parallelism: int | None = None,
    engine: str = "pandas",
    banded: DataFrame | None = None,
    shingles: DataFrame | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: signatures → banded
    candidates → exact-Jaccard verification (no sketch false
    positives survive).

    ``salt_buckets``: salt the banding self-join for viral-cluster
    bucket skew (identical output — see :func:`_pairs_from_banded`).

    ``engine='pandas'`` (default) uses the Arrow-batched UDF kernel
    (:func:`minhash_signatures`).  ``engine='jvm'`` computes the band
    buckets via :func:`band_buckets_jvm` — whole-stage-codegen minwise
    hashing with zero Python workers in the path.  The engines use
    different permutation spaces (61- vs 31-bit), so their CANDIDATE
    sets differ — but the final output is identical whenever both
    achieve full recall at ``threshold`` (verified exact vs all-pairs
    Jaccard at sf0.01/0.1 for both), because the exact-Jaccard verify
    removes every sketch false positive.  Measured trade-off at sf0.1:
    the JVM path's 64-slot aggregate generates a huge Janino compile
    that repeats per AQE stage and dominates a pool of small concurrent
    queries (catalog cold 6.1 s → 11.8 s), while the pandas kernel
    executes in ~0.5 s once workers are warm — so pandas is the default
    for mixed interactive load; prefer 'jvm' for long-running batch
    jobs on clusters where Python worker provisioning is the scarce
    resource (compile is once-per-executor-lifetime there).

    ``parallelism`` (pandas engine only): repartition the corpus before
    the CPU-bound signature stage.  Meant for small/local inputs that
    arrive as a single file split (the md5-per-shingle work then
    serializes on one core); on a real cluster the input's own splits
    already provide parallelism — leave it None and no extra shuffle
    happens.  The JVM engine ignores it: its hash stage is cheap
    enough per core that the post-groupBy shuffle provides all needed
    spread.

    ``banded`` / ``shingles``: pre-materialized (id, band, bucket) band
    buckets and (id, sh) shingle arrays.  A deployment that dedups the
    same corpus repeatedly (the reference's always-on dashboard regime,
    or an incremental 100 TB ingest) should materialize both ONCE —
    e.g. as cached views — and pass them in: a ``.cache()`` buried
    inside this function is re-materialized on every rebuilt plan,
    because the fresh pandas-UDF instance defeats Spark's
    canonicalized-plan cache lookup (measured: this was the whole
    steady-state anomaly in the round-2 bench)."""
    if banded is None:
        if engine == "jvm":
            banded = band_buckets_jvm(df, text_col, id_col, n_hashes, bands, shingle_k).cache()
        else:
            sig_in = df.repartition(parallelism) if parallelism else df
            sigs = minhash_signatures(sig_in, text_col, id_col, n_hashes, shingle_k)
            # cache at the BANDED level, not the signature level: the LSH
            # self-join references both sides, so something must
            # materialize — and (id, band, bucket) is all-primitive,
            # which the columnar cache writes ~4× faster than the
            # array<long> signatures (measured; the nested encoding is
            # per-element).  The signature UDF still runs exactly once.
            banded = band_buckets(sigs, bands, id_col, n_hashes=n_hashes).cache()
    # NB: no .cache() on the candidate pairs even though the verifier
    # references them twice — recomputing the banding join off the
    # cached band buckets costs less than the cache-materialization
    # barrier under concurrent load (measured in the bench pool)
    cands = _pairs_from_banded(banded, id_col, salt_buckets)
    return ngram_jaccard(df, cands, text_col, id_col, shingle_k, shingles=shingles).filter(
        F.col("jaccard") >= threshold
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verifier)
# --------------------------------------------------------------------------


def shingle_array(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as a distinct array — built-in HOFs only."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), " +")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", words))))


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    strategy: str = "prune",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact word-shingle Jaccard for given (id_a, id_b) pairs.

    ``strategy='prune'`` (default): semi-join the corpus down to the
    mentioned ids, shingle once (cached), shuffle-join both sides.
    Executor-side work only — the safe default for a busy cluster.

    ``shingles``: optional pre-materialized (``id_col``, ``sh``) frame
    (e.g. a cached view built with :func:`shingle_array`).  When given,
    the per-call shingle computation AND its per-call ``.cache()`` are
    skipped entirely — the right shape for a corpus verified repeatedly.

    ``strategy='broadcast'``: broadcast the pair list and hash-join the
    raw corpus against it twice — ZERO shuffles (the corpus streams
    map-side through both joins).  Attractive on paper, but each
    broadcast is a driver-side collect + rebroadcast barrier: measured
    under a 16-query concurrent load the driver serialization made it
    ~2× SLOWER than 'prune' (dp05 wall 8.6-11.2 s vs 3.3-5.9 s).  Use
    it for isolated jobs where the corpus scan dominates and the
    driver is idle."""
    if shingles is not None:
        a = shingles.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
        b = shingles.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
        j = pairs.join(a, "id_a").join(b, "id_b")
    elif strategy == "broadcast":
        a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__t_a"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__t_b"))
        j1 = a.join(F.broadcast(pairs.select("id_a", "id_b")), "id_a")
        # j1 is ≤ |pairs| rows (+ matched texts) — broadcast it too, so
        # the corpus streams map-side through BOTH joins
        j = b.join(F.broadcast(j1), "id_b").select(
            "id_a", "id_b",
            shingle_array("__t_a", k).alias("sh_a"),
            shingle_array("__t_b", k).alias("sh_b"),
        )
    else:
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionAll(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        docs = df.join(ids, id_col, "left_semi").select(
            F.col(id_col), shingle_array(text_col, k).alias("sh")
        ).cache()  # shingles feed both the id_a and id_b join sides
        a = docs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
        b = docs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
        j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    return j.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash: token FNV hashes vote per bit; sign of the vote
    sets the bit.  Vectorized per Arrow batch."""

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = []
        bits = np.arange(64, dtype=np.uint64)
        powers = (np.uint64(1) << bits).astype(np.uint64)
        for t in texts:
            tokens = (t or "").lower().split()
            if not tokens:
                out.append(0)
                continue
            h = _hash64(tokens)
            votes = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
            score = (2 * votes - 1).sum(axis=0)
            sig = int(((score > 0).astype(np.uint64) * powers).sum(dtype=np.uint64))
            out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)  # two's-complement long
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), sh(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    signatures: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dups by Hamming distance ≤ d using the pigeonhole band
    trick: split 64 bits into d+1 chunks; any pair within distance d
    agrees exactly on ≥1 chunk → equi-join per chunk, then exact
    Hamming verification via bit_count(xor)."""
    chunks = max_hamming + 1
    width = 64 // chunks
    signatures = signatures.cache()  # referenced by both sides of the self-join
    banded = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk", "c.key")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# embedding cosine near-dups
# --------------------------------------------------------------------------


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two double-array columns via JVM HOFs (no Python
    in the loop; one fused zip_with+aggregate pass)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    na = F.sqrt(dot_product(a, a))
    nb = F.sqrt(dot_product(b, b))
    return F.when((na > 0) & (nb > 0), dot_product(a, b) / (na * nb)).otherwise(F.lit(0.0))


def l2_normalize(vec_col) -> Column:
    """Unit-normalize a vector column (double).  Pre-normalizing once per
    row turns every pairwise cosine into a single dot product — the
    n² stage does 1/3 the arithmetic.  Zero vectors stay zero (their
    cosine with anything is then 0, matching :func:`cosine_sim`)."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Cosine near-dup pairs.  ``block_col`` (e.g. a cluster/label
    column or LSH bucket) bounds the quadratic join; without it this is
    a full O(n²) self-join — correct, but only for modest n or as the
    verification oracle for the LSH path.  Vectors are L2-normalized on
    the linear side so the quadratic side is one dot product per pair.

    NB: ``dot/(|a||b|)`` vs ``dot(â,b̂)`` differ in the last float ulps;
    results are rounded to 6 decimals, absorbing that."""
    docs = emb.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("v"),
        *([F.col(block_col)] if block_col else []),
    )
    l, r = docs.alias("l"), docs.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    if block_col:
        cond = cond & (F.col(f"l.{block_col}") == F.col(f"r.{block_col}"))
    sim = F.round(dot_product(F.col("l.v"), F.col("r.v")), 6)
    return (
        l.join(r, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Block-matrix variant of :func:`embedding_near_dup_pairs`: one
    ``applyInPandas`` per block builds the block's vector matrix and
    scores every pair with a single normalized matmul (BLAS), instead
    of a row-per-pair join.  This is the 100 TB shape — per-block work
    is dense-linear-algebra bound, parallelism = number of blocks, and
    no quadratic row explosion ever hits the shuffle.

    Same rounded-to-6-decimals results as the join variant (BLAS sum
    ordering differs in the last ulps; rounding absorbs it)."""
    import numpy as np
    import pandas as pd

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = np.round(m @ m.T, 6)
        ids = pdf[id_col].to_numpy()
        xi, yi = np.triu_indices(len(ids), k=1)  # ids sorted → id_a < id_b
        s = sims[xi, yi]
        mask = s >= threshold
        return pd.DataFrame(
            {"id_a": ids[xi[mask]], "id_b": ids[yi[mask]], "cos_sim": s[mask]}
        )

    return emb.select(F.col(id_col), F.col(vec_col), F.col(block_col)).groupBy(
        block_col
    ).applyInPandas(score, schema="id_a long, id_b long, cos_sim double")


# --------------------------------------------------------------------------
# dedup clusters (connected components over near-dup pairs)
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster near-dup PAIRS into components — the step between pair
    detection and canonical-document selection: keeping one doc per
    *pair* under-deletes (a~b, b~c leaves b and c), so real dedup keys
    on the component.  Output: (``doc_id``, ``cluster_id``) for every
    id mentioned in ``pairs``, where ``cluster_id`` is the component's
    minimum id — deterministic, layout-independent.

    Algorithm: min-label propagation.  Each round every node takes the
    minimum label among itself and its neighbors (one equi-join + one
    min-aggregate per round, both map-side combinable); converges in
    ``diameter`` rounds.  Near-dup components are overwhelmingly small
    and dense (diameter ≲ 4), so this beats the log-n star-contraction
    variants that pay extra shuffles per round to handle long chains.
    Each round ``localCheckpoint``s the labels: iterative plans
    otherwise stack lineage and replan the whole history every round.

    Scale shape per round (r16/r17, guide §2.1/§3.2): ONE job — the
    neighbor-min join (shuffled-hash: edges are repartitioned on
    ``dst`` once and PERSISTED, so the cached partitioning satisfies
    the join's distribution and only the labels side exchanges; no
    per-round sort) plus the min agg, whose exact total Σ comp doubles
    as the convergence probe.  Labels are monotone non-increasing (``new =
    min(old, neighbor mins) ≤ old``), so the sum is unchanged iff NO
    label changed — the previous per-round labels⋈labels existence
    probe was a second full join job per round.  The sum is computed
    over decimal(38,0), exact for ≥10^10 nodes of any long id."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # r17: edges are PERSISTED, not localCheckpoint-ed — a checkpoint
    # comes back as an ExistingRDD with UnknownPartitioning, so every
    # round's join silently re-exchanged the (large) edge table on dst
    # (the r17 iteration plan capture showed the Exchange the r16 notes
    # claimed was gone).  An InMemoryRelation keeps the repartition's
    # hashpartitioning(dst), so the per-round join plans with NO edge
    # exchange: only the (small) labels side moves.  Edge lineage is
    # constant-size (unlike labels', which grows per round and stays
    # checkpointed), so per-round replanning stays O(1).
    # (Measured and REJECTED at r17: materializing the symmetric edge
    # set once to COUNT it and derive an adaptive partition count —
    # the extra persist+count pass cost more at bench scale than the
    # smaller per-round stages saved (2.41 → 2.65 s median), and at
    # 100 TB it is a full extra pass over the edge table.  AQE cannot
    # re-coalesce a cached plan's output partitioning, so the cached
    # `repartition("dst")` keeps `spark.sql.shuffle.partitions` — which
    # IS the scale-appropriate knob: it derives from the session's
    # parallelism, not from a constant here.)
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("dst")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"),
                       edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), F.col("comp"))
        )
        # lazy checkpoint: the sum action below both MATERIALIZES this
        # round's label blocks and returns the convergence probe — one
        # job per round where eager checkpoint + separate sum were two.
        new_labels = (
            labels.unionAll(neighbor_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()  # labels are checkpointed; the result no longer needs edges
    if not converged:
        # Partially-propagated labels would silently split one true
        # component into several cluster_ids and make the caller
        # UNDER-delete near-dups — fail loudly instead.  Diameter >
        # max_iterations is pathological for near-dup graphs (dense,
        # tiny components); a long chain topology needs a bigger budget.
        raise RuntimeError(
            f"connected_components: labels still changing after "
            f"{max_iterations} rounds — component diameter exceeds the "
            f"iteration budget; raise max_iterations"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id"))


def incremental_minhash_near_dups(
    new_docs: DataFrame,
    history_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    new_banded: DataFrame | None = None,
    history_banded: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup detection of a NEW ingest batch against an
    already-sketched corpus — the MinHash analogue of
    :func:`incremental_exact_dedup`: the historical corpus is never
    re-shingled, only its persisted (id, band, bucket) sketch table is
    probed.

    Candidates come from ``new_bands ⋈ history_bands`` on
    (band, bucket) — an equi-join whose left side is batch-sized, so at
    100 TB the probe cost is O(|batch| × bands) lookups against a
    bucketed sketch table, independent of corpus size.  Candidates are
    then exact-Jaccard verified (both sides' shingles needed — pass a
    persisted ``shingles`` table to avoid re-shingling history).

    Output: (``id_a`` = new id, ``id_b`` = historical id, ``jaccard``)
    for verified pairs ≥ ``threshold``.  Within-batch duplicates are a
    separate (intra-batch) :func:`minhash_near_dups` call — keeping the
    two concerns split lets the batch pipeline run both against the
    same freshly-computed batch sketch."""
    if new_banded is None:
        new_banded = band_buckets(
            minhash_signatures(new_docs, text_col, id_col, n_hashes, shingle_k),
            bands, id_col, n_hashes=n_hashes,
        )
    if history_banded is None:
        history_banded = band_buckets(
            minhash_signatures(history_docs, text_col, id_col, n_hashes, shingle_k),
            bands, id_col, n_hashes=n_hashes,
        )
    n = new_banded.alias("n")
    h = history_banded.alias("h")
    cands = (
        n.join(
            h,
            (F.col("n.band") == F.col("h.band"))
            & (F.col("n.bucket") == F.col("h.bucket")),
        )
        .select(
            F.col(f"n.{id_col}").alias("id_a"), F.col(f"h.{id_col}").alias("id_b")
        )
        .distinct()
    )
    corpus = new_docs.select(id_col, text_col).unionAll(
        history_docs.select(id_col, text_col)
    )
    return ngram_jaccard(corpus, cands, text_col, id_col, shingle_k, shingles=shingles).filter(
        F.col("jaccard") >= threshold
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    shingles: DataFrame | None = None,
    eval_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination — the standard eval-overlap gate every
    serious pretraining pipeline runs (n-gram collision against held-out
    benchmarks, as published for GPT-3/PaLM/Llama data work): flag each
    training document that shares at least one word ``shingle_k``-gram
    with any eval/benchmark document.

    Output: (``id_col``, ``n_shared`` distinct shared shingles,
    ``contaminated`` boolean) for EVERY input doc — callers drop or
    quarantine the flagged rows.

    Scale shape: the benchmark side is tiny by definition, so its
    distinct shingle set BROADCASTS; the corpus side is one narrow
    projection + explode + broadcast hash join — the 100 TB corpus
    never shuffles.  Only the (small) matched rows aggregate, and the
    per-doc hit counts join back onto the id spine (broadcast only
    when AQE measures them small — they are corpus-sized in the
    boilerplate-heavy worst case).  Exactly the
    asymmetric-cardinality shape as :func:`incremental_minhash_near_dups`
    but with a membership probe instead of a sketch probe.

    ``shingles`` / ``eval_shingles``: optional pre-materialized
    (``id_col``, ``sh``) frames (e.g. the cached ``doc_shingles`` view)
    — shingling is the dominant cost (interpreted HOFs over every
    token), so a deployment gating every ingest batch should shingle
    once and pass the views (the dp05/dp17 pattern; measured 3.9 s →
    1.0 s at sf0.1).  When given, ``shingles`` must be keyed by the
    same ids as ``docs`` (it is semi-joined down to them)."""
    if eval_shingles is not None:
        ev_src = eval_shingles.join(
            eval_docs.select(id_col), id_col, "left_semi"
        ).select(F.explode("sh").alias("tk"))
    else:
        ev_src = eval_docs.select(
            F.explode(shingle_array(text_col, shingle_k)).alias("tk")
        )
    ev = ev_src.distinct()
    if shingles is not None:
        d_sh = shingles.join(docs.select(id_col), id_col, "left_semi").select(
            F.col(id_col), F.explode("sh").alias("tk")
        )
    else:
        d_sh = docs.select(
            F.col(id_col), F.explode(shingle_array(text_col, shingle_k)).alias("tk")
        )
    # shingle_array is already distinct per doc → count == distinct count
    hits = (
        d_sh.join(F.broadcast(ev), "tk")
        .groupBy(id_col)
        .agg(F.count("tk").alias("n_shared"))
    )
    # NO broadcast hint on hits: its cardinality is one row per
    # contaminated doc, which on a boilerplate-heavy corpus (or an eval
    # set with common n-grams) is corpus-sized — AQE broadcasts it when
    # it is actually small
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------------------------
# duplicate-passage removal (C4-style span dedup / boilerplate strip)
# --------------------------------------------------------------------------


def _passage_array(text_col: str, window_words: int):
    """Array of non-overlapping ``window_words``-word passages of a
    single-space-tokenized text column — the shared unit of
    :func:`passage_dedup` (cross-document) and
    :func:`self_passage_dedup` (within-document).  Pure codegen:
    split → windowed slice/array_join inside transform(sequence)."""
    w = int(window_words)
    ws = F.split(F.col(text_col), " ")
    n_total = F.ceil(F.size(ws) / F.lit(w)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_total - 1),
        lambda g: F.array_join(F.slice(ws, g * w + 1, F.lit(w)), " "),
    ), n_total


def passage_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 20,
    max_docs: int = 1,
) -> DataFrame:
    """Sub-document exact dedup: remove every PASSAGE (non-overlapping
    window of ``window_words`` whitespace tokens) whose exact text
    occurs in more than ``max_docs`` distinct documents, then reassemble
    each document from its surviving passages in order.  This is the
    span-granular step of the C4 cleanup (Raffel et al. 2020 discard
    repeated three-sentence spans) and CCNet's paragraph dedup — it
    strips boilerplate (navigation chrome, license headers, templated
    intros) that document-level dedup (:func:`exact_dedup`,
    :func:`minhash_near_dups`) cannot touch because the *documents*
    differ.

    Output: one row per input document —
    ``(id_col, clean_text, n_kept int, n_removed int)``.

    Plan shape (all JVM codegen, no UDF):

    1. ``split`` + windowed ``slice``/``array_join`` inside a
       ``transform(sequence(...))`` → ``posexplode`` = one narrow pass
       producing (doc, window_index, passage).
    2. the duplicate set = distinct(passage, doc) → count per passage
       (two hash aggregations, both map-side combinable) — the dp09
       two-level pattern instead of a count-distinct expand.
    3. one left-anti equi-join of passages against the duplicate set.
    4. reassembly = groupBy(doc) with ``array_sort(collect_list(
       struct(win, passage)))`` — group size is one document, the
       natural memory unit of every operator in this family.

    At 100 TB the shuffle payload is the passage text itself (exact
    semantics).  A deployment that accepts 64-bit-collision risk can
    shuffle ``xxhash64(passage)`` instead and shrink shuffle bytes ~5×;
    exactness is kept here because a false bucket-collision would
    silently delete a non-duplicate passage from every document."""
    parr, n_total = _passage_array(text_col, window_words)
    passages = docs.select(
        F.col(id_col), F.posexplode(parr).alias("win", "passage")
    )
    dup = (
        passages.select("passage", id_col)
        .distinct()
        .groupBy("passage")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") > max_docs)
        .select("passage")
    )
    kept = passages.join(dup, "passage", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("win", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("n_kept"),
    )
    return (
        docs.select(F.col(id_col), n_total.alias("n_total"))
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def self_passage_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 20,
) -> DataFrame:
    """WITHIN-document duplicate-passage removal: keep only the first
    occurrence of each exact ``window_words``-word passage inside a
    document (templated scrapes repeat their own chrome — headers,
    cookie banners — many times per page; :func:`passage_dedup` only
    removes passages repeated ACROSS documents).  Complements
    :func:`..text.repetition_profile`, which measures self-repetition;
    this removes it.

    Entirely per-document, so the plan is a single narrow codegen
    projection — ZERO shuffles, embarrassingly parallel at any scale:
    the passage array, the first-occurrence filter
    (``array_position(p, x) == i+1``), and the reassembly all happen
    inside one whole-stage-codegen pass.  The first-occurrence scan is
    O(passages²) per document, but passages-per-document is bounded by
    document length, not corpus size.

    Output matches :func:`passage_dedup`:
    ``(id_col, clean_text, n_kept int, n_removed int)``."""
    parr, _ = _passage_array(text_col, window_words)
    step = docs.select(F.col(id_col), parr.alias("__p"))
    kept = F.filter(
        F.col("__p"), lambda x, i: F.array_position(F.col("__p"), x) == i + 1
    )
    return step.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("int").alias("n_kept"),
        (F.size("__p") - F.size(kept)).cast("int").alias("n_removed"),
    )


# --------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster-then-pairwise over embeddings)
# --------------------------------------------------------------------------


def semantic_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest centroid,
    then compare pairs ONLY within a cluster — the quadratic work is
    bounded per cluster, never corpus-wide.

    Output: (``id_a``, ``id_b``, ``cos_sim``) with id_a < id_b and
    rounded-to-6 cosine ≥ threshold, exactly the
    :func:`embedding_near_dup_pairs` shape, so downstream clustering /
    keep-min policies compose unchanged.

    Scale shape: centroid assignment is the zero-shuffle BLAS argmax
    (:func:`.similarity.assign_cells`); the per-cluster pairwise pass
    is one BLAS matmul per cluster (:func:`embedding_near_dup_pairs_blocked`
    on the cell key).  At 100 TB the cluster count comes from an
    offline k-means fit (:func:`.similarity.train_ivf_centroids`) sized
    so clusters stay small (the paper uses ~100k clusters for
    LAION-scale corpora); the deterministic sample default keeps the
    whole path SQL-reproducible for the correctness oracle.  Like the
    paper's method this trades recall for tractability: a pair split
    across two clusters is not compared (the LSH families dp05/dp06
    are the recall-bounded alternatives)."""
    from .similarity import assign_cells, sample_centroids

    cents = (
        centroids.select("cell", "cent")
        if centroids is not None
        else sample_centroids(emb, n_cells, id_col, vec_col)
    )
    assigned = assign_cells(emb, cents, id_col, vec_col)
    return embedding_near_dup_pairs_blocked(
        assigned, threshold, block_col="cell", id_col=id_col, vec_col="cv"
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-id semantic-dedup verdicts: ``(id_col, cluster_id, keep)``
    where ``cluster_id`` is the connected-component canonical (minimum
    id) over the :func:`semantic_near_dup_pairs` graph and ``keep`` is
    true for exactly one representative per component (the minimum id —
    the same keep policy as :func:`curate_corpus`'s near-dup stage).
    Ids with no near-dup neighbor keep themselves."""
    pairs = semantic_near_dup_pairs(
        emb, threshold, n_cells, id_col, vec_col, centroids
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    return (
        emb.select(F.col(id_col))
        .join(comps.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )
