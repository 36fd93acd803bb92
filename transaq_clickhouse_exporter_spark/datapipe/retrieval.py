"""Chunk-level retrieval indexing — the RAG / eval-retrieval side of
the training-data pipeline: split documents into overlapping chunks
(:mod:`.chunking`), embed each chunk, search queries against the chunk
index, and max-pool chunk hits back to document hits.

The embedder is a **pluggable seam**, the same pattern as
:mod:`.scoring`'s quality classifier and :mod:`.multimodal`'s codec:
the Spark-side plumbing (chunk grid, embedding column, broadcast
query join, chunk→doc pooling) is real and tested; a deployment drops
in a real model via ``batch_embedder`` (Arrow-batched ``mapInPandas``
— model inference is embarrassingly parallel per batch, zero
shuffle).  The built-in ``'hashed'`` embedder is a deterministic
signed bag-of-hashed-words projection — NOT a semantic model, but a
pure whole-stage-codegen expression that is bit-reproducible in SQL,
so the whole index+search pipeline is oracle-checkable end to end
(the :mod:`.scoring` discipline).

Plan shape at 100 TB: chunking + embedding are narrow map-side work;
search broadcasts the (small) query set against the chunk index, so
the corpus never shuffles for the join — only the (query_id, doc_id)
max-pool and the per-query top-k aggregate move data, both map-side
combinable.  For corpora where brute force is too hot, the same index
feeds :mod:`.similarity`'s LSH / IVF bucketed paths unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .chunking import chunk_documents
from .dedup import dot_product, l2_normalize


def hashed_embedding(text_col: Column, dim: int = 16) -> Column:
    """Deterministic signed bag-of-hashed-words embedding, SQL-portable:
    token ``t`` adds ±1 (sign from md5 hex 9..10) to dimension
    ``conv(md5(t)[1..8], 16, 10) % dim``; component ``dim`` (one past
    the hashed range) is a constant 1 bias so no vector has zero norm
    (cosine stays defined in every engine).  All JVM-side higher-order
    functions — zero Python in the hot path."""
    toks = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    # hash each token ONCE (md5 is the per-token cost; the per-dim
    # pass below must not re-derive it dim× per token), then reduce
    # (d, s) pairs per dimension — O(n·dim) cheap adds, O(n) hashes
    tok_ds = F.transform(
        F.transform(toks, lambda t: F.md5(t)),
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % dim).alias("d"),
            F.when(
                F.conv(F.substring(h, 9, 2), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)).alias("s"),
        ),
    )
    # ONE aggregate pass with an array accumulator.  NOT one aggregate
    # per dimension: CollapseProject re-inlines `tok_ds` into every
    # per-dim lambda, recomputing the md5 pass dim× — measured 75 s vs
    # 7.7 s for this form on a 69k-chunk corpus (tools/
    # scale_rehearsal_round6s5.py's shape).  ±1 contributions commute
    # exactly (integer sums), so accumulation order is value-neutral.
    body = F.aggregate(
        tok_ds,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, e: F.transform(
            acc, lambda v, i: v + F.when(e["d"] == i, e["s"]).otherwise(F.lit(0.0))
        ),
    )
    return F.concat(body, F.array(F.lit(1.0)))


def build_chunk_index(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_embedder=None,
    keep_text: bool = False,
) -> DataFrame:
    """Chunk + embed: ``(id_col, chunk_idx, n_tok, embedding[, chunk_text])``.

    ``batch_embedder``: ``Callable[[list[str]], np.ndarray (n, d)]`` —
    the real-model hook, run through Arrow-batched ``mapInPandas``;
    default is the SQL-portable hashed embedder."""
    chunks = chunk_documents(docs, size=size, stride=stride, text_col=text_col, id_col=id_col)
    if batch_embedder is None:
        out = chunks.withColumn(
            "embedding", hashed_embedding(F.col("chunk_text"), dim)
        )
    else:
        import pandas as pd

        def run(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                vecs = batch_embedder(pdf["chunk_text"].tolist())
                pdf = pdf.copy()
                pdf["embedding"] = [list(map(float, v)) for v in vecs]
                yield pdf

        out = chunks.mapInPandas(
            run,
            schema=f"{id_col} long, chunk_idx int, start_tok int, n_tok int, "
            "chunk_text string, embedding array<double>",
        )
    cols = [id_col, "chunk_idx", "n_tok", "embedding"]
    if keep_text:
        cols.insert(3, "chunk_text")
    return out.select(*cols)


def doc_search(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the chunk index, max-pooling chunk similarity per
    document: ``(query_id, doc_id, best_sim, rank)``, top ``k``
    documents per query by best-matching chunk (ties → doc_id asc).

    The query side is broadcast (|queries| ≪ |index|): the index never
    shuffles for the scoring pass; the max-pool and top-k are ordinary
    partial-aggregating shuffles of (query, doc) rows."""
    c = index.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col), l2_normalize(F.col(vec_col)).alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(dot_product(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    pooled = scored.groupBy(query_id_col, id_col).agg(
        F.max("cos_sim").alias("best_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("best_sim"), F.col(id_col))
    return (
        pooled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "best_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )
