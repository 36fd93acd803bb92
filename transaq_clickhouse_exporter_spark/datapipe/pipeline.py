"""Composed corpus-curation pipeline: the end-to-end shape a training
-data run takes at 100 TB — profile → quality gate → exact dedup →
near-dup removal — with each stage an operator from this package.

Stage order is the cost order: cheap codegen'd profiling prunes first,
exact hash dedup collapses identical content with one shuffle, and only
the survivors pay for MinHash signatures and the banded LSH join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, exact_dedup, minhash_near_dups
from .text import profile_documents


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.7,
    transitive: bool = True,
) -> DataFrame:
    """Returns the curated corpus: original columns + profile columns,
    minus low-quality docs, exact duplicates (smallest id survives), and
    near-duplicates.

    ``transitive=True`` (default) removes near-dups per CONNECTED
    COMPONENT of the verified pair graph, keeping each cluster's
    minimum id — the standard corpus-dedup semantics (a chain a~b~c
    keeps only a).  ``transitive=False`` drops only the larger id of
    each direct pair, which can keep several "local minima" per
    cluster — docs that are near-dups only transitively."""
    profile = profile_documents(df, text_col, id_col)
    docs = df.join(profile, id_col)
    docs = docs.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens_ws") >= min_tokens)
    )

    keep_exact = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    docs = docs.join(keep_exact, id_col, "left_semi")

    near = minhash_near_dups(docs, text_col, id_col, threshold=near_dup_threshold)
    if transitive:
        comps = connected_components(near.select("id_a", "id_b"))
        drop_near = comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        drop_near = near.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(drop_near, id_col, "left_anti")


def training_data_job(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 2048,
    near_dup_threshold: float = 0.7,
    gate_kwargs: dict | None = None,
    eval_docs: DataFrame | None = None,
    min_model_score: float | None = None,
    model_scorer=None,
) -> dict[str, DataFrame]:
    """The whole training-data run as one composition — what a 100 TB
    pipeline executes end-to-end, each stage an operator from this
    package, ordered by cost so cheap gates prune before expensive
    stages run:

    1. rule gate (:func:`..text.curation_filter` — narrow codegen scan)
    2. benchmark decontamination (:func:`..dedup.decontaminate`,
       broadcast probe — only when ``eval_docs`` is given)
    3. model-quality gate (:mod:`.scoring` — the pluggable classifier
       seam; only when ``min_model_score`` is given, rejects get
       ``fail_reason='model_score'``)
    4. exact + transitive near-dup removal (:func:`curate_corpus`)
    5. contamination-proof split assignment (no shuffle)
    6. token counting + sequence packing (bucketed window)

    Returns the output tables a run materializes: ``curated`` (survivor
    docs + profile + split + packing coordinates), ``summary``
    (per-split doc/token totals), and ``rejects`` (doc_id +
    fail_reason, for curation telemetry — decontaminated docs appear
    as ``fail_reason='eval_overlap'``)."""
    from .dedup import decontaminate
    from .packing import pack_sequences
    from .sampling import assign_split
    from .text import curation_filter, ws_token_count

    gate = curation_filter(df, text_col, id_col, **(gate_kwargs or {}))
    rejects = gate.filter(~F.col("keep")).select(id_col, "fail_reason")
    passed = df.join(gate.filter(F.col("keep")).select(id_col), id_col, "left_semi")

    if eval_docs is not None:
        flags = decontaminate(passed, eval_docs, text_col, id_col)
        rejects = rejects.unionAll(
            flags.filter(F.col("contaminated"))
            .select(id_col, F.lit("eval_overlap").alias("fail_reason"))
        )
        passed = passed.join(
            flags.filter(~F.col("contaminated")).select(id_col), id_col, "left_semi"
        )

    if min_model_score is not None:
        from .scoring import score_documents

        if model_scorer is None:
            # deleting documents on the md5 stand-in scorer must be an
            # explicit choice, never a silent default
            raise ValueError(
                "min_model_score requires model_scorer (a batch callable; "
                "pass scoring.SCORERS['fake'] explicitly for tests)"
            )
        scored = score_documents(
            passed, text_col, id_col,
            batch_scorer=model_scorer, threshold=min_model_score,
        )
        rejects = rejects.unionAll(
            scored.filter(~F.col("keep"))
            .select(id_col, F.lit("model_score").alias("fail_reason"))
        )
        passed = passed.join(
            scored.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )

    curated = curate_corpus(
        passed, text_col, id_col, near_dup_threshold=near_dup_threshold
    )
    curated = assign_split(curated, id_col)
    curated = curated.withColumn("n_tokens", ws_token_count(text_col))
    # Pack WITHIN each split (partition_cols): a sequence that straddled
    # train/val/test would leak held-out tokens into the training tape
    # and double-count in the per-split summary below.
    curated = pack_sequences(
        curated, id_col, "n_tokens", budget=token_budget,
        partition_cols=("split",),
    )

    summary = curated.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("bucket", "seq_in_bucket").alias("n_sequences"),
    )
    return {"curated": curated, "summary": summary, "rejects": rejects}


def export_training_run(
    outputs: dict[str, DataFrame],
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Materialize a :func:`training_data_job` result as the on-disk
    artifact a trainer consumes — the last mile of the pipeline:

    - ``path/data/split=…/shard=K/`` — curated docs in deterministic
      one-file-per-shard layout with a verified manifest
      (:func:`.shards.write_training_shards`; ``n_tokens`` from the
      packing stage rides along as the manifest token count);
    - ``path/summary`` and ``path/rejects`` — the run's telemetry
      tables (tiny; coalesced to one file each).

    Returns the shard manifest.  Sharding is content-stable, so an
    identical re-run reproduces the manifest bit-for-bit — the test
    harness (and a production resume) asserts exactly that."""
    import os

    from .shards import write_training_shards

    manifest = write_training_shards(
        outputs["curated"],
        os.path.join(path, "data"),
        id_col,
        n_shards,
        token_col="n_tokens",
        split_col="split",
    )
    outputs["summary"].coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "summary")
    )
    outputs["rejects"].coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "rejects")
    )
    return manifest
