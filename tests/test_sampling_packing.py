"""Deterministic sampling / sequence packing / vocabulary stats
(datapipe.sampling, datapipe.packing, text.term_stats).

Oracle parity for the catalog entries dp07-dp10 runs in
test_parity_catalog.py; these tests pin the operator *invariants* the
oracle compare can't express (nesting, quotas, offset arithmetic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe.packing import (
    pack_sequences,
    pack_summary,
)
from transaq_clickhouse_exporter_spark.datapipe.sampling import (
    hash_sample,
    stratified_sample,
)
from transaq_clickhouse_exporter_spark.datapipe.text import term_stats, ws_token_count
from transaq_clickhouse_exporter_spark.testdata import register_views

BUDGET = 512


@pytest.fixture(scope="module")
def docs(spark, sf_t2):
    register_views(spark, sf_t2)
    return spark.table("documents")


def test_hash_sample_nested_and_stable(spark, docs):
    small = {r.doc_id for r in hash_sample(docs, "doc_id", "0ccc").select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", "1999").select("doc_id").collect()}
    assert small <= big  # growing the threshold only adds documents
    n = docs.count()
    # ~5% / ~10% with generous tolerance (500 docs → wide binomial)
    assert 0.01 * n < len(small) < 0.12 * n
    assert 0.04 * n < len(big) < 0.20 * n
    again = {r.doc_id for r in hash_sample(docs, "doc_id", "1999").select("doc_id").collect()}
    assert big == again  # content-stable: same rows every run
    # membership survives arbitrary re-partitioning of the input
    reshard = {
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", "1999").select("doc_id").collect()
    }
    assert big == reshard


def test_hash_sample_rejects_bad_threshold(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", "xyz")


def test_stratified_sample_quota_and_ranks(docs):
    out = stratified_sample(docs.select("doc_id", "lang"), ["lang"], 7, "doc_id")
    per = out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("sample_rank").alias("ranks")
    )
    for row in per.collect():
        assert row.n <= 7
        assert sorted(row.ranks) == list(range(1, row.n + 1))  # contiguous from 1
    # full strata (≥7 docs) hit the quota exactly
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.lang: r.n for r in per.collect()}
    for lang, n in sizes.items():
        assert got[lang] == min(7, n)


def test_stratified_prefilter_subsets_the_hash_sample(docs):
    thinned = stratified_sample(
        docs.select("doc_id", "lang"), ["lang"], 5, "doc_id", prefilter_hex4="8000"
    )
    allowed = {r.doc_id for r in hash_sample(docs, "doc_id", "8000").select("doc_id").collect()}
    assert {r.doc_id for r in thinned.collect()} <= allowed


def test_pack_sequences_offset_arithmetic(spark, docs):
    toks = docs.select("doc_id", ws_token_count("text").alias("n_tok"))
    packed = pack_sequences(toks, "doc_id", "n_tok", budget=BUDGET, n_buckets=16).cache()
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in toks.collect()}  # no loss
    assert all(0 <= r.offset_in_seq < BUDGET for r in rows)
    assert all(0 <= r.bucket < 16 for r in rows)
    # replay each bucket's tape in order: cum_before must be the exact
    # running sum, seq/offset its integer div/mod
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    import hashlib

    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
        cum = 0
        for r in rs:
            assert r.cum_before == cum
            assert r.seq_in_bucket == cum // BUDGET
            assert r.offset_in_seq == cum % BUDGET
            cum += r.n_tok
    summary = pack_summary(packed, "n_tok")
    tot = summary.agg(F.sum("sum_tokens").alias("t"), F.sum("n_docs").alias("d")).first()
    assert tot.t == sum(r.n_tok for r in rows) and tot.d == len(rows)
    # every first sequence of a bucket starts the tape at offset zero
    firsts = summary.filter((F.col("seq_in_bucket") == 0)).collect()
    assert all(r.first_offset == 0 for r in firsts)
    packed.unpersist()


def test_pack_sequences_bucket_count_validation(docs):
    toks = docs.select("doc_id", ws_token_count("text").alias("n_tok"))
    with pytest.raises(ValueError):
        pack_sequences(toks, "doc_id", "n_tok", budget=BUDGET, n_buckets=5)
    # n_buckets=4 groups 4 hex digits per bucket
    packed = pack_sequences(toks, "doc_id", "n_tok", budget=BUDGET, n_buckets=4)
    assert packed.select(F.max("bucket")).first()[0] <= 3


def test_term_stats_literal(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "THE cat!"), (3, "dog...dog dog")],
        ["doc_id", "text"],
    )
    out = {r.token: (r.doc_freq, r.term_freq) for r in term_stats(df).collect()}
    assert out == {"the": (2, 2), "cat": (2, 2), "dog": (1, 3), "sat": (1, 1)}
    top1 = term_stats(df, top_n=1).collect()
    assert len(top1) == 1 and top1[0].token in ("cat", "the")


def test_rolling_fingerprint_polynomial(spark):
    from transaq_clickhouse_exporter_spark.datapipe.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "ab"), (4, "A b!")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.fp for r in df.select("doc_id", rolling_fingerprint("text").alias("fp")).collect()}
    # hand-computed: 'a'=97; 'ab' = 97*131+98; 'A b!' normalizes to 'ab'
    assert got == {1: 97, 2: 0, 3: 97 * 131 + 98, 4: 97 * 131 + 98}
    # incremental extension property: fp(s + t) = fp(s)*B^|t| + fp(t) mod p
    p, B = 1_000_000_007, 131
    s_, t_ = "hello", "world"
    fp = lambda txt: {r.fp for r in spark.createDataFrame([(txt,)], ["text"]).select(rolling_fingerprint("text").alias("fp")).collect()}.pop()
    assert fp(s_ + t_) == (fp(s_) * pow(B, len(t_), p) + fp(t_)) % p


def test_assign_split_stable_and_proportional(spark, docs):
    from transaq_clickhouse_exporter_spark.datapipe.sampling import assign_split

    out = assign_split(docs.select("doc_id"), "doc_id")
    by = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert set(by) <= {"train", "val", "test"} and by["train"] > 0.9 * n
    # contamination-proofness: membership is identical when computed on
    # any subset of the corpus (dataset v2 never flips a v1 assignment)
    subset = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    sub = {r.doc_id: r.split for r in assign_split(subset, "doc_id").collect()}
    full = {r.doc_id: r.split for r in assign_split(docs.select("doc_id"), "doc_id").collect()}
    assert all(full[d] == s for d, s in sub.items())
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", (("a", 0.5), ("b", 0.4)))


def test_mixture_weights_temperature(spark):
    from transaq_clickhouse_exporter_spark.datapipe.sampling import mixture_weights

    rows = [(i, "big", 100) for i in range(9)] + [(9, "small", 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # alpha=1: proportional (900 vs 100 -> 0.9/0.1)
    w1 = {r.source: r.weight for r in mixture_weights(df, ("source",), "n_chars", 1.0).collect()}
    assert w1 == {"big": 0.9, "small": 0.1}
    # alpha=0: uniform regardless of size
    w0 = {r.source: r.weight for r in mixture_weights(df, ("source",), "n_chars", 0.0).collect()}
    assert w0 == {"big": 0.5, "small": 0.5}
    # alpha=0.5: sqrt scaling upweights the small source (exact: 3/4, 1/4)
    wh = {r.source: r.weight for r in mixture_weights(df, ("source",), "n_chars", 0.5).collect()}
    assert wh == {"big": 0.75, "small": 0.25}
    out = mixture_weights(df, ("source",), "n_chars", 0.5).collect()
    assert {(r.source, r.n_docs, r.n_units) for r in out} == {("big", 9, 900), ("small", 1, 100)}


def test_mixture_weights_invariants(spark):
    """Weights are a probability vector at every alpha, and raising
    alpha moves mass toward big sources (the temperature dial)."""
    from transaq_clickhouse_exporter_spark.datapipe.sampling import mixture_weights

    sizes = {"a": 1, "b": 7, "c": 50, "d": 400, "e": 3000}
    rows = [(f"{s}{i}", s, n) for s, n in sizes.items() for i in range(1)]
    df = spark.createDataFrame(
        [(i, s, n) for i, (_, s, n) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    prev_max = 0.0
    for alpha in (0.0, 0.3, 0.7, 1.0):
        w = {r.source: r.weight for r in mixture_weights(df, ("source",), "n_chars", alpha).collect()}
        assert abs(sum(w.values()) - 1.0) < 5e-6
        assert all(v > 0 for v in w.values())
        # ordering follows size at every positive alpha
        if alpha > 0:
            assert w["e"] > w["d"] > w["c"] > w["b"] > w["a"]
        assert max(w.values()) >= prev_max  # skew grows with alpha
        prev_max = max(w.values())


def test_diversity_sample_quota_and_determinism(spark, sf_smoke):
    from transaq_clickhouse_exporter_spark.datapipe.sampling import (
        diversity_sample,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = diversity_sample(emb, per_cell=4, n_cells=8).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r.sample_rank)
    assert by_cell and all(len(v) <= 4 for v in by_cell.values())
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_cell.values())
    # content-stable: identical selection regardless of layout
    again = diversity_sample(emb.repartition(7), per_cell=4, n_cells=8).collect()
    assert sorted((r.vec_id, r.cell, r.sample_rank) for r in out) == \
        sorted((r.vec_id, r.cell, r.sample_rank) for r in again)
    # every cell that has members is represented (diversity holds)
    from transaq_clickhouse_exporter_spark.datapipe.similarity import (
        assign_cells,
        sample_centroids,
    )

    cells_all = {
        r.cell
        for r in assign_cells(emb, sample_centroids(emb, 8)).select("cell").distinct().collect()
    }
    assert set(by_cell) == cells_all


def test_stratified_prefilter_identical_and_narrow(spark):
    """Round-9 rehearsal shape (SCALE.md): dp33's quota stage with a
    corpus-dominating hot cell.  A prefilter_hex4 that keeps >= quota
    survivors in EVERY stratum selects bit-identical rows (md5-asc
    rank: the winners all sit far below any viable threshold) while
    thinning the hot reducer's sort input BEFORE the exchange —
    measured 3.4 s -> 1.0 s at 10M rows / 80% hot cell in
    tools/scale_rehearsal_round9.py."""
    # 4k rows, cell 0 holds 75%; quota 20, threshold 1/2 ("8000"):
    # smallest stratum ~333 rows -> ~166 expected survivors >= 8x quota
    asg = spark.range(4000).select(
        F.col("id").cast("string").alias("vec_id"),
        F.when(F.col("id") < 3000, F.lit(0))
        .otherwise((F.col("id") % 3 + 1))
        .cast("int")
        .alias("cell"),
    )
    a = stratified_sample(asg, ["cell"], 20, "vec_id", None)
    b = stratified_sample(asg, ["cell"], 20, "vec_id", "8000")
    assert a.count() == 80
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the pre-thin is a narrow filter below the window's exchange: the
    # md5-prefix predicate must sit on the scan side, not post-shuffle
    plan = b._jdf.queryExecution().executedPlan().toString()
    fpos = plan.find("md5")
    xpos = plan.find("Exchange")
    assert fpos >= 0 and xpos >= 0
    # executedPlan prints top-down: the Exchange node appears ABOVE
    # (before) its child filter in the dump
    assert xpos < fpos, "prefilter must be under the exchange"
