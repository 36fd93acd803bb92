"""Datapipe operators: dedup families, similarity search, text
analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe import dedup as dd
from transaq_clickhouse_exporter_spark.datapipe import multimodal as mm
from transaq_clickhouse_exporter_spark.datapipe import similarity as sim
from transaq_clickhouse_exporter_spark.datapipe import text as dtx

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food and water"
)
NEAR = BASE.replace("green", "dark")  # one word differs
FAR = "completely different content about spark query engines and columnar execution at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE.upper() + "!!!")]  # 4 ≙ 1 after normalize
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_exact_dedup_normalized(spark, docs):
    out = dd.exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # doc 4 collapses into doc 1
    assert groups[2] == 1 and groups[3] == 1


def test_minhash_lsh_near_dups(spark, docs):
    out = dd.minhash_near_dups(docs.filter("doc_id <= 3"), threshold=0.5)
    found = _pairs(out)
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}[(1, 2)]
    # exact Jaccard golden: 25 words → 23 distinct 3-shingles each;
    # 'green'→'dark' breaks 3 shingles → inter=20, union=26
    assert abs(j - 20 / 26) < 1e-9


def test_minhash_jvm_engine_matches_pandas(spark, docs, sf_smoke):
    """The 31-bit JVM permutation path and the pandas kernel use
    different sketch spaces but identical verify semantics, so their
    FINAL outputs (pairs + exact jaccard) must agree whenever both
    reach full recall — checked on the known fixture and the driver
    documents table."""
    from transaq_clickhouse_exporter_spark.testdata import load_table

    def rows(df):
        return {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in df.collect()}

    small = docs.filter("doc_id <= 3")
    got_pd = rows(dd.minhash_near_dups(small, threshold=0.5))
    got_jvm = rows(dd.minhash_near_dups(small, threshold=0.5, engine="jvm"))
    assert got_pd == got_jvm and any(p[:2] == (1, 2) for p in got_pd)

    corpus = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    big_pd = rows(dd.minhash_near_dups(corpus, threshold=0.5))
    big_jvm = rows(dd.minhash_near_dups(corpus, threshold=0.5, engine="jvm"))
    assert big_pd == big_jvm


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than the iteration budget must fail loudly, not
    return partially-propagated (under-deleting) labels."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="max_iterations"):
        dd.connected_components(chain, max_iterations=2)
    got = {r.cluster_id for r in dd.connected_components(chain).collect()}
    assert got == {0}


def test_decontaminate_flags_eval_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "zzz alpha beta gamma yyy"),          # shares 1 eval shingle
            (2, "alpha beta gamma delta plus more"),  # shares both
            (3, "completely unrelated words here"),   # clean
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_shared, r.contaminated)
           for r in dd.decontaminate(train, ev).collect()}
    assert got == {1: (1, True), 2: (2, True), 3: (0, False)}
    # pre-materialized shingle path (the cached-view deployment shape)
    # is output-identical to the recompute path
    sh = train.unionAll(ev).select("doc_id", dd.shingle_array("text").alias("sh"))
    via_views = {r.doc_id: (r.n_shared, r.contaminated)
                 for r in dd.decontaminate(train, ev, shingles=sh,
                                           eval_shingles=sh).collect()}
    assert via_views == got


def test_decontaminate_monotone_in_eval_set(spark, docs):
    """Growing the benchmark set can only grow the flagged set, and a
    doc present in both corpus and eval always self-flags (J(x,x)=1)."""
    def flagged(ev):
        return {r.doc_id for r in dd.decontaminate(docs, ev).collect()
                if r.contaminated}

    f1 = flagged(docs.filter("doc_id = 1"))
    f13 = flagged(docs.filter("doc_id in (1, 3)"))
    assert 1 in f1 and f1 <= f13 and 3 in f13


def test_ngram_jaccard_identical_and_disjoint(spark, docs):
    pairs = spark.createDataFrame([(1, 1), (1, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dd.ngram_jaccard(docs, pairs).collect()}
    assert got[(1, 1)] == 1.0
    assert got[(1, 3)] == 0.0


def test_simhash_near_dups(spark, docs):
    sigs = dd.simhash_signatures(docs.filter("doc_id <= 3"))
    by_id = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    ham_near = bin(by_id[1] ^ by_id[2]).count("1")
    ham_far = bin(by_id[1] ^ by_id[3]).count("1")
    assert ham_near < ham_far
    out = dd.simhash_near_dups(sigs, max_hamming=ham_near)
    assert (1, 2) in _pairs(out)


def test_embedding_near_dups_and_blocking(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.04, 0.0], 0),   # ~same direction as 1
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),      # same as 1 but other block
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = dd.embedding_near_dup_pairs(emb, threshold=0.95, block_col="label")
    assert _pairs(out) == {(1, 2)}  # (1,4) blocked away, (1,3) orthogonal


def test_brute_force_vs_lsh_and_ivf(spark, sf_smoke):
    from transaq_clickhouse_exporter_spark.testdata import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = sim.brute_force_topk(emb, queries, k=10)
    bf_rows = bf.collect()
    assert {r["query_id"] for r in bf_rows} == {0, 100, 200, 300, 400}
    by_q = {}
    for r in bf_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 10
        top = min(rs, key=lambda r: r["rank"])
        assert top["nn_id"] == q and top["cos_sim"] == 1.0  # self is nearest

    # BLAS/partial-top-k form: bit-identical to the join form (rounding
    # to 6 decimals happens before ranking in both)
    blas_rows = sim.brute_force_topk_blas(emb, queries, k=10).collect()
    as_set = lambda rows: {(r.query_id, r.nn_id, r.cos_sim, r.rank) for r in rows}
    assert as_set(blas_rows) == as_set(bf_rows)
    # repartitioning the corpus must not change the exact result
    blas_re = sim.brute_force_topk_blas(emb.repartition(7), queries, k=10).collect()
    assert as_set(blas_re) == as_set(bf_rows)

    lsh = sim.lsh_topk(emb, queries, dim=64, k=10, n_planes=8)
    bf_sets = {q: {r["nn_id"] for r in rs} for q, rs in by_q.items()}

    def recall(df):
        hits = total = 0
        for r in df.collect():
            if r["query_id"] in bf_sets:
                total += 1
                hits += r["nn_id"] in bf_sets[r["query_id"]]
        return hits, total

    hits, total = recall(lsh)
    assert total > 0 and hits / total > 0.2  # bucketed candidates re-rank exactly


def test_trained_ivf_recall_at_sf01(spark):
    """VERDICT r5 item 5: trained k-means centroids feed ivf_topk and
    hold a recall floor vs exact brute force at sf0.1 — the offline
    fit → persisted centroids → probe path a cluster deployment runs."""
    from transaq_clickhouse_exporter_spark.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf_sets: dict = {}
    for r in sim.brute_force_topk_blas(emb, queries, k=10).collect():
        bf_sets.setdefault(r.query_id, set()).add(r.nn_id)
    assert len(bf_sets) == 20

    def recall(rows):
        hits = total = 0
        for r in rows:
            total += 1
            hits += r.nn_id in bf_sets[r.query_id]
        return hits / total

    cents = sim.train_ivf_centroids(emb, n_cells=16, iterations=4)
    trained_rows = sim.ivf_topk(emb, queries, nprobe=4, k=10, centroids=cents).collect()
    assert len(trained_rows) == 20 * 10  # full k per query
    trained = recall(trained_rows)
    # probing 4/16 cells; measured 0.585 trained vs 0.555 sample
    assert trained >= 0.5
    plain = recall(sim.ivf_topk(emb, queries, n_cells=16, nprobe=4, k=10).collect())
    # the fit must not be WORSE than the untrained sample (noise margin)
    assert trained >= plain - 0.05

    # multi-probe visits single-bit-flip neighbor buckets → recall must
    # not shrink vs single-probe on the same plane family
    lsh1 = recall(sim.lsh_topk(emb, queries, dim=64, k=10, n_planes=8).collect())
    lsh5 = recall(
        sim.lsh_topk(emb, queries, dim=64, k=10, n_planes=8, n_probes=5).collect()
    )
    assert lsh5 >= lsh1

    ivf = sim.ivf_topk(emb, queries, n_cells=8, nprobe=3, k=5)
    per_q = {q: 0 for q in bf_sets}
    for r in ivf.collect():
        per_q[r["query_id"]] += 1
    assert all(n == 5 for n in per_q.values())


def test_text_profile(spark, docs):
    out = {r["doc_id"]: r for r in dtx.profile_documents(docs).collect()}
    assert out[1]["n_tokens_ws"] == 25
    assert out[1]["lang_guess"] == "en"
    assert out[1]["fp"] == out[4]["fp"]  # normalization collapses case/punct
    assert 0.0 <= out[3]["quality"] <= 1.0
    empty = dtx.profile_documents(
        spark.createDataFrame([(9, "")], "doc_id long, text string")
    ).first()
    assert empty["n_tokens_ws"] == 0 and empty["lang_guess"] == "und"


def test_multimodal_features_and_frames(spark, docs):
    media = mm.attach_meta(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload")),
        "doc_id", "payload", "text/plain",
    )
    feats = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert len(feats[1]) == mm.FEATURE_DIM
    assert feats[1] != feats[3]
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert feats == again  # deterministic

    with_dur = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime"), F.col("meta.width"), F.col("meta.height"),
            F.lit(3500).cast("long").alias("duration_ms"), F.col("meta.codec"),
        ),
    )
    frames = mm.frame_sample(with_dur, every_ms=1000).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r)
    assert all(len(v) == 4 for v in per_media.values())  # 0,1000,2000,3000

    with pytest.raises(Exception):  # strict decoder stub raises in executor
        mm.resize_stub(media, 64, 64, decoder="strict").collect()


def test_curation_filter_rules(spark):
    ok = ("the cat and the dog walk to the park of wonders and it is nice "
          "to see them play for hours in the field ") * 3  # long enough, stopwords
    rows = [
        (1, ok),
        (2, "short"),                                   # too_short
        (3, "x" * 150),                                 # one 150-char word -> word rules
        (4, ok.replace(" ", "!!! ")),                   # punct_heavy
        (5, ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
             "eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.fail_reason) for r in dtx.curation_filter(df).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "too_few_words")
    assert got[4][0] is False and got[4][1] in ("punct_heavy", "word_len_out_of_band")
    assert got[5] == (False, "no_stopwords")  # latin text, no en stopwords


def test_connected_components_chain_and_island(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8), (20, 21)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}


def test_train_ivf_centroids_improves_objective(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # three well-separated gaussian blobs in 8-d
    centers = rng.normal(size=(3, 8)) * 10
    # ids ordered so the first n_cells vectors ALL come from blob 0 —
    # the deterministic first-k init starts degenerate and training has
    # real work to do
    rows = [
        (i, (centers[i // 30] + rng.normal(scale=0.1, size=8)).tolist(), i // 30)
        for i in range(90)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")

    def objective(cents_df):
        cents = {r.cell: np.asarray(r.cent) for r in cents_df.collect()}
        pts = [(np.asarray(v), l) for _, v, l in rows]
        tot = 0.0
        for v, _ in pts:
            vn = v / np.linalg.norm(v)
            tot += max(
                float(vn @ (c / np.linalg.norm(c))) for c in cents.values()
            )
        return tot / len(pts)

    init = sim.train_ivf_centroids(emb, n_cells=3, iterations=0)
    trained = sim.train_ivf_centroids(emb, n_cells=3, iterations=4)
    assert trained.count() == 3
    assert objective(trained) > objective(init) + 0.05  # blobs get found


def test_incremental_minhash_near_dups(spark, docs):
    # history = docs 1,2 ; new batch = docs 3,4.  4 is an exact dup of
    # 1 (after case-normalization the shingles differ only by '!!!'
    # suffix token), 3 matches nothing.
    hist = docs.filter("doc_id <= 2")
    new = docs.filter("doc_id >= 3")
    out = dd.incremental_minhash_near_dups(new, hist, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (4, 1) in got           # new doc 4 ~ historical doc 1
    assert all(a >= 3 and b <= 2 for a, b in got)  # only cross pairs


def test_pii_scrub(spark):
    rows = [
        (1, "mail me at a.b-c%d@ex-ample.co.uk or call +79161234567"),
        (2, "server 10.0.255.7 and 192.168.1.1 are internal"),
        (3, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dtx.pii_scrub(df).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1 and got[1].n_ip == 0
    assert "<EMAIL>" in got[1].redacted and "<PHONE>" in got[1].redacted
    assert "@" not in got[1].redacted and "+7916" not in got[1].redacted
    assert got[2].n_ip == 2 and "<IP>" in got[2].redacted
    assert got[3].redacted == rows[2][1]  # untouched


def test_repetition_profile(spark):
    rows = [
        (1, "spam spam spam spam spam"),        # 4 bigrams, 1 distinct
        (2, "all words here are unique tokens"),  # no repeats
        (3, "x"),                                # below k -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dtx.repetition_profile(df).collect()}
    assert (got[1].n_grams, got[1].n_distinct_grams, got[1].dup_frac) == (4, 1, 0.75)
    assert got[2].dup_frac == 0.0 and got[2].n_grams == got[2].n_distinct_grams == 5
    assert (got[3].n_grams, got[3].dup_frac) == (0, 0.0)


def test_passage_dedup_removes_shared_windows(spark):
    rows = [
        (1, "a b c x y z"),          # "a b c" shared -> "x y z" kept
        (2, "a b c q"),              # partial tail window "q" kept
        (3, "unique words only here"),
        (4, "a b c"),                # every passage removed -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dd.passage_dedup(df, window_words=3).collect()}
    assert (got[1].clean_text, got[1].n_kept, got[1].n_removed) == ("x y z", 1, 1)
    assert (got[2].clean_text, got[2].n_kept, got[2].n_removed) == ("q", 1, 1)
    assert (got[3].clean_text, got[3].n_removed) == ("unique words only here", 0)
    assert (got[4].clean_text, got[4].n_kept, got[4].n_removed) == ("", 0, 1)
    # max_docs above the occurrence count keeps everything
    kept_all = dd.passage_dedup(df, window_words=3, max_docs=3).collect()
    assert all(r.n_removed == 0 for r in kept_all)


def test_passage_dedup_partition_invariant(spark, docs):
    a = sorted(map(tuple, dd.passage_dedup(docs, window_words=5).collect()))
    b = sorted(
        map(tuple, dd.passage_dedup(docs.repartition(7), window_words=5).collect())
    )
    assert a == b


def test_sq_topk_recall_and_exact_query_hit(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r[0], r[1]) for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    got = sim.sq_topk(emb, queries, k=5).collect()
    # every query's own vector quantizes to itself -> rank 1, cos 1.0
    first = {r.query_id: r for r in got if r.rank == 1}
    assert all(r.nn_id == q and r.cos_q8 == 1.0 for q, r in first.items())
    hits = {(r.query_id, r.nn_id) for r in got}
    assert len(bf & hits) / len(bf) >= 0.7  # int8 keeps most of the ranking


def test_sq_scales_reusable(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    scales = sim.sq_scales(emb)
    a = sorted(map(tuple, sim.sq_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, sim.sq_topk(emb, queries, k=5, scales=scales).collect()))
    assert a == b and len(scales) == 64


def test_pq_trained_codebooks_beat_sample(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r[0], r[1]) for r in sim.brute_force_topk(emb, queries, k=10).collect()}

    def recall(codebooks):
        got = {
            (r[0], r[1])
            for r in sim.pq_topk(emb, queries, codebooks=codebooks, k=10).collect()
        }
        return len(bf & got) / len(bf)

    # everything deterministic (fixed sample, init, iteration count) so
    # these are exact reruns, not flaky statistical bounds
    r_sample = recall(sim.pq_codebooks(emb))
    r_trained = recall(sim.pq_codebooks(emb, train=True, sample_size=500))
    r_big = recall(
        sim.pq_codebooks(emb, n_cent=64, train=True, sample_size=500)
    )
    assert r_trained > r_sample  # Lloyd's improves over sample-as-codebook
    assert r_big > r_trained  # more centroids/subspace -> better recall
    assert r_big >= 0.5  # 64x compression keeps half the true top-10


def test_pq_encode_shape_and_persisted_reuse(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cb = sim.pq_codebooks(emb)
    enc = sim.pq_encode(emb, cb)
    rows = enc.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes) for r in rows)
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    a = sorted(map(tuple, sim.pq_topk(emb, queries, codebooks=cb, k=5).collect()))
    b = sorted(
        map(
            tuple,
            sim.pq_topk(emb, queries, codebooks=cb, k=5, encoded=enc).collect(),
        )
    )
    assert a == b


def test_self_passage_dedup(spark):
    rows = [
        (1, "a b c x y z a b c"),  # windows (w=3): abc / xyz / abc -> drop 3rd
        (2, "p q r p q"),          # "p q r" then partial "p q" -> both kept
        (3, "m n o m n o m n o"),  # three identical windows -> keep one
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dd.self_passage_dedup(df, window_words=3).collect()}
    assert (got[1].clean_text, got[1].n_kept, got[1].n_removed) == ("a b c x y z", 2, 1)
    assert (got[2].clean_text, got[2].n_removed) == ("p q r p q", 0)
    assert (got[3].clean_text, got[3].n_kept, got[3].n_removed) == ("m n o", 1, 2)


def test_sq_engines_bit_identical(spark):
    # integer-domain scoring: BLAS reordering cannot perturb a bit, so
    # the two engines must be EXACTLY equal (not just rounded-equal)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, sim.sq_topk(emb, queries, k=10, engine="blas").collect()))
    b = sorted(map(tuple, sim.sq_topk(emb, queries, k=10, engine="jvm").collect()))
    assert a == b and len(a) == 100


def test_passage_windowing_roundtrips(spark, docs):
    # with the dup threshold effectively disabled, reassembly must be
    # the identity on single-space-separated text — pins the window
    # slicing/join math that dp22/dp23 rely on
    out = dd.passage_dedup(docs, window_words=7, max_docs=1 << 30)
    joined = out.join(docs, "doc_id")
    assert joined.filter(F.col("clean_text") != F.col("text")).count() == 0
    assert out.filter(F.col("n_removed") != 0).count() == 0


def test_score_documents_seam_and_buckets(spark, docs):
    from transaq_clickhouse_exporter_spark.datapipe.scoring import (
        score_buckets,
        score_documents,
    )

    # a custom model hook: score = doc length fraction (plugs straight in)
    def by_len(texts):
        import numpy as np

        return np.array([min(len(t), 1000) / 1000.0 for t in texts])

    scored = score_documents(docs, batch_scorer=by_len).collect()
    assert all(0.0 <= r.score <= 1.0 for r in scored)
    got = {r.doc_id: r.score for r in scored}
    want = {r.doc_id: min(len(r.text), 1000) / 1000.0 for r in docs.collect()}
    assert got == want
    bucketed = score_buckets(
        score_documents(docs, scorer="fake"), edges=(0.25, 0.5, 0.75)
    ).collect()
    assert {r.bucket for r in bucketed} <= {0, 1, 2, 3}
    for r in bucketed:
        assert r.bucket == sum(r.score >= e for e in (0.25, 0.5, 0.75))


def test_training_data_job_model_score_gate(spark, docs):
    from transaq_clickhouse_exporter_spark.datapipe.pipeline import (
        training_data_job,
    )
    from transaq_clickhouse_exporter_spark.datapipe.scoring import (
        SCORERS,
        score_documents,
    )

    with pytest.raises(ValueError):  # silent fake-scorer gating is refused
        training_data_job(docs, min_model_score=0.5)
    out = training_data_job(
        docs, min_model_score=0.5, model_scorer=SCORERS["fake"]
    )
    rejects = out["rejects"].filter(F.col("fail_reason") == "model_score")
    low = score_documents(docs, scorer="fake").filter(F.col("score") < 0.5)
    # every model-score reject scored below the bar, and no kept doc did
    rejected_ids = {r.doc_id for r in rejects.collect()}
    low_ids = {r.doc_id for r in low.collect()}
    assert rejected_ids <= low_ids
    kept = {r.doc_id for r in out["curated"].collect()}
    assert kept.isdisjoint(low_ids)


def test_ann_empty_query_batches_return_empty(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    none = emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert sim.sq_topk(emb, none, k=5).count() == 0
    assert sim.pq_topk(emb, none, k=5).count() == 0
    assert sim.brute_force_topk_blas(emb, none, k=5).count() == 0


def test_rademacher_bucket_jvm_equals_pandas(spark, sf_smoke):
    from transaq_clickhouse_exporter_spark.datapipe.similarity import (
        rademacher_bucket,
        rademacher_bucket_jvm,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    dim = len(emb.first().embedding)
    both = emb.select(
        "vec_id",
        rademacher_bucket("embedding", dim, 10).alias("pd_b"),
        rademacher_bucket_jvm("embedding", dim, 10).alias("jvm_b"),
    )
    rows = both.collect()
    assert rows and all(r.pd_b == r.jvm_b for r in rows)
