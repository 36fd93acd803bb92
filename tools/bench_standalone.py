#!/usr/bin/env python3
"""Regenerate BENCH_STANDALONE.json: noise-free per-query timings at
sf0.1 — each query runs ALONE in a warm session (no pool, no
concurrency), reported as first execution + median of 3 rebuilds.
These are the stable cross-round numbers; the pooled bench.py makespan
carries host-level scheduling noise (NOTES.md "Measurement reality")."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402

#: The heaviest / newest catalog queries — the ones worth watching.
PICKS = [
    "op01_dedup_last_write_wins", "op04_asof_join", "an03_minute_returns",
    "dp02_text_profile", "dp05_minhash_lsh_near_dups", "dp03_ngram_jaccard",
    "in06_candles_rollup", "in03_candles_windowed", "in05_candle_builder_exact",
    "ann02_lsh_topk", "op05_range_join", "an05_rolling_channel",
    "dp06_simhash_near_dups", "dp16_dup_clusters", "dp17_incremental_near_dup",
    "dp18_pii_scrub", "dp19_repetition_profile", "dp14_curation_filter",
    "dp15_corpus_report", "ann03_ivf_topk", "dp01_exact_dedup",
    "dp21_decontaminate", "dp20_mixture_weights",
    "dp22_passage_dedup", "ann04_sq_topk", "ann05_pq_adc",
    "dp23_self_passage_dedup", "tp07_hll_distinct", "ev08_window_funnel",
    "ev09_quantile_sketch", "tp06_small_qty_revenue", "ev07_cohort_retention",
    "an06_ema", "dp24_model_scores", "mm02_frame_sample",
    "dp25_bm25_topk", "dp26_semantic_dedup", "dp27_weighted_sample",
    "dp28_bigram_lm",
    "ev10_sequence_match", "ev11_session_windows", "dp29_shard_manifest",
    "op06_scd2_history", "an07_trailing_time_stats",
    "an08_gap_fill", "an09_twap", "an10_weighted_quantiles",
    "ev12_retention", "dp30_chunk_documents", "dp31_chunk_search",
    "op07_aggregating_states", "dp32_chunk_search_lsh",
    "db18_dst_spring_buckets", "db19_dst_fall_buckets",
    "ev14_window_funnel_ch", "ev13_heavy_hitters",
    "ev15_window_funnel_sql", "ev16_topk_weighted_sql",
    "op08_asof_sql_bridge",
    "ev17_topk_grouped_sql", "ev18_scalar_with_sql",
    "dp33_diversity_sample",
    "op09_asof_left_bridge", "ev19_with_totals_sql",
    "ev20_text_hash_profile_sql", "ev21_combinator_profile_sql",
    "ev22_with_fill_sql", "ev23_per_group_topn_sql",
    # r13 (VERDICT r12 item 5): the rest of the ASOF-SQL family and
    # the r11/r12 dialect additions — covers every query whose r12
    # pool-wall exceeded 3 s, so future verdicts read steady numbers
    # directly instead of adjudicating pool-scheduling noise.
    "op10_asof_forward_sql", "op11_asof_using_sql",
    "op12_asof_parallel_sql", "ev24_columns_apply_sql",
    "ev25_fill_interpolate_sql", "ev26_interval_profile_sql",
    "ev27_quantified_sql",
    # r13 additions (born-in-tail catalog entries)
    "ev28_correlated_quantified_sql", "op13_asof_chained_sql",
    "ev29_sequence_next_node_sql",
    "ev30_exponential_moving_average_sql",
    "ev31_max_intersections_sql",
    "ev32_lttb_downsample_sql",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="tce-standalone")
    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)
    cat = parity.catalog()
    # warm: derived-view caches + python worker pool (one cheap query)
    for t in ("trades", "documents", "embeddings", "doc_shingles", "doc_bands",
              "ticks", "quotes_dup", "trades_dup", "lineitem", "ev"):
        spark.table(t).count()
    cat["dp02_text_profile"].build(spark).toPandas()

    out = {}
    for name in PICKS:
        spec = cat[name]
        t0 = time.perf_counter()
        spec.build(spark).toPandas()
        first = time.perf_counter() - t0
        rebuilds = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.build(spark).toPandas()  # fresh plan: full re-execution
            rebuilds.append(time.perf_counter() - t0)
        out[name] = {
            "first": round(first, 3),
            "median_rebuild": round(statistics.median(rebuilds), 3),
        }
        print(name, out[name], flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_STANDALONE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
