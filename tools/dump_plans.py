#!/usr/bin/env python3
"""Regenerate PLANS.md: AQE-final physical plans of representative
catalog queries at sf0.01."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402

PICKS = {
    "db01_volume_by_interval_buy": "flagship: scan → broadcast dim join → interval bucket → agg → sort",
    "db03_netto_buy_top10": "anti-join + broadcast join + two-level signed agg + HAVING + top-10",
    "op01_dedup_last_write_wins": "ReplacingMergeTree FINAL: single-shuffle window dedup",
    "op04_asof_join": "as-of join: union + last-ignorenulls window, zero Join nodes",
    "ann01_brute_force_topk": "ANN baseline: broadcast queries × corpus, per-query top-k window",
    "dp09_term_stats": "vocabulary: explode → two-level hash agg (explicit distinct) → top-N",
    "dp10_sequence_pack": "sequence packing: one shuffle (bucket window), integer-exact offsets",
    "op05_range_join": "range join: binned decomposition — equi-join on (bin, key), no nested loop",
    "an05_rolling_channel": "rolling ROWS frame: partial-agg shuffle carries bars (not ticks), then a bar-sized window Exchange",
    "dp14_curation_filter": "curation gate: single narrow codegen projection, zero shuffles",
    "dp05_minhash_lsh_near_dups": "LSH: cached band-bucket view self-join + pruned exact verify",
    "dp17_incremental_near_dup": "incremental near-dup: batch bands probe the persisted sketch (equi-join), history never re-shingled",
    "dp19_repetition_profile": "repetition: posexplode → window lead → two-level hash agg, all codegen",
    "dp18_pii_scrub": "PII scrub: chained regexp projections, zero shuffles",
    "dp21_decontaminate": "decontamination: eval shingles broadcast into a membership probe, corpus never shuffles; hit counts join back onto the id spine (AQE-sized)",
    "dp22_passage_dedup": "passage dedup: codegen windowed slice/explode, two-level dup-set agg, anti-join, ordered per-doc reassembly (group = one document)",
    "ann04_sq_topk": "SQ ANN: int8 codes as a codegen zip_with, broadcast queries x corpus scan, integer-exact quantized cosine",
    "ann05_pq_adc": "PQ/ADC ANN: zero-shuffle mapInPandas encode + LUT scan with per-batch partial top-k",
    "dp23_self_passage_dedup": "within-doc span dedup: single codegen projection, zero shuffles",
    "tp07_hll_distinct": "HLL sketch: two map-side-combinable aggs (registers, then exact-integer harmonic sum)",
    "ev08_window_funnel": "windowFunnel: k-1 min-agg joins keyed on user, no per-user sort",
    "ev09_quantile_sketch": "quantile sketch: two narrow agg passes + tiny per-group histogram window",
    "an06_ema": "EMA: windowed bar derivation, then one grouped applyInPandas fold (group = one security)",
    "dp24_model_scores": "model-scoring seam: one zero-shuffle mapInPandas pass (inference shape)",
    "mm02_frame_sample": "multimodal frame sampling: zero-shuffle 1-to-N mapInPandas expansion",
    "dp25_bm25_topk": "BM25: query-term filter BEFORE any shuffle, broadcast df/corpus-stats, micro-int score sum, TakeOrdered top-k",
    "dp26_semantic_dedup": "SemDeDup: zero-shuffle BLAS cell assignment + per-cell pairwise matmul (quadratic bounded per cluster)",
    "dp27_weighted_sample": "weighted sample: narrow hash-key projection + TakeOrderedAndProject, no global sort",
    "dp28_bigram_lm": "bigram LM: posexplode → lead bigrams, count tables re-joined on their own grouping keys, micro-int log-prob sum",
    "ev10_sequence_match": "sequenceMatch: condition-filtered scan → one hash agg (partial collect_list) → per-row regex, no join/window",
    "ev11_session_windows": "native session_window: single hash agg with window merge — no per-key sort (vs ev03's sort+lag plan)",
    "dp29_shard_manifest": "shard manifest: narrow md5 projection → one map-side-combinable hash agg",
    "op06_scd2_history": "SCD2: dedup exchange on (keys, ts), then change-collapse + lead-close sharing ONE (keys) sort",
    "an07_trailing_time_stats": "RANGE frame: one exchange + sort, sliding two-pointer event-time frame",
    "an08_gap_fill": "gap fill: per-key grid sequence+explode, left join onto observations, forward fill via last-ignorenulls window",
    "an09_twap": "TWAP: SCD2 intervals clipped to the window, weight·price agg — no per-tick work",
    "an10_weighted_quantiles": "weighted quantiles: one (key) exchange, cumulative-weight window, rank filter",
    "ev12_retention": "retention: ONE partial→final hash agg (per-condition max flags), no join/window",
    "dp30_chunk_documents": "chunking: single codegen span — split → posexplode over the stride grid, ZERO exchanges",
    "dp31_chunk_search": "chunk search (BLAS): zero-shuffle mapInPandas score+partial-pool, then pooled-agg + WindowGroupLimit top-k",
    "op07_aggregating_states": "aggregating states: per-batch ONE two-level hash agg (scalars ride the register pass), state merge, finalize join",
    "db18_dst_spring_buckets": "DST evidence: codegen epoch arithmetic + tz-rule shift, one partial→final agg",
    "ev14_window_funnel_ch": "CH-exact windowFunnel: chained RANGE running-max windows over ONE sort/exchange, then partial→final agg",
    "ev16_topk_weighted_sql": "topKWeighted pre-agg rewrite: two-level hash agg (per-value weights), d-sized collect — NO raw-row collect_list",
    "ev17_topk_grouped_sql": "grouped topK pre-agg: GROUP BY (key, value) partial→final, sibling sum rides the same aggregates",
    "op08_asof_sql_bridge": "ASOF SQL bridge: the asof_join operator plan (union + one keyed window) under the statement's agg",
    "op09_asof_left_bridge": "ASOF LEFT bridge: same union+window plan, null right side surviving the match filter",
    "ev19_with_totals_sql": "WITH TOTALS bridge: Expand x2 collapses in the map-side partial agg — the shuffle carries 2d rows, not 2x the input",
    "dp33_diversity_sample": "diversity sample: BLAS cell assignment (zero-shuffle), one ~n_cells-key exchange for the per-cell quota rank",
    "ev20_text_hash_profile_sql": "round-9c dialect surface: one partial->final hash aggregate over a 3-column pruned scan; digests/split/HOFs all codegen expressions, zero Python",
    "ev21_combinator_profile_sql": "round-9e combinators: single partial->final aggregate, two count(DISTINCT) expands share the exchange; all CASE/bitwise expressions codegen",
    "ev22_with_fill_sql": "WITH FILL bridge: base agg computes ONCE (localCheckpoint), single-row min/max spine, left-anti grid insert, union — grid size = chart axis, never input rows",
    "ev23_per_group_topn_sql": "LIMIT BY + tuple IN + ANY-subquery dedup: hash-agg dedup under a broadcast join, tuple IN as codegen OR-expansion, one WindowGroupLimit-pruned row_number exchange",
    "ev24_columns_apply_sql": "COLUMNS APPLY from the session catalog (r11b): plain two-level hash agg over the pruned scan — the star expansion is translate-time, zero plan cost",
    "ev25_fill_interpolate_sql": "WITH FILL INTERPOLATE (r11c): ev22's axis-sized fill legs + ONE unpartitioned LOCF window over the chart-sized union — input scanned once",
    "op10_asof_forward_sql": "forward-strict ASOF (r11e): same union + keyed running window as op04/op08/op09, zero Join nodes, single exchange on sec_code — direction/strictness are sort-order flips",
    "op11_asof_using_sql": "USING-spelled ASOF over a subquery right side (r12i): the side keeps full lineage (no defs, no checkpoint), same union + keyed window above it",
    "op12_asof_parallel_sql": "two parallel ASOF legs in one statement (r12k): each leg its own union+window subtree beneath the UNION ALL, still zero Join nodes",
    "ev26_interval_profile_sql": "intervalLengthSum (r12 default): the STATELESS window plan — per-row merge contribution under a keyed running-max window, plain sum above; NO collect_list anywhere",
    "ev27_quantified_sql": "quantified subqueries (r12b): the > ANY / != ALL comparison compiles to Subquery (scalar) nodes evaluated once — the fact scan never joins or shuffles for the comparison",
    "ev28_correlated_quantified_sql": "CORRELATED quantified comparison (r13): the three spliced scalar subqueries decorrelate to broadcast hash joins on sec_code — no nested loop, no cartesian",
    "op13_asof_chained_sql": "chained ASOF (r15 fast path): uniform shared-key chain folds into ONE union+window — a single keyed exchange for BOTH links (was one per link), zero Join nodes in the ASOF path itself",
    "op14_asof_multi_single_shuffle": "asof_join_multi (r15): k rights in one keyed window — k last(ignorenulls) columns on the same WindowExec, one exchange total",
    "ev29_sequence_next_node_sql": "sequenceNextNode (r14): the windowFunnel fold shape — one ObjectHashAggregate (collect_list of (t, val, flags) structs) with map-side partials over the argMin pre-dedup's partial→final pair; pure array logic after, no Python, no extra shuffle",
    "ev30_exponential_moving_average_sql": "exponentialMovingAverage (r14): sorted collect_list fold per sec_code — one partial→final ObjectHashAggregate pair, linear aggregate() fold, integer exponents keep pow exact cross-engine",
    "ev31_max_intersections_sql": "maxIntersections(/Position) (r14): r14 second phase: STATELESS window sweep — LATERAL VIEW event explode + running-sum window per board, max/max_by aggregates; the fold (7 s, whole-group arrays in one task) remains only for declined shapes",
    "ev32_lttb_downsample_sql": "largestTriangleThreeBuckets (r14): argMin pre-dedup partial→final, then ONE ObjectHashAggregate collect per security and a static O(1)-size selection fold over sequence(0, n-3) — no per-bucket unrolling, no Python",
}

HEADER = """# PLANS — physical plans of representative catalog queries

Generated by `python tools/dump_plans.py` (AQE final plans at sf0.01).
What to look for: `BroadcastHashJoin` (dim joins never shuffle the fact
side), `PushedFilters` on scans, `TakeOrderedAndProject` for top-k
(no global sort), a single `Exchange hashpartitioning` for the window
operators, and `WholeStageCodegen` spans covering the expression work.
"""


def main() -> None:
    spark = get_spark(app="dump-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, "/root/testdata/sf0.01")
    parity.register_derived_views(spark, "/root/testdata/sf0.01")
    cat = parity.catalog()
    out = [HEADER]
    for name, blurb in PICKS.items():
        df = cat[name].build(spark)
        df.collect()  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n\n{blurb}\n\n```\n{plan[:4000]}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
