"""Query corpus: every implemented operator as a (Spark, oracle-SQL) pair.

This is the engine's executable specification, mirroring SURVEY.md §2's
operator inventory. Each entry is a callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle can run over the same parquet fixtures. Column names are
aligned on both sides because the driver's comparator sorts columns by
name before hashing values.

Conventions for cross-engine determinism:

- timestamps in outputs are projected as epoch seconds (``unix_timestamp``
  / ``epoch(...)::BIGINT``) — engine-native timestamp objects differ in
  precision plumbing (parquet NANOS vs Spark MICROS);
- floating-point aggregates are ``round``-ed (summation order differs
  across engines; rounding collapses ulp noise);
- every ordering has a total tie-break so ties cannot reorder.
"""

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import features as _m_features
from . import analytics as _m_analytics
from . import events as _m_events
from . import sources as _m_sources
from . import streaming as _m_streaming
from . import dedup as _m_dedup
from . import similarity as _m_similarity
from . import text as _m_text
from . import curation as _m_curation
from . import skew as _m_skew
from . import multimodal as _m_multimodal

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in (_m_features, _m_analytics, _m_events, _m_sources, _m_streaming, _m_dedup, _m_similarity, _m_text, _m_curation, _m_skew, _m_multimodal):
    for _k in _m.ENTRIES:
        if _k in _REGISTRY:
            raise AssertionError(f"duplicate registry entry {_k}")
    _REGISTRY.update(_m.ENTRIES)
_ENTRY_ORDER = [
    "pit_join",
    "similarity_ann_exhaustive",
    "windowed_event_counts",
    "windowed_event_counts_streaming",
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_static_enrichment",
    "source_jsonl_roundtrip",
    "source_csv_roundtrip",
    "split_pattern_routing",
    "pit_join_prefixed",
    "pit_join_composite_key",
    "pit_join_field_mapping",
    "param_substitution",
    "skew_salted_agg",
    "decontaminate",
    "stratified_sample",
    "group_quota",
    "sequence_packing",
    "latest_feature_snapshot",
    "text_repetition",
    "pii_redaction",
    "grouping_sets_filter",
    "correlated_subquery",
    "lateral_topk_per_key",
    "udtf_split_sentences",
    "embedding_quantization",
    "event_funnel",
    "scd2_validity_intervals",
    "forward_fill_timeseries",
    "negative_sample",
    "chunk_documents",
    "column_correlations",
    "gap_fill_timeseries",
    "unpivot_stack",
    "range_interval_window",
    "dataset_stats",
    "array_agg_sorted",
    "sketch_distinct_counts",
    "sketch_quantiles",
    "multimodal_features",
    "multimodal_image_png",
    "multimodal_image_jpeg",
    "multimodal_image_jpeg_progressive",
    "multimodal_image_gif",
    "multimodal_image_tiff",
    "multimodal_video_mp4_stats",
    "multimodal_audio_flac_stats",
    "multimodal_audio_ogg_stats",
    "multimodal_audio_g711_stats",
    "temperature_mix",
    "text_heavy_hitters",
    "interpolate_timeseries",
    "text_unigram_logprob",
    "bpe_pair_merges",
    "dedup_exact_substring",
    "dedup_remove_shared_runs",
    "training_pipeline_v2",
    "contrastive_hard_negatives",
    "similarity_ann_pq_recall",
    "multimodal_image_resize",
    "text_bigram_logprob",
    "length_bucketing",
    "corpus_report",
    "source_overlap_audit",
    "retention_cohorts",
    "similarity_ann_indexed",
    "nearest_event_join",
    "merge_upsert_cdc",
    "decayed_activity_score",
    "mad_outliers",
    "time_rollup_multigrain",
    "percent_rank_transform",
    "grouped_split_no_leakage",
    "epoch_shuffle_shards",
    "kfold_assignment",
    "dedup_containment_scoped",
    "event_type_pmi",
    "rolling_wau",
    "weighted_sample_wor",
    "rolling_zscore_anomalies",
    "corpus_novelty_rate",
    "fk_integrity_audit",
    "revenue_concentration",
    "cusum_changepoints",
    "sketch_hll_mergeable",
    "interevent_gap_stats",
    "dedup_pair_evidence",
    "vocab_coverage_curve",
    "streaming_matview_latest",
    "source_orc_roundtrip",
    "federated_union_agg",
    "ivm_delta_agg",
    "graph_triangle_count",
    "props_map_explode",
    "stream_error_recovery",
    "recursive_chain_walk",
    "variant_props_typed",
    "table_time_travel_diff",
    "table_pruned_scan",
    "group_ols_trend",
    "keyword_search_indexed",
    "bm25_ranked_search",
    "phrase_search_positional",
    "feature_drift_psi",
    "embedding_outliers",
    "skew_report",
    "multimodal_audio_stats",
    "multimodal_audio_mp3_stats",
    "sequence_example_roundtrip",
    "stream_dedup",
    "zorder_layout",
    "skew_salted_join",
    "three_way_split_counts",
    "source_tfrecord_roundtrip",
    "q7_nation_volume",
    "q10_returned_items",
    "q18_large_orders",
    "snapshot_diff",
    "bucketed_join",
    "source_warc_records",
    "embedding_linear_scorer",
    "feature_histogram",
    "similarity_ann_lsh_recall",
    "embedding_dedup_clusters",
    "similarity_ann_ivf_recall",
    "dedup_simhash",
    "pit_join_ttl",
    "pit_join_time_bucketed",
    "pit_join_union_window",
    "pit_join_multiview",
    "feature_service",
    "hash_split_counts",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "window_topk_running",
    "setop_intersect",
    "setop_except",
    "json_events_daily",
    "having_subquery",
    "rollup_region_nation",
    "anti_join_exists",
    "string_funcs_parts",
    "monthly_order_delta",
    "sessionization",
    "window_lead_lag_ntile",
    "percentiles",
    "cube_lattice",
    "case_pivot",
    "text_bpe_token_budget",
    "sessionization_streaming",
    "corpus_prep_pipeline",
    "training_dataset_pipeline",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_filter",
    "dedup_minhash_lsh",
    "dedup_simhash_portable",
    "dedup_containment",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "weighted_sample",
    "text_tfidf_topterms",
    "text_quality",
    "text_lang_id",
    "text_token_stats",
    "text_fingerprint",
    "similarity_topk",
    "embedding_neardup",
    "semantic_dedup",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "bloom_prejoin_filter",
    "global_row_ids",
    "global_exact_ntile",
    "global_exact_quantiles",
    "grouped_exact_ntile",
    "html_text_extract",
    "url_canonicalize",
    "graph_pagerank",
    "fuzzy_editdist_pairs",
    "dedup_segments",
    "dedup_winnowing",
    "k_anonymity_audit",
    "dp_noisy_counts",
    "target_encode_loo",
    "ivm_delta_join",
    "cc_incremental",
    "bootstrap_metric_ci",
    "nb_distill_classifier",
    "pseudonymize_fk_audit",
    "stream_quota_gate",
    "source_warc_datasource",
    "source_warc_write_roundtrip",
    "token_budget_select",
    "dsir_select",
    "bpe_encode",
    "bpe_train",
    "sketch_countmin",
    "sketch_countmin_join",
    "graph_bfs_levels",
    "interval_containment_join",
    "interval_overlap_join",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q17_small_quantity_revenue",
    "q22_dormant_customers",
    "stream_semantic_gate",
    "graph_hits",
    "contamination_report",
    "split_leakage_audit",
    "score_calibration_ece",
    "cdc_chunking",
    "graph_label_propagation",
    "graph_label_propagation_weighted",
    "graph_sssp",
    "graph_kcore",
    "graph_pagerank_personalized",
    "text_char_ngram_entropy",
    "score_drift_ks",
    "lang_quality_mi",
    "subset_max_coverage",
    "graph_pagerank_weighted",
    "graph_degree_assortativity",
    "score_drift_qq",
    "curriculum_interleave",
    "sketch_corpus_overlap",
    "multimodal_image_dhash_neardup",
    "multimodal_audio_fingerprint_neardup",
    "url_robots_filter",
    "multimodal_corpus_prep",
    "stream_neardup_gate",
    "eval_auc",
    "linreg_train_gd",
    "perplexity_bucket_filter",
    "sorted_neighborhood_pairs",
    "word_cooccurrence_pmi",
    "embedding_random_projection",
    "global_running_total",
    "eval_average_precision",
    "eval_roc_curve",
    "grouped_running_total",
    "eval_auc_by_group",
    "grouped_exact_quantiles",
    "eval_ndcg_at_k",
    "eval_mrr_at_k",
]
if set(_ENTRY_ORDER) != set(_REGISTRY):
    raise AssertionError("registry/order drift: " + repr(set(_ENTRY_ORDER) ^ set(_REGISTRY)))
_REGISTRY = {_k: _REGISTRY[_k] for _k in _ENTRY_ORDER}



# Driver-window ordering: the correctness harness records only the FIRST
# 50 dict entries, so entries whose implementation changed this round —
# plus entries whose last driver-green row is oldest — are surfaced ahead
# of recently-re-verified ones. pit_join stays at position 0 (entry()
# smoke). Refresh per round; scripts/check_correctness.py still proves
# the full registry locally regardless of this order.
#
# ROUND-START RITUAL (before any code edit): run
#   python scripts/gen_attestation.py --stamp-round <previous round N>
# on the tree the driver tested, commit ATTESTATION.json, THEN rotate
# this list (oldest driver-green vintage first, plus anything
# tests/test_attestation.py flags). The ledger test enforces that every
# entry with attestation debt sits in the first 50 slots — an edit to
# any reachable code outside the window fails pytest until the window
# is rotated or the change reverted.
_DRIVER_PRIORITY = [
    "pit_join",
    # ROUND-15 ROTATION (executes the plan recorded in the r14 window
    # comment + VERDICT r14 item 1). Slot 0: pit_join (entry() smoke,
    # convention since r7).
    #
    # Slots 1-4: NEW this round (never-attested entries MUST sit in
    # the window): bpe_train — the full iterative BPE tokenizer
    # training loop (count pairs -> top-1 rule -> apply merge ->
    # re-count; rule r can merge tokens rule r-1 created, which the
    # one-shot bpe_pair_merges step cannot), per-round
    # localCheckpoint-pinned fold + map-side-combinable count + 1-row
    # argmax; oracle unrolls all five rounds as per-round
    # recursive-CTE leftmost-merge replays (VERDICT r14 item 5). And
    # global_exact_ntile — direct driver evidence for the exact_ntile
    # primitive the three NTILE conversions below stand on (oracle IS
    # the naive global-Window NTILE; equivalence is the contract).
    # Plus the family completions on the same rank machinery:
    # global_exact_quantiles (exact type-1 value-at-rank quantiles —
    # filter the ranked frame to five rows, no global sort; the exact
    # complement of the sketch_quantiles epsilon path) and
    # grouped_exact_ntile (per-group NTILE with per-group counts as a
    # broadcast join and in-plan integral-div tile arithmetic — no
    # per-group single-partition Window). Oracles are the naive
    # window spellings each operator refuses to plan.
    "bpe_train",
    "global_exact_ntile",
    "global_exact_quantiles",
    "grouped_exact_ntile",
    # Mid-round additions (never-attested entries MUST sit in the
    # window): eval_auc — exact tie-aware ROC-AUC (Mann-Whitney U) on
    # the bucket-decomposed rank machinery, integer-exact to the final
    # IEEE division; oracle is the naive global-Window ranking. And
    # linreg_train_gd — distributed batch-GD linear training (one
    # d-column combinable aggregate per round, weights re-enter as
    # literals), integer-portable to the bit; oracle unrolls the
    # rounds as CTEs and must land on the SAME integer weights.
    "eval_auc",
    "linreg_train_gd",
    # perplexity_bucket_filter — CCNet head/middle/tail gate composing
    # bigram_logprob + exact_ntile on a guarded integer order key;
    # oracle is the naive NTILE window over the same key.
    "perplexity_bucket_filter",
    # sorted_neighborhood_pairs — Hernandez-Stolfo ER blocking as a
    # banded block self-equi-join on the bucket-decomposed rank;
    # oracle is the naive ROW_NUMBER self-join.
    "sorted_neighborhood_pairs",
    # word_cooccurrence_pmi — windowed unordered-pair PMI (integer
    # micro-nats, slot marginals off the pair counts, TakeOrdered
    # top-n); oracle is the LATERAL generate_series respelling.
    "word_cooccurrence_pmi",
    # embedding_random_projection — JL sign projection as one pure
    # integer projection (md5-parity matrix, never materialized);
    # oracle replays the closed form cell-for-cell.
    "embedding_random_projection",
    # global_running_total — the prefix_sum primitive (bucket-
    # decomposed exact running total, the SUM sibling of the row-id
    # machinery); oracle is the naive SUM OVER (ORDER BY).
    "global_running_total",
    # eval_average_precision — PR-AUC finite sum on prefix_sum
    # cumulative thresholds; per-term integer nano-units make the
    # final sum order-free; oracle is the naive cumulative windows.
    "eval_average_precision",
    # eval_roc_curve — the full ROC table on the same prefix_sum
    # cumulatives; single-division tpr/fpr; naive-window oracle.
    "eval_roc_curve",
    # grouped_running_total — grouped_prefix_sum (per-group exact
    # running totals, per-(group,bucket) literal offsets); oracle is
    # the naive partitioned SUM OVER.
    "grouped_running_total",
    # eval_auc_by_group — per-group exact AUC on the grouped rank
    # machinery; NULL for single-class groups; naive partitioned
    # ROW_NUMBER oracle.
    "eval_auc_by_group",
    # grouped_exact_quantiles — per-group value-at-rank quantiles,
    # targets in-plan as a filtered literal array; naive partitioned
    # ROW_NUMBER oracle.
    "grouped_exact_quantiles",
    # eval_ndcg_at_k — per-query NDCG@k with order-free integer
    # micro-unit DCG terms; rank-for-rank oracle replay.
    "eval_ndcg_at_k",
    # eval_mrr_at_k — first-relevant-hit eval, integer reciprocal
    # ranks (scale div rank), one final division.
    "eval_mrr_at_k",
    # Slots 2-12: entries whose fingerprints drift with this round's
    # hardening (all driver-green on the pre-edit tree):
    # - score_drift_ks / score_drift_qq: the bounded-grid contract
    #   (ADVICE r14 medium) — occupied (value, group) grid cells are
    #   counted off the SAME grid exchange (ReuseExchange keeps one
    #   corpus scan) and gate __v through an in-plan raise_error in
    #   the DISTRIBUTED pre-window stage; in-contract inputs compute
    #   identically.
    # - curriculum_interleave: pos emitted UNROUNDED (the 1e-6 grid
    #   tied large ranks; display rounding moved to the query layer)
    #   and the grouped-row-id offset key now encodes NULL group
    #   values distinctly (ADVICE r14: concat_ws silently skipped
    #   NULL parts, colliding NULL with '' and ('a',NULL) with
    #   (NULL,'a')).
    # - length_bucketing / epoch_shuffle_shards /
    #   revenue_concentration: the three global-NTILE windows retired
    #   onto rowid.exact_ntile — bucket-decomposed global rank + the
    #   standard NTILE arithmetic — no single-partition Window
    #   anywhere (VERDICT r14 items 2-3); epoch_shuffle encodes the
    #   (hkey, doc_id) order into one guarded composite long.
    # - graph_degree_assortativity: directed misuse now fails LOUD
    #   in-plan instead of correlating a fabricated 0 out-degree for
    #   sink nodes (ADVICE r14).
    # - subset_max_coverage: the covered-set broadcast is counted per
    #   round (O(1) on the checkpoint) and raises past
    #   max_covered_broadcast instead of silently OOM-ing an executor
    #   (VERDICT r14 item 6).
    # - source_warc_datasource / source_warc_write_roundtrip: dead
    #   attempts' *.warc.*.tmp litter is swept — all litter on
    #   overwrite, this write's own salted temps on abort (ADVICE
    #   r14).
    # - bpe_encode: the merge-pass fold hoisted to the shared
    #   _bpe_merge_pass helper bpe_train composes (same expression,
    #   byte-identical plan).
    # - vocab_coverage_curve: the token-type rank window's input is
    #   now STRUCTURALLY bounded by a TakeOrdered limit(1000) (only
    #   ranks <= 1000 are consumed) — the full-vocabulary one-task
    #   sort is gone; same three output rows.
    "score_drift_ks",
    "score_drift_qq",
    "curriculum_interleave",
    "length_bucketing",
    "epoch_shuffle_shards",
    "revenue_concentration",
    "graph_degree_assortativity",
    "subset_max_coverage",
    "source_warc_datasource",
    "source_warc_write_roundtrip",
    "bpe_encode",
    "vocab_coverage_curve",
    # Optimization-round drift (r15 opt 1/2): the four operators whose
    # internals the shuffle-count work rewired — HITS sparse-frame
    # push, SSSP single-checkpoint merge + pre_collapsed edge prep,
    # k-core degree pin + pre_distinct, semantic-dedup per-row norm
    # hoist. Oracle-identical results (proven at sf0.01 + sf0.1), but
    # the AST fingerprints moved, so they MUST re-enter the window.
    "graph_hits",
    "graph_kcore",
    "graph_sssp",
    "semantic_dedup",
    # ... and the multimodal family, whose fixture adapters now route
    # their id projection through the rebalance_for_compute split-
    # estimate (one-task codec pipelines on compacted inputs ran the
    # whole Python encode+decode on one core; measured 4x on the JPEG
    # entry). Same per-row bytes and stats — only task placement
    # moved — but the module fingerprint covers the adapters, so the
    # family re-enters the window. multimodal_audio_mp3_stats below
    # doubles as its r9-vintage rotation slot.
    "multimodal_audio_flac_stats",
    "multimodal_audio_g711_stats",
    "multimodal_audio_ogg_stats",
    "multimodal_audio_stats",
    "multimodal_features",
    "multimodal_image_gif",
    "multimodal_image_jpeg",
    "multimodal_image_jpeg_progressive",
    "multimodal_image_png",
    "multimodal_image_resize",
    "multimodal_image_tiff",
    "multimodal_video_mp4_stats",
    "multimodal_audio_mp3_stats",
    # ... and the pagerank pair: the static dangling-node set is now
    # pinned once (the in-loop anti-join used to re-run the whole edge
    # pipeline every iteration) and the edge frame pinned hash-clustered
    # on the contribution join key. The weighted entry shares the
    # function. (The same pins for bfs_levels / label_propagation /
    # personalized_pagerank were DEFERRED to r16: the window cannot
    # hold their drift this round — see OPTIMIZATION_r15.md.)
    "graph_pagerank",
    "graph_pagerank_weighted",
    # The r9-vintage rotation was fully displaced this round by
    # optimization drift (the window holds exactly the 49 debt entries
    # + pit_join); the r9 rows below the boundary keep their attested
    # vintage and head the r16 window plan.
    # --- slot 50 boundary: everything below is ordering preference,
    # not window membership ---
    "feature_histogram",
    "forward_fill_timeseries",
    "gap_fill_timeseries",
    "group_quota",
    "grouping_sets_filter",
    "having_subquery",
    "lateral_topk_per_key",
    "monthly_order_delta",
    "percentiles",
    "pit_join_time_bucketed",
    "q10_returned_items",
    "q18_large_orders",
    "q7_nation_volume",
    "similarity_ann_lsh_recall",
    "sketch_distinct_counts",
    "sketch_quantiles",
    "skew_salted_join",
    "snapshot_diff",
    # (The r10 rotation-fill slots and three r9 rows —
    # bloom_prejoin_filter, feature_service, fuzzy_editdist_pairs,
    # global_row_ids, graph_bfs_levels, html_text_extract,
    # interval_overlap_join, zorder_layout, weighted_sample,
    # window_lead_lag_ntile — were displaced by the 11 never-attested
    # mid-round additions above; they keep their attested vintage and
    # head the r16 window plan.)
    #
    # ROUND-16 WINDOW PLAN: after pit_join and any new/drifted entries,
    # head with the 8 displaced rows above, then the remaining r10 rows
    # (multimodal_audio_g711_stats through url_robots_filter,
    # alphabetical, minus any that drift in r16), then the oldest r11
    # rows fill to 50. That keeps the ~4-round full-fleet refresh
    # cadence: after r16 the vintage floor sits at r10-going-on-r11.
]
if set(_ENTRY_ORDER) != set(_REGISTRY):
    raise AssertionError("registry/order drift: " + repr(set(_ENTRY_ORDER) ^ set(_REGISTRY)))
_REGISTRY = {_k: _REGISTRY[_k] for _k in _ENTRY_ORDER}



def _ordered() -> list[str]:
    prio = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    return prio + [n for n in _REGISTRY if n not in set(prio)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _ordered()
        if _REGISTRY[name][1] is not None
    }

# test surface (mutation tests reference these by name)
from .dedup import _q_simhash  # noqa: E402
from .similarity import _q_ann_ivf, _q_ann_lsh  # noqa: E402
