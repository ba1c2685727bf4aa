"""Plan-regression guards for the most expensive bench queries.

A plan regression (new shuffle, lost broadcast, a join degrading to
nested-loop, an unpushed filter) costs bench seconds before any test
notices — these assertions fail CI at plan-build time instead. Bounds
are deliberately loose upper limits: they catch structural regressions,
not cosmetic AQE differences.
"""

import pytest

from tfx_addons_feast_examplegen_spark import queries as qmod
from tfx_addons_feast_examplegen_spark.plans.explain import plan_summary


@pytest.fixture(scope="module")
def qs():
    return qmod.queries()


@pytest.fixture(autouse=True)
def _canonical_plans(spark):
    # Plan-shape guards assert the CANONICAL uncached plan. Earlier
    # tests in the session may have _pin()-cached a matching shingle
    # subtree; the CacheManager would then substitute InMemoryRelation
    # into the build here, breaking the ReusedExchange shape these
    # bounds encode (runtime-fine — cache reads are a win — but not the
    # shape under test, and whether it happens depends on pin-FIFO
    # eviction order, i.e. on test ordering).
    from tfx_addons_feast_examplegen_spark.operators.dedup import _PINNED

    while _PINNED:
        _PINNED.popleft().unpersist(blocking=False)
    spark.catalog.clearCache()
    yield


def _summary(qs, spark, sf_dir, name):
    return plan_summary(qs[name](spark, sf_dir))


def test_pit_join_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "pit_join")
    # data x data cartesians never; the only NestedLoops allowed are the
    # tiny literal snapshot-grid crossJoins (LocalTableScan build sides,
    # one per joined side)
    assert s["nested_loop_joins"] <= 2
    assert s["exchanges"] <= 6, s
    # entity scan filter pushes to parquet
    assert any(s["pushed_filters"]), s


def test_dedup_ngram_jaccard_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "dedup_ngram_jaccard")
    assert s["nested_loop_joins"] == 0, s
    # capped bucket self-join + jaccard verify: 17 shuffle exchanges
    # today (bucket sizes, anti-prune, pair join, set-size joins, all
    # partial/final agg pairs); a jump past 20 means exchange reuse broke
    assert s["exchanges"] <= 20, s


def test_dedup_minhash_lsh_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "dedup_minhash_lsh")
    assert s["nested_loop_joins"] == 0, s
    # 25 today (signature aggs + banding + verify join chain)
    assert s["exchanges"] <= 28, s


def test_dedup_simhash_operator_plan(spark, sf_dir):
    # the raw production operator (what bench times), not the contract
    from tfx_addons_feast_examplegen_spark.operators import dedup as dd
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    s = plan_summary(dd.simhash_pairs(docs, "doc_id", "text", max_hamming=3))
    assert s["nested_loop_joins"] == 0, s
    # 11 today (vote agg + capped chunk pair join)
    assert s["exchanges"] <= 14, s


def test_similarity_ann_lsh_operator_plan(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators import similarity as sim
    from tfx_addons_feast_examplegen_spark.session import register_tables

    emb = register_tables(spark, sf_dir)["embeddings"]
    s = plan_summary(sim.lsh_topk(emb, query_filter="vec_id < 20", k=5))
    # candidate generation must stay an equi-join on (band_id, band_val)
    assert s["nested_loop_joins"] == 0, s
    assert s["exchanges"] <= 8, s


def test_q5_region_revenue_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "q5_region_revenue")
    # star dims broadcast; the fact side must not shuffle pre-aggregation
    assert s["broadcast_hash_joins"] >= 3, s
    assert s["sort_merge_joins"] <= 2, s


def test_sessionization_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "sessionization")
    # one window over (user_id, ts): a single shuffle + sorts, no joins
    assert s["exchanges"] <= 2, s
    assert s["nested_loop_joins"] == 0, s


def test_dedup_exact_substring_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "dedup_exact_substring")
    # capped equi-join + one window shuffle; never a nested loop
    assert s["nested_loop_joins"] == 0, s
    assert s["sort_merge_joins"] == 0, s
    assert s["exchanges"] <= 9, s


def test_contrastive_hard_negatives_plan(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "contrastive_hard_negatives")
    # exactly the similarity_topk exception: ONE BNLJ whose build side is
    # the broadcast query batch; no shuffle beyond the top-k window
    assert s["nested_loop_joins"] == 1, s
    assert s["broadcasts"] >= 1, s
    assert s["exchanges"] <= 2, s


def test_multimodal_resize_plan_no_shuffle(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "multimodal_image_resize")
    # payload->payload->stats is a narrow chain except for the two
    # DELIBERATE round-robin rebalances (one per payload adapter leg):
    # a compacted single-split id scan would otherwise run the whole
    # Python codec pipeline on one core (r15; they shuffle only ids,
    # upstream of all payload bytes, and are no-ops once the scan has
    # real splits). Still no joins and no key shuffles.
    assert s["exchanges"] <= 2, s
    assert s["sort_merge_joins"] == 0, s
    assert s["broadcast_hash_joins"] == 0, s
    assert s["nested_loop_joins"] == 0, s
    assert all("doc_id" in rs for rs in s["read_schemas"]), s


def test_pq_indexed_adc_scan_codes_only(spark, sf_dir, tmp_path):
    # VERDICT r5 item 3: the standing-index ADC scan must be physically
    # codes-only — the wide embedding column is read ONLY by the
    # shortlist-fetch scan of the vectors artifact, never by the
    # corpus-wide ADC pass.
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_topk_indexed,
        pq_write_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pq_index")
    pq_write_index(emb, path, m=8, n_codes=16)
    out = pq_topk_indexed(emb.filter("vec_id < 5"), path, k=5)
    s = plan_summary(out)
    codes_scans = [
        rs for rs in s["read_schemas"] if "codes" in rs
    ]
    assert codes_scans, s["read_schemas"]
    assert all("embedding" not in rs for rs in codes_scans), codes_scans
    # shortlist fetch broadcasts the (tiny) candidate side; the vector
    # store never shuffles
    assert s["broadcasts"] >= 2, s
    assert s["nested_loop_joins"] <= 1, s  # ADC scan x broadcast queries


def test_pq_topk_rerank_fetches_by_id(spark, sf_dir):
    # In-memory pq_topk: the exact re-rank joins vectors back by id
    # (broadcast hash join on neighbor_id), not by riding the vector
    # column through the ADC scan + shortlist window.
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_topk,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_topk(emb, query_filter="vec_id < 5", k=5, shortlist=50)
    s = plan_summary(out)
    assert s["broadcast_hash_joins"] >= 1, s
    assert s["nested_loop_joins"] <= 1, s


def test_window_topk_running_plan_single_window_exchange(qs, spark, sf_dir):
    # r8 DataFrame conversion: rank + running sum share ONE window
    # partitioning, so the whole query is the segment hash exchange
    # plus the final presentation orderBy — a second window exchange
    # means the frames stopped sharing their partitioning.
    s = _summary(qs, spark, sf_dir, "window_topk_running")
    assert s["exchanges"] <= 2, s
    assert s["nested_loop_joins"] == 0, s
    # column pruning reaches the scan: 3 needed columns only
    assert all("c_name" not in rs for rs in s["read_schemas"]), s


def test_window_topk_df_plan_matches_sql_planner(qs, spark, sf_dir):
    # VERDICT r8 item 5: prove the r8 SQL->DataFrame conversion is
    # plan-neutral — the DataFrame build must produce the EXACT physical
    # plan the SQL planner gives for _QWINDOW (the driver bench's +40 ms
    # was load noise, not a planning cost). Normalizes expr ids and
    # plan_id counters, which differ per-build by construction.
    import re

    from tfx_addons_feast_examplegen_spark.queries.analytics import _QWINDOW
    from tfx_addons_feast_examplegen_spark.session import register_tables

    df_plan = qs["window_topk_running"](spark, sf_dir)
    register_tables(spark, sf_dir)
    sql_plan = spark.sql(_QWINDOW)

    def _norm(d):
        s = d._jdf.queryExecution().executedPlan().toString()
        return re.sub(r"plan_id=\d+", "plan_id=N", re.sub(r"#\d+L?", "#N", s))

    assert _norm(df_plan) == _norm(sql_plan)


def test_event_funnel_plan_one_shuffle_no_joins(qs, spark, sf_dir):
    # r8 DataFrame conversion: conditional-min per user (one hash agg
    # shuffle) + 1-row reduce. The classic funnel-by-self-joins shape
    # (3 event-table shuffles) must never come back.
    s = _summary(qs, spark, sf_dir, "event_funnel")
    assert s["exchanges"] <= 2, s
    assert (
        s["sort_merge_joins"] == 0
        and s["broadcast_hash_joins"] == 0
        and s["nested_loop_joins"] == 0
    ), s


def test_column_correlations_plan_single_pass(qs, spark, sf_dir):
    # r8 DataFrame conversion: three algebraic corr() aggregates in one
    # map-side-combined scan; the only exchange is the 1-row reduce.
    s = _summary(qs, spark, sf_dir, "column_correlations")
    assert s["exchanges"] <= 1, s
    assert s["sorts"] == 0, s
    # scan pruned to the three measure columns
    assert all("l_orderkey" not in rs for rs in s["read_schemas"]), s


def test_pit_join_union_window_plan(qs, spark, sf_dir):
    # The linear-per-key as-of strategy: the whole point is ONE hash
    # exchange feeding a sort + running-frame Window (no candidate-pair
    # join anywhere), then a broadcast join back onto the spine. A
    # second non-broadcast exchange on the stream, or the window frame
    # degrading from the running RowFrame, would re-introduce the
    # scaling cost the strategy exists to remove.
    from tfx_addons_feast_examplegen_spark.plans.explain import plan_text

    df = qs["pit_join_union_window"](spark, sf_dir)
    s = plan_summary(df)
    assert s["nested_loop_joins"] <= 2, s  # literal snapshot-grid only
    # at most the final equi re-attachment join (broadcast at small SF,
    # SMJ at sf0.1+); a SECOND SMJ would be a reintroduced pair join
    assert s["sort_merge_joins"] <= 1, s
    text = plan_text(df)
    assert "Window" in text, text
    assert "unboundedpreceding" in text and "currentrow" in text, text
    # exchanges: spine distinct partial/final + the union stream's one
    # hash partitioning + broadcasts; anything past 6 is a regression
    assert s["exchanges"] <= 6, s


def test_bpe_apply_merges_plan_is_pure_projection(spark):
    # Tokenizer application must be a map over the scan: the merge
    # table rides as plan literals, so ANY exchange, join, or Python
    # eval node means the model leaked out of the projection.
    from tfx_addons_feast_examplegen_spark.operators.text import (
        bpe_apply_merges,
    )
    from tfx_addons_feast_examplegen_spark.plans.explain import plan_text

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    text = plan_text(bpe_apply_merges(df, [("a", "b"), ("ab", "c")]))
    assert "Exchange" not in text, text
    assert "Join" not in text, text
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in text, text


def test_token_budget_full_bucket_path_is_filter_only(spark, sf_dir):
    # Covering budget: the selection is a union of filters — a Window
    # or Sort in this plan reintroduces the global-sort cost the
    # operator exists to remove (the boundary-bucket case is allowed
    # exactly one bucket-scoped Window; see test_token_budget.py).
    from tfx_addons_feast_examplegen_spark.operators.curation import (
        token_budget_select,
    )
    from tfx_addons_feast_examplegen_spark.plans.explain import plan_text

    rows = [(i, float(i % 7), 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "toks"])
    sel = token_budget_select(
        df, "score", "toks", 10**9, id_col="doc_id",
        num_buckets=8, sample_fraction=1.0,
    )
    text = plan_text(sel)
    assert "Window" not in text, text
    assert "Sort" not in text, text


def test_interval_overlap_join_plan(qs, spark, sf_dir):
    # both-sides binned equi-join: never a nested loop / cartesian, and
    # the scans push their IsNotNull filters
    s = _summary(qs, spark, sf_dir, "interval_overlap_join")
    assert s["nested_loop_joins"] == 0, s
    assert s["exchanges"] <= 3, s
    assert any(s["pushed_filters"]), s


def test_q13_plan_no_nested_loop(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "q13_customer_distribution")
    assert s["nested_loop_joins"] == 0, s
    # outer join + two aggregations: bounded exchanges
    assert s["exchanges"] <= 4, s


def test_q21_plan_hash_semi_anti_only(qs, spark, sf_dir):
    # the exists / not-exists chain must plan as one-pass hash
    # semi/anti joins, not per-row subquery rescans or nested loops
    s = _summary(qs, spark, sf_dir, "q21_waiting_suppliers")
    assert s["nested_loop_joins"] == 0, s
    assert (
        s["broadcast_hash_joins"] + s["sort_merge_joins"] >= 3
    ), s
    assert any(s["pushed_filters"]), s


def test_sketch_corpus_overlap_plan(qs, spark, sf_dir):
    # sketch build: one map-side-combinable min aggregate; overlap: k-row
    # broadcast joins. No sort-merge join may ever touch the shingle
    # stream, and nothing nested-loops.
    s = _summary(qs, spark, sf_dir, "sketch_corpus_overlap")
    assert s["nested_loop_joins"] == 0, s
    assert s["broadcast_hash_joins"] >= 2, s
    assert s["sort_merge_joins"] <= 1, s


def test_dhash_neardup_plan_banded_not_allpairs(qs, spark, sf_dir):
    # the pair source must be the banded self-equi-join (shared shuffle
    # subtree), never a cartesian / nested loop over images
    s = _summary(qs, spark, sf_dir, "multimodal_image_dhash_neardup")
    assert s["nested_loop_joins"] == 0, s
    assert s["exchanges"] <= 8, s


def test_audio_fingerprint_neardup_plan_banded_not_allpairs(qs, spark, sf_dir):
    s = _summary(qs, spark, sf_dir, "multimodal_audio_fingerprint_neardup")
    assert s["nested_loop_joins"] == 0, s
    assert s["exchanges"] <= 8, s


def test_multimodal_corpus_prep_plan(qs, spark, sf_dir):
    # three modality legs composed: still zero nested loops, bounded
    # exchanges (each fingerprint leg contributes its banded join)
    s = _summary(qs, spark, sf_dir, "multimodal_corpus_prep")
    assert s["nested_loop_joins"] == 0, s
    assert s["exchanges"] <= 14, s
