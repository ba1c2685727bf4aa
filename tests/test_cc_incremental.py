"""Incremental connected components: maintenance == full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.corpus import (
    connected_components,
    connected_components_incremental,
)


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    return connected_components(df)


def _lab(df):
    return {(r.doc_id, r.cluster) for r in df.collect()}


def test_merge_two_old_components_via_new_edge(spark):
    old = [(1, 2), (3, 4)]
    labels = _cc(spark, old)
    new = spark.createDataFrame([(2, 3)], ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(labels, new))
    want = _lab(_cc(spark, old + [(2, 3)]))
    assert got == want
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_chain_merge_through_new_nodes(spark):
    # a new node bridging three old components plus a fresh pair
    old = [(1, 2), (10, 11), (20, 21)]
    labels = _cc(spark, old)
    new_edges = [(2, 100), (100, 10), (100, 20), (200, 201)]
    new = spark.createDataFrame(new_edges, ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(labels, new))
    want = _lab(_cc(spark, old + new_edges))
    assert got == want
    # everything bridged collapses to min id 1; the fresh pair stands alone
    assert (100, 1) in got and (20, 1) in got and (201, 200) in got


def test_noop_batch_keeps_labels(spark):
    # edges entirely inside existing clusters change nothing
    old = [(1, 2), (2, 3)]
    labels = _cc(spark, old)
    new = spark.createDataFrame([(1, 3), (2, 3)], ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(labels, new))
    assert got == _lab(_cc(spark, old))


def test_self_loop_new_node_is_singleton(spark):
    labels = _cc(spark, [(1, 2)])
    new = spark.createDataFrame([(7, 7)], ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(labels, new))
    assert got == {(1, 1), (2, 1), (7, 7)}


def test_empty_labels_reduces_to_full_cc(spark):
    # bootstrap: no prior labeling at all
    empty = _cc(spark, [(1, 2)]).limit(0)
    edges = [(5, 6), (6, 7), (9, 10)]
    new = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(empty, new))
    assert got == _lab(_cc(spark, edges))


def test_randomized_equivalence(spark):
    # 60 random edges split into an "old" prefix and a "new" batch;
    # maintenance must equal the from-scratch closure every time
    import random

    rng = random.Random(17)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 2 // 3
    labels = _cc(spark, edges[:cut])
    new = spark.createDataFrame(edges[cut:], ["doc_a", "doc_b"])
    got = _lab(connected_components_incremental(labels, new))
    want = _lab(_cc(spark, edges))
    assert got == want
