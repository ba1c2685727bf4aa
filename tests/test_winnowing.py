"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003).

Pins the operator to an independent pure-Python reference (hash
selection, rightmost-min tie-break, partial-window short docs) and to
the paper's detection guarantee: any shared token run of at least
``w + k - 1`` tokens yields at least one shared fingerprint.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators import dedup as dd


def ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Straight-from-the-paper reference: set of (hash, 1-based pos).

    Matches the operator's no-empty-filtering contract: ``split`` on a
    single space KEEPS empty tokens from consecutive spaces, and an
    empty text produces one empty token (both the operator and its
    DuckDB oracle agree on this; Python's ``"".split(" ") == [""]``
    matches), so the reference must not filter them.
    """
    toks = text.lower().split(" ")
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:11], 16) for g in grams]
    sel: set[tuple[int, int]] = set()
    for s in range(max(1, len(hs) - w + 1)):
        window = hs[s : s + w]
        m = min(window)
        pos = s + max(i for i, h in enumerate(window) if h == m)
        sel.add((m, pos + 1))
    return sel


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a b c"),  # fewer than k tokens -> no fingerprints at k=4
    (3, "a b c d"),  # exactly k tokens -> one gram, one partial window
    (4, "x x x x x x x x"),  # identical grams -> tie-break exercised
    (5, "one two three four five six"),  # ng < w -> single partial window
    (6, ""),  # empty text -> one empty token -> no fingerprints at k>=2
    (7, "gap  between and  more gap  between"),  # double spaces -> empty
    # tokens KEPT: grams spanning them must match operator + oracle
]


@pytest.mark.parametrize("k,w", [(4, 4), (3, 5), (2, 2), (5, 1)])
def test_matches_reference_implementation(spark, k, w):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in dd.winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = {(d, h, p) for d, t in DOCS for (h, p) in ref_winnow(t, k, w)}
    assert got == want


def test_detection_guarantee(spark):
    # The paper's theorem: a shared run of w + k - 1 tokens spans at
    # least one full window of shared grams, and every window selects a
    # fingerprint, so the two documents MUST share one. Plant exactly
    # the minimal run (k=4, w=4 -> 7 tokens) inside otherwise-disjoint
    # documents and assert the fingerprint sets intersect.
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    df = spark.createDataFrame(
        [
            (1, "p q r s t u v w " + shared + " aa bb cc dd"),
            (2, "zz yy xx ww vv " + shared + " m n o p2 q2 r2 s2"),
        ],
        ["doc_id", "text"],
    )
    fp = dd.winnow_fingerprints(df, k=4, w=4)
    a = {r.fp_hash for r in fp.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp_hash for r in fp.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "shared run of w+k-1 tokens must share a fingerprint"


def test_density_is_sublinear_in_grams(spark):
    # Expected selection density is ~2/(w+1); assert the coarse bound
    # (strictly fewer fingerprints than grams for a long random-ish doc,
    # and no more than ng - w + 1 window starts).
    text = " ".join(f"tok{i * 7919 % 101}" for i in range(300))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    n_fp = dd.winnow_fingerprints(df, k=4, w=4).count()
    ng = 300 - 4 + 1
    assert 0 < n_fp <= ng - 4 + 1
    assert n_fp < ng / 2  # far below the full gram count


def test_pairs_scored_on_selected_sets(spark):
    # Jaccard uses the DISTINCT selected-hash sets: two identical docs
    # pair at 1.0; disjoint docs never meet.
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = dd.winnow_pairs(df, k=4, w=4, threshold=0.3).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_winnow_pairs_no_cartesian(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = dd.winnow_pairs(df, k=4, w=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_position_budget_guard(spark):
    # > 65535 grams in one document must fail loudly (packed-position
    # overflow would otherwise corrupt the tie-break silently).
    text = " ".join(f"t{i}" for i in range(66000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    with pytest.raises(Exception, match="exceeds|ASSERT"):
        dd.winnow_fingerprints(df, k=4, w=4).count()


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="k and w"):
        dd.winnow_fingerprints(df, k=0, w=4)
    with pytest.raises(ValueError, match="k and w"):
        dd.winnow_fingerprints(df, k=4, w=0)
