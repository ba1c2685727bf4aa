"""bpe_apply_merges: reference-implementation equivalence + invariants."""

from __future__ import annotations

import random

import pytest

from tfx_addons_feast_examplegen_spark.operators.text import bpe_apply_merges


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    ts = [t for t in text.lower().split(" ") if t]
    for a, b in merges:
        out: list[str] = []
        for x in ts:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        ts = out
    return ts


MERGES = [("a", "a"), ("a", "b"), ("ab", "c"), ("aa", "a")]


def test_matches_reference(spark):
    rng = random.Random(2)
    vocab = ["a", "b", "c", "ab", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(200)
    ]
    # run-overlap, chained-merge, empty, and whitespace edge cases
    rows += [(200, "a a a a a"), (201, "a b a b c"), (202, ""), (203, "  a  b ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_apply_merges(df, MERGES).collect()
    }
    for i, t in rows:
        exp = _ref_encode(t, MERGES)
        assert got[i] == (exp, len(exp)), (i, t)


def test_run_overlap_is_leftmost_greedy(spark):
    # "a a a": merge (1,2) -> ["aa", "a"]; the fresh "aa" must NOT
    # re-match rule (a, a).
    df = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    [r] = bpe_apply_merges(df, [("a", "a")]).collect()
    assert r["tokens"] == ["aa", "a"]


def test_rule_order_matters(spark):
    # (a,b) first consumes the b that (b,c) would otherwise take.
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    [r1] = bpe_apply_merges(df, [("a", "b"), ("b", "c")]).collect()
    [r2] = bpe_apply_merges(df, [("b", "c"), ("a", "b")]).collect()
    assert r1["tokens"] == ["ab", "c"]
    assert r2["tokens"] == ["a", "bc"]


def test_empty_merge_table_is_tokenize(spark):
    df = spark.createDataFrame([(1, " x  y ")], ["doc_id", "text"])
    [r] = bpe_apply_merges(df, []).collect()
    assert r["tokens"] == ["x", "y"] and r["n_tokens"] == 2


def test_empty_rule_token_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_apply_merges(df, [("a", "")])


def test_fixpoint_invariant(spark):
    # after encoding, concatenating tokens reproduces the original
    # word stream (merges only join, never drop or reorder).
    rng = random.Random(9)
    vocab = ["x", "y", "z", "xy"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_apply_merges(df, [("x", "y"), ("xy", "z")]).collect()
    }
    for i, t in rows:
        assert "".join(got[i]) == t.replace(" ", "")
