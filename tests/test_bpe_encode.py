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


def _python_bpe_train(texts, n_merges):
    # independent pure-Python reference: count ALL adjacent pairs,
    # top-1 by (count desc, left asc, right asc), exhaustive
    # left-to-right non-overlapping apply, re-count, repeat
    docs = [[t for t in s.lower().split(" ") if t] for s in texts]
    rules = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for d in docs:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, left, right, left + right, c))
        new_docs = []
        for d in docs:
            out = []
            for tok in d:
                if out and out[-1] == left and tok == right:
                    out[-1] = left + right
                else:
                    out.append(tok)
            new_docs.append(out)
        docs = new_docs
    return rules


def test_bpe_train_iterative_differs_from_one_shot(spark):
    from tfx_addons_feast_examplegen_spark.operators.text import (
        bpe_pair_merges,
        bpe_train,
    )

    # "a b c" x3: round 1 merges (a,b) -> "ab"; round 2 must merge
    # (ab, c) — a pair that does not EXIST in the raw corpus, so the
    # one-shot top-2 of bpe_pair_merges can never select it.
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(3)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(df, n_merges=2).collect()]
    assert got == [(1, "a", "b", "ab", 3), (2, "ab", "c", "abc", 3)]
    oneshot = {
        (r["left_tok"], r["right_tok"])
        for r in bpe_pair_merges(df, top_n=2).collect()
    }
    assert ("ab", "c") not in oneshot  # the loop is not the one-shot

    # early stop: single-token docs leave nothing to merge
    tiny = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert bpe_train(tiny, n_merges=3).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


def test_bpe_train_matches_python_model(spark):
    import random

    from tfx_addons_feast_examplegen_spark.operators.text import bpe_train

    rng = random.Random(2209)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
            for _ in range(12)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_train(df, n_merges=4).collect()]
        want = _python_bpe_train(texts, 4)
        assert got == want, (trial, texts)
