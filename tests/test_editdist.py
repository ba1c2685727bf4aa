"""Edit-distance similarity join: brute-force equivalence + plan shape.

The segment-pigeonhole generator (PassJoin) claims exactness — no false
negatives from candidate generation, none from the thresholded verify —
so the test is a literal quadratic Levenshtein replay over adversarial
fixtures: empty strings, lengths straddling the short-pool boundary
(< k+1), equal-length ties, and injected near-dups.
"""

from __future__ import annotations

import itertools
import random

import pytest

from tfx_addons_feast_examplegen_spark.operators.editdist import editdist_pairs


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


def _corpus(seed: int, n: int = 80) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    al = "abcd"
    strs = ["".join(rng.choice(al) for _ in range(rng.randint(0, 18))) for _ in range(n)]
    for _ in range(n // 5):  # mutated near-dups of existing strings
        s = list(rng.choice(strs))
        for _ in range(rng.randint(0, 3)):
            if not s:
                break
            p, op = rng.randrange(len(s)), rng.randint(0, 2)
            if op == 0:
                s[p] = rng.choice(al)
            elif op == 1:
                del s[p]
            else:
                s.insert(p, rng.choice(al))
        strs.append("".join(s))
    return list(enumerate(strs))


@pytest.mark.parametrize("k", [0, 1, 3, 5])
def test_matches_bruteforce(spark, k):
    rows = _corpus(seed=11 + k)
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        (r["doc_a"], r["doc_b"], r["ed"])
        for r in editdist_pairs(df, "id", "t", k=k).collect()
    }
    exp = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }
    assert got == exp


def test_null_text_never_matches(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh"), (3, None)], ["id", "t"]
    )
    got = {(r["doc_a"], r["doc_b"]) for r in editdist_pairs(df, "id", "t", k=2).collect()}
    assert got == {(1, 2)}


def test_k_zero_is_exact_join(spark):
    df = spark.createDataFrame(
        [(1, "xyz"), (2, "xyz"), (3, "xyw"), (4, ""), (5, "")], ["id", "t"]
    )
    got = {
        (r["doc_a"], r["doc_b"], r["ed"])
        for r in editdist_pairs(df, "id", "t", k=0).collect()
    }
    assert got == {(1, 2, 0), (4, 5, 0)}


def test_negative_k_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "t"])
    with pytest.raises(ValueError):
        editdist_pairs(df, "id", "t", k=-1)


def test_no_cartesian_product(spark):
    # The candidate generator is an equi-join on (segment slot, exact
    # segment text) — a cross product anywhere means the pigeonhole
    # filter fell out of the plan. (The short-string pool joins under a
    # broadcast on a length band; that is bounded by construction and
    # is not a CartesianProduct node.)
    df = spark.createDataFrame(
        [(i, "abcdefghijklmnop"[: 8 + i % 8]) for i in range(20)], ["id", "t"]
    )
    plan = editdist_pairs(df, "id", "t", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
