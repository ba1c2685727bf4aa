"""auc_roc: exact tie-aware AUC vs an independent model, contracts, plan.

The operator's claims, each pinned:
- value == the sklearn-style tie-average-rank Mann-Whitney AUC computed
  by an independent pure-Python model (random scores with heavy ties);
- permutation invariance: shuffling which tied rows carry the positive
  label never changes the statistic beyond what ties mathematically
  allow (the tie-average rank is a block property);
- LOUD contracts: NULL/non-binary labels and single-class inputs raise
  instead of returning a biased number;
- plan: no single-partition Exchange anywhere (the reason the operator
  exists — the naive ROW_NUMBER() OVER (ORDER BY score) spelling does).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.stats import auc_roc


def _model_auc(pairs):
    """Tie-average-rank AUC over (score, label) pairs, pure Python."""
    by_score = {}
    for s, y in pairs:
        n, npos = by_score.get(s, (0, 0))
        by_score[s] = (n + 1, npos + y)
    rank = 0
    pos_rank_sum = 0.0
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    for s in sorted(by_score):
        n, npos = by_score[s]
        avg_rank = rank + (n + 1) / 2.0  # 1-based tie-average rank
        pos_rank_sum += npos * avg_rank
        rank += n
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_matches_rank_model_with_ties(spark):
    rng = random.Random(11)
    # 12 distinct scores over 600 rows: every score is a tie block
    pairs = [(rng.randrange(12), rng.randrange(2)) for _ in range(600)]
    df = spark.createDataFrame(pairs, "score int, label int")
    row = auc_roc(df, "score", "label", num_buckets=4).collect()[0]
    want = _model_auc(pairs)
    assert row["auc"] == pytest.approx(want, abs=1e-12)
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == len(pairs) - row["n_pos"]
    # u2 is the exact integer numerator: auc reconstructs from it
    assert row["auc"] == row["u2"] / (2.0 * row["n_pos"] * row["n_neg"])


def test_auc_separable_and_antiseparable(spark):
    # perfectly separated scores -> AUC exactly 1; inverted -> 0
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert auc_roc(df, "score", "label").collect()[0]["auc"] == 1.0
    inv = df.select((-F.col("score")).alias("score"), "label")
    assert auc_roc(inv, "score", "label").collect()[0]["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    df = spark.createDataFrame(
        [(7, i % 2) for i in range(40)], "score int, label int"
    )
    assert auc_roc(df, "score", "label").collect()[0]["auc"] == 0.5


def test_auc_contract_violations_raise(spark):
    from pyspark.errors import PySparkException

    bad_label = spark.createDataFrame(
        [(1.0, 0), (2.0, 2)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="out-of-contract"):
        auc_roc(bad_label, "score", "label").collect()
    null_score = spark.createDataFrame(
        [(1.0, 0), (None, 1)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="out-of-contract"):
        auc_roc(null_score, "score", "label").collect()
    one_class = spark.createDataFrame(
        [(1.0, 1), (2.0, 1)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="single-class"):
        auc_roc(one_class, "score", "label").collect()


def test_auc_plan_has_no_single_partition_stage(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 37).alias("score"), (F.col("id") % 2).alias("label")
    )
    out = auc_roc(df, "score", "label", num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no rank/NTILE window over the whole corpus; the only Window is
    # the bucket-partitioned local rank from the rowid machinery
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # every SinglePartition exchange must be the benign 1-row
        # global-aggregate shape (child is a keys=[] partial agg)
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert (
            "HashAggregate(keys=[]" in child and "partial_" in child
        ), (line, child)
    # and no global Sort feeds a single partition
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            assert "Sort [" not in (
                lines[i + 1] if i + 1 < len(lines) else ""
            ), plan


def test_random_projection_matches_md5_closed_form(spark):
    import hashlib
    import math

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        random_projection,
    )

    vecs = [
        (0, [0.5, -1.25, 2.0, 0.000001]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [-0.75, 0.25, -0.5, 3.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    got = {
        (r["vec_id"], r["dim"]): r["val_micro"]
        for r in random_projection(df, 3, seed="t").collect()
    }

    def sign(i, j):
        h = hashlib.md5(f"t|{i}|{j}".encode()).hexdigest()[:15]
        return 1 if int(h, 16) % 2 == 0 else -1

    want = {}
    for vid, v in vecs:
        xm = [int(math.floor(float(x) * 10**6 + 0.5)) for x in v]
        for j in range(3):
            want[(vid, j)] = sum(
                xm[i] * sign(i, j) for i in range(len(xm))
            )
    assert got == want


def test_random_projection_is_linear_and_seeded(spark):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        random_projection,
    )

    # micro-grid inputs => integerization is exact => projection is
    # exactly linear: proj(a + b) == proj(a) + proj(b)
    a = [0.25, -0.5, 1.75]
    b = [1.5, 2.25, -0.75]
    ab = [x + y for x, y in zip(a, b)]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, ab)], "vec_id bigint, embedding array<float>"
    )
    vals = {
        (r["vec_id"], r["dim"]): r["val_micro"]
        for r in random_projection(df, 4).collect()
    }
    for j in range(4):
        assert vals[(2, j)] == vals[(0, j)] + vals[(1, j)]
    # a different seed draws a different matrix (almost surely)
    other = {
        (r["vec_id"], r["dim"]): r["val_micro"]
        for r in random_projection(df, 4, seed="other").collect()
    }
    assert other != vals
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out_dim"):
        random_projection(df, 0)


def _model_ap(pairs):
    """Threshold-granular AP, pure Python: sum over descending distinct
    scores of (npos_t/n_pos) * (cumTP_t/cumN_t), with each term floored
    to nano-units exactly as the operator does."""
    import math

    by_score = {}
    for s, y in pairs:
        n, npos = by_score.get(s, (0, 0))
        by_score[s] = (n + 1, npos + y)
    n_pos = sum(y for _, y in pairs)
    cn = ctp = 0
    nano = 0
    for s in sorted(by_score, reverse=True):
        n, npos = by_score[s]
        cn += n
        ctp += npos
        nano += int(math.floor(
            float(npos) * float(ctp) * 1e9 / (float(n_pos) * float(cn))
            + 0.5
        ))
    return nano


def test_average_precision_matches_threshold_model(spark):
    from tfx_addons_feast_examplegen_spark.operators.stats import (
        average_precision,
    )

    rng = random.Random(23)
    pairs = [(rng.randrange(15), rng.randrange(2)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "score int, label int")
    row = average_precision(df, "score", "label", num_buckets=4).collect()[0]
    assert row["ap_nano"] == _model_ap(pairs)
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == 500 - row["n_pos"]
    assert row["ap"] == row["ap_nano"] / 1e9


def test_average_precision_perfect_and_random(spark):
    from tfx_addons_feast_examplegen_spark.operators.stats import (
        average_precision,
    )

    # perfect ranking: all positives above all negatives -> AP = 1
    rows = [(float(i), 1 if i >= 80 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert average_precision(df, "score", "label").collect()[0]["ap"] == 1.0
    # all scores tied -> one threshold -> AP = prevalence
    tied = spark.createDataFrame(
        [(5, 1 if i < 30 else 0) for i in range(100)], "score int, label int"
    )
    row = tied and average_precision(tied, "score", "label").collect()[0]
    assert row["ap"] == pytest.approx(0.3, abs=1e-9)


def test_average_precision_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        average_precision,
    )

    no_pos = spark.createDataFrame(
        [(1.0, 0), (2.0, 0)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="without positives"):
        average_precision(no_pos, "score", "label").collect()
    bad = spark.createDataFrame(
        [(1.0, 3)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="out-of-contract"):
        average_precision(bad, "score", "label").collect()


def test_roc_curve_matches_threshold_model_and_auc(spark):
    from tfx_addons_feast_examplegen_spark.operators.stats import (
        auc_roc,
        roc_curve,
    )

    rng = random.Random(31)
    pairs = [(rng.randrange(10), rng.randrange(2)) for _ in range(400)]
    df = spark.createDataFrame(pairs, "score int, label int")
    rows = roc_curve(df, "score", "label", num_buckets=4).collect()
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos

    # independent model: cumulative counts over descending thresholds
    from collections import Counter

    per = Counter()
    pos = Counter()
    for s, y in pairs:
        per[s] += 1
        pos[s] += y
    cn = ctp = 0
    want = {}
    for s in sorted(per, reverse=True):
        cn += per[s]
        ctp += pos[s]
        want[s] = (per[s], pos[s], cn, ctp, ctp / n_pos,
                   (cn - ctp) / n_neg)
    got = {
        r["threshold"]: (r["n_at"], r["pos_at"], r["cum_n"], r["cum_tp"],
                         r["tpr"], r["fpr"])
        for r in rows
    }
    assert got == want
    # the curve ends at (1, 1) and trapezoid-integrates to the exact
    # tie-aware AUC the scalar operator reports
    assert want[min(per)][4] == 1.0 and want[min(per)][5] == 1.0
    pts = sorted((v[5], v[4]) for v in want.values())
    pts = [(0.0, 0.0)] + pts
    area = sum(
        (x2 - x1) * (y1 + y2) / 2.0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    auc = auc_roc(df, "score", "label", num_buckets=4).collect()[0]["auc"]
    assert area == pytest.approx(auc, abs=1e-12)


def test_roc_curve_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.stats import roc_curve

    one_class = spark.createDataFrame(
        [(1.0, 1), (2.0, 1)], "score double, label int"
    )
    with pytest.raises(PySparkException, match="single-class"):
        roc_curve(one_class, "score", "label").collect()
    bad = spark.createDataFrame([(None, 1)], "score double, label int")
    with pytest.raises(PySparkException, match="out-of-contract"):
        roc_curve(bad, "score", "label").collect()


def test_grouped_auc_matches_per_group_model(spark):
    from tfx_addons_feast_examplegen_spark.operators.stats import grouped_auc

    rng = random.Random(41)
    rows = []
    for g in ("en", "de", "th"):
        for _ in range(200):
            rows.append((g, rng.randrange(8), rng.randrange(2)))
    # a single-class group: AUC must be NULL, not an error
    rows += [("xx", 1, 1), ("xx", 2, 1)]
    df = spark.createDataFrame(rows, "g string, score int, label int")
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc"])
        for r in grouped_auc(df, ["g"], "score", "label",
                             num_buckets=4).collect()
    }
    for g in ("en", "de", "th"):
        pairs = [(s, y) for gg, s, y in rows if gg == g]
        want = _model_auc(pairs)
        assert got[g][3] == pytest.approx(want, abs=1e-12)
        assert got[g][0] == sum(y for _, y in pairs)
    assert got["xx"] == (2, 0, None, None)


def test_grouped_auc_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.stats import grouped_auc

    df = spark.createDataFrame([("a", 1.0, 5)], "g string, score double, label int")
    with pytest.raises(ValueError, match="group_cols"):
        grouped_auc(df, [], "score", "label")
    with pytest.raises(PySparkException, match="out-of-contract"):
        grouped_auc(df, ["g"], "score", "label").collect()


def test_ndcg_matches_python_model(spark):
    import math

    from tfx_addons_feast_examplegen_spark.operators.text import ndcg_at_k

    rng = random.Random(53)
    rows = []
    for q in ("q1", "q2"):
        for i in range(30):
            rows.append((q, float(rng.randrange(100)), i, rng.randrange(4)))
    # an all-zero-relevance query: idcg = 0 -> ndcg NULL
    rows += [("q0", 1.0, 0, 0), ("q0", 2.0, 1, 0)]
    df = spark.createDataFrame(
        rows, "q string, score double, doc_id int, rel int"
    )
    got = {
        r["q"]: (r["dcg_micro"], r["idcg_micro"], r["ndcg"])
        for r in ndcg_at_k(df, "q", "score", "rel", 10).collect()
    }

    def model(q):
        items = [(s, i, rel) for qq, s, i, rel in rows if qq == q]
        by_score = sorted(items, key=lambda t: (-t[0], t[1]))
        by_rel = sorted(items, key=lambda t: (-t[2], t[1]))
        def dcg(seq):
            return sum(
                int(math.floor(
                    float((1 << rel) - 1) / math.log2(float(rk) + 1.0)
                    * 10**6
                ))
                for rk, (_, _, rel) in enumerate(seq[:10], start=1)
            )
        return dcg(by_score), dcg(by_rel)

    for q in ("q1", "q2"):
        d, i = model(q)
        assert got[q] == (d, i, d / i)
    assert got["q0"] == (0, 0, None)
    # perfect ranking: score == rel ordering -> ndcg exactly 1
    perfect = spark.createDataFrame(
        [("p", float(r), i, r) for i, r in enumerate([3, 2, 2, 1, 0])],
        "q string, score double, doc_id int, rel int",
    )
    row = ndcg_at_k(perfect, "q", "score", "rel", 5).collect()[0]
    assert row["ndcg"] == 1.0


def test_ndcg_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.text import ndcg_at_k

    df = spark.createDataFrame(
        [("q", 1.0, 0, 31)], "q string, score double, doc_id int, rel int"
    )
    with pytest.raises(PySparkException, match="\\[0, 30\\]"):
        ndcg_at_k(df, "q", "score", "rel", 5).collect()
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(df, "q", "score", "rel", 0)


def test_mrr_matches_python_model(spark):
    from tfx_addons_feast_examplegen_spark.operators.text import mrr_at_k

    rng = random.Random(61)
    rows = []
    for qi in range(6):
        for i in range(20):
            rows.append((f"q{qi}", float(rng.randrange(50)), i,
                         1 if rng.random() < 0.2 else 0))
    df = spark.createDataFrame(
        rows, "q string, score double, doc_id int, rel int"
    )
    row = mrr_at_k(df, "q", "score", "rel", 10).collect()[0]

    per_q = {}
    for q, s, i, rel in rows:
        per_q.setdefault(q, []).append((s, i, rel))
    total = 0
    hits = 0
    for q, items in per_q.items():
        ranked = sorted(items, key=lambda t: (-t[0], t[1]))
        first = next(
            (rk for rk, (_, _, rel) in enumerate(ranked[:10], 1) if rel > 0),
            None,
        )
        if first is not None:
            hits += 1
            total += 10**6 // first
    assert row["n_queries"] == 6
    assert row["n_hit"] == hits
    assert row["sum_rr_micro"] == total
    assert row["mrr"] == total / (6 * 1e6)


def test_mrr_contracts_and_edges(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.text import mrr_at_k

    # relevant result at rank 1 in one query, none in the other
    df = spark.createDataFrame(
        [("a", 9.0, 0, 1), ("a", 5.0, 1, 0), ("b", 9.0, 0, 0)],
        "q string, score double, doc_id int, rel int",
    )
    row = mrr_at_k(df, "q", "score", "rel", 10).collect()[0]
    assert (row["n_queries"], row["n_hit"], row["sum_rr_micro"]) == (
        2, 1, 10**6
    )
    nulls = spark.createDataFrame(
        [("a", 1.0, 0, None)], "q string, score double, doc_id int, rel int"
    )
    with pytest.raises(PySparkException, match="non-NULL"):
        mrr_at_k(nulls, "q", "score", "rel", 5).collect()
    with pytest.raises(ValueError, match="k must be"):
        mrr_at_k(df, "q", "score", "rel", 0)
