"""Curation operators: decontamination, sampling, quotas, packing."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.curation import (
    decontaminate,
    group_quota,
    pack_sequences,
    stratified_sample,
)
from tfx_addons_feast_examplegen_spark.operators.split import _KNUTH


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_decontaminate_drops_overlap_keeps_clean(spark):
    corpus = _docs(
        spark,
        [
            "the capital of france is paris today",   # contaminated (3-gram)
            "completely unrelated text about spark jobs",
            "tiny",                                   # too short to shingle -> kept
        ],
    )
    bench = spark.createDataFrame(
        [Row(text="what is the capital of france")], "text string"
    )
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=3).collect()}
    assert kept == {1, 2}


def test_decontaminate_benchmark_side_not_kept(spark):
    # Decontamination filters the corpus only; output schema == corpus.
    corpus = _docs(spark, ["alpha beta gamma delta"])
    bench = spark.createDataFrame([Row(text="zeta eta theta iota")], "text string")
    out = decontaminate(corpus, bench, n=3)
    assert out.columns == ["doc_id", "text"]
    assert out.count() == 1


def test_stratified_sample_matches_arithmetic(spark):
    rows = [Row(k=i, g="a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, g string")
    fractions = {"a": 0.3, "b": 0.05}
    got = {r.k for r in stratified_sample(df, "k", "g", fractions).collect()}
    want = {
        r.k
        for r in rows
        if (r.k * _KNUTH) % (2**31) % 10_000
        < round(fractions[r.g] * 10_000)
    }
    assert got == want and 0 < len(want) < 1000


def test_stratified_sample_unlisted_group_dropped(spark):
    df = spark.createDataFrame(
        [Row(k=i, g="x") for i in range(100)], "k long, g string"
    )
    assert stratified_sample(df, "k", "g", {"other": 1.0}).count() == 0
    assert stratified_sample(df, "k", "g", {"x": 1.0}).count() == 100


def test_group_quota_top_k_with_tiebreak(spark):
    df = spark.createDataFrame(
        [Row(g="a", id=i, score=10 - (i % 3)) for i in range(6)]
        + [Row(g="b", id=i, score=1) for i in range(2)],
        "g string, id long, score long",
    )
    out = group_quota(df, "g", "score", 2, id_col="id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.g, []).append((r.quota_rank, r.id, r.score))
    # group a: score 10 at ids 0 and 3 -> tie broken by id ascending
    assert sorted(by_group["a"]) == [(1, 0, 10), (2, 3, 10)]
    # group b has only 2 rows; both kept, ranked by id
    assert sorted(by_group["b"]) == [(1, 0, 1), (2, 1, 1)]


def test_pack_sequences_layout(spark):
    # tokens: 300, 300, 300 in one group with budget 512:
    # starts 0, 300, 600 -> packs 0, 0, 1; offsets 0, 300, 88.
    df = spark.createDataFrame(
        [Row(g="s", id=i, n=300) for i in range(3)], "g string, id long, n long"
    )
    out = {
        r.id: (r.pack_id, r.pack_offset)
        for r in pack_sequences(
            df, group_col="g", id_col="id", token_col="n", budget=512
        ).collect()
    }
    assert out == {0: (0, 0), 1: (0, 300), 2: (1, 88)}


def test_pack_sequences_groups_independent(spark):
    df = spark.createDataFrame(
        [Row(g=g, id=i, n=400) for g in ("x", "y") for i in range(2)],
        "g string, id long, n long",
    )
    out = pack_sequences(
        df, group_col="g", id_col="id", token_col="n", budget=512
    ).collect()
    for r in out:
        assert (r.pack_id, r.pack_offset) == ((0, 0) if r.id == 0 else (0, 400))


def test_pack_sequences_properties_hypothesis(spark_prop):
    # Invariants for arbitrary token streams: offsets stay inside the
    # budget, pack ids are monotone in document order, and the layout is
    # gap-free (each doc starts exactly where the previous one ended, in
    # the concatenated stream).
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        tokens=st.lists(st.integers(min_value=0, max_value=700),
                        min_size=1, max_size=12),
        budget=st.integers(min_value=1, max_value=600),
    )
    def check(tokens, budget):
        df = spark_prop.createDataFrame(
            [Row(g="s", id=i, n=t) for i, t in enumerate(tokens)],
            "g string, id long, n long",
        )
        rows = sorted(
            pack_sequences(
                df, group_col="g", id_col="id", token_col="n", budget=budget
            ).collect(),
            key=lambda r: r.id,
        )
        start = 0
        for r in rows:
            assert 0 <= r.pack_offset < budget
            assert r.pack_id == start // budget
            assert r.pack_offset == start % budget
            start += tokens[r.id]

    check()


def test_stratified_sample_is_stable_subset(spark_prop):
    # Determinism + subset property: a smaller fraction's selection is a
    # subset of a larger one's (threshold semantics), and re-runs agree.
    df = spark_prop.createDataFrame(
        [Row(k=i, g="a") for i in range(500)], "k long, g string"
    )
    small = {r.k for r in stratified_sample(df, "k", "g", {"a": 0.1}).collect()}
    big = {r.k for r in stratified_sample(df, "k", "g", {"a": 0.4}).collect()}
    again = {r.k for r in stratified_sample(df, "k", "g", {"a": 0.1}).collect()}
    assert small <= big
    assert small == again


def test_weighted_sample_extremes_and_determinism(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [Row(k=i, w=1.0) for i in range(50)]
        + [Row(k=i, w=0.0) for i in range(50, 100)],
        "k long, w double",
    )
    kept = weighted_sample(df, "k", "w").collect()
    assert sorted(r.k for r in kept) == list(range(50))  # w=1 all, w=0 none
    again = weighted_sample(df.repartition(7), "k", "w").collect()
    assert sorted(r.k for r in again) == sorted(r.k for r in kept)


def test_weighted_sample_rate_tracks_weight(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [Row(k=i, w=0.3) for i in range(2000)], "k long, w double"
    )
    n = weighted_sample(df, "k", "w").count()
    assert 0.25 < n / 2000 < 0.35


def test_negative_sample_excludes_positives_and_is_deterministic(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.curation import negative_sample

    users = spark.createDataFrame([Row(u=i) for i in range(20)], "u long")
    items = spark.createDataFrame([Row(it=i) for i in range(200)], "it long")
    inter = spark.createDataFrame(
        [Row(u=u, it=it) for u in range(20) for it in range(0, 200, 3)],
        "u long, it long",
    )
    out = negative_sample(
        users, items, inter, user_col="u", item_col="it", k=2, n_buckets=4
    )
    rows = out.collect()
    pos = {(r.u, r.it) for r in inter.collect()}
    assert all((r.u, r.it) not in pos for r in rows)
    assert all(r.rank in (1, 2) for r in rows)
    per_user = {}
    for r in rows:
        per_user.setdefault(r.u, []).append(r.it)
    assert all(len(v) <= 2 for v in per_user.values())
    again = negative_sample(
        users.repartition(5), items, inter, user_col="u", item_col="it",
        k=2, n_buckets=4,
    ).collect()
    assert {(r.u, r.it, r.rank) for r in again} == {
        (r.u, r.it, r.rank) for r in rows
    }


def test_temperature_mix_upweights_tail(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.curation import (
        temperature_mix,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    out = temperature_mix(docs, "doc_id", "lang", alpha=0.5, target_rows=300)
    taken = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(taken.values())
    assert abs(total - 300) <= 60  # hash-grid sampling noise
    # alpha<1 compresses ratios: the head/tail TAKE ratio must be far
    # below the head/tail SIZE ratio
    head = max(sizes, key=sizes.get)
    tail = min(sizes, key=sizes.get)
    assert sizes[head] / sizes[tail] > 2.5
    assert taken[head] / taken[tail] < sizes[head] / sizes[tail] * 0.75
    # determinism: rerun selects the same rows
    again = temperature_mix(docs, "doc_id", "lang", alpha=0.5, target_rows=300)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0

    # alpha=1 keeps natural proportions (rate identical across groups)
    nat = temperature_mix(docs, "doc_id", "lang", alpha=1.0, target_rows=300)
    nt = {r.lang: r.n for r in nat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    rates = [nt[g] / sizes[g] for g in nt]
    assert max(rates) - min(rates) < 0.25


def test_length_bucketing_padding_waste(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.curation import (
        length_bucketing,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (i + 1))) for i in range(8)],
        "doc_id long, text string",
    )
    rows = sorted(length_bucketing(df, n_buckets=4).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == [1, 2, 3, 4]
    assert all(r.n_docs == 2 for r in rows)
    # lengths 1..8 in order: buckets (1,2),(3,4),(5,6),(7,8)
    assert [(r.min_len, r.max_len) for r in rows] == [
        (1, 2), (3, 4), (5, 6), (7, 8)
    ]
    assert all(r.padding_waste == 1 for r in rows)


def test_fingerprint_samplers_reject_string_keys(spark):
    # Review finding (r6): fingerprint arithmetic starts with
    # cast('long'), which nulls out string ids — every bucket
    # comparison then silently drops/mismatches all rows. The
    # DataFrame-level entry points now fail fast instead.
    import pytest as _pytest
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.curation import (
        negative_sample,
        stratified_sample,
        weighted_sample,
    )
    from tfx_addons_feast_examplegen_spark.operators.split import (
        fingerprint_split,
    )

    sdf = spark.createDataFrame(
        [Row(k="u_1", g="a", w=0.5)], "k string, g string, w double"
    )
    with _pytest.raises(TypeError, match="integral key"):
        stratified_sample(sdf, "k", "g", {"a": 0.5})
    with _pytest.raises(TypeError, match="integral key"):
        weighted_sample(sdf, "k", "w")
    with _pytest.raises(TypeError, match="integral key"):
        fingerprint_split(sdf, "k")
    users = spark.createDataFrame([Row(u="a")], "u string")
    items = spark.createDataFrame([Row(i=1)], "i long")
    inter = spark.createDataFrame([Row(u="a", i=1)], "u string, i long")
    with _pytest.raises(TypeError, match="integral key"):
        negative_sample(users, items, inter, user_col="u", item_col="i")


def test_contamination_report_hand_computed(spark):
    from tfx_addons_feast_examplegen_spark.operators.curation import (
        contamination_report,
    )

    # bench example 100: "the capital of france is paris" -> 4 distinct
    # 3-grams. Doc 0 quotes "the capital of france" (2 of 4 -> 0.5);
    # doc 1 shares nothing; doc 2 quotes the whole example (4 of 4).
    corpus = _docs(
        spark,
        [
            "today the capital of france was discussed",
            "completely unrelated text about spark jobs",
            "quiz answer the capital of france is paris indeed",
        ],
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the capital of france is paris")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.bench_id): (r.overlap_ngrams, r.bench_ngrams, r.frac)
        for r in contamination_report(
            corpus, bench, n=3, min_frac=0.0
        ).collect()
    }
    assert got == {(0, 100): (2, 4, 0.5), (2, 100): (4, 4, 1.0)}

    # min_frac is a real filter: 0.6 keeps only the full quote
    flagged = contamination_report(corpus, bench, n=3, min_frac=0.6)
    assert [r.doc_id for r in flagged.collect()] == [2]


def test_contamination_report_hashed_matches_strings(spark):
    from tfx_addons_feast_examplegen_spark.operators.curation import (
        contamination_report,
    )

    corpus = _docs(
        spark,
        ["alpha beta gamma delta epsilon", "beta gamma delta zeta eta"],
    )
    bench = spark.createDataFrame(
        [Row(doc_id=7, text="beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    kw = dict(n=3, min_frac=0.0)
    via_hash = {
        tuple(r)
        for r in contamination_report(corpus, bench, hashed=True, **kw).collect()
    }
    via_str = {
        tuple(r)
        for r in contamination_report(corpus, bench, hashed=False, **kw).collect()
    }
    assert via_hash == via_str and via_hash


def test_contamination_report_validation_and_plan(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.curation import (
        contamination_report,
    )

    corpus = _docs(spark, ["a b c d"])
    bench = spark.createDataFrame([Row(doc_id=1, text="a b c")],
                                  "doc_id long, text string")
    with _pytest.raises(ValueError, match="min_frac"):
        contamination_report(corpus, bench, min_frac=1.5)
    # benchmark side broadcasts (the corpus never shuffles as join input)
    plan = contamination_report(corpus, bench, n=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_categorical_mi_hand_computed(spark):
    import math

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        categorical_mutual_information,
    )

    # independent, balanced 2x2 -> MI exactly 0, H = 1 bit each side
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv"], "a string, b string"
    )
    r = categorical_mutual_information(ind, "a", "b").collect()[0]
    assert r["n"] == 4 and r["mi"] == 0.0
    assert r["h_a"] == 1.0 and r["h_b"] == 1.0 and r["nmi"] == 0.0

    # perfectly dependent -> MI = H = 1 bit, NMI = 1
    dep = spark.createDataFrame(
        [("x", "u"), ("y", "v")], "a string, b string"
    )
    r2 = categorical_mutual_information(dep, "a", "b").collect()[0]
    assert r2["mi"] == 1.0 and r2["nmi"] == 1.0

    # hand 2x2 with skew: counts xu=2, xv=1, yu=1 (n=4)
    sk = spark.createDataFrame(
        [("x", "u"), ("x", "u"), ("x", "v"), ("y", "u")],
        "a string, b string",
    )
    r3 = categorical_mutual_information(sk, "a", "b").collect()[0]
    n = 4.0
    mi = sum(
        (c / n) * math.log2(c * n / (ca * cb))
        for c, ca, cb in [(2, 3, 3), (1, 3, 1), (1, 1, 3)]
    )
    assert r3["mi"] == round(mi, 6)

    # a constant column has H=0 -> NMI is NULL, MI 0
    const = spark.createDataFrame(
        [("x", "u"), ("x", "v")], "a string, b string"
    )
    r4 = categorical_mutual_information(const, "a", "b").collect()[0]
    assert r4["mi"] == 0.0 and r4["h_a"] == 0.0 and r4["nmi"] is None

    # NULLs in either column drop the row
    withnull = spark.createDataFrame(
        [("x", None), (None, "u"), ("x", "u"), ("y", "v")],
        "a string, b string",
    )
    assert categorical_mutual_information(
        withnull, "a", "b"
    ).collect()[0]["n"] == 2


def test_greedy_max_coverage_hand_and_model(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.curation import (
        greedy_max_coverage,
    )

    # doc 1 covers {a b c, b c d} (2 shingles), doc 2 duplicates doc 1,
    # doc 3 adds one new shingle, doc 4 is pure repetition of doc 3
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: "a b c", "b c d"
            (2, "a b c d"),        # duplicate -> never adds coverage
            (3, "x y z"),          # "x y z"
            (4, "x y z x y z"),    # adds "y z x", "z x y"
        ],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in greedy_max_coverage(docs, k=4, n=3).collect()
    ]
    # round 1: doc 4 has 3 distinct shingles (x y z, y z x, z x y).
    # round 2: doc 1 adds 2. round 3: nothing adds coverage -> stop.
    assert got == [(1, 4, 3, 3), (2, 1, 2, 5)]

    # tie-break: two equal-coverage docs -> smallest id first
    tie = spark.createDataFrame(
        [(7, "p q r"), (5, "s t u")], "doc_id long, text string"
    )
    first = greedy_max_coverage(tie, k=1, n=3).collect()[0]
    assert first["doc_id"] == 5

    with _pytest.raises(ValueError, match="k must"):
        greedy_max_coverage(docs, k=0)

    # VERDICT r14 item 6 red-proof: the covered set is counted each
    # round and a cap breach fails LOUD before the next broadcast
    # (doc 4 contributes 3 shingles > cap 2 after round 1)
    with _pytest.raises(ValueError, match="max_covered_broadcast"):
        greedy_max_coverage(docs, k=4, n=3, max_covered_broadcast=2)
    # at-cap passes: the same data under a sufficient cap completes
    assert (
        greedy_max_coverage(docs, k=4, n=3, max_covered_broadcast=5)
        .count()
        == 2
    )

    # random-graph property: matches an independent Python greedy
    import random

    rng = random.Random(1807)
    for trial in range(2):
        nd = rng.randint(4, 8)
        vocab = [f"w{i}" for i in range(10)]
        texts = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            for i in range(nd)
        ]
        sh = {
            i: {
                " ".join(t.split()[j : j + 3])
                for j in range(len(t.split()) - 2)
            }
            for i, t in texts
        }
        covered: set = set()
        expect = []
        for rank in range(1, 4):
            best = max(
                sh, key=lambda d: (len(sh[d] - covered), -d), default=None
            )
            gain = len(sh[best] - covered)
            if gain == 0:
                break
            covered |= sh[best]
            expect.append((rank, best, gain, len(covered)))
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = [
            tuple(r) for r in greedy_max_coverage(df, k=3, n=3).collect()
        ]
        assert got == expect, (trial, texts)


def test_assign_grouped_row_ids_matches_naive_window(spark):
    import random

    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        assign_grouped_row_ids,
    )

    rng = random.Random(1901)
    rows = [
        (rng.randrange(10_000), f"g{rng.randrange(5)}")
        for _ in range(400)
    ]
    rows = list({(k, g) for k, g in rows})  # unique keys per group
    df = spark.createDataFrame(rows, "key long, grp string")
    got = {
        (r["grp"], r["key"]): r["k"]
        for r in assign_grouped_row_ids(
            df, ["grp"], "key", id_col="k", num_buckets=8
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("key")
    want = {
        (r["grp"], r["key"]): r["k"]
        for r in df.withColumn("k", F.row_number().over(w)).collect()
    }
    assert got == want

    # validation: non-numeric order col, duplicate id col, cap
    sdf = spark.createDataFrame([("a", "g")], "key string, grp string")
    with _pytest.raises(ValueError, match="numeric"):
        assign_grouped_row_ids(sdf, ["grp"], "key")
    with _pytest.raises(ValueError, match="already present"):
        assign_grouped_row_ids(df, ["grp"], "key", id_col="grp")
    with _pytest.raises(ValueError, match="max_offset_entries"):
        assign_grouped_row_ids(
            df, ["grp"], "key", num_buckets=8, max_offset_entries=2
        )


def test_assign_grouped_row_ids_null_groups_do_not_collide(spark):
    # ADVICE r14: a bare concat_ws offset key silently skips NULLs, so
    # NULL collided with '' and ('a', NULL) with (NULL, 'a') — the
    # offset table merged those cells while the rank window kept them
    # apart, yielding overlapping ranks. NULL group values are now
    # encoded distinctly and must rank exactly like the naive window.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        assign_grouped_row_ids,
    )

    rows = []
    k = 0
    for ga, gb in [
        (None, None), ("", ""), (None, ""), ("", None),
        ("a", None), (None, "a"), ("a", "a"),
    ]:
        for _ in range(5):
            rows.append((k, ga, gb))
            k += 1
    df = spark.createDataFrame(rows, "key long, ga string, gb string")
    got = {
        (r["ga"], r["gb"], r["key"]): r["k"]
        for r in assign_grouped_row_ids(
            df, ["ga", "gb"], "key", id_col="k", num_buckets=4
        ).collect()
    }
    w = Window.partitionBy("ga", "gb").orderBy("key")
    want = {
        (r["ga"], r["gb"], r["key"]): r["k"]
        for r in df.withColumn("k", F.row_number().over(w)).collect()
    }
    assert got == want
    # single NULL group alone also ranks 1..n (the NULL-vs-'' case)
    one = spark.createDataFrame(
        [(1, None), (2, ""), (3, None), (4, "")], "key long, g string"
    )
    ranks = {
        (r["g"], r["key"]): r["k"]
        for r in assign_grouped_row_ids(
            one, ["g"], "key", id_col="k", num_buckets=2
        ).collect()
    }
    assert ranks == {
        (None, 1): 1, (None, 3): 2, ("", 2): 1, ("", 4): 2,
    }


def test_interleave_by_rate_stride_invariant(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.curation import (
        interleave_by_rate,
    )

    rows = [(i, f"s{i % 3}") for i in range(90)]  # 30 per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": 3.0, "s1": 1.0}  # s2 unrated -> dropped
    out = interleave_by_rate(df, "source", rates).collect()
    assert {r["source"] for r in out} == {"s0", "s1"}
    # pos ordering realizes the 3:1 mix: in every prefix of the pos
    # order, source counts match the rates within +-1 (the stride
    # scheduling invariant)
    ordered = sorted(out, key=lambda r: (r["pos"], r["source"]))
    seen = {"s0": 0, "s1": 0}
    total_rate = 4.0
    # the stride invariant holds while every source still has items:
    # s0 (30 rows at rate 3/4) exhausts at global prefix 30*4/3 = 40
    sustainable = 40
    for i, r in enumerate(ordered, start=1):
        seen[r["source"]] += 1
        if i <= sustainable:
            assert abs(seen["s0"] - i * 3.0 / total_rate) <= 1.0, i
            assert abs(seen["s1"] - i * 1.0 / total_rate) <= 1.0, i
    # positions are the stride arithmetic exactly — UNROUNDED (ADVICE
    # r14: a 1e-6 grid tied large ranks/rates and broke the order)
    by = {(r["source"], r["k"]): r["pos"] for r in out}
    assert by[("s0", 1)] == 0.5 / 3.0
    assert by[("s1", 2)] == 1.5

    # large ranks at a large rate stay strictly increasing (on the old
    # 1e-6 grid, rank steps of 1/rate = 1e-7 collided into ties)
    big = spark.createDataFrame(
        [(i, "s") for i in range(10_000_000, 10_000_050)],
        "doc_id long, source string",
    )
    pos = [
        r["pos"]
        for r in interleave_by_rate(big, "source", {"s": 1.0e7})
        .orderBy("k")
        .collect()
    ]
    assert all(a < b for a, b in zip(pos, pos[1:]))

    with _pytest.raises(ValueError, match="rate"):
        interleave_by_rate(df, "source", {"s0": 0.0})
    with _pytest.raises(ValueError, match="non-empty"):
        interleave_by_rate(df, "source", {})


def test_quantile_shift_hand_computed(spark):
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        quantile_shift,
    )

    # group a = {1..10}/10, group b = a + 0.2: every quantile shifts
    # by exactly +0.2
    rows = [(i / 10.0, "a") for i in range(1, 11)] + [
        (i / 10.0 + 0.2, "b") for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    out = {r["q"]: r for r in quantile_shift(df, "v", "g").collect()}
    assert set(out) == {0.1, 0.25, 0.5, 0.75, 0.9}
    for q, r in out.items():
        assert r["shift"] == 0.2, q
    # type-1 quantile: v_a(0.25) = min v with F >= 0.25 = 0.3
    assert out[0.25]["v_a"] == 0.3 and out[0.5]["v_a"] == 0.5

    # identical groups -> zero shift everywhere
    same = spark.createDataFrame(
        [(v, g) for v in (0.2, 0.4, 0.9) for g in ("a", "b")],
        "v double, g string",
    )
    assert all(
        r["shift"] == 0.0 for r in quantile_shift(same, "v", "g").collect()
    )

    # != 2 groups fails loud; bad params fail fast
    one = spark.createDataFrame([(0.5, "a")], "v double, g string")
    with _pytest.raises(SparkRuntimeException, match="exactly 2 groups"):
        quantile_shift(one, "v", "g").collect()
    with _pytest.raises(ValueError, match="quantiles"):
        quantile_shift(df, "v", "g", quantiles=())
    with _pytest.raises(ValueError, match="quantiles must be in"):
        quantile_shift(df, "v", "g", quantiles=(0.0,))
