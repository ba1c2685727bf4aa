"""Composed corpus-prep pipeline + connected-components dup clustering."""

from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.corpus import (
    duplicate_clusters,
    prepare_corpus,
    survivorship_report,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_prepare_corpus_stages(spark):
    long_ok = " ".join(f"tok{i}" for i in range(60))
    df = _docs(
        spark,
        [
            long_ok,                       # 0: survives
            long_ok,                       # 1: exact dup of 0 -> dropped
            long_ok + " extra trailing",   # 2: near-dup of 0 -> dropped
            "spam " * 60,                  # 3: low quality -> dropped
            " ".join(f"other{i}" for i in range(60)),  # 4: survives
        ],
    )
    kept = prepare_corpus(df, min_quality=0.35, jaccard_threshold=0.5)
    assert {r.doc_id for r in kept.collect()} == {0, 4}
    rep = survivorship_report(df, kept).collect()[0]
    assert (rep.n_input, rep.n_kept, rep.n_dropped) == (5, 2, 3)


def test_prepare_corpus_on_fixture(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    kept = prepare_corpus(docs, min_quality=0.35, jaccard_threshold=0.5)
    n_in, n_kept = docs.count(), kept.count()
    assert 0 < n_kept < n_in  # both filters bite on the fixture
    # near-dup planted pairs: loser of every pair is gone
    from tfx_addons_feast_examplegen_spark.operators.dedup import jaccard_pairs

    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for p in jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect():
        assert not (p.doc_a in kept_ids and p.doc_b in kept_ids)


def test_duplicate_clusters_transitive(spark):
    a = BASE
    b = BASE.replace("dog", "cat")      # near a
    c = BASE.replace("dog", "cat").replace("quick", "slow")  # near b
    other = " ".join(f"x{i}" for i in range(20))
    df = _docs(spark, [a, b, c, other])
    clusters = {
        r.doc_id: r.cluster
        for r in duplicate_clusters(df, jaccard_threshold=0.3).collect()
    }
    # a~b and b~c chain into ONE component labeled min id (0), even if
    # a~c alone wouldn't pass the threshold (transitivity via b)
    assert clusters.get(0) == clusters.get(1) == clusters.get(2) == 0
    assert 3 not in clusters  # no pairs -> not in any cluster


def test_duplicate_clusters_on_fixture(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    clusters = duplicate_clusters(docs, jaccard_threshold=0.5)
    rows = clusters.collect()
    labels = {r.doc_id: r.cluster for r in rows}
    # every clustered doc's label is a real member <= its own id
    assert all(c <= d for d, c in labels.items())
    # endpoints of every near-dup pair share a component
    for p in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect():
        assert labels[p.doc_a] == labels[p.doc_b]


def test_connected_components_deep_chain(spark):
    # A 40-node path graph has diameter 39 > max_iters=10 rounds of plain
    # min-propagation; pointer doubling must converge in O(log n) rounds.
    import pytest

    from tfx_addons_feast_examplegen_spark.operators.corpus import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(39)],
        "doc_a long, doc_b long",
    )
    labels = {
        r.doc_id: r.cluster
        for r in connected_components(edges, max_iters=10).collect()
    }
    assert set(labels) == set(range(40))
    assert all(c == 0 for c in labels.values())

    # and when the budget genuinely can't reach convergence, it must
    # raise rather than return silently-wrong labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1)


def test_corpus_report_metrics(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.corpus import (
        corpus_report,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c", lang="en", source="s0"),
            Row(doc_id=1, text="a b c", lang="en", source="s0"),
            Row(doc_id=2, text="d e", lang="de", source="s1"),
            Row(doc_id=3, text="f", lang="de", source="s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    m = {r.metric: r.value for r in corpus_report(df).collect()}
    assert m["n_docs"] == 4
    assert m["n_tokens"] == 9
    assert m["vocab_size"] == 6
    assert m["n_langs"] == 2 and m["n_sources"] == 2
    assert m["exact_dup_docs"] == 1
    assert m["mean_doc_len_centitokens"] == 225
    # uniform 2-lang split: entropy = ln(2) nats ~= 693147 micro-nats
    # (per-lang floor: 2 * floor(346573.59) = 693146)
    assert m["lang_entropy_micro_nats"] == 693146


def test_connected_components_telemetry(spark):
    # VERDICT r5 item 8: rounds-to-convergence is observable, so a
    # pathological graph shows up as a creeping rounds count instead of
    # a sudden max_iters failure.
    from tfx_addons_feast_examplegen_spark.operators.corpus import (
        connected_components,
    )

    # a chain 0-1-2-3-4 plus an isolated pair: pointer doubling should
    # converge in O(log diameter) rounds, well under the default cap
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
        "doc_a long, doc_b long",
    )
    tel: dict = {}
    out = connected_components(pairs, telemetry=tel)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}
    assert tel["converged"] is True
    assert 1 <= tel["rounds"] <= 5, tel


def test_word_cooccurrence_pmi_matches_counting_model(spark):
    from math import floor, log

    from tfx_addons_feast_examplegen_spark.operators.text import (
        word_cooccurrence_pmi,
    )

    docs = [
        (0, "big data big model big data"),
        (1, "small data big model"),
        (2, "big model small data big data"),
        (3, "big data small model"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = word_cooccurrence_pmi(
        df, window=2, min_count=2, top_n=100
    ).collect()

    # independent pure-Python model
    from collections import Counter

    cp = Counter()
    for _, text in docs:
        ts = [w for w in text.lower().split(" ") if w]
        for i in range(len(ts) - 1):
            for j in range(i + 1, min(i + 3, len(ts))):
                a, b = sorted((ts[i], ts[j]))
                cp[(a, b)] += 1
    n = sum(cp.values())
    slots = Counter()
    for (a, b), c in cp.items():
        slots[a] += c
        slots[b] += c
    want = {}
    for (a, b), c in cp.items():
        if c >= 2:
            pmi = floor(log(c * n / (slots[a] * slots[b])) * 10**6)
            want[(a, b)] = (c, slots[a], slots[b], pmi)
    gotmap = {
        (r["w1"], r["w2"]): (
            r["n_pair"], r["n_w1"], r["n_w2"], r["pmi_micro_nats"]
        )
        for r in got
    }
    assert gotmap == want
    # canonical unordered pairs: w1 <= w2 everywhere
    assert all(r["w1"] <= r["w2"] for r in got)


def test_word_cooccurrence_pmi_top_n_and_validation(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.text import (
        word_cooccurrence_pmi,
    )

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(20)],
        "doc_id bigint, text string",
    )
    out = word_cooccurrence_pmi(df, window=3, min_count=1, top_n=5).collect()
    assert len(out) == 5
    # descending PMI with (w1, w2) tie-break
    keys = [(-r["pmi_micro_nats"], r["w1"], r["w2"]) for r in out]
    assert keys == sorted(keys)
    for bad in (
        dict(window=0), dict(min_count=0), dict(top_n=0)
    ):
        with _pytest.raises(ValueError):
            word_cooccurrence_pmi(df, **bad)
