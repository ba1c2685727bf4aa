"""Text analysis + embedding similarity operators."""

import math

from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators import text as tx
from tfx_addons_feast_examplegen_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    lsh_topk,
)
from pyspark.sql import functions as F


def _docs(spark, texts, langs=None):
    langs = langs or ["xx"] * len(texts)
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l) for i, (t, l) in enumerate(zip(texts, langs))],
        "doc_id long, text string, lang string",
    )


def test_token_count(spark):
    df = _docs(spark, ["one  two   three", ""])
    out = df.select("doc_id", tx.token_count("text").alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got == {0: 3, 1: 0}


def test_bpe_ish_counts_punct_separately(spark):
    df = _docs(spark, ["hello, world!"])
    [r] = df.select(tx.bpe_ish_token_count("text").alias("n")).collect()
    assert r.n == 4  # hello , world !


def test_lang_id_profiles(spark):
    df = _docs(
        spark,
        [
            "the cat is in the house and it is warm",
            "el gato que vive en la casa con los perros",
            "der hund und die katze sind nicht mit den kindern",
            "zzz qqq www",  # no profile hits
        ],
    )
    out = {r.doc_id: r.p for r in df.select("doc_id", tx.lang_id("text").alias("p")).collect()}
    assert out == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_quality_score_range_and_signals(spark):
    good = "the data engine processes many diverse records " + " ".join(
        f"tok{i}" for i in range(100)
    )
    repetitive = "spam " * 50
    df = _docs(spark, [good, repetitive.strip()])
    out = {r.doc_id: r for r in tx.quality_score(df).collect()}
    assert 0.0 <= out[0].quality_score <= 1.0
    assert out[0].quality_score > out[1].quality_score  # repetition penalized
    assert out[1].uniq_token_ratio < 0.05


def test_fingerprint_normalization(spark):
    df = _docs(spark, ["Hello   World", "hello world"])
    rows = tx.doc_fingerprints(df).collect()
    fps = {r.doc_id: (r.fp_exact, r.fp_normalized) for r in rows}
    assert fps[0][0] != fps[1][0]
    assert fps[0][1] == fps[1][1]


def test_intra_doc_repetition_flags_loops(spark):
    looped = "spam and eggs " * 20
    varied = " ".join(f"word{i}" for i in range(60))
    df = _docs(spark, [looped.strip(), varied, "too short"])
    out = {r.doc_id: r for r in tx.intra_doc_repetition(df, n=3).collect()}
    assert out[0].rep_ratio > 0.9          # looped text: almost all grams repeat
    assert out[1].rep_ratio == 0.0         # all grams unique
    assert out[2].n_grams == 0             # < n words -> no grams, ratio 0
    assert out[2].rep_ratio == 0.0


def test_redact_pii_replaces_all_kinds(spark):
    df = _docs(
        spark,
        ["reach me at jane.doe+spam@corp.example.org or +1 (555) 123-4567, host 10.0.0.7 ok"],
    )
    [r] = tx.redact_pii(df).collect()
    assert "<EMAIL>" in r.text and "<PHONE>" in r.text and "<IPV4>" in r.text
    assert "jane" not in r.text and "555" not in r.text and "10.0.0.7" not in r.text


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_cosine_topk_exact_small(spark):
    vecs = [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]]
    out = cosine_topk(_emb(spark, vecs), query_filter="vec_id = 0", k=2).collect()
    ranked = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [(1, 1), (2, 2)]
    top = sorted(out, key=lambda r: r.rank)[0]
    assert math.isclose(top.cos, 0.9 / math.hypot(0.9, 0.1), abs_tol=1e-5)


def test_cosine_pairs_threshold(spark):
    vecs = [[1, 0], [1, 0.01], [0, 1]]
    rows = cosine_pairs(_emb(spark, vecs), threshold=0.9).collect()
    assert {(r.vec_a, r.vec_b) for r in rows} == {(0, 1)}


def test_cosine_pairs_blocked_matches_naive(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = register_tables(spark, sf_dir)["embeddings"]
    naive = {
        (r.vec_a, r.vec_b): r.cos
        for r in cosine_pairs(emb, threshold=0.4).collect()
    }
    # n_blocks > 1 exercises cross-block and same-block pair paths.
    blocked = {
        (r.vec_a, r.vec_b): r.cos
        for r in cosine_pairs_blocked(emb, threshold=0.4, n_blocks=7).collect()
    }
    assert blocked == naive and len(naive) > 0


def test_cosine_pairs_blocked_plan_is_equi_join(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = register_tables(spark, sf_dir)["embeddings"]
    plan = (
        cosine_pairs_blocked(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_lsh_topk_recall_on_fixture(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables

    emb = register_tables(spark, sf_dir)["embeddings"]
    exact = cosine_topk(emb, query_filter="vec_id < 10", k=5).collect()
    approx = lsh_topk(emb, query_filter="vec_id < 10", k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    # LSH is approximate: require nonzero overlap and sane shape, plus
    # every approx neighbor must be a real corpus member with rank<=k.
    assert len(approx_set & exact_set) > 0
    assert all(1 <= r.rank <= 5 for r in approx)
    # determinism: same call twice -> same result
    again = {(r.query_id, r.neighbor_id) for r in
             lsh_topk(emb, query_filter="vec_id < 10", k=5).collect()}
    assert approx_set == again


def test_stats_artifacts(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables
    docs = register_tables(spark, sf_dir)["documents"]
    qf = tx.quality_features(docs)
    # every signal column materialized and non-null
    row = qf.select(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c)
          for c in ["n_tokens", "mean_token_len", "stopword_ratio",
                    "punct_ratio", "uniq_token_ratio"]]
    ).collect()[0]
    assert all(v == 0 for v in row.asDict().values())


def test_ivf_topk_shape_and_determinism(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    emb = register_tables(spark, sf_dir)["embeddings"]
    approx = ivf_topk(emb, query_filter="vec_id < 10", k=5, n_probe=4)
    rows = approx.collect()
    assert all(1 <= r.rank <= 5 for r in rows)
    assert all(r.query_id != r.neighbor_id for r in rows)
    again = {(r.query_id, r.neighbor_id) for r in
             ivf_topk(emb, query_filter="vec_id < 10", k=5, n_probe=4).collect()}
    assert {(r.query_id, r.neighbor_id) for r in rows} == again
    # probing more cells monotonically improves overlap with exact top-k
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, query_filter="vec_id < 10", k=5).collect()}
    few = {(r.query_id, r.neighbor_id) for r in
           ivf_topk(emb, query_filter="vec_id < 10", k=5, n_probe=1).collect()}
    many = {(r.query_id, r.neighbor_id) for r in
            ivf_topk(emb, query_filter="vec_id < 10", k=5, n_probe=16).collect()}
    assert len(many & exact) >= len(few & exact)
    assert many == exact  # probing every cell == exhaustive search


def test_ivf_kmeans_refinement_improves_balance(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    emb = register_tables(spark, sf_dir)["embeddings"]

    def cost(cents):
        # mean best-centroid (negative) similarity as a clustering cost proxy
        assigned = ivf_assign(emb, cents, n_probe=1)
        from tfx_addons_feast_examplegen_spark.operators.similarity import (
            _dot,
        )
        import pyspark.sql.functions as F

        lits = [F.array(*[F.lit(x) for x in c]) for c in cents]
        best = F.greatest(*[_dot(F.col("embedding"), p) for p in lits])
        return emb.select(F.avg(best)).collect()[0][0]

    init = ivf_centroids(emb, refine_iters=0)
    refined = ivf_centroids(emb, refine_iters=2)
    assert len(refined) == len(init) == 16
    assert len(refined[0]) == 64
    # refinement is deterministic
    assert refined == ivf_centroids(emb, refine_iters=2)
    # Lloyd iterations should not make the quantizer worse
    assert cost(refined) >= cost(init) - 1e-9


def test_blocked_topk_matches_sql_topk(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blocked,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    emb = register_tables(spark, sf_dir)["embeddings"]
    sql_res = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in cosine_topk(emb, query_filter="vec_id < 10", k=5).collect()
    }
    np_res = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in cosine_topk_blocked(
            emb, query_filter="vec_id < 10", k=5
        ).collect()
    }
    assert set(sql_res) == set(np_res)
    agree = sum(
        1 for key in sql_res if sql_res[key][0] == np_res[key][0]
    )
    # identical up to fp summation order near rank boundaries
    assert agree / len(sql_res) >= 0.95
    for key in sql_res:
        assert abs(sql_res[key][1] - np_res[key][1]) < 1e-4 or \
            sql_res[key][0] != np_res[key][0]


def test_tfidf_top_terms_rare_term_wins(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="common common zebra"),
            Row(doc_id=1, text="common common yak"),
            Row(doc_id=2, text="common filler words"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    top = {r.doc_id: r.term for r in rows}
    # "common" appears in every doc -> idf = ln(1) = 0; the unique term wins
    assert top[0] == "zebra" and top[1] == "yak"
    by_doc0 = [r for r in rows if r.doc_id == 0][0]
    assert by_doc0.doc_freq == 1 and by_doc0.tf == 1


def test_tfidf_k_rows_per_doc_and_tiebreak(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [Row(doc_id=0, text="b a c"), Row(doc_id=1, text="x y z")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    doc0 = sorted(r.term for r in rows if r.doc_id == 0)
    # all three terms tie on tfidf; term-asc tie-break keeps a and b
    assert doc0 == ["a", "b"] and len(rows) == 4


def test_udtf_split_sentences_multi(spark):
    from tfx_addons_feast_examplegen_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "First one. Second two!  Third?"), (2, "no punct"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_docs d, "
        "LATERAL split_sentences(d.text) s"
    ).collect()
    got = {(r.doc_id, r.sent_idx): (r.sentence, r.n_chars) for r in rows}
    assert got == {
        (1, 1): ("First one", 9),
        (1, 2): ("Second two", 10),
        (1, 3): ("Third?", 6),
        (2, 1): ("no punct", 8),
    }


def test_quantization_roundtrip_error_bound(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        quantize_embeddings,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(vecs, "vec_id", "embedding")
    joined = vecs.join(q, "vec_id").selectExpr(
        "aggregate(zip_with(embedding, q_embedding,"
        " (x, c) -> abs(CAST(x AS DOUBLE) - c * scale / 127.0)),"
        " 0D, (acc, e) -> greatest(acc, e)) AS max_err",
        "scale",
    )
    import pyspark.sql.functions as F

    [r] = joined.agg(
        F.max(F.col("max_err") / F.col("scale")).alias("rel")
    ).collect()
    # round-to-nearest: error <= half a quantization step (scale/127),
    # plus the slack from dequantizing with the 6-decimal-rounded scale
    assert r.rel <= 0.5 / 127 + 1e-6


def test_quantization_zero_vector(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    [r] = quantize_embeddings(df).collect()
    assert r.scale == 0.0 and r.q_embedding == [0, 0]


def test_chunk_documents_windows_and_tail(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import chunk_documents

    words = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=words), Row(doc_id=2, text="")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]
    assert got == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
    ]  # empty doc yields no chunks; the window at start 9 ("t9") is
    # fully contained in chunk 2, which already reached the doc end —
    # zero-coverage duplicate windows are not emitted (r6 fix)


def test_heavy_hitters_exact_and_mg_bounded(spark, sf_dir):
    # The sketch-then-verify output must EQUAL the exact relational
    # answer, and the Misra-Gries stage must emit a bounded candidate
    # set (the scale contract: candidates, not the token space).
    from tfx_addons_feast_examplegen_spark.operators.text import heavy_hitters
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    k = 50
    got = heavy_hitters(docs, "lang", "text", k=k)

    toks = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("token"),
    )
    totals = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n_g"))
    exact = (
        toks.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(totals, "lang")
        .filter(F.col("cnt") * k > F.col("n_g"))
        .select("lang", "token", "cnt")
    )
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0
    assert got.count() > 0


def test_unigram_logprob_ranks_rare_tokens(spark):
    # A doc of corpus-unique tokens must carry a higher mean NLL than a
    # doc of corpus-common tokens; counts must be exact.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import (
        unigram_logprob,
    )

    common = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=common) for i in range(9)]
        + [Row(doc_id=9, text="zeta1 zeta2 zeta3 zeta4")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(docs, "doc_id", "text").collect()}
    assert all(out[i].n_tokens == 4 for i in range(10))
    mean_common = out[0].nll_micro_nats / out[0].n_tokens
    mean_rare = out[9].nll_micro_nats / out[9].n_tokens
    assert mean_rare > mean_common
    # exact cost check: common tokens appear 9 times in 40 -> -ln(9/40)
    import math

    assert out[0].nll_micro_nats == 4 * math.floor(-math.log(9 / 40) * 1e6)


def test_bpe_pair_merges_counts_and_tiebreak(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import (
        bpe_pair_merges,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b c"),
            Row(doc_id=1, text="a b x"),
            Row(doc_id=2, text="solo"),
        ],
        "doc_id long, text string",
    )
    rows = bpe_pair_merges(df, "doc_id", "text", top_n=3).collect()
    # ("a","b") appears 3x across 2 docs; overlapping pairs both count.
    assert (rows[0].left_tok, rows[0].right_tok) == ("a", "b")
    assert rows[0].pair_count == 3 and rows[0].doc_freq == 2
    assert rows[0].merged_tok == "ab"
    # remaining ties (count 1) break lexicographically
    assert [(r.left_tok, r.right_tok) for r in rows[1:]] == [
        ("b", "a"),
        ("b", "c"),
    ]


def test_pq_encode_codes_shape_and_range(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    books = pq_train(emb, m=8, n_codes=16, refine_iters=1)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    rows = pq_encode(emb, books).select("vec_id", "codes").collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_topk_self_duplicate_is_top1(spark):
    import pyspark.sql.functions as F
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_topk,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    # plant an exact duplicate of vec 0 under a new id: ADC distance 0,
    # exact re-rank cos 1.0 -> must be rank 1 for query 0.
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dup = emb.filter("vec_id = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        "label",
    )
    out = pq_topk(
        emb.unionByName(dup), query_filter="vec_id = 0", k=5, shortlist=30
    )
    top = [r for r in out.collect() if r.rank == 1]
    assert top and top[0].neighbor_id == 100000 and top[0].cos == 1.0


def test_bigram_logprob_flags_unusual_transitions(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.text import (
        bigram_logprob,
    )

    # doc 2 uses common TOKENS in an order never seen elsewhere
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat sat on the mat"),
            Row(doc_id=1, text="the cat sat on the rug"),
            Row(doc_id=2, text="mat the on sat cat the"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert rows[0].n_bigrams == 5
    per_tok = {
        i: rows[i].nll_micro_nats / rows[i].n_bigrams for i in range(3)
    }
    assert per_tok[2] > per_tok[0] and per_tok[2] > per_tok[1]


def test_ann_index_param_mismatch_raises(spark, sf_dir, tmp_path):
    import pytest

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        lsh_topk_indexed,
        write_ann_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    idx = str(tmp_path / "ann_idx")
    write_ann_index(emb, idx, bands=4, target_files=2)
    with pytest.raises(ValueError, match="was built with"):
        lsh_topk_indexed(emb.filter("vec_id < 5"), idx, bands=2)


def test_pq_indexed_matches_inmemory(spark, sf_dir, tmp_path):
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_topk,
        pq_topk_indexed,
        pq_write_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pq_index")
    pq_write_index(emb, path, m=8, n_codes=16)
    queries = emb.filter("vec_id < 10")
    got = pq_topk_indexed(queries, path, k=5, m=8, n_codes=16).collect()
    want = pq_topk(
        emb, query_filter="vec_id < 10", k=5, m=8, n_codes=16, shortlist=100
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len({key(r) for r in got}) == len(got)


def test_pq_indexed_rejects_param_mismatch(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        pq_topk_indexed,
        pq_write_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    path = str(tmp_path / "pq_index")
    pq_write_index(emb, path, m=8, n_codes=16)
    with _pytest.raises(ValueError, match="was built with"):
        pq_topk_indexed(emb.limit(2), path, m=4, n_codes=16)


def test_similarity_requires_query_source(spark, sf_dir):
    # ADVICE r5: queries=None + query_filter=None must raise a usable
    # ValueError, not an opaque Py4J error from df.filter(None); an
    # empty corpus must fail pq_train with a clear message too.
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
        pq_train,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="query set is required"):
        cosine_topk(emb)
    with _pytest.raises(ValueError, match="query set is required"):
        hard_negatives(emb)
    with _pytest.raises(ValueError, match="non-empty corpus"):
        pq_train(emb.filter("vec_id < 0"))


def test_char_ngram_entropy_hand_computed(spark):
    import math

    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.text import (
        char_ngram_entropy,
    )

    df = spark.createDataFrame(
        [
            (1, "aaaa"),   # 2-grams: aa x3 -> H = 0
            (2, "abab"),   # 2-grams: ab,ba,ab -> H = log2(3) - 2/3
            (3, "x"),      # shorter than n -> absent
            (4, "abcd"),   # all distinct -> H = log2(3)
        ],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: r
        for r in char_ngram_entropy(df, n=2).collect()
    }
    assert set(got) == {1, 2, 4}
    assert got[1]["n_grams"] == 3 and got[1]["distinct_grams"] == 1
    assert got[1]["entropy"] == 0.0
    assert got[2]["n_grams"] == 3 and got[2]["distinct_grams"] == 2
    assert got[2]["entropy"] == round(math.log2(3) - 2.0 / 3.0, 6)
    assert got[4]["entropy"] == round(math.log2(3), 6)

    with _pytest.raises(ValueError, match="n must"):
        char_ngram_entropy(df, n=0)

    # the docstring's scale claim is checkable: exactly ONE wide
    # shuffle keyed (doc, gram); the per-doc reduce is over distinct
    # grams only
    plan = (
        char_ngram_entropy(df, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_ks_two_sample_hand_computed(spark):
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        ks_two_sample,
    )

    # identical samples -> D = 0
    rows = [(v, g) for v in (0.1, 0.2, 0.3) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = ks_two_sample(df, "v", "g").collect()[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["ks_stat"] == 0.0

    # disjoint supports -> D = 1
    dj = spark.createDataFrame(
        [(0.1, "a"), (0.2, "a"), (0.8, "b"), (0.9, "b")], "v double, g string"
    )
    assert ks_two_sample(dj, "v", "g").collect()[0]["ks_stat"] == 1.0

    # hand case: a = {1,2}, b = {2,3} -> ECDFs diverge most at v=1
    # (1/2 vs 0) and v=2 (1 vs 1/2): D = 0.5
    h = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")], "v double, g string"
    )
    assert ks_two_sample(h, "v", "g").collect()[0]["ks_stat"] == 0.5

    # NULLs drop silently (value or group)
    withnull = spark.createDataFrame(
        [(None, "a"), (0.5, None), (0.1, "a"), (0.9, "b")],
        "v double, g string",
    )
    r2 = ks_two_sample(withnull, "v", "g").collect()[0]
    assert r2["n_a"] == 1 and r2["n_b"] == 1 and r2["ks_stat"] == 1.0

    # != 2 groups fails LOUD in-plan
    for bad_rows in ([(0.1, "a")], [(0.1, "a"), (0.2, "b"), (0.3, "c")]):
        bad = spark.createDataFrame(bad_rows, "v double, g string")
        with _pytest.raises(SparkRuntimeException, match="exactly 2 groups"):
            ks_two_sample(bad, "v", "g").collect()

    with _pytest.raises(ValueError, match="decimals"):
        ks_two_sample(df, "v", "g", decimals=0)


def test_ks_qq_bounded_grid_contract_fails_loud(spark):
    # ADVICE r14 medium: round(v, decimals) only bounds the grid frame
    # for bounded-range values. A high-cardinality unbounded column
    # must raise LOUD in the distributed pre-window stage, never
    # funnel every distinct value through the single-partition ECDF
    # window. The guard counts OCCUPIED (value, group) cells, so a
    # wide-range but low-cardinality column stays in contract.
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        ks_two_sample,
        quantile_shift,
    )

    # a latency-like column: 400 distinct values spanning [0, 4e5) —
    # snapping at decimals=4 reduces nothing; 400 cells > cap 100
    lat = spark.createDataFrame(
        [(float(i * 1000 + (i % 2)), "ab"[i % 2]) for i in range(400)],
        "v double, g string",
    )
    with _pytest.raises(SparkRuntimeException, match="bounded-grid"):
        ks_two_sample(lat, "v", "g", max_grid_cells=100).collect()
    with _pytest.raises(SparkRuntimeException, match="bounded-grid"):
        quantile_shift(lat, "v", "g", max_grid_cells=100).collect()

    # raising the cap re-admits the same data: configurable contract,
    # not a silent truncation (exactly-at-cap stays in contract)
    assert (
        ks_two_sample(lat, "v", "g", max_grid_cells=400)
        .collect()[0]["ks_stat"]
        is not None
    )
    with _pytest.raises(SparkRuntimeException, match="bounded-grid"):
        ks_two_sample(lat, "v", "g", max_grid_cells=399).collect()

    # lowering decimals collapses the grid back into contract: at
    # decimals=1 the (i %% 2) jitter snaps away, halving distinct
    # values per group and keeping the i*1000 grid — 400 cells of
    # (value, group) but the same count... use a real collapse: at
    # decimals=1, i*1000 + (i%2) rounds to i*1000.0, one cell per i.
    assert (
        ks_two_sample(lat, "v", "g", decimals=1, max_grid_cells=400)
        .collect()[0]["ks_stat"]
        is not None
    )

    # wide-range but LOW-cardinality stays in contract at the default
    # cap (the span-based contract would have rejected this)
    sparse = spark.createDataFrame(
        [(0.0, "a"), (1.0e9, "a"), (2.5, "b"), (7.0, "b")],
        "v double, g string",
    )
    assert ks_two_sample(sparse, "v", "g").collect()[0]["ks_stat"] == 0.5
    assert quantile_shift(sparse, "v", "g").count() == 5


def test_ks_two_sample_matches_scipy_free_model(spark):
    # Independent pure-Python two-sample KS over random grids.
    import random

    from tfx_addons_feast_examplegen_spark.operators.stats import (
        ks_two_sample,
    )

    rng = random.Random(1703)
    for trial in range(3):
        na, nb = rng.randint(5, 40), rng.randint(5, 40)
        a = [round(rng.random(), 4) for _ in range(na)]
        b = [round(rng.random() ** 2, 4) for _ in range(nb)]
        xs = sorted(set(a) | set(b))
        d = max(
            abs(
                sum(1 for v in a if v <= x) / na
                - sum(1 for v in b if v <= x) / nb
            )
            for x in xs
        )
        df = spark.createDataFrame(
            [(v, "a") for v in a] + [(v, "b") for v in b],
            "v double, g string",
        )
        got = ks_two_sample(df, "v", "g").collect()[0]
        assert got["n_a"] == na and got["n_b"] == nb
        assert got["ks_stat"] == round(d, 6), (trial, a, b)
