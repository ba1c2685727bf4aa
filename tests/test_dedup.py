"""Dedup operators: exact, n-gram Jaccard, MinHash LSH, SimHash."""

from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash,
    simhash_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_exact_dedup_collapses_identical(spark):
    df = _docs(spark, ["a b c", "a b c", "x y z"])
    rows = {r.keep_id: r.n_dupes for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert rows == {0: 2, 2: 1}  # min id kept, dup counted


def test_exact_dedup_normalize(spark):
    df = _docs(spark, ["  Hello World ", "hello world"])
    out = exact_dedup(df, ["text"], "doc_id", normalize=True).collect()
    assert len(out) == 1 and out[0].n_dupes == 2


def test_shingles_are_distinct_ngrams(spark):
    df = _docs(spark, ["a b c d"])
    got = {r.shingle for r in shingles(df, "doc_id", "text", 3).collect()}
    assert got == {"a b c", "b c d"}


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, ["a b"])  # shorter than n=3
    assert shingles(df, "doc_id", "text", 3).count() == 0


def test_jaccard_identical_docs_is_one(spark):
    df = _docs(spark, [BASE, BASE, "совершенно другой текст здесь и сейчас"])
    rows = jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.jaccard) == (0, 1, 1.0)


def test_bucket_cap_not_silent(spark):
    # "No silent caps": error mode fails the job on the first over-cap
    # bucket (lazy in-plan assert_true — AQE cannot prune it), and the
    # Observation metric reports drop counts in the same job.
    import pytest

    from pyspark.sql import Observation

    common = "alpha beta gamma"  # one shingle shared by every doc
    df = _docs(spark, [f"{common} unique{i} filler{i} pad{i}" for i in range(6)])

    with pytest.raises(Exception, match="over cap"):
        jaccard_pairs(
            df, "doc_id", "text", threshold=0.01, max_bucket=3,
            on_over_cap="error",
        ).collect()

    obs = Observation()
    out = jaccard_pairs(
        df, "doc_id", "text", threshold=0.01, max_bucket=100, observation=obs
    ).collect()
    assert len(out) == 15  # C(6,2): all pairs survive under the cap
    assert obs.get["dropped_buckets"] == 0
    assert obs.get["max_bucket_size"] == 6


def test_jaccard_near_dup_detected(spark):
    near = BASE.replace("dog", "cat")  # one word changed
    df = _docs(spark, [BASE, near])
    [r] = jaccard_pairs(df, "doc_id", "text", threshold=0.3).collect()
    assert 0.3 < r.jaccard < 1.0


def test_minhash_lsh_matches_exact_on_fixture(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, verify=True
        ).collect()
    }
    assert lsh == exact  # full recall at fixture similarity levels
    assert len(exact) > 0  # fixture has planted near-dups


def test_minhash_no_verify_is_superset(spark):
    near = BASE.replace("dog", "cat")
    df = _docs(spark, [BASE, near, "unrelated words entirely different content here now"])
    cands = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, "doc_id", "text", verify=False).collect()
    }
    assert (0, 1) in cands


def test_simhash_identical_docs_equal(spark):
    df = _docs(spark, [BASE, BASE])
    [a, b] = sorted(simhash(df, "doc_id", "text").collect(), key=lambda r: r.doc_id)
    assert a.simhash == b.simhash


def test_simhash_near_docs_close_far_docs_far(spark):
    near = BASE.replace("dog", "cat")
    far = "metric space embedding vector quantization product index search"
    df = _docs(spark, [BASE, near, far])
    h = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])


def test_simhash_pairs_finds_identical(spark):
    df = _docs(spark, [BASE, BASE, "qq ww ee rr tt yy uu ii oo pp aa ss"])
    rows = simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(0, 1)}
    assert rows[0].hamming == 0


def test_simhash_pairs_hot_bucket_capped(spark):
    # The pigeonhole chunk join is a pair-producer like any other: a
    # degenerate chunk value (identical docs all sharing every chunk)
    # must hit the _bucket_pairs cap machinery — drop-with-metric under
    # the default, fail-fast under on_over_cap="error" — instead of
    # exploding quadratically with no signal.
    import pytest

    from pyspark.sql import Observation

    df = _docs(spark, [BASE] * 8)  # every chunk bucket has size 8

    with pytest.raises(Exception, match="over cap"):
        simhash_pairs(
            df, "doc_id", "text", max_bucket=4, on_over_cap="error"
        ).collect()

    obs = Observation()
    dropped = simhash_pairs(
        df, "doc_id", "text", max_bucket=4, observation=obs
    ).collect()
    assert dropped == []  # every bucket over cap -> all candidates dropped
    assert obs.get["dropped_buckets"] == 4  # one per chunk_id
    assert obs.get["max_bucket_size"] == 8

    # Under a sufficient cap the full pair set comes back: C(8,2) = 28.
    full = simhash_pairs(df, "doc_id", "text", max_bucket=100).collect()
    assert len(full) == 28
    assert all(r.hamming == 0 for r in full)


def test_containment_short_doc_inside_long(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = (
        "intro words before the quote " + quote + " and plenty of trailing "
        "commentary that makes this document much longer than the quote"
    )
    df = _docs(spark, [quote, long_doc, "totally unrelated text here now"])
    rows = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(0, 1)]
    assert rows[0].containment == 1.0
    # symmetric Jaccard misses the same pair at any comparable threshold
    jac = jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert jac == []


def test_containment_threshold_excludes_partial_overlap(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import containment_pairs

    df = _docs(spark, ["a b c d e f", "a b c d x y z w q r"])
    # 2 shared 3-gram shingles ("a b c", "b c d") / min(4, 8) = 0.5
    rows = containment_pairs(df, "doc_id", "text", n=3, threshold=0.6).collect()
    assert rows == []
    rows = containment_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in rows] == [(0, 1, 0.5)]


def test_minhash_lsh_join_cross_corpus(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import minhash_lsh_join

    corpus = _docs(spark, [BASE, "completely different corpus text here ok"])
    batch = spark.createDataFrame(
        [(100, BASE + " extra"), (101, "nothing like anything above at all")],
        "doc_id long, text string",
    )
    rows = minhash_lsh_join(batch, corpus, "doc_id", "text", threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(100, 0)]
    # corpus-internal duplicates are NOT paired (that's the self-join's job)
    assert all(r.doc_a >= 100 for r in rows)


def test_minhash_index_join_equals_direct(spark, sf_dir, tmp_path):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        minhash_lsh_join,
        minhash_lsh_join_indexed,
        write_minhash_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter("doc_id % 10 = 0")
    corpus = docs.filter("doc_id % 10 != 0")
    direct = {
        tuple(r)
        for r in minhash_lsh_join(
            batch, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx, "doc_id", "text")
    indexed = {
        tuple(r)
        for r in minhash_lsh_join_indexed(
            batch, idx, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert indexed == direct and len(direct) > 0


def test_simhash_portable_variant_semantics(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import simhash_pairs

    df = _docs(spark, [BASE, BASE, "entirely different words everywhere"])
    rows = simhash_pairs(df, "doc_id", "text", max_hamming=3, portable=True).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(0, 1, 0)]


def test_minhash_index_param_mismatch_raises(spark, sf_dir, tmp_path):
    import pytest

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        minhash_lsh_join_indexed,
        write_minhash_index,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(docs, idx, "doc_id", "text", bands=16)
    with pytest.raises(ValueError, match="was built with"):
        minhash_lsh_join_indexed(docs, idx, "doc_id", "text", bands=8)


def test_shared_run_pairs_finds_longest_run(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        shared_run_pairs,
    )

    # docs 0/1 share a verbatim 10-token run; doc 2 shares nothing long.
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(
        spark,
        [
            "x y " + run + " p q",
            run + " completely different tail here now",
            "unrelated words that never chain into anything shared",
        ],
    )
    rows = shared_run_pairs(
        df, "doc_id", "text", seed_n=5, min_run=8
    ).collect()
    assert [(r.doc_a, r.doc_b, r.longest_run, r.n_runs) for r in rows] == [
        (0, 1, 10, 1)
    ]


def test_shared_run_pairs_two_disjoint_runs(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        shared_run_pairs,
    )

    r1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    r2 = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    df = _docs(
        spark,
        [r1 + " xx " + r2, r2 + " yy zz ww vv uu tt ss rr qq " + r1],
    )
    rows = shared_run_pairs(
        df, "doc_id", "text", seed_n=5, min_run=8
    ).collect()
    # both runs found as separate maximal islands; longest is the 9-token
    assert [(r.doc_a, r.doc_b, r.longest_run, r.n_runs) for r in rows] == [
        (0, 1, 9, 2)
    ]


def test_shared_run_min_run_below_seed_raises(spark):
    import pytest

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        shared_run_pairs,
    )

    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="min_run"):
        shared_run_pairs(df, "doc_id", "text", seed_n=5, min_run=4)


def test_remove_shared_runs_excises_higher_id_copy(spark):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        remove_shared_runs,
    )

    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = _docs(
        spark,
        [
            "x y " + run + " p q",          # doc 0: keeps the run
            run + " different tail here",   # doc 1: run excised
            "untouched words here stay put entirely",
        ],
    )
    rows = {r.doc_id: r for r in
            remove_shared_runs(df, "doc_id", "text", seed_n=5,
                               min_run=8).collect()}
    assert rows[0].n_tokens_removed == 0
    assert rows[0].clean_text == "x y " + run + " p q"
    assert rows[1].n_tokens_removed == 8
    assert rows[1].clean_text == "different tail here"
    assert rows[2].n_tokens_removed == 0


def test_jaccard_prefix_filter_matches_full_explode(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert full and pref == full  # bit-identical strategies


def test_prefix_filter_survives_boilerplate_where_explode_caps_out(spark):
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    # 120 docs all sharing a 12-token boilerplate header; two planted
    # near-dup tails. Boilerplate shingles live in EVERY doc -> the full
    # explode's buckets hit the cap and fail fast, while rare-first
    # prefixes exclude them entirely and stay exact under the same cap.
    boiler = "terms of service apply to all content on this site today"
    tails = [f"unique tail {i} alpha beta gamma delta {i} epsilon" for i in range(118)]
    tails += ["planted duplicate tail one two three four five six seven",
              "planted duplicate tail one two three four five six seven"]
    df = _docs(spark, [boiler + " " + t for t in tails])

    with pytest.raises(Exception, match="over cap"):
        jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.9,
            max_bucket=50, on_over_cap="error",
        ).collect()

    rows = jaccard_pairs_prefix(
        df, "doc_id", "text", n=3, threshold=0.9,
        max_bucket=50, on_over_cap="error",
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(118, 119)]


def test_jaccard_prefix_rounding_boundary_no_false_negative(spark):
    # ADVICE r5 (medium): prefix length used float ceil(t * nsh);
    # 0.34 * 150 lands epsilon above 51.0 in binary (51.000000000000006),
    # so ceil gave 52 and the prefix shortened by one — dropping pairs
    # whose shared shingles all rank last in the rare-first order.
    # Construction: doc A = 51 tokens all shared with B; doc B = those
    # 51 + 99 unique (na=51, nb=150, c=51 -> jaccard = 51/150 = 0.34
    # exactly, in the output set). Shared tokens have df=2, unshared
    # df=1, so B's buggy 99-prefix is exactly its 99 unshared tokens —
    # no common prefix shingle, pair lost. Verified red pre-fix.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    shared = [f"s{i}" for i in range(51)]
    unique = [f"u{i}" for i in range(99)]
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(shared)),
            Row(doc_id=2, text=" ".join(unique + shared)),
        ],
        "doc_id long, text string",
    )
    got = jaccard_pairs_prefix(
        docs, "doc_id", "text", n=1, threshold=0.34
    ).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(1, 2, 0.34)]
    want = jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.34).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_required_overlap_expr_exact_integer_arithmetic(spark):
    # ADVICE r6 (low): the 1e-9 epsilon before float ceil only held
    # while |t*nsh| ulp < 1e-9 (fails somewhere past ~1e7 shingles).
    # The overlap is now exact integer arithmetic on the threshold's
    # decimal rational — prove it against Python Fractions across a
    # grid including nsh far beyond any float-safe range.
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        _required_overlap_expr,
    )

    nsh_values = (
        list(range(1, 64))
        + [150, 1000, 10**6, 10**7 + 3, 5 * 10**7, 2**31 - 1, 2**40]
    )
    df = spark.createDataFrame(
        [(int(v),) for v in nsh_values], "nsh long"
    )
    for t in (0.34, 0.5, 0.3333, 0.77, 0.0001, 1.0):
        got = {
            r.nsh: r.req
            for r in df.select(
                "nsh", _required_overlap_expr(t).alias("req")
            ).collect()
        }
        fr = Fraction(str(t))
        for v in nsh_values:
            want = math.ceil(fr * v)
            assert got[v] == want, (t, v, got[v], want)


def test_required_overlap_expr_bounds_nonshort_decimal_rational(spark):
    # ADVICE r7 (high): Fraction(str(1/3)) is 3333333333333333/10**16;
    # p*nsh overflows int64 at nsh ~2768 (silently wrapping in
    # non-ANSI, throwing under ANSI). The rational must be floored to a
    # bounded denominator FIRST — under-approximating the threshold can
    # only lengthen the prefix (safe direction), never shorten it.
    import math
    from fractions import Fraction

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        _required_overlap_expr,
    )

    # domain: nsh is a per-doc shingle count < 2^31 (a >=1-char shingle
    # per count in a <2 GiB string) — the bound the floored rational is
    # sized against. The 2^40 exactness probe in the test above applies
    # only to short decimals, whose numerators stay tiny.
    nsh_values = [1, 2767, 2768, 3000, 10**6, 2**31 - 1]
    df = spark.createDataFrame([(int(v),) for v in nsh_values], "nsh long")
    for t in (1 / 3, 2 / 3, 0.1 + 0.2, 1 / 7):
        got = {
            r.nsh: r.req
            for r in df.select(
                "nsh", _required_overlap_expr(t).alias("req")
            ).collect()
        }
        fr = Fraction(str(float(t)))
        for v in nsh_values:
            want = math.ceil(fr * v)  # exact rational ceil
            slack = (v >> 31) + 1  # flooring to denom 2**31 costs < this
            assert got[v] is not None and got[v] > 0, (t, v, got[v])
            # never ABOVE the exact requirement (that would shorten the
            # prefix -> false negatives); at most `slack` below it.
            assert want - slack <= got[v] <= want, (t, v, got[v], want)


def test_jaccard_prefix_filter_nonshort_threshold_end_to_end(spark):
    # End-to-end repro for the same ADVICE finding: a ~3000-shingle doc
    # with threshold=1/3 overflowed the old expr (ANSI throw / silent
    # wrap). Must now match the full-explode jaccard_pairs exactly.
    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    words_a = [f"w{i}" for i in range(3000)]
    words_b = [f"w{i}" for i in range(1500)] + [f"x{i}" for i in range(300)]
    docs = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))],
        "doc_id long, text string",
    )
    got = jaccard_pairs_prefix(
        docs, "doc_id", "text", n=1, threshold=1 / 3, max_bucket=4000
    ).collect()
    want = jaccard_pairs(
        docs, "doc_id", "text", n=1, threshold=1 / 3, max_bucket=4000
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 1  # J = 1500/3300 ~ 0.4545 >= 1/3


def test_required_overlap_expr_rejects_out_of_domain_threshold():
    import pytest

    from tfx_addons_feast_examplegen_spark.operators.dedup import (
        _required_overlap_expr,
    )

    for bad in (0.0, -0.5, 1.0000001, 7.0):
        with pytest.raises(ValueError, match="threshold"):
            _required_overlap_expr(bad)
    _required_overlap_expr(1.0)  # boundary is valid
