"""Text-analysis operators for corpus preparation.

North-star extension (BASELINE.md): language ID, quality scoring, token
counting, and document fingerprinting over a documents table. Everything
is built from ``pyspark.sql.functions`` expressions — no Python UDFs —
so the whole pipeline stays inside whole-stage codegen and scales as a
single narrow projection + aggregation.

DuckDB-oracle compatibility drives two choices: md5 for fingerprints
(portable, unlike xxhash64) and explicit stopword-list arithmetic for
language ID (expressible as the same CASE/array expressions in ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword profiles (public, common function words).
# Deliberately tiny: the operator contract is the scoring mechanism
# (profile-hit argmax), not lexicon quality; swap in real profiles at
# deployment.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"),
}

_EN_STOPWORDS = LANG_PROFILES["en"]


def tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization of lowercased text (array<string>)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), " "), lambda t: t != "")


def token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col))


# One token per: letter/underscore run, single digit (BPE tokenizers
# split numbers), or single non-space symbol. Explicit ASCII classes only
# — no \w or \s, whose definitions differ between Java regex (Spark) and
# RE2 (DuckDB/oracle engines) — so counts are engine-portable.
BPE_ISH_TOKEN_PATTERN = r"[A-Za-z_]+|[0-9]|[^A-Za-z0-9_ \t\n\r]"


def bpe_ish_token_count(text_col: str | Column) -> Column:
    """Subword-ish token count: letter runs + single digits + punct.

    A regex approximation of BPE tokenizer counts (useful for budgeting
    LLM training tokens without shipping a tokenizer to executors).
    Extraction (``regexp_extract_all``), not lookaround splitting, so the
    same pattern runs on RE2-based engines for oracle checks.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_PATTERN), 0))


def _profile_hits(toks: Column, words: tuple[str, ...]) -> Column:
    profile = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, profile))


def lang_id(text_col: str | Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword-profile hits.

    Deterministic tie-break: language order as listed (en first), 'und'
    (undetermined) when no profile matches at all.
    """
    toks = F.array_distinct(tokens(text_col))
    langs = list(LANG_PROFILES)
    hits = {lang: _profile_hits(toks, LANG_PROFILES[lang]) for lang in langs}
    # Sequential when-chain: the first language whose hits are >= all
    # others wins, so listing order IS the tie-break.
    best = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(
            cond, F.lit(lang)
        )
    return best.otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-signal columns (all codegen'd expressions):

    - n_tokens, n_chars
    - mean_token_len
    - stopword_ratio (English profile)
    - punct_ratio (non-alnum, non-space chars / chars)
    - uniq_token_ratio (type/token ratio — crude repetition signal)

    The input is rebalanced first: the regex/array expression chain is
    CPU-bound per row, and a compacted corpus file scans as one split —
    without the rebalance every signal computes in a single task
    (measured 2x at sf0.1; no-op at scale where scans yield many splits).
    """
    from ..session import rebalance_for_compute

    df = rebalance_for_compute(df)
    toks = tokens(text_col)
    c = F.col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    # explicit ASCII class, not \w: \w counts '_' as a word char, so
    # underscore-art/boilerplate would never register as punctuation
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", F.round(
            (F.length(F.regexp_replace(c, r"\s+", ""))) / F.greatest(n_tok, F.lit(1)), 4
        ))
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.array_intersect(F.array_distinct(toks),
                       F.array(*[F.lit(w) for w in _EN_STOPWORDS])))
                / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)),
                4,
            ),
        )
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn(
            "uniq_token_ratio",
            F.round(F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 4),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: weighted blend of the signals.

    The blend is a transparent linear heuristic (length saturation,
    repetition penalty, punctuation penalty) — the operator contract is
    the *pipeline shape* (pure-expression scoring at scan time, no UDF,
    filterable/pushdownable), not the exact weights.
    """
    qf = quality_features(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    uniq_term = F.col("uniq_token_ratio")
    punct_pen = F.least(F.col("punct_ratio") * 5, F.lit(1.0))
    score = 0.5 * length_term + 0.5 * uniq_term - 0.2 * punct_pen
    clamped = F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0))
    # floor(x*1e4+0.5)/1e4 instead of round(): arithmetic on 4-decimal
    # inputs lands exactly on .xxxx5 boundaries, where engines' round()
    # implementations disagree; floor of identical doubles is portable.
    return qf.withColumn(
        "quality_score", F.floor(clamped * 10000 + F.lit(0.5)) / 10000
    )


def intra_doc_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText-style
    repeated-n-gram filters): total vs distinct word n-grams per doc and
    the repeated fraction. A doc whose text loops emits the same n-grams
    many times — ``rep_ratio`` rises toward 1.

    Pure expressions (split -> transform -> size/array_distinct), no
    explode and no shuffle: each doc scores in place at scan time, so the
    filter pushes down like any other quality gate. Rebalanced for the
    same single-split-scan reason as :func:`quality_features`.
    """
    from ..session import rebalance_for_compute

    df = rebalance_for_compute(df)
    # module tokenization convention (tokens(): lowercase split, empty
    # strings filtered) — raw split would let incidental whitespace
    # runs inject phantom '' tokens and shift n-gram counts
    words = tokens(text_col)
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array())
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_grams"),
        distinct.cast("long").alias("n_distinct_grams"),
        F.round(
            (total - distinct) / F.greatest(total, F.lit(1)), 4
        ).alias("rep_ratio"),
    )


# Conservative, engine-portable PII patterns (valid in both Java regex
# and RE2): emails, international-ish phone numbers, IPv4 addresses.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace PII matches with ``<KIND>`` placeholder tokens.

    Chained ``regexp_replace`` expressions — codegen'd, applied in one
    projection pass at scan time (the standard pre-training scrub). The
    default patterns are deliberately conservative and portable; swap in
    deployment-grade patterns via ``patterns``.
    """
    out = F.col(text_col)
    for kind, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.withColumn(out_col or text_col, out)


def doc_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content fingerprints: exact md5 + normalized-text md5.

    The normalized variant (lowercase, collapsed whitespace) catches
    trivially-reformatted duplicates; both are portable across engines.
    """
    c = F.col(text_col)
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(c).alias("fp_exact"),
        F.md5(norm).alias("fp_normalized"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    The classic corpus-characterization / keyword-extraction primitive:
    tf(term, doc) × ln(N / df(term)), with N = number of documents and
    df = documents containing the term. Whitespace tokens, lowercased.

    Plan shape (scale notes): one explode over the token arrays feeds
    BOTH the per-(doc, term) tf aggregation and the per-term df
    aggregation — Spark schedules two hash aggregations over the same
    scan. df and N are corpus-level statistics: df joins back on the
    term key (broadcast when the vocabulary is small), N is a one-row
    broadcast cross join. The final top-k is a per-document window —
    partitioned by doc id, so it shuffles on the same key as tf and AQE
    coalesces the exchange. No UDFs anywhere.

    Determinism: tfidf is rounded to 4 decimals BEFORE ranking and ties
    break on the term string, so the selected rows are stable across
    engines (ln differs from a SQL oracle's by ≤1 ulp; post-round
    collisions resolve identically).

    Output: (doc_id, term, tf, doc_freq, tfidf), ``k`` rows per document
    that has at least one token.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = toks.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq")
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("doc_freq")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows — the RAG/embedding
    chunking primitive (windows of ``chunk_tokens`` whitespace tokens
    every ``stride`` tokens; the final partial window is kept so no
    suffix is dropped, and no window fully contained in its predecessor
    is emitted — zero-coverage duplicates would embed and retrieve the
    same context twice).

    Pure expression chain: tokenize once, generate window start indices
    with ``sequence``, slice + rejoin per window, explode. Stays in
    whole-stage codegen until the explode; no shuffle at all — chunking
    is a flat-map over the scan, so it composes with any downstream
    embedding/dedup stage at full scan parallelism.

    Output: (id, chunk_idx, chunk_text, n_tokens), chunk_idx 0-based.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(text_col)
    # Start bound: a window at start s is FULLY contained in its
    # predecessor iff the predecessor already reached the doc end
    # (s - stride + chunk_tokens >= n). Emitting it would duplicate a
    # suffix already covered — at corpus scale that is duplicate
    # embedding compute and duplicate retrieval contexts for every doc
    # whose length lands in the tail zone. So the last start kept is
    # n - chunk_tokens + stride - 1 (and 0 always, so short docs get
    # their single window).
    starts = F.expr(
        f"sequence(0, greatest(size({_toks_sql(text_col)}) "
        f"- {chunk_tokens} + {stride} - 1, 0), {stride})"
    )
    windows = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.slice(toks, s + 1, chunk_tokens).alias("w"),
        ),
    )
    exploded = (
        df.select(F.col(id_col), F.explode(windows).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_idx"),
            F.col("c.w").alias("w"),
        )
        # drop stride-aligned empty tails (possible only for empty docs)
        .filter(F.size("w") > 0)
    )
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join("w", " ").alias("chunk_text"),
        F.size("w").alias("n_tokens"),
    )


def cdc_chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 4,
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking — the LBFS/FastCDC boundary rule at
    token granularity: cut AFTER token position ``p`` when the rolling
    hash of the ``w``-gram ENDING at ``p`` satisfies ``h % divisor ==
    0``. Because boundaries depend only on local content, an edit
    reshapes only the chunk it lands in (plus the ≤ w-1 windows it
    touches); every later chunk hash is UNCHANGED — unlike the
    fixed-stride :func:`chunk_documents`, where one insertion shifts
    every subsequent window and defeats chunk-level dedup across
    document revisions. Expected chunk length ≈ ``divisor`` tokens.

    Output: ``(id_col, chunk_idx, n_tokens, chunk_hash, chunk_text)``
    — ``chunk_hash`` (md5) is the cross-revision dedup key.

    Plan shape (scale notes): tokens position-explode once; the gram
    assembles with ``lag()`` (the linear ``winnow_fingerprints``
    spelling, not a quadratic slice re-evaluation); boundary flag and
    running boundary count are windows over the SAME
    partition-by-document ordering — ONE hash shuffle on the id. The
    final ``groupBy(id, chunk_idx)`` is satisfied by that same
    partitioning (clustered-distribution subset), so re-assembly adds
    no second exchange. The gram hash is the portable 44-bit md5
    prefix (`dedup._WINNOW_HASH`), so boundaries replay exactly in an
    ANSI oracle. Tokenization is single-space split with NO empty
    filtering (the winnowing convention — positions align with the SQL
    replay engine-for-engine).

    Chunk length is geometric with mean ``divisor`` for content whose
    grams hash uniformly; there is deliberately NO max-length forced
    cut — FastCDC's max-cut rule depends on the position of the
    previous cut (a sequential recurrence no window function
    expresses), so an adversarial document whose gram hashes never hit
    the boundary residue degenerates to ONE chunk. That worst case
    equals what :func:`chunk_documents` with ``chunk_tokens=len(doc)``
    would produce; route adversarial/binary content through the
    fixed-stride chunker instead.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1: {w}")
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1: {divisor}")
    from pyspark.sql import Window

    order = Window.partitionBy(id_col).orderBy("pos")
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos0", "tok"
        ),
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), F.col("tok"))
    # gram ENDING at pos: tokens pos-w+1..pos via lag (linear)
    parts = [F.lag("tok", j).over(order) for j in range(w - 1, 0, -1)] + [
        F.col("tok")
    ]
    full = parts[0].isNotNull() if w > 1 else F.lit(True)
    flagged = toks.select(
        F.col(id_col),
        "pos",
        "tok",
        F.concat_ws(" ", *parts).alias("gram"),
        full.alias("__full"),
    ).select(
        F.col(id_col),
        "pos",
        "tok",
        (
            F.col("__full")
            & (
                F.expr(
                    "CAST(conv(substr(md5(gram), 1, 11), 16, 10) AS BIGINT)"
                )
                % divisor
                == 0
            )
        )
        .cast("int")
        .alias("__boundary"),
    )
    chunked = flagged.select(
        F.col(id_col),
        "pos",
        "tok",
        F.coalesce(
            F.sum("__boundary").over(
                order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("chunk_idx"),
    )
    assembled = chunked.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text"),
    )
    return assembled.select(
        F.col(id_col),
        "chunk_idx",
        "n_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
        "chunk_text",
    )


def _toks_sql(text_col: str) -> str:
    """SQL text of the tokens() expression (for use inside F.expr)."""
    return f"filter(split(lower({text_col}), ' '), x -> x != '')"


def heavy_hitters(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    k: int = 50,
) -> DataFrame:
    """Per-group heavy-hitter tokens — every token whose in-group
    frequency strictly exceeds ``n_g / k`` — with EXACT counts.

    The 100 TB shape is sketch-then-verify (the same design language as
    MinHash->exact-Jaccard): a per-partition Misra-Gries pass (k
    counters per group, cross-Arrow-batch state inside ``mapInPandas``)
    emits a tiny candidate set, and only candidate tokens are counted
    exactly. The full (group, token) space never shuffles — the
    aggregate shuffle carries candidate rows plus one count row per
    group.

    No false negatives, provably: Misra-Gries with k counters keeps any
    token whose partition frequency exceeds n_p/(k+1), and if a token's
    GLOBAL frequency exceeds n_g/k then by averaging its frequency
    exceeds n_p/(k+1) in at least one partition. False positives are
    eliminated by the exact verify, so the output equals the exact
    relational answer (integer threshold compare: cnt * k > n_g — no
    float arithmetic anywhere).

    Output: (group_col, token, cnt), exactly the true heavy hitters.
    """
    from collections.abc import Iterator

    import pandas as pd

    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(F.expr(_toks_sql(text_col))).alias("token"),
    )

    def _mg(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        state: dict[object, dict[str, int]] = {}
        for pdf in batches:
            # pre-aggregate the batch, then weighted-MG merge: one dict
            # op per DISTINCT (group, token) in the batch, not per token
            for (g, t), w in (
                pdf.groupby(["__g", "token"], sort=False).size().items()
            ):
                d = state.setdefault(g, {})
                if t in d:
                    d[t] += w
                elif len(d) < k:
                    d[t] = w
                else:
                    m = min(min(d.values()), w)
                    for key in list(d):
                        d[key] -= m
                        if d[key] == 0:
                            del d[key]
                    if w > m:
                        d[t] = w - m
        yield pd.DataFrame(
            {
                "__g": [g for g, d in state.items() for _ in d],
                "token": [t for d in state.values() for t in d],
            }
        )

    g_type = df.schema[group_col].dataType.simpleString()
    cands = toks.mapInPandas(
        _mg, schema=f"__g {g_type}, token string"
    ).distinct()
    totals = toks.groupBy("__g").agg(F.count(F.lit(1)).alias("__n_g"))
    verified = (
        toks.join(F.broadcast(cands), ["__g", "token"])
        .groupBy("__g", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        verified.join(F.broadcast(totals), "__g")
        .filter(F.col("cnt") * F.lit(int(k)) > F.col("__n_g"))
        .select(F.col("__g").alias(group_col), "token", "cnt")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    scale: int = 10**6,
) -> DataFrame:
    """Per-document unigram negative log-likelihood under the corpus's
    OWN unigram distribution — the perplexity-proxy quality signal
    (CCNet-style): documents full of globally-rare tokens score high
    (gibberish/noise candidates), boilerplate scores low. No external
    language model needed; the corpus is its own reference.

    Integer-portable arithmetic: each token costs
    ``floor(-ln(c_t / T) * scale)`` (BIGINT micro-nats) and per-doc
    costs are INTEGER sums, so summation order cannot move the result
    across engines. Plan: one map-side-combinable vocab count, a 1-row
    total, one join of the token stream against the costed vocab (AQE
    picks broadcast vs shuffle by vocab size), one per-doc aggregate.

    Output: (id_col, n_tokens, nll_micro_nats) — mean cost is
    ``nll_micro_nats / n_tokens / scale`` nats/token.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_toks_sql(text_col))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    total = toks.agg(F.count(F.lit(1)).alias("__t"))
    costed = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(
            -F.log(F.col("__c").cast("double") / F.col("__t").cast("double"))
            * F.lit(int(scale))
        )
        .cast("long")
        .alias("__cost"),
    )
    return (
        toks.join(costed, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__cost").alias("nll_micro_nats"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    scale: int = 10**6,
) -> DataFrame:
    """Per-document bigram negative log-likelihood under the corpus's own
    add-1-smoothed bigram model — the second-order companion to
    :func:`unigram_logprob`: text whose token TRANSITIONS are globally
    unusual scores high even when every individual token is common
    (shuffled/templated/keyword-stuffed text).

    Model: P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = vocab size.
    Integer-portable arithmetic as in the unigram scorer: per-bigram
    cost ``floor(-ln(p) * scale)`` in BIGINT micro-nats, per-doc costs
    are integer sums — order-free across engines. Plan: two map-side-
    combinable count aggregates (bigrams, unigrams) + a 1-row vocab
    count, one join of the bigram stream against the costed table (AQE
    broadcast), one per-doc aggregate.

    Output: (id_col, n_bigrams, nll_micro_nats).
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.expr(_toks_sql(text_col)).alias("ts")
    )
    stream = toks.select(
        "__id", F.explode(F.col("ts")).alias("token")
    )
    uni = stream.groupBy("token").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    pairs = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "__id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("__id", "p.w1", "p.w2")
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    costed = (
        bi.join(uni.withColumnRenamed("token", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log(
                    (F.col("__c2") + F.lit(1)).cast("double")
                    / (F.col("__c1") + F.col("__v")).cast("double")
                )
                * F.lit(int(scale))
            )
            .cast("long")
            .alias("__cost"),
        )
    )
    return (
        pairs.join(costed, ["w1", "w2"])
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__cost").alias("nll_micro_nats"),
        )
    )


def bpe_pair_merges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 20,
) -> DataFrame:
    """One distributed BPE merge step: count every ADJACENT token pair
    across the corpus and return the ``top_n`` merge candidates.

    This is the inner loop of byte-pair-encoding tokenizer training
    (Sennrich et al. 2016) re-expressed as a Spark aggregation: the
    highest-count pair is the next merge rule. Adjacency is materialized
    with ``transform(sequence(...))`` over the token array (no UDF), and
    the count is a plain map-side-combinable groupBy — at 100 TB the
    shuffle carries one partial count per distinct pair per partition,
    not one row per token. Top-n selection is ``orderBy + limit``
    (TakeOrdered — no global sort materialization); ties at the boundary
    break on (left_tok, right_tok) so the selected set is deterministic
    across engines.

    Output: (left_tok, right_tok, merged_tok, pair_count, doc_freq).
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.expr(_toks_sql(text_col)).alias("ts")
    ).filter(F.size("ts") >= 2)
    pairs = toks.select(
        "__id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(ts[i-1] AS left_tok, ts[i] AS right_tok))"
            )
        ).alias("p"),
    ).select("__id", "p.left_tok", "p.right_tok")
    counted = pairs.groupBy("left_tok", "right_tok").agg(
        F.count(F.lit(1)).alias("pair_count"),
        F.countDistinct("__id").alias("doc_freq"),
    )
    return (
        counted.orderBy(
            F.col("pair_count").desc(), F.col("left_tok"), F.col("right_tok")
        )
        .limit(int(top_n))
        .select(
            "left_tok",
            "right_tok",
            F.concat("left_tok", "right_tok").alias("merged_tok"),
            "pair_count",
            "doc_freq",
        )
    )


def write_token_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    target_files: int | None = None,
) -> None:
    """Materialize an inverted token index: distinct (token, id) rows,
    repartitioned BY TOKEN so each keyword's postings cluster in few
    files (the parquet reader's token predicate then touches a fraction
    of the index). The full-text-search accelerator: a keyword query
    probes postings instead of scanning every document's text."""
    idx = docs.select(
        F.explode(F.expr(_toks_sql(text_col))).alias("token"),
        F.col(id_col),
    ).distinct()
    idx = idx.repartition(target_files or 8, "token")
    idx.write.mode("overwrite").parquet(path)


def keyword_search_indexed(
    docs: DataFrame,
    index_path: str,
    keywords: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """AND-semantics keyword search via the postings index: each keyword
    probes its postings (a pushed-down IN filter on the token column),
    ids appearing once per keyword survive (count == n_keywords), and
    only THOSE ids join back to the documents table. The text column is
    never scanned at query time.
    """
    if not keywords:
        raise ValueError("keywords must be non-empty")
    kws = [k.lower() for k in keywords]
    idx = docs.sparkSession.read.parquet(index_path)
    hits = (
        idx.filter(F.col("token").isin(kws))
        .groupBy(id_col)
        .agg(F.countDistinct("token").alias("__nk"))
        .filter(F.col("__nk") == len(set(kws)))
        .select(id_col)
    )
    return docs.join(hits, id_col)


def bm25_search(
    docs: DataFrame,
    keywords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 10**6,
) -> DataFrame:
    """BM25-ranked OR-semantics keyword search (Robertson/Spärck Jones):
    every document containing ANY query term, scored

        sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    with idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1) (the Lucene
    variant — strictly positive). Integer-portable: each TERM's
    contribution is floored to micro-units before the per-doc integer
    sum, so cross-engine float summation order cannot move a score.

    One token explode feeds tf, dl, and df; N/avgdl arrive as a 1-row
    broadcast — the same single-pass shape as TF-IDF.
    Output: (id_col, score_micro, n_terms_hit), score-descending ranks
    belong to the caller (ORDER BY score_micro DESC, id).
    """
    kws = sorted({k.lower() for k in keywords})
    if not kws:
        raise ValueError("keywords must be non-empty")
    toks = docs.select(
        F.col(id_col), F.explode(F.expr(_toks_sql(text_col))).alias("token")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    hits = (
        toks.filter(F.col("token").isin(list(kws)))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_t = hits.groupBy("token").agg(
        F.countDistinct(id_col).alias("__df")
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    denom = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl") / F.col("__avgdl")
    )
    term_score = idf * F.col("__tf") * (k1 + 1.0) / denom
    scored = (
        hits.join(df_t, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            F.floor(term_score * F.lit(int(scale)))
            .cast("long")
            .alias("__s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__s").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )


def write_positional_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    target_files: int | None = None,
) -> None:
    """Positional postings: (token, id, pos) — the phrase-query index.
    ~2 small ints heavier per posting than :func:`write_token_index`,
    in exchange for adjacency queries without touching the text."""
    idx = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(_toks_sql(text_col))).alias("pos", "token"),
    )
    idx = idx.repartition(target_files or 8, "token")
    idx.write.mode("overwrite").parquet(path)


def phrase_search_indexed(
    docs: DataFrame,
    index_path: str,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search over the positional index: the i-th word's
    postings join the (i+1)-th word's at pos+1, chained across the
    phrase — each step is an equi-join on (id, pos) keys, candidates
    shrink monotonically, and the text column is never read.

    Output: (id_col, n_occurrences) for documents containing the phrase
    at least once.
    """
    words = [w.lower() for w in phrase]
    if not words:
        raise ValueError("phrase must be non-empty")
    idx = docs.sparkSession.read.parquet(index_path)
    cur = idx.filter(F.col("token") == words[0]).select(
        F.col(id_col), F.col("pos").alias("__start"), F.col("pos")
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = idx.filter(F.col("token") == w).select(
            F.col(id_col), (F.col("pos") - i).alias("__start")
        )
        cur = cur.join(nxt, [id_col, "__start"]).select(
            F.col(id_col), F.col("__start"), (F.col("__start") + i).alias("pos")
        )
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def _bpe_merge_pass(arr: Column, left: str, right: str) -> Column:
    """One exhaustive left-to-right non-overlapping merge pass of the
    literal rule ``(left, right)`` over a token array — the shared
    fold of :func:`bpe_apply_merges` (encode) and :func:`bpe_train`
    (the per-round apply step). A fresh merge can never re-match its
    own rule (``left || right`` is strictly longer than ``left`` and
    tokens are non-empty), so the fold equals "repeatedly merge the
    leftmost occurrence" — the recursive-CTE form the SQL oracles
    replay."""

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(arr, F.array().cast("array<string>"), step)


def bpe_apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table to every document — the encode half
    of the BPE tokenizer loop (:func:`bpe_pair_merges` is the learn
    half).

    Semantics (deterministic, engine-portable): for each rule in rank
    order, one exhaustive left-to-right non-overlapping pass replaces
    every adjacent ``(left, right)`` token pair with ``left || right``;
    later rules see earlier rules' merged tokens. A single pass is a
    fold: walk the token array once, replacing the accumulator's tail
    when it equals ``left`` and the next token equals ``right``. The
    fold needs no merged-this-pass flag because a fresh merge can never
    re-match its own rule (``left || right`` is strictly longer than
    ``left``, and tokens are non-empty — ``tokens()`` drops empties),
    which also makes the pass equal to "repeatedly merge the leftmost
    occurrence", the form an external SQL oracle can replay with a
    recursive CTE.

    Spark shape: the merge table is a plan literal (rank-ordered
    ``left``/``right`` constants baked into ``k`` chained ``aggregate``
    higher-order expressions — a tokenizer model is a parameter, like a
    join threshold), so the encode is a pure per-row projection: NO
    Python UDF, no shuffle, no join — a narrow map over the corpus
    that scales embarrassingly. Cost per document is
    O(rules · tokens²) array-building in the fold evaluator; bound the
    rule count per call (chain calls for deep vocabularies).

    Returns ``(id_col, tokens array<string>, n_tokens)``.
    """
    for pair in merges:
        left, right = pair
        if not left or not right:
            raise ValueError(f"empty token in merge rule {pair!r}")
    toks = F.expr(_toks_sql(text_col))
    for left, right in merges:
        toks = _bpe_merge_pass(toks, left, right)
    return df.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


def bpe_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_merges: int = 5,
) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (Sennrich et al. 2016, the
    full loop): round ``r`` counts every adjacent token pair over the
    corpus WITH the first ``r - 1`` merge rules already applied, picks
    the single most frequent pair (ties: lexicographic on
    ``(left, right)`` — deterministic, engine-portable), and appends
    it to the merge table. This is what :func:`bpe_pair_merges` (one
    count step) and :func:`bpe_apply_merges` (the encode) compose
    into: unlike the one-shot "top-k pairs of the RAW corpus", true
    training re-counts after each merge, so rule ``r`` can merge
    tokens rule ``r - 1`` created.

    Returns the learned merge table — ``(rank, left_tok, right_tok,
    merged_tok, pair_count)``, ``rank`` 1-based in learn order — a
    tokenizer model (parameter-sized), ready to feed
    :func:`bpe_apply_merges` as plan literals. Stops early when no
    adjacent pair remains.

    Plan shape (bounded rounds, the graph-loop discipline): per round,
    ONE distributed projection applies the newest rule via the shared
    :func:`_bpe_merge_pass` fold and is ``localCheckpoint``-pinned
    (O(1) lineage — round ``r`` never replays folds ``1..r-1``), then
    ONE map-side-combinable pair-count aggregate whose shuffle carries
    a partial per distinct pair per partition, then a 1-ROW argmax
    collect (TakeOrdered). Driver traffic is ``n_merges`` single-row
    parameters; nothing data-sized leaves the executors.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("__id"), F.expr(_toks_sql(text_col)).alias("ts")
    ).localCheckpoint()
    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            toks.filter(F.size("ts") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> struct(ts[i-1] AS l, ts[i] AS r))"
                    )
                ).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top = (
            pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], top[0]["c"]
        rules.append((rank, left, right, left + right, cnt))
        if rank < n_merges:
            toks = toks.withColumn(
                "ts", _bpe_merge_pass(F.col("ts"), left, right)
            ).localCheckpoint()
    return spark.createDataFrame(
        rules,
        "rank int, left_tok string, right_tok string, "
        "merged_tok string, pair_count bigint",
    )


def naive_bayes_fit_score(
    train: DataFrame,
    test: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
    *,
    n_buckets: int = 32768,
) -> DataFrame:
    """Multinomial Naive Bayes: fit on ``train``, classify ``test``.

    The classic corpus-labeling baseline (quality/language/domain
    classifiers over token counts), expressed entirely as joins and
    aggregates — no driver-side model object, no UDFs:

    - features are hashed token buckets (first 11 md5 hex chars mod
      ``n_buckets`` — the portable hashing-trick bound that keeps the
      model frame at |classes| x n_buckets regardless of vocabulary);
    - all log-probabilities ride MICRO-NAT BIGINTs
      (``floor(-ln(p) * 1e6)``, the repo's established log-domain
      portability pattern): per-document class scores are exact integer
      sums, so the argmin — smallest total cost, ties to the
      lexicographically smallest class — is deterministic across
      engines and row orders;
    - add-1 smoothing over the FIXED bucket space: an unseen
      (class, bucket) cell costs ``floor(-ln(1/(tot_c + n_buckets))
      * 1e6)`` — the same closed form the model rows use at cnt = 0,
      so scoring needs only a left join + coalesce.

    Plan shape (scale notes): fitting is two map-side-combinable
    aggregates (token counts per (class, bucket); document counts per
    class); the model and prior frames are bounded by
    |classes| x n_buckets and BROADCAST. Scoring explodes test tokens
    once, cross-joins the |classes|-row class frame (broadcast,
    map-local blowup), left-joins the model, and aggregates per
    (document, class) — combinable, shuffle keyed on the document id.
    No windows; the only per-document state is the running integer sum.

    Output: (id_col, label_col [actual], predicted, correct) — one row
    per test document with at least one token.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 11), 16, 10)
        .cast("bigint") % F.lit(n_buckets)
    )
    tr_toks = train.select(
        F.col(label_col).alias("__c"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select("__c", bucket.alias("__b"))

    counts = tr_toks.groupBy("__c", "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    tots = tr_toks.groupBy("__c").agg(F.count(F.lit(1)).alias("__tot"))
    n_train = train.count()
    priors = (
        train.groupBy(F.col(label_col).alias("__c"))
        .agg(F.count(F.lit(1)).alias("__nd"))
        .select(
            "__c",
            F.floor(
                -F.log(F.col("__nd") / F.lit(float(n_train))) * 1e6
            ).cast("bigint").alias("__prior_cost"),
        )
    )
    model = counts.join(tots, "__c").select(
        "__c",
        "__b",
        F.floor(
            -F.log(
                (F.col("__cnt") + 1)
                / (F.col("__tot") + F.lit(n_buckets)).cast("double")
            )
            * 1e6
        ).cast("bigint").alias("__cost"),
    )
    default_cost = tots.select(
        "__c",
        F.floor(
            -F.log(
                F.lit(1.0) / (F.col("__tot") + F.lit(n_buckets)).cast("double")
            )
            * 1e6
        ).cast("bigint").alias("__def_cost"),
    )
    classes = priors.join(default_cost, "__c")

    te_toks = test.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(F.col(id_col), bucket.alias("__b"))
    scored = (
        te_toks.crossJoin(F.broadcast(classes))
        .join(F.broadcast(model), ["__c", "__b"], "left")
        .groupBy(id_col, "__c")
        .agg(
            (
                F.first("__prior_cost")
                + F.sum(F.coalesce(F.col("__cost"), F.col("__def_cost")))
            ).alias("__total")
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("__total"), F.col("__c"))).alias("__best")
    )
    return (
        best.join(test.select(id_col, label_col), id_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            F.col("__best.__c").alias("predicted"),
            (F.col("__best.__c") == F.col(label_col)).alias("correct"),
            # the winner's exact integer cost: exposing it makes the
            # whole fit — smoothing, bucket hash, priors — externally
            # checkable, not just the argmin (a smoothing bug that
            # doesn't flip any boundary prediction still moves this)
            F.col("__best.__total").cast("long").alias("cost_micronats"),
        )
    )


def char_ngram_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the character n-gram
    distribution — the compressibility proxy quality filters use where
    a real compressor is unavailable: boilerplate, keyword-stuffed and
    looping text has a peaked n-gram distribution (low entropy), while
    natural prose sits in a characteristic band (the Gopher/C4 family
    of heuristics gates on exactly this kind of signal). Returns
    ``(id_col, n_grams, distinct_grams, entropy)``; documents shorter
    than ``n`` characters emit no grams and are absent.

    ``H = log2(T) - (sum_g c_g * log2(c_g)) / T`` over gram counts
    ``c_g`` with total ``T`` — the algebraic form whose inner sum is a
    plain aggregate, so no per-doc probability vector ever
    materializes.

    Plan shape: position-explode the gram stream (narrow), then ONE
    shuffle keyed ``(doc, gram)`` for the count aggregate (map-side
    combinable — repeated grams pre-collapse per mapper) and a second
    tiny aggregate keyed on the doc over one row per DISTINCT gram
    (bounded by alphabet^n, far below token volume). All expression
    work (substring slicing, log2 arithmetic) stays in whole-stage
    codegen; no UDF.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    from ..session import rebalance_for_compute

    # CASE guard, not greatest(..., 0): Spark's sequence(1, 0) DESCENDS
    # ([1, 0]) instead of being empty, which would fabricate grams for
    # docs shorter than n
    grams = rebalance_for_compute(df).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN length({text_col}) >= {n} THEN "
                f"transform(sequence(1, length({text_col}) - {n - 1}), "
                f"i -> substring({text_col}, i, {n})) "
                f"ELSE array() END"
            )
        ).alias("__g"),
    )
    counts = grams.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_grams"),
            F.count(F.lit(1)).alias("distinct_grams"),
            F.sum(F.col("__c") * F.log2("__c")).alias("__clog"),
        )
        .select(
            id_col,
            "n_grams",
            "distinct_grams",
            F.round(
                F.log2("n_grams") - F.col("__clog") / F.col("n_grams"), 6
            ).alias("entropy"),
        )
    )


def perplexity_bucket_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_buckets: int = 3,
    keep_buckets: tuple[int, ...] = (1, 2),
    scale: int = 10**6,
    num_buckets: int = 64,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document by its average bigram NLL under the corpus's OWN
    language model, cut the corpus into ``n_buckets`` equal-population
    perplexity buckets (head = most natural), and flag the buckets a
    pretraining pipeline keeps — the classic head+middle gate that
    drops the most-perplex tail.

    Composition of two already-scale-audited primitives, no new
    machinery: per-doc NLL from :func:`bigram_logprob` (map-side-
    combinable count aggregates; integer micro-nats), equal-population
    buckets from :func:`..rowid.exact_ntile` — the bucket-decomposed
    rank, NOT ``ntile() OVER (ORDER BY ...)``'s single-partition
    global Window.

    Determinism: the bucket order key is the exact integer
    ``(avg_micro_nats << 32) | doc_id`` — average cost, id tie-break —
    guarded LOUD on both fields' ranges (id in ``[0, 2^32)``, average
    in ``[0, 2^31)``; re-key or widen past those). Docs with fewer
    than 2 tokens have no bigrams, hence no perplexity, and are absent
    from the output (the caller routes them by length policy, not
    perplexity).

    Output: ``(id_col, n_bigrams, nll_micro_nats, avg_micro_nats,
    bucket, keep)``.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    bad = [b for b in keep_buckets if not 1 <= b <= n_buckets]
    if bad or not keep_buckets:
        raise ValueError(
            f"keep_buckets must be non-empty values in [1, {n_buckets}]: "
            f"{keep_buckets}"
        )
    from .rowid import exact_ntile

    nll = bigram_logprob(df, id_col, text_col, scale=scale)
    avg = F.expr("nll_micro_nats div n_bigrams")
    guarded_id = F.when(
        (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(1 << 32)),
        F.col(id_col),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "perplexity_bucket_filter: %s %s outside [0, 2^32) — "
                "the (avg << 32) | id order key needs a 32-bit id; "
                "re-key or widen the encoding",
                F.lit(id_col),
                F.col(id_col).cast("string"),
            )
        ).cast("long")
    )
    guarded_avg = F.when(
        (avg >= 0) & (avg < F.lit(1 << 31)),
        avg,
    ).otherwise(
        F.raise_error(
            F.format_string(
                "perplexity_bucket_filter: avg_micro_nats %s outside "
                "[0, 2^31) — widen the order-key encoding",
                avg.cast("string"),
            )
        ).cast("long")
    )
    keyed = nll.select(
        id_col,
        "n_bigrams",
        "nll_micro_nats",
        avg.alias("avg_micro_nats"),
        (F.shiftleft(guarded_avg, 32) + guarded_id).alias("__pkey"),
    )
    bucketed = exact_ntile(
        keyed, "__pkey", n_buckets, tile_col="bucket",
        num_buckets=num_buckets,
    ).drop("__pkey")
    keep = F.col("bucket").isin(*[int(b) for b in keep_buckets])
    return bucketed.select(
        id_col,
        "n_bigrams",
        "nll_micro_nats",
        "avg_micro_nats",
        F.col("bucket").cast("int").alias("bucket"),
        keep.alias("keep"),
    )


def word_cooccurrence_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 2,
    min_count: int = 5,
    top_n: int = 50,
    scale: int = 10**6,
) -> DataFrame:
    """Windowed word co-occurrence PMI (Church & Hanks 1990) — the
    distributional-association table behind embedding training data,
    collocation mining, and phrase induction: for every unordered word
    pair within ``window`` token positions, ``pmi = ln(c12 * N /
    (c1 * c2))`` where the marginals count WINDOW SLOTS (each pair
    occurrence contributes one slot to each side), so the estimator is
    a proper joint/marginal ratio over the pair space.

    Spark shape, zero UDF: pair enumeration is a nested
    ``transform(sequence(...))`` expression over the token array (the
    bigram machinery generalized to offsets ``1..window``), exploded
    once; pairs are canonicalized unordered via ``least/greatest``
    BEFORE the count, so the count aggregate is one map-side-combinable
    shuffle keyed on the pair. Marginals derive from the SAME pair
    frame (sum over both sides via an explode of the 2-array), never a
    second corpus scan. PMI lands as integer micro-nats
    (``floor(pmi * scale)``) — the repo's portable-float idiom. Top-n
    selection is ``orderBy + limit`` (TakeOrdered, no global sort
    materialization) with a full (pmi, w1, w2) tie-break.

    ``min_count`` filters rare pairs BEFORE the join against marginals
    (rare-pair PMI is noise and dominates otherwise). Output:
    ``(w1, w2, n_pair, n_w1, n_w2, pmi_micro_nats)``, ``w1 < w2``.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1: {top_n}")
    toks = df.select(
        F.col(id_col).alias("__id"), F.expr(_toks_sql(text_col)).alias("ts")
    ).filter(F.size("ts") >= 2)
    # offsets 1..window per position: flatten(transform(i, transform(d)))
    pairs = toks.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, size(ts) - 2),
                   i -> transform(
                     sequence(i + 1, least(i + {int(window)}, size(ts) - 1)),
                     j -> struct(least(ts[i], ts[j]) AS w1,
                                 greatest(ts[i], ts[j]) AS w2))))"""
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cp = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    # slot marginals + total from the pair counts themselves (tiny
    # frame relative to the corpus; no second corpus scan)
    slots = cp.select(
        F.explode(F.array("w1", "w2")).alias("w"), F.col("n_pair")
    ).groupBy("w").agg(F.sum("n_pair").alias("n_w"))
    total = cp.agg(F.sum("n_pair").alias("__n"))
    kept = cp.filter(F.col("n_pair") >= min_count)
    out = (
        kept.join(slots.withColumnRenamed("w", "w1")
                  .withColumnRenamed("n_w", "n_w1"), "w1")
        .join(slots.withColumnRenamed("w", "w2")
              .withColumnRenamed("n_w", "n_w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.floor(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.col("__n").cast("double")
                    / (
                        F.col("n_w1").cast("double")
                        * F.col("n_w2").cast("double")
                    )
                )
                * F.lit(int(scale))
            )
            .cast("long")
            .alias("pmi_micro_nats"),
        )
    )
    return out.orderBy(
        F.col("pmi_micro_nats").desc(), "w1", "w2"
    ).limit(int(top_n))


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    scale: int = 10**6,
) -> DataFrame:
    """NDCG@k per query (Järvelin & Kekäläinen 2002, the exponential
    gain form ``(2^rel - 1) / log2(rank + 1)``) — the search-quality
    eval for the retrieval legs (BM25 / ANN): how close each query's
    score ranking is to its ideal relevance ordering.

    Scale shape: rankings are per-QUERY windows (a query's candidate
    list is a retrieved result set, bounded by construction — this is
    an eval over retrievals, not a corpus sort), so the two
    ``row_number`` windows partition by the query key and distribute
    across queries. Ties break on ``id_col`` in BOTH orderings, making
    every rank — and therefore the statistic — fully deterministic.

    Portability: each term is floored to integer ``1/scale`` units
    from deterministic inputs (integer gain, ``log2`` of an integer
    rank — the corpus-proven transcendental idiom), so the per-query
    DCG and ideal-DCG are order-free LONG sums and ``ndcg`` is ONE
    final division. Relevance must be a non-NULL integer in [0, 30]
    (``2^rel`` stays in long) — enforced LOUD in-plan. A query whose
    judged relevance is all-zero has ``idcg = 0`` and yields ``ndcg =
    NULL`` (a data condition, not an error).

    Output: one row per query: ``(query_col, dcg_micro, idcg_micro,
    ndcg)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from pyspark.sql import Window as W

    rel = F.col(rel_col).cast("bigint")
    bad = rel.isNull() | (rel < 0) | (rel > 30)
    checked_rel = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "ndcg_at_k: %s must be a non-NULL integer in [0, 30]: %s",
                F.lit(rel_col),
                F.coalesce(rel.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(rel)
    base = df.select(
        F.col(query_col).alias("__q"),
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__id"),
        checked_rel.alias("__rel"),
    )
    w_rank = W.partitionBy("__q").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    w_ideal = W.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    gain = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__rel AS INT)) - 1")

    def dcg(rank_col):
        term = F.floor(
            gain.cast("double")
            / F.log2(rank_col.cast("double") + 1.0)
            * F.lit(int(scale))
        ).cast("long")
        return F.sum(F.when(rank_col <= k, term).otherwise(F.lit(0)))

    ranked = base.select(
        "__q",
        "__rel",
        F.row_number().over(w_rank).alias("__r"),
        F.row_number().over(w_ideal).alias("__ri"),
    )
    per_q = ranked.groupBy(F.col("__q").alias(query_col)).agg(
        dcg(F.col("__r")).alias("dcg_micro"),
        dcg(F.col("__ri")).alias("idcg_micro"),
    )
    return per_q.select(
        query_col,
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.col("dcg_micro").cast("double")
            / F.col("idcg_micro").cast("double"),
        ).alias("ndcg"),
    )


def mrr_at_k(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    scale: int = 10**6,
) -> DataFrame:
    """Mean Reciprocal Rank @ k — the first-relevant-hit eval beside
    :func:`ndcg_at_k` (NDCG grades the whole list, MRR asks "how fast
    does the first relevant result appear?" — the navigational-query
    metric). Relevance is binary here: ``rel > 0`` counts as relevant
    (non-NULL enforced LOUD).

    Fully integer until one division: the per-query reciprocal rank is
    ``scale div rank`` (exact integer division — no float anywhere),
    queries whose first relevant result ranks past ``k`` (or who have
    none) contribute 0, and MRR is the exact long sum over queries
    divided once by the query count. Per-QUERY windows with the full
    (score desc, id asc) tie-break, same bounded-result-list shape as
    NDCG.

    Output: one row ``(n_queries, n_hit, sum_rr_micro, mrr)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from pyspark.sql import Window as W

    rel = F.col(rel_col).cast("bigint")
    checked_rel = F.when(
        rel.isNull(),
        F.raise_error(
            F.format_string(
                "mrr_at_k: %s must be non-NULL", F.lit(rel_col)
            )
        ).cast("bigint"),
    ).otherwise(rel)
    base = df.select(
        F.col(query_col).alias("__q"),
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__id"),
        checked_rel.alias("__rel"),
    )
    w = W.partitionBy("__q").orderBy(F.col("__s").desc(), F.col("__id").asc())
    ranked = base.select(
        "__q", "__rel", F.row_number().over(w).alias("__r")
    )
    per_q = ranked.groupBy("__q").agg(
        F.min(
            F.when((F.col("__rel") > 0) & (F.col("__r") <= k), F.col("__r"))
        ).alias("__first")
    )
    rr = F.when(
        F.col("__first").isNotNull(),
        F.expr(f"CAST({int(scale)} AS BIGINT) div __first"),
    ).otherwise(F.lit(0).cast("bigint"))
    out = per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("__first").isNotNull(), 1).otherwise(0)).alias(
            "n_hit"
        ),
        F.sum(rr).alias("sum_rr_micro"),
    )
    return out.select(
        F.col("n_queries").cast("bigint").alias("n_queries"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
        F.col("sum_rr_micro").cast("bigint").alias("sum_rr_micro"),
        (
            F.col("sum_rr_micro").cast("double")
            / (F.col("n_queries").cast("double") * F.lit(float(scale)))
        ).alias("mrr"),
    )
