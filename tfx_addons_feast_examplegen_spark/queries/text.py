"""Text analysis: quality, lang-id, TF-IDF/BM25 search, BPE, corpus audits.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text as tx
from ..session import register_tables

from ._shared import (
    _TEXT_QUALITY_ORACLE,
    _dd_profile,
)



def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.quality_score(t["documents"]).select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
        "punct_ratio", "uniq_token_ratio", "quality_score",
    )


def _q_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content-defined chunking: boundary where the portable 44-bit md5
    # rolling-gram hash ≡ 0 (mod 8) — chunk hashes stay dedupable
    # across document revisions because boundaries depend only on
    # local content. One shuffle (the per-doc window ordering); the
    # chunk re-assembly reuses it.
    t = register_tables(spark, sf_dir)
    return tx.cdc_chunk_documents(t["documents"], w=4, divisor=8)


_CDC_CHUNKING_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tok,
         CASE WHEN i >= 4 AND
              CAST(('0x' || substr(md5(array_to_string(w[i-3:i], ' ')),
                                   1, 11)) AS BIGINT) % 8 = 0
              THEN 1 ELSE 0 END AS boundary
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
),
c AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(boundary) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_idx
  FROM tok
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(COUNT(*) AS INT) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM c GROUP BY 1, 2
"""


def _q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reliability diagram + ECE of the quality score against a cheap
    # reference label (contains the English function word "the" —
    # quality's stopword/uniq components make the score genuinely
    # informative for it). The audit that belongs right before
    # weighted_sample treats quality_score as a keep-probability.
    from ..operators.stats import calibration_bins

    t = register_tables(spark, sf_dir)
    labeled = t["documents"].withColumn(
        "y",
        F.expr("contains(concat(' ', lower(text), ' '), ' the ')").cast(
            "int"
        ),
    )
    return calibration_bins(
        tx.quality_score(labeled), "quality_score", "y", n_bins=10
    )


_SCORE_CALIBRATION_ORACLE = f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
j AS (
  SELECT tq.quality_score AS s,
         CASE WHEN contains(' ' || lower(d.text) || ' ', ' the ')
              THEN 1.0 ELSE 0.0 END AS y
  FROM tq JOIN documents d USING (doc_id)
),
b AS (
  SELECT LEAST(CAST(floor(s * 10) AS INT), 9) AS bin,
         COUNT(*) AS n, avg(s) AS ms, avg(y) AS pr
  FROM j GROUP BY 1
),
tot AS (SELECT SUM(n * abs(ms - pr)) / SUM(n) AS ece FROM b)
SELECT bin, CAST(n AS BIGINT) AS n, round(ms, 6) AS mean_score,
       round(pr, 6) AS pos_rate, round(abs(ms - pr), 6) AS gap,
       round((SELECT ece FROM tot), 6) AS ece
FROM b
"""


def _q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Character-trigram Shannon entropy per document: the
    # compressibility proxy (boilerplate/looping text scores low,
    # natural prose sits in a band). n=3 keeps the gram space bounded
    # by |alphabet|^3 while still catching phrase-level repetition.
    from ..operators.text import char_ngram_entropy

    t = register_tables(spark, sf_dir)
    return char_ngram_entropy(t["documents"], n=3)


_CHAR_ENTROPY_ORACLE = """
WITH g AS (
  SELECT doc_id, substr(text, i, 3) AS g
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS i)
  WHERE length(text) >= 3
),
c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS distinct_grams,
       round(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy
FROM c GROUP BY 1
"""


def _q_score_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample KS between the quality-score distributions of the
    # even/odd doc halves — the no-binning drift audit beside
    # feature_drift_psi. The halves are near-identically distributed,
    # so the statistic is small but nonzero: exactly the regime a
    # drift monitor must resolve.
    from ..operators.stats import ks_two_sample

    t = register_tables(spark, sf_dir)
    scored = tx.quality_score(t["documents"]).select(
        "quality_score", (F.col("doc_id") % 2).cast("string").alias("half")
    )
    return ks_two_sample(scored, "quality_score", "half", decimals=4)


_SCORE_DRIFT_KS_ORACLE = f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
s AS (
  SELECT round(quality_score, 4) AS v, CAST(doc_id % 2 AS VARCHAR) AS grp
  FROM tq
),
per AS (SELECT v, grp, COUNT(*) AS c FROM s GROUP BY 1, 2),
wide AS (
  SELECT v,
         SUM(CASE WHEN grp = '0' THEN c ELSE 0 END) AS ca,
         SUM(CASE WHEN grp = '1' THEN c ELSE 0 END) AS cb
  FROM per GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cca,
         SUM(cb) OVER (ORDER BY v) AS ccb,
         SUM(ca) OVER () AS na,
         SUM(cb) OVER () AS nb
  FROM wide
)
SELECT '0' AS group_a, '1' AS group_b,
       CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       round(MAX(ABS(cca / na - ccb / nb)), 6) AS ks_stat
FROM cum
"""


def _q_score_drift_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QQ drift table for the same even/odd quality-score split as
    # score_drift_ks: KS says whether the distributions differ, this
    # says WHERE — the value at each ECDF level per half and the
    # shift. Type-1 (inverse-ECDF) quantiles on the 1e-4 grid, exact
    # in both engines.
    from ..operators.stats import quantile_shift

    t = register_tables(spark, sf_dir)
    scored = tx.quality_score(t["documents"]).select(
        "quality_score", (F.col("doc_id") % 2).cast("string").alias("half")
    )
    return quantile_shift(scored, "quality_score", "half", decimals=4)


_SCORE_DRIFT_QQ_ORACLE = f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
s AS (
  SELECT round(quality_score, 4) AS v, CAST(doc_id % 2 AS VARCHAR) AS grp
  FROM tq
),
per AS (SELECT v, grp, COUNT(*) AS c FROM s GROUP BY 1, 2),
wide AS (
  SELECT v,
         SUM(CASE WHEN grp = '0' THEN c ELSE 0 END) AS ca,
         SUM(CASE WHEN grp = '1' THEN c ELSE 0 END) AS cb
  FROM per GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) / (SUM(ca) OVER ()) AS fa,
         SUM(cb) OVER (ORDER BY v) / (SUM(cb) OVER ()) AS fb
  FROM wide
),
qs(q) AS (
  SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS q
)
SELECT q, '0' AS group_a, '1' AS group_b,
       MIN(CASE WHEN fa >= q THEN v END) AS v_a,
       MIN(CASE WHEN fb >= q THEN v END) AS v_b,
       round(MIN(CASE WHEN fb >= q THEN v END)
             - MIN(CASE WHEN fa >= q THEN v END), 4) AS shift
FROM cum, qs GROUP BY q
"""


def _q_lang_quality_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mutual information between document language and the quality-
    # score quartile: the leakage/feature-selection audit — "how much
    # does language predict the quality bucket?" (a nonzero MI here
    # means a language-blind quality threshold shifts the language
    # mix, the classic silent-filtering bias).
    from ..operators.stats import categorical_mutual_information

    t = register_tables(spark, sf_dir)
    scored = tx.quality_score(t["documents"]).select(
        "lang",
        F.least(F.floor(F.col("quality_score") * 4).cast("int"), F.lit(3))
        .cast("string")
        .alias("q4"),
    )
    return categorical_mutual_information(scored, "lang", "q4")


_LANG_QUALITY_MI_ORACLE = f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
j AS (
  SELECT d.lang AS a,
         CAST(LEAST(CAST(floor(tq.quality_score * 4) AS INT), 3)
              AS VARCHAR) AS b
  FROM tq JOIN documents d USING (doc_id)
),
joint AS (SELECT a, b, COUNT(*) AS c FROM j GROUP BY 1, 2),
sc AS (
  SELECT c,
         SUM(c) OVER () AS n,
         SUM(c) OVER (PARTITION BY a) AS ca,
         SUM(c) OVER (PARTITION BY b) AS cb
  FROM joint
),
agg AS (
  SELECT MAX(n) AS n,
         SUM(c * (log2(c) + log2(n) - log2(ca) - log2(cb))) / MAX(n) AS mi,
         log2(MAX(n)) - SUM(c * log2(ca)) / MAX(n) AS ha,
         log2(MAX(n)) - SUM(c * log2(cb)) / MAX(n) AS hb
  FROM sc
)
SELECT CAST(n AS BIGINT) AS n,
       round(mi, 6) AS mi,
       round(ha, 6) AS h_a,
       round(hb, 6) AS h_b,
       CASE WHEN ha > 0 AND hb > 0
            THEN round(mi / sqrt(ha * hb), 6) END AS nmi
FROM agg
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("predicted", tx.lang_id("text"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _langid_case() -> str:
    langs = list(tx.LANG_PROFILES)
    hit_defs = ",\n    ".join(
        f"len(list_intersect(toks, {_dd_profile(tx.LANG_PROFILES[lang])})) AS h_{lang}"
        for lang in langs
    )
    branches = []
    for lang in langs:
        conds = [f"h_{lang} > 0"] + [
            f"h_{lang} >= h_{o}" for o in langs if o != lang
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT lang,
         list_distinct(list_filter(string_split(lower(text), ' '),
                                   x -> x <> '')) AS toks
  FROM documents
), h AS (
  SELECT lang,
    {hit_defs}
  FROM t
)
SELECT lang, {case} AS predicted, CAST(count(*) AS BIGINT) AS n
FROM h GROUP BY 1, 2
"""


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "source",
            tx.token_count("text").alias("n_tok"),
            F.length("text").alias("len_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.sum("len_chars").alias("total_chars"),
        )
    )


_TOKEN_STATS_ORACLE = """
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 4) AS avg_tokens,
       CAST(sum(len_chars) AS BIGINT) AS total_chars
FROM (
  SELECT source,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok,
         length(text) AS len_chars
  FROM documents
)
GROUP BY source
"""


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.doc_fingerprints(t["documents"])


_FINGERPRINT_ORACLE = """
SELECT doc_id, md5(text) AS fp_exact,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp_normalized
FROM documents
"""


def _q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Subword-ish token budget per source. The token pattern uses explicit
    # ASCII classes (text.BPE_ISH_TOKEN_PATTERN) so the identical regex
    # runs under Java regex (Spark) and RE2 (DuckDB) -> oracle-checked.
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("source", tx.bpe_ish_token_count("text").alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 2).alias("avg_bpe_tokens"),
        )
    )


_BPE_TOKENS_ORACLE = r"""
WITH b AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z_]+|[0-9]|[^A-Za-z0-9_ \t\n\r]'))
           AS n_bpe
  FROM documents
)
SELECT source, CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       round(avg(n_bpe), 2) AS avg_bpe_tokens
FROM b GROUP BY source
"""


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.tfidf_top_terms(t["documents"], "doc_id", "text", k=3)


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok2 GROUP BY 1
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.doc_freq,
         round(t.tf * ln(n.n_docs * 1.0 / d.doc_freq), 4) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, tfidf FROM ranked WHERE rn <= 3
"""


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RAG-style chunking: overlapping 64-token windows every 32 tokens,
    # generated as a pure flat-map (no shuffle) over the scan.
    t = register_tables(spark, sf_dir)
    return tx.chunk_documents(
        t["documents"], "doc_id", "text", chunk_tokens=64, stride=32
    )


_CHUNK_DOCUMENTS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, CAST(s // 32 AS INT) AS chunk_idx,
         toks[s + 1 : s + 64] AS w
  FROM t, LATERAL (
    SELECT unnest(generate_series(0, greatest(len(toks) - 64 + 32 - 1, 0), 32)) AS s
  )
)
SELECT doc_id, chunk_idx, array_to_string(w, ' ') AS chunk_text,
       CAST(len(w) AS INT) AS n_tokens
FROM c WHERE len(w) > 0
"""


def _q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF surface (SURVEY §2.8): one doc row -> N sentence rows
    # via a registered table function called through SQL LATERAL. The
    # oracle replays the identical split rule in pure SQL — proving the
    # UDTF's output, and demonstrating that this logic COULD stay
    # JVM-side (the UDTF exists to exercise the plug surface).
    from ..functions.udtfs import register_udtfs

    register_tables(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM documents d, LATERAL split_sentences(d.text) s
        """
    )


_UDTF_SENTENCES_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[.!?]+ +'), x -> x <> '')
           AS parts
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS sent_idx, parts[i] AS sentence,
       CAST(length(parts[i]) AS INT) AS n_chars
FROM s, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i)
"""


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perplexity-proxy curation signal: per-doc unigram NLL under the
    # corpus's own token distribution (no external LM). Costs are
    # floor(-ln(c/T)*1e6) micro-nat BIGINTs summed per doc — integer
    # sums, so summation order can't move the hash across engines.
    from ..operators.text import unigram_logprob

    t = register_tables(spark, sf_dir)
    return unigram_logprob(t["documents"], "doc_id", "text")


_UNIGRAM_LOGPROB_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
v AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
t AS (SELECT count(*) AS t FROM tok),
costed AS (
  SELECT token,
         CAST(floor(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000)
              AS BIGINT) AS cost
  FROM v, t
)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(cost) AS BIGINT) AS nll_micro_nats
FROM tok JOIN costed USING (token)
GROUP BY tok.doc_id
"""


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenizer vocabulary coverage curve (OOV-rate planning): share of
    # token OCCURRENCES covered by the top-V types at three budgets.
    # The corpus scans ONCE into a pinned vocab-sized count frame (the
    # SQL-text form re-tokenized per LATERAL reuse — 4 scans); ranking
    # and the three budget sums then run over the tiny pinned frame.
    # The global type ranking is a vocab-sized sort.
    t = register_tables(spark, sf_dir)
    c = dd._pin(
        t["documents"]
        .select(
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "),
                         lambda x: x != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # only ranks <= 1000 are consumed, so bound the rank window's input
    # STRUCTURALLY with a TakeOrdered limit (per-partition top-k +
    # driverless merge — distributed at any vocabulary size) instead of
    # ranking the full token-type table through one task; the window
    # then sorts <= 1000 rows
    ranked = (
        c.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(1000)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("token"))
            ),
        )
    )
    tot = c.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("n_types")
    )
    out = None
    for v in (10, 100, 1000):
        cov = ranked.filter(F.col("rnk") <= v).agg(
            F.sum("cnt").alias("covered")
        )
        row = cov.crossJoin(F.broadcast(tot)).select(
            F.lit(v).cast("int").alias("vocab_budget"),
            F.floor(10000.0 * F.col("covered") / F.col("t"))
            .cast("long")
            .alias("covered_bp"),
            F.col("n_types").cast("long").alias("n_types"),
        )
        out = row if out is None else out.unionByName(row)
    return out

_QVOCAB_COVERAGE_ORACLE = """
WITH c AS (
  SELECT token, count(*) AS cnt FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS token
    FROM documents
  ) GROUP BY token
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk FROM c
),
tot AS (SELECT sum(cnt) AS t, count(*) AS n_types FROM ranked)
SELECT v.v AS vocab_budget,
       CAST(floor(10000.0 * cov.covered / tot.t) AS BIGINT) AS covered_bp,
       CAST(tot.n_types AS BIGINT) AS n_types
FROM (SELECT 10 AS v UNION ALL SELECT 100 UNION ALL SELECT 1000) v,
     tot,
     LATERAL (SELECT sum(cnt) AS covered FROM ranked
              WHERE rnk <= v.v) cov
"""


def _q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inverted-index full-text search: postings materialized once
    # (distinct (token, doc_id), clustered by token), an AND query
    # probes postings and joins back by id — the text column is never
    # scanned at query time. Oracle: direct token-membership scan.
    import tempfile as _tempfile

    from ..operators.text import keyword_search_indexed, write_token_index

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    idx = _tempfile.mkdtemp(prefix="token_index_") + "/idx"
    write_token_index(docs, idx)
    out = keyword_search_indexed(docs, idx, ["spark", "hash"])
    return out.select("doc_id", "lang", "source", "n_chars")


_KEYWORD_SEARCH_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE list_contains(string_split(lower(text), ' '), 'spark')
  AND list_contains(string_split(lower(text), ' '), 'hash')
"""


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-phrase search via positional postings: "table value" found
    # by chaining (id, pos) equi-joins — adjacency resolved entirely in
    # the index, text never read. Oracle: token-position self-join.
    import tempfile as _tempfile

    from ..operators.text import phrase_search_indexed, write_positional_index

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    idx = _tempfile.mkdtemp(prefix="pos_index_") + "/idx"
    write_positional_index(docs, idx)
    return phrase_search_indexed(docs, idx, ["table", "value"])


_PHRASE_SEARCH_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
)
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.tok = 'table' AND b.tok = 'value'
GROUP BY a.doc_id
"""


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25-ranked OR search (Lucene idf variant), per-term micro floors
    # before the integer per-doc sum — cross-engine summation order
    # cannot move a score.
    t = register_tables(spark, sf_dir)
    return tx.bm25_search(t["documents"], ["spark", "hash"])


_BM25_SEARCH_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
hits AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE token IN ('hash', 'spark')
  GROUP BY doc_id, token
),
dft AS (SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token),
scored AS (
  SELECT h.doc_id,
         CAST(floor(
           ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * h.tf * 2.2
           / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl))
           * 1000000) AS BIGINT) AS s
  FROM hits h JOIN dft d USING (token) JOIN dl l USING (doc_id), corpus c
)
SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM scored GROUP BY doc_id
"""

_QNOVELTY_ORACLE = """
WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
base AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
novel AS (
  SELECT n.source, count(DISTINCT n.s) AS n_new
  FROM (SELECT source, s FROM sh WHERE doc_id % 2 = 1) n
  ANTI JOIN base b ON n.s = b.s
  GROUP BY n.source
),
tot AS (
  SELECT source, count(DISTINCT s) AS n_all
  FROM sh WHERE doc_id % 2 = 1 GROUP BY source
)
SELECT t.source, CAST(t.n_all AS BIGINT) AS n_shingles,
       CAST(coalesce(v.n_new, 0) AS BIGINT) AS n_novel,
       CAST(floor(10000.0 * coalesce(v.n_new, 0) / t.n_all) AS BIGINT)
         AS novelty_bp
FROM tot t LEFT JOIN novel v ON v.source = t.source
"""


def _q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dataset data card: (metric, value) BIGINT rows — size, vocabulary,
    # provenance spread, exact-dup mass, language balance. Fixed-point
    # scaling everywhere; entropy floors per language BEFORE the integer
    # sum, so the card is bit-portable.
    from ..operators.corpus import corpus_report

    t = register_tables(spark, sf_dir)
    return corpus_report(t["documents"])


_CORPUS_REPORT_ORACLE = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM documents
),
vocab AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab_size
  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS token FROM documents)
),
ent AS (
  SELECT CAST(sum(term) AS BIGINT) AS lang_entropy_micro_nats
  FROM (
    SELECT CAST(floor(-ln(CAST(n_l AS DOUBLE) / b.n_docs) * 1000000
                      * n_l / b.n_docs) AS BIGINT) AS term
    FROM (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang), base b
  )
)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, n_docs AS value FROM base
  UNION ALL SELECT 'n_tokens', n_tokens FROM base
  UNION ALL SELECT 'vocab_size', vocab_size FROM vocab
  UNION ALL SELECT 'n_langs', n_langs FROM base
  UNION ALL SELECT 'n_sources', n_sources FROM base
  UNION ALL SELECT 'exact_dup_docs', n_docs - n_distinct_texts FROM base
  UNION ALL SELECT 'mean_doc_len_centitokens',
                   CAST(floor(n_tokens * 100 / n_docs) AS BIGINT) FROM base
  UNION ALL SELECT 'lang_entropy_micro_nats', lang_entropy_micro_nats
            FROM ent
)
"""


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cross-source contamination audit: containment_pairs with the
    # SOURCE as the identity — distinct shingles per source, pairwise
    # shared-shingle containment (shared / min set size). The operator
    # is id-agnostic by design; the same capped bucket join that pairs
    # documents pairs provenance groups.
    t = register_tables(spark, sf_dir)
    out = dd.containment_pairs(
        t["documents"], "source", "text", n=3, threshold=0.01,
        on_over_cap="error", max_bucket=100000,
    )
    return out.select(
        F.col("doc_a").alias("source_a"),
        F.col("doc_b").alias("source_b"),
        "containment",
    )


_SOURCE_OVERLAP_ORACLE = """
WITH t AS (SELECT source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT source, count(*) AS nsh FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.01
"""


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second-order perplexity proxy: add-1-smoothed bigram NLL under the
    # corpus's own transition counts — flags text whose token TRANSITIONS
    # are unusual even when every token is common. Same integer
    # micro-nat portability contract as text_unigram_logprob.
    t = register_tables(spark, sf_dir)
    return tx.bigram_logprob(t["documents"], "doc_id", "text")


_BIGRAM_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
v AS (SELECT count(*) AS v FROM uni),
p AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2),
costed AS (
  SELECT bi.w1, bi.w2,
         CAST(floor(-ln(CAST(bi.c2 + 1 AS DOUBLE)
                        / CAST(uni.c1 + v.v AS DOUBLE)) * 1000000)
              AS BIGINT) AS cost
  FROM bi JOIN uni ON uni.token = bi.w1, v
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(cost) AS BIGINT) AS nll_micro_nats
FROM p JOIN costed USING (w1, w2)
GROUP BY p.doc_id
"""


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-language heavy-hitter tokens (freq > n_g/50), Misra-Gries
    # candidates + exact verify — sketch-then-verify like MinHash/
    # Jaccard, so the output EQUALS the exact relational answer and the
    # oracle is plain SQL (no contract needed; integer threshold).
    from ..operators.text import heavy_hitters

    t = register_tables(spark, sf_dir)
    return heavy_hitters(t["documents"], "lang", "text", k=50)


_HEAVY_HITTERS_ORACLE = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
n AS (SELECT lang, count(*) AS n_g FROM tok GROUP BY lang),
c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token)
SELECT c.lang, c.token, CAST(c.cnt AS BIGINT) AS cnt
FROM c JOIN n USING (lang)
WHERE c.cnt * 50 > n.n_g
"""


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full iterative BPE training loop (VERDICT r14 item 5): five
    # rounds of count-pairs -> pick top-1 -> apply-merge, where round r
    # counts over the corpus with rules 1..r-1 already applied (so a
    # rule can merge tokens an earlier rule created — the property the
    # one-shot top-k step lacks). Per round: one localCheckpoint-pinned
    # fold projection + one map-side-combinable count + a 1-row argmax.
    t = register_tables(spark, sf_dir)
    return tx.bpe_train(t["documents"], "doc_id", "text", n_merges=5)


def _bpe_train_round_sql(r: int) -> str:
    # one unrolled training round: count pairs over toks{r-1}, pick the
    # deterministic top-1 rule, then (for non-final rounds) replay the
    # exhaustive left-to-right merge as repeated leftmost single merges
    # with a recursive CTE (equal by the bpe_apply_merges argument: a
    # fresh merge can never re-match its own rule)
    prev = f"toks{r - 1}" if r > 1 else "toks0"
    return f"""
cnt{r} AS (
  SELECT w[i] AS l, w[i+1] AS r, count(*) AS c
  FROM (SELECT doc_id, ts AS w FROM {prev}),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
  GROUP BY 1, 2
),
rule{r} AS (
  SELECT l, r, c FROM cnt{r} ORDER BY c DESC, l, r LIMIT 1
),
apply{r} AS (
  SELECT t.doc_id, t.ts, 0 AS done FROM {prev} t
  UNION ALL
  SELECT a.doc_id,
         CASE WHEN x.pos IS NOT NULL
              THEN a.ts[1:x.pos-1] || [m.l || m.r] || a.ts[x.pos+2:]
              ELSE a.ts END,
         CASE WHEN x.pos IS NOT NULL THEN 0 ELSE 1 END
  FROM apply{r} a JOIN rule{r} m ON true,
       LATERAL (SELECT (list_filter(range(1, len(a.ts)),
                        i -> a.ts[i] = m.l AND a.ts[i+1] = m.r))[1] AS pos) x
  WHERE a.done = 0
),
toks{r} AS (SELECT doc_id, ts FROM apply{r} WHERE done = 1)"""


_BPE_TRAIN_ORACLE = (
    """
WITH RECURSIVE
toks0 AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
  FROM documents
),"""
    + ",".join(_bpe_train_round_sql(r) for r in range(1, 6))
    + """
SELECT CAST(rank AS INT) AS rank, l AS left_tok, r AS right_tok,
       l || r AS merged_tok, CAST(c AS BIGINT) AS pair_count
FROM ("""
    + " UNION ALL ".join(
        f"SELECT {r} AS rank, l, r, c FROM rule{r}" for r in range(1, 6)
    )
    + ")"
)


def _q_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One distributed BPE merge step (Sennrich et al. 2016): corpus-wide
    # adjacent-token-pair counts, top-20 merge candidates. Map-side
    # combinable aggregation; tie-break on (left, right) makes the
    # selected set deterministic across engines.
    t = register_tables(spark, sf_dir)
    return tx.bpe_pair_merges(t["documents"], "doc_id", "text", top_n=20)


_BPE_PAIR_MERGES_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
p AS (
  SELECT doc_id, w[i] AS left_tok, w[i+1] AS right_tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
),
c AS (
  SELECT left_tok, right_tok,
         CAST(count(*) AS BIGINT) AS pair_count,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM p GROUP BY 1, 2
)
SELECT left_tok, right_tok, left_tok || right_tok AS merged_tok,
       pair_count, doc_freq
FROM c
ORDER BY pair_count DESC, left_tok, right_tok
LIMIT 20
"""


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style within-doc repeated-n-gram signals, as a no-shuffle
    # scan-time projection.
    from ..operators.text import intra_doc_repetition

    t = register_tables(spark, sf_dir)
    return intra_doc_repetition(t["documents"], n=3)


_REPETITION_ORACLE = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                              x -> x <> '') AS w
           FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT s) AS BIGINT) AS n_distinct_grams
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_distinct_grams, 0) AS n_distinct_grams,
       round((coalesce(a.n_grams, 0) - coalesce(a.n_distinct_grams, 0)) * 1.0
             / greatest(coalesce(a.n_grams, 0), 1), 4) AS rep_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scrub synthetic PII appended to each doc; output md5 of the
    # redacted text so the oracle checks byte-identical transformation.
    from ..operators.text import redact_pii

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 123-4567 at 192.168.0."),
            F.col("doc_id").cast("string"),
        ),
    )
    return redact_pii(docs).select("doc_id", F.md5("text").alias("redacted_md5"))


_PII_REDACTION_ORACLE = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 (555) 123-4567 at 192.168.0.'
              || CAST(doc_id AS VARCHAR),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g'),
         '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g')) AS redacted_md5
FROM documents
"""


def _q_novelty_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-source novelty of a held-out half against a base half: 3-gram
    # shingles, odd-doc shingles anti-joined against the distinct even
    # half, rate in basis points.
    t = register_tables(spark, sf_dir)
    # The CASE guard matters: for a <3-token doc, sequence(1, 0) in
    # Spark DESCENDS to [1, 0] and slice(..., 0, 3) then raises — a
    # short doc anywhere in the corpus would fail the job (the DuckDB
    # oracle's generate_series is empty for the same doc). Emitting an
    # empty array makes both engines agree: no shingles, row drops at
    # the explode.
    shingle_expr = (
        "CASE WHEN size(split(lower(text), ' ')) >= 3 THEN "
        "transform(sequence(1, size(split(lower(text), ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(lower(text), ' '), i, 3))) "
        "ELSE array() END"
    )
    sh = (
        t["documents"]
        .select(
            "doc_id", "source", F.explode(F.expr(shingle_expr)).alias("s")
        )
        .distinct()
    )
    base = sh.filter(F.col("doc_id") % 2 == 0).select("s").distinct()
    odd = sh.filter(F.col("doc_id") % 2 == 1)
    novel = (
        odd.select("source", "s")
        .join(base, "s", "left_anti")
        .groupBy("source")
        .agg(F.countDistinct("s").alias("n_new"))
    )
    tot = odd.groupBy("source").agg(F.countDistinct("s").alias("n_all"))
    n_new = F.coalesce(F.col("n_new"), F.lit(0))
    return tot.join(novel, "source", "left").select(
        "source",
        F.col("n_all").cast("bigint").alias("n_shingles"),
        n_new.cast("bigint").alias("n_novel"),
        F.floor(F.lit(10000.0) * n_new / F.col("n_all"))
        .cast("bigint")
        .alias("novelty_bp"),
    )


def _q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WET-style extraction. The page is synthesized deterministically
    # around each document's text (title/style/script/comment/entity
    # furniture — the parts an extractor must REMOVE or DECODE), so the
    # operator's output is fully predictable and the oracle rebuilds
    # the same page in SQL and extracts with DuckDB-native regexps —
    # two independent spellings of the same contract.
    from ..operators.crawl import extract_html_text

    t = register_tables(spark, sf_dir)
    html = F.concat(
        F.lit('<html><head><title>Doc</title><style type="text/css">p '
              "{ color: #fff; }</style>"
              '<script>if (1 < 2 && x > 0) { alert("hi"); }</script>'
              "</head><body><h1>"),
        F.col("lang"),
        F.lit("</h1><!-- nav --><p>"),
        F.col("text"),
        F.lit("</p><p>Tom &amp; Jerry &lt;3 &quot;ok&quot;"
              "&nbsp;&#39;end&#39;</p></body></html>"),
    )
    docs = t["documents"].select("doc_id", html.alias("html"))
    extracted = extract_html_text(F.col("html"))
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.size(F.split(extracted, " ")).cast("bigint").alias("n_words"),
    )


_HTML_TEXT_EXTRACT_ORACLE = """
WITH page AS (
  SELECT doc_id,
         '<html><head><title>Doc</title><style type="text/css">p '
         || '{ color: #fff; }</style>'
         || '<script>if (1 < 2 && x > 0) { alert("hi"); }</script>'
         || '</head><body><h1>' || lang || '</h1><!-- nav --><p>'
         || text || '</p><p>Tom &amp; Jerry &lt;3 &quot;ok&quot;'
         || '&nbsp;&#39;end&#39;</p></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?is)<script[^>]*>.*?</script>',
                                ' ', 'g'),
                 '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
             '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article)(\\s[^>]*)?>',
             chr(10), 'g'),
           '<[^>]+>', ' ', 'g') AS t
  FROM page
),
decoded AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(
           t, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS t
  FROM stripped
),
final AS (
  SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS extracted
  FROM decoded
)
SELECT doc_id, extracted,
       CAST(len(string_split(extracted, ' ')) AS BIGINT) AS n_words
FROM final
"""


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Four URL shapes per the doc_id residue, covering every
    # normalization branch: mixed-case scheme/host, default and
    # NON-default explicit ports, duplicate-slash and trailing-slash
    # paths, fragments, tracking params interleaved with real ones,
    # and an emptied query. The oracle renormalizes with DuckDB string
    # primitives (string_split/list_filter/list_sort), a genuinely
    # different spelling from the Spark expression tree.
    from ..operators.crawl import canonicalize_url

    t = register_tables(spark, sf_dir)
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("HTTP://WWW.Example.COM:80//a/b/c/"
                     "?utm_source=feed&b=2&a=1#frag"))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("https://Sub.Example.org:443/path/"),
                       F.col("source"),
                       F.lit("/?z=9&utm_medium=email&m="),
                       (F.col("doc_id") % 7).cast("string")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("http://example.net/"), F.col("lang"),
                       F.lit("//x/?fbclid=abc123&q="),
                       (F.col("doc_id") % 5).cast("string"),
                       F.lit("&p=2#x")))
        .otherwise(
            F.concat(F.lit("HTTPS://cdn.Example.com:8443/assets//img/"),
                     (F.col("doc_id") % 13).cast("string"),
                     F.lit(".png?gclid=1&utm_campaign=x")))
    )
    docs = t["documents"].select("doc_id", url.alias("url"))
    return docs.select(
        "doc_id", "url", canonicalize_url(F.col("url")).alias("canonical")
    )


_URL_CANONICALIZE_ORACLE = """
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'HTTP://WWW.Example.COM:80//a/b/c/'
                       || '?utm_source=feed&b=2&a=1#frag'
           WHEN 1 THEN 'https://Sub.Example.org:443/path/' || source
                       || '/?z=9&utm_medium=email&m=' || (doc_id % 7)
           WHEN 2 THEN 'http://example.net/' || lang
                       || '//x/?fbclid=abc123&q=' || (doc_id % 5)
                       || '&p=2#x'
           ELSE 'HTTPS://cdn.Example.com:8443/assets//img/'
                || (doc_id % 13) || '.png?gclid=1&utm_campaign=x'
         END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         regexp_replace(url, '#.*$', '') AS nofrag
  FROM u
),
split_parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(nofrag, '^[^:]+://([^/?]*)', 1)) AS authority,
         regexp_extract(nofrag, '^[^:]+://[^/?]*([^?]*)', 1) AS raw_path,
         regexp_extract(nofrag, '\\?(.*)$', 1) AS raw_query
  FROM parts
),
norm AS (
  SELECT doc_id, url, scheme,
         regexp_extract(authority, '^([^:]*)', 1) AS host,
         regexp_extract(authority, ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_replace(raw_path, '/{2,}', '/', 'g'),
                        '/$', '') AS no_trail,
         coalesce(array_to_string(
           list_sort(list_filter(string_split(raw_query, '&'),
             p -> p <> '' AND NOT regexp_matches(p,
                  '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)(=|$)'))),
           '&'), '') AS query
  FROM split_parts
)
SELECT doc_id, url,
       scheme || '://'
       || CASE WHEN port <> ''
                AND NOT (scheme = 'http' AND port = '80')
                AND NOT (scheme = 'https' AND port = '443')
               THEN host || ':' || port ELSE host END
       || CASE WHEN no_trail = '' THEN '/' ELSE no_trail END
       || CASE WHEN query = '' THEN '' ELSE '?' || query END AS canonical
FROM norm
"""


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The encode half of the BPE loop: learn the top-8 merge rules from
    # the corpus (same deterministic selection the bpe_pair_merges
    # entry proves), collect them as a tokenizer model (a parameter,
    # not data), and apply them corpus-wide as a pure projection — k
    # chained aggregate() folds, no UDF, no shuffle. The oracle replays
    # rank-ordered leftmost single merges with a recursive CTE, which
    # equals the operator's exhaustive left-to-right pass because a
    # fresh merge can never re-match its own rule (see
    # operators/text.py:bpe_apply_merges).
    t = register_tables(spark, sf_dir)
    rules = tx.bpe_pair_merges(t["documents"], "doc_id", "text", top_n=8).collect()
    merges = [(r["left_tok"], r["right_tok"]) for r in rules]
    enc = tx.bpe_apply_merges(t["documents"], merges, "doc_id", "text")
    return enc.select(
        "doc_id",
        F.concat_ws("|", "tokens").alias("encoded"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


_BPE_ENCODE_ORACLE = """
WITH RECURSIVE
t AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
  FROM documents
),
p AS (
  SELECT doc_id, w[i] AS left_tok, w[i+1] AS right_tok
  FROM (SELECT doc_id, ts AS w FROM t),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
),
c AS (
  SELECT left_tok, right_tok, count(*) AS pair_count
  FROM p GROUP BY 1, 2
),
rules AS (
  SELECT row_number() OVER (ORDER BY pair_count DESC, left_tok, right_tok) AS ri,
         left_tok AS l, right_tok AS r
  FROM c ORDER BY pair_count DESC, left_tok, right_tok LIMIT 8
),
enc AS (
  SELECT doc_id, ts, 1 AS ri FROM t
  UNION ALL
  SELECT e.doc_id,
         CASE WHEN x.pos IS NOT NULL
              THEN e.ts[1:x.pos-1] || [m.l || m.r] || e.ts[x.pos+2:]
              ELSE e.ts END,
         CASE WHEN x.pos IS NOT NULL THEN e.ri ELSE e.ri + 1 END
  FROM enc e JOIN rules m ON m.ri = e.ri,
       LATERAL (SELECT (list_filter(range(1, len(e.ts)),
                        i -> e.ts[i] = m.l AND e.ts[i+1] = m.r))[1] AS pos) x
  WHERE e.ri <= 8
)
SELECT doc_id, array_to_string(ts, '|') AS encoded, CAST(len(ts) AS BIGINT) AS n_tokens
FROM enc WHERE ri = 9
"""



def _q_url_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Robots-exclusion verdicts by RFC 9309 longest-match: the rewrite
    # explodes each URL path into its character prefixes and equi-joins
    # rules on (host, prefix) - never a per-rule starts_with scan - and
    # one max(struct(len, allow)) per URL implements longest-wins +
    # allow-on-tie. Fixture rules exercise the disallow, the longer
    # allow override, a same-length tie (allow must win) and the
    # no-match default-allow path.
    from ..operators.crawl import robots_filter

    t = register_tables(spark, sf_dir)
    urls = t["documents"].select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "host"
        ),
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/p"), F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    rules = (
        spark.range(7)
        .select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            F.explode(
                F.expr(
                    "array("
                    "struct('/src1' AS prefix, false AS allow),"
                    "struct('/src1/en' AS prefix, true AS allow),"
                    "struct(concat('/src', CAST(id AS STRING)) AS prefix,"
                    " false AS allow),"
                    "struct('/src2' AS prefix, false AS allow),"
                    "struct('/src2' AS prefix, true AS allow))"
                )
            ).alias("r"),
        )
        .select("host", "r.prefix", "r.allow")
    )
    out = robots_filter(urls, rules)
    return out.select(
        F.col("url_id").alias("doc_id"),
        "allowed",
        F.col("rule_len").cast("int").alias("rule_len"),
    )


_URL_ROBOTS_FILTER_ORACLE = """
WITH urls AS (
  SELECT doc_id, 'h' || (doc_id % 7) AS host,
         '/' || source || '/' || lang || '/p' || doc_id AS path
  FROM documents
),
hosts AS (SELECT 'h' || h AS host, h FROM (SELECT unnest(range(0, 7)) AS h)),
rules AS (
  SELECT host, prefix, allow FROM hosts, (VALUES
    ('/src1', FALSE), ('/src1/en', TRUE),
    ('/src2', FALSE), ('/src2', TRUE)) v(prefix, allow)
  UNION ALL
  SELECT host, '/src' || h, FALSE FROM hosts
),
m AS (
  SELECT u.doc_id, r.prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
  FROM urls u JOIN rules r
    ON r.host = u.host AND starts_with(u.path, r.prefix)
)
SELECT u.doc_id,
       COALESCE(m.allow, TRUE) AS allowed,
       CAST(length(m.prefix) AS INTEGER) AS rule_len
FROM urls u LEFT JOIN m ON m.doc_id = u.doc_id AND m.rn = 1
"""


def _q_nb_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Classifier distillation, the production pattern for corpus
    # labeling at scale: an expensive rule/model (here the lang_id
    # stopword heuristic) labels the training split, and a multinomial
    # Naive Bayes over hashed token buckets learns to mimic it — the
    # cheap student then scores the whole corpus. Fit + score are pure
    # joins/aggregates with micro-nat integer log-costs (operator
    # docstring), so the full procedure — labeling rule, token
    # bucketing, smoothing, argmin with lexicographic tie-break —
    # replays exactly in the oracle.
    t = register_tables(spark, sf_dir)
    labeled = t["documents"].select(
        "doc_id", "text", tx.lang_id("text").alias("y")
    )
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    test = labeled.filter(F.col("doc_id") % 5 == 0)
    return tx.naive_bayes_fit_score(
        train, test, "y", "text", "doc_id", n_buckets=32768
    )


def _nb_distill_oracle() -> str:
    langs = list(tx.LANG_PROFILES)
    hit_defs = ",\n    ".join(
        f"len(list_intersect(toks, {_dd_profile(tx.LANG_PROFILES[lang])}))"
        f" AS h_{lang}"
        for lang in langs
    )
    branches = []
    for lang in langs:
        conds = [f"h_{lang} > 0"] + [
            f"h_{lang} >= h_{o}" for o in langs if o != lang
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    bucket = "CAST(('0x' || substr(md5(tok), 1, 11)) AS BIGINT) % 32768"
    return f"""
WITH raw AS (
  SELECT doc_id, text,
         list_distinct(list_filter(string_split(lower(text), ' '),
                                   x -> x <> '')) AS toks
  FROM documents
), h AS (
  SELECT doc_id, text,
    {hit_defs}
  FROM raw
), lab AS (
  SELECT doc_id, text, {case} AS y FROM h
),
train AS (SELECT * FROM lab WHERE doc_id % 5 <> 0),
test AS (SELECT * FROM lab WHERE doc_id % 5 = 0),
trt AS (
  SELECT y AS c, {bucket} AS b
  FROM train, LATERAL (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS tok
  )
),
counts AS (SELECT c, b, count(*) AS cnt FROM trt GROUP BY 1, 2),
tots AS (SELECT c, count(*) AS tot FROM trt GROUP BY 1),
priors AS (
  SELECT y AS c,
         CAST(floor(-ln(count(*) * 1.0 /
              (SELECT count(*) FROM train)) * 1000000) AS BIGINT)
           AS prior_cost
  FROM train GROUP BY 1
),
model AS (
  SELECT counts.c, b,
         CAST(floor(-ln((cnt + 1) * 1.0 / (tot + 32768)) * 1000000)
              AS BIGINT) AS cost
  FROM counts JOIN tots ON counts.c = tots.c
),
defc AS (
  SELECT c, CAST(floor(-ln(1.0 / (tot + 32768)) * 1000000) AS BIGINT)
           AS def_cost
  FROM tots
),
tet AS (
  SELECT doc_id, {bucket} AS b
  FROM test, LATERAL (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS tok
  )
),
scored AS (
  SELECT tet.doc_id, cl.c,
         any_value(pr.prior_cost)
           + sum(coalesce(model.cost, dc.def_cost)) AS total
  FROM tet
  CROSS JOIN (SELECT c FROM tots) cl
  JOIN priors pr ON pr.c = cl.c
  JOIN defc dc ON dc.c = cl.c
  LEFT JOIN model ON model.c = cl.c AND model.b = tet.b
  GROUP BY 1, 2
),
ranked AS (
  SELECT doc_id, c, total,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY total, c) AS rn
  FROM scored
)
SELECT r.doc_id, t.y, r.c AS predicted, r.c = t.y AS correct,
       CAST(r.total AS BIGINT) AS cost_micronats
FROM ranked r JOIN test t ON t.doc_id = r.doc_id
WHERE r.rn = 1
"""


def _q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact tie-aware ROC-AUC of document length against the even/odd
    # doc-id label — the classifier-quality audit (Mann-Whitney U)
    # with NO single-partition rank Window: the global rank comes from
    # the bucket-decomposed rowid machinery, tie-average ranks from
    # the per-score (min, max) block, and the statistic is exact
    # integers until one final IEEE division. n_chars is heavily tied,
    # exercising the tie-block contiguity argument; the halves are
    # near-exchangeable so AUC sits near 0.5 — the regime where a
    # tie-careless implementation visibly drifts. The oracle IS the
    # naive global-Window ranking; bit-for-bit equivalence on
    # (n_pos, n_neg, u2) and the single division is the contract.
    from ..operators.stats import auc_roc

    t = register_tables(spark, sf_dir)
    scored = t["documents"].select(
        F.col("n_chars").alias("score"),
        (F.col("doc_id") % 2).alias("label"),
    )
    return auc_roc(scored, "score", "label", num_buckets=8)


_EVAL_AUC_ORACLE = """
WITH s AS (
  SELECT n_chars AS score, doc_id % 2 AS label FROM documents
),
r AS (
  SELECT score, label, ROW_NUMBER() OVER (ORDER BY score) AS rn FROM s
),
g AS (
  SELECT score, SUM(label) AS npos, MIN(rn) AS rmin, MAX(rn) AS rmax
  FROM r GROUP BY 1
),
a AS (
  SELECT SUM(npos * (rmin + rmax)) AS s2, SUM(npos) AS np,
         SUM(rmax - rmin + 1) AS n
  FROM g
)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(n - np AS BIGINT) AS n_neg,
       CAST(s2 - np * (np + 1) AS BIGINT) AS u2,
       CAST(s2 - np * (np + 1) AS DOUBLE)
         / (2.0 * CAST(np AS DOUBLE) * CAST(n - np AS DOUBLE)) AS auc
FROM a
"""


def _q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style perplexity gate: average bigram NLL under the
    # corpus's own LM, equal-population head/middle/tail buckets via
    # the bucket-decomposed exact_ntile (no single-partition Window),
    # keep = head+middle. The order key is the exact integer
    # (avg << 32) | doc_id, so the oracle's naive NTILE window over
    # the same key is a bit-for-bit contract.
    from ..operators.text import perplexity_bucket_filter

    t = register_tables(spark, sf_dir)
    return perplexity_bucket_filter(
        t["documents"], n_buckets=3, keep_buckets=(1, 2), num_buckets=8
    )


_PERPLEXITY_BUCKETS_ORACLE = f"""
WITH nl AS ({_BIGRAM_LOGPROB_ORACLE}),
k AS (
  SELECT doc_id, n_bigrams, nll_micro_nats,
         nll_micro_nats // n_bigrams AS avg_micro_nats
  FROM nl
),
b AS (
  SELECT *,
         CAST(NTILE(3) OVER (
           ORDER BY avg_micro_nats * 4294967296 + doc_id
         ) AS INT) AS bucket
  FROM k
)
SELECT doc_id, n_bigrams, nll_micro_nats, avg_micro_nats, bucket,
       bucket IN (1, 2) AS keep
FROM b
"""


def _q_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Windowed word co-occurrence PMI top-50 (window 2, min pair count
    # 5): the collocation/association table embedding pipelines train
    # against. One pair-keyed combinable shuffle; marginals derive
    # from the pair counts (no second corpus scan); PMI as integer
    # micro-nats; TakeOrdered top-n with a full tie-break.
    from ..operators.text import word_cooccurrence_pmi

    t = register_tables(spark, sf_dir)
    return word_cooccurrence_pmi(
        t["documents"], window=2, min_count=5, top_n=50
    )


_WORD_PMI_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
p AS (
  SELECT least(w[i], w[j]) AS w1, greatest(w[i], w[j]) AS w2
  FROM t,
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i),
       LATERAL (SELECT unnest(generate_series(i + 1,
                                              least(i + 2, len(w)))) AS j)
  WHERE len(w) >= 2
),
cp AS (SELECT w1, w2, count(*) AS n_pair FROM p GROUP BY 1, 2),
sl AS (
  SELECT w, SUM(n_pair) AS n_w
  FROM (SELECT w1 AS w, n_pair FROM cp
        UNION ALL SELECT w2 AS w, n_pair FROM cp)
  GROUP BY w
),
n AS (SELECT SUM(n_pair) AS n FROM cp)
SELECT cp.w1, cp.w2, CAST(cp.n_pair AS BIGINT) AS n_pair,
       CAST(a.n_w AS BIGINT) AS n_w1, CAST(b.n_w AS BIGINT) AS n_w2,
       CAST(floor(ln(CAST(cp.n_pair AS DOUBLE) * n.n
                     / (CAST(a.n_w AS DOUBLE) * b.n_w)) * 1000000)
            AS BIGINT) AS pmi_micro_nats
FROM cp JOIN sl a ON a.w = cp.w1 JOIN sl b ON b.w = cp.w2, n
WHERE cp.n_pair >= 5
ORDER BY pmi_micro_nats DESC, cp.w1, cp.w2
LIMIT 50
"""


def _q_eval_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Average Precision for the same (n_chars, even/odd) audit as
    # eval_auc — the imbalance-honest PR companion. Cumulative TP /
    # cumulative N over descending thresholds via the prefix_sum
    # primitive (no single-partition Window on the per-score frame);
    # per-threshold terms floored to nano-units from exact integers,
    # so the long sum is order-free and the oracle's naive cumulative
    # windows land on the identical ap_nano.
    from ..operators.stats import average_precision

    t = register_tables(spark, sf_dir)
    scored = t["documents"].select(
        F.col("n_chars").alias("score"),
        (F.col("doc_id") % 2).alias("label"),
    )
    return average_precision(scored, "score", "label", num_buckets=8)


_EVAL_AVG_PRECISION_ORACLE = """
WITH s AS (
  SELECT n_chars AS score, doc_id % 2 AS label FROM documents
),
g AS (
  SELECT score, count(*) AS n, SUM(label) AS npos FROM s GROUP BY 1
),
c AS (
  SELECT score, n, npos,
         SUM(n) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS cn,
         SUM(npos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
           AS ctp
  FROM g
),
tot AS (SELECT SUM(npos) AS np, SUM(n) AS nt FROM g),
terms AS (
  SELECT CAST(floor(CAST(c.npos AS DOUBLE) * c.ctp * 1e9
                    / (CAST(tot.np AS DOUBLE) * c.cn) + 0.5) AS BIGINT)
           AS term
  FROM c, tot
)
SELECT CAST(tot.np AS BIGINT) AS n_pos,
       CAST(tot.nt - tot.np AS BIGINT) AS n_neg,
       CAST((SELECT SUM(term) FROM terms) AS BIGINT) AS ap_nano,
       CAST((SELECT SUM(term) FROM terms) AS DOUBLE) / 1e9 AS ap
FROM tot
"""


def _q_eval_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full ROC curve table for the (n_chars, even/odd) audit —
    # one row per distinct threshold with tpr/fpr at score >=
    # threshold. Cumulatives via prefix_sum (descending thresholds
    # through the negated key); tpr/fpr are single IEEE divisions of
    # exact integers. Completes the eval trio with eval_auc and
    # eval_average_precision.
    from ..operators.stats import roc_curve

    t = register_tables(spark, sf_dir)
    scored = t["documents"].select(
        F.col("n_chars").alias("score"),
        (F.col("doc_id") % 2).alias("label"),
    )
    return roc_curve(scored, "score", "label", num_buckets=8)


_EVAL_ROC_CURVE_ORACLE = """
WITH s AS (
  SELECT n_chars AS score, doc_id % 2 AS label FROM documents
),
g AS (
  SELECT score, count(*) AS n, SUM(label) AS npos FROM s GROUP BY 1
),
c AS (
  SELECT score, n, npos,
         SUM(n) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS cn,
         SUM(npos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
           AS ctp
  FROM g
),
tot AS (SELECT SUM(npos) AS np, SUM(n) AS nt FROM g)
SELECT c.score AS threshold,
       CAST(c.n AS BIGINT) AS n_at,
       CAST(c.npos AS BIGINT) AS pos_at,
       CAST(c.cn AS BIGINT) AS cum_n,
       CAST(c.ctp AS BIGINT) AS cum_tp,
       CAST(c.ctp AS DOUBLE) / CAST(tot.np AS DOUBLE) AS tpr,
       CAST(c.cn - c.ctp AS DOUBLE) / CAST(tot.nt - tot.np AS DOUBLE)
         AS fpr
FROM c, tot
"""


def _q_eval_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-LANGUAGE exact tie-aware AUC for the (n_chars, even/odd)
    # audit — the slice-level discriminativeness check. Per-group
    # ranks via the grouped rank machinery (no per-group
    # single-partition Window); same integer U arithmetic per group;
    # single-class groups yield NULL (not an error). Oracle is the
    # naive partitioned ROW_NUMBER ranking.
    from ..operators.stats import grouped_auc

    t = register_tables(spark, sf_dir)
    scored = t["documents"].select(
        "lang",
        F.col("n_chars").alias("score"),
        (F.col("doc_id") % 2).alias("label"),
    )
    return grouped_auc(
        scored, ["lang"], "score", "label", num_buckets=8
    )


_EVAL_AUC_BY_LANG_ORACLE = """
WITH s AS (
  SELECT lang, n_chars AS score, doc_id % 2 AS label FROM documents
),
r AS (
  SELECT lang, score, label,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score) AS rn
  FROM s
),
g AS (
  SELECT lang, score, SUM(label) AS npos,
         MIN(rn) AS rmin, MAX(rn) AS rmax
  FROM r GROUP BY 1, 2
),
a AS (
  SELECT lang, SUM(npos * (rmin + rmax)) AS s2, SUM(npos) AS np,
         SUM(rmax - rmin + 1) AS n
  FROM g GROUP BY 1
)
SELECT lang,
       CAST(np AS BIGINT) AS n_pos,
       CAST(n - np AS BIGINT) AS n_neg,
       CASE WHEN np > 0 AND n - np > 0
            THEN CAST(s2 - np * (np + 1) AS BIGINT) END AS u2,
       CASE WHEN np > 0 AND n - np > 0
            THEN CAST(s2 - np * (np + 1) AS DOUBLE)
                 / (2.0 * CAST(np AS DOUBLE) * CAST(n - np AS DOUBLE))
       END AS auc
FROM a
"""


def _q_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NDCG@10 per language for a deterministic synthetic judgment set
    # (score = n_chars ranking, graded relevance = doc_id % 3): the
    # retrieval-quality eval for the BM25/ANN legs. Per-query windows
    # with full (score, id) tie-breaks; per-term integer micro-units
    # so the DCG sums are order-free; one final division. The oracle
    # replays rank-for-rank.
    from ..operators.text import ndcg_at_k

    t = register_tables(spark, sf_dir)
    judged = t["documents"].select(
        "lang",
        F.col("n_chars").alias("score"),
        "doc_id",
        (F.col("doc_id") % 3).alias("rel"),
    )
    return ndcg_at_k(judged, "lang", "score", "rel", 10)


_EVAL_NDCG_ORACLE = """
WITH b AS (
  SELECT lang AS q, n_chars AS s, doc_id AS id, doc_id % 3 AS rel
  FROM documents
),
r AS (
  SELECT q, rel,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY s DESC, id ASC)
           AS rk,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, id ASC)
           AS rki
  FROM b
),
t AS (
  SELECT q,
         SUM(CASE WHEN rk <= 10 THEN
               CAST(floor(CAST((CAST(1 AS BIGINT) << rel) - 1 AS DOUBLE)
                          / log2(CAST(rk AS DOUBLE) + 1.0)
                          * 1000000) AS BIGINT)
             ELSE 0 END) AS dcg,
         SUM(CASE WHEN rki <= 10 THEN
               CAST(floor(CAST((CAST(1 AS BIGINT) << rel) - 1 AS DOUBLE)
                          / log2(CAST(rki AS DOUBLE) + 1.0)
                          * 1000000) AS BIGINT)
             ELSE 0 END) AS idcg
  FROM r GROUP BY q
)
SELECT q AS lang,
       CAST(dcg AS BIGINT) AS dcg_micro,
       CAST(idcg AS BIGINT) AS idcg_micro,
       CASE WHEN idcg > 0
            THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) END AS ndcg
FROM t
"""


def _q_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MRR@10 over the same per-language synthetic judgment set as
    # eval_ndcg_at_k (binary relevance: doc_id % 3 > 0). Integer
    # reciprocal ranks (scale div rank — no float anywhere), one
    # final division; the oracle replays rank-for-rank.
    from ..operators.text import mrr_at_k

    t = register_tables(spark, sf_dir)
    judged = t["documents"].select(
        "lang",
        F.col("n_chars").alias("score"),
        "doc_id",
        (F.col("doc_id") % 3).alias("rel"),
    )
    return mrr_at_k(judged, "lang", "score", "rel", 10)


_EVAL_MRR_ORACLE = """
WITH b AS (
  SELECT lang AS q, n_chars AS s, doc_id AS id, doc_id % 3 AS rel
  FROM documents
),
r AS (
  SELECT q, rel,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY s DESC, id ASC)
           AS rk
  FROM b
),
f AS (
  SELECT q, MIN(CASE WHEN rel > 0 AND rk <= 10 THEN rk END) AS first
  FROM r GROUP BY q
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(CASE WHEN first IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit,
         CAST(SUM(CASE WHEN first IS NOT NULL
                       THEN 1000000 // first ELSE 0 END) AS BIGINT)
           AS sum_rr_micro
  FROM f
)
SELECT n_queries, n_hit, sum_rr_micro,
       CAST(sum_rr_micro AS DOUBLE)
         / (CAST(n_queries AS DOUBLE) * 1000000.0) AS mrr
FROM a
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "eval_auc": (_q_eval_auc, _EVAL_AUC_ORACLE),
    "eval_mrr_at_k": (_q_eval_mrr, _EVAL_MRR_ORACLE),
    "eval_ndcg_at_k": (_q_eval_ndcg, _EVAL_NDCG_ORACLE),
    "eval_auc_by_group": (_q_eval_auc_by_lang, _EVAL_AUC_BY_LANG_ORACLE),
    "eval_roc_curve": (_q_eval_roc_curve, _EVAL_ROC_CURVE_ORACLE),
    "eval_average_precision": (
        _q_eval_avg_precision,
        _EVAL_AVG_PRECISION_ORACLE,
    ),
    "word_cooccurrence_pmi": (_q_word_pmi, _WORD_PMI_ORACLE),
    "perplexity_bucket_filter": (_q_perplexity_buckets, _PERPLEXITY_BUCKETS_ORACLE),
    "nb_distill_classifier": (_q_nb_distill, _nb_distill_oracle()),
    "html_text_extract": (_q_html_text_extract, _HTML_TEXT_EXTRACT_ORACLE),
    "url_robots_filter": (_q_url_robots_filter, _URL_ROBOTS_FILTER_ORACLE),
    "url_canonicalize": (_q_url_canonicalize, _URL_CANONICALIZE_ORACLE),
    "text_repetition": (_q_repetition, _REPETITION_ORACLE),
    "pii_redaction": (_q_pii_redaction, _PII_REDACTION_ORACLE),
    "udtf_split_sentences": (_q_udtf_sentences, _UDTF_SENTENCES_ORACLE),
    "chunk_documents": (_q_chunk_documents, _CHUNK_DOCUMENTS_ORACLE),
    "text_heavy_hitters": (_q_heavy_hitters, _HEAVY_HITTERS_ORACLE),
    "text_unigram_logprob": (_q_unigram_logprob, _UNIGRAM_LOGPROB_ORACLE),
    "bpe_pair_merges": (_q_bpe_pair_merges, _BPE_PAIR_MERGES_ORACLE),
    "bpe_encode": (_q_bpe_encode, _BPE_ENCODE_ORACLE),
    "bpe_train": (_q_bpe_train, _BPE_TRAIN_ORACLE),
    "text_bigram_logprob": (_q_bigram_logprob, _BIGRAM_LOGPROB_ORACLE),
    "corpus_report": (_q_corpus_report, _CORPUS_REPORT_ORACLE),
    "source_overlap_audit": (_q_source_overlap, _SOURCE_OVERLAP_ORACLE),
    "corpus_novelty_rate": (_q_novelty_df, _QNOVELTY_ORACLE),
    "vocab_coverage_curve": (_q_vocab_coverage, _QVOCAB_COVERAGE_ORACLE),
    "keyword_search_indexed": (_q_keyword_search, _KEYWORD_SEARCH_ORACLE),
    "bm25_ranked_search": (_q_bm25_search, _BM25_SEARCH_ORACLE),
    "phrase_search_positional": (_q_phrase_search, _PHRASE_SEARCH_ORACLE),
    "text_bpe_token_budget": (_q_bpe_tokens, _BPE_TOKENS_ORACLE),
    "text_tfidf_topterms": (_q_tfidf, _TFIDF_ORACLE),
    "text_quality": (_q_text_quality, _TEXT_QUALITY_ORACLE),
    "score_calibration_ece": (_q_score_calibration, _SCORE_CALIBRATION_ORACLE),
    "text_char_ngram_entropy": (_q_char_entropy, _CHAR_ENTROPY_ORACLE),
    "score_drift_ks": (_q_score_drift_ks, _SCORE_DRIFT_KS_ORACLE),
    "lang_quality_mi": (_q_lang_quality_mi, _LANG_QUALITY_MI_ORACLE),
    "score_drift_qq": (_q_score_drift_qq, _SCORE_DRIFT_QQ_ORACLE),
    "cdc_chunking": (_q_cdc_chunking, _CDC_CHUNKING_ORACLE),
    "text_lang_id": (_q_lang_id, _langid_case()),
    "text_token_stats": (_q_token_stats, _TOKEN_STATS_ORACLE),
    "text_fingerprint": (_q_fingerprints, _FINGERPRINT_ORACLE),
}
