"""Data Selection with Importance Resampling (DSIR, Xie et al. 2023).

DSIR picks the raw-corpus examples that look most like a small target
corpus (the "give me 10M documents shaped like Wikipedia" primitive of
pretraining-mix construction — public paper/repo): fit two bag-of-
hashed-n-grams models, one on the target (``p``) and one on the raw
pool (``q``), weight every raw example by its log importance ratio
``log w(x) = Σ_b c_b(x) · (log p_b − log q_b)``, and resample
proportionally to ``w`` via Gumbel top-k — sampling WITHOUT
replacement, so the selection isn't just the argmax spike.

Spark shape, chosen for the 100 TB case:
- featurization is one explode → hash → ``groupBy(id, bucket).count``
  pass (map-side combinable; the portable md5 bucket matches the
  repo's oracle-replayable hashing — no xxhash the oracle can't run);
- the two language models are ONE aggregate each over the feature
  frames: ``buckets`` rows per corpus, joined into a ``buckets``-row
  log-ratio table that BROADCASTS to the scorer join — model size is
  a parameter (default 8k rows), never corpus-scale;
- scoring is a broadcast equi-join + one combinable sum per document;
- Gumbel noise is a pure function of the document id via the portable
  fingerprint (``split.fingerprint_bucket`` — no RNG state: re-runs,
  retries and the SQL oracle reproduce the identical draw), and the
  top-k is ``ORDER BY key DESC LIMIT n`` — Spark plans
  TakeOrderedAndProject (per-partition partial top-k, no global sort).

Reference scope: the reference delegates execution to BigQuery and has
no curation surface (feast_component/executor.py:128-163); this
operator extends the Spark-native training-data inventory
(SURVEY.md §2.9) beside temperature_mix / token_budget_select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import fingerprint_bucket, require_integral_key

# 60-bit md5-derived token hash — the simhash-portable spelling, which
# the DuckDB oracle replays as CAST(('0x' || substr(md5(g),1,15)) AS
# BIGINT); 15 hex digits keep the value positive, so plain % is
# engine-portable without pmod reasoning.
_HASH60 = "CAST(conv(substr(md5({g}), 1, 15), 16, 10) AS BIGINT)"


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int,
    n_max: int = 2,
) -> DataFrame:
    """(id, bucket, cnt): counts of word 1..n_max-grams hashed into
    ``buckets`` by the portable md5 hash. Tokens split on single
    spaces, lowercased, empties dropped — the repo's standard
    tokenization. NULL/empty texts contribute no rows (a document with
    no features scores log_weight 0 in :func:`dsir_select`)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    if n_max not in (1, 2):
        raise ValueError(f"n_max must be 1 or 2: {n_max}")
    toks = f"filter(split(lower({text_col}), ' '), t -> t != '')"
    grams = f"transform({toks}, t -> t)"
    if n_max == 2:
        # size >= 2 guard matters: Spark's sequence(1, 0) counts DOWN
        # ([1, 0]), so a 0/1-token document would otherwise index past
        # the array (the _grams_expr/crawl.py pitfall)
        bi = (
            f"CASE WHEN size({toks}) >= 2 THEN"
            f" transform(sequence(1, size({toks}) - 1),"
            f" i -> concat(element_at({toks}, i), ' ',"
            f" element_at({toks}, i + 1)))"
            f" ELSE array() END"
        )
        grams = f"concat({grams}, {bi})"
    h = _HASH60.format(g="g")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.expr(grams)).alias("g"),
        )
        .select(F.col(id_col), F.expr(f"{h} % {buckets}").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    *,
    buckets: int,
    smoothing: float = 1.0,
) -> DataFrame:
    """The ``buckets``-row model table: ``(bucket, log_ratio)`` with
    ``log_ratio = log p_b − log q_b`` under add-``smoothing``
    estimates ``p_b = (c_b + a) / (C + a·K)``. Every bucket in
    ``[0, buckets)`` is present (unseen buckets carry the pure
    smoothing ratio), so the scorer join is total."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0: {smoothing}")

    def _probs(feats: DataFrame, name: str) -> DataFrame:
        return feats.groupBy("bucket").agg(F.sum("cnt").alias(name))

    spark = target_feats.sparkSession
    domain = spark.range(buckets).select(F.col("id").alias("bucket"))
    joined = (
        domain.join(_probs(target_feats, "ct"), "bucket", "left")
        .join(_probs(raw_feats, "cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
    )
    tot = joined.agg(
        F.sum("ct").alias("T"), F.sum("cr").alias("R")
    ).collect()[0]
    a, k = float(smoothing), buckets
    t_den, r_den = float(tot["T"]) + a * k, float(tot["R"]) + a * k
    return joined.select(
        "bucket",
        (
            F.log((F.col("ct") + a) / F.lit(t_den))
            - F.log((F.col("cr") + a) / F.lit(r_den))
        ).alias("log_ratio"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_select: int,
    buckets: int = 8192,
    smoothing: float = 1.0,
    noise_denom: int = 1 << 20,
) -> DataFrame:
    """The ``n_select`` raw documents drawn without replacement with
    probability proportional to the DSIR importance weight: returns
    ``(id_col, log_weight, sample_key)``, ``sample_key`` descending.

    Gumbel top-k: ``key = log w(x) + g(x)`` with
    ``g = −ln(−ln(u))``, ``u = (fingerprint(id) + 0.5) / noise_denom``
    — the standard WOR construction, with the repo's deterministic
    fingerprint as the uniform draw so the selection is replayable
    (and SQL-oracle-checkable) with no RNG state. Documents with no
    features (NULL/empty text) score ``log_weight = 0``: they stay in
    the pool on noise alone rather than silently vanishing.
    """
    require_integral_key(raw, id_col, "dsir_select")
    if n_select < 1:
        raise ValueError(f"n_select must be >= 1: {n_select}")
    raw_feats = hashed_ngram_features(
        raw, id_col, text_col, buckets=buckets
    )
    target_feats = hashed_ngram_features(
        target, id_col, text_col, buckets=buckets
    )
    ratios = dsir_log_ratios(
        target_feats, raw_feats, buckets=buckets, smoothing=smoothing
    )
    scored = (
        raw_feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"))
    )
    u = (
        fingerprint_bucket(F.col(id_col), noise_denom) + F.lit(0.5)
    ) / F.lit(float(noise_denom))
    gumbel = -F.log(-F.log(u))
    return (
        raw.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
        .withColumn("sample_key", F.col("log_weight") + gumbel)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n_select)
    )
