"""Training-data curation: mixing, sampling, packing, split hygiene, pipelines.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text as tx
from ..operators.split import fingerprint_split, split_counts
from ..session import register_tables

from ._shared import (
    _TEXT_QUALITY_ORACLE,
)



# ---------------------------------------------------------------------------
# Split (D1) — oracle-expressible fingerprint variant
# ---------------------------------------------------------------------------

def _q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    orders = spark.table("orders")
    return split_counts(fingerprint_split(orders, "o_orderkey"))


_SPLIT_ORACLE = """
SELECT CASE WHEN ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 3 < 2
            THEN 'train' ELSE 'eval' END AS split,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY split
"""


def _q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Near-dup leakage through a plain hash split: portable-SimHash
    # pairs (the exact verifier of record) with each endpoint's split
    # re-derived as pure fingerprint arithmetic — no join attaches the
    # split, so the audit costs exactly the capped pair shuffle.
    from ..operators.split import neardup_leakage_report

    t = register_tables(spark, sf_dir)
    # 15-bit portable chunks fill linearly with corpus size: the sf0.1
    # sweep measured a >1000-doc chunk bucket (the dedup_simhash_portable
    # precedent), so the entry raises the cap and keeps fail-fast — the
    # uncapped brute-force oracle tolerates no silent drops.
    return neardup_leakage_report(
        t["documents"], max_bucket=4000, on_over_cap="error"
    )


def _split_leakage_oracle() -> str:
    # reuses the SAME portable-SimHash CTE generator as the batch pair
    # oracle and the streaming gate oracle (one derivation, three
    # replays), plus the hash_split fingerprint arithmetic verbatim.
    from .dedup import _simhash_sh_cte

    def s(col: str) -> str:
        return (
            f"CASE WHEN (({col} * 2654435761) % 2147483648 + 2147483648) "
            "% 2147483648 % 3 < 2 THEN 'train' ELSE 'eval' END"
        )

    return f"""
{_simhash_sh_cte()},
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
lab AS (
  SELECT da, db, {s('da')} AS sa, {s('db')} AS sb FROM pairs
)
SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT CASE
              WHEN sa = 'eval' AND sb <> 'eval' THEN da
              WHEN sb = 'eval' AND sa <> 'eval' THEN db
            END) AS BIGINT) AS leaked_eval_docs
FROM lab GROUP BY 1, 2
"""


def _q_three_way_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SplitConfig generalizes past the TFX train/eval default: an
    # 8/1/1 train/val/test assignment from the same portable fingerprint
    # arithmetic, plus a per-split min/max key digest so the oracle locks
    # membership (not just cardinality) without emitting every row.
    register_tables(spark, sf_dir)
    orders = spark.table("orders")
    three = fingerprint_split(
        orders, "o_orderkey", [("train", 8), ("val", 1), ("test", 1)]
    )
    return three.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum("o_orderkey").alias("key_sum"),
    )


_THREE_WAY_SPLIT_ORACLE = """
WITH b AS (
  SELECT o_orderkey,
         ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10
           AS bucket
  FROM orders
)
SELECT CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket < 9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM b GROUP BY 1
"""


def _q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flagship composite: quality gate -> exact dedup -> near-dup removal
    # as ONE composed Catalyst plan (operators/corpus.py). LSH generates
    # near-dup candidates; the oracle recomputes the identical survivor
    # set with exact SQL (LSH recall is ~1 at the fixture's similarity
    # levels, and verification thresholds exactly).
    from ..operators.corpus import prepare_corpus

    t = register_tables(spark, sf_dir)
    kept = prepare_corpus(
        t["documents"], min_quality=0.35, jaccard_threshold=0.5
    )
    return kept.select("doc_id", "quality_score")


def _corpus_prep_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
q AS (
  SELECT d.doc_id, d.text, tq.quality_score
  FROM documents d JOIN tq ON tq.doc_id = d.doc_id
  WHERE tq.quality_score >= 0.35
),
canon AS (SELECT min(doc_id) AS keep_id FROM q GROUP BY md5(text)),
kept AS (SELECT q.* FROM q WHERE q.doc_id IN (SELECT keep_id FROM canon)),
t2 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM kept),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t2, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
)
SELECT doc_id, quality_score FROM kept k
WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_b = k.doc_id)
"""


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-weighted resampling: keep-probability = the document's
    # quality score, decided by the portable key fingerprint (no RNG) so
    # the oracle replays the selection exactly.
    from ..operators.curation import weighted_sample

    t = register_tables(spark, sf_dir)
    scored = tx.quality_score(t["documents"])
    return weighted_sample(scored, "doc_id", "quality_score").select(
        "doc_id", "quality_score"
    )


def _weighted_sample_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE})
SELECT doc_id, quality_score FROM tq
WHERE ((doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10000
      < floor(greatest(least(quality_score, 1.0), 0.0) * 10000 + 0.5)
"""


def _q_training_dataset_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full corpus -> training-sequences composition in ONE Catalyst
    # plan: quality gate -> exact dedup -> LSH near-dup removal
    # (prepare_corpus) -> RAG chunking -> per-source sequence packing at
    # a 512-token budget. Every stage is an engine operator; the oracle
    # re-derives the whole pipeline in SQL from first principles.
    from ..operators.corpus import prepare_corpus
    from ..operators.curation import pack_sequences

    t = register_tables(spark, sf_dir)
    kept = prepare_corpus(
        t["documents"], min_quality=0.35, jaccard_threshold=0.5
    )
    chunks = tx.chunk_documents(
        kept, "doc_id", "text", chunk_tokens=64, stride=32
    ).join(kept.select("doc_id", "source"), "doc_id")
    # composite chunk key: document order, then chunk order within it
    chunks = chunks.withColumn(
        "cid", F.col("doc_id") * 100000 + F.col("chunk_idx")
    )
    packed = pack_sequences(
        chunks,
        group_col="source",
        id_col="cid",
        token_col="n_tokens",
        budget=512,
    )
    return packed.select(
        "doc_id",
        "chunk_idx",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "pack_id",
        "pack_offset",
    )


def _training_dataset_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
q AS (
  SELECT d.doc_id, d.source, d.text, tq.quality_score
  FROM documents d JOIN tq ON tq.doc_id = d.doc_id
  WHERE tq.quality_score >= 0.35
),
canon AS (SELECT min(doc_id) AS keep_id FROM q GROUP BY md5(text)),
kept0 AS (SELECT q.* FROM q WHERE q.doc_id IN (SELECT keep_id FROM canon)),
t2 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM kept0),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t2, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_a, doc_b
  FROM prs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
),
kept AS (
  SELECT * FROM kept0 k
  WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_b = k.doc_id)
),
tk AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM kept
),
c AS (
  SELECT doc_id, source, CAST(s // 32 AS INT) AS chunk_idx,
         toks[s + 1 : s + 64] AS w
  FROM tk, LATERAL (
    SELECT unnest(generate_series(0, greatest(len(toks) - 64 + 32 - 1, 0), 32)) AS s
  )
),
ch AS (
  SELECT doc_id, source, chunk_idx, CAST(len(w) AS BIGINT) AS n_tokens,
         doc_id * 100000 + chunk_idx AS cid
  FROM c WHERE len(w) > 0
),
p AS (
  SELECT doc_id, chunk_idx, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY cid
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start
  FROM ch
)
SELECT doc_id, chunk_idx, source, n_tokens,
       CAST(floor(start / 512) AS BIGINT) AS pack_id,
       CAST(start % 512 AS BIGINT) AS pack_offset
FROM p
"""


def _q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic negatives: 2 never-purchased parts per customer,
    # drawn from the customer's fingerprint bucket (equi-join, no cross
    # join) and ranked by a pairwise fingerprint — RNG-free, so the
    # oracle replays the identical sample.
    from ..operators.curation import negative_sample

    t = register_tables(spark, sf_dir)
    interactions = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
    )
    return negative_sample(
        t["customer"],
        t["part"],
        interactions,
        user_col="c_custkey",
        item_col="p_partkey",
        k=2,
        n_buckets=16,
    )


_NEGATIVE_SAMPLE_ORACLE = """
WITH u AS (
  SELECT c_custkey,
         ((c_custkey * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 16 AS b
  FROM customer
),
i AS (
  SELECT p_partkey,
         ((p_partkey * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 16 AS b
  FROM part
),
inter AS (
  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
negs AS (
  SELECT u.c_custkey, i.p_partkey
  FROM u JOIN i USING (b)
  WHERE NOT EXISTS (
    SELECT 1 FROM inter
    WHERE inter.c_custkey = u.c_custkey
      AND inter.p_partkey = i.p_partkey
  )
),
ranked AS (
  SELECT c_custkey, p_partkey,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY ((c_custkey * 31 + p_partkey) * 2654435761)
                      % 2147483648 % 1073741824,
                    p_partkey
         ) AS rank
  FROM negs
)
SELECT c_custkey, p_partkey, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 2
"""


def _q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-safe split: hash the GROUP key (user), not the row — every
    # event follows its user into one split, the hygiene rule that keeps
    # a user's history out of both train and eval. Output also counts
    # straddling users (provably zero when the split is a pure function
    # of the group key — the oracle recomputes it, not assumes it).
    from ..operators.split import fingerprint_split

    t = register_tables(spark, sf_dir)
    s = fingerprint_split(t["events"], "user_id")
    per = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    leak = (
        s.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaky_users"))
    )
    return per.crossJoin(F.broadcast(leak)).select(
        "split",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_leaky_users").cast("long").alias("n_leaky_users"),
    )


_GROUPED_SPLIT_ORACLE = """
WITH s AS (
  SELECT *, CASE WHEN ((user_id * 2654435761) % 2147483648 + 2147483648)
                      % 2147483648 % 3 < 2
                 THEN 'train' ELSE 'eval' END AS split
  FROM events
),
per AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM s GROUP BY split
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaky_users FROM (
    SELECT user_id FROM s GROUP BY user_id
    HAVING count(DISTINCT split) > 1
  )
)
SELECT split, n_events, n_users, n_leaky_users FROM per, leak
"""


# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
# each row draws priority -ln(u)/w from a DETERMINISTIC u (portable
# fingerprint mapped into (0,1)); the k smallest priorities are the
# weighted sample. Selection runs on the MICRO-FLOORED integer key with
# id tie-break, so both engines pick the identical set (no float
# boundary ambiguity). Weight = document length in chars.
_QWSAMPLE_WOR = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(floor(
           -ln((((doc_id * 2654435761) % 2147483648 + 2147483648)
                % 2147483648 % 10000 + 0.5) / 10000.0)
           / n_chars * 1000000000) AS BIGINT) AS prio_nano
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, prio_nano
FROM keyed
ORDER BY prio_nano, doc_id
LIMIT 100
"""


# K-fold cross-validation assignment: portable-fingerprint fold per
# USER (grouped, leakage-safe like grouped_split_no_leakage), with
# per-fold event counts and user digests — the eval-protocol primitive.
_QKFOLD = """
WITH f AS (
  SELECT user_id, event_id, value,
         ((user_id * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 5 AS fold
  FROM events
)
SELECT CAST(fold AS INT) AS fold,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(user_id) AS BIGINT) AS user_digest,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM f GROUP BY fold
"""


# Deterministic epoch shuffle for training: each epoch permutes the
# corpus by a salted portable fingerprint (pure function of (id, epoch)
# — reproducible across runs, partitionings, engines; change the epoch
# literal, get an independent permutation) and NTILE slices the
# permuted order into equal-size shards. Per-shard set digests pin the
# shard CONTENTS, min/max fingerprints pin the boundaries. Identical
# ANSI text on both engines.
_QEPOCH_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         ((doc_id * 2654435761 + 3 * 40503) % 2147483648 + 2147483648)
           % 2147483648 AS hkey
  FROM documents
),
sharded AS (
  SELECT doc_id, hkey, NTILE(8) OVER (ORDER BY hkey, doc_id) AS shard
  FROM h
)
SELECT CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS id_digest,
       CAST(min(hkey) AS BIGINT) AS min_h,
       CAST(max(hkey) AS BIGINT) AS max_h
FROM sharded GROUP BY shard
"""


def _q_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Length-bucketed batching stats (padding-waste reducer): exact
    # NTILE(8) over (token count, doc_id); per-bucket rectangular-batch
    # padding cost. At 100 TB boundaries come from the quantile sketch
    # twin; NTILE keeps the oracle exact.
    from ..operators.curation import length_bucketing

    t = register_tables(spark, sf_dir)
    return length_bucketing(t["documents"], "doc_id", "text", n_buckets=8)


_LENGTH_BUCKETING_ORACLE = """
WITH lens AS (
  SELECT doc_id AS id,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens,
         NTILE(8) OVER (ORDER BY n_tokens, id) AS bucket
  FROM lens
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_tokens) AS BIGINT) AS min_len,
       CAST(max(n_tokens) AS BIGINT) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS sum_len,
       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
         AS padding_waste
FROM b GROUP BY bucket
"""


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LLM data mixing: sample language g with probability ~ n_g^alpha
    # (alpha=0.5 upweights tail languages). Deterministic portable-hash
    # selection; the per-group cut lands on a 1/10000 grid in both
    # engines, so the float pow() only has to agree to ~1e-5 relative.
    from ..operators.curation import temperature_mix

    t = register_tables(spark, sf_dir)
    out = temperature_mix(
        t["documents"], "doc_id", "lang", alpha=0.5, target_rows=300
    )
    return out.select("doc_id", "lang")


_TEMPERATURE_MIX_ORACLE = """
WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT sum(pow(n, 0.5)) AS t FROM s),
r AS (
  SELECT lang,
         CAST(round(10000 * least(1.0, 300 * pow(n, 0.5) / t / n), 0)
              AS BIGINT) AS cut
  FROM s, tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE ((d.doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648
      % 10000 < r.cut
"""


def _q_training_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-5 capstone composition — the LLM-data pipeline built from
    # THIS round's operators, one Catalyst plan end-to-end:
    #   exact-substring REMOVAL (excise shared >=8-token runs, keep one
    #   occurrence corpus-wide) -> language temperature mixing over the
    #   cleaned corpus -> per-language packing budget (64-token bins).
    # The oracle replays every stage in SQL.
    from ..operators.curation import temperature_mix

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    cleaned = dd.remove_shared_runs(
        docs, "doc_id", "text", seed_n=5, min_run=8, on_over_cap="error"
    )
    enriched = cleaned.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = temperature_mix(
        enriched, "doc_id", "lang", alpha=0.5, target_rows=300
    )
    tok_cnt = F.size(
        F.filter(
            F.split(F.col("clean_text"), " "), lambda x: x != ""
        )
    ).cast("long")
    return mixed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok_cnt).alias("n_tokens"),
        F.sum(F.floor((tok_cnt + 63) / 64)).cast("long").alias("pack_bins"),
        F.sum("n_tokens_removed").alias("n_tokens_removed"),
    )


_TRAINING_PIPELINE_V2_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i)
  WHERE len(w) >= 5
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT doc_a, doc_b, diag, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                 ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc_b, count(*) + 4 AS run_tokens, min(pa) - diag AS b_start
  FROM r GROUP BY doc_a, doc_b, diag, grp
),
spans AS (
  SELECT doc_b AS doc_id, b_start AS s, b_start + run_tokens - 1 AS e
  FROM runs WHERE run_tokens >= 8
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tk
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
),
removed AS (
  SELECT DISTINCT tok.doc_id, tok.pos
  FROM tok JOIN spans ON tok.doc_id = spans.doc_id
  WHERE tok.pos BETWEEN spans.s AND spans.e
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tk
  FROM tok ANTI JOIN removed USING (doc_id, pos)
),
cleaned AS (
  SELECT t.doc_id,
         coalesce(c.clean_text, '') AS clean_text,
         coalesce(n.nrem, 0) AS n_removed
  FROM t
  LEFT JOIN (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos)
                    AS clean_text FROM kept GROUP BY doc_id) c
    USING (doc_id)
  LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS nrem
             FROM removed GROUP BY doc_id) n USING (doc_id)
),
fullc AS (
  SELECT cl.doc_id, cl.clean_text, cl.n_removed, d.lang
  FROM cleaned cl JOIN documents d USING (doc_id)
),
s AS (SELECT lang, count(*) AS n FROM fullc GROUP BY lang),
tt AS (SELECT sum(pow(n, 0.5)) AS tt FROM s),
rr AS (
  SELECT lang,
         CAST(round(10000 * least(1.0, 300 * pow(n, 0.5) / tt / n), 0)
              AS BIGINT) AS cut
  FROM s, tt
),
mixed AS (
  SELECT f.* FROM fullc f JOIN rr USING (lang)
  WHERE ((f.doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648
        % 10000 < rr.cut
),
counted AS (
  SELECT lang, n_removed,
         len(list_filter(string_split(clean_text, ' '), x -> x <> ''))
           AS ntok
  FROM mixed
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor((ntok + 63) / 64) AS BIGINT)) AS BIGINT)
         AS pack_bins,
       CAST(sum(n_removed) AS BIGINT) AS n_tokens_removed
FROM counted GROUP BY lang
"""


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eval-set decontamination: corpus docs sharing any 3-gram with the
    # pseudo-benchmark slice (every 20th doc) are dropped. n=3 because
    # fixture docs are short; production default is 8.
    from ..operators.curation import decontaminate

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, benchmark, n=3).select("doc_id", "source")


_DECONTAMINATE_ORACLE = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
cw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
csh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM cw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
bw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM bench),
bsh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
  FROM bw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
bad AS (SELECT DISTINCT doc_id FROM csh WHERE s IN (SELECT s FROM bsh))
SELECT doc_id, source FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
"""


def _q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Graded per-example decontamination: same corpus/benchmark split
    # and n=3 shingling as the binary `decontaminate` entry, but each
    # surviving (doc, benchmark example) pair carries the fraction of
    # the example's distinct 3-grams the doc covers — the data-card
    # attribution report, not just the purged corpus. min_frac=0.05
    # keeps the report to meaningfully-overlapping pairs at every SF.
    from ..operators.curation import contamination_report

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    return contamination_report(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=3,
        min_frac=0.05,
    )


_CONTAMINATION_REPORT_ORACLE = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
cw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
csh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM cw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
bw AS (SELECT doc_id AS bench_id, string_split(lower(text), ' ') AS w FROM bench),
bsh AS (
  SELECT DISTINCT bench_id, array_to_string(w[i:i+2], ' ') AS s
  FROM bw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
tot AS (SELECT bench_id, COUNT(*) AS bench_ngrams FROM bsh GROUP BY bench_id),
ov AS (
  SELECT c.doc_id, b.bench_id, COUNT(*) AS overlap_ngrams
  FROM csh c JOIN bsh b ON b.s = c.s
  GROUP BY c.doc_id, b.bench_id
)
SELECT o.doc_id, o.bench_id,
       CAST(o.overlap_ngrams AS BIGINT) AS overlap_ngrams,
       CAST(t.bench_ngrams AS BIGINT) AS bench_ngrams,
       round(o.overlap_ngrams / CAST(t.bench_ngrams AS DOUBLE), 6) AS frac
FROM ov o JOIN tot t USING (bench_id)
WHERE round(o.overlap_ngrams / CAST(t.bench_ngrams AS DOUBLE), 6) >= 0.05
"""


def _q_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Greedy facility-location subset selection: the 4 documents whose
    # distinct 3-gram shingles greedily maximize corpus coverage —
    # selection order, marginal gain, and the running covered total.
    # Deterministic (smallest doc_id on gain ties), so the 4 greedy
    # rounds unroll exactly in the oracle.
    from ..operators.curation import greedy_max_coverage

    t = register_tables(spark, sf_dir)
    return greedy_max_coverage(t["documents"], k=4, n=3, hashed=False)


def _maxcov_round_sql(prev_cov: str, rank: int) -> str:
    # one greedy round: gains over not-yet-covered shingles, argmax
    # with smallest-id tie-break, covered set extended by the pick
    cov_pred = (
        f"WHERE d.s NOT IN (SELECT s FROM {prev_cov})" if prev_cov else ""
    )
    prev_union = (
        f"SELECT s FROM {prev_cov} UNION " if prev_cov else ""
    )
    return f"""
g{rank} AS (
  SELECT d.doc_id, COUNT(*) AS gain FROM dsh d {cov_pred} GROUP BY 1
),
sel{rank} AS (
  SELECT {rank} AS rank, doc_id, gain FROM g{rank}
  ORDER BY gain DESC, doc_id LIMIT 1
),
cov{rank} AS (
  {prev_union}SELECT s FROM dsh WHERE doc_id = (SELECT doc_id FROM sel{rank})
)"""


_MAX_COVERAGE_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
dsh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),{_maxcov_round_sql('', 1)},{_maxcov_round_sql('cov1', 2)},{
    _maxcov_round_sql('cov2', 3)},{_maxcov_round_sql('cov3', 4)},
sel AS (
  SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
  UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
)
SELECT CAST(rank AS INT) AS rank, doc_id, CAST(gain AS BIGINT) AS gain,
       CAST(SUM(gain) OVER (ORDER BY rank) AS BIGINT) AS covered_total
FROM sel WHERE gain > 0
"""


def _q_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic epoch-order mixing: four sources at 4:2:1:1
    # relative rates via stride scheduling — consuming rows by `pos`
    # yields every prefix at those proportions (±1 per source) without
    # shuffling the corpus. Per-source ranks come from the
    # grouped-row-id machinery (no single-partition Window anywhere).
    from ..operators.curation import interleave_by_rate

    t = register_tables(spark, sf_dir)
    out = interleave_by_rate(
        t["documents"],
        "source",
        {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0},
    )
    # the operator emits pos unrounded (it's the sort key — a fixed
    # grid would tie large ranks); round HERE, in the display/oracle
    # layer only, for the engine-portable value compare
    return out.withColumn("pos", F.round("pos", 6))


_CURRICULUM_INTERLEAVE_ORACLE = """
WITH rates(source, w) AS (
  VALUES ('src0', 4.0), ('src1', 2.0), ('src2', 1.0), ('src3', 1.0)
),
ranked AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS k
  FROM documents d JOIN rates r USING (source)
  WHERE d.doc_id IS NOT NULL
)
SELECT doc_id, source, CAST(k AS BIGINT) AS k,
       round((k - 0.5) / r.w, 6) AS pos
FROM ranked JOIN rates r USING (source)
"""


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic domain-mix downsampling: per-status fractions via the
    # portable fingerprint hash (no RNG — identical row set on any
    # engine/cluster).
    from ..operators.curation import stratified_sample

    t = register_tables(spark, sf_dir)
    out = stratified_sample(
        t["orders"],
        "o_orderkey",
        "o_orderstatus",
        {"F": 0.2, "O": 0.1, "P": 0.5},
    )
    return out.select("o_orderkey", "o_orderstatus")


_STRATIFIED_SAMPLE_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10000
      < CASE o_orderstatus WHEN 'F' THEN 2000 WHEN 'O' THEN 1000
                           WHEN 'P' THEN 5000 ELSE 0 END
"""


def _q_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-source document cap: keep the 5 longest docs per source
    # (ties by doc_id) — the data-mixing quota operator.
    from ..operators.curation import group_quota

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn("n_chars", F.length("text"))
    out = group_quota(
        docs, "source", "n_chars", 5, id_col="doc_id", descending=True
    )
    return out.select(
        "source", "doc_id", "n_chars", F.col("quota_rank").cast("long").alias("quota_rank")
    )


_GROUP_QUOTA_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, length(text) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY length(text) DESC, doc_id) AS quota_rank
  FROM documents
)
SELECT source, doc_id, n_chars, quota_rank FROM ranked WHERE quota_rank <= 5
"""


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Concat-and-chunk packing: per source, docs in id order are cut into
    # 512-token packs; each doc annotated with (pack_id, pack_offset).
    from ..operators.curation import pack_sequences

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    out = pack_sequences(
        docs, group_col="source", id_col="doc_id", token_col="n_tokens",
        budget=512,
    )
    return out.select("source", "doc_id", "n_tokens", "pack_id", "pack_offset")


_SEQUENCE_PACKING_ORACLE = """
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start
  FROM t
)
SELECT source, doc_id, n_tokens,
       CAST(floor(start / 512) AS BIGINT) AS pack_id,
       CAST(start % 512 AS BIGINT) AS pack_offset
FROM c
"""


def _q_epoch_shuffle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic epoch shuffle: Knuth-hash the ids, exact NTILE into
    # 8 shards over the hash order — spelled scale-safe (VERDICT r14
    # item 3): the (hkey, doc_id) total order is encoded into ONE
    # numeric key, (hkey << 32) | doc_id (order-preserving since
    # hkey < 2^31 and doc_id < 2^32 — guarded LOUD in-plan), and
    # rowid.exact_ntile assigns the identical shard ids with no
    # single-partition Window anywhere.
    from ..operators.rowid import exact_ntile

    t = register_tables(spark, sf_dir)
    guarded_id = F.when(
        (F.col("doc_id") >= 0) & (F.col("doc_id") < F.lit(1 << 32)),
        F.col("doc_id"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "epoch_shuffle_shards: doc_id %s outside [0, 2^32) — the"
                " composite (hkey << 32) | doc_id order key needs a"
                " 32-bit id; re-key or widen the encoding",
                F.col("doc_id").cast("string"),
            )
        ).cast("long")
    )
    h = t["documents"].select(
        "doc_id",
        (
            (
                (F.col("doc_id") * F.lit(2654435761) + F.lit(3 * 40503))
                % F.lit(2147483648)
                + F.lit(2147483648)
            )
            % F.lit(2147483648)
        ).alias("hkey"),
        (
            F.shiftleft(
                (
                    (
                        (F.col("doc_id") * F.lit(2654435761) + F.lit(3 * 40503))
                        % F.lit(2147483648)
                        + F.lit(2147483648)
                    )
                    % F.lit(2147483648)
                ),
                32,
            )
            + guarded_id
        ).alias("__okey"),
    )
    sharded = exact_ntile(h, "__okey", 8, tile_col="shard").drop("__okey")
    return sharded.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_digest"),
        F.min("hkey").cast("bigint").alias("min_h"),
        F.max("hkey").cast("bigint").alias("max_h"),
    )


def _q_kfold_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    f = t["events"].select(
        "user_id",
        "value",
        (
            (
                (F.col("user_id") * F.lit(2654435761)) % F.lit(2147483648)
                + F.lit(2147483648)
            )
            % F.lit(2147483648)
            % F.lit(5)
        ).alias("fold"),
    )
    return f.groupBy(F.col("fold").cast("int").alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("user_id").cast("bigint").alias("user_digest"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )


def _q_wsample_wor_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis weighted sampling without replacement:
    # priority = -ln(u)/weight with a deterministic hash-derived u,
    # global top-100 by priority (TakeOrdered — no full sort).
    t = register_tables(spark, sf_dir)
    u = (
        (
            (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
            + F.lit(2147483648)
        )
        % F.lit(2147483648)
        % F.lit(10000)
        + F.lit(0.5)
    ) / F.lit(10000.0)
    keyed = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.floor(
                -F.log(u) / F.col("n_chars") * F.lit(1000000000)
            )
            .cast("bigint")
            .alias("prio_nano"),
        )
    )
    return keyed.orderBy("prio_nano", "doc_id").limit(100)


def _q_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dense 0..N-1 ids in doc_id order WITHOUT the single-partition
    # global Window the naive ROW_NUMBER() OVER (ORDER BY ...) plans —
    # see operators/rowid.py for the bucket-decomposition scheme. The
    # oracle IS the naive global spelling: the contract is that the
    # distributed decomposition reproduces it bit-for-bit.
    from ..operators.rowid import assign_global_row_ids

    t = register_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "n_chars")
    return assign_global_row_ids(docs, "doc_id", num_buckets=8).select(
        "doc_id", "n_chars", "row_id"
    )


_GLOBAL_ROW_IDS_ORACLE = """
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id
FROM documents
"""


def _q_global_exact_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact SQL NTILE semantics with no single-partition Window: the
    # bucket-decomposed global rank + the standard NTILE arithmetic
    # (first N % n tiles take one extra row), from rowid.exact_ntile —
    # the primitive the r15 conversions (length_bucketing,
    # epoch_shuffle_shards, revenue_concentration) stand on. 7 tiles
    # over the documents keyspace exercises the uneven q+1/q split.
    # The oracle IS the naive global-Window spelling: bit-for-bit
    # equivalence is the contract.
    from ..operators.rowid import exact_ntile

    t = register_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id")
    return exact_ntile(docs, "doc_id", 7, num_buckets=8).select(
        "doc_id", F.col("ntile").cast("int").alias("tile")
    )


_GLOBAL_EXACT_NTILE_ORACLE = """
SELECT doc_id,
       CAST(NTILE(7) OVER (ORDER BY doc_id) AS INT) AS tile
FROM documents
"""


def _q_global_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT type-1 quantiles (min { v : F(v) >= q }) with no global
    # sort: the bucket-decomposed rank makes value-at-rank addressable,
    # so the plan filters the ranked frame to five rows — the exact
    # complement of the epsilon-bound sketch_quantiles path. n_chars
    # carries duplicates, exercising the tie-determinism argument
    # (tied keys share one bucket and one value).
    from ..operators.rowid import exact_quantiles

    t = register_tables(spark, sf_dir)
    return exact_quantiles(
        t["documents"], "n_chars", (0.1, 0.25, 0.5, 0.75, 0.9),
        num_buckets=8,
    )


_GLOBAL_EXACT_QUANTILES_ORACLE = """
WITH v AS (SELECT n_chars AS val FROM documents WHERE n_chars IS NOT NULL),
n AS (SELECT count(*) AS n FROM v),
r AS (SELECT val, ROW_NUMBER() OVER (ORDER BY val) AS rn FROM v),
qs(q) AS (VALUES (0.1), (0.25), (0.5), (0.75), (0.9))
SELECT CAST(qs.q AS DOUBLE) AS q, r.val AS value
FROM qs JOIN n ON true
JOIN r ON r.rn = CAST(ceil(qs.q * n.n) AS BIGINT)
"""


def _q_grouped_exact_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-SOURCE equal-population quartiles with no per-group
    # single-partition Window — the grouped edition of exact_ntile,
    # for when one source holds an arbitrary share of the corpus.
    # Row-level output: the oracle is the naive partitioned NTILE;
    # bit-for-bit equivalence is the contract (doc_id is unique, so
    # the per-group order is total).
    from ..operators.rowid import grouped_exact_ntile

    t = register_tables(spark, sf_dir)
    out = grouped_exact_ntile(
        t["documents"].select("doc_id", "source"),
        ["source"],
        "doc_id",
        4,
        num_buckets=8,
    )
    return out.select("doc_id", "source", F.col("ntile").alias("tile"))


_GROUPED_EXACT_NTILE_ORACLE = """
SELECT doc_id, source,
       CAST(NTILE(4) OVER (PARTITION BY source ORDER BY doc_id) AS INT)
         AS tile
FROM documents
"""


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact greedy budget selection (best docs by distinct-word ratio
    # until the 15k-token budget fills) decomposed over frozen score
    # buckets — the single-partition global-Window spelling the oracle
    # uses is exactly what the operator exists to avoid; equivalence is
    # the contract. Ties (duplicate docs share scores) break by doc_id
    # in both engines.
    from ..operators.curation import token_budget_select

    t = register_tables(spark, sf_dir)
    docs = t["documents"].selectExpr(
        "doc_id",
        "size(array_distinct(split(text, ' '))) / size(split(text, ' ')) AS score",
        "CAST(size(split(text, ' ')) AS BIGINT) AS toks",
    )
    return token_budget_select(
        docs, "score", "toks", 15000, id_col="doc_id", num_buckets=16
    )


_TOKEN_BUDGET_ORACLE = """
SELECT doc_id, score, toks FROM (
  SELECT doc_id, score, toks,
         SUM(toks) OVER (ORDER BY score DESC, doc_id ASC
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM (SELECT doc_id,
               len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')) AS score,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents))
WHERE cum <= 15000
"""


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR importance resampling (Xie et al. 2023): target = the
    # English documents, raw = the whole pool; hashed 1/2-gram models
    # (portable md5 buckets), add-1 smoothing, deterministic Gumbel
    # top-200 WOR. The oracle replays the ENTIRE pipeline in SQL —
    # tokenization, bigrams, bucket hash, both corpus models, the
    # log-ratio scoring join, the fingerprint-derived Gumbel noise and
    # the final top-k — so a drift anywhere (a hash mismatch, a
    # smoothing slip, a noise-formula change, a tie-order bug) reddens.
    from ..operators.dsir import dsir_select

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    out = dsir_select(
        docs,
        docs.where(F.col("lang") == "en"),
        "doc_id",
        "text",
        n_select=200,
        buckets=8192,
        smoothing=1.0,
        noise_denom=1 << 20,
    )
    return out.select(
        "doc_id",
        F.round("log_weight", 6).alias("log_weight"),
        F.round("sample_key", 6).alias("sample_key"),
    )


_DSIR_SELECT_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), t -> t != '') AS ts
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, lang, g FROM (
    SELECT doc_id, lang, unnest(ts) AS g FROM toks
    UNION ALL
    SELECT t.doc_id, t.lang, t.ts[i] || ' ' || t.ts[i + 1] AS g
    FROM toks t,
         LATERAL (SELECT unnest(generate_series(1, len(t.ts) - 1)) AS i) x
    WHERE len(t.ts) >= 2
  )
),
feats AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 8192 AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
tcnt AS (SELECT bucket, sum(cnt) AS ct FROM feats WHERE lang = 'en' GROUP BY 1),
rcnt AS (SELECT bucket, sum(cnt) AS cr FROM feats GROUP BY 1),
tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tcnt) AS t_n,
               (SELECT coalesce(sum(cr), 0) FROM rcnt) AS r_n),
dom AS (SELECT unnest(range(0, 8192)) AS bucket),
lr AS (
  SELECT d.bucket,
         ln((coalesce(t.ct, 0) + 1.0) / (tot.t_n + 8192.0))
           - ln((coalesce(r.cr, 0) + 1.0) / (tot.r_n + 8192.0)) AS log_ratio
  FROM dom d CROSS JOIN tot
  LEFT JOIN tcnt t ON t.bucket = d.bucket
  LEFT JOIN rcnt r ON r.bucket = d.bucket
),
scored AS (
  SELECT f.doc_id, sum(f.cnt * lr.log_ratio) AS lw
  FROM feats f JOIN lr ON lr.bucket = f.bucket
  GROUP BY 1
),
keyed AS (
  SELECT d.doc_id, coalesce(s.lw, 0.0) AS lw,
         coalesce(s.lw, 0.0) - ln(-ln(
           (((d.doc_id * 2654435761) % 2147483648 + 2147483648)
              % 2147483648 % 1048576 + 0.5) / 1048576.0)) AS key
  FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
)
SELECT doc_id, round(lw, 6) AS log_weight, round(key, 6) AS sample_key
FROM keyed ORDER BY key DESC, doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# Privacy / governance: k-anonymity audit + DP noisy counts
# ---------------------------------------------------------------------------

def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quasi-identifiers (nation, market segment) with account-balance
    # buckets as the sensitive attribute: per-equivalence-class size,
    # l-diversity, and both pass/fail verdicts — the audit a governance
    # gate runs before releasing a table keyed on demographics. One
    # map-side-combinable aggregate (see operators/privacy.py).
    from ..operators import privacy as pv

    t = register_tables(spark, sf_dir)
    cust = t["customer"].withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 2000).cast("long")
    )
    return pv.k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=10,
        sensitive_col="bal_bucket", l=3,
    )


_K_ANONYMITY_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
            AS BIGINT) AS l_diversity,
       count(*) >= 10 AS is_k_anonymous,
       count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) >= 3
           AS is_l_diverse
FROM customer GROUP BY 1, 2
"""


def _q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Laplace-mechanism release of daily event counts (epsilon = 0.5,
    # sensitivity 1): the noise is a DETERMINISTIC function of
    # (group key, salt) — an inverse-CDF draw from a md5-derived
    # uniform — so the exact release replays in the oracle. The raw
    # count never appears in the output.
    from ..operators import privacy as pv

    t = register_tables(spark, sf_dir)
    ev = t["events"].withColumn("day", F.col("ts").cast("date"))
    return pv.dp_noisy_counts(
        ev, ["event_type", "day"], epsilon=0.5, salt="release-r11"
    )


# Full replay: the same md5 -> uniform -> inverse-CDF Laplace draw,
# scale = 1/epsilon = 2.0, unit-separated group key. concat_ws skips
# NULLs identically in both engines.
_DP_NOISY_COUNTS_ORACLE = """
WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
k AS (
  SELECT event_type, day, n,
         (CAST(('0x' || substr(md5(concat_ws(chr(31), event_type,
                   CAST(day AS VARCHAR), 'release-r11')), 1, 13))
               AS BIGINT) + 0.5) / 4503599627370496.0 AS u
  FROM g
)
SELECT event_type, day,
       round(n + (-2.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4)
           AS noisy_count
FROM k
"""


def _q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-free out-of-fold target encoding (Micci-Barreca 2001):
    # encode nation by account balance with the row's own fold excluded
    # from numerator, denominator AND prior. Balances fold to integer
    # cents first so every sum is exact long arithmetic — the final
    # encoding is then a fixed expression over exact integers, stable
    # across engines (the repo's cents pattern; double sums would be
    # order-sensitive at the 4th decimal).
    from ..operators.curation import target_encode_loo

    t = register_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5)
        .cast("long")
        .alias("bal_cents"),
    )
    return target_encode_loo(
        cust, "c_nationkey", "bal_cents", "c_custkey",
        folds=5, smoothing=20.0,
    )


_TARGET_ENCODE_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         CAST(((c_custkey * 2654435761) % 2147483648 + 2147483648)
              % 2147483648 % 5 AS INT) AS fold
  FROM customer
),
cf AS (
  SELECT c_nationkey AS cat, fold,
         sum(bal_cents) AS s, count(bal_cents) AS n
  FROM base GROUP BY 1, 2
),
ct AS (SELECT cat, sum(s) AS ts, sum(n) AS tn FROM cf GROUP BY 1),
ft AS (
  SELECT fold, sum(bal_cents) AS fs, count(bal_cents) AS fn
  FROM base GROUP BY 1
),
g AS (SELECT sum(fs) AS gs, sum(fn) AS gn FROM ft),
pr AS (SELECT fold, (gs - fs) * 1.0 / (gn - fn) AS prior FROM ft, g)
SELECT b.c_custkey, b.c_nationkey, b.bal_cents, b.fold,
       round(((ct.ts - cf.s) + 20.0 * pr.prior)
             / ((ct.tn - cf.n) + 20.0), 4) AS te
FROM base b
JOIN cf ON cf.cat = b.c_nationkey AND cf.fold = b.fold
JOIN ct ON ct.cat = b.c_nationkey
JOIN pr ON pr.fold = b.fold
"""


def _q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenization-style pseudonymization with referential integrity:
    # customer and orders re-keyed by the SAME keyed surrogate
    # (md5(salt || key) folded to 60 bits), then an FK audit over the
    # RELEASED tables — per-nation order counts, distinct pseudonymized
    # customers, and order cents, which must equal the raw-key join's
    # numbers (the oracle computes them from the original keys with the
    # surrogate formula replayed for the distinct-count check).
    # pk_checksum pins the surrogate VALUES, not just their join
    # behavior: counts/cents are salt-invariant for any consistent
    # injective surrogate, so a release that silently dropped or
    # swapped the salt would otherwise stay green — the checksum is
    # the salt-sensitivity contract (mutation-tested).
    from ..operators import privacy as pv

    t = register_tables(spark, sf_dir)
    released = pv.pseudonymize_tables(
        {
            "customer": (
                t["customer"].select("c_custkey", "c_nationkey"),
                "c_custkey",
            ),
            "orders": (
                t["orders"].select(
                    "o_custkey",
                    F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")
                    .alias("cents"),
                ),
                "o_custkey",
            ),
        },
        salt="release-r11",
    )
    cust, orders = released["customer"], released["orders"]
    return (
        orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"], "inner"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
            F.sum(F.col("c_custkey") % F.lit(997))
            .cast("long")
            .alias("pk_checksum"),
        )
    )


_PSEUDONYMIZE_ORACLE = """
WITH c AS (
  SELECT CAST(('0x' || substr(md5('release-r11' || CAST(c_custkey AS VARCHAR)),
              1, 15)) AS BIGINT) % 1152921504606846976 AS pk,
         c_nationkey
  FROM customer
),
o AS (
  SELECT CAST(('0x' || substr(md5('release-r11' || CAST(o_custkey AS VARCHAR)),
              1, 15)) AS BIGINT) % 1152921504606846976 AS pk,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT c.pk) AS BIGINT) AS n_customers,
       CAST(sum(o.cents) AS BIGINT) AS cents,
       CAST(sum(c.pk % 997) AS BIGINT) AS pk_checksum
FROM o JOIN c ON o.pk = c.pk
GROUP BY 1
"""


def _q_linreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed batch-GD linear fit of chars-per-document against
    # token count (+ intercept): three rounds, each ONE map-side-
    # combinable d-column aggregate with the weights re-entering as
    # literals — the iterative-optimizer shape a learned quality
    # scorer trains with at corpus scale. Exact-integer portability:
    # integer features/target, weights as integer numerators over 1e9,
    # and the update's double sequence (int->double, /n, *lr,
    # subtract, floor-half-up) mirrored verbatim by the oracle's
    # unrolled CTE rounds — the integer weights match bit-for-bit,
    # so the contract is equality, not tolerance.
    from ..operators.linmodel import linreg_train_gd

    t = register_tables(spark, sf_dir)
    feats = t["documents"].select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ntok"),
        F.col("n_chars").alias("y"),
    )
    return linreg_train_gd(
        feats, ["ntok"], "y", rounds=3, lr=5e-4, scale=10**9
    )


_LINREG_TRAIN_ORACLE = """
WITH src AS (
  SELECT CAST(1 AS BIGINT) AS x0,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
         CAST(n_chars AS BIGINT) AS y
  FROM documents
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM src),
g1 AS (
  SELECT SUM(x0 * (0 - y * 1000000000)) AS g0,
         SUM(x1 * (0 - y * 1000000000)) AS g1
  FROM src
),
w1 AS (
  SELECT CAST(floor(0.0 - 5e-4 * (CAST(g0 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w0,
         CAST(floor(0.0 - 5e-4 * (CAST(g1 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w1
  FROM g1, nn
),
g2 AS (
  SELECT SUM(x0 * (w1.w0 * x0 + w1.w1 * x1 - y * 1000000000)) AS g0,
         SUM(x1 * (w1.w0 * x0 + w1.w1 * x1 - y * 1000000000)) AS g1
  FROM src, w1
),
w2 AS (
  SELECT CAST(floor(CAST(w1.w0 AS DOUBLE) - 5e-4 * (CAST(g2.g0 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w0,
         CAST(floor(CAST(w1.w1 AS DOUBLE) - 5e-4 * (CAST(g2.g1 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w1
  FROM g2, w1, nn
),
g3 AS (
  SELECT SUM(x0 * (w2.w0 * x0 + w2.w1 * x1 - y * 1000000000)) AS g0,
         SUM(x1 * (w2.w0 * x0 + w2.w1 * x1 - y * 1000000000)) AS g1
  FROM src, w2
),
w3 AS (
  SELECT CAST(floor(CAST(w2.w0 AS DOUBLE) - 5e-4 * (CAST(g3.g0 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w0,
         CAST(floor(CAST(w2.w1 AS DOUBLE) - 5e-4 * (CAST(g3.g1 AS DOUBLE) / n) + 0.5) AS BIGINT) AS w1
  FROM g3, w2, nn
),
fin AS (
  SELECT SUM(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)) AS ss,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT w3.w0 * x0 + w3.w1 * x1 - y * 1000000000 AS r
        FROM src, w3)
)
SELECT w3.w0 AS wnum_intercept,
       CAST(w3.w0 AS DOUBLE) / 1e9 AS w_intercept,
       w3.w1 AS wnum_ntok,
       CAST(w3.w1 AS DOUBLE) / 1e9 AS w_ntok,
       CAST(fin.ss AS DOUBLE) / (CAST(fin.cnt AS DOUBLE) * 1e18) AS mse,
       fin.cnt AS n_rows
FROM w3, fin
"""


def _q_grouped_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-SOURCE running character budget in doc-id order with NO
    # per-group single-partition Window: grouped_prefix_sum (frozen
    # global boundaries + per-(group,bucket) literal offsets + a
    # bucket-local cumulative Window) — the running-quota spelling
    # that survives one source holding 90% of the corpus. Oracle IS
    # the naive partitioned SUM OVER the operator refuses to plan.
    from ..operators.rowid import grouped_prefix_sum

    t = register_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "source", "n_chars")
    return grouped_prefix_sum(
        d, ["source"], "doc_id", "n_chars",
        out_col="cum_chars", num_buckets=8,
    )


_GROUPED_RUNNING_TOTAL_ORACLE = """
SELECT doc_id, source, n_chars,
       CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_chars
FROM documents
"""


def _q_grouped_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-LANGUAGE exact length quartiles + median with no per-group
    # sort: grouped rank machinery + in-plan value-at-rank (the
    # quantile targets ride the plan as one literal array filtered per
    # row, so driver state never grows with the group count). Both
    # engines evaluate ceil on the SAME double product (oracle casts q
    # to DOUBLE), so exact-integer rank boundaries cannot split.
    from ..operators.rowid import grouped_exact_quantiles

    t = register_tables(spark, sf_dir)
    return grouped_exact_quantiles(
        t["documents"].select("lang", "n_chars"),
        ["lang"],
        "n_chars",
        (0.25, 0.5, 0.75),
        num_buckets=8,
    )


_GROUPED_EXACT_QUANTILES_ORACLE = """
WITH v AS (
  SELECT lang, n_chars AS val FROM documents WHERE n_chars IS NOT NULL
),
n AS (SELECT lang, count(*) AS n FROM v GROUP BY 1),
r AS (
  SELECT lang, val,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY val) AS rn
  FROM v
),
qs(q) AS (VALUES (0.25), (0.5), (0.75))
SELECT r.lang, CAST(qs.q AS DOUBLE) AS q, r.val AS value
FROM qs
JOIN n ON true
JOIN r ON r.lang = n.lang
      AND r.rn = CAST(ceil(CAST(qs.q AS DOUBLE) * n.n) AS BIGINT)
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "linreg_train_gd": (_q_linreg_train, _LINREG_TRAIN_ORACLE),
    "grouped_exact_quantiles": (
        _q_grouped_exact_quantiles,
        _GROUPED_EXACT_QUANTILES_ORACLE,
    ),
    "grouped_running_total": (
        _q_grouped_running_total,
        _GROUPED_RUNNING_TOTAL_ORACLE,
    ),
    "dsir_select": (_q_dsir_select, _DSIR_SELECT_ORACLE),
    "pseudonymize_fk_audit": (_q_pseudonymize, _PSEUDONYMIZE_ORACLE),
    "k_anonymity_audit": (_q_k_anonymity, _K_ANONYMITY_ORACLE),
    "dp_noisy_counts": (_q_dp_noisy_counts, _DP_NOISY_COUNTS_ORACLE),
    "target_encode_loo": (_q_target_encode, _TARGET_ENCODE_ORACLE),
    "global_row_ids": (_q_global_row_ids, _GLOBAL_ROW_IDS_ORACLE),
    "global_exact_ntile": (_q_global_exact_ntile, _GLOBAL_EXACT_NTILE_ORACLE),
    "global_exact_quantiles": (
        _q_global_exact_quantiles,
        _GLOBAL_EXACT_QUANTILES_ORACLE,
    ),
    "grouped_exact_ntile": (_q_grouped_exact_ntile, _GROUPED_EXACT_NTILE_ORACLE),
    "decontaminate": (_q_decontaminate, _DECONTAMINATE_ORACLE),
    "contamination_report": (_q_contamination_report, _CONTAMINATION_REPORT_ORACLE),
    "subset_max_coverage": (_q_max_coverage, _MAX_COVERAGE_ORACLE),
    "curriculum_interleave": (_q_curriculum_interleave, _CURRICULUM_INTERLEAVE_ORACLE),
    "stratified_sample": (_q_stratified_sample, _STRATIFIED_SAMPLE_ORACLE),
    "group_quota": (_q_group_quota, _GROUP_QUOTA_ORACLE),
    "sequence_packing": (_q_sequence_packing, _SEQUENCE_PACKING_ORACLE),
    "negative_sample": (_q_negative_sample, _NEGATIVE_SAMPLE_ORACLE),
    "temperature_mix": (_q_temperature_mix, _TEMPERATURE_MIX_ORACLE),
    "training_pipeline_v2": (
        _q_training_pipeline_v2,
        _TRAINING_PIPELINE_V2_ORACLE,
    ),
    "length_bucketing": (_q_length_bucketing, _LENGTH_BUCKETING_ORACLE),
    "grouped_split_no_leakage": (_q_grouped_split, _GROUPED_SPLIT_ORACLE),
    "epoch_shuffle_shards": (_q_epoch_shuffle_df, _QEPOCH_SHUFFLE),
    "kfold_assignment": (_q_kfold_df, _QKFOLD),
    "weighted_sample_wor": (_q_wsample_wor_df, _QWSAMPLE_WOR),
    "three_way_split_counts": (_q_three_way_split, _THREE_WAY_SPLIT_ORACLE),
    "hash_split_counts": (_q_split_counts, _SPLIT_ORACLE),
    "split_leakage_audit": (_q_split_leakage_audit, _split_leakage_oracle()),
    "corpus_prep_pipeline": (_q_corpus_prep, _corpus_prep_oracle()),
    "training_dataset_pipeline": (
        _q_training_dataset_pipeline,
        _training_dataset_oracle(),
    ),
    "weighted_sample": (_q_weighted_sample, _weighted_sample_oracle()),
    "token_budget_select": (_q_token_budget, _TOKEN_BUDGET_ORACLE),
}
