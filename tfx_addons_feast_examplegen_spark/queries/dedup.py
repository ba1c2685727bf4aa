"""Deduplication family: exact, n-gram Jaccard, MinHash/LSH, SimHash, substring.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..session import register_tables




# ---------------------------------------------------------------------------
# North-star extensions: dedup / similarity / text analysis (BASELINE.md)
# ---------------------------------------------------------------------------

def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return dd.exact_dedup(t["documents"], ["text"], "doc_id")


_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM documents GROUP BY md5(text)
"""


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    # on_over_cap="error": this entry is gated by the UNCAPPED exact
    # _JACCARD_ORACLE, so a dropped over-cap bucket would silently
    # diverge — fail loudly instead (ADVICE: no silent caps on
    # oracle-checked paths).
    return dd.jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.5,
        on_over_cap="error",
    )


# Exact 3-gram Jaccard, independently derived in DuckDB (list slices +
# lateral unnest instead of Spark's transform/sequence/explode).
_JACCARD_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (sa.nsh + sb.nsh - common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
"""


def _q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PPJoin-style prefix filtering: rare-first global order, only the
    # (1-t)-fraction prefix of each shingle set is indexed (lemma in the
    # operator docstring — no false negatives), exact verify over full
    # sets. Output bit-identical to jaccard_pairs: same uncapped oracle.
    t = register_tables(spark, sf_dir)
    return dd.jaccard_pairs_prefix(
        t["documents"], "doc_id", "text", n=3, threshold=0.5,
        on_over_cap="error",
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LSH-banded candidates + exact-Jaccard verification. At the fixture's
    # similarity levels (planted near-dups at j>=0.9) LSH recall is
    # 1-(1-j^4)^16 ~= 1-4e-8, so the verified output equals the exact
    # jaccard_pairs result and shares its oracle.
    t = register_tables(spark, sf_dir)
    return dd.minhash_lsh_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.5, verify=True,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The production (xxhash64) SimHash as an oracle-checkable CONTRACT
    # (same pattern as the sketch error bounds / ANN recall contracts):
    # the bit votes themselves aren't portable SQL, but their semantic
    # guarantees are. The pipeline runs in full (max_hamming=3, within
    # the 4x16-bit pigeonhole completeness bound, fail-fast cap) and the
    # output rows assert, per check, values DuckDB reproduces exactly:
    #
    # - exact_dup_pairs_total: pairs of docs with IDENTICAL distinct
    #   token sets — a real, fixture-sized number (hundreds at sf0.01)
    #   the oracle computes independently.
    # - exact_dup_pairs_missed_by_prod: identical token sets hash to
    #   identical simhashes under ANY hash family -> hamming 0 -> all 4
    #   chunks collide -> the pigeonhole join MUST emit the pair. A
    #   missed pair means broken vote/fold/band arithmetic; oracle
    #   asserts literal 0.
    # - prod_pairs_ge_exact: the hamming<=3 candidate set is a superset
    #   of the exact-dup pairs.
    # - prod_pairs_wellformed: every emitted pair has doc_a < doc_b and
    #   0 <= hamming <= 3.
    #
    # The md5 twin (dedup_simhash_portable) hash-verifies the full
    # arithmetic externally; this entry locks the production hash path
    # to the same machinery.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    prod = dd.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, on_over_cap="error"
    )
    toks = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda x: x != "",
                )
            )
        ).alias("ts"),
    ).filter(F.size("ts") > 0)
    # Exact-dup pairs via a self-equi-join on (token-set hash, token
    # set) — the same capped-pair shape every production pair-producer
    # uses: the pair SET is inherently quadratic in a degenerate group,
    # but the join spreads it across tasks, where the earlier
    # collect_list form held each whole group as one in-task array
    # before exploding. The array itself rides the join key so a 64-bit
    # hash collision between DIFFERENT token sets cannot fabricate an
    # "exact" pair and spuriously redden the completeness check; the
    # hash narrows the shuffle comparison, the array equality makes it
    # exact.
    keyed = toks.select(
        "doc_id",
        "ts",
        F.xxhash64(F.col("ts").cast("string")).alias("tsh"),
    )
    ka = keyed.select("tsh", "ts", F.col("doc_id").alias("doc_a"))
    kb = keyed.select("tsh", "ts", F.col("doc_id").alias("doc_b"))
    exact_pairs = (
        ka.join(kb, ["tsh", "ts"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    n_exact = exact_pairs.agg(
        F.count(F.lit(1)).cast("long").alias("value")
    )
    missed = (
        exact_pairs.join(
            prod.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("value"))
    )
    n_prod = prod.agg(F.count(F.lit(1)).cast("long").alias("value"))
    malformed = prod.filter(
        ~(
            (F.col("doc_a") < F.col("doc_b"))
            & F.col("hamming").between(0, 3)
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("value"))
    row = lambda name, df, val, ok: df.select(  # noqa: E731
        F.lit(name).alias("check"), val.alias("value"), ok.alias("ok")
    )
    v = F.col("value")
    return (
        row("exact_dup_pairs_total", n_exact, v, F.lit(True))
        .unionAll(row("exact_dup_pairs_missed_by_prod", missed, v, v == 0))
        .unionAll(
            row(
                "prod_pairs_ge_exact",
                n_prod.crossJoin(
                    n_exact.select(F.col("value").alias("__ne"))
                ),
                F.when(v >= F.col("__ne"), F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
                v >= F.col("__ne"),
            )
        )
        .unionAll(row("prod_pairs_wellformed", malformed, v, v == 0))
    )


_SIMHASH_CONTRACT_ORACLE = """
WITH tok AS (
  SELECT doc_id, list_sort(list(DISTINCT t)) AS ts
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS t
    FROM documents
  )
  GROUP BY doc_id
),
g AS (SELECT count(*) AS c FROM tok GROUP BY ts),
n AS (
  SELECT CAST(coalesce(sum(c * (c - 1) / 2), 0) AS BIGINT) AS n_exact
  FROM g
)
SELECT 'exact_dup_pairs_total' AS check, n_exact AS value, TRUE AS ok FROM n
UNION ALL
SELECT 'exact_dup_pairs_missed_by_prod', CAST(0 AS BIGINT), TRUE
UNION ALL
SELECT 'prod_pairs_ge_exact', CAST(1 AS BIGINT), TRUE
UNION ALL
SELECT 'prod_pairs_wellformed', CAST(0 AS BIGINT), TRUE
"""


def _q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle-checkable SimHash variant: md5-derived 60-bit token
    # hashes replay bit-for-bit in DuckDB, so the WHOLE pipeline —
    # per-bit votes, hash fold, pigeonhole candidate join, Hamming
    # filter — is verified externally (the xxhash64 production variant
    # stays rows-only; semantics are identical by construction).
    t = register_tables(spark, sf_dir)
    return dd.simhash_pairs(
        t["documents"], "doc_id", "text", max_hamming=3, portable=True,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
        # Portable mode folds to 15-bit chunks (32k bucket values), so
        # bucket occupancy grows linearly with corpus size: the sf0.1
        # sweep measured a 1582-doc chunk bucket, over the default 1000
        # cap. 4000 keeps the fail-fast guarantee (it would still trip
        # on a degenerate corpus) while letting the oracle-twin verify
        # at 10x the driver scale.
        max_bucket=4000,
    )


def _simhash_sh_cte() -> str:
    """The DuckDB portable-SimHash derivation (tok → agg → sh CTEs),
    shared by this module's pair oracle and the streaming gate's oracle
    (queries/streaming.py) — ONE generator, so a change to the portable
    hash cannot silently diverge the two replays. Emits byte-identical
    text to the pre-refactor inline version (attestation stability)."""
    nbits = dd._PORTABLE_BITS
    votes = ",\n    ".join(
        f"sum((h >> {j}) & 1) AS v{j}" for j in range(nbits)
    )
    fold = "\n      + ".join(
        f"(CASE WHEN 2*v{j} > n THEN (CAST(1 AS BIGINT) << {j})"
        f" ELSE 0 END)"
        for j in range(nbits)
    )
    return f"""WITH tok AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS t
    FROM documents
  )
),
agg AS (
  SELECT doc_id, count(*) AS n,
    {votes}
  FROM tok GROUP BY doc_id
),
sh AS (
  SELECT doc_id,
    {fold}
    AS simhash
  FROM agg
)"""


def _simhash_portable_oracle() -> str:
    return f"""
{_simhash_sh_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked triangle join: equi-join on a block-pair key (no
    # BroadcastNestedLoopJoin), bit-identical to the naive all-pairs
    # verifier — the exact-at-scale plan for diffuse embeddings whose
    # near-threshold pair mass rules out banded-LSH recall=1.
    t = register_tables(spark, sf_dir)
    return sim.cosine_pairs_blocked(t["embeddings"], threshold=0.4)


def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-level duplicate clustering: blocked-triangle cosine pairs
    # feed the SAME min-label-propagation loop the text path uses
    # (operators/corpus.py connected_components — edge-source agnostic).
    # The oracle derives the identical edge set with
    # list_cosine_similarity and closes it with a recursive CTE.
    from ..operators.corpus import connected_components

    t = register_tables(spark, sf_dir)
    pairs = sim.cosine_pairs_blocked(t["embeddings"], threshold=0.4).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return connected_components(pairs, id_col="vec_id").select(
        F.col("vec_id"), F.col("cluster")
    )


_EMB_CLUSTERS_ORACLE = """
WITH RECURSIVE
e0 AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM e0
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM e0
),
reach (id, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS vec_id, min(lab) AS cluster FROM reach GROUP BY id
"""


_EMB_NEARDUP_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def _q_scoped_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Provenance-scoped dedup: containment pairs where both docs SHARE a
    # source — the bucket join simply gains the scope column as an extra
    # equi-key (bucket_cols=["source","shingle"] via a composed id), so
    # cross-source pairs never even become candidates. The common policy
    # "dedup within a crawl, never across crawls" costs zero extra plan.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    # compose (source, doc_id) into the shingle stream by prefixing the
    # text-derived shingles with the source via a scoped frame
    sh = dd.shingles(docs, "doc_id", "text", 3, hashed=True)
    src = docs.select("doc_id", "source")
    scoped = sh.join(src, "doc_id")
    sizes = scoped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    pairs = (
        dd._bucket_pairs(
            scoped, ["source", "shingle"], "doc_id",
            max_size=1000, on_over_cap="error",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    cont = F.col("common") / F.least(F.col("na"), F.col("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(cont >= 0.3)
        .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
    )


_SCOPED_CONTAINMENT_ORACLE = """
WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b
    ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.3
"""


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Asymmetric near-dup: a short doc quoted inside a long one. Same
    # bucket-explode plan as jaccard_pairs, min-size denominator.
    t = register_tables(spark, sf_dir)
    return dd.containment_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.8,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
    )


_CONTAINMENT_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.8
"""


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Connected components over the near-dup graph (distributed min-label
    # propagation, operators/corpus.py). Edges are LSH candidates
    # exact-verified at the threshold, so the oracle's exact-Jaccard edge
    # set is identical; the oracle derives components independently via a
    # recursive transitive-closure CTE instead of label propagation.
    from ..operators.corpus import duplicate_clusters

    t = register_tables(spark, sf_dir)
    return duplicate_clusters(
        t["documents"], jaccard_threshold=0.5, ngram=3
    )


_DEDUP_CLUSTERS_ORACLE = """
WITH RECURSIVE
t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e0 AS (
  SELECT doc_a, doc_b
  FROM prs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM e0
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM e0
),
reach (id, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS doc_id, min(lab) AS cluster FROM reach GROUP BY id
"""


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental ingest dedup: a "new batch" (every 10th doc) matched
    # against the standing corpus (the rest) via the cross-corpus LSH
    # join. LSH recall is ~1 at the fixture's planted similarity levels
    # (see _q_minhash), so the exact cross-partition Jaccard oracle
    # applies.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return dd.minhash_lsh_join(
        batch, corpus, "doc_id", "text", n=3, threshold=0.5
    )


_DEDUP_INCREMENTAL_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (sa.nsh + sb.nsh - common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
"""


def _q_dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The amortized form of dedup_incremental: corpus band/shingle/size
    # artifacts materialized once (write_minhash_index), the batch joined
    # against the stored index. Output is bit-identical to the direct
    # join, so the same exact cross-partition oracle applies.
    import tempfile as _tempfile

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = _tempfile.mkdtemp(prefix="minhash_index_")
    dd.write_minhash_index(corpus, idx, "doc_id", "text", n=3, target_files=4)
    return dd.minhash_lsh_join_indexed(
        batch, idx, "doc_id", "text", n=3, threshold=0.5
    )


def _q_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dedup EXPLAINABILITY: for every Jaccard pair the pipeline flags,
    # the shared-shingle count plus a deterministic example shingle
    # (lexicographic min) — the evidence a reviewer needs to trust a
    # drop decision. String shingles here (evidence must be readable),
    # joined only for the ~25 flagged pairs.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = dd.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, on_over_cap="error"
    ).select("doc_a", "doc_b")
    sh = dd.shingles(docs, "doc_id", "text", 3, hashed=False)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min("shingle").alias("example_shingle"),
        )
    )


_PAIR_EVIDENCE_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS n_shared, min(a.s) AS example_shingle
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared, example_shingle
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_shared * 1.0 / (sa.nsh + sb.nsh - n_shared) >= 0.5
"""


def _q_shared_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-substring dedup (Lee et al. 2022 ExactSubstr): longest
    # verbatim shared token run per pair via positional seed-grams +
    # diagonal islands — the distributed stand-in for their suffix
    # array. on_over_cap="error": gated by an uncapped exact oracle.
    t = register_tables(spark, sf_dir)
    return dd.shared_run_pairs(
        t["documents"], "doc_id", "text",
        seed_n=5, min_run=8, on_over_cap="error",
    )


# Independent DuckDB derivation: string seed-grams (no hash fold),
# lateral generate_series positions, same diagonal islands-and-gaps.
_SHARED_RUN_ORACLE = """
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
  SELECT doc_a, doc_b, CAST(count(*) + 4 AS BIGINT) AS run_tokens
  FROM r GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b, max(run_tokens) AS longest_run,
       CAST(count(*) FILTER (WHERE run_tokens >= 8) AS BIGINT) AS n_runs
FROM runs GROUP BY doc_a, doc_b
HAVING max(run_tokens) >= 8
"""


def _q_remove_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The transform half of ExactSubstr dedup: excise every >=8-token
    # verbatim run shared with a lower-id doc, keep one occurrence
    # corpus-wide. Uncapped + fail-fast (exact oracle gates it).
    t = register_tables(spark, sf_dir)
    return dd.remove_shared_runs(
        t["documents"], "doc_id", "text",
        seed_n=5, min_run=8, on_over_cap="error",
    )


# Independent re-derivation: 1-based string grams, diagonal islands,
# span union at token-position level, order-preserving string_agg.
_REMOVE_SHARED_RUNS_ORACLE = """
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
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
),
removed AS (
  SELECT DISTINCT tok.doc_id, tok.pos
  FROM tok JOIN spans ON tok.doc_id = spans.doc_id
  WHERE tok.pos BETWEEN spans.s AND spans.e
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tok
  FROM tok ANTI JOIN removed USING (doc_id, pos)
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
),
nrem AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_removed
  FROM removed GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(c.clean_text, '') AS clean_text,
       coalesce(n.n_tokens_removed, 0) AS n_tokens_removed
FROM t
LEFT JOIN clean c USING (doc_id)
LEFT JOIN nrem n USING (doc_id)
"""


def _q_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Threshold edit-distance similarity join via the segment-pigeonhole
    # (PassJoin) candidate generator — an EXACT operator, so the oracle
    # is the brute-force quadratic verify. k=8 over a 96-char prefix:
    # the fixture's exact-dup prefixes (ed=0) plus one mutated pair at
    # ed=4, with the next-nearest pair at ed=38 — the threshold sits in
    # a wide margin, so the entry is insensitive to tie noise.
    from ..operators.editdist import editdist_pairs

    t = register_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", F.expr("substring(text, 1, 96)").alias("prefix")
    )
    return editdist_pairs(docs, "doc_id", "prefix", k=8)


_EDITDIST_ORACLE = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, 96), substr(b.text, 1, 96)) AS INT) AS ed
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 96), substr(b.text, 1, 96)) <= 8
"""


def _q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style sub-document dedup: globally-first occurrence of each
    # 12-word segment survives, every other occurrence is deleted and
    # the documents re-assembled. Width 12 dedups ~4% of the fixture's
    # segments (boilerplate repeats across near-dup docs).
    from ..operators.segdedup import segment_dedup

    t = register_tables(spark, sf_dir)
    return segment_dedup(t["documents"], "doc_id", "text", width=12)


_DEDUP_SEGMENTS_ORACLE = """
WITH occ AS (
  SELECT doc_id, j AS seg_idx,
         array_to_string(words[j*12+1 : j*12+12], ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       LATERAL unnest(generate_series(0, CAST(ceil(len(words)/12.0) AS INT) - 1)) AS t(j)
), kept AS (
  SELECT * FROM (
    SELECT doc_id, seg_idx, seg,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
    FROM occ) WHERE rn = 1
)
SELECT d.doc_id,
       COALESCE(k.text, '') AS text,
       COALESCE(o.n_segs, 0) AS n_segs,
       COALESCE(k.n_kept, 0) AS n_kept
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs
           FROM occ GROUP BY doc_id) o USING (doc_id)
LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text,
                  CAST(COUNT(*) AS BIGINT) AS n_kept
           FROM kept GROUP BY doc_id) k USING (doc_id)
"""


def _q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Winnowing fingerprint near-dup (Schleimer/Wilkerson/Aiken, SIGMOD
    # 2003): per-window minimum k-gram hashes (rightmost-min tie-break)
    # selected entirely in SQL window frames, Jaccard over the selected
    # sets. The md5-derived 44-bit gram hash and the packed
    # (hash, inverted-pos) ordering replay bit-for-bit in the oracle,
    # so selection, dedup, and scoring are all verified externally.
    t = register_tables(spark, sf_dir)
    return dd.winnow_pairs(
        t["documents"], "doc_id", "text", k=4, w=4, threshold=0.3,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
    )


# Full independent replay: DuckDB rebuilds the k-grams (list slices +
# lateral unnest), the packed min-hash window selection, and the
# fingerprint-set Jaccard from scratch.
_WINNOWING_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, len(w) - 3 AS ng, i AS pos,
         CAST(('0x' || substr(md5(array_to_string(w[i:i+3], ' ')), 1, 11))
              AS BIGINT) * 65536 + (65535 - i) AS packed
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 3)) AS i)
  WHERE len(w) >= 4
),
selw AS (
  SELECT doc_id, ng, pos,
         min(packed) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
  FROM g
),
fp AS (
  SELECT DISTINCT doc_id, sel // 65536 AS fp_hash
  FROM selw WHERE pos <= greatest(1, ng - 3)
),
sizes AS (SELECT doc_id, count(*) AS nfp FROM fp GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_fps,
       round(shared * 1.0 / (sa.nfp + sb.nfp - shared), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.nfp + sb.nfp - shared) >= 0.3
"""


def _q_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental connected components: an "arrival" stripe of documents
    # (doc_id % 5 == 4) is withheld from yesterday's clustering, then
    # absorbed by contracting its edges onto cluster representatives and
    # propagating over the SUPER-graph only (operators/corpus.py). The
    # oracle recomputes the full-corpus closure from scratch — the
    # maintenance-equals-recompute equality is the entire point.
    from ..operators.corpus import (
        connected_components,
        connected_components_incremental,
    )

    t = register_tables(spark, sf_dir)
    pairs = dd.jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.5,
        on_over_cap="error",
    ).select("doc_a", "doc_b")
    is_new_a = F.col("doc_a") % 5 == 4
    is_new_b = F.col("doc_b") % 5 == 4
    old_pairs = pairs.filter(~is_new_a & ~is_new_b)
    new_pairs = pairs.filter(is_new_a | is_new_b)
    labels = connected_components(old_pairs)
    return connected_components_incremental(labels, new_pairs)


def _q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sorted-neighborhood blocking over the customer balance space:
    # candidate pairs within a 4-record sliding window of the
    # (acctbal_cents, custkey) order — the Hernandez-Stolfo entity-
    # resolution generator, as a banded block self-equi-join on the
    # bucket-decomposed global rank (no global sort, no range join).
    # The oracle IS the naive ROW_NUMBER self-join; exact pair-set
    # equality is the contract. The order key is the exact integer
    # cents * 2^32 + custkey (monotone in (cents, custkey) even for
    # negative balances), custkey range-guarded LOUD.
    from ..operators.rowid import sorted_neighborhood_pairs

    t = register_tables(spark, sf_dir)
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    guarded_key = F.when(
        (F.col("c_custkey") >= 0) & (F.col("c_custkey") < F.lit(1 << 32)),
        F.col("c_custkey"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "sorted_neighborhood_pairs: c_custkey %s outside "
                "[0, 2^32) — the cents * 2^32 + custkey order key "
                "needs a 32-bit id",
                F.col("c_custkey").cast("string"),
            )
        ).cast("long")
    )
    s = t["customer"].select(
        F.col("c_custkey").alias("custkey"),
        (cents * F.lit(4294967296) + guarded_key).alias("k"),
    )
    p = sorted_neighborhood_pairs(s, "k", window=4, num_buckets=8)
    return p.select(
        "custkey_a",
        "custkey_b",
        F.col("rank_a").cast("bigint").alias("rank_a"),
        F.col("rank_b").cast("bigint").alias("rank_b"),
    )


_SNM_PAIRS_ORACLE = """
WITH s AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 4294967296
           + c_custkey AS k
  FROM customer
),
r AS (
  SELECT c_custkey, CAST(ROW_NUMBER() OVER (ORDER BY k) - 1 AS BIGINT) AS rn
  FROM s
)
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.rn AS rank_a, b.rn AS rank_b
FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 3
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "sorted_neighborhood_pairs": (_q_snm_pairs, _SNM_PAIRS_ORACLE),
    # oracle shared with dedup_clusters BY DESIGN: the incremental
    # maintenance must equal the from-scratch closure exactly
    "cc_incremental": (_q_cc_incremental, _DEDUP_CLUSTERS_ORACLE),
    "dedup_exact_substring": (_q_shared_run, _SHARED_RUN_ORACLE),
    "dedup_remove_shared_runs": (
        _q_remove_shared_runs,
        _REMOVE_SHARED_RUNS_ORACLE,
    ),
    "dedup_containment_scoped": (_q_scoped_containment, _SCOPED_CONTAINMENT_ORACLE),
    "dedup_pair_evidence": (_q_pair_evidence, _PAIR_EVIDENCE_ORACLE),
    "embedding_dedup_clusters": (_q_embedding_clusters, _EMB_CLUSTERS_ORACLE),
    "dedup_simhash": (_q_simhash, _SIMHASH_CONTRACT_ORACLE),
    "dedup_exact": (_q_dedup_exact, _DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": (_q_jaccard, _JACCARD_ORACLE),
    "dedup_jaccard_prefix_filter": (_q_jaccard_prefix, _JACCARD_ORACLE),
    "dedup_minhash_lsh": (_q_minhash, _JACCARD_ORACLE),
    "dedup_simhash_portable": (_q_simhash_portable, _simhash_portable_oracle()),
    "dedup_containment": (_q_containment, _CONTAINMENT_ORACLE),
    "dedup_clusters": (_q_dedup_clusters, _DEDUP_CLUSTERS_ORACLE),
    "dedup_incremental": (_q_dedup_incremental, _DEDUP_INCREMENTAL_ORACLE),
    "dedup_incremental_indexed": (
        _q_dedup_incremental_indexed,
        _DEDUP_INCREMENTAL_ORACLE,
    ),
    "embedding_neardup": (_q_embedding_neardup, _EMB_NEARDUP_ORACLE),
    "fuzzy_editdist_pairs": (_q_editdist_pairs, _EDITDIST_ORACLE),
    "dedup_segments": (_q_dedup_segments, _DEDUP_SEGMENTS_ORACLE),
    "dedup_winnowing": (_q_winnowing, _WINNOWING_ORACLE),
}
