"""Scale probes for the round-10 continuation operators.

Part A — editdist_pairs (PassJoin) corpus-size scaling:
  N strings (~64 chars, 10% mutated near-dups), k=3. Measured: wall
  time and candidate-pair count at 1x/4x/16x. The claim under test is
  sub-quadratic growth: candidates should scale ~linearly with N (near
  dups per string are O(1)), while the brute-force verify the oracle
  uses is O(N^2). Also timed at the smallest N for contrast.

Part B — segment_dedup hot-segment skew:
  N docs, every one carrying the SAME boilerplate segment plus unique
  tail segments. The min(struct) winner aggregate must stay flat-cost
  (map-side combine) as the hot segment's occurrence count grows;
  a partition-by-segment Window spelling is run beside it for contrast.

Part C — token_budget_select vs the global-Window spelling at 20M rows:
  the naive SUM(...) OVER (ORDER BY ...) funnels 20M rows through one
  task; the bucket decomposition keeps every stage 32-way. Both must
  agree on the selected count.

Usage: python scripts/scale_probe_newops_r10.py [edN] [segN] [budN]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.curation import (
    token_budget_select,
)
from tfx_addons_feast_examplegen_spark.operators.editdist import editdist_pairs
from tfx_addons_feast_examplegen_spark.operators.segdedup import segment_dedup
from tfx_addons_feast_examplegen_spark.session import get_spark

ED_N = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
SEG_N = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
BUD_N = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000_000

spark = get_spark("newops-probe")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:<44s} {dt:8.2f} s   {out}")
    return dt, out


# --- Part A: editdist scaling -------------------------------------------
def ed_corpus(n):
    # ~64-char strings over a 16-letter alphabet; every 10th string is a
    # near-dup of an earlier one (2 edits: one substitution via overlay,
    # one deletion via substring splice) — deterministic, no RNG.
    base = spark.range(n).select(
        F.col("id"),
        F.concat_ws(
            "",
            F.expr(
                "transform(sequence(1, 64),"
                " j -> char(97 + pmod(xxhash64(id * 64 + j), 16)))"
            ),
        ).alias("t"),
    )
    mut = base.where(F.col("id") % 10 == 0).select(
        (F.col("id") + n).alias("id"),
        F.expr(
            "concat(substring(overlay(t PLACING 'z' FROM 7), 1, 30),"
            " substring(t, 32))"
        ).alias("t"),
    )
    return base.unionByName(mut)


print(f"== Part A: editdist_pairs scaling, k=3 (base N, 1x={ED_N}) ==")
for mult in (1, 4, 16):
    n = ED_N * mult
    df = ed_corpus(n).cache()
    df.count()
    dt, pairs = timed(
        f"editdist k=3  N={n}",
        lambda df=df: editdist_pairs(df, "id", "t", k=3).count(),
    )
    df.unpersist()

# --- Part B: segment_dedup hot segment ----------------------------------
print(f"== Part B: segment_dedup hot boilerplate segment (N={SEG_N} docs) ==")


def seg_corpus(n):
    # every doc: identical 8-word boilerplate + a unique 8-word tail
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over lazy dogs "),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sequence(1, 8),"
                    " j -> concat('w', pmod(xxhash64(id * 8 + j), 1000000)))"
                ),
            ),
        ).alias("text"),
    )


from tfx_addons_feast_examplegen_spark.operators.segdedup import (
    segment_occurrences,
)

for n in (SEG_N // 10, SEG_N):
    df = seg_corpus(n).cache()
    df.count()
    # apples-to-apples winner selection over the SAME cached occurrence
    # frame: combinable min(struct) hash-agg vs partition-by-segment
    # Window (the hot segment's n occurrences land in ONE task's sort).
    occ = segment_occurrences(df, "doc_id", "text", width=8).select(
        "doc_id", "seg_idx", F.xxhash64("seg").alias("k")
    ).cache()
    occ.count()
    timed(
        f"winner min(struct) hash-agg  N={n}",
        lambda occ=occ: occ.groupBy("k")
        .agg(F.min(F.struct("doc_id", "seg_idx")).alias("w")).count(),
    )
    w = Window.partitionBy("k").orderBy("doc_id", "seg_idx")
    timed(
        f"winner Window row_number (hot-key sort)  N={n}",
        lambda occ=occ: occ.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1).count(),
    )
    occ.unpersist()
    timed(
        f"segment_dedup end-to-end  N={n}",
        lambda df=df: segment_dedup(df, "doc_id", "text", width=8)
        .agg(F.sum("n_kept")).collect()[0][0],
    )
    df.unpersist()

# --- Part C: token_budget_select vs global Window -----------------------
print(f"== Part C: token_budget_select at N={BUD_N} rows ==")
rows = spark.range(BUD_N).select(
    F.col("id").alias("doc_id"),
    (F.pmod(F.xxhash64("id"), 1_000_000) / 1_000_000.0).alias("score"),
    (F.pmod(F.xxhash64("id", F.lit(1)), 500) + 1).alias("toks"),
).cache()
rows.count()
budget = float(BUD_N) * 250.0 * 0.5  # ~half the expected token mass

timed(
    "bucket-decomposed select",
    lambda: token_budget_select(
        rows, "score", "toks", budget, id_col="doc_id", num_buckets=256
    ).count(),
)
w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()).rowsBetween(
    Window.unboundedPreceding, Window.currentRow
)
timed(
    "global-Window spelling (1-task sort)",
    lambda: rows.withColumn("cum", F.sum("toks").over(w))
    .where(F.col("cum") <= budget).count(),
)
rows.unpersist()

# --- Part D: Count-Min build vs exact per-key count at high cardinality
print("== Part D: CMS build vs exact groupBy count (50M rows, ~10M distinct) ==")
from tfx_addons_feast_examplegen_spark.operators.sketches import (
    countmin_build,
    countmin_estimate,
)

cms_rows = spark.range(50_000_000).select(
    F.pmod(F.xxhash64("id"), 10_000_000).alias("k")
).cache()
cms_rows.count()
timed(
    "exact groupBy count (10M-key shuffle)",
    lambda: cms_rows.groupBy("k").count().count(),
)
timed(
    "countmin_build width=4096 depth=4",
    lambda: countmin_build(cms_rows, "k", width=4096, depth=4).count(),
)
sk = countmin_build(cms_rows, "k", width=4096, depth=4)
probe_keys = cms_rows.select("k").distinct().limit(100000)
timed(
    "countmin_estimate 100k keys (broadcast grid)",
    lambda: countmin_estimate(sk, probe_keys, "k", width=4096, depth=4).count(),
)
cms_rows.unpersist()
