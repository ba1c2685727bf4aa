"""Planted-truth soak: segment_dedup at 200k docs (beyond fixture SF).

Construction (deterministic, collision-free by embedding ids in
words): every doc = the SAME 8-word boilerplate segment + an 8-word
tail unique to the doc — except every 1000th doc (id % 1000 == 0,
id > 0) copies the PREVIOUS doc's tail. With width=8 the segments are
exactly [boilerplate, tail], so first-wins dedup has a closed-form
answer:

- doc 0 keeps both segments (it owns the boilerplate's first
  occurrence);
- every other doc with a unique tail keeps exactly its tail;
- every tail-copying doc keeps NOTHING (boilerplate lost to doc 0,
  tail lost to doc id-1);
- sum(n_kept) = 1 + #distinct tails = 1 + N - (N/1000 - 1) - ... see
  below (computed exactly, asserted exactly — not a bound).

Usage: python scripts/scale_soak_segdedup.py [N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.segdedup import segment_dedup
from tfx_addons_feast_examplegen_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

spark = get_spark("segdedup-soak")

BOILER = "the quick brown fox jumps over lazy dogs"

# tail of doc i: embeds i in every word -> unique per i by construction
tail = F.expr(
    "concat_ws(' ', transform(sequence(1, 8), j -> concat('u', tid, '_', j)))"
)
docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.when((F.col("id") % 1000 == 0) & (F.col("id") > 0), F.col("id") - 1)
    .otherwise(F.col("id"))
    .alias("tid"),
).select(
    "doc_id",
    F.concat(F.lit(BOILER + " "), tail).alias("text"),
    (F.col("tid") != F.col("doc_id")).alias("is_copier"),
)

t0 = time.time()
out = segment_dedup(docs.select("doc_id", "text"), "doc_id", "text", width=8)
agg = out.agg(
    F.sum("n_kept").alias("kept"),
    F.sum("n_segs").alias("segs"),
    F.sum((F.col("n_kept") == 0).cast("long")).alias("empty_docs"),
).collect()[0]
wall = time.time() - t0

n_copiers = len([i for i in range(1, N) if i % 1000 == 0])
expected_kept = 1 + (N - n_copiers)  # boilerplate + one per distinct tail
assert agg["segs"] == 2 * N, agg
assert agg["kept"] == expected_kept, (agg, expected_kept)
assert agg["empty_docs"] == n_copiers, (agg, n_copiers)

d0 = out.where(F.col("doc_id") == 0).collect()[0]
assert d0["text"].startswith(BOILER) and "u0_8" in d0["text"], d0
d1 = out.where(F.col("doc_id") == 1).collect()[0]
assert d1["text"] == " ".join(f"u1_{j}" for j in range(1, 9)), d1
dcopy = out.where(F.col("doc_id") == 1000).collect()[0]
assert dcopy["text"] == "" and dcopy["n_kept"] == 0, dcopy

print(
    f"OK N={N}: kept={agg['kept']} (expected {expected_kept}), "
    f"empty={agg['empty_docs']} copiers, wall={wall:.2f}s"
)
