"""Skew probe: salted_join vs plain sort-merge join under a hot key.

20M-row big side with 50% of rows on ONE key, 1M-row dim (broadcast
disabled — the not-broadcastable-dim regime salting exists for), AQE
skew-join splitting ON for the plain baseline, downstream groupBy so
the join output is consumed through a re-shuffle (the hash-clustered
case the operator docstring targets). Result rows are identical by
construction (`skew_salted_join`'s oracle checks that equivalence on
the fixture tables).

Usage: python scripts/scale_probe_skew.py

Measured (local[32], quiet host, 2026-08-14, round 8):

  plain join + AQE skew split : 5.2 s
  salted_join (n_salts=16)    : 2.9 s   (1.8x)

AQE's runtime split helps but still pays the skewed partition's sort
and scheduling tail; positional salting spreads the hot key across 16
reducers unconditionally, at the cost of a 16x shuffle of the (small)
dim side only.
"""

import sys, time, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tfx_addons_feast_examplegen_spark.session import get_spark
from tfx_addons_feast_examplegen_spark.operators.skew import salted_join

spark = get_spark("skew-probe")
N_BIG, N_SMALL, N_KEYS = 20_000_000, 1_000_000, 1_000_000
big = spark.range(N_BIG).select(
    F.when(F.col("id") % 2 == 0, F.lit(0))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
    .alias("k"),
    (F.col("id") % 1000).alias("v"),
)
small = spark.range(N_SMALL).select(
    F.col("id").alias("k"), (F.col("id") % 97).alias("w")
)
base = tempfile.mkdtemp(prefix="skewp_")
big.repartition(64).write.parquet(base + "/big")
small.repartition(16).write.parquet(base + "/small")
big = spark.read.parquet(base + "/big")
small = spark.read.parquet(base + "/small")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
print("RESULT sizes", big.count(), small.count(), flush=True)
for label, fn in [
    (
        "plain_aqe",
        lambda: big.join(small, "k").groupBy("v").agg(F.sum("w").alias("s")),
    ),
    (
        "salted",
        lambda: salted_join(big, small, ["k"], n_salts=16)
        .groupBy("v")
        .agg(F.sum("w").alias("s")),
    ),
]:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    print(f"RESULT {label}={best:.2f}s", flush=True)
