"""Deep scale probe for the TFRecord output chain (S6/S7/D1 + read-back).

The full reference output path — rows -> tf.Example proto encode ->
hash split -> gzipped Split-{name}/ TFRecord files -> distributed
CRC-verified read-back + aggregate — at 1x and 10x the sf0.1 orders
table. Methodology of the other round-8 probes: the input is
materialized multi-file parquet at BOTH scales so the 1x baseline is
not under-parallelized by the single-file fixture.

This exercises the encode_examples task-count floor end to end: the
encode stage must fan out to defaultParallelism regardless of how few
splits the input scan plans, or one core serializes the proto encode.

Usage: python scripts/scale_probe_tfrecord.py [scale]

Measured (local[32], quiet host, 2026-08-14, round 8):

  leg        rows        roundtrip wall (encode+write+read+agg)
  1x-narrow  150,000      4.6 s  (single-file input; ~18 s pre-floor)
  1x         150,000      3.3 s  (64-file input)
  10x        1,500,000   14.5 s  (4.4x for 10x data)

Linear in rows with fixed overhead amortizing; the narrow leg pays
only the raw-row repartition over the 64-file shape instead of the
~5.5x single-core encode serialization it paid before the floor.
"""

import sys, time, tempfile
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables
from tfx_addons_feast_examplegen_spark.operators.split import hash_split
from tfx_addons_feast_examplegen_spark.sources.examplegen import encode_examples
from tfx_addons_feast_examplegen_spark.sources.tfrecord import (
    read_tfrecord_dataset,
    write_partitioned_tfrecords,
)

spark = get_spark("tfrecord-scale")
SCHEMA = StructType.fromDDL(
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_orderpriority string"
)
t = register_tables(spark, "/root/testdata/sf0.1")
orders = t["orders"].select(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
)
# legs: (label, copies, input files). The 1x-narrow leg materializes a
# SINGLE input file — the under-split scan shape that serialized the
# encode before the task-count floor; it should now match the 64-file
# 1x leg instead of running ~3x slower.
LEGS = [
    ("1x-narrow", 1, 1),
    ("1x", 1, 64),
    (f"{int(sys.argv[1]) if len(sys.argv) > 1 else 10}x",
     int(sys.argv[1]) if len(sys.argv) > 1 else 10, 64),
]
for label, scale, nfiles in LEGS:
    if scale == 1:
        src = orders
    else:
        # per-copy disjoint key space; status/priority distributions kept
        src = (
            spark.range(scale)
            .crossJoin(orders)
            .select(
                (F.col("o_orderkey") + F.col("id") * 10_000_000_000)
                .alias("o_orderkey"),
                (F.col("o_custkey") + F.col("id") * 10_000_000)
                .alias("o_custkey"),
                "o_orderstatus",
                "o_orderpriority",
            )
        )
    base = tempfile.mkdtemp(prefix=f"tfr{label}_")
    src.repartition(nfiles).write.mode("overwrite").parquet(f"{base}/src")
    src = spark.read.parquet(f"{base}/src")
    n = src.count()
    best = float("inf")
    for _ in range(2):
        out = tempfile.mkdtemp(prefix=f"tfr{label}_out_")
        t0 = time.time()
        write_partitioned_tfrecords(
            hash_split(encode_examples(src), ["example"]),
            out,
            split_col="split",
        )
        back = read_tfrecord_dataset(spark, out, SCHEMA)
        got = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_custkey").alias("s"),
        ).collect()[0]
        best = min(best, time.time() - t0)
        assert got["n"] == n, (got["n"], n)
    print(f"RESULT scale={label} rows={n} roundtrip={best:.2f}s", flush=True)
