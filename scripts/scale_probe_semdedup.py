#!/usr/bin/env python
"""Scale probe: semantic_dedup (SemDeDup) at 250k / 1M vectors.

Checks the 100 TB story the operator claims: runtime grows ~linearly
in corpus size when cluster occupancy is controlled (n_clusters scales
with n), planted duplicate pairs are all caught, and the giant-cluster
guard (max_cluster + observation) is exercised. Vectors are
md5-derived expressions — no UDF, no driver-side data generation.

Run: python scripts/scale_probe_semdedup.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


def synth(spark, n: int, dim: int):
    """n vectors of dim md5-derived floats in [-1, 1); ids n..2n-1 with
    id % 100 == 1 are EXACT copies of id-1's vector (1% planted dups).
    Pure expression: the vector is a deterministic function of the
    BASE id, so a copy equals its original by construction."""
    base = (
        f"CASE WHEN id % 100 = 1 THEN id - 1 ELSE id END"
    )
    vec = (
        f"transform(sequence(0, {dim - 1}), j -> "
        f"CAST(conv(substr(md5(concat(CAST(({base}) AS STRING), '_', "
        f"CAST(j AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 2147483648.0 "
        f"- 1.0)"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(vec).cast("array<float>").alias("embedding"),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("semdedup-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tfx_addons_feast_examplegen_spark.operators.semdedup import (
        semantic_dedup,
    )

    # Cluster occupancy governs the quadratic term: candidate pairs
    # ~ n^2 / k, so k must grow LINEARLY with n to hold per-cluster
    # brute force flat (the paper's 50k clusters for 100M+ points is
    # this law). Probe at constant target occupancy ~100: the pair
    # stage stays ~n-linear; the assignment stage is n*k*dim and
    # becomes the wall when k grows past ~10k without a centroid index.
    dim = 16
    for n, k in ((100_000, 1_024), (400_000, 4_096)):
        df = synth(spark, n, dim).cache()
        df.count()
        obs = Observation(f"semdedup_{n}")
        t0 = time.perf_counter()
        out = semantic_dedup(
            df,
            threshold=0.999,
            n_clusters=k,
            seed=42,
            refine_iters=2,
            max_cluster=200_000,
            observation=obs,
            on_over_cap="error",
        )
        suppressed = out.where(~F.col("kept")).count()
        wall = time.perf_counter() - t0
        planted = sum(1 for i in range(n) if i % 100 == 1)
        print(
            {
                "n": n,
                "n_clusters": k,
                "wall_sec": round(wall, 1),
                "suppressed": suppressed,
                "planted": planted,
                "max_cluster_size": obs.get["max_bucket_size"],
                "dropped": obs.get["dropped_buckets"],
            },
            flush=True,
        )
        assert suppressed == planted, (suppressed, planted)
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
