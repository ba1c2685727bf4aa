#!/usr/bin/env python
"""Scale probe: two-stage IVF assignment index vs the flat scan.

Isolates the claim in ``similarity.ivf_assign_indexed``'s docstring
(and the r10 semdedup probe's finding that the n x n_clusters x dim
assignment scan is the wall past ~1-2k clusters): train one quantizer,
then time FLAT vs INDEXED assignment of the same 400k x 16-dim corpus
over 4096 cells, check planted-duplicate co-assignment and whole-corpus
agreement, and close with an end-to-end semantic_dedup through the
indexed path (recall must stay exact on planted duplicates).

Run: python scripts/scale_probe_ivf_index.py [n] [k]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from scale_probe_semdedup import synth  # same planted-dup generator


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4_096
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("ivf-index-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tfx_addons_feast_examplegen_spark.operators.semdedup import (
        semantic_dedup,
    )
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_indexed,
        ivf_centroids,
    )

    dim = 16
    df = synth(spark, n, dim).cache()
    df.count()

    t0 = time.perf_counter()
    cents = ivf_centroids(
        df, id_col="vec_id", vec_col="embedding", n_cells=k, seed=42,
        refine_iters=2,
    )
    t_train = time.perf_counter() - t0
    print({"stage": "train", "n": n, "k": k, "wall_sec": round(t_train, 1)},
          flush=True)

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids_indexed,
    )

    t0 = time.perf_counter()
    cents_idx = ivf_centroids_indexed(
        df, id_col="vec_id", vec_col="embedding", n_cells=k, seed=42,
        refine_iters=2, n_probe_super=2,
    )
    t_train_idx = time.perf_counter() - t0
    print(
        {
            "stage": "train_indexed",
            "wall_sec": round(t_train_idx, 1),
            "speedup": round(t_train / t_train_idx, 1),
            "n_unit": sum(
                1
                for c in cents_idx
                if abs(sum(x * x for x in c) - 1.0) < 1e-9
            ),
        },
        flush=True,
    )

    t0 = time.perf_counter()
    flat = ivf_assign(df, cents, vec_col="embedding", n_probe=1).cache()
    flat.count()
    t_flat = time.perf_counter() - t0
    print({"stage": "assign_flat", "wall_sec": round(t_flat, 1)}, flush=True)

    t0 = time.perf_counter()
    idx = ivf_assign_indexed(
        df, cents, vec_col="embedding", n_probe_super=2, n_probe=1
    ).cache()
    idx.count()
    t_idx = time.perf_counter() - t0
    print({"stage": "assign_indexed", "wall_sec": round(t_idx, 1),
           "speedup": round(t_flat / t_idx, 1)}, flush=True)

    # agreement: indexed probing is approximate at cluster BOUNDARIES;
    # measure how often it lands in the flat scan's cell
    both = flat.select("vec_id", F.col("cell").alias("cf")).join(
        idx.select("vec_id", F.col("cell").alias("ci")), "vec_id"
    )
    agree = both.where(F.col("cf") == F.col("ci")).count()
    print({"stage": "agreement", "frac": round(agree / n, 4)}, flush=True)

    # planted copies must co-assign under the indexed path (pure
    # function of the vector -> identical vectors, identical cell)
    pairs = idx.select("vec_id", "cell")
    co = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a.vec_id") % 100 == 1)
            & (F.col("b.vec_id") == F.col("a.vec_id") - 1),
        )
        .where(F.col("a.cell") != F.col("b.cell"))
        .count()
    )
    print({"stage": "copies_co_assign", "split_pairs": co}, flush=True)
    assert co == 0, co

    flat.unpersist()
    idx.unpersist()

    # end-to-end: semantic_dedup through the indexed path, same
    # quantizer, exact planted recall required
    obs = Observation("semdedup_indexed")
    t0 = time.perf_counter()
    out = semantic_dedup(
        df,
        threshold=0.999,
        n_clusters=k,
        seed=42,
        centroids=cents,
        assign_via_index=2,
        max_cluster=200_000,
        observation=obs,
        on_over_cap="error",
    )
    suppressed = out.where(~F.col("kept")).count()
    t_e2e = time.perf_counter() - t0
    planted = sum(1 for i in range(n) if i % 100 == 1)
    print(
        {
            "stage": "semdedup_indexed_e2e",
            "wall_sec": round(t_e2e, 1),
            "suppressed": suppressed,
            "planted": planted,
            "max_cluster_size": obs.get["max_bucket_size"],
        },
        flush=True,
    )
    assert suppressed == planted, (suppressed, planted)
    spark.stop()


if __name__ == "__main__":
    main()
