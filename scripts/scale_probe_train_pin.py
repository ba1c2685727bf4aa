#!/usr/bin/env python
"""Probe: does pinning the training scan pay inside the IVF trainers?

VERDICT r12 item 4: each Lloyd iteration re-derives assignment from the
raw embeddings scan — init sample (1 scan) + per-iteration assignment →
(cell, dim) mean (1 scan each), so ``refine_iters=2`` scans the corpus
~3× inside the trainer alone, and callers (semantic_dedup, ivf_topk)
re-scan it again for the real assignment afterwards. The r12 pin rule
says: pin when a consumer re-executes a scan. This probe measures the
trainer over a real parquet scan (same fixture protocol as
scale_probe_semdedup*) with and without a scoped persist of the input
frame, at the two r12 bench-notes shapes:

- 400k × 16-dim, 4096 cells (indexed trainer — the scale shape)
- 60k × 256-dim, 16 cells (flat trainer — the semantic_dedup registry
  shape, fatter vectors)

Run on a quiet host; prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession

from scale_probe_semdedup import synth  # md5-derived vectors, planted dups


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids,
        ivf_centroids_indexed,
    )

    shapes = [
        ("indexed_400k_16d_4096c", ivf_centroids_indexed, 400_000, 16, 4096),
        ("flat_60k_256d_16c", ivf_centroids, 60_000, 256, 16),
    ]
    reps = int(os.environ.get("REPS", "3"))
    for name, trainer, n, dim, cells in shapes:
        path = f"/tmp/train_pin_probe_{n}_{dim}"
        if not os.path.isdir(path):
            synth(spark, n, dim).write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path).select("vec_id", "embedding")
        trainer(emb, n_cells=cells, refine_iters=1)  # warm, untimed
        results = {}
        for mode in ("unpinned", "pinned"):
            best = float("inf")
            for _ in range(reps):
                src = emb.persist() if mode == "pinned" else emb
                t0 = time.time()
                cents = trainer(src, n_cells=cells, refine_iters=2)
                dt = time.time() - t0
                if mode == "pinned":
                    src.unpersist(blocking=True)
                best = min(best, dt)
            results[mode] = round(best, 2)
            assert len(cents) == cells
        print(json.dumps({
            "probe": name, "n": n, "dim": dim, "cells": cells,
            "reps": reps, "load": round(os.getloadavg()[0], 1), **results,
        }), flush=True)


if __name__ == "__main__":
    main()
