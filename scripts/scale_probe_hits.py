#!/usr/bin/env python
"""Scale probe: HITS at 10M directed edges / ~1.1M nodes (round 13).

Validates the Pregel-as-joins shape holds past fixture scale: per
half-step one score-frame x edge-frame equi-join + one sum keyed on
the receiving endpoint, norms as 1-row broadcast aggregates, O(1)
lineage via localCheckpoint. Records wall time per iteration count so
the linear-in-iterations claim is measured, not asserted. Nothing
reaches the driver except the two norm scalars.

Run: python scripts/scale_probe_hits.py [n_edges]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tfx_addons_feast_examplegen_spark.operators.graph import hits

    # skewed bipartite-ish web graph: 1M hub candidates, 100k
    # authorities with a zipf-ish in-degree profile (xxhash-derived,
    # deterministic)
    path = f"/tmp/hits_probe_{n_edges}"
    if not os.path.isdir(path):
        (
            spark.range(n_edges)
            .select(
                F.concat(F.lit("h"), (F.xxhash64("id", F.lit(1)) % 1_000_000)).alias("src"),
                F.concat(
                    F.lit("a"),
                    (F.abs(F.xxhash64("id", F.lit(2))) % (F.abs(F.xxhash64("id", F.lit(3))) % 100_000 + 1)),
                ).alias("dst"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    edges = spark.read.parquet(path)
    for iters in (1, 3):
        t0 = time.time()
        out = hits(edges, iterations=iters)
        n = out.count()
        dt = time.time() - t0
        print(json.dumps({
            "probe": "hits", "n_edges": n_edges, "iterations": iters,
            "nodes_out": n, "wall_s": round(dt, 1),
            "load": round(os.getloadavg()[0], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
