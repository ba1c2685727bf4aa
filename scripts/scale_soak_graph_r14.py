#!/usr/bin/env python
"""Round-14 soak: the GRAPH family together at 1x and 10x sf0.1.

VERDICT r13 item 7: the r13 soak covered the audit operators; this one
puts the WHOLE graph family — hits, label propagation (both variants),
bfs_levels, sssp, kcore, personalized + weighted pagerank, degree
assortativity — through the same 1x-vs-10x protocol in ONE table, so
the per-round join-count scaling is on record beside the standing
scale_probe_hits numbers.

Fixture: the entries' sf0.1 trade graph (orders x lineitem,
o_totalprice > 150000), replicated k times with DISJOINT node
namespaces (copy-prefixed node ids). Each copy reproduces sf0.1's
degree distribution over its own node space, so edge volume — and the
per-round join/aggregate work — scales exactly kx while graph diameter
and round count stay fixed: the linear-scaling regime the Pregel-as-
joins shape must hold in. Edges/seeds are MATERIALIZED to parquet so
operators read real splits, not an in-plan generator.

Usage: python scripts/scale_soak_graph_r14.py [k]
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import time  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators.graph import (  # noqa: E402
    bfs_levels,
    degree_assortativity,
    hits,
    kcore,
    label_propagation,
    pagerank,
    personalized_pagerank,
    sssp,
)
from tfx_addons_feast_examplegen_spark.session import (  # noqa: E402
    get_spark,
    register_tables,
)

SF_DIR = "/root/testdata/sf0.1"


def _trade_pairs(t):
    # the graph entries' shared fixture: weighted (cust, supp) pairs
    return (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .agg(
            F.min("l_quantity").alias("w"),
            F.countDistinct("o_orderkey").alias("votes"),
        )
    )


def _copies(spark, k: int):
    return spark.range(k).select(F.col("id").cast("string").alias("copy"))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-soak-graph-r14")
    t = register_tables(spark, SF_DIR)
    pairs = _trade_pairs(t)
    seeds1 = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
    )

    results: dict[int, dict[str, float]] = {}
    for scale in (1, k):
        base = tempfile.mkdtemp(prefix=f"graph_soak_{scale}x_")
        # copy-prefixed node ids: copy 0 reproduces the entry graph,
        # copies 1..k-1 are disjoint clones — kx edges, same diameter
        p = pairs.crossJoin(_copies(spark, scale)).select(
            F.concat(F.col("copy"), F.lit("_"), F.col("a")).alias("a"),
            F.concat(F.col("copy"), F.lit("_"), F.col("b")).alias("b"),
            "w",
            "votes",
        )
        sym = p.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), "w", "votes"
        ).union(
            p.select(
                F.col("b").alias("src"), F.col("a").alias("dst"), "w", "votes"
            )
        )
        sym.repartition(32).write.mode("overwrite").parquet(f"{base}/edges")
        seeds1.crossJoin(_copies(spark, scale)).select(
            F.concat(F.col("copy"), F.lit("_"), F.col("node")).alias("node")
        ).repartition(8).write.mode("overwrite").parquet(f"{base}/seeds")
        edges = spark.read.parquet(f"{base}/edges")
        seeds = spark.read.parquet(f"{base}/seeds")
        edges.write.mode("overwrite").format("noop").save()  # warm
        n_edges = edges.count()
        print(f"scale {scale}x: {n_edges} directed edges", flush=True)

        # Graph operators run EAGERLY at call time (localCheckpoint
        # pins every round), so the build must sit INSIDE the timer —
        # writing the returned frame alone times a materialized scan.
        def timeit_build(label, build, passes=2):
            best = float("inf")
            for _ in range(passes):
                t0 = time.time()
                build().write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            print(f"  {label}: {best:.2f}s", flush=True)
            return best

        r: dict[str, float] = {}
        # directed half for HITS (the entry uses the unsymmetrized graph)
        directed = edges.where(F.col("src").contains("_c"))
        r["graph_hits"] = timeit_build(
            "graph_hits", lambda: hits(directed, iterations=3)
        )
        r["graph_label_propagation"] = timeit_build(
            "graph_label_propagation",
            lambda: label_propagation(edges, iterations=2),
        )
        r["graph_label_propagation_weighted"] = timeit_build(
            "graph_label_propagation_weighted",
            lambda: label_propagation(edges, weight_col="votes", iterations=2),
        )
        r["graph_bfs_levels"] = timeit_build(
            "graph_bfs_levels", lambda: bfs_levels(edges, seeds, max_hops=3)
        )
        r["graph_sssp"] = timeit_build(
            "graph_sssp",
            lambda: sssp(edges, seeds, weight_col="w", max_rounds=3),
        )
        r["graph_kcore"] = timeit_build(
            "graph_kcore", lambda: kcore(edges, k=3, max_rounds=4)
        )
        r["graph_pagerank_personalized"] = timeit_build(
            "graph_pagerank_personalized",
            lambda: personalized_pagerank(edges, seeds, iterations=6),
        )
        r["graph_pagerank_weighted"] = timeit_build(
            "graph_pagerank_weighted",
            lambda: pagerank(edges, weight_col="votes", iterations=6),
        )
        r["graph_degree_assortativity"] = timeit_build(
            "graph_degree_assortativity",
            lambda: degree_assortativity(edges),
        )
        results[scale] = r

    out = {
        name: {
            "1x": results[1][name],
            f"{k}x": results[k][name],
            "ratio": round(results[k][name] / max(results[1][name], 1e-9), 1),
        }
        for name in results[1]
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
