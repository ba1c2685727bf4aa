#!/usr/bin/env python
"""Round-15b soak: the four mid-round additions at 1x and 10x sf0.1
(scale_soak_r13 protocol — per-copy vocabulary, materialized parquet,
min-of-passes floors, 10x/1x ratio printed).

Under soak:
- eval_auc (auc_roc): rank machinery (2 corpus passes) + one per-score
  aggregate + one 1-row reduce;
- linreg_train_gd: 3 GD rounds = 3 combinable d-column aggregates +
  the final MSE aggregate;
- perplexity_bucket_filter: bigram-LM costing + exact_ntile;
- sorted_neighborhood_pairs: rank machinery + banded self-equi-join
  (output rows scale linearly with the corpus for fixed window).

Usage: python scripts/scale_soak_r15b.py [scale]
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_soak_sf1 import scale_docs  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators.linmodel import (  # noqa: E402
    linreg_train_gd,
)
from tfx_addons_feast_examplegen_spark.operators.rowid import (  # noqa: E402
    sorted_neighborhood_pairs,
)
from tfx_addons_feast_examplegen_spark.operators.stats import (  # noqa: E402
    auc_roc,
    average_precision,
    grouped_auc,
    roc_curve,
)
from tfx_addons_feast_examplegen_spark.operators.similarity import (  # noqa: E402
    random_projection,
)
from tfx_addons_feast_examplegen_spark.operators.text import (  # noqa: E402
    perplexity_bucket_filter,
    word_cooccurrence_pmi,
)
from tfx_addons_feast_examplegen_spark.session import (  # noqa: E402
    get_spark,
    register_tables,
)

SF_DIR = "/root/testdata/sf0.1"


def _eager(label: str, build, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    print(f"  {label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-soak-r15b")
    t = register_tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text", "n_chars")

    results: dict[int, dict[str, float]] = {}
    for scale in (1, k):
        dc = docs
        if scale != 1:
            base = tempfile.mkdtemp(prefix="r15b_soak_")
            scaled = scale_docs(
                spark, docs.select("doc_id", "text"), k
            ).withColumn("n_chars", F.length("text"))
            scaled.repartition(64).write.mode("overwrite").parquet(base)
            dc = spark.read.parquet(base)
        dc.write.mode("overwrite").format("noop").save()  # warm
        r: dict[str, float] = {}

        scored = dc.select(
            F.col("n_chars").alias("score"),
            (F.col("doc_id") % 2).alias("label"),
        )
        r["eval_auc"] = _eager(
            "eval_auc",
            lambda: auc_roc(scored, "score", "label", num_buckets=64),
        )
        feats = dc.select(
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ntok"),
            F.col("n_chars").alias("y"),
        )
        r["linreg_train_gd"] = _eager(
            "linreg_train_gd",
            lambda: linreg_train_gd(feats, ["ntok"], "y", rounds=3),
            passes=1,
        )
        r["perplexity_buckets"] = _eager(
            "perplexity_buckets",
            lambda: perplexity_bucket_filter(
                dc.select("doc_id", "text"), n_buckets=3
            ),
        )
        keyed = dc.select(
            "doc_id",
            (F.col("n_chars") * F.lit(4294967296) + F.col("doc_id")).alias(
                "k"
            ),
        )
        r["snm_pairs"] = _eager(
            "snm_pairs",
            lambda: sorted_neighborhood_pairs(keyed, "k", window=4),
        )
        r["eval_avg_precision"] = _eager(
            "eval_avg_precision",
            lambda: average_precision(
                scored, "score", "label", num_buckets=64
            ),
        )
        r["eval_roc_curve"] = _eager(
            "eval_roc_curve",
            lambda: roc_curve(scored, "score", "label", num_buckets=64),
        )
        from tfx_addons_feast_examplegen_spark.operators.rowid import (
            grouped_prefix_sum,
            prefix_sum,
        )
        r["prefix_sum"] = _eager(
            "prefix_sum",
            lambda: prefix_sum(
                dc.select("doc_id", F.col("n_chars").alias("v")),
                "doc_id", "v", num_buckets=64,
            ),
        )
        grouped_src = dc.select(
            "doc_id",
            (F.col("doc_id") % 4).cast("string").alias("src"),
            F.col("n_chars").alias("v"),
        )
        r["grouped_prefix_sum"] = _eager(
            "grouped_prefix_sum",
            lambda: grouped_prefix_sum(
                grouped_src, ["src"], "doc_id", "v", num_buckets=64
            ),
        )
        gsc = dc.select(
            (F.col("doc_id") % 5).cast("string").alias("g"),
            F.col("n_chars").alias("score"),
            (F.col("doc_id") % 2).alias("label"),
        )
        r["grouped_auc"] = _eager(
            "grouped_auc",
            lambda: grouped_auc(gsc, ["g"], "score", "label",
                                num_buckets=64),
        )
        r["word_pmi"] = _eager(
            "word_pmi",
            lambda: word_cooccurrence_pmi(
                dc.select("doc_id", "text"), window=2, min_count=5, top_n=50
            ),
        )
        results[scale] = r
        print(f"scale={scale}: " + ", ".join(
            f"{n}={v:.2f}s" for n, v in r.items()
        ), flush=True)

    print(f"\n10x/1x ratios (linear-ish < ~{k}x is healthy):")
    for name in results[1]:
        a, b = results[1][name], results[k][name]
        print(f"  {name}: {a:.2f}s -> {b:.2f}s  ratio {b / max(a, 1e-9):.1f}x")


def soak_projection(k: int = 10) -> None:
    """Separate embeddings-table soak for random_projection (the docs
    scaler doesn't apply): scale via scale_embeddings."""
    from scale_soak_sf1 import scale_embeddings

    spark = get_spark("scale-soak-r15b-proj")
    t = register_tables(spark, SF_DIR)
    emb = t["embeddings"].select("vec_id", "embedding")
    res = {}
    for scale in (1, k):
        e = emb
        if scale != 1:
            base = tempfile.mkdtemp(prefix="r15b_proj_")
            scale_embeddings(spark, emb, k).repartition(64).write.mode(
                "overwrite"
            ).parquet(base)
            e = spark.read.parquet(base)
        e.write.mode("overwrite").format("noop").save()
        res[scale] = _eager(
            f"random_projection@{scale}x",
            lambda: random_projection(e, 8),
        )
    print(
        f"  random_projection: {res[1]:.2f}s -> {res[k]:.2f}s "
        f"ratio {res[k] / max(res[1], 1e-9):.1f}x"
    )


if __name__ == "__main__":
    main()
    soak_projection()
