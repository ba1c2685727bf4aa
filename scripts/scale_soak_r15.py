#!/usr/bin/env python
"""Round-15 soak: this round's changed/new operators at 1x and 10x
sf0.1 — the scale_soak_r13 protocol (per-copy vocabulary via
scale_docs, materialized multi-file parquet, min-of-passes floors,
10x/1x ratio printed).

Under soak:
- exact_ntile (the new bucket-decomposed NTILE primitive) — EAGER
  construction (quantile sample + bucket counts + N count) plus the
  distributed in-bucket rank, timed end-to-end;
- length_bucketing (converted off the global NTILE Window onto it);
- bpe_train (iterative trainer: 5 rounds of count/argmax/fold-apply,
  localCheckpoint-pinned — eager by design, timed end-to-end);
- ks_two_sample / quantile_shift (the bounded-grid guard adds a 1-row
  broadcast agg off the reused grid exchange — confirm the overhead is
  flat).

Usage: python scripts/scale_soak_r15.py [scale]
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_soak_sf1 import scale_docs, timeit  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators.curation import (  # noqa: E402
    length_bucketing,
)
from tfx_addons_feast_examplegen_spark.operators.rowid import (  # noqa: E402
    exact_ntile,
)
from tfx_addons_feast_examplegen_spark.operators.stats import (  # noqa: E402
    ks_two_sample,
    quantile_shift,
)
from tfx_addons_feast_examplegen_spark.operators.text import (  # noqa: E402
    bpe_train,
    quality_score,
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
    spark = get_spark("scale-soak-r15")
    t = register_tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")

    results: dict[int, dict[str, float]] = {}
    for scale in (1, k):
        dc = docs
        if scale != 1:
            base = tempfile.mkdtemp(prefix="r15_soak_")
            scale_docs(spark, docs, k).repartition(64).write.mode(
                "overwrite"
            ).parquet(base)
            dc = spark.read.parquet(base)
        dc.write.mode("overwrite").format("noop").save()  # warm
        r: dict[str, float] = {}

        ids = dc.select("doc_id")
        r["exact_ntile"] = _eager(
            "exact_ntile",
            lambda: exact_ntile(ids, "doc_id", 8, num_buckets=64),
        )
        r["length_bucketing"] = _eager(
            "length_bucketing", lambda: length_bucketing(dc, n_buckets=8)
        )
        # bpe_train is eager end-to-end (collects are 1-row params; the
        # cost is 5 corpus passes + 5 pair-count shuffles)
        r["bpe_train"] = _eager(
            "bpe_train",
            lambda: bpe_train(dc, "doc_id", "text", n_merges=5),
            passes=1,
        )
        scored = quality_score(dc).select(
            "quality_score",
            (F.col("doc_id") % 2).cast("string").alias("half"),
        )
        r["score_drift_ks"] = timeit(
            "score_drift_ks",
            ks_two_sample(scored, "quality_score", "half", decimals=4),
        )
        r["score_drift_qq"] = timeit(
            "score_drift_qq",
            quantile_shift(scored, "quality_score", "half", decimals=4),
        )
        results[scale] = r
        print(f"scale={scale}: " + ", ".join(
            f"{n}={v:.2f}s" for n, v in r.items()
        ), flush=True)

    print("\n10x/1x ratios (linear-ish < ~{}x is healthy):".format(k))
    for name in results[1]:
        a, b = results[1][name], results[k][name]
        print(f"  {name}: {a:.2f}s -> {b:.2f}s  ratio {b / max(a, 1e-9):.1f}x")


if __name__ == "__main__":
    main()
