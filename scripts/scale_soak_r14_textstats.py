#!/usr/bin/env python
"""Round-14 soak: the round's new TEXT/STATS operators at 1x and 10x
sf0.1 (char_ngram_entropy, ks_two_sample) — the scale_soak_r13
protocol: per-copy vocabulary via scale_docs, materialized multi-file
parquet, min-of-passes floors, 10x/1x ratio printed.

Usage: python scripts/scale_soak_r14_textstats.py [scale]
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_soak_sf1 import scale_docs, timeit  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators.curation import (  # noqa: E402
    greedy_max_coverage,
    interleave_by_rate,
)
from tfx_addons_feast_examplegen_spark.operators.stats import (  # noqa: E402
    categorical_mutual_information,
    ks_two_sample,
    quantile_shift,
)
from tfx_addons_feast_examplegen_spark.operators.text import (  # noqa: E402
    char_ngram_entropy,
    quality_score,
)
from tfx_addons_feast_examplegen_spark.session import (  # noqa: E402
    get_spark,
    register_tables,
)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-soak-r14-textstats")
    t = register_tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")

    results: dict[int, dict[str, float]] = {}
    for scale in (1, k):
        dc = docs
        if scale != 1:
            base = tempfile.mkdtemp(prefix="r14_soak_")
            scale_docs(spark, docs, k).repartition(64).write.mode(
                "overwrite"
            ).parquet(base)
            dc = spark.read.parquet(base)
        dc.write.mode("overwrite").format("noop").save()  # warm
        r: dict[str, float] = {}
        r["text_char_ngram_entropy"] = timeit(
            "text_char_ngram_entropy", char_ngram_entropy(dc, n=3)
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
        # interleave needs a source column: doc_id % 5 as five synthetic
        # sources at mixed rates; the grouped-rank machinery is what's
        # under soak (build is eager via the two driver passes, so time
        # the construction too)
        import time as _t2

        src = dc.select(
            "doc_id",
            F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string")).alias(
                "source"
            ),
        )
        best_i = float("inf")
        for _ in range(2):
            t0 = _t2.time()
            interleave_by_rate(
                src,
                "source",
                {"s0": 4.0, "s1": 2.0, "s2": 1.0, "s3": 1.0},
            ).write.mode("overwrite").format("noop").save()
            best_i = min(best_i, _t2.time() - t0)
        print(f"  curriculum_interleave: {best_i:.2f}s", flush=True)
        r["curriculum_interleave"] = best_i
        import time as _t

        from tfx_addons_feast_examplegen_spark.operators.text import (
            quality_score as _qs,
        )

        mi_in = _qs(dc).select(
            (F.col("doc_id") % 7).cast("string").alias("bucket"),
            F.least(
                F.floor(F.col("quality_score") * 4).cast("int"), F.lit(3)
            ).cast("string").alias("q4"),
        )
        r["lang_quality_mi_shape"] = timeit(
            "lang_quality_mi_shape",
            categorical_mutual_information(mi_in, "bucket", "q4"),
        )
        # greedy_max_coverage is EAGER (k argmax collects), so the
        # build goes inside the timer; hashed=True is the scale path
        best = float("inf")
        for _ in range(2):
            t0 = _t.time()
            greedy_max_coverage(dc, k=4, n=3, hashed=True).write.mode(
                "overwrite"
            ).format("noop").save()
            best = min(best, _t.time() - t0)
        print(f"  subset_max_coverage: {best:.2f}s", flush=True)
        r["subset_max_coverage"] = best
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
