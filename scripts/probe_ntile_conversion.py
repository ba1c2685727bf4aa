#!/usr/bin/env python
"""Probe: naive global-Window NTILE vs rowid.exact_ntile at 1x / 10x /
50x sf0.1 row counts — quantifies the single-partition-funnel term the
r15 conversions removed (VERDICT r14 items 2-3). The naive spelling
sorts EVERY row in one task; the decomposed spelling's widest stage is
a 64-way hash exchange + in-bucket sorts.

Usage: python scripts/probe_ntile_conversion.py [max_scale]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tfx_addons_feast_examplegen_spark.operators.rowid import (  # noqa: E402
    exact_ntile,
)
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402

BASE_ROWS = 100_000  # ~sf0.1 documents row count


def _best(build, passes=3):
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("probe-ntile")
    print(f"{'rows':>10} | {'naive NTILE':>11} | {'exact_ntile':>11} | ratio")
    for scale in (1, 10, max_scale):
        n = BASE_ROWS * scale
        # non-contiguous keys so neither side gets a free sorted input
        ids = spark.range(n).select(
            ((F.col("id") * 2654435761) % F.lit(2**40)).alias("k")
        )
        ids.write.mode("overwrite").format("noop").save()  # warm
        naive = _best(
            lambda: ids.withColumn(
                "tile", F.ntile(8).over(Window.orderBy("k"))
            )
        )
        decomposed = _best(
            lambda: exact_ntile(ids, "k", 8, num_buckets=64)
        )
        print(
            f"{n:>10} | {naive:>10.2f}s | {decomposed:>10.2f}s | "
            f"{naive / max(decomposed, 1e-9):.1f}x"
        )


if __name__ == "__main__":
    main()
