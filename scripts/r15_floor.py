"""Per-query idle-machine floors: min/median of N noop-sink reps.

The bench's full harness (warm-up at sf0.001, 7 round-robin passes,
A/B stepper) is the artifact of record; this helper is the quick
measurement loop used while optimizing ONE query (guide §1.4): warm
once, then N consecutive reps, print min/median/max.

Usage: [SPARK_GRAFT_FLOOR_REPS=5] python scripts/r15_floor.py name [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from tfx_addons_feast_examplegen_spark import queries as qmod  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    reps = int(os.environ.get("SPARK_GRAFT_FLOOR_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15_floor")
    qs = qmod.queries()
    qs.update(bench.BENCH_IMPLS)
    qs.update(bench.EXTENDED_IMPLS)
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"rep{i}:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            ts.append(time.time() - t0)
        print(
            f"{name:38s} min={min(ts):6.3f} med={statistics.median(ts):6.3f}"
            f" max={max(ts):6.3f} load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
