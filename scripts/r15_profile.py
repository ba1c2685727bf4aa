"""Per-query repeat timer: run named bench queries N times each with the
noop sink, print every rep's wall time (first rep = cold, min = floor).

Usage: python scripts/r15_profile.py [-n reps] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from tfx_addons_feast_examplegen_spark import queries as qmod  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15_profile")
    qs = qmod.queries()
    qs.update(bench.BENCH_IMPLS)
    qs.update(bench.EXTENDED_IMPLS)
    for name in args:
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
        print(
            f"{name:38s} " + " ".join(f"{t:6.2f}" for t in times)
            + f"  floor={min(times):6.2f}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
