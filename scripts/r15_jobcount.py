"""Count Spark jobs (and wall time) per bench query: run each named
query once with the noop sink under a dedicated job group and report how
many jobs it launched — the fixed-overhead multiplier for iterative
operators (each localCheckpoint / count / eager probe is one job).

Usage: python scripts/r15_jobcount.py name [name ...]
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
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15_jobcount")
    sc = spark.sparkContext
    qs = qmod.queries()
    qs.update(bench.BENCH_IMPLS)
    qs.update(bench.EXTENDED_IMPLS)
    for name in names:
        # warm pass (uncounted): caches/JIT, mirrors the bench floor
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        n_stages = 0
        for j in jobs:
            info = sc.statusTracker().getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        print(
            f"{name:38s} jobs={len(jobs):3d} stages={n_stages:4d} "
            f"warm_wall={dt:6.2f}s",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
