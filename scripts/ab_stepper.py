"""A/B stepper: serve per-query timed runs of the tree at CWD over a
line protocol, so the parent bench can interleave A,B,A,B per query.

The parent bench (bench.py `_spawn_ab_stepper`) checks the PREVIOUS
round's tree out into a worktree and runs THIS script (from the current
tree — old trees predate it) with ``cwd`` set to that worktree: every
import below therefore resolves against the OLD tree, and the old
tree's own ``bench._run`` execution semantics time each query. Protocol
on stdio, one line each way:

    parent -> child:  <query name>      (or EXIT)
    child  -> parent: T <name> <sec>    (or SKIP <name>)

Interleaving per query at the same instant is what cancels ambient load
drift out of the A/B (VERDICT r14 item 7): tree-at-a-time child runs
measured the machine ten minutes apart, and round 14 burned three full
artifact runs bracketing that noise.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    wt = os.getcwd()
    sys.path.insert(0, wt)
    import bench as oldbench  # the WORKTREE's bench module (cwd first)

    em = __import__("__spark_entry__")
    from tfx_addons_feast_examplegen_spark.session import (
        get_spark,
        register_tables,
    )

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    names = json.loads(os.environ["SPARK_GRAFT_AB_NAMES"])
    spark = get_spark("bench_ab")
    qs = dict(em.queries())
    qs.update(getattr(oldbench, "BENCH_IMPLS", {}))
    qs.update(getattr(oldbench, "EXTENDED_IMPLS", {}))
    run = oldbench._run
    avail = [n for n in names if n in qs]

    # mirror the old bench's warm-up: small scale for plan/JIT warmth,
    # benchmark scale for the index-building extended impls
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    ext_impls = set(getattr(oldbench, "EXTENDED_IMPLS", {}))
    for n in avail:
        run(qs[n](spark, sf_dir if n in ext_impls else warm_dir))
    register_tables(spark, sf_dir)

    print("READY " + json.dumps(avail), flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        if name not in qs:
            print("SKIP " + name, flush=True)
            continue
        t0 = time.time()
        run(qs[name](spark, sf_dir))
        print(f"T {name} {time.time() - t0:.3f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
