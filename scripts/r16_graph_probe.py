"""Capture IN-LOOP plans for the graph loops (VERDICT r15 item 3).

The committed plans/r15 dumps only show the trivial returned-checkpoint
plan; the open question is whether each round's state merge re-exchanges
the pinned O(|V|) frame (a full-outer SMJ's output partitioning is
Unknown, so the per-round pin may record an unknown layout and every
consumer re-exchanges). This probe wraps ``_pin_aqe`` so every pin's
plan is dumped AT PIN TIME with the loop confs applied — the honest
in-loop plan — and runs one benched query per loop family.

Usage: python scripts/r16_graph_probe.py <out_dir> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from tfx_addons_feast_examplegen_spark import queries as qmod  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators import graph  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:] or ["graph_sssp", "graph_kcore", "graph_pagerank"]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r16_graph_probe")
    qs = qmod.queries()

    real_pin = graph._pin_aqe
    sink: dict[str, list[str]] = {}
    current = {"name": "?"}

    def spy_pin(df, n_parts):
        # CRITICAL: plan the explain under the SAME confs the pin job
        # uses (AQE off, loop partition count). A Dataset's physical
        # plan is computed once and cached — an AQE-on explain here
        # would itself become the checkpointed plan and erase the
        # recorded layout (the exact defect the pins fix), i.e. the
        # probe would contaminate the thing it measures.
        spark_ = df.sparkSession
        prev_aqe = spark_.conf.get("spark.sql.adaptive.enabled")
        prev_sp = spark_.conf.get("spark.sql.shuffle.partitions")
        spark_.conf.set("spark.sql.adaptive.enabled", "false")
        spark_.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        finally:
            spark_.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark_.conf.set("spark.sql.shuffle.partitions", prev_sp)
        sink.setdefault(current["name"], []).append(
            f"=== pin #{len(sink.get(current['name'], []))} "
            f"(n_parts={n_parts}) ===\n" + buf.getvalue()
        )
        return real_pin(df, n_parts)

    graph._pin_aqe = spy_pin
    try:
        for name in names:
            current["name"] = name
            spark.sparkContext.setJobDescription(f"probe:{name}")
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            path = os.path.join(out_dir, f"{name}_inloop.txt")
            with open(path, "w") as f:
                f.write("\n".join(sink.get(name, ["(no pins)"])))
            print(f"{name}: {len(sink.get(name, []))} pins -> {path}")
    finally:
        graph._pin_aqe = real_pin
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
