"""Dump .explain("formatted") for named queries to plans/r15/<name>_<tag>.txt.

Usage: python scripts/r15_plans.py <before|after> [name ...]
With no names, dumps every bench query (headline + extended).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from tfx_addons_feast_examplegen_spark import queries as qmod  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15_plans")
    qs = qmod.queries()
    qs.update(bench.BENCH_IMPLS)
    qs.update(bench.EXTENDED_IMPLS)
    if not names:
        names = bench.HEADLINE + bench.EXTENDED
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
