#!/usr/bin/env python
"""Scale probe: winnowing fingerprint near-dup at 1x vs 10x documents.

Same methodology as scale_soak_sf1.py (per-copy vocabulary so near-dup
structure repeats per copy and never across; synthetic fixture
materialized to multi-file parquet before timing; shuffle partitions
scaled with the data). Checks the 100 TB story: winnow_pairs' wall
grows ~linearly with the corpus because fingerprint selection is
per-document (window over doc id) and the pair stage moves only the
~2/(w+1)-sampled fingerprint frame through the capped bucket join.

Run: python scripts/scale_probe_winnowing.py [scale]
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scale_soak_sf1 import SF_DIR, scale_docs, timeit  # noqa: E402
from tfx_addons_feast_examplegen_spark.operators import dedup as dd  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import (  # noqa: E402
    get_spark,
    register_tables,
)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("winnowing-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = register_tables(spark, SF_DIR)["documents"]

    results = {}
    for scale in (1, k):
        spark.conf.set("spark.sql.shuffle.partitions", str(32 * scale))
        dc = docs if scale == 1 else scale_docs(spark, docs, scale)
        if scale != 1:
            base = tempfile.mkdtemp(prefix="winnow_synth_")
            dc.repartition(64).write.mode("overwrite").parquet(base)
            dc = spark.read.parquet(base)
        dc.write.mode("overwrite").format("noop").save()  # warm the scan
        n = dc.count()
        t0 = time.time()
        pairs = dd.winnow_pairs(
            dc, "doc_id", "text", k=4, w=4, threshold=0.3,
            on_over_cap="error",
        )
        wall = timeit(f"winnow_pairs {scale}x ({n} docs)", pairs)
        results[scale] = (n, wall, pairs.count())
    r1, rk = results[1], results[k]
    print(
        {
            "docs_1x": r1[0], "wall_1x": round(r1[1], 2), "pairs_1x": r1[2],
            f"docs_{k}x": rk[0], f"wall_{k}x": round(rk[1], 2),
            f"pairs_{k}x": rk[2],
            "wall_ratio": round(rk[1] / r1[1], 1),
            "pairs_ratio": round(rk[2] / max(r1[2], 1), 1),
        },
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
