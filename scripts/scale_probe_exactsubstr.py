"""Deep scale probe for exact-substring dedup (Lee et al. ExactSubstr).

`shared_run_pairs` — positional seed-grams, capped gram-key self-join,
islands-and-gaps run assembly — at 1x and 10x the sf0.1 documents
table. Methodology of the other round-8 probes: per-copy disjoint
vocabulary (scale_docs) so each copy reproduces sf0.1's gram-bucket
distribution over a disjoint gram space (the linear-scaling regime —
cross-copy collisions would be a fixture artifact, not an operator
property), multi-file materialized parquet at both scales.

Usage: python scripts/scale_probe_exactsubstr.py [k]

Measured (local[32], 2026-08-14, round 8):

  scale  docs     pairs  shared_run_pairs wall
  1x     5,000      256   2.0 s
  10x    50,000   2,560   5.9 s   (2.9x for 10x data)

Pairs scale exactly 10x (per-copy duplicate structure), wall
sublinearly: the gram self-join is bucket-bounded and the run
assembly windows only matched grams. No quadratic term.
"""

import sys, time, tempfile
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from scale_soak_sf1 import scale_docs
from tfx_addons_feast_examplegen_spark.operators import dedup as dd
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables

spark = get_spark("exactsubstr-scale")
t = register_tables(spark, "/root/testdata/sf0.1")
docs = t["documents"]
for scale in (1, int(sys.argv[1]) if len(sys.argv) > 1 else 10):
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(32, min(32 * scale, 512)))
    )
    dc = docs if scale == 1 else scale_docs(spark, docs, scale)
    base = tempfile.mkdtemp(prefix=f"es{scale}x_")
    nfiles = max(64, min(scale * 8, 512))
    dc.repartition(nfiles).write.mode("overwrite").parquet(f"{base}/dc")
    dc = spark.read.parquet(f"{base}/dc")
    n = dc.count()
    best = float("inf")
    pairs = None
    for _ in range(2):
        t0 = time.time()
        out = dd.shared_run_pairs(
            dc, "doc_id", "text", seed_n=5, min_run=8, on_over_cap="error"
        )
        pairs = out.count()
        best = min(best, time.time() - t0)
    print(
        f"RESULT scale={scale}x docs={n} pairs={pairs} "
        f"shared_run_pairs={best:.2f}s",
        flush=True,
    )
