"""Deep scale probe for MinHash+LSH near-dup detection (verify=True).

Methodology of scale_probe_pit.py / scale_soak_sf1.py: per-copy
disjoint vocabulary (shingle buckets keep sf0.1's distribution per
copy), multi-file materialized parquet, shuffle partitions scaled.

Usage: python scripts/scale_probe_minhash.py [k]

Measured (local[32], 2026-08-14, round 8):

  scale   docs      minhash_lsh_pairs wall (incl. exact verify)
  1x      5,000      1.9 s
  100x    500,000   15.2 s   (8.2x for 100x data)

Sublinear at two orders of magnitude: banded signatures bucket-join
without any all-pairs term, and the exact-Jaccard verification only
touches LSH candidates. No quadratic term.
"""

import sys, time, tempfile
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from scale_soak_sf1 import scale_docs
from tfx_addons_feast_examplegen_spark.operators import dedup as dd
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables
spark = get_spark("minhash-100x")
t = register_tables(spark, "/root/testdata/sf0.1")
docs = t["documents"]
for scale in (1, int(sys.argv[1]) if len(sys.argv)>1 else 100):
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, min(32*scale, 512))))
    dc = docs if scale==1 else scale_docs(spark, docs, scale)
    base = tempfile.mkdtemp(prefix=f"mh{scale}x_")
    nfiles = max(64, min(scale*8, 512))
    dc.repartition(nfiles).write.mode("overwrite").parquet(f"{base}/dc")
    dc = spark.read.parquet(f"{base}/dc")
    n = dc.count()
    best = float('inf')
    for _ in range(2):
        t0=time.time()
        dd.minhash_lsh_pairs(dc, "doc_id", "text", n=3, threshold=0.5, verify=True
        ).write.mode("overwrite").format("noop").save()
        best=min(best, time.time()-t0)
    print(f"RESULT scale={scale}x docs={n} minhash_lsh={best:.2f}s", flush=True)
