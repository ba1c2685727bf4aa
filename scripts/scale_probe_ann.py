"""Deep scale probe for the ANN retrieval family at 100x vectors.

Methodology of scale_probe_pit.py (per-copy epsilon keeps vectors
distinct; multi-file materialized parquet; scaled shuffle partitions).

Usage: python scripts/scale_probe_ann.py [k]

Measured (local[32], 2026-08-14, round 8):

  scale   vectors   lsh_topk   pq_index_build   pq_probe
  1x      2,000      1.8 s        13.4 s          1.5 s
  100x    200,000    9.7 s        24.6 s         11.0 s

Ratios for 100x data: LSH top-k 5.5x (bucketed shortlist, no
all-pairs), PQ build 1.8x (fixed per-Lloyd-iteration job overhead
amortizes), PQ probe 7.5x (codes-only linear ADC scan + id join-back
re-rank). All sublinear; no quadratic term.
"""

import sys, time, tempfile
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from scale_soak_sf1 import scale_embeddings
from tfx_addons_feast_examplegen_spark.operators import similarity as sim
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables
spark = get_spark("ann-100x")
t = register_tables(spark, "/root/testdata/sf0.1")
emb = t["embeddings"]
k = int(sys.argv[1]) if len(sys.argv)>1 else 100
for scale in (1, k):
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, min(32*scale, 256))))
    em = emb if scale==1 else scale_embeddings(spark, emb, scale)
    base = tempfile.mkdtemp(prefix=f"ann{scale}x_")
    em.repartition(64).write.mode("overwrite").parquet(f"{base}/em")
    em = spark.read.parquet(f"{base}/em")
    n = em.count()
    best = float('inf')
    for _ in range(2):
        t0=time.time()
        sim.lsh_topk(em, query_filter="vec_id < 20", k=5).write.mode("overwrite").format("noop").save()
        best=min(best, time.time()-t0)
    idx = tempfile.mkdtemp(prefix=f"pqidx{scale}x_")
    t0=time.time(); sim.pq_write_index(em, idx); build=time.time()-t0
    bestp = float('inf')
    for _ in range(2):
        t0=time.time()
        sim.pq_topk_indexed(em.filter("vec_id < 20"), idx, k=5).write.mode("overwrite").format("noop").save()
        bestp=min(bestp, time.time()-t0)
    print(f"RESULT scale={scale}x vecs={n} lsh_topk={best:.2f}s pq_build={build:.2f}s pq_probe={bestp:.2f}s", flush=True)
