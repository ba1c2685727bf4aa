"""Deep scale probe for the stateful streaming sessionizer.

`sessionize_stream` (applyInPandasWithState, per-user buffered event
times, watermark-gated finalization) driven over time-sliced
micro-batches at 1x and 10x the sf0.1 events table. Copies get
DISJOINT user spaces (scale_events), so 10x data also means 10x state
cardinality — this probes the state store and the per-batch
applyInPandasWithState exchange, not just row throughput. Both scales
run the same number of micro-batches (6 time slices + watermark-flush
sentinel), so per-batch volume scales 10x. Durable parquet sink +
checkpoint (the production shape), not the in-memory test sink.

Usage: python scripts/scale_probe_streaming.py [k]

Measured (local[32], quiet host, 2026-08-14, round 8):

  scale  events     state keys  sessions   wall
  1x     100,001    ~3,000      95,465     17.9 s
  10x    1,000,001  ~30,000     954,650    28.5 s  (1.6x for 10x)

Sublinear: the 7-micro-batch harness is trigger-overhead-bound at 1x;
state growth (10x keys, 10x buffered times) adds only ~60% wall. The
sentinel flush emits exactly 10x the sessions — state finalization
keeps up with cardinality.
"""

import os, sys, time, tempfile
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from pyspark.sql import functions as F
from scale_soak_sf1 import scale_events
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables
from tfx_addons_feast_examplegen_spark.streaming.events import read_events_stream
from tfx_addons_feast_examplegen_spark.streaming.sessions import sessionize_stream

N_SLICES = 6

spark = get_spark("sessionize-scale")
t = register_tables(spark, "/root/testdata/sf0.1")
events = t["events"]
for scale in (1, int(sys.argv[1]) if len(sys.argv) > 1 else 10):
    ev = events if scale == 1 else scale_events(spark, events, scale)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    sentinel = (
        ev.orderBy(F.desc("ts")).limit(1)
        .select(*[
            (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts")
            if c == "ts" else F.lit(-1).cast("long").alias(c)
            if c == "user_id" else F.col(c)
            for c in ev.columns
        ])
    )
    span = (hi - lo) / N_SLICES
    src = tempfile.mkdtemp(prefix=f"sess{scale}x_") + "/ev"
    base_t = time.time() - 120
    stamped: set[str] = set()
    cuts = [lo + span * i for i in range(1, N_SLICES)]
    bounds = [(None, cuts[0])] + list(zip(cuts, cuts[1:])) + [(cuts[-1], None)]
    slices = [
        ev.filter(
            (F.lit(True) if a is None else (F.col("ts") >= a))
            & (F.lit(True) if b is None else (F.col("ts") < b))
        )
        for a, b in bounds
    ] + [sentinel]
    # 8 files per slice at BOTH scales + maxFilesPerTrigger=8: the same
    # 7 micro-batches everywhere (sentinel lands alone in the last one),
    # per-batch volume scaling 10x, per-batch read parallelism fixed.
    for i, sl in enumerate(slices):
        nf = 1 if i == len(slices) - 1 else 8
        sl.repartition(nf).write.mode("append").parquet(src)
        for fname in os.listdir(src):
            p = os.path.join(src, fname)
            if p not in stamped:
                os.utime(p, (base_t + 10 * i, base_t + 10 * i))
                stamped.add(p)
    n = spark.read.parquet(src).count()
    out = tempfile.mkdtemp(prefix=f"sess{scale}x_out_")
    ckpt = tempfile.mkdtemp(prefix=f"sess{scale}x_ckpt_")
    stream = read_events_stream(spark, src, max_files_per_trigger=8)
    t0 = time.time()
    q = (
        sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    n_sessions = (
        spark.read.parquet(out).filter(F.col("user_id") >= 0).count()
    )
    print(
        f"RESULT scale={scale}x events={n} sessions={n_sessions} "
        f"wall={wall:.2f}s",
        flush=True,
    )
