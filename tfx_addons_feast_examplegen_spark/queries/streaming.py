"""Structured Streaming entries (ST1).

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import register_tables

from ._shared import (
    _WINDOWED_EVENTS_ORACLE,
)



def _q_sessionization_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The stateful applyInPandasWithState sessionizer, driven to
    # completion over time-sliced micro-batches — ORACLE-CHECKED via the
    # sentinel-watermark technique: a final one-event micro-batch (user
    # -1, ts = max + 4h) advances the watermark past every real
    # session's (end + gap), so the no-data batch that follows finalizes
    # ALL sessions and bounded replay equals batch sessionization
    # exactly. The sentinel's own session stays pending (its end + gap
    # is above the final watermark) and is filtered defensively.
    import os as _os
    import tempfile
    import time as _time

    from pyspark.sql import functions as F2

    from ..session import load_table
    from ..streaming.events import read_events_stream, run_to_completion
    from ..streaming.sessions import sessionize_stream

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="sessionize_stream_") + "/ev"
    mid = "2024-01-16 00:00:00"
    sentinel = (
        ev.orderBy(F2.desc("ts"))
        .limit(1)
        .select(
            *[
                (F2.col("ts") + F2.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F2.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F2.col(c)
                for c in ev.columns
            ]
        )
    )
    slices = [
        ev.filter(F2.col("ts") < mid),
        ev.filter(F2.col("ts") >= mid),
        sentinel,
    ]
    # The file stream orders batches by mtime; stamp each slice's files
    # with explicit increasing mtimes instead of sleeping between writes.
    base = _time.time() - 60
    stamped: set[str] = set()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        for fname in _os.listdir(src):
            p = _os.path.join(src, fname)
            if p not in stamped:
                _os.utime(p, (base + 10 * i, base + 10 * i))
                stamped.add(p)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 hour"),
        query_name="q_sessionization_streaming",
    )
    return out.filter(F2.col("user_id") >= 0).select(
        "user_id",
        F2.unix_timestamp("session_start").alias("session_start_ts"),
        F2.unix_timestamp("session_end").alias("session_end_ts"),
        "n_events",
    )


def _q_stream_quota_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Third custom stateful operator: bounded-state windowed admission
    # quota — admit the 3 earliest events per (event_type, day) by
    # (ts, event_id), late data included, state capped at quota entries
    # per open window (streaming/quota.py). Same sentinel-watermark
    # full-replay technique as the streaming sessionizer: a far-future
    # sentinel advances the watermark past every real window end, so
    # bounded replay finalizes every window and equals the batch
    # ROW_NUMBER spelling exactly.
    import os as _os
    import tempfile
    import time as _time

    from ..session import load_table
    from ..streaming.events import read_events_stream, run_to_completion
    from ..streaming.quota import quota_gate_stream

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="quota_stream_") + "/ev"
    mid = "2024-01-16 00:00:00"
    sentinel = (
        ev.orderBy(F.desc("ts"))
        .limit(1)
        .select(
            *[
                (F.col("ts") + F.expr("INTERVAL 4 DAYS")).alias("ts")
                if c == "ts"
                else F.lit("__sentinel").alias(c)
                if c == "event_type"
                else F.lit(-1).cast("long").alias(c)
                if c == "event_id"
                else F.col(c)
                for c in ev.columns
            ]
        )
    )
    slices = [
        ev.filter(F.col("ts") < mid),
        ev.filter(F.col("ts") >= mid),
        sentinel,
    ]
    base = _time.time() - 60
    stamped: set[str] = set()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        for fname in _os.listdir(src):
            pth = _os.path.join(src, fname)
            if pth not in stamped:
                _os.utime(pth, (base + 10 * i, base + 10 * i))
                stamped.add(pth)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        quota_gate_stream(stream, quota=3, window="1 day"),
        query_name="q_stream_quota_gate",
    )
    return out.filter(F.col("event_type") != "__sentinel").select(
        "event_type",
        F.unix_timestamp("window_start").alias("window_start_ts"),
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("admit_rank").cast("int").alias("admit_rank"),
    )


# Batch replay of the admission rule: the quota gate's output must be
# byte-equal to the ROW_NUMBER spelling over the full event set.
_STREAM_QUOTA_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('day', ts) AS w, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS admit_rank
  FROM events
)
SELECT event_type,
       CAST(epoch(w) AS BIGINT) AS window_start_ts,
       event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
       CAST(admit_rank AS INT) AS admit_rank
FROM ranked WHERE admit_rank <= 3
"""


def _q_stream_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second custom stateful operator (CEP-lite pattern matching): each
    # 'error' event matches its EARLIEST 'purchase' within 30 min, or
    # reports recovered=false once the deadline passes the watermark.
    # Same sentinel-watermark full-replay technique as the streaming
    # sessionizer: a far-future sentinel event advances the watermark
    # past every real deadline, so bounded replay finalizes everything
    # and equals the batch per-error min-purchase lookup exactly.
    import os as _os
    import tempfile
    import time as _time

    from ..session import load_table
    from ..streaming.events import read_events_stream, run_to_completion
    from ..streaming.patterns import match_recovery_stream

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="recovery_stream_") + "/ev"
    mid = "2024-01-16 00:00:00"
    sentinel = (
        ev.orderBy(F.desc("ts"))
        .limit(1)
        .select(
            *[
                (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F.col(c)
                for c in ev.columns
            ]
        )
    )
    slices = [
        ev.filter(F.col("ts") < mid),
        ev.filter(F.col("ts") >= mid),
        sentinel,
    ]
    base = _time.time() - 60
    stamped: set[str] = set()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        for fname in _os.listdir(src):
            p = _os.path.join(src, fname)
            if p not in stamped:
                _os.utime(p, (base + 10 * i, base + 10 * i))
                stamped.add(p)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        match_recovery_stream(
            stream, timeout_seconds=1800, watermark_delay="1 hour"
        ),
        query_name="q_stream_error_recovery",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.unix_micros("error_ts").alias("error_us"),
        F.unix_micros("recovery_ts").alias("recovery_us"),
        "recovered",
    )


_STREAM_RECOVERY_ORACLE = """
WITH err AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
),
pur AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id,
       epoch_us(e.ts) AS error_us,
       epoch_us(min(p.pts)) AS recovery_us,
       min(p.pts) IS NOT NULL AS recovered
FROM err e LEFT JOIN pur p
  ON p.user_id = e.user_id
 AND p.pts > e.ts
 AND epoch_us(p.pts) <= epoch_us(e.ts) + 1800000000
GROUP BY e.user_id, e.ts
"""


_SESSIONIZATION_STREAM_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_ts,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


def _q_windowed_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming path made hash-checkable: a tumbling-window aggregate
    # run as a real Structured Streaming query (file source, availableNow)
    # in COMPLETE output mode — over bounded input the final state equals
    # the batch aggregation bit-for-bit, so the SAME daily-counts oracle
    # applies. (Append-mode queries stay rows-only: their emission set
    # depends on the final watermark.)
    import os as _os
    import uuid as _uuid

    from ..streaming.events import (
        read_events_stream,
        run_to_completion,
        windowed_event_counts,
    )

    register_tables(spark, sf_dir)
    stream = read_events_stream(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    out = run_to_completion(
        windowed_event_counts(stream, watermark_delay="1 hour"),
        output_mode="complete",
        query_name=f"wec_stream_{_uuid.uuid4().hex[:8]}",
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_ts"),
        "event_type",
        "n_events",
        "total_value",
    )


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming exactly-once dedup (dropDuplicatesWithinWatermark) made
    # hash-checkable: the event stream is UNIONED WITH ITSELF so every
    # row arrives exactly twice, then deduped on event_id inside the
    # streaming query. The injected duplicates are bit-identical rows, so
    # which copy survives is irrelevant (no arrival-order sensitivity),
    # and a post-dedup aggregate equals the plain batch aggregate — while
    # a dedup failure would double every count. Append mode: dedup emits
    # each first-seen row immediately, so bounded replay is complete
    # without sentinel tricks.
    import os as _os
    import uuid as _uuid

    from ..streaming.events import (
        dedup_events_stream,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    path = _os.path.join(sf_dir, "events.parquet")
    doubled = read_events_stream(spark, path).union(
        read_events_stream(spark, path)
    )
    deduped = dedup_events_stream(doubled, watermark_delay="1 hour")
    out = run_to_completion(
        deduped,
        output_mode="append",
        query_name=f"dedup_stream_{_uuid.uuid4().hex[:8]}",
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(cents).cast("double") / 100.0, 2).alias("total_value"),
    )


def _q_streaming_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming materialized-view maintenance: the event stream arrives
    # as micro-batches (4-file source, one file per trigger) and each
    # batch folds into a versioned parquet serving table via
    # latest-wins merge — union(previous state, batch) -> one row per
    # user, newest (ts, event_id) wins. The fold is ORDER-INDEPENDENT
    # (max is associative/commutative over batches), so the final state
    # equals the batch latest-per-user answer no matter how the file
    # source slices or orders the input — which is the property that
    # makes the pattern safe under redelivery. Full oracle: plain
    # latest-per-user SQL over the whole table.
    import os as _os
    import tempfile as _tempfile

    t = register_tables(spark, sf_dir)
    src = _tempfile.mkdtemp(prefix="mv_src_")
    t["events"].select(
        "user_id", "ts", "value", "event_id"
    ).repartition(4).write.mode("overwrite").parquet(src)
    state_root = _tempfile.mkdtemp(prefix="mv_state_")
    versions: list[str] = []

    def _fold(batch_df, batch_id):
        latest_b = (
            batch_df.groupBy("user_id")
            .agg(
                F.max(F.struct("ts", "event_id", "value")).alias("s")
            )
            .select("user_id", "s.ts", "s.event_id", "s.value")
        )
        merged = latest_b
        if versions:
            prev = batch_df.sparkSession.read.parquet(versions[-1])
            merged = (
                prev.unionByName(latest_b)
                .groupBy("user_id")
                .agg(
                    F.max(F.struct("ts", "event_id", "value")).alias("s")
                )
                .select("user_id", "s.ts", "s.event_id", "s.value")
            )
        out = _os.path.join(state_root, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        versions.append(out)

    q = (
        spark.readStream.schema("user_id long, ts timestamp, value double,"
                                " event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_fold)
        .option(
            "checkpointLocation", _os.path.join(state_root, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(versions[-1])
    return final.select(
        "user_id",
        F.col("ts").alias("state_ts"),
        "event_id",
        F.round("value", 2).alias("value"),
    )


_STREAMING_MATVIEW_ORACLE = """
SELECT user_id, ts AS state_ts, event_id, round(value, 2) AS value
FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


_STREAM_DEDUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS total_value
FROM events GROUP BY event_type
"""


def _q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Left-outer stream-stream join: purchases with NO qualifying click
    # emit null click columns — but only once the watermark proves no
    # match can still arrive. Sentinel rows on BOTH sides (user -1,
    # ts = max + 4h, one per event_type so each survives its side's
    # filter) push the final watermark past every join window, so
    # bounded replay equals the batch LEFT JOIN exactly.
    import os as _os
    import tempfile as _tempfile

    from ..session import load_table
    from ..streaming.events import (
        interval_join_streams,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    sentinels = (
        ev.orderBy(F.desc("ts"))
        .limit(1)
        .crossJoin(
            spark.createDataFrame(
                [("purchase",), ("click",)], "sentinel_type string"
            )
        )
        .select(
            *[
                (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F.col("sentinel_type").alias(c)
                if c == "event_type"
                else F.col(c)
                for c in ev.columns
            ]
        )
    )
    src = _tempfile.mkdtemp(prefix="ssj_left_") + "/ev"
    ev.unionByName(sentinels).coalesce(2).write.parquet(src)
    purchases = read_events_stream(spark, src).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, src).filter(
        F.col("event_type") == "click"
    )
    out = run_to_completion(
        interval_join_streams(
            purchases, clicks, lookback="1 hour", how="left_outer"
        ),
        query_name=f"ssjl_{_os.path.basename(src) or 'q'}",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.unix_timestamp("l_ts").alias("purchase_ts"),
        F.unix_timestamp("r_ts").alias("click_ts"),
        F.round("l_value", 2).alias("purchase_value"),
    )


def _q_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-static join: each micro-batch of events enriched with the
    # customer dimension (joined per batch, no watermark/state — the
    # static side is fixed for the query's lifetime). Bounded replay is
    # trivially the batch join, which the oracle runs.
    import os as _os
    import uuid as _uuid

    from ..streaming.events import (
        enrich_stream_with_dim,
        read_events_stream,
        run_to_completion,
    )

    t = register_tables(spark, sf_dir)
    stream = read_events_stream(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    enriched = enrich_stream_with_dim(
        stream,
        t["customer"],
        stream_key="user_id",
        dim_key="c_custkey",
        dim_cols=["c_mktsegment", "c_nationkey"],
        how="inner",
    )
    out = run_to_completion(
        enriched, query_name=f"enrich_{_uuid.uuid4().hex[:8]}"
    )
    return (
        out.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_STREAM_STATIC_ENRICH_ORACLE = """
SELECT c.c_mktsegment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment, e.event_type
"""


_STREAM_STREAM_LEFT_JOIN_ORACLE = """
SELECT a.user_id,
       a.event_id AS purchase_id,
       b.event_id AS click_id,
       CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(b.ts)) AS BIGINT) AS click_ts,
       round(a.value, 2) AS purchase_value
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.event_type = 'click'
 AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
WHERE a.event_type = 'purchase'
"""


def _q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-stream interval join run as a real Structured Streaming
    # query: purchases attributed to same-user clicks within the
    # preceding hour. Inner-join matches emit independently of the final
    # watermark (it only gates state eviction), so bounded-input replay
    # equals the batch interval join and the SQL oracle applies.
    import os as _os
    import uuid as _uuid

    from ..streaming.events import (
        interval_join_streams,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    path = _os.path.join(sf_dir, "events.parquet")
    purchases = read_events_stream(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, path).filter(
        F.col("event_type") == "click"
    )
    out = run_to_completion(
        interval_join_streams(purchases, clicks, lookback="1 hour"),
        query_name=f"ssj_{_uuid.uuid4().hex[:8]}",
    )
    return out.select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.unix_timestamp("l_ts").alias("purchase_ts"),
        F.unix_timestamp("r_ts").alias("click_ts"),
        F.round("l_value", 2).alias("purchase_value"),
    )


_STREAM_STREAM_JOIN_ORACLE = """
SELECT a.user_id,
       a.event_id AS purchase_id,
       b.event_id AS click_id,
       CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(b.ts)) AS BIGINT) AS click_ts,
       round(a.value, 2) AS purchase_value
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
WHERE a.event_type = 'purchase' AND b.event_type = 'click'
"""



def _q_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming INGEST NEAR-DUP GATE: arriving documents are checked
    # against a standing-corpus SimHash band index with zero streaming
    # state - a per-row SimHash projection (no explode->groupBy, which
    # Structured Streaming would reject without stateful agg), a band
    # explode, a stream-static equi-join, the exact Hamming predicate.
    # Corpus = doc_id < 400 (indexed in batch); stream = the rest,
    # replayed as a 4-file parquet source. The oracle recomputes BOTH
    # sides' portable SimHash from scratch in SQL and brute-forces the
    # cross pair matrix - banding and streaming must change nothing.
    import tempfile as _tempfile
    import uuid as _uuid

    from ..operators.dedup import (
        _pin,
        neardup_gate_stream,
        simhash_band_index,
    )
    from ..streaming.events import run_to_completion

    t = register_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    # pin the index: the stream-static join re-evaluates the static
    # side's plan EVERY micro-batch — unpinned, each of the 4 replay
    # batches would rebuild the full corpus SimHash aggregation
    index = _pin(
        simhash_band_index(docs.where(F.col("doc_id") < 400), "doc_id", "text")
    )
    src = _tempfile.mkdtemp(prefix="neardup_src_")
    new_docs = docs.where(F.col("doc_id") >= 400)
    new_docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(new_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    gated = neardup_gate_stream(
        stream, index, id_col="doc_id", text_col="text", max_hamming=3
    )
    out = run_to_completion(
        gated, query_name=f"neardup_gate_{_uuid.uuid4().hex[:8]}"
    )
    # a pair sharing several bands duplicates across the stateless
    # stream output; dedup in the post-replay batch frame
    return out.select(
        F.col("doc_id").alias("new_doc"), F.col("corpus_id"), "hamming"
    ).distinct()


def _stream_neardup_oracle() -> str:
    # reuses the SAME portable-SimHash CTE generator as the batch pair
    # oracle (queries/dedup.py:_simhash_sh_cte) — one derivation, two
    # final SELECTs, so the hash arithmetic cannot silently diverge
    from .dedup import _simhash_sh_cte

    return f"""
{_simhash_sh_cte()}
SELECT b.doc_id AS new_doc, a.doc_id AS corpus_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < 400 AND b.doc_id >= 400
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""




def _q_stream_semantic_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming SEMANTIC ingest gate: arriving EMBEDDINGS are checked
    # against a standing-corpus IVF cell index with zero streaming
    # state — per-row cell assignment (narrow projection + explode),
    # stream-static equi-join on cell, exact cosine predicate. The
    # embedding edition of stream_neardup_gate, closing the semdedup
    # ingest loop (batch semantic_dedup curates, this gate holds the
    # live ingest against the curated corpus). Corpus = vec_id < 300
    # (indexed in batch with a quantizer trained on the corpus only);
    # stream = the rest, replayed as a 4-file parquet source, with
    # vec_id % 10 == 7 rows planted as EXACT copies of corpus vector
    # (vec_id % 300). Threshold 0.95 sits far above the fixture's
    # natural cross-pair cosine (~0.5), so the matches are exactly the
    # planted pairs — which co-assign by purity of the assignment —
    # and the oracle can replay the full cross cosine matrix in SQL:
    # IVF probing and streaming must change nothing.
    import tempfile as _tempfile
    import uuid as _uuid

    from ..operators.dedup import _pin
    from ..operators.semdedup import (
        semantic_cell_index,
        semantic_gate_stream,
    )
    from ..operators.similarity import ivf_centroids
    from ..streaming.events import run_to_completion

    t = register_tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", "embedding")
    corpus = emb.where(F.col("vec_id") < 300)
    base = corpus.select(
        F.col("vec_id").alias("__b"), F.col("embedding").alias("__bv")
    )
    arriving = (
        emb.where(F.col("vec_id") >= 300)
        .join(base, F.col("vec_id") % 300 == F.col("__b"), "left")
        .select(
            "vec_id",
            F.when(F.col("vec_id") % 10 == 7, F.col("__bv"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    )
    cents = ivf_centroids(
        corpus, n_cells=16, seed=42, refine_iters=1
    )
    # pin the index: the stream-static join re-evaluates the static
    # side every micro-batch — unpinned, each of the 4 replay batches
    # would re-run the corpus assignment scan
    index = _pin(semantic_cell_index(corpus, cents))
    src = _tempfile.mkdtemp(prefix="semgate_src_")
    arriving.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    gated = semantic_gate_stream(
        stream, index, cents, threshold=0.95, n_probe=2
    )
    out = run_to_completion(
        gated, query_name=f"semantic_gate_{_uuid.uuid4().hex[:8]}"
    )
    return out.select(
        F.col("vec_id").alias("new_vec"), "corpus_id", "cos"
    ).distinct()


_STREAM_SEMANTIC_GATE_ORACLE = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
corpus AS (SELECT * FROM base WHERE vec_id < 300),
arriving AS (
  SELECT a.vec_id,
         CASE WHEN a.vec_id % 10 = 7 THEN c.v ELSE a.v END AS v
  FROM base a LEFT JOIN corpus c ON c.vec_id = a.vec_id % 300
  WHERE a.vec_id >= 300
)
SELECT a.vec_id AS new_vec, c.vec_id AS corpus_id,
       round(list_cosine_similarity(a.v, c.v), 4) AS cos
FROM arriving a JOIN corpus c
  ON list_cosine_similarity(a.v, c.v) >= 0.95
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "windowed_event_counts_streaming": (
        _q_windowed_streaming,
        _WINDOWED_EVENTS_ORACLE,  # complete-mode stream ≡ batch aggregate
    ),
    "stream_stream_join": (_q_stream_stream_join, _STREAM_STREAM_JOIN_ORACLE),
    "stream_stream_left_join": (
        _q_stream_stream_left_join,
        _STREAM_STREAM_LEFT_JOIN_ORACLE,
    ),
    "stream_static_enrichment": (
        _q_stream_static_enrichment,
        _STREAM_STATIC_ENRICH_ORACLE,
    ),
    "stream_neardup_gate": (
        _q_stream_neardup_gate,
        _stream_neardup_oracle(),
    ),
    "stream_semantic_gate": (
        _q_stream_semantic_gate,
        _STREAM_SEMANTIC_GATE_ORACLE,
    ),
    "streaming_matview_latest": (
        _q_streaming_matview,
        _STREAMING_MATVIEW_ORACLE,
    ),
    "stream_error_recovery": (
        _q_stream_error_recovery,
        _STREAM_RECOVERY_ORACLE,
    ),
    "stream_dedup": (_q_stream_dedup, _STREAM_DEDUP_ORACLE),
    "stream_quota_gate": (
        _q_stream_quota_gate,
        _STREAM_QUOTA_ORACLE,  # sentinel-watermark full replay
    ),
    "sessionization_streaming": (
        _q_sessionization_streaming,
        _SESSIONIZATION_STREAM_ORACLE,  # sentinel-watermark full replay
    ),
}
