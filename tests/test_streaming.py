"""Structured Streaming: windowed aggs, stream dedup, latest-state upserts.

Driven with the file source + availableNow trigger so streaming plans run
to completion; results cross-checked against the equivalent batch plans
over the same parquet.
"""

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.session import load_table
from tfx_addons_feast_examplegen_spark.streaming.events import (
    dedup_events_stream,
    latest_feature_state,
    read_events_stream,
    run_to_completion,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_stream_matches_batch_windowed_counts(spark, sf_dir, events_path):
    stream = read_events_stream(spark, events_path)
    out = run_to_completion(
        windowed_event_counts(stream), query_name="win_counts"
    )
    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.groupBy(
            F.window("ts", "1 day").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in expected.collect()
    }
    # Append mode only emits windows the watermark has closed: the final
    # day's window stays open (watermark trails max event time), so the
    # stream result is the batch result minus the last open window.
    last_open = max(k[0] for k in want)
    closed_want = {k: v for k, v in want.items() if k[0] < last_open}
    assert got == closed_want
    assert all(k[0] == last_open for k in want.keys() - got.keys())
    assert len(got) > 100  # ~29 closed days x 5 event types


def test_stream_dedup_drops_duplicate_ids(spark, events_path, tmp_path):
    # Duplicate the input file so every event_id appears twice.
    src = str(tmp_path / "dup_events")
    spark.read.parquet(events_path).write.mode("overwrite").parquet(src)
    spark.read.parquet(events_path).write.mode("append").parquet(src)

    stream = read_events_stream(spark, src)
    out = run_to_completion(
        dedup_events_stream(stream, watermark_delay="40 days"),
        query_name="dedup_stream",
    )
    n_unique = spark.read.parquet(events_path).count()
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique


def test_latest_state_matches_batch_asof_now(spark, sf_dir, events_path):
    stream = read_events_stream(spark, events_path)
    out = run_to_completion(
        latest_feature_state(stream),
        output_mode="complete",
        query_name="latest_state",
    )
    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.groupBy("user_id")
        .agg(
            F.max_by(F.struct("value", "event_type"), F.struct("ts", "event_id")).alias("l"),
            F.max("ts").alias("latest_ts"),
        )
        .select("user_id", F.col("l.value").alias("value"), "latest_ts")
    )
    got = {r.user_id: (r.value, r.latest_ts) for r in out.collect()}
    want = {r.user_id: (r.value, r.latest_ts) for r in expected.collect()}
    assert got == want
    assert len(got) > 0


def test_stream_to_tfrecords(spark, events_path, tmp_path):
    import glob

    from tfx_addons_feast_examplegen_spark.functions.tfexample import (
        decode_example,
    )
    from tfx_addons_feast_examplegen_spark.sources.tfrecord import read_tfrecords
    from tfx_addons_feast_examplegen_spark.streaming.events import (
        stream_examples_to_tfrecords,
    )

    stream = read_events_stream(spark, events_path).select(
        "event_id", "user_id", "value", "event_type"
    )
    out = str(tmp_path / "stream_examples")
    stream_examples_to_tfrecords(
        stream, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    files = glob.glob(f"{out}/Split-*/*.tfrecord.gz")
    assert files
    n = sum(1 for f in files for _ in read_tfrecords(f))
    assert n == spark.read.parquet(events_path).count()
    ex = decode_example(next(read_tfrecords(files[0])))
    assert set(ex) == {"event_id", "user_id", "value", "event_type"}


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_path):
    from tfx_addons_feast_examplegen_spark.streaming.events import (
        interval_join_streams,
    )

    purchases = read_events_stream(spark, events_path).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, events_path).filter(
        F.col("event_type") == "click"
    )
    out = run_to_completion(
        interval_join_streams(purchases, clicks, lookback="1 hour"),
        query_name="ssj_test",
    )
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    expected = p.join(
        c,
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c.ts") <= F.col("p.ts")),
    ).select(
        F.col("p.event_id").alias("l_event_id"),
        F.col("c.event_id").alias("r_event_id"),
    )
    got = {(r.l_event_id, r.r_event_id) for r in out.collect()}
    want = {(r.l_event_id, r.r_event_id) for r in expected.collect()}
    assert got == want and len(want) > 0


def test_interval_join_rejects_unknown_how(spark, events_path):
    import pytest

    from tfx_addons_feast_examplegen_spark.streaming.events import (
        interval_join_streams,
    )

    s = read_events_stream(spark, events_path)
    with pytest.raises(ValueError, match="inner"):
        interval_join_streams(s, s, how="full_outer")


def test_stream_to_tfrecords_multibatch_no_loss_and_idempotent(
    spark, tmp_path
):
    # Review finding (r6): the per-batch sink previously called the
    # overwrite-mode writer, so every micro-batch WIPED the previous
    # batches' Split-* output — silent data loss masked by the
    # single-batch default in the other test. Force multiple
    # micro-batches and assert (a) all rows survive, (b) replaying a
    # batch's write with the same prefix replaces rather than
    # duplicates its shards.
    import glob

    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.split import hash_split
    from tfx_addons_feast_examplegen_spark.sources.examplegen import (
        encode_examples,
    )
    from tfx_addons_feast_examplegen_spark.sources.tfrecord import (
        read_tfrecords,
        write_partitioned_tfrecords,
    )
    from tfx_addons_feast_examplegen_spark.streaming.events import (
        read_events_stream,
        stream_examples_to_tfrecords,
    )

    src = str(tmp_path / "ev")
    rows = [
        Row(event_id=i, user_id=i % 5, value=float(i), event_type="view")
        for i in range(40)
    ]
    # three files -> three micro-batches at maxFilesPerTrigger=1
    for lo, hi in ((0, 15), (15, 30), (30, 40)):
        spark.createDataFrame(
            rows[lo:hi],
            "event_id long, user_id long, value double, event_type string",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = read_events_stream(spark, src, max_files_per_trigger=1).select(
        "event_id", "user_id", "value", "event_type"
    )
    out = str(tmp_path / "sink")
    stream_examples_to_tfrecords(
        stream, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    files = glob.glob(f"{out}/Split-*/*.tfrecord.gz")
    prefixes = {f.split("/")[-1].split("-")[1] for f in files}
    assert len(prefixes) >= 2, prefixes  # multiple batches present
    n = sum(1 for f in files for _ in read_tfrecords(f))
    assert n == 40  # every batch's rows survived

    # idempotent replay: re-write "batch 0" with the same prefix
    replay = spark.createDataFrame(
        rows[0:15],
        "event_id long, user_id long, value double, event_type string",
    )
    encoded = hash_split(encode_examples(replay), ["example"])
    write_partitioned_tfrecords(
        encoded, out, bytes_col="example", split_col="split",
        mode="append", file_prefix="part-b000000",
    )
    files2 = glob.glob(f"{out}/Split-*/*.tfrecord.gz")
    n2 = sum(1 for f in files2 for _ in read_tfrecords(f))
    assert n2 == 40  # replaced its own shards, duplicated nothing
