"""Decode-once contract for the multimodal near-dup queries.

The r11 `_pin` fix (`_banded_hamming_pairs`) exists because the capped
pair join consumes the hashed frame up to three times (bucket-size
aggregate + both self-join sides) and each unpinned consumption re-ran
the Arrow-batched Python codec pass — 2-3x the decode cost, invisible
to correctness. These tests make the contract executable: a Spark
accumulator threaded through the decode stage (`decode_counter`) must
read EXACTLY n_rows after a full near-dup query, for both fingerprint
families. A regression that drops the pin (or adds an unpinned
consumer) shows up as counter = 2n or 3n, not as a flaky timing test.
"""

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.multimodal import (
    attach_bmp_neardup_payloads,
    attach_wav_neardup_payloads,
    audio_fingerprint_neardups,
    extract_audio_frame_energies,
    extract_image_gray,
    image_dhash_neardups,
)


def _docs(spark, n, tag):
    # a per-test tag keeps the logical plan unique so dedup._pin's
    # cross-invocation cache reuse cannot satisfy the decode from a
    # previous test's materialization (counter would read 0)
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(tag).alias("tag")
    )


def test_image_dhash_neardup_decodes_each_payload_once(spark):
    n = 60
    acc = spark.sparkContext.accumulator(0)
    gray = extract_image_gray(
        attach_bmp_neardup_payloads(_docs(spark, n, "img-once")),
        decode_counter=acc,
    )
    pairs = image_dhash_neardups(gray).collect()
    assert len(pairs) >= n // 10  # the planted pairs actually surfaced
    assert acc.value == n


def test_audio_fingerprint_neardup_decodes_each_payload_once(spark):
    n = 60
    acc = spark.sparkContext.accumulator(0)
    energies = extract_audio_frame_energies(
        attach_wav_neardup_payloads(_docs(spark, n, "aud-once")),
        decode_counter=acc,
    )
    pairs = audio_fingerprint_neardups(energies).collect()
    assert len(pairs) >= n // 10
    assert acc.value == n


def test_counter_is_optional_and_counts_attempts_not_successes(spark):
    # decode_counter=None stays off the hot path; with a counter, a
    # quarantined (undecodable) payload still counts as one ATTEMPT —
    # the contract counts codec executions, not successes.
    n = 10
    base = attach_bmp_neardup_payloads(_docs(spark, n, "img-attempts"))
    poisoned = base.select(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit(b"\x00\x01notanimage"))
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    acc = spark.sparkContext.accumulator(0)
    out = extract_image_gray(
        poisoned, on_error="skip", decode_counter=acc
    ).collect()
    assert len(out) == n - 1
    assert acc.value == n
