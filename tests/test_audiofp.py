"""Audio energy-delta fingerprint near-dup: bit packing vs Python
re-derivation, planted pairs through the real WAV decode, short-clip
quarantine, frame guard."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.multimodal import (
    AFP_FRAME_LEN,
    AFP_MIN_SAMPLES,
    AFP_N_FRAMES,
    attach_wav_neardup_payloads,
    audio_fingerprint_bands,
    audio_fingerprint_neardups,
    encode_wav_pcm16,
    extract_audio_frame_energies,
)


def _py_bands(energies):
    bands = [0, 0, 0, 0]
    for b in range(64):
        if energies[b] < energies[b + 1]:
            bands[b // 16] |= 1 << (b % 16)
    return tuple(bands)


def _energy_df(spark, rows):
    return spark.createDataFrame(
        [(i, AFP_N_FRAMES, e) for i, e in rows],
        "doc_id long, n_frames int, energies array<long>",
    )


def test_band_packing_matches_python_rederivation(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.randint(0, 4 * 32768 * 32768) for _ in range(AFP_N_FRAMES)])
        for i in range(25)
    ]
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in audio_fingerprint_bands(_energy_df(spark, rows)).collect()
    }
    for i, e in rows:
        assert got[i] == _py_bands(e), i


def test_planted_pairs_through_real_wav_decode(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    energies = extract_audio_frame_energies(attach_wav_neardup_payloads(docs))
    pairs = audio_fingerprint_neardups(energies).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(i - 1, i) for i in range(1, 60) if i % 10 == 1}
    # a single perturbed sample flips at most the two deltas touching
    # its frame
    assert all(r["hamming"] <= 2 for r in pairs)


def test_energies_match_md5_closed_form(spark):
    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    rows = extract_audio_frame_energies(
        attach_wav_neardup_payloads(docs)
    ).collect()
    for r in rows:
        did = r["doc_id"]
        dup = did % 10 == 1
        base = did - 1 if dup else did
        s = [
            int(hashlib.md5(f"a{base}-{i}".encode()).hexdigest()[:4], 16)
            - 32768
            for i in range(AFP_MIN_SAMPLES)
        ]
        if dup:
            s[30] = ((s[30] + 32768 + 24000) % 65536) - 32768
        exp = [
            sum(
                x * x
                for x in s[f * AFP_FRAME_LEN : (f + 1) * AFP_FRAME_LEN]
            )
            for f in range(AFP_N_FRAMES)
        ]
        assert list(r["energies"]) == exp, did


def test_short_clip_quarantine(spark):
    short = encode_wav_pcm16([0] * 10)
    good = encode_wav_pcm16([100] * AFP_MIN_SAMPLES)
    media = spark.createDataFrame(
        [(1, bytearray(good), "audio/wav", AFP_MIN_SAMPLES),
         (2, bytearray(short), "audio/wav", 10)],
        "doc_id long, payload binary, format string, n_samples int",
    )
    with pytest.raises(Exception, match="too short"):
        extract_audio_frame_energies(media, on_error="error").collect()
    nulls = extract_audio_frame_energies(media, on_error="null").collect()
    assert {r["doc_id"]: r["energies"] is None for r in nulls} == {
        1: False,
        2: True,
    }
    kept = extract_audio_frame_energies(media, on_error="skip").collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_wrong_frame_count_fails_in_plan(spark):
    bad = spark.createDataFrame(
        [(1, 10, list(range(10)))],
        "doc_id long, n_frames int, energies array<long>",
    )
    with pytest.raises(Exception, match="expected 65"):
        audio_fingerprint_bands(bad).collect()


def test_quarantined_null_row_fails_loud_with_readable_message(spark):
    df = spark.createDataFrame(
        [(1, None, None)],
        "doc_id long, n_frames int, energies array<long>",
    )
    with pytest.raises(Exception, match="quarantined decode row"):
        audio_fingerprint_bands(df).collect()
