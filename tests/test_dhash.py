"""Image dHash near-dup: bit packing vs a Python re-derivation, planted
pairs through the real BMP decode path, pigeonhole completeness vs
brute force, dimension guard, quarantine policy, parameter validation."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.multimodal import (
    DHASH_H,
    DHASH_W,
    attach_bmp_neardup_payloads,
    encode_bmp_24,
    extract_image_gray,
    image_dhash_bands,
    image_dhash_neardups,
)


def _py_bands(gray: list[int]) -> tuple[int, int, int, int]:
    bands = [0, 0, 0, 0]
    for b in range(64):
        y, c = divmod(b, 8)
        if gray[y * DHASH_W + c] < gray[y * DHASH_W + c + 1]:
            bands[b // 16] |= 1 << (b % 16)
    return tuple(bands)


def _gray_df(spark, rows):
    # rows: list of (doc_id, 72-int gray vector)
    return spark.createDataFrame(
        [(i, DHASH_W, DHASH_H, g) for i, g in rows],
        "doc_id long, width int, height int, gray array<int>",
    )


def test_band_packing_matches_python_rederivation(spark):
    rng = random.Random(3)
    rows = [(i, [rng.randint(0, 255) for _ in range(72)]) for i in range(40)]
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in image_dhash_bands(_gray_df(spark, rows)).collect()
    }
    for i, g in rows:
        assert got[i] == _py_bands(g), i


def test_neardups_match_bruteforce_pigeonhole_complete(spark):
    # independent brute force over the SAME band values: every pair
    # within Hamming 3 must be found by the banded join (pigeonhole)
    rng = random.Random(5)
    base = [rng.randint(0, 255) for _ in range(72)]
    rows = []
    for i in range(30):
        g = list(base)
        # perturb i pixels; small i keeps some pairs within distance 3
        for p in rng.sample(range(72), i % 5):
            g[p] = (g[p] + 100) % 256
        rows.append((i, g))
    hs = {i: _py_bands(g) for i, g in rows}
    exp = set()
    for a in range(30):
        for b in range(a + 1, 30):
            d = sum(
                bin(x ^ y).count("1") for x, y in zip(hs[a], hs[b])
            )
            if d <= 3:
                exp.add((a, b, d))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in image_dhash_neardups(
            _gray_df(spark, rows), max_bucket=10_000
        ).collect()
    }
    assert got == exp
    assert exp, "fixture must plant at least one near-dup pair"


def test_planted_pairs_through_real_bmp_decode(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    gray = extract_image_gray(attach_bmp_neardup_payloads(docs))
    pairs = image_dhash_neardups(gray).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(i - 1, i) for i in range(1, 60) if i % 10 == 1}
    assert all(r["hamming"] <= 3 for r in pairs)


def test_gray_decode_matches_md5_closed_form(spark):
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    rows = extract_image_gray(attach_bmp_neardup_payloads(docs)).collect()
    for r in rows:
        did = r["doc_id"]
        dup = did % 10 == 1
        base = did - 1 if dup else did
        exp = [
            int(hashlib.md5(f"{base}-{p}".encode()).hexdigest()[:2], 16)
            for p in range(72)
        ]
        if dup:
            exp[0] = (exp[0] + 96) % 256
            exp[31] = (exp[31] + 96) % 256
        assert (r["width"], r["height"]) == (DHASH_W, DHASH_H)
        assert list(r["gray"]) == exp, did


def test_wrong_dimensions_fail_in_plan(spark):
    bad = spark.createDataFrame(
        [(1, 8, 8, list(range(64)))],
        "doc_id long, width int, height int, gray array<int>",
    )
    with pytest.raises(Exception, match="expected 9x8"):
        image_dhash_bands(bad).collect()


def test_quarantine_policies(spark):
    good = encode_bmp_24(DHASH_W, DHASH_H, [(0, 0, 0)] * 72)
    media = spark.createDataFrame(
        [(1, bytearray(good), "image/bmp", 9, 8),
         (2, bytearray(b"NOTANIMAGE"), "image/bmp", 9, 8)],
        "doc_id long, payload binary, format string, width int, height int",
    )
    with pytest.raises(Exception, match="unrecognized image payload"):
        extract_image_gray(media, on_error="error").collect()
    nulls = extract_image_gray(media, on_error="null").collect()
    assert {r["doc_id"]: r["gray"] is None for r in nulls} == {1: False, 2: True}
    kept = extract_image_gray(media, on_error="skip").collect()
    assert [r["doc_id"] for r in kept] == [1]
    with pytest.raises(ValueError):
        extract_image_gray(media, on_error="quietly")


def test_max_hamming_validation(spark):
    df = _gray_df(spark, [(1, list(range(72)))])
    with pytest.raises(ValueError, match="max_hamming"):
        image_dhash_neardups(df, max_hamming=4)


def test_multimodal_corpus_prep_planted_verdicts(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.queries.multimodal import (
        _q_multimodal_corpus_prep,
    )

    rows = {r["doc_id"]: r for r in _q_multimodal_corpus_prep(spark, sf_dir).collect()}
    assert rows, "capstone returned nothing"
    for did, r in rows.items():
        assert r["image_dup"] == (did % 10 == 1), did
        assert r["audio_dup"] == (did % 10 == 1), did
        # text dups planted at %10==5 (neighbor copy exists unless the
        # neighbor id is absent from the fixture)
        if did % 10 == 5 and (did - 1) in rows:
            assert r["text_dup"] is True, did
        if did % 10 not in (1, 5):
            assert r["keep"] is True and r["text_dup"] is False, did
        assert r["keep"] == (
            not (r["text_dup"] or r["image_dup"] or r["audio_dup"])
        ), did


def test_arbitrary_size_images_resize_then_dhash(spark):
    # the production path for real corpora: varied-size images resample
    # to the canonical 9x8 frame via resize_images, then hash — the
    # whole chain through real encode/decode passes, no special-casing
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        attach_bmp_payloads,
        resize_images,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    media = resize_images(  # fixture sizes vary 4..16 x 4..14
        attach_bmp_payloads(docs), target_width=DHASH_W, target_height=DHASH_H
    )
    bands = image_dhash_bands(extract_image_gray(media)).collect()
    assert len(bands) == 24
    # resized content is deterministic: same doc twice -> same hash
    again = image_dhash_bands(extract_image_gray(resize_images(
        attach_bmp_payloads(docs), target_width=DHASH_W,
        target_height=DHASH_H,
    ))).collect()
    key = lambda r: (r["doc_id"], r["b0"], r["b1"], r["b2"], r["b3"])  # noqa: E731
    assert sorted(map(key, bands)) == sorted(map(key, again))


def test_quarantined_null_row_fails_loud_with_readable_message(spark):
    # an on_error='null' survivor reaching the hash stage must fail
    # with the quarantine hint, not assert_true's null-message crash
    df = spark.createDataFrame(
        [(1, None, None, None)],
        "doc_id long, width int, height int, gray array<int>",
    )
    with pytest.raises(Exception, match="quarantined decode row"):
        image_dhash_bands(df).collect()
