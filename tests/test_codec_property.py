"""Property-based checks for the pure-stdlib codecs and the MERGE
invariant (SURVEY.md §5 property-testing strategy; hypothesis drives
the data generation). Pure-Python properties run without Spark, so
hundreds of examples are cheap; the merge property uses the shared
session over tiny frames.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tfx_addons_feast_examplegen_spark.operators.multimodal import (
    decode_bmp_24_pixels,
    decode_jpeg_gray_pixels,
    decode_png_rgb8_pixels,
    encode_bmp_24,
    encode_jpeg_gray,
    encode_png_rgb8,
)

_dims = st.tuples(
    st.integers(min_value=1, max_value=21),
    st.integers(min_value=1, max_value=19),
)


@settings(max_examples=40, deadline=None)
@given(_dims, st.randoms(use_true_random=False))
def test_png_bmp_roundtrip_lossless_any_image(dims, rng):
    w, h = dims
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    assert decode_png_rgb8_pixels(encode_png_rgb8(w, h, px)) == (w, h, px)
    assert decode_bmp_24_pixels(encode_bmp_24(w, h, px)) == (w, h, px)


@settings(max_examples=25, deadline=None)
@given(_dims, st.randoms(use_true_random=False))
def test_jpeg_roundtrip_bounded_any_image(dims, rng):
    # With the all-ones quantization table the only loss is coefficient
    # rounding: every pixel within +/-2 gray levels, ANY content, ANY
    # (cropped) geometry.
    w, h = dims
    px = [rng.randrange(256) for _ in range(w * h)]
    dw, dh, dec = decode_jpeg_gray_pixels(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h)
    assert len(dec) == w * h
    assert max(abs(a - b) for a, b in zip(dec, px)) <= 2


@settings(max_examples=25, deadline=None)
@given(st.randoms(use_true_random=False))
def test_jpeg_block_constant_exact_any_values(rng):
    # The oracle-entry property as a law: per-block-constant content is
    # BIT-exact for arbitrary block values and block-grid geometry.
    wb, hb = rng.randrange(1, 4), rng.randrange(1, 4)
    w, h = wb * 8, hb * 8
    vals = [rng.randrange(256) for _ in range(wb * hb)]
    px = [
        vals[(y // 8) * wb + (x // 8)] for y in range(h) for x in range(w)
    ]
    assert decode_jpeg_gray_pixels(encode_jpeg_gray(w, h, px)) == (w, h, px)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # key
            st.integers(min_value=0, max_value=9),  # payload v
            st.integers(min_value=0, max_value=9),  # seq
            st.booleans(),  # tombstone
        ),
        min_size=0,
        max_size=12,
    ),
    st.booleans(),  # use seq_col?
)
def test_merge_upsert_one_row_per_key_invariant(spark, batch, use_seq):
    # The MERGE law: whatever the batch (collisions, tombstones, with or
    # without a sequence column), the output holds at most one row per
    # key, and keys untouched by the batch survive unchanged.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.snapshot import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [Row(k=k, v=-k, seq=-1) for k in (1, 2, 3)],
        "k long, v long, seq long",
    )
    if not batch:
        updates = spark.createDataFrame([], "k long, v long, seq long, dead boolean")
    else:
        updates = spark.createDataFrame(
            [Row(k=k, v=v, seq=s, dead=d) for k, v, s, d in batch],
            "k long, v long, seq long, dead boolean",
        )
    out = merge_upsert(
        base,
        updates,
        ["k"],
        seq_col="seq" if use_seq else None,
        delete_col="dead",
    ).collect()
    keys = [r.k for r in out]
    assert len(keys) == len(set(keys)), out  # one row per key, always
    batch_keys = {k for k, _, _, _ in batch}
    for k in (1, 2, 3):
        if k not in batch_keys:
            assert (k, -k) in {(r.k, r.v) for r in out}  # untouched


@settings(max_examples=25, deadline=None)
@given(
    _dims,
    st.integers(min_value=1, max_value=9),
    st.randoms(use_true_random=False),
)
def test_jpeg_restart_interval_roundtrip_identical(dims, interval, rng):
    # DRI/RSTn (VERDICT r7 item 8): restart markers are a pure framing
    # feature — byte-aligned markers + DC predictor resets — so decoding
    # a DRI stream must be BIT-IDENTICAL to the same image encoded
    # without restarts, for any interval, size, and subsampling.
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_color,
    )

    w, h = dims
    gpx = [rng.randrange(256) for _ in range(w * h)]
    base = decode_jpeg_gray_pixels(encode_jpeg_gray(w, h, gpx))
    blob = encode_jpeg_gray(w, h, gpx, restart_interval=interval)
    assert decode_jpeg_gray_pixels(blob) == base
    assert b"\xff\xdd" in blob

    cpx = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    sub = rng.choice(["444", "420", "422", "440"])
    cbase = decode_jpeg_pixels(encode_jpeg_color(w, h, cpx, subsampling=sub))
    cblob = encode_jpeg_color(
        w, h, cpx, subsampling=sub, restart_interval=interval
    )
    assert decode_jpeg_pixels(cblob) == cbase


def test_jpeg_restart_corruption_stays_quarantine_eligible():
    # A DRI stream whose restart structure is broken (marker overwritten
    # or truncated at a boundary) is malformed DATA: must raise
    # ValueError (the quarantine class), never desynchronize silently.
    import pytest

    w, h = 24, 16  # 3x2 MCUs, interval 2 -> RST after MCUs 2 and 4
    px = [(x * 11 + y * 7) % 256 for y in range(h) for x in range(w)]
    blob = encode_jpeg_gray(w, h, px, restart_interval=2)
    i = blob.index(b"\xff\xd0")
    # out-of-sequence restart (RST0 -> RST5)
    bad = blob[:i] + b"\xff\xd5" + blob[i + 2:]
    with pytest.raises(ValueError, match="RST0"):
        decode_jpeg_gray_pixels(bad)
    # truncated at the restart boundary
    with pytest.raises(ValueError):
        decode_jpeg_gray_pixels(blob[: i + 1])


@settings(max_examples=40, deadline=None)
@given(_dims, st.sampled_from([0, 2, 3, 4, 6]), st.randoms(use_true_random=False))
def test_png_any_color_type_roundtrip(dims, color_type, rng):
    # The widened PNG decoder as a law: every depth-8 color type
    # round-trips losslessly through the encoder twin for ANY content
    # and geometry (alpha channels dropped per the documented contract).
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        decode_png_rgb8_pixels,
        encode_png_typed,
    )

    w, h = dims
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    palette = None
    if color_type == 3:
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(256)
        ]
        samples = bytes(rng.randrange(256) for _ in range(w * h))
        exp = [palette[v] for v in samples]
    else:
        samples = bytes(rng.randrange(256) for _ in range(w * h * bpp))
        if color_type == 0:
            exp = [(v, v, v) for v in samples]
        elif color_type == 2:
            exp = [tuple(samples[i * 3 : i * 3 + 3]) for i in range(w * h)]
        elif color_type == 4:
            exp = [(samples[i * 2],) * 3 for i in range(w * h)]
        else:
            exp = [tuple(samples[i * 4 : i * 4 + 3]) for i in range(w * h)]
    pay = encode_png_typed(w, h, color_type, samples, palette)
    assert decode_png_rgb8_pixels(pay) == (w, h, exp)
    # and the Adam7 encoding of the same image is pixel-identical — the
    # interlace law for any geometry (empty/narrow passes included)
    inter = encode_png_typed(w, h, color_type, samples, palette, interlace=True)
    assert decode_png_rgb8_pixels(inter) == (w, h, exp)


@settings(max_examples=30, deadline=None)
@given(
    _dims,
    st.sampled_from([1, 5, 32773]),
    st.sampled_from(["<", ">"]),
    st.integers(min_value=1, max_value=6),
    st.randoms(use_true_random=False),
)
def test_tiff_roundtrip_any_image(dims, comp, bo, rps, rng):
    # TIFF as a law: any content, any geometry, any strip height, both
    # byte orders, every compression — lossless round-trip through the
    # encoder twin (predictor included for LZW).
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        decode_tiff_rgb8_pixels,
        encode_tiff_rgb8,
    )

    w, h = dims
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    pay = encode_tiff_rgb8(
        w, h, px, compression=comp, byte_order=bo, rows_per_strip=rps
    )
    assert decode_tiff_rgb8_pixels(pay) == (w, h, px)
    if comp == 5:
        pay = encode_tiff_rgb8(
            w, h, px, compression=5, predictor=2, byte_order=bo,
            rows_per_strip=rps,
        )
        assert decode_tiff_rgb8_pixels(pay) == (w, h, px)


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=0, max_size=6000),
    st.randoms(use_true_random=False),
)
def test_tiff_lzw_and_packbits_any_bytes(data, rng):
    # The compressors as laws over arbitrary byte strings (hypothesis
    # shrinks real failures to minimal counterexamples — this is what
    # would have caught the early-change flush edge automatically).
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        _tiff_packbits_decode,
        _tiff_packbits_encode,
    )

    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
    assert (
        _tiff_packbits_decode(_tiff_packbits_encode(data), len(data)) == data
    )


@settings(max_examples=25, deadline=None)
@given(_dims, st.booleans(), st.randoms(use_true_random=False))
def test_gif_roundtrip_any_image(dims, interlace, rng):
    # GIF as a law (round-10 completion of the per-codec property set):
    # any <=256-color content, any geometry, interlaced or not.
    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        decode_gif_rgb8_pixels,
        encode_gif_rgb8,
    )

    w, h = dims
    ncolors = rng.randrange(1, 17)
    palette = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(ncolors)
    ]
    px = [palette[rng.randrange(ncolors)] for _ in range(w * h)]
    # GIF palettes key on unique colors; duplicates in `palette` are fine
    pay = encode_gif_rgb8(w, h, px, interlace=interlace)
    assert decode_gif_rgb8_pixels(pay) == (w, h, px)
