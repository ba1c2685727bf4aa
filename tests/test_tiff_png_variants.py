"""PNG color-type breadth + the baseline TIFF codec (round-10 breadth).

The PNG decoder is widened from RGB-only to every depth-8 color type a
real web corpus contains (gray / palette / gray+alpha / RGBA); TIFF is
the fifth still-image codec: II/MM byte orders, strips, none/PackBits/
LZW compression with the horizontal predictor, gray/RGB/palette
photometrics. Everything round-trips through in-repo encoder twins
(meet-in-the-middle: encoder and decoder share no state, so agreement
on pseudo-random content is evidence for both).
"""

import struct

import pytest

from tfx_addons_feast_examplegen_spark.operators import multimodal as mm


def _pat(n, k=251):
    return bytes((i * k + (i >> 3)) % 256 for i in range(n))


# ---------------------------------------------------------------- PNG


def test_png_grayscale_and_rgba_roundtrip():
    w, h = 9, 7  # non-multiple-of-filter-cycle dims
    gray = _pat(w * h)
    pay = mm.encode_png_typed(w, h, 0, gray)
    assert mm.decode_png_rgb8_pixels(pay) == (
        w, h, [(v, v, v) for v in gray]
    )
    rgba = _pat(w * h * 4)
    pay = mm.encode_png_typed(w, h, 6, rgba)
    exp = [tuple(rgba[i * 4 : i * 4 + 3]) for i in range(w * h)]
    assert mm.decode_png_rgb8_pixels(pay) == (w, h, exp)


def test_png_gray_alpha_drops_alpha():
    w, h = 6, 5
    ga = _pat(w * h * 2)
    pay = mm.encode_png_typed(w, h, 4, ga)
    exp = [(ga[i * 2],) * 3 for i in range(w * h)]
    assert mm.decode_png_rgb8_pixels(pay) == (w, h, exp)


def test_png_palette_roundtrip_and_errors():
    w, h = 8, 8
    palette = [((i * 37) % 256, (i * 11) % 256, (i * 201) % 256) for i in range(16)]
    idx = bytes(i % 16 for i in range(w * h))
    pay = mm.encode_png_typed(w, h, 3, idx, palette)
    assert mm.decode_png_rgb8_pixels(pay) == (
        w, h, [palette[v] for v in idx]
    )
    # index beyond the palette: quarantine class, not IndexError
    bad = mm.encode_png_typed(w, h, 3, bytes([15] * (w * h - 1) + [17]),
                              palette)
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_png_rgb8_pixels(bad)
    # PLTE missing entirely
    chunks = bytearray(pay)
    p = chunks.find(b"PLTE") - 4
    ln = struct.unpack_from(">I", chunks, p)[0]
    del chunks[p : p + 12 + ln]
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_png_rgb8_pixels(bytes(chunks))


def test_png_16bit_decodes_high_byte():
    # depth-16 gray: big-endian samples (hi, lo); the decoder keeps the
    # high byte (the spec's recommended 16->8 reduction). Low bytes are
    # deliberately non-zero so a byte-order slip would corrupt pixels.
    w, h = 5, 4
    hi = _pat(w * h)
    samples = b"".join(bytes((hi[i], (i * 37 + 5) % 256)) for i in range(w * h))
    pay = mm.encode_png_typed(w, h, 0, samples, depth=16)
    got = mm.decode_png_rgb8_pixels(pay)
    assert got == (w, h, [(v, v, v) for v in hi])

    # depth-16 RGB exercises filtering at the true 6-byte bpp offset
    rgb_hi = _pat(w * h * 3)
    rgb = b"".join(bytes((rgb_hi[i], 0xAB)) for i in range(w * h * 3))
    got_w, got_h, px = mm.decode_png_rgb8_pixels(
        mm.encode_png_typed(w, h, 2, rgb, depth=16)
    )
    assert (got_w, got_h) == (w, h)
    assert px == list(zip(rgb_hi[0::3], rgb_hi[1::3], rgb_hi[2::3]))


def test_png_sub8_and_16bit_palette_rejected_by_name():
    import zlib

    pay = bytearray(mm.encode_png_typed(4, 4, 0, _pat(16)))
    # IHDR depth byte lives at sig(8)+len(4)+type(4)+w(4)+h(4)
    pay[24] = 4  # sub-8-bit stays out of scope
    struct.pack_into(
        ">I", pay, 29, zlib.crc32(b"IHDR" + bytes(pay[16:29])) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="depth-8/16"):
        mm.decode_png_rgb8_pixels(bytes(pay))
    # 16-bit palette does not exist in the spec; encoder and decoder
    # both refuse it by name rather than guessing a layout
    with pytest.raises(ValueError, match="palette depth-8"):
        mm.encode_png_typed(2, 2, 3, _pat(8), [(0, 0, 0)] * 256, depth=16)
    pal = bytearray(mm.encode_png_typed(2, 2, 3, _pat(4), [(9, 9, 9)] * 256))
    pal[24] = 16
    struct.pack_into(
        ">I", pal, 29, zlib.crc32(b"IHDR" + bytes(pal[16:29])) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="palette depth-8"):
        mm.decode_png_rgb8_pixels(bytes(pal))


# --------------------------------------------------------------- TIFF


def test_tiff_roundtrip_matrix():
    w, h = 10, 12
    rgb = [tuple(_pat(3, 13 + i)) for i in range(w * h)]
    gray = [(v, v, v) for v in _pat(w * h)]
    for px, photo in ((rgb, 2), (gray, 1)):
        for comp in (1, 5, 32773):
            for bo in ("<", ">"):
                pay = mm.encode_tiff_rgb8(
                    w, h, px, compression=comp, byte_order=bo,
                    photometric=photo,
                )
                assert mm.decode_tiff_rgb8_pixels(pay) == (w, h, px), (
                    photo, comp, bo,
                )


def test_tiff_multistrip_and_predictor():
    w, h = 7, 12  # 3 strips of 5/5/2 rows
    px = [tuple(_pat(3, 29 + i)) for i in range(w * h)]
    for comp in (1, 5, 32773):
        pay = mm.encode_tiff_rgb8(
            w, h, px, compression=comp, rows_per_strip=5
        )
        assert mm.decode_tiff_rgb8_pixels(pay) == (w, h, px)
    pay = mm.encode_tiff_rgb8(
        w, h, px, compression=5, predictor=2, rows_per_strip=5
    )
    assert mm.decode_tiff_rgb8_pixels(pay) == (w, h, px)


def test_tiff_lzw_early_change_boundaries():
    # Incompressible content: one table entry per code, so length ~n
    # crosses the 510/1022/2046 early-change boundaries and (at 9k) the
    # 4094 table-full explicit clear. Exact boundary lengths probe the
    # flush/EOI width edge (the decoder's phantom final add).
    import random

    rng = random.Random(42)
    for n in (250, 252, 253, 254, 300, 800, 2500, 9000):
        data = bytes(rng.randrange(256) for _ in range(n))
        enc = mm._tiff_lzw_encode(data)
        assert mm._tiff_lzw_decode(enc, n) == data, n
    # compressible content exercises multi-byte table hits
    data = (b"abcabd" * 700) + bytes(rng.randrange(4) for _ in range(500))
    enc = mm._tiff_lzw_encode(data)
    assert mm._tiff_lzw_decode(enc, len(data)) == data
    assert len(enc) < len(data) // 2  # it actually compresses


def test_tiff_packbits_runs_and_literals():
    cases = [
        b"",
        b"\x00" * 300,              # long repeat runs split at 128
        _pat(257),                  # pure literal split at 128
        b"aaabccddddde" * 40,       # mixed
    ]
    for data in cases:
        enc = mm._tiff_packbits_encode(data)
        assert mm._tiff_packbits_decode(enc, len(data)) == data
    # 0x80 no-op byte is skipped on decode
    assert mm._tiff_packbits_decode(b"\x80\x01ab", 2) == b"ab"


def test_tiff_whitezero_and_palette_photometrics():
    # The encoder twin writes photometric 1/2 only; hand-build the
    # WhiteIsZero and palette variants by patching/constructing IFDs —
    # the decoder must not care who wrote the file.
    w, h = 4, 3
    gray = _pat(w * h)
    pay = bytearray(
        mm.encode_tiff_rgb8(w, h, [(v, v, v) for v in gray], photometric=1)
    )
    # find tag 262 in the IFD and flip its value 1 -> 0 (WhiteIsZero)
    (ifd_off,) = struct.unpack_from("<I", pay, 4)
    (n,) = struct.unpack_from("<H", pay, ifd_off)
    for e in range(n):
        off = ifd_off + 2 + 12 * e
        tag = struct.unpack_from("<H", pay, off)[0]
        if tag == 262:
            struct.pack_into("<H", pay, off + 8, 0)
    assert mm.decode_tiff_rgb8_pixels(bytes(pay)) == (
        w, h, [(255 - v,) * 3 for v in gray]
    )

    # hand-built palette TIFF: 16 used ColorMap entries out of 256
    idx = bytes(i % 16 for i in range(w * h))
    cmap = [0] * 768
    for i in range(16):
        cmap[i] = (i * 17) << 8          # red, 16-bit
        cmap[256 + i] = (255 - i * 5) << 8
        cmap[512 + i] = (i * 3) << 8
    header = struct.pack("<2sHI", b"II", 42, 0)
    body = idx
    ifd_off = 8 + len(body)
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [8]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [len(body)]), (320, 3, cmap),
    ]
    ifd = struct.pack("<H", len(entries))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        fmt = "H" if typ == 3 else "I"
        size = 2 if typ == 3 else 4
        packed = struct.pack("<" + str(len(vals)) + fmt, *vals)
        if size * len(vals) <= 4:
            val = packed + b"\x00" * (4 - size * len(vals))
        else:
            val = struct.pack("<I", extra_base + len(extra))
            extra += packed
        ifd += struct.pack("<HHI", tag, typ, len(vals)) + val
    ifd += struct.pack("<I", 0)
    pay = bytearray(header) + body + ifd + extra
    struct.pack_into("<I", pay, 4, ifd_off)
    exp = [
        (cmap[v] >> 8, cmap[256 + v] >> 8, cmap[512 + v] >> 8) for v in idx
    ]
    assert mm.decode_tiff_rgb8_pixels(bytes(pay)) == (w, h, exp)


def test_tiff_rejections_stay_quarantine_class():
    w, h = 4, 4
    px = [(1, 2, 3)] * 16
    good = mm.encode_tiff_rgb8(w, h, px)
    with pytest.raises(ValueError, match="not a TIFF"):
        mm.decode_tiff_rgb8_pixels(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        mm.decode_tiff_rgb8_pixels(good[:2] + b"\x2b\x00" + good[4:])
    # truncation mid-strip -> loud
    with pytest.raises(ValueError):
        mm.decode_tiff_rgb8_pixels(good[: len(good) // 2])
    # 16-bit samples rejected: patch BitsPerSample values (tag 258)
    pay = bytearray(good)
    (ifd_off,) = struct.unpack_from("<I", pay, 4)
    (n,) = struct.unpack_from("<H", pay, ifd_off)
    for e in range(n):
        off = ifd_off + 2 + 12 * e
        tag, typ, cnt = struct.unpack_from("<HHI", pay, off)
        if tag == 258:
            voff = struct.unpack_from("<I", pay, off + 8)[0] if cnt * 2 > 4 else off + 8
            for c in range(cnt):
                struct.pack_into("<H", pay, voff + 2 * c, 16)
    with pytest.raises(ValueError, match="8-bit"):
        mm.decode_tiff_rgb8_pixels(bytes(pay))


def test_tiff_sniffed_in_mixed_corpus(spark):
    # end-to-end: TIFF payloads flow through the same Arrow-batched
    # mapInPandas stage as the other four codecs, sniffed by magic
    w, h = 6, 4
    px = [((i * 11) % 256, (i * 7) % 256, (i * 3) % 256) for i in range(w * h)]
    tiff = mm.encode_tiff_rgb8(w, h, px, compression=5, byte_order=">")
    png = mm.encode_png_typed(3, 3, 0, _pat(9))
    df = spark.createDataFrame(
        [(0, bytearray(tiff)), (1, bytearray(png)), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            mm.extract_image_stats(df, on_error="null").collect()}
    assert (rows[0]["width"], rows[0]["height"]) == (w, h)
    assert rows[0]["r_sum"] == sum(p[0] for p in px)
    assert rows[1]["r_sum"] == sum(_pat(9))
    assert rows[2]["width"] is None


def test_attach_tiff_payloads_matches_bmp_adapter(spark, sf_dir):
    # The registry entry's contract: attach_tiff_payloads carries the
    # SAME closed-form pixel content as attach_bmp_payloads, so the
    # shared external oracle holds. 40 doc_ids cover every rotation of
    # the fixture's variation axes (compression none/LZW/PackBits x
    # predictor x byte order x rows_per_strip 1..5).
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"].limit(40)
    tiff = {r.doc_id: r for r in
            mm.extract_image_stats(mm.attach_tiff_payloads(docs)).collect()}
    bmp = {r.doc_id: r for r in
           mm.extract_image_stats(mm.attach_bmp_payloads(docs)).collect()}
    assert set(tiff) == set(bmp) and len(tiff) == 40
    for k in tiff:
        assert tiff[k] == bmp[k]


def test_png_adam7_interlace_decodes_identically():
    # Adam7-interlaced PNGs exist in real corpora. The interlaced
    # encoding of an image must decode pixel-identically to the
    # sequential encoding — pass extraction, per-pass filter-state
    # reset, and the scatter back to (x0 + i*dx, y0 + j*dy) all have to
    # be right at once. Dimensions are deliberately NOT multiples of 8
    # (they exercise the empty/narrow passes), and each image is big
    # enough that every one of the 7 passes is non-empty.
    for w, h, ctype in ((13, 9, 2), (9, 10, 0), (8, 8, 6), (5, 3, 2)):
        n = w * h * {0: 1, 2: 3, 6: 4}[ctype]
        samples = _pat(n)
        seq = mm.decode_png_rgb8_pixels(mm.encode_png_typed(w, h, ctype, samples))
        inter = mm.decode_png_rgb8_pixels(
            mm.encode_png_typed(w, h, ctype, samples, interlace=True)
        )
        assert inter == seq

    # 16-bit + Adam7 together (both new paths at once)
    w, h = 11, 7
    hi = _pat(w * h)
    s16 = b"".join(bytes((hi[i], 0x5A)) for i in range(w * h))
    assert mm.decode_png_rgb8_pixels(
        mm.encode_png_typed(w, h, 0, s16, depth=16, interlace=True)
    ) == (w, h, [(v, v, v) for v in hi])

    # a truncated final pass still fails loud, never silently short
    import zlib as _zlib

    pay = bytearray(mm.encode_png_typed(8, 8, 2, _pat(192), interlace=True))
    p = pay.find(b"IDAT") - 4
    ln = struct.unpack_from(">I", pay, p)[0]
    idat = _zlib.decompress(bytes(pay[p + 8 : p + 8 + ln]))
    clipped = _zlib.compress(idat[:-25])  # drop the last pass-7 row
    rebuilt = (
        bytes(pay[:p])
        + struct.pack(">I", len(clipped))
        + b"IDAT"
        + clipped
        + struct.pack(">I", _zlib.crc32(b"IDAT" + clipped) & 0xFFFFFFFF)
        + bytes(pay[p + 12 + ln :])
    )
    with pytest.raises(ValueError, match="length mismatch|unfilled"):
        mm.decode_png_rgb8_pixels(rebuilt)


def test_tiff_exif_baggage_tolerated():
    # Exif-bearing TIFFs interleave tags baseline decode doesn't need:
    # RATIONAL resolutions (type 5 — skipped by TYPE), ASCII
    # description/DateTime (type 2 — bounds-checked then skipped by
    # CLASS), and the ExifIFD pointer 34665 (a LONG the walker stores
    # but never follows). The IFD walk must step over all of them and
    # still decode the pixels — hand-assembled 2x2 gray II TIFF, since
    # the repo encoder never emits metadata tags.
    gray = bytes([10, 20, 30, 40])
    desc = b"round-11 exif fixture\x00"
    dt = b"2026:08:15 00:00:00\x00"

    specs = [
        # (tag, typ, count, inline_value or None, outofline_bytes or None)
        (256, 3, 1, 2, None),            # width
        (257, 3, 1, 2, None),            # height
        (258, 3, 1, 8, None),            # bits per sample
        (259, 3, 1, 1, None),            # uncompressed
        (262, 3, 1, 1, None),            # BlackIsZero gray
        (270, 2, len(desc), None, desc),  # ImageDescription (ASCII)
        (273, 4, 1, "STRIP", None),      # strip offset (patched below)
        (277, 3, 1, 1, None),            # samples per pixel
        (278, 3, 1, 2, None),            # rows per strip
        (279, 4, 1, 4, None),            # strip byte count
        (282, 5, 1, None, struct.pack("<II", 72, 1)),  # XResolution 72/1
        (306, 2, len(dt), None, dt),     # DateTime (ASCII)
        (34665, 4, 1, 8, None),          # ExifIFD pointer (unfollowed)
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(specs) + 4
    val_off = ifd_off + ifd_len
    values = bytearray()
    offsets = {}
    for tag, typ, count, inline, data in specs:
        if data is not None:
            offsets[tag] = val_off + len(values)
            values += data
            if len(values) % 2:
                values += b"\x00"
    strip_off = val_off + len(values)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(specs))
    size = {2: 1, 3: 2, 4: 4, 5: 8}
    fmt = {3: "<H", 4: "<I"}
    for tag, typ, count, inline, data in specs:
        out += struct.pack("<HHI", tag, typ, count)
        if data is not None:
            out += struct.pack("<I", offsets[tag])
        else:
            v = strip_off if inline == "STRIP" else inline
            out += struct.pack(fmt[typ], v).ljust(4, b"\x00")
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += values
    out += gray

    w, h, px = mm.decode_tiff_rgb8_pixels(bytes(out))
    assert (w, h) == (2, 2)
    assert px == [(v, v, v) for v in gray]
