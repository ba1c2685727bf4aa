"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension: at 100 TB, image/audio/video columns ride through
the engine as ``binary`` payloads with typed metadata columns; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` stages on
executors.

Two codec tiers:

- **Real pure-stdlib decoders**: :func:`decode_bmp_24` (24-bit
  uncompressed BMP — header parse, row padding, bottom-up/top-down,
  BGR order), :func:`decode_png_rgb8` (8-bit RGB PNG — chunk CRC walk,
  zlib inflate, all five scanline filters reconstructed) and
  :func:`decode_wav_pcm16` (RIFF chunk walk, PCM16 mono). These run as
  the decode kernels of :func:`extract_image_stats` (content-sniffing
  BMP/PNG dispatch) / :func:`extract_audio_stats` and are
  oracle-checked end-to-end (the fixture payloads carry closed-form
  pixel/sample values an external SQL engine can re-derive).
- **Stub boundary for formats needing codec libraries** (JPEG/MP3/
  H.264 are not decodable with the stdlib):
  :class:`StubImageCodec` raises ``NotImplementedError`` unless
  ``deterministic_fake=True``; swap in a real codec by implementing
  ``decode(payload) -> features`` with the same signature.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id long, payload binary, format string, width int, height int"
)

FEATURE_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "feat array<float>, feat_dim int"
)


@dataclass
class StubImageCodec:
    """Placeholder decode kernel.

    ``deterministic_fake=True`` derives a fake feature vector from the
    payload's sha256 — stable across runs/executors, so tests can assert
    end-to-end behavior. With the default False it raises, marking
    exactly where a real codec (PIL/ffmpeg/...) plugs in.
    """

    feat_dim: int = 8
    deterministic_fake: bool = False

    def decode(self, payload: bytes) -> list[float]:
        if not self.deterministic_fake:
            raise NotImplementedError(
                "image/audio decode requires codec libraries not present "
                "in this environment; construct StubImageCodec("
                "deterministic_fake=True) for plumbing tests"
            )
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[: self.feat_dim]]


# ---------------------------------------------------------------------------
# Real pure-stdlib codecs: 24-bit uncompressed BMP, PCM16 mono WAV
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, "
    "r_sum long, g_sum long, b_sum long, px_min int, px_max int"
)

AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, "
    "sample_sum long, s_min int, s_max int"
)


def encode_bmp_24(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Serialize row-major top-down (r, g, b) pixels as a standard 24-bit
    uncompressed BMP (BITMAPINFOHEADER, bottom-up rows, BGR byte order,
    rows padded to 4-byte boundaries)."""
    row_size = (width * 3 + 3) // 4 * 4
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):
        for x in range(width):
            r, g, b = pixels[y * width + x]
            rows += bytes((b, g, r))
        rows += b"\x00" * (row_size - width * 3)
    return header + info + bytes(rows)


def decode_bmp_24_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode any 24-bit uncompressed BMP into row-major TOP-DOWN
    (r, g, b) pixels: (width, height, pixels).

    Real decoder, not a fixture trick: parses the file header's pixel
    offset, signed height (negative = top-down rows), bits-per-pixel and
    compression fields, and walks padded BGR rows, reordering bottom-up
    files into top-down pixel order (the inverse of
    :func:`encode_bmp_24`).
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = height_raw < 0
    height = abs(height_raw)
    row_size = (width * 3 + 3) // 4 * 4
    view = memoryview(payload)
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * height)
    for row_i in range(height):
        row = view[offset + row_i * row_size : offset + row_i * row_size + width * 3]
        y = row_i if top_down else height - 1 - row_i
        base = y * width
        for x in range(width):
            pixels[base + x] = (row[x * 3 + 2], row[x * 3 + 1], row[x * 3])
    return width, height, pixels


def _pixel_stats(
    width: int, height: int, pixels: list[tuple[int, int, int]]
) -> tuple[int, int, int, int, int, int, int]:
    r_sum = g_sum = b_sum = 0
    px_min, px_max = 255, 0
    for r, g, b in pixels:
        r_sum += r
        g_sum += g
        b_sum += b
        lo, hi = min(r, g, b), max(r, g, b)
        px_min = min(px_min, lo)
        px_max = max(px_max, hi)
    return width, height, r_sum, g_sum, b_sum, px_min, px_max


def decode_bmp_24(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode a 24-bit BMP into per-channel integer stats:
    (width, height, r_sum, g_sum, b_sum, px_min, px_max). Thin stats
    wrapper over :func:`decode_bmp_24_pixels` — one decode path."""
    return _pixel_stats(*decode_bmp_24_pixels(payload))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb8(
    width: int, height: int, pixels: list[tuple[int, int, int]]
) -> bytes:
    """Serialize row-major top-down (r, g, b) pixels as a standard 8-bit
    RGB PNG (pure stdlib — zlib for IDAT, zlib.crc32 for chunk CRCs).

    Scanline filters CYCLE through all five PNG filter types
    (None/Sub/Up/Average/Paeth by row index mod 5), so a decoder must
    implement real unfiltering — not just inflate — to reconstruct the
    pixels. That keeps the meet-in-the-middle oracle honest end-to-end.
    """
    import zlib

    bpp = 3

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(pixels[y * width + x])
        ft = y % 5
        filt = bytearray(len(row))
        for i in range(len(row)):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                filt[i] = row[i]
            elif ft == 1:
                filt[i] = (row[i] - left) & 0xFF
            elif ft == 2:
                filt[i] = (row[i] - up) & 0xFF
            elif ft == 3:
                filt[i] = (row[i] - (left + up) // 2) & 0xFF
            else:
                filt[i] = (row[i] - _paeth(left, up, ul)) & 0xFF
        raw += bytes((ft,)) + bytes(filt)
        prev = bytes(row)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png_rgb8_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode an 8-bit RGB non-interlaced PNG into row-major top-down
    (r, g, b) pixels: (width, height, pixels).

    Real decoder: verifies the signature and every chunk CRC, parses
    IHDR, concatenates multi-chunk IDAT streams, inflates, and
    reconstructs all five scanline filter types (None/Sub/Up/Average/
    Paeth). Only bit-depth 8 / color type 2 / non-interlaced is
    supported (the same single-variant honesty as the 24-bit BMP
    decoder); anything else raises.
    """
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"corrupt PNG chunk crc ({ctype!r})")
        if ctype == b"IHDR":
            width, height, depth, ctype_i, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_i, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced PNG supported "
                    f"(depth={depth}, color={ctype_i}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    inflated = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(inflated) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    pixels: list[tuple[int, int, int]] = []
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ft = inflated[off]
        row = bytearray(inflated[off + 1 : off + 1 + stride])
        if ft == 1:
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        pixels.extend(zip(row[0::3], row[1::3], row[2::3]))
        prev = bytes(row)
    return width, height, pixels


def decode_png_rgb8(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode an 8-bit RGB PNG into the same integer stat tuple as
    :func:`decode_bmp_24`. Thin stats wrapper over
    :func:`decode_png_rgb8_pixels` — one decode path."""
    return _pixel_stats(*decode_png_rgb8_pixels(payload))


def encode_wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    """Serialize int16 samples as a standard PCM16 mono RIFF/WAVE file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, int, int, int]:
    """Decode a PCM16 mono WAV into integer sample stats:
    (sample_rate, n_samples, sample_sum, s_min, s_max).

    Walks RIFF chunks properly (word-aligned sizes, unknown chunks
    skipped), so files with extra LIST/fact chunks decode too.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_code != 1 or bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = struct.unpack(f"<{len(data) // 2}h", data)
    return rate, len(samples), sum(samples), min(samples), max(samples)


# Closed-form fixture content: pixel (x, y, channel c in RGB order) of
# doc_id's image is (doc_id*7 + y*31 + x*3 + c*11) % 256 at dimensions
# (doc_id % 13 + 4) x (doc_id % 11 + 4); audio sample i is
# ((doc_id*13 + i*17) % 65536) - 32768 over (doc_id % 50 + 10) samples.
# The adapters below ENCODE these into real BMP/WAV containers; the
# decoders re-derive the stats from the bytes alone, and an external SQL
# oracle re-derives them from the formulas — meeting in the middle.


def attach_bmp_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real 24-bit BMP payload per row, content
    derived from the id by the closed-form formula above."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 13 + 4, did % 11 + 4
                base = [
                    (did * 7 + y * 31 + x * 3) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                pixels = [(v, (v + 11) % 256, (v + 22) % 256) for v in base]
                payloads.append(encode_bmp_24(w, h, pixels))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/bmp",
                    "width": widths,
                    "height": heights,
                }
            )

    return df.select(F.col(id_col)).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_png_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real 8-bit RGB PNG payload per row — SAME
    closed-form pixel content as :func:`attach_bmp_payloads`, different
    container, so the two decoders share one external oracle."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 13 + 4, did % 11 + 4
                base = [
                    (did * 7 + y * 31 + x * 3) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                pixels = [(v, (v + 11) % 256, (v + 22) % 256) for v in base]
                payloads.append(encode_png_rgb8(w, h, pixels))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/png",
                    "width": widths,
                    "height": heights,
                }
            )

    return df.select(F.col(id_col)).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real PCM16 mono WAV payload per row."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, counts = [], []
            for did in pdf[id_col]:
                did = int(did)
                n = did % 50 + 10
                samples = [
                    ((did * 13 + i * 17) % 65536) - 32768 for i in range(n)
                ]
                payloads.append(encode_wav_pcm16(samples))
                counts.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/wav",
                    "n_samples": counts,
                }
            )

    return df.select(F.col(id_col)).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string, n_samples int"
    )


def _decode_image(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Content-sniffing image decode: dispatch on magic bytes (the way a
    real mixed-corpus decode stage must — the format column is metadata,
    the bytes are the truth)."""
    if payload[:2] == b"BM":
        return decode_bmp_24(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png_rgb8(payload)
    raise ValueError("unrecognized image payload (not BMP or PNG)")


def extract_image_stats(media_df: DataFrame) -> DataFrame:
    """Real decode stage: Arrow-batched ``mapInPandas`` over image
    payloads (BMP or PNG, sniffed per record) -> per-image integer
    channel stats. The (huge) payload column is consumed here and
    dropped — project early, shuffle small."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "r_sum": [r[2] for r in rows],
                    "g_sum": [r[3] for r in rows],
                    "b_sum": [r[4] for r in rows],
                    "px_min": [r[5] for r in rows],
                    "px_max": [r[6] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=IMAGE_STATS_SCHEMA)


def extract_audio_stats(media_df: DataFrame) -> DataFrame:
    """Real decode stage for PCM16 WAV payloads -> integer sample stats."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav_pcm16(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "sample_sum": [r[2] for r in rows],
                    "s_min": [r[3] for r in rows],
                    "s_max": [r[4] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=AUDIO_STATS_SCHEMA)


def attach_binary_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture adapter: synthesize a multimodal table from documents —
    payload = utf-8 bytes of text (an opaque blob as far as the pipeline
    is concerned), plus typed metadata columns.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("fake/raw").alias("format"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
    )


def extract_features(
    media_df: DataFrame,
    codec: StubImageCodec,
    *,
    batch_rows_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Each executor task pulls Arrow batches, runs the codec per payload,
    and emits fixed-width feature vectors with metadata passthrough. The
    payload column is dropped on output so the (huge) blobs don't flow
    further down the pipeline — project early, shuffle small.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codec.decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feat": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media_df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_images(
    media_df: DataFrame,
    *,
    target_width: int,
    target_height: int,
) -> DataFrame:
    """REAL image resize for the pure-stdlib codecs: decode (BMP or PNG,
    sniffed per record from magic bytes), nearest-neighbor resample with
    the explicit index map ``sx = floor(x·w/tw), sy = floor(y·h/th)``,
    re-encode as 24-bit BMP. Arrow-batched ``mapInPandas`` — the same
    codec boundary as :func:`extract_image_stats`, but payload→payload,
    so it chains into any downstream decode/stats/sink stage.

    Contrast with :func:`resize_media` (the stub-kernel plumbing
    variant kept for formats without a stdlib codec): here the pixels
    are right, and the oracle can re-derive the resampled image
    closed-form from the index map.
    """
    tw, th = int(target_width), int(target_height)
    if tw <= 0 or th <= 0:
        raise ValueError("target dimensions must be positive")

    def _decode_pixels(b: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
        if b[:2] == b"BM":
            return decode_bmp_24_pixels(b)
        if b[: len(_PNG_SIG)] == _PNG_SIG:
            return decode_png_rgb8_pixels(b)
        raise ValueError("unrecognized image payload (not BMP or PNG)")

    def _rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                w, h, px = _decode_pixels(bytes(p))
                resampled = [
                    px[(y * h // th) * w + (x * w // tw)]
                    for y in range(th)
                    for x in range(tw)
                ]
                outs.append(encode_bmp_24(tw, th, resampled))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "format": ["image/bmp"] * len(outs),
                    "width": [tw] * len(outs),
                    "height": [th] * len(outs),
                }
            )

    return media_df.mapInPandas(_rs, schema=IMAGE_SCHEMA)


def resize_media(
    media_df: DataFrame,
    *,
    target_width: int,
    target_height: int,
    codec: StubImageCodec | None = None,
) -> DataFrame:
    """Resize plumbing: recompute typed metadata, re-emit payload through
    the codec boundary via ``mapInPandas``.

    The actual pixel resampling is the stubbed kernel (same boundary as
    :func:`extract_features`); with the deterministic fake the "resized"
    payload is a proportional byte slice — wrong pixels, right plumbing:
    schema, metadata recomputation, Arrow batch flow, and downstream
    writability are all real.
    """
    codec = codec or StubImageCodec()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not codec.deterministic_fake:
                raise NotImplementedError(
                    "real resampling needs codec libs; use "
                    "StubImageCodec(deterministic_fake=True) for plumbing"
                )
            outs = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                b = bytes(p)
                frac = min(1.0, (target_width * target_height) / max(w * h, 1))
                outs.append(b[: max(1, int(len(b) * frac))])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "format": pdf["format"],
                    "width": target_width,
                    "height": target_height,
                }
            )

    return media_df.mapInPandas(_resize, schema=IMAGE_SCHEMA)


def sample_frames(
    media_df: DataFrame,
    *,
    n_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split each payload
    into ``n_frames`` evenly-spaced byte slices (stand-ins for decoded
    frames), exploded to one row per frame. Pure DataFrame ops — the
    slicing pattern (posexplode of fixed offsets) is exactly how real
    frame extraction fans out, with the codec call stubbed by byte
    slicing.
    """
    frame_ids = F.array(*[F.lit(i) for i in range(n_frames)])
    exploded = media_df.select(
        "doc_id",
        "format",
        F.length("payload").alias("n_bytes"),
        "payload",
        F.posexplode(frame_ids).alias("frame_pos", "frame_id"),
    )
    # substring() operates on BINARY directly (no lossy string cast).
    return exploded.select(
        "doc_id",
        "format",
        "frame_id",
        F.expr(
            f"substring(payload, cast(frame_id * (n_bytes div {n_frames}) + 1 as int), "
            f"greatest(cast(n_bytes div {n_frames} as int), 1))"
        ).alias("frame_payload"),
    )
