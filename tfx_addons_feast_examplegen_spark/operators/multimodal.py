"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension: at 100 TB, image/audio/video columns ride through
the engine as ``binary`` payloads with typed metadata columns; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` stages on
executors.

Two codec tiers:

- **Real pure-stdlib decoders**: :func:`decode_bmp_24` (24-bit
  uncompressed BMP — header parse, row padding, bottom-up/top-down,
  BGR order), :func:`decode_png_rgb8` (8-bit RGB PNG — chunk CRC walk,
  zlib inflate, all five scanline filters reconstructed),
  :func:`decode_jpeg_pixels` (BASELINE JPEG — grayscale AND YCbCr
  color with 4:4:4 / 4:2:2 / 4:2:0 sampling: marker walk, canonical
  huffman from DHT, interleaved-MCU entropy decode with per-component
  DPCM, dequantize, dezigzag, float IDCT, nearest-neighbor chroma
  upsampling, JFIF color conversion — AND PROGRESSIVE JPEG per T.81
  annex G: SOF2 multi-scan walk with spectral selection, successive
  approximation DC/AC refinement, EOBn end-of-band runs, and restart
  markers inside progressive scans) and :func:`decode_wav_pcm16`
  (RIFF chunk walk, PCM16 mono). These run as the decode kernels of
  :func:`extract_image_stats` (content-sniffing BMP/PNG/GIF/JPEG
  dispatch; GIF87a/89a decodes through real variable-width LZW with
  interlace support)
  / :func:`extract_audio_stats` and are oracle-checked end-to-end (the
  fixture payloads carry closed-form pixel/sample values an external
  SQL engine can re-derive).
- **Stub boundary for formats needing codec libraries** (arithmetic-
  coded JPEG, MP3, H.264 remain out of stdlib reach):
  :class:`StubImageCodec` raises ``NotImplementedError`` unless
  ``deterministic_fake=True``; swap in a real codec by implementing
  ``decode(payload) -> features`` with the same signature.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
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
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height_raw}")
    row_size = (width * 3 + 3) // 4 * 4
    # Fail fast on truncated pixel data: Python slicing would silently
    # shorten the row and the per-pixel reads below would raise
    # IndexError — not a quarantine-eligible decoder error class.
    if len(payload) < offset + height * row_size:
        raise ValueError(
            f"truncated BMP: {len(payload)} bytes, "
            f"{offset + height * row_size} needed"
        )
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


def encode_png_typed(
    width: int,
    height: int,
    color_type: int,
    samples: bytes,
    palette: list[tuple[int, int, int]] | None = None,
    *,
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Serialize raw samples as a PNG of any supported color type
    (0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA): the encoder twin
    of the widened :func:`decode_png_rgb8_pixels`. ``samples`` is the
    row-major channel byte stream at the type's bytes-per-pixel
    (``depth=16``: two big-endian bytes per sample; palette is depth-8
    only, per spec). ``interlace=True`` writes the Adam7 layout: each
    pass is an independently filtered mini-image of the pixels at
    (x0 + i·dx, y0 + j·dy). Filters cycle through all five types per
    scanline with filter state reset at each pass boundary — same
    meet-in-the-middle honesty as :func:`encode_png_rgb8`."""
    import zlib

    if depth not in (8, 16) or (depth, color_type) == (16, 3):
        raise ValueError("depth must be 8 or 16 (palette depth-8 only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = channels * (depth // 8)
    if len(samples) != width * height * bpp:
        raise ValueError("sample length does not match dimensions")
    if (color_type == 3) != (palette is not None):
        raise ValueError("palette required iff color type 3")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def filt_rows(rows: list[bytes]) -> bytes:
        # filter one independently-filtered image (whole image, or one
        # Adam7 pass): prev starts at zeros, filters cycle per row
        out = bytearray()
        prev = bytes(len(rows[0])) if rows else b""
        for y, row in enumerate(rows):
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
            out += bytes((ft,)) + bytes(filt)
            prev = row
        return bytes(out)

    stride = width * bpp
    if not interlace:
        raw = filt_rows(
            [samples[y * stride : (y + 1) * stride] for y in range(height)]
        )
    else:
        raw = b""
        for x0, dx, y0, dy in (
            (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
            (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
        ):
            rows = []
            for y in range(y0, height, dy):
                rows.append(
                    b"".join(
                        samples[(y * width + x) * bpp : (y * width + x + 1) * bpp]
                        for x in range(x0, width, dx)
                    )
                )
            if rows and rows[0]:
                raw += filt_rows(rows)
    out = _PNG_SIG + chunk(
        b"IHDR",
        struct.pack(
            ">IIBBBBB", width, height, depth, color_type, 0, 0,
            1 if interlace else 0,
        ),
    )
    if palette is not None:
        out += chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def decode_png_rgb8_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a PNG into row-major top-down (r, g, b) pixels:
    (width, height, pixels).

    Real decoder: verifies the signature and every chunk CRC, parses
    IHDR (+ PLTE for palette images), concatenates multi-chunk IDAT
    streams, inflates, and reconstructs all five scanline filter types
    (None/Sub/Up/Average/Paeth) at the color type's true bytes-per-pixel
    (filtering references the PREVIOUS SAMPLE of the same channel, so a
    wrong bpp corrupts every non-None row). All five color types are
    supported — 0 grayscale, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA —
    at depth 8, plus depth 16 for the non-palette types (big-endian
    samples; the high byte is kept — the spec's recommended 16→8
    reduction; filtering still runs at the full 16-bit
    bytes-per-pixel). Adam7 interlacing is decoded for real: each of
    the 7 passes unfilters as its own mini-image (filter state resets
    per pass, per spec) and its pixels scatter to (x0 + i·dx,
    y0 + j·dy) in the output raster — pixel-identical to the
    sequential decode of the same image. Alpha is dropped (stats
    describe the stored color channels, not a composite); sub-8-bit
    depths raise by name. Ancillary chunks (tEXt, gAMA, tRNS, ...)
    are CRC-verified and skipped.
    """
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    color_type = 2
    palette: list[tuple[int, int, int]] | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"corrupt PNG chunk crc ({ctype!r})")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (
                depth not in (8, 16)
                or (depth, color_type) == (16, 3)
                or color_type not in (0, 2, 3, 4, 6)
                or (comp, filt) != (0, 0)
                or interlace not in (0, 1)
            ):
                raise ValueError(
                    "only depth-8/16 PNG supported (palette depth-8 only) "
                    f"(depth={depth}, color={color_type}, interlace={interlace})"
                )
        elif ctype == b"PLTE":
            if length % 3 or length > 768:
                raise ValueError("bad PNG PLTE length")
            palette = list(zip(data[0::3], data[1::3], data[2::3]))
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    # Parse-boundary translation (same pattern as the JPEG IndexError
    # translation): chunk CRCs can all verify while the concatenated
    # IDAT deflate stream is still corrupt (writer bug, spliced IDAT),
    # which raises zlib.error — malformed DATA, so it must stay
    # quarantine-eligible (ValueError) rather than escape the
    # (ValueError, struct.error) catch and kill an on_error='null' job.
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    sample = depth // 8  # bytes per sample (1 or 2)
    bpp = channels * sample  # filter offset runs at the BYTE level

    def _unfilter_rows(off: int, n_rows: int, stride: int):
        # yields unfiltered scanlines; filter state local to one image
        # or one Adam7 pass (prev row resets to zeros — per spec)
        prev = bytes(stride)
        for y in range(n_rows):
            base = off + y * (stride + 1)
            ft = inflated[base]
            row = bytearray(inflated[base + 1 : base + 1 + stride])
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
            prev = bytes(row)
            yield row

    def _row_rgb(row: bytearray) -> list[tuple[int, int, int]]:
        # 16-bit samples are big-endian; keeping byte 0 of each sample
        # IS the spec's recommended 16->8 reduction, so row[::sample]
        # yields the 8-bit channel stream for either depth
        ch = row[::sample] if sample == 2 else row
        if color_type == 2:
            return list(zip(ch[0::3], ch[1::3], ch[2::3]))
        if color_type == 0:
            return [(v, v, v) for v in ch]
        if color_type == 3:
            try:
                return [palette[v] for v in ch]
            except IndexError:
                raise ValueError("PNG palette index out of range") from None
        if color_type == 4:  # gray + alpha; alpha dropped
            return [(v, v, v) for v in ch[0::2]]
        return list(zip(ch[0::4], ch[1::4], ch[2::4]))  # 6: RGBA

    if interlace == 0:
        stride = width * bpp
        if len(inflated) != height * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        pixels: list[tuple[int, int, int]] = []
        for row in _unfilter_rows(0, height, stride):
            pixels.extend(_row_rgb(row))
        return width, height, pixels

    # Adam7: (x0, dx, y0, dy) per pass; empty passes contribute no bytes
    passes = [
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    ]
    raster: list[tuple[int, int, int] | None] = [None] * (width * height)
    off = 0
    for x0, dx, y0, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = pw * bpp
        if off + ph * (stride + 1) > len(inflated):
            raise ValueError("PNG pixel data length mismatch")
        for j, row in enumerate(_unfilter_rows(off, ph, stride)):
            y = y0 + j * dy
            for i, px in enumerate(_row_rgb(row)):
                raster[y * width + x0 + i * dx] = px
        off += ph * (stride + 1)
    if off != len(inflated):
        raise ValueError("PNG pixel data length mismatch")
    if any(p is None for p in raster):
        raise ValueError("PNG interlace passes left unfilled pixels")
    return width, height, raster  # type: ignore[return-value]


def decode_png_rgb8(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode an 8-bit RGB PNG into the same integer stat tuple as
    :func:`decode_bmp_24`. Thin stats wrapper over
    :func:`decode_png_rgb8_pixels` — one decode path."""
    return _pixel_stats(*decode_png_rgb8_pixels(payload))


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, LZW) — the fourth real still-image codec behind the
# multimodal boundary. Palette-indexed and LOSSLESS, so it shares the
# BMP/PNG closed-form oracle bit-exactly. Variable-width LZW per the
# GIF89a spec appendix F, LSB-first bit packing, 255-byte sub-blocks;
# code width grows when the next free code exceeds the current width's
# range (the giflib rule, symmetric on both sides here) up to the
# 12-bit ceiling, at which point the encoder emits an explicit CLEAR.
# The decoder additionally supports deferred clears (real encoders may
# keep emitting 12-bit codes without resetting) and the 4-pass
# interlace row order. NOTE: GIF has no CRC/checksum layer (unlike PNG
# chunks), so corruption detection is structural only — truncated
# streams, bad codes, missing trailer — never content hashes.
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    """LSB-first bit packer (GIF LZW byte order — opposite of JPEG's)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> None:
        if self._n:
            self.buf.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Variable-width GIF LZW: emits CLEAR, the index stream's codes,
    an explicit CLEAR + table reset whenever the table reaches the
    12-bit ceiling, and a final EOI. Dictionary keyed on
    (prefix_code, next_index) — the standard trie encoding, O(1) per
    input symbol, no string concatenation."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()

    def reset() -> tuple[dict[tuple[int, int], int], int, int]:
        return {}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    w.put(clear, width)
    prev = -1
    for idx in indices:
        if prev < 0:
            prev = idx
            continue
        hit = table.get((prev, idx))
        if hit is not None:
            prev = hit
            continue
        w.put(prev, width)
        table[(prev, idx)] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                # Table full: explicit CLEAR keeps every decoder
                # variant (deferred-clear or not) in sync.
                w.put(clear, width)
                table, next_code, width = reset()
        prev = idx
    if prev >= 0:
        w.put(prev, width)
    w.put(eoi, width)
    w.flush()
    return bytes(w.buf)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Inverse of :func:`_gif_lzw_encode`: variable-width codes,
    LSB-first, KwKwK first-use case, deferred-clear tolerant. Stops at
    EOI or once ``n_pixels`` indices are produced (real-world 1x1 GIFs
    routinely pad/omit the EOI). Fails fast (ValueError) on codes
    beyond the table — corrupt or mis-ordered streams."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # Table as (prefix_code, final_index); roots are (-1, i).
    table: list[tuple[int, int]] = [(-1, i) for i in range(clear)] + [(-1, 0)] * 2
    width = min_code_size + 1
    out: list[int] = []
    acc = n = pos = 0
    prev = -1

    def expand(code: int) -> list[int]:
        chain: list[int] = []
        while code >= 0:
            p, sym = table[code]
            chain.append(sym)
            code = p
        chain.reverse()
        return chain

    while len(out) < n_pixels:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == eoi:
            break
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = -1
            continue
        if prev < 0:
            if code >= len(table):
                raise ValueError(f"GIF LZW code {code} before any root")
            out.extend(expand(code))
        else:
            if code < len(table):
                entry = expand(code)
            elif code == len(table):
                entry = expand(prev)
                entry.append(entry[0])  # KwKwK: cScSc first-use case
            else:
                raise ValueError(f"GIF LZW code {code} beyond table")
            if len(table) < 4096:
                table.append((prev, entry[0]))
                # The decoder's table lags the encoder's by one entry
                # (the first code after a clear adds nothing), so it
                # widens one code EARLIER by its own counter: as soon
                # as the table fills the current width's range.
                if len(table) >= (1 << width) and width < 12:
                    width += 1
            out.extend(entry)
        prev = code
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW stream ended at {len(out)}/{n_pixels} pixels"
        )
    del out[n_pixels:]  # spec allows trailing padding codes
    return out


# The 4-pass interlace row schedule: (start_row, step) per pass.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> list[int]:
    return [y for start, step in _GIF_INTERLACE for y in range(start, height, step)]


def encode_gif_rgb8(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    *,
    interlace: bool = False,
) -> bytes:
    """Serialize row-major top-down (r, g, b) pixels as a standard
    GIF89a: global color table built from first-seen unique colors
    (≤256 required — GIF is palette-indexed), LZW-compressed index
    stream in 255-byte sub-blocks, optional 4-pass interlace row
    order."""
    palette: dict[tuple[int, int, int], int] = {}
    indices: list[int] = []
    for p in pixels:
        slot = palette.get(p)
        if slot is None:
            if len(palette) == 256:
                raise ValueError("GIF encode: more than 256 unique colors")
            slot = palette[p] = len(palette)
        indices.append(slot)
    gct_bits = max(1, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    # GCT present | color resolution (gct_bits-1) | GCT size (2^(n+1))
    out += bytes([0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0])
    for rgb in palette:
        out += bytes(rgb)
    out += b"\x00\x00\x00" * ((1 << gct_bits) - len(palette))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        indices = [
            indices[y * width + x]
            for y in _gif_interlace_order(height)
            for x in range(width)
        ]
    min_code_size = max(2, gct_bits)
    lzw = _gif_lzw_encode(indices, min_code_size)
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_rgb8_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode the first image of a GIF87a/89a into row-major TOP-DOWN
    (r, g, b) pixels: (width, height, pixels).

    Real decoder, not a fixture inverse: walks the logical screen
    descriptor, global color table, extension blocks (graphic control /
    comment / application — skipped by sub-block length, per spec),
    local color table override, the 4-pass interlace reorder, and the
    variable-width LZW stream. Fails fast (ValueError) on truncation,
    bad magic, out-of-range LZW codes, or palette-less images."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, flags = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(payload) < pos + 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = [
            (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended before any image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            raise ValueError("GIF trailer before any image descriptor")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        break
    if len(payload) < pos + 9:
        raise ValueError("truncated GIF image descriptor")
    _ix, _iy, width, height, iflags = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if width == 0 or height == 0:
        raise ValueError(f"invalid GIF dimensions {width}x{height}")
    palette = gct
    if iflags & 0x80:  # local color table overrides
        n = 2 << (iflags & 0x07)
        if len(payload) < pos + 3 * n:
            raise ValueError("truncated GIF local color table")
        palette = [
            (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    if not palette:
        raise ValueError("GIF image has no color table")
    if pos >= len(payload):
        raise ValueError("truncated GIF before LZW min code size")
    min_code_size = payload[pos]
    pos += 1
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            break
        if len(payload) < pos + sz:
            raise ValueError("truncated GIF data sub-block")
        chunks.append(payload[pos : pos + sz])
        pos += sz
    indices = _gif_lzw_decode(b"".join(chunks), min_code_size, width * height)
    npal = len(palette)
    bad = next((i for i in indices if i >= npal), None)
    if bad is not None:
        raise ValueError(f"GIF pixel index {bad} outside {npal}-color palette")
    pixels = [palette[i] for i in indices]
    if iflags & 0x40:  # interlaced: pass order -> top-down rows
        ordered: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * height)
        for src, y in enumerate(_gif_interlace_order(height)):
            ordered[y * width : (y + 1) * width] = pixels[
                src * width : (src + 1) * width
            ]
        pixels = ordered
    return width, height, pixels


def decode_gif_rgb8(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode a GIF into the same integer stat tuple as
    :func:`decode_bmp_24`. Thin stats wrapper over
    :func:`decode_gif_rgb8_pixels` — one decode path."""
    return _pixel_stats(*decode_gif_rgb8_pixels(payload))


# ---------------------------------------------------------------------------
# TIFF (baseline, TIFF 6.0) — the fifth real still-image codec behind
# the multimodal boundary. Both byte orders (II/MM), strip-organized,
# gray8 / RGB8 / palette photometrics, uncompressed / PackBits /
# LZW-with-horizontal-predictor compression. TIFF LZW differs from GIF
# LZW in three load-bearing ways this implementation is explicit about:
# MSB-first code packing, a string table seeded with 256 roots +
# Clear(256)/EOI(257), and the "early change" rule — the code width
# grows one code EARLIER than the table-size boundary (at 510/1022/2046
# entries), a deviation baked into the spec's reference implementation
# that every real reader/writer follows. Compression state resets per
# STRIP (strips are the parallel-decode unit at scale — each strip is
# independently decompressable, which is exactly what a distributed
# reader wants).


def _tiff_packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): n in [0,127] -> copy n+1 literal
    bytes; n in [-127,-1] -> repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError(f"PackBits ended at {len(out)}/{expected} bytes")
    return bytes(out[:expected])


def _tiff_packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        # find run length at i
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # repeat run of (j-i+1) >= 2
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:  # literal run until next >=3 repeat (or 128 cap)
            start = i
            while (
                i < len(data)
                and i - start < 128
                and not (
                    i + 2 < len(data)
                    and data[i + 1] == data[i]
                    and data[i + 2] == data[i]
                )
            ):
                i += 1
            out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW (TIFF 6.0 §13): MSB-first codes, 256 byte roots,
    Clear=256/EOI=257, early-change width growth at table sizes
    510/1022/2046, 12-bit ceiling. Fails fast on codes beyond the
    table or a stream that ends before ``expected`` bytes."""
    CLEAR, EOI = 256, 257
    roots = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(roots)
    width = 9
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            break
        if code == CLEAR:
            table = list(roots)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: first code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # early change: widen one entry BEFORE the power boundary
            if len(table) in (510, 1022, 2046):
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError(f"TIFF LZW ended at {len(out)}/{expected} bytes")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code == 4094:  # table full: explicit clear, restart
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        else:
            table[nxt] = next_code
            next_code += 1
            # early change: the ENCODER widens when the next code to be
            # EMITTED could be the first of the wider range
            if next_code in (511, 1023, 2047):
                width += 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
        # The decoder adds one more table entry after this final code
        # (the encoder does not — there is no following byte), so its
        # width for reading EOI is driven by next_code + 1: widen here
        # exactly when that phantom add crosses an early-change
        # boundary. (At 511/1023/2047 the regular check above already
        # widened.)
        if next_code in (510, 1022, 2046):
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_hpredict_undo(row: bytearray, spp: int) -> None:
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


def _tiff_hpredict_apply(row: bytearray, spp: int) -> None:
    for i in range(len(row) - 1, spp - 1, -1):
        row[i] = (row[i] - row[i - spp]) & 0xFF


def decode_tiff_rgb8_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode the first IFD of a baseline TIFF into row-major top-down
    (r, g, b) pixels: (width, height, pixels).

    Real decoder: II/MM byte-order dispatch, 12-byte IFD entry walk
    with inline-vs-offset value resolution, per-strip decompression
    (none / PackBits / LZW), optional horizontal predictor, and
    photometric mapping (gray BlackIsZero/WhiteIsZero, RGB, 16-bit
    ColorMap palette). Planar configuration 2, tiles, and non-8-bit
    samples raise — the explicit-variant honesty of the other codecs.
    """
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}
    type_fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        if off + 12 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, off)
        if typ not in type_size:
            continue  # rational/unknown types: not needed for baseline
        nbytes = type_size[typ] * count
        voff = off + 8 if nbytes <= 4 else struct.unpack_from(bo + "I", payload, off + 8)[0]
        if voff + nbytes > len(payload):
            raise ValueError(f"TIFF tag {tag} value out of range")
        if typ in (2, 7):
            continue  # ASCII / undefined payloads unused here
        vals = list(
            struct.unpack_from(bo + str(count) + type_fmt[typ], payload, voff)
        )
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    width, height = one(256), one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    rows_per_strip = one(278, height)
    planar = one(284, 1)
    predictor = one(317, 1)
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError("only 8-bit TIFF samples supported")
    if planar != 1:
        raise ValueError("only chunky planar configuration supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strips only)")
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and compression == 1:
        raise ValueError("predictor on uncompressed TIFF is non-standard")
    if photometric in (0, 1):
        if spp != 1:
            raise ValueError("gray TIFF must have 1 sample per pixel")
    elif photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF needs >=3 samples per pixel")
    elif photometric == 3:
        if spp != 1 or 320 not in tags:
            raise ValueError("palette TIFF needs 1 sample + ColorMap")
    else:
        raise ValueError(f"unsupported TIFF photometric {photometric}")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    n_strips = (height + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != n_strips:
        raise ValueError("TIFF strip count mismatch")

    stride = width * spp
    raw = bytearray()
    for s, (so, sc) in enumerate(zip(offsets, counts)):
        if so + sc > len(payload):
            raise ValueError("TIFF strip out of range")
        rows = min(rows_per_strip, height - s * rows_per_strip)
        expected = rows * stride
        chunk = payload[so : so + sc]
        if compression == 1:
            if len(chunk) < expected:
                raise ValueError("TIFF uncompressed strip too short")
            decoded = bytes(chunk[:expected])
        elif compression == 32773:
            decoded = _tiff_packbits_decode(chunk, expected)
        else:
            decoded = _tiff_lzw_decode(chunk, expected)
        if predictor == 2:
            buf = bytearray(decoded)
            for r in range(rows):
                row = buf[r * stride : (r + 1) * stride]
                _tiff_hpredict_undo(row, spp)
                buf[r * stride : (r + 1) * stride] = row
            decoded = bytes(buf)
        raw += decoded

    pixels: list[tuple[int, int, int]] = []
    if photometric == 2:
        # extra samples (e.g. alpha) beyond the first three are dropped
        for p in range(width * height):
            o = p * spp
            pixels.append((raw[o], raw[o + 1], raw[o + 2]))
    elif photometric == 3:
        cmap = tags[320]
        n = len(cmap) // 3
        if len(cmap) != 3 * 256:
            raise ValueError("TIFF ColorMap must have 3*256 entries")
        for v in raw:
            if v >= n:
                raise ValueError("TIFF palette index out of range")
            # ColorMap entries are 16-bit; fold to 8 by the high byte
            pixels.append(
                (cmap[v] >> 8, cmap[256 + v] >> 8, cmap[512 + v] >> 8)
            )
    else:
        inv = photometric == 0  # WhiteIsZero
        for v in raw:
            g = 255 - v if inv else v
            pixels.append((g, g, g))
    return width, height, pixels


def encode_tiff_rgb8(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    *,
    compression: int = 1,
    predictor: int = 1,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
    photometric: int = 2,
) -> bytes:
    """Serialize row-major (r, g, b) pixels as a baseline TIFF — the
    encoder twin of :func:`decode_tiff_rgb8_pixels` for the
    meet-in-the-middle oracle. Gray content can be written as
    photometric 1 (``photometric=1`` requires r==g==b per pixel);
    multi-strip, both byte orders, compression 1/5/32773, horizontal
    predictor with LZW."""
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1 (none), 5 (LZW) or 32773")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 only with LZW here")
    bo = byte_order
    if photometric == 1:
        if any(r != g or g != b for r, g, b in pixels):
            raise ValueError("photometric 1 requires gray content")
        spp = 1
        flat = bytes(p[0] for p in pixels)
    elif photometric == 2:
        spp = 3
        flat = b"".join(bytes(p) for p in pixels)
    else:
        raise ValueError("encoder writes photometric 1 or 2 only")
    stride = width * spp
    rps = rows_per_strip or height

    strips: list[bytes] = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        chunk = bytearray(flat[y0 * stride : (y0 + rows) * stride])
        if predictor == 2:
            for r in range(rows):
                row = chunk[r * stride : (r + 1) * stride]
                _tiff_hpredict_apply(row, spp)
                chunk[r * stride : (r + 1) * stride] = row
        if compression == 1:
            strips.append(bytes(chunk))
        elif compression == 32773:
            strips.append(_tiff_packbits_encode(bytes(chunk)))
        else:
            strips.append(_tiff_lzw_encode(bytes(chunk)))

    # layout: header(8) | strip data | IFD | out-of-line values
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 0)
    data_off = 8
    strip_offsets = []
    body = bytearray()
    for s in strips:
        strip_offsets.append(data_off + len(body))
        body += s
    ifd_off = data_off + len(body)

    entries: list[tuple[int, int, list[int]]] = [  # tag, type, values
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (273, 4, strip_offsets),
        (277, 3, [spp]),
        (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((317, 3, [predictor]))
    entries.sort()
    type_size = {3: 2, 4: 4}
    type_fmt = {3: "H", 4: "I"}
    ifd = struct.pack(bo + "H", len(entries))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, vals in entries:
        nbytes = type_size[typ] * len(vals)
        packed = struct.pack(bo + str(len(vals)) + type_fmt[typ], *vals)
        if nbytes <= 4:
            val = packed + b"\x00" * (4 - nbytes)
        else:
            val = struct.pack(bo + "I", extra_base + len(extra))
            extra += packed
        ifd += struct.pack(bo + "HHI", tag, typ, len(vals)) + val
    ifd += struct.pack(bo + "I", 0)  # next-IFD terminator
    out = bytearray(header)
    struct.pack_into(bo + "I", out, 4, ifd_off)
    return bytes(out + body + ifd + extra)


def decode_tiff_rgb8(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode a TIFF into the same integer stat tuple as
    :func:`decode_bmp_24`. Thin stats wrapper over
    :func:`decode_tiff_rgb8_pixels` — one decode path."""
    return _pixel_stats(*decode_tiff_rgb8_pixels(payload))


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


def encode_wav_g711(encoded: bytes, rate: int = 8000, *, alaw: bool = False) -> bytes:
    """Serialize already-companded G.711 bytes as a mono 8-bit
    RIFF/WAVE file (format code 6 = A-law, 7 = mu-law) — the encoder
    twin of :func:`decode_wav_g711`."""
    fmt = struct.pack("<HHIIHH", 6 if alaw else 7, 1, rate, rate, 1, 8)
    pad = b"\x00" if len(encoded) & 1 else b""  # RIFF word alignment
    return (
        b"RIFF"
        + struct.pack(
            "<I", 4 + 8 + len(fmt) + 8 + len(encoded) + len(pad)
        )
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(encoded))
        + encoded
        + pad
    )


# MPEG-1 Layer III frame-header constants (public ISO/IEC 11172-3
# tables): bitrate index 1..14 -> kbps (0 = free-form, 15 = invalid),
# sample-rate index 0..2 (3 = reserved). Header stats only — full
# audio decode (huffman spectral data, IMDCT, synthesis filterbank)
# stays behind the StubImageCodec boundary.
_MP3_BITRATE_KBPS = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_SAMPLE_RATES = (44100, 48000, 32000)
MP3_STATS_SCHEMA = (
    "doc_id long, n_frames int, sample_rate int, "
    "kbps_min int, kbps_max int, kbps_sum bigint, total_bytes bigint"
)


def encode_mp3_headers(
    frames: list[tuple[int, int]], sample_rate_idx: int, *, id3_size: int | None = None
) -> bytes:
    """Serialize a standards-conformant MPEG-1 Layer III frame-header
    stream: each ``(bitrate_idx, padding)`` becomes a 4-byte frame
    header plus a deterministic filler body of the exact frame length
    (``144 * bitrate / sample_rate + padding`` bytes, ISO 11172-3
    2.4.3.1). ``id3_size`` prepends an ID3v2.4 container with a
    syncsafe size field. The body bytes are arbitrary to a header
    walker — which is the point: frame-level stats must come from the
    headers alone."""
    out = bytearray()
    if id3_size is not None:
        ss = bytes(
            [(id3_size >> s) & 0x7F for s in (21, 14, 7, 0)]
        )  # syncsafe: 7 bits per byte
        out += b"ID3" + bytes([4, 0, 0]) + ss
        out += bytes((i * 29 + 7) % 256 for i in range(id3_size))
    sr = _MP3_SAMPLE_RATES[sample_rate_idx]
    for bridx, pad in frames:
        if not 1 <= bridx <= 14:
            raise ValueError(f"bitrate index {bridx} out of range")
        kbps = _MP3_BITRATE_KBPS[bridx]
        flen = 144000 * kbps // sr + pad
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, Layer III, no CRC
        b2 = (bridx << 4) | (sample_rate_idx << 2) | (pad << 1)
        out += bytes([0xFF, b1, b2, 0])
        out += bytes((i * 37 + bridx) % 256 for i in range(flen - 4))
    return bytes(out)


def decode_mp3_frame_stats(
    payload: bytes,
) -> tuple[int, int, int, int, int, int]:
    """Walk an MPEG-1 Layer III stream's frame headers (NOT the audio
    data): returns (n_frames, sample_rate, kbps_min, kbps_max,
    kbps_sum, total_bytes). Skips a leading ID3v2 container via its
    syncsafe size. Strict like the other codecs: lost sync, reserved
    indices, free-form bitrate, mid-stream sample-rate changes, and
    truncated frames all raise the quarantine class (ValueError)."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("corrupt ID3v2 syncsafe size")
            size = (size << 7) | b
        pos = 10 + size
        if pos > len(payload):
            raise ValueError("ID3v2 size past end of payload")
    n = kbps_sum = 0
    kmin = kmax = sr = None
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at {pos}")
        if (b1 >> 3) & 0x3 != 3 or (b1 >> 1) & 0x3 != 1:
            raise ValueError("only MPEG-1 Layer III frames supported")
        bridx = (b2 >> 4) & 0xF
        sridx = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 1
        if bridx == 0:
            raise ValueError("free-form bitrate not supported")
        if bridx == 15:
            raise ValueError("invalid bitrate index 15")
        if sridx == 3:
            raise ValueError("reserved sample-rate index")
        kbps = _MP3_BITRATE_KBPS[bridx]
        this_sr = _MP3_SAMPLE_RATES[sridx]
        if sr is None:
            sr = this_sr
        elif sr != this_sr:
            raise ValueError("sample rate changed mid-stream")
        flen = 144000 * kbps // this_sr + pad
        if pos + flen > len(payload):
            raise ValueError("truncated MP3 frame body")
        n += 1
        kbps_sum += kbps
        kmin = kbps if kmin is None else min(kmin, kbps)
        kmax = kbps if kmax is None else max(kmax, kbps)
        pos += flen
    if n == 0:
        raise ValueError("no MP3 frames in payload")
    return n, sr, kmin, kmax, kbps_sum, len(payload)


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12) — container-level
# stats for the VIDEO modality, the analog of the MP3 frame-header walk:
# duration/timescale from `mvhd`, track count + presentation dimensions
# from `tkhd`, handler kinds from `hdlr`, codec fourccs from `stsd`
# sample entries, payload size from `mdat` (incl. the 64-bit largesize
# form). This is the standard first pass over a crawled video corpus —
# duration histograms, resolution buckets and codec mixes without
# touching a single coded frame. Coded-stream decode (H.264/H.265/AAC)
# stays behind the StubImageCodec boundary.

MP4_STATS_SCHEMA = (
    "doc_id long, timescale int, duration_ms bigint, n_tracks int, "
    "n_video int, n_audio int, width int, height int, codecs string, "
    "mdat_bytes bigint"
)

# container boxes whose payload is a sequence of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_box(btype: bytes, body: bytes, *, largesize: bool = False) -> bytes:
    """Serialize one box. ``largesize`` writes the size==1 + 64-bit
    form (ISO 14496-12 §4.2) regardless of actual length — real muxers
    emit it for >4 GiB ``mdat``; the fixture uses it on small boxes so
    the decode path is still on the checked path at test scale."""
    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", len(body) + 16
        ) + body
    return struct.pack(">I", len(body) + 8) + btype + body


def _mp4_fullbox(btype: bytes, version: int, body: bytes) -> bytes:
    return _mp4_box(btype, bytes([version, 0, 0, 0]) + body)


def encode_mp4_metadata(
    *,
    timescale: int,
    duration: int,
    width: int,
    height: int,
    n_audio: int = 0,
    version: int = 0,
    free_bytes: int = 0,
    mdat_bytes: int = 0,
    mdat_largesize: bool = False,
) -> bytes:
    """Serialize a minimal conformant ISO BMFF file — the encoder twin
    of :func:`decode_mp4_stats` for the meet-in-the-middle oracle:
    ``ftyp`` + ``moov`` (``mvhd`` and one ``avc1`` video track plus
    ``n_audio`` ``mp4a`` audio tracks, each a full
    trak/tkhd/mdia/mdhd/hdlr/minf/stbl/stsd spine) + an optional
    ``free`` box + ``mdat``. ``version`` selects the 32-bit (0) or
    64-bit (1) time fields in mvhd/tkhd/mdhd; ``mdat_largesize``
    forces the size==1 + 64-bit box length form."""
    if version not in (0, 1):
        raise ValueError("version must be 0 or 1")
    t32 = struct.pack(">I", 0)
    t64 = struct.pack(">Q", 0)
    ts_dur = (
        t64 + t64 + struct.pack(">I", timescale) + struct.pack(">Q", duration)
        if version
        else t32 + t32 + struct.pack(">I", timescale) + struct.pack(">I", duration)
    )
    matrix = struct.pack(
        ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    mvhd = _mp4_fullbox(
        b"mvhd",
        version,
        ts_dur
        + struct.pack(">i", 0x10000)  # rate 1.0
        + struct.pack(">h", 0x100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + matrix
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2 + n_audio),  # next_track_ID
    )

    def _trak(track_id: int, handler: bytes, entry: bytes, w: int, h: int) -> bytes:
        tk_times = (
            t64 + t64 + struct.pack(">I", track_id) + t32
            + struct.pack(">Q", duration)
            if version
            else t32 + t32 + struct.pack(">I", track_id) + t32
            + struct.pack(">I", duration)
        )
        tkhd = _mp4_fullbox(
            b"tkhd",
            version,
            tk_times
            + b"\x00" * 8  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/reserved
            + matrix
            + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
        )
        md_times = (
            t64 + t64 + struct.pack(">I", 48000) + struct.pack(">Q", 0)
            if version
            else t32 + t32 + struct.pack(">I", 48000) + t32
        )
        mdhd = _mp4_fullbox(
            b"mdhd", version, md_times + struct.pack(">HH", 0x55C4, 0)
        )  # language 'und'
        name = b"VideoHandler\x00" if handler == b"vide" else b"SoundHandler\x00"
        hdlr = _mp4_fullbox(
            b"hdlr", 0, t32 + handler + b"\x00" * 12 + name
        )
        stsd = _mp4_fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
        header_box = (
            _mp4_box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
            if handler == b"vide"
            else _mp4_box(b"smhd", b"\x00" * 8)
        )
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", header_box + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"trak", tkhd + mdia)

    # VisualSampleEntry (ISO 14496-12 §12.1.3): 86 bytes without avcC
    avc1 = _mp4_box(
        b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + t32
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    # AudioSampleEntry (§12.2.3): 36 bytes
    mp4a = _mp4_box(
        b"mp4a",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HHHH", 2, 16, 0, 0)  # channels, samplesize
        + struct.pack(">I", 48000 << 16),
    )
    traks = _trak(1, b"vide", avc1, width, height)
    for i in range(n_audio):
        traks += _trak(2 + i, b"soun", mp4a, 0, 0)
    moov = _mp4_box(b"moov", mvhd + traks)
    ftyp = _mp4_box(
        b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp42"
    )
    out = ftyp + moov
    if free_bytes:
        out += _mp4_box(b"free", bytes(i * 41 % 256 for i in range(free_bytes)))
    out += _mp4_box(
        b"mdat",
        bytes(i * 59 % 256 for i in range(mdat_bytes)),
        largesize=mdat_largesize,
    )
    return out


def _mp4_walk_children(payload: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each child box in
    [pos, end); strict — sizes must tile the range exactly."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated MP4 box header at {pos}")
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope (§4.2)
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"MP4 box {btype!r} size {size} overruns scope at {pos}"
            )
        yield btype, body, pos + size
        pos += size


def decode_mp4_stats(
    payload: bytes,
) -> tuple[int, int, int, int, int, int, int, str, int]:
    """Walk an ISO BMFF container's box tree (NOT the coded streams):
    returns (timescale, duration_ms, n_tracks, n_video, n_audio, width,
    height, codecs, mdat_bytes). Duration/timescale from ``mvhd`` (v0
    and v1), per-track handler kind from ``hdlr``, presentation
    dimensions from the FIRST video track's ``tkhd`` 16.16 fields,
    codec fourccs from ``stsd`` sample entries (sorted, deduped,
    comma-joined), ``mdat_bytes`` summed over mdat box bodies incl. the
    size==1 largesize form. Strict like the other codecs: a box whose
    size overruns its scope, a missing/duplicated ``moov``/``mvhd``, a
    version the spec doesn't define, or a ``stsd`` whose entry count
    disagrees with its byte span all raise the quarantine class
    (ValueError)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (no ftyp)")
    timescale = duration = None
    n_tracks = n_video = n_audio = 0
    width = height = None
    codecs: set[str] = set()
    mdat_bytes = 0
    saw_moov = False

    def _fullbox(body_start: int, body_end: int) -> tuple[int, int]:
        if body_start + 4 > body_end:
            raise ValueError("truncated MP4 fullbox header")
        return payload[body_start], body_start + 4

    def _stbl(spos: int, send: int) -> None:
        for btype, b0, bend in _mp4_walk_children(payload, spos, send):
            if btype != b"stsd":
                continue
            _, p = _fullbox(b0, bend)
            if p + 4 > bend:
                raise ValueError("truncated stsd")
            (count,) = struct.unpack_from(">I", payload, p)
            entries = list(_mp4_walk_children(payload, p + 4, bend))
            if len(entries) != count:
                raise ValueError(
                    f"stsd declares {count} entries, {len(entries)} present"
                )
            for etype, _, _ in entries:
                codecs.add(etype.decode("ascii", "replace"))

    # track-kind accounting needs hdlr, which arrives after tkhd; walk
    # each trak fully, then classify
    for btype, b0, bend in _mp4_walk_children(payload, 0, len(payload)):
        if btype == b"moov":
            if saw_moov:
                raise ValueError("duplicate moov box")
            saw_moov = True
            for mtype, m0, mend in _mp4_walk_children(payload, b0, bend):
                if mtype == b"mvhd":
                    if timescale is not None:
                        raise ValueError("duplicate mvhd box")
                    ver, p = _fullbox(m0, mend)
                    if ver == 1:
                        timescale, duration = struct.unpack_from(
                            ">xxxxxxxxxxxxxxxxIQ", payload, p
                        )
                    elif ver == 0:
                        _, _, timescale, duration = struct.unpack_from(
                            ">IIII", payload, p
                        )
                    else:
                        raise ValueError(f"mvhd version {ver} undefined")
                    if timescale == 0:
                        raise ValueError("mvhd timescale is zero")
                elif mtype == b"trak":
                    # classify by walking; hdlr tells video from audio
                    kind_box: list[bytes] = []
                    t_dims: list[tuple[int, int]] = []
                    for bt, c0, cend in _mp4_walk_children(payload, m0, mend):
                        if bt == b"tkhd":
                            ver, p = _fullbox(c0, cend)
                            if ver not in (0, 1):
                                raise ValueError(
                                    f"tkhd version {ver} undefined"
                                )
                            # times(2)+track_id+reserved+duration
                            # (32 bytes at v1, 20 at v0), then 8
                            # reserved + 8 layer/group/volume + 36 matrix
                            p += (32 if ver else 20) + 52
                            if p + 8 > cend:
                                raise ValueError("truncated tkhd")
                            w_fix, h_fix = struct.unpack_from(
                                ">II", payload, p
                            )
                            t_dims.append((w_fix >> 16, h_fix >> 16))
                        elif bt == b"mdia":
                            for mt, d0, dend in _mp4_walk_children(
                                payload, c0, cend
                            ):
                                if mt == b"hdlr":
                                    _, p = _fullbox(d0, dend)
                                    if p + 8 > dend:
                                        raise ValueError("truncated hdlr")
                                    kind_box.append(payload[p + 4 : p + 8])
                                elif mt == b"minf":
                                    for st, s0, send in _mp4_walk_children(
                                        payload, d0, dend
                                    ):
                                        if st == b"stbl":
                                            _stbl(s0, send)
                    n_tracks += 1
                    if kind_box and kind_box[0] == b"vide":
                        n_video += 1
                        if width is None and t_dims:
                            width, height = t_dims[0]
                    elif kind_box and kind_box[0] == b"soun":
                        n_audio += 1
        elif btype == b"mdat":
            mdat_bytes += bend - b0
        # ftyp / free / skip / uuid / anything else: skipped by size

    if not saw_moov or timescale is None:
        raise ValueError("no moov/mvhd in payload")
    duration_ms = duration * 1000 // timescale
    return (
        timescale,
        duration_ms,
        n_tracks,
        n_video,
        n_audio,
        width if width is not None else 0,
        height if height is not None else 0,
        ",".join(sorted(codecs)),
        mdat_bytes,
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
        if pos + 8 + sz > len(payload):
            # a declared chunk size past EOF is a truncated file; a
            # silently-shortened slice would compute stats on partial
            # audio with no signal that anything was lost
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {sz} bytes, "
                f"{len(payload) - pos - 8} present"
            )
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


# G.711 expansion (ITU-T G.711, the Sun *law2linear form): both
# companded telephony codings expand one encoded byte to a 13/14-bit
# linear sample. Pure integer arithmetic, so an external oracle can
# replay the exact formulas.


def _ulaw_to_linear(u: int) -> int:
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw_to_linear(a: int) -> int:
    a ^= 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def decode_wav_g711(payload: bytes) -> tuple[str, int, int, int, int, int]:
    """Decode a G.711 companded mono WAV (format code 6 = A-law, 7 =
    mu-law, 8-bit samples — the telephony-corpus formats) into expanded
    linear sample stats: (coding, sample_rate, n_samples, sample_sum,
    s_min, s_max). Same strict RIFF chunk walk as
    :func:`decode_wav_pcm16` (kept separate so widening the codec
    surface does not touch the attested PCM16 path); PCM payloads
    raise — this stage is explicitly the companded-decode edge."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data, fmt_code = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + sz > len(payload):
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {sz} bytes, "
                f"{len(payload) - pos - 8} present"
            )
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_code not in (6, 7) or bits != 8 or channels != 1:
                raise ValueError(
                    "only mono 8-bit G.711 (format 6/7) supported here"
                )
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    expand = _alaw_to_linear if fmt_code == 6 else _ulaw_to_linear
    samples = [expand(b) for b in data]
    return (
        "alaw" if fmt_code == 6 else "ulaw",
        rate,
        len(samples),
        sum(samples),
        min(samples),
        max(samples),
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (grayscale, pure stdlib): huffman + DCT, no codec libs
# ---------------------------------------------------------------------------

# Zigzag scan order: position in the 64-coefficient scan -> linear index
# (row*8 + col) in the 8x8 block (ITU-T T.81 figure 5).
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K typical luminance huffman tables: (bits-per-code-length 1..16,
# symbol values in code order). Public spec constants; both sides of the
# codec build canonical codes from the same spec, so encode/decode are
# consistent by construction and the tables make the output a standard
# baseline JFIF stream.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for the bit-at-a-time reader."""
    return {
        (length, code): sym
        for sym, (code, length) in _jpeg_huff_codes(bits, vals).items()
    }


_DCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_DCT_C = [1 / math.sqrt(2)] + [1.0] * 7
# Separable DCT basis A[x, u] = C[u] * cos((2x+1)u*pi/16): both
# transforms become two 8x8 matrix products (numpy, one BLAS call each)
# instead of the naive 4096-multiply quadruple loop — the profiled
# decode hot spot (84% of decode CPU was the loop IDCT). np.rint
# matches round()'s half-to-even, so results are identical up to
# summation-order ulps; DC-only blocks (every block of the closed-form
# fixture) take an exact integer fast path.
_DCT_A = np.array(
    [[_DCT_C[u] * _DCT_COS[x][u] for u in range(8)] for x in range(8)]
)


def _fdct8x8(block: list[int]) -> list[int]:
    """Forward 8x8 DCT-II of level-shifted samples, rounded to int
    coefficients (row-major block of 0..255 grays in, 64 coefficients
    out in row-major frequency order): 0.25 * A.T @ shifted @ A."""
    shifted = np.asarray(block, dtype=np.float64).reshape(8, 8) - 128.0
    out = 0.25 * (_DCT_A.T @ shifted @ _DCT_A)
    return np.rint(out).astype(np.int64).reshape(64).tolist()


def _idct8x8(coef: list[int]) -> list[int]:
    """Inverse 8x8 DCT (row-major frequency order in), +128 level shift,
    clamped 0..255: 0.25 * A @ coef @ A.T."""
    if not any(coef[1:]):
        # DC-only block: every sample is round(dc/8) + 128 exactly
        # (C0^2 * cos0^2 * 0.25 = 1/8) — the bit-exactness the
        # block-constant oracle fixture builds on, kept float-free.
        val = round(0.125 * coef[0]) + 128
        val = 0 if val < 0 else (255 if val > 255 else val)
        return [val] * 64
    m = np.asarray(coef, dtype=np.float64).reshape(8, 8)
    out = np.rint(0.25 * (_DCT_A @ m @ _DCT_A.T)) + 128.0
    return np.clip(out, 0.0, 255.0).astype(np.int64).reshape(64).tolist()


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill, spec padding


def _jpeg_category(v: int) -> tuple[int, int]:
    """DPCM/AC value -> (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    cat = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_gray(
    width: int, height: int, pixels: list[int], *, restart_interval: int = 0
) -> bytes:
    """Serialize row-major grayscale pixels (0..255) as a standard
    BASELINE JFIF JPEG (pure stdlib): single 8-bit component, no
    subsampling, all-ones quantization table, Annex K luminance huffman
    tables, real forward DCT + DPCM DC + run-length AC entropy coding,
    byte stuffing. ``restart_interval`` > 0 additionally emits a DRI
    segment and byte-aligned RSTn markers every that many MCUs with DC
    predictor resets (T.81 E.1.2).

    All-ones quantization means the only loss is DCT rounding (±1 on
    smooth content, exactly 0 on per-block-constant content — the
    property the meet-in-the-middle oracle builds on; see
    :func:`attach_jpeg_payloads`). Edge blocks pad by edge replication,
    which the decoder crops back off.
    """
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = ((width + 7) // 8) * 8
    bh = ((height + 7) // 8) * 8

    def px(x: int, y: int) -> int:
        return pixels[min(y, height - 1) * width + min(x, width - 1)]

    w = _JpegBitWriter()
    prev_dc = 0
    mcu_i = 0
    rst = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.flush()  # 1-pad to byte boundary (stuffed if 0xFF)
                w.buf += bytes([0xFF, 0xD0 + rst])  # markers are not stuffed
                rst = (rst + 1) & 7
                prev_dc = 0
            mcu_i += 1
            block = [px(bx + x, by + y) for y in range(8) for x in range(8)]
            coef = _fdct8x8(block)  # qtable all ones: quantize = identity
            zz = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
            cat, bits = _jpeg_category(zz[0] - prev_dc)
            prev_dc = zz[0]
            w.put(*dc_codes[cat])
            if cat:
                w.put(bits, cat)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    w.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                cat, bits = _jpeg_category(zz[i])
                w.put(*ac_codes[(run << 4) | cat])
                w.put(bits, cat)
                run = 0
            if last_nz < 63:
                w.put(*ac_codes[0x00])  # EOB
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtable = bytes([0]) + bytes(1 for _ in range(64))  # id 0, all ones
    sof = struct.pack(">BHHB", 8, bh, bw, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, jfif)
        + seg(0xFFDB, qtable)
        + _jpeg_crop_app(width, height, bw, bh)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht)
        + dri
        + seg(0xFFDA, sos)
        + bytes(w.buf)
        + b"\xff\xd9"  # EOI
    )


# Progressive scans emit EOBn symbols (0x10..0xE0: end-of-band runs
# spanning 2^n..2^(n+1)-1 blocks) that the Annex K baseline tables do
# not contain — real progressive encoders ship custom per-image tables
# in their DHT segments. This encoder uses one FIXED complete table
# covering every (run, size) byte 0x00..0xFF: 255 canonical codes of
# length 9 plus one of length 10 (no all-ones code, per T.81 C.2). Not
# size-optimal, but spec-valid, deterministic, and decodable by any
# conformant reader — the decoder side always reconstructs from DHT, so
# it handles optimized tables from foreign encoders just the same.
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_JPEG_PROG_AC_VALS = list(range(256))

# Default scan script: the standard 6-scan luminance successive-
# approximation ladder (DC first at Al=1, two AC spectral bands at
# Al=2, then three refinement scans down to full precision) — the same
# shape libjpeg emits for grayscale progressive output.
_JPEG_PROG_SCRIPT: tuple[tuple[int, int, int, int], ...] = (
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (0, 0, 1, 0),
    (1, 63, 1, 0),
)


def _enc_ac_first_scan(
    wtr: "_JpegBitWriter",
    blocks: list[list[int]],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """Encode one AC first-pass scan (Ah=0): T.81 G.1.2.2 — run-length
    coding of the point-transformed band with EOBn end-of-band runs."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            wtr.put(*ac_codes[nb << 4])
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            eobrun = 0

    for zz in blocks:
        band = [
            (abs(zz[k]) >> al) * (1 if zz[k] >= 0 else -1)
            for k in range(ss, se + 1)
        ]
        last_nz = -1
        for i, v in enumerate(band):
            if v:
                last_nz = i
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                wtr.put(*ac_codes[0xF0])
                run -= 16
            cat, bits = _jpeg_category(v)
            wtr.put(*ac_codes[(run << 4) | cat])
            wtr.put(bits, cat)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine_scan(
    wtr: "_JpegBitWriter",
    blocks: list[list[int]],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """Encode one AC refinement scan (Ah=Al+1): T.81 G.1.2.3.

    The fiddly part of progressive JPEG: already-significant
    coefficients are invisible to zero-runs and contribute one raw
    correction bit each, emitted interleaved in coefficient order —
    buffered after the huffman symbol (and sign bit) that the decoder
    reads before walking over them; block tails with no newly-
    significant coefficient fold into an EOBn run whose buffered
    correction bits ride behind the EOBn symbol."""
    eobrun = 0
    pending: list[int] = []  # correction bits owed with the EOB run

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            nb = eobrun.bit_length() - 1
            wtr.put(*ac_codes[nb << 4])
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            for b in pending:
                wtr.put(b, 1)
            pending = []
            eobrun = 0

    for zz in blocks:
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        # index of the LAST newly-significant coefficient: zero-runs
        # beyond it fold into the EOB run instead of ZRL symbols
        eob = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            # ZRL flushes happen at EVERY nonzero coefficient while a
            # newly-significant one is still ahead (i <= eob) — flushing
            # only at t == 1 would emit correction bits for coefficients
            # beyond the 16 zeros a ZRL spans, desynchronizing the
            # decoder's interleaved walk (T.81 G.1.2.3 / figure G.7).
            while run > 15 and i <= eob:
                flush_eob()
                wtr.put(*ac_codes[0xF0])
                run -= 16
                for b in br:
                    wtr.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)  # already significant: correction bit
                continue
            flush_eob()
            wtr.put(*ac_codes[(run << 4) | 1])
            wtr.put(0 if zz[ss + i] < 0 else 1, 1)  # sign: 1 = positive
            for b in br:
                wtr.put(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_gray_progressive(
    width: int,
    height: int,
    pixels: list[int],
    *,
    script: tuple[tuple[int, int, int, int], ...] = _JPEG_PROG_SCRIPT,
    restart_interval: int = 0,
) -> bytes:
    """Serialize row-major grayscale pixels as a PROGRESSIVE JFIF JPEG
    (SOF2): the same single-component / all-ones-quantization layout as
    :func:`encode_jpeg_gray`, entropy-coded as a multi-scan spectral-
    selection + successive-approximation ladder (T.81 annex G).

    ``script`` is a sequence of ``(Ss, Se, Ah, Al)`` scans. The default
    is the standard 6-scan luminance ladder; a spectral-selection-only
    script like ``((0,0,0,0), (1,63,0,0))`` is also valid. Coefficient
    transport is LOSSLESS regardless of script (progressive re-orders
    the same quantized coefficients baseline sends in one pass), so the
    decode equals the baseline decode of the same pixels bit-for-bit —
    the property the round-trip tests and the meet-in-the-middle oracle
    (:func:`attach_jpeg_progressive_payloads`) build on.
    """
    _validate_prog_script(script)
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
    bw = ((width + 7) // 8) * 8
    bh = ((height + 7) // 8) * 8

    def px(x: int, y: int) -> int:
        return pixels[min(y, height - 1) * width + min(x, width - 1)]

    blocks: list[list[int]] = []  # zigzag-order quantized coefficients
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            block = [px(bx + x, by + y) for y in range(8) for x in range(8)]
            coef = _fdct8x8(block)  # qtable all ones: quantize = identity
            blocks.append([coef[_JPEG_ZIGZAG[i]] for i in range(64)])

    # Restart intervals partition each scan into independently-decodable
    # chunks (every DC predictor and EOB run resets at the boundary,
    # T.81 E.1.2/G.1.2) — so encoding chunk-by-chunk with RSTn markers
    # joined in between is exactly the specified stream.
    if restart_interval:
        chunks = [
            blocks[i : i + restart_interval]
            for i in range(0, len(blocks), restart_interval)
        ]
    else:
        chunks = [blocks]

    scans: list[bytes] = []
    for ss, se, ah, al in script:
        w = _JpegBitWriter()
        for ci, chunk in enumerate(chunks):
            if ci:
                w.flush()  # 1-pad to byte boundary
                w.buf += bytes([0xFF, 0xD0 + ((ci - 1) & 7)])
            if ss == 0:
                if ah == 0:  # DC first: DPCM of the point-transformed DCs
                    prev = 0
                    for zz in chunk:
                        v = zz[0] >> al  # arithmetic shift, T.81 G.1.2.1
                        cat, bits = _jpeg_category(v - prev)
                        prev = v
                        w.put(*dc_codes[cat])
                        if cat:
                            w.put(bits, cat)
                else:  # DC refinement: one raw bit per block
                    for zz in chunk:
                        w.put((zz[0] >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first_scan(w, chunk, ss, se, al, ac_codes)
            else:
                _enc_ac_refine_scan(w, chunk, ss, se, al, ac_codes)
        w.flush()
        sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        scans.append(
            struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos + bytes(w.buf)
        )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtable = bytes([0]) + bytes(1 for _ in range(64))
    sof = struct.pack(">BHHB", 8, bh, bw, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10])
        + bytes(_JPEG_PROG_AC_BITS)
        + bytes(_JPEG_PROG_AC_VALS)
    )
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xFFE0, jfif)
        + seg(0xFFDB, qtable)
        + _jpeg_crop_app(width, height, bw, bh)
        + seg(0xFFC2, sof)  # SOF2: progressive DCT
        + seg(0xFFC4, dht)
        + dri
        + b"".join(scans)
        + b"\xff\xd9"
    )


def _validate_prog_script(
    script: tuple[tuple[int, int, int, int], ...]
) -> None:
    """Reject scripts T.81 forbids or that would drop coefficient bits:
    DC-before-AC ordering, band bounds, Ah=Al+1 refinement chains that
    reach Al=0 for every coefficient."""
    if not script:
        raise ValueError("empty progressive scan script")
    dc_al: int | None = None
    ac_al: dict[int, int] = {}  # coefficient k -> current Al
    for ss, se, ah, al in script:
        if not (0 <= ss <= se <= 63):
            raise ValueError(f"bad spectral band ({ss}, {se})")
        if ss == 0 and se != 0:
            raise ValueError("DC and AC coefficients cannot share a scan")
        if ss == 0:
            if ah == 0:
                if dc_al is not None:
                    raise ValueError("duplicate DC first scan")
                dc_al = al
            else:
                if dc_al is None or ah != dc_al or al != ah - 1:
                    raise ValueError("DC refinement must follow Ah=Al+1")
                dc_al = al
        else:
            if dc_al is None:
                raise ValueError("AC scan before the DC first scan")
            for k in range(ss, se + 1):
                if ah == 0:
                    if k in ac_al:
                        raise ValueError(f"coefficient {k} scanned twice")
                    ac_al[k] = al
                else:
                    if ac_al.get(k) != ah or al != ah - 1:
                        raise ValueError(
                            f"AC refinement of {k} must follow Ah=Al+1"
                        )
                    ac_al[k] = al
    if dc_al != 0 or any(v != 0 for v in ac_al.values()) or len(ac_al) != 63:
        raise ValueError(
            "script must cover DC and AC 1..63 down to full precision"
        )


def _jpeg_crop_app(width: int, height: int, bw: int, bh: int) -> bytes:
    """APP1 segment carrying the true (pre-padding) dimensions when the
    image is not MCU-aligned — baseline SOF records the padded size and
    a general decoder crops via EXIF; this stream keeps it simpler with
    an explicit marker the paired decoder understands. Empty when no
    padding was needed."""
    if (width, height) == (bw, bh):
        return b""
    body = b"SPKG\x00" + struct.pack(">HH", width, height)
    return struct.pack(">HH", 0xFFE1, len(body) + 2) + body


class _JpegBitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG scan")
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError("unexpected marker inside scan")
            self.pos += 2  # stuffed 0xFF
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
            # mask consumed high bits: without this the accumulator
            # grows into a scan-sized bignum and every shift is O(scan
            # bytes) — decode degrades quadratically on real-size JPEGs
            self.acc &= (1 << self.n) - 1
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in scan")

    def expect_restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTn marker (T.81
        E.1.2). Discards the partial byte's 1-padding, skips optional
        0xFF fill bytes, and verifies the modulo-8 restart sequence —
        a missing or out-of-sequence marker means the entropy stream
        desynchronized (malformed DATA -> ValueError, quarantine
        class). Resetting DC predictors is the caller's job."""
        self.n = 0
        self.acc = 0
        p = self.pos
        while (
            p + 1 < len(self.data)
            and self.data[p] == 0xFF
            and self.data[p + 1] == 0xFF
        ):
            p += 1  # fill byte
        if p + 1 >= len(self.data):
            raise ValueError("truncated JPEG scan at restart boundary")
        if self.data[p] != 0xFF or self.data[p + 1] != 0xD0 + idx:
            raise ValueError(
                f"expected RST{idx} at restart boundary, found "
                f"{self.data[p]:02x}{self.data[p + 1]:02x}"
            )
        self.pos = p + 2


def _jpeg_extend(bits_val: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: category + appended bits -> signed value."""
    if cat == 0:
        return 0
    if bits_val < (1 << (cat - 1)):
        return bits_val - (1 << cat) + 1
    return bits_val


def _jpeg_decode_block(r: _JpegBitReader, dct, act, qt, prev_dc: int):
    """One 8x8 block: huffman -> dequant -> dezigzag -> IDCT.
    Returns (spatial block, new DC predictor)."""
    zz = [0] * 64
    cat = r.symbol(dct)
    prev_dc += _jpeg_extend(r.bits(cat), cat)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        sym = r.symbol(act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, cat = sym >> 4, sym & 0xF
        i += run
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _jpeg_extend(r.bits(cat), cat)
        i += 1
    coef = [0] * 64
    for i in range(64):
        coef[_JPEG_ZIGZAG[i]] = zz[i] * qt[i]
    return _idct8x8(coef), prev_dc


def _dec_ac_first(
    r: _JpegBitReader,
    act: dict[tuple[int, int], int],
    zz: list[int],
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Decode one block of an AC first-pass scan (T.81 G.2.2); returns
    the updated end-of-band run counter."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = r.symbol(act)
        run, s = sym >> 4, sym & 0xF
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of 2^n + extra end-of-band blocks, incl. this one
            return (1 << run) - 1 + (r.bits(run) if run else 0)
        k += run
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _jpeg_extend(r.bits(s), s) << al
        k += 1
    return 0


def _dec_ac_refine(
    r: _JpegBitReader,
    act: dict[tuple[int, int], int],
    zz: list[int],
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Decode one block of an AC refinement scan (T.81 G.2.3): walk the
    band interleaving newly-significant placements with one correction
    bit per already-significant coefficient; returns updated EOB run."""
    p1 = 1 << al
    m1 = -p1

    def refine(k: int) -> None:
        if r.bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = r.symbol(act)
            run, s = sym >> 4, sym & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in AC refinement scan"
                    )
                val = p1 if r.bit() else m1
            elif run != 15:
                eobrun = (1 << run) + (r.bits(run) if run else 0)
                break
            # advance over `run` still-zero coefficients, consuming one
            # correction bit per already-nonzero coefficient passed over
            while k <= se:
                if zz[k] != 0:
                    refine(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement run past band end")
                zz[k] = val
            k += 1
    if eobrun:
        while k <= se:  # finish refining this block's tail
            if zz[k] != 0:
                refine(k)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_scan(
    payload: bytes,
    start: int,
    scomps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    coef: dict[int, list[list[int]]],
    dc_dec: dict[int, dict[tuple[int, int], int]],
    ac_dec: dict[int, dict[tuple[int, int], int]],
    nblocks: int,
    restart_interval: int,
) -> int:
    """Entropy-decode one progressive scan in place (coefficients
    accumulate across scans in the zigzag-order store) and return the
    offset of the marker following the scan's entropy segment.

    Components are 1x1-sampled (enforced at SOF2 parse), so an MCU is
    one block per scan component and interleaved DC scans and
    non-interleaved AC scans share the same raster block grid."""
    r = _JpegBitReader(payload, start)
    rst = 0
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for cid, td, _ in scomps:
            if ah == 0 and td not in dc_dec:
                raise ValueError("missing DC huffman table for scan")
        preds = {cid: 0 for cid, _, _ in scomps}
        for b in range(nblocks):
            if restart_interval and b and b % restart_interval == 0:
                r.expect_restart(rst)
                rst = (rst + 1) & 7
                preds = dict.fromkeys(preds, 0)
            for cid, td, _ in scomps:
                zz = coef[cid][b]
                if ah == 0:
                    cat = r.symbol(dc_dec[td])
                    preds[cid] += _jpeg_extend(r.bits(cat), cat)
                    zz[0] = preds[cid] << al
                elif r.bit():
                    zz[0] |= 1 << al
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral band in SOS")
        cid, _, ta = scomps[0]
        if ta not in ac_dec:
            raise ValueError("missing AC huffman table for scan")
        act = ac_dec[ta]
        dec = _dec_ac_first if ah == 0 else _dec_ac_refine
        eobrun = 0
        for b in range(nblocks):
            if restart_interval and b and b % restart_interval == 0:
                r.expect_restart(rst)
                rst = (rst + 1) & 7
                eobrun = 0
            eobrun = dec(r, act, coef[cid][b], ss, se, al, eobrun)
    pos = r.pos
    while pos + 1 < len(payload) and not (
        payload[pos] == 0xFF and payload[pos + 1] != 0x00
    ):
        pos += 1
    if pos + 1 >= len(payload):
        raise ValueError("truncated JPEG: no marker after scan data")
    return pos


def _clamp8(v: float) -> int:
    iv = round(v)
    return 0 if iv < 0 else (255 if iv > 255 else iv)


def decode_jpeg_pixels(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a BASELINE JPEG into row-major (r, g, b) pixels:
    (width, height, pixels). See :func:`_decode_jpeg_full`."""
    # Parse-boundary translation: a truncated entropy-coded segment
    # surfaces as IndexError from the bit reader / huffman tables.
    # Over untrusted bytes that is a DATA error and must carry the
    # quarantine-eligible class (ValueError), same as struct.error.
    try:
        w, h, pixels, _ = _decode_jpeg_full(payload)
    except IndexError as e:
        raise ValueError(f"truncated or corrupt JPEG stream: {e}") from e
    return w, h, pixels


def _decode_jpeg_full(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], int]:
    """Decode a BASELINE JPEG into row-major (r, g, b) pixels:
    (width, height, pixels, n_components).

    Real decoder: marker walk (DQT/SOF0/DHT/SOS), canonical huffman
    reconstruction from the DHT segments, bit-at-a-time entropy decode
    with byte-unstuffing, per-component DPCM DC + EOB/ZRL run-length
    AC, dequantization, dezigzag, float IDCT, interleaved-MCU assembly
    with per-component sampling factors, nearest-neighbor chroma
    upsampling, and JFIF YCbCr -> RGB conversion. Supported variants:
    8-bit baseline, single-scan, 1 component (grayscale) or 3
    components (YCbCr) with luma sampling factors up to 2x2 and 1x1
    chroma — i.e. 4:4:4, 4:2:2 (both axes) and 4:2:0, the layouts real
    corpora contain — plus DRI/RSTn restart intervals (byte-aligned
    marker consumption, modulo-8 sequence check, DC predictor reset per
    T.81 E.1.2) — and PROGRESSIVE (SOF2) streams at 1x1 sampling:
    multi-scan spectral selection + successive approximation per T.81
    annex G (interleaved DC first/refine scans, per-component AC band
    scans with EOBn runs and refinement correction bits, restart
    markers inside scans; see :func:`_jpeg_progressive_scan`), with a
    required trailing EOI so scan-boundary truncations quarantine
    instead of decoding to a silently coarser image. Arithmetic-coded
    streams, subsampled progressive chroma, and 4-component CMYK
    raise — the same explicit-variant honesty as the BMP/PNG/WAV
    decoders.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_dec: dict[int, dict[tuple[int, int], int]] = {}
    ac_dec: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    crop: tuple[int, int] | None = None
    comps: list[dict] = []  # {id, h, v, q}
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (dc, ac)
    scan_order: list[int] = []
    scan_start = None
    restart_interval = 0
    progressive = False
    saw_eoi = False
    coef: dict[int, list[list[int]]] | None = None  # zigzag, per block
    prog_blocks_x = prog_blocks_y = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:  # EOI: end of a progressive multi-scan walk
            saw_eoi = True
            break
        if pos + 4 > len(payload):
            break  # marker with no room for its length: truncated tail
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                qtables[tq] = list(body[off + 1 : off + 65])
                off += 65
        elif marker in (0xFFC0, 0xFFC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xFFC2
            precision, h, wd, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or ncomp not in (1, 3):
                raise ValueError(
                    "only 8-bit 1- or 3-component JPEG supported"
                )
            width, height = wd, h
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append(
                    {
                        "id": cid,
                        "h": samp >> 4,
                        "v": samp & 0xF,
                        "q": body[8 + 3 * c],
                    }
                )
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise ValueError("sampling factors up to 2x2 supported")
            if progressive:
                # the progressive block-grid bookkeeping is built on
                # interleaved-DC and non-interleaved-AC scans sharing
                # one raster grid, which holds exactly at 1x1 sampling
                if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                    raise ValueError(
                        "progressive JPEG supports 1x1 sampling (4:4:4) only"
                    )
            elif ncomp == 3 and any(
                c["h"] != 1 or c["v"] != 1 for c in comps[1:]
            ):
                raise ValueError("chroma must be 1x1 sampled")
        elif marker == 0xFFCC:
            # DAC: arithmetic conditioning — only ever present in
            # arithmetic-entropy streams, which we cannot decode.
            raise ValueError(
                "arithmetic-coded JPEG (DAC segment) — only baseline "
                "(SOF0) and progressive (SOF2) huffman JPEG supported"
            )
        elif 0xFFC1 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8):
            # Every other SOFn frame type (T.81 table B.1): SOF9-11 and
            # SOF13-15 are ARITHMETIC-coded, SOF1/3/5-7 extended
            # sequential / lossless / differential huffman. Reject by
            # name BEFORE any entropy parsing so a web-crawl corpus
            # quarantines these cleanly instead of mis-parsing the
            # stream (the sniffer dispatches on SOI alone).
            kind = (
                "arithmetic-coded"
                if marker >= 0xFFC9
                else "unsupported-variant"
            )
            raise ValueError(
                f"{kind} JPEG frame SOF{marker - 0xFFC0} — only baseline "
                "(SOF0) and progressive (SOF2) huffman JPEG supported"
            )
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                dec = _jpeg_huff_decoder(bits, vals)
                (dc_dec if tc == 0 else ac_dec)[th] = dec
                off += 17 + n
        elif marker == 0xFFDD:  # DRI: restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xFFE1 and body[:5] == b"SPKG\x00":
            crop = struct.unpack_from(">HH", body, 5)
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            if progressive:
                if width is None or not comps:
                    raise ValueError("SOS before SOF segment")
                if coef is None:
                    prog_blocks_x = (width + 7) // 8  # 1x1 sampling only
                    prog_blocks_y = (height + 7) // 8
                    coef = {
                        c["id"]: [
                            [0] * 64
                            for _ in range(prog_blocks_x * prog_blocks_y)
                        ]
                        for c in comps
                    }
                known = {c["id"] for c in comps}
                scomps = []
                for c in range(ns):
                    cid = body[1 + 2 * c]
                    if cid not in known:
                        raise ValueError("SOS component not declared in SOF")
                    tbl = body[2 + 2 * c]
                    scomps.append((cid, tbl >> 4, tbl & 0xF))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
                pos = _jpeg_progressive_scan(
                    payload,
                    pos + 2 + length,
                    scomps,
                    ss,
                    se,
                    ah,
                    al,
                    coef,
                    dc_dec,
                    ac_dec,
                    prog_blocks_x * prog_blocks_y,
                    restart_interval,
                )
                continue
            if ns != len(comps):
                raise ValueError("only single-scan interleaved SOS")
            for c in range(ns):
                cid = body[1 + 2 * c]
                tbl = body[2 + 2 * c]
                scan_tables[cid] = (tbl >> 4, tbl & 0xF)
                scan_order.append(cid)
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if width is None or not comps:
        raise ValueError("missing SOF segment")
    by_id = {c["id"]: c for c in comps}
    if progressive:
        if coef is None:
            raise ValueError("missing SOS segment")
        if not saw_eoi:
            # a clean scan-boundary cut of a progressive stream would
            # otherwise decode to a silently coarser image — for data
            # pipelines that is wrong stats, not a preview, so an
            # absent EOI is a truncation (quarantine class)
            raise ValueError("truncated progressive JPEG: missing EOI")
        scan_order = [c["id"] for c in comps]
        hmax = vmax = 1
        planes = {}
        plane_w = {}
        for c in comps:
            cid = c["id"]
            if c["q"] not in qtables:
                raise ValueError("missing quantization table for scan")
            qt = qtables[c["q"]]
            pw = prog_blocks_x * 8
            plane = [0] * (pw * prog_blocks_y * 8)
            for b, zz in enumerate(coef[cid]):
                spatial = [0] * 64
                for i in range(64):
                    spatial[_JPEG_ZIGZAG[i]] = zz[i] * qt[i]
                block = _idct8x8(spatial)
                bx = (b % prog_blocks_x) * 8
                by = (b // prog_blocks_x) * 8
                for y in range(8):
                    row = by + y
                    plane[row * pw + bx : row * pw + bx + 8] = block[
                        y * 8 : y * 8 + 8
                    ]
            planes[cid] = plane
            plane_w[cid] = pw
        return _jpeg_assemble(
            width, height, crop, comps, by_id, scan_order,
            planes, plane_w, hmax, vmax,
        )
    if scan_start is None:
        raise ValueError("missing SOF/SOS segment")
    if scan_order != [c["id"] for c in comps]:
        raise ValueError("scan component order must match SOF order")
    for cid, (d, a) in scan_tables.items():
        if by_id[cid]["q"] not in qtables or d not in dc_dec or a not in ac_dec:
            raise ValueError("missing quantization/huffman table for scan")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes: dict[int, list[int]] = {}
    plane_w: dict[int, int] = {}
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes[c["id"]] = [0] * (pw * ph)
        plane_w[c["id"]] = pw

    r = _JpegBitReader(payload, scan_start)
    prev_dc = {c["id"]: 0 for c in comps}
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # interval boundary: the encoder byte-aligned and wrote
                # RSTn (n cycling 0-7) and reset every DC predictor
                r.expect_restart(rst)
                rst = (rst + 1) & 7
                prev_dc = {c["id"]: 0 for c in comps}
            mcu_i += 1
            for c in comps:
                cid = c["id"]
                dct = dc_dec[scan_tables[cid][0]]
                act = ac_dec[scan_tables[cid][1]]
                qt = qtables[c["q"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        block, prev_dc[cid] = _jpeg_decode_block(
                            r, dct, act, qt, prev_dc[cid]
                        )
                        bx = (mx * c["h"] + hh) * 8
                        by = (my * c["v"] + v) * 8
                        pw = plane_w[cid]
                        for y in range(8):
                            row = by + y
                            planes[cid][
                                row * pw + bx : row * pw + bx + 8
                            ] = block[y * 8 : y * 8 + 8]

    return _jpeg_assemble(
        width, height, crop, comps, by_id, scan_order,
        planes, plane_w, hmax, vmax,
    )


def _jpeg_assemble(
    width: int,
    height: int,
    crop: tuple[int, int] | None,
    comps: list[dict],
    by_id: dict[int, dict],
    scan_order: list[int],
    planes: dict[int, list[int]],
    plane_w: dict[int, int],
    hmax: int,
    vmax: int,
) -> tuple[int, int, list[tuple[int, int, int]], int]:
    """Shared tail of baseline and progressive decode: crop validation,
    gray extraction or chroma upsampling + JFIF YCbCr -> RGB."""
    if crop is not None:
        # SPKG is untrusted input like everything else: a corrupt crop
        # claiming more pixels than the decoded planes hold would make
        # the gray path's row slices silently shorten — wrong stats
        # with no error. Crop may only shrink, never grow.
        if crop[0] > width or crop[1] > height or 0 in crop:
            raise ValueError(
                f"corrupt crop marker {crop} for decoded size "
                f"{(width, height)}"
            )
        width, height = crop
    pixels: list[tuple[int, int, int]] = []
    if len(comps) == 1:
        c = comps[0]
        pw = plane_w[c["id"]]
        pl = planes[c["id"]]
        for y in range(height):
            base = y * pw
            pixels.extend(
                (v, v, v) for v in pl[base : base + width]
            )
        return width, height, pixels, 1
    cy, cb, cr = (by_id[cid] for cid in scan_order)
    for y in range(height):
        for x in range(width):
            # nearest-neighbor chroma upsampling: plane coord = full-res
            # coord scaled by the component's sampling ratio
            yv = planes[cy["id"]][
                (y * cy["v"] // vmax) * plane_w[cy["id"]]
                + (x * cy["h"] // hmax)
            ]
            cbv = planes[cb["id"]][
                (y * cb["v"] // vmax) * plane_w[cb["id"]]
                + (x * cb["h"] // hmax)
            ]
            crv = planes[cr["id"]][
                (y * cr["v"] // vmax) * plane_w[cr["id"]]
                + (x * cr["h"] // hmax)
            ]
            pixels.append(
                (
                    _clamp8(yv + 1.402 * (crv - 128)),
                    _clamp8(
                        yv
                        - 0.344136 * (cbv - 128)
                        - 0.714136 * (crv - 128)
                    ),
                    _clamp8(yv + 1.772 * (cbv - 128)),
                )
            )
    return width, height, pixels, 3


def decode_jpeg_gray_pixels(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a baseline SINGLE-component JPEG into row-major grayscale
    pixels: (width, height, pixels). Thin wrapper over the general
    decoder (1-component streams decode with no color conversion, so
    gray values are exact); raises on a color stream."""
    # Same parse-boundary IndexError -> ValueError translation as
    # decode_jpeg_pixels (truncated entropy segment = data error).
    try:
        w, h, rgb, ncomp = _decode_jpeg_full(payload)
    except IndexError as e:
        raise ValueError(f"truncated or corrupt JPEG stream: {e}") from e
    if ncomp != 1:
        raise ValueError("not a single-component (grayscale) JPEG")
    return w, h, [r for r, _, _ in rgb]


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Decode a baseline JPEG (gray OR color) into the shared image stat
    tuple — one decode path via :func:`decode_jpeg_pixels`."""
    return _pixel_stats(*decode_jpeg_pixels(payload))


# JFIF RGB -> YCbCr (T.871): rounded to the nearest integer, clamped.
def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _clamp8(y), _clamp8(cb), _clamp8(cr)


def encode_jpeg_color(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    *,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Serialize row-major (r, g, b) pixels as a standard BASELINE
    color JFIF JPEG (pure stdlib): YCbCr conversion, all-ones
    quantization tables (luma id 0, chroma id 1), Annex K luminance
    huffman tables registered for both the luma (0) and chroma (1)
    slots, interleaved MCUs with per-component DPCM.

    ``subsampling``: ``"444"`` (1x1 luma, MCU = 8x8), ``"420"``
    (2x2 luma, 2x2-averaged chroma, MCU = 16x16 — the layout most real
    corpora ship), ``"422"`` (2x1 luma, horizontally-averaged chroma)
    or ``"440"`` (1x2 luma, vertically-averaged chroma). Edge blocks
    pad by edge replication; the paired decoder crops back via the
    same APP1 marker the grayscale encoder uses.
    """
    factors = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in factors:
        raise ValueError("subsampling must be one of '444'/'420'/'422'/'440'")
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def px(x: int, y: int) -> tuple[int, int, int]:
        return pixels[min(y, height - 1) * width + min(x, width - 1)]

    # full-res YCbCr planes (edge-extended reads via px())
    def ycc(x: int, y: int) -> tuple[int, int, int]:
        return _rgb_to_ycbcr(*px(x, y))

    hy, vy = factors[subsampling]
    mcu_w, mcu_h = 8 * hy, 8 * vy
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    def chroma_at(cx: int, cy_: int, idx: int) -> int:
        # chroma plane sample: mean over the hy x vy full-res cell this
        # chroma sample covers (444: the cell is one pixel)
        s = sum(
            ycc(hy * cx + dx, vy * cy_ + dy)[idx]
            for dy in range(vy)
            for dx in range(hy)
        )
        n = hy * vy
        return (s + n // 2) // n

    w = _JpegBitWriter()

    def emit_block(samples: list[int], prev_dc: int) -> int:
        coef = _fdct8x8(samples)
        zz = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
        cat, bits = _jpeg_category(zz[0] - prev_dc)
        w.put(*dc_codes[cat])
        if cat:
            w.put(bits, cat)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                w.put(*ac_codes[0xF0])
                run -= 16
            cat, bits = _jpeg_category(zz[i])
            w.put(*ac_codes[(run << 4) | cat])
            w.put(bits, cat)
            run = 0
        if last_nz < 63:
            w.put(*ac_codes[0x00])
        return zz[0]

    dc_y = dc_cb = dc_cr = 0
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.flush()
                w.buf += bytes([0xFF, 0xD0 + rst])  # markers are not stuffed
                rst = (rst + 1) & 7
                dc_y = dc_cb = dc_cr = 0
            mcu_i += 1
            for v in range(vy):
                for hh in range(hy):
                    bx, by = (mx * hy + hh) * 8, (my * vy + v) * 8
                    dc_y = emit_block(
                        [
                            ycc(bx + x, by + y)[0]
                            for y in range(8)
                            for x in range(8)
                        ],
                        dc_y,
                    )
            cbx, cby = mx * 8, my * 8
            dc_cb = emit_block(
                [
                    chroma_at(cbx + x, cby + y, 1)
                    for y in range(8)
                    for x in range(8)
                ],
                dc_cb,
            )
            dc_cr = emit_block(
                [
                    chroma_at(cbx + x, cby + y, 2)
                    for y in range(8)
                    for x in range(8)
                ],
                dc_cr,
            )
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    ones = bytes(1 for _ in range(64))
    qtables = bytes([0]) + ones + bytes([1]) + ones
    samp_y = (hy << 4) | vy
    sof = struct.pack(">BHHB", 8, mcus_y * mcu_h, mcus_x * mcu_w, 3) + bytes(
        [1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    one_pair = (
        bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    )
    ac_pair = bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    dht = (
        bytes([0x00]) + one_pair
        + bytes([0x10]) + ac_pair
        + bytes([0x01]) + one_pair
        + bytes([0x11]) + ac_pair
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xFFE0, jfif)
        + seg(0xFFDB, qtables)
        + _jpeg_crop_app(width, height, mcus_x * mcu_w, mcus_y * mcu_h)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht)
        + dri
        + seg(0xFFDA, sos)
        + bytes(w.buf)
        + b"\xff\xd9"
    )


# Closed-form fixture content: pixel (x, y, channel c in RGB order) of
# doc_id's image is (doc_id*7 + y*31 + x*3 + c*11) % 256 at dimensions
# (doc_id % 13 + 4) x (doc_id % 11 + 4); audio sample i is
# ((doc_id*13 + i*17) % 65536) - 32768 over (doc_id % 50 + 10) samples.
# The adapters below ENCODE these into real BMP/WAV containers; the
# decoders re-derive the stats from the bytes alone, and an external SQL
# oracle re-derives them from the formulas — meeting in the middle.


def _fixture_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Project the id column and rebalance it across the session's
    compute parallelism before the per-row Python encode.

    The attach adapters and the decode stage behind them form ONE
    narrow chain from the scan, so their task count is the SCAN's
    split count — a compacted id file scans as a single split and the
    whole codec pipeline (encode fixture + full entropy decode) runs
    on one core while the rest idle. The repartition shuffles only the
    8-byte ids (upstream of the payloads entirely), and at real scale,
    where the scan already yields thousands of splits, the helper's
    file-size estimate makes it a no-op."""
    from ..session import rebalance_for_compute

    return rebalance_for_compute(df.select(F.col(id_col)))


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

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


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

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_gif_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real GIF89a payload per row — SAME
    closed-form pixel content as :func:`attach_bmp_payloads` /
    :func:`attach_png_payloads` (GIF's palette path is lossless), so
    all three containers share one external oracle. Odd doc_ids are
    written INTERLACED, so the 4-pass row reorder is on the checked
    path for half the corpus."""

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
                payloads.append(
                    encode_gif_rgb8(w, h, pixels, interlace=bool(did % 2))
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/gif",
                    "width": widths,
                    "height": heights,
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_tiff_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real baseline TIFF payload per row — SAME
    closed-form pixel content as :func:`attach_bmp_payloads` (TIFF's
    8-bit path is lossless), so all four lossless containers share one
    external oracle. The corpus rotates every decoder variation axis by
    doc_id so each is on the checked path for a slice of the data:
    compression none / LZW / PackBits (doc_id % 3), the horizontal
    differencing predictor on the LZW slice (doc_id % 2), little- vs
    big-endian byte order (doc_id % 2), and multi-strip layouts
    (rows_per_strip = doc_id % 5 + 1, splitting every image into
    several strips)."""

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
                compression = (1, 5, 32773)[did % 3]
                payloads.append(
                    encode_tiff_rgb8(
                        w,
                        h,
                        pixels,
                        compression=compression,
                        predictor=2 if compression == 5 and did % 2 else 1,
                        byte_order=">" if did % 2 else "<",
                        rows_per_strip=did % 5 + 1,
                    )
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/tiff",
                    "width": widths,
                    "height": heights,
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_jpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real baseline grayscale JPEG per row.

    JPEG is lossy, so the closed form must survive the DCT: every 8x8
    block is CONSTANT at value (doc_id*7 + by*31 + bx*3) % 256 for
    block coords (bx, by). A constant block's forward DCT is a single
    integer DC coefficient (all ACs identically zero), which the
    all-ones quantization table stores exactly and the IDCT inverts
    exactly — so the decode is bit-exact BY CONSTRUCTION, not by
    tolerance, and the external oracle re-derives the stats from the
    block formula (sum = 64 * block value). The huffman layer is still
    fully exercised: DC DPCM differences across blocks span positive/
    negative magnitudes (categories), and every block decodes an EOB
    symbol through the AC table. Dimensions: (doc_id%3+1) x (doc_id%2+1)
    blocks of 8."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = (did % 3 + 1) * 8, (did % 2 + 1) * 8
                px = [
                    (did * 7 + (y // 8) * 31 + (x // 8) * 3) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(encode_jpeg_gray(w, h, px))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/jpeg",
                    "width": widths,
                    "height": heights,
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def attach_jpeg_progressive_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture adapter: one real PROGRESSIVE grayscale JPEG per row.

    Same meet-in-the-middle construction as the baseline JPEG fixture
    (:func:`attach_jpeg_payloads`): per-8x8-block-constant content at
    value (doc_id*11 + by*17 + bx*5) % 256 makes the lossy path
    bit-exact (single integer DC per block under the all-ones
    quantization table), so the oracle re-derives stats from the block
    formula. The multi-scan ladder is genuinely exercised end-to-end:
    every image decodes through the DC first + refinement scans, AC
    band scans with EOBn runs spanning the all-zero-AC blocks, and —
    for doc_id % 3 != 0 — DRI/RSTn restart boundaries inside each
    progressive scan. Dimensions: (doc_id%4+1) x (doc_id%3+1) blocks
    of 8."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = (did % 4 + 1) * 8, (did % 3 + 1) * 8
                px = [
                    (did * 11 + (y // 8) * 17 + (x // 8) * 5) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(
                    encode_jpeg_gray_progressive(
                        w, h, px, restart_interval=did % 3
                    )
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/jpeg",
                    "width": widths,
                    "height": heights,
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(_gen, schema=IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# FLAC STREAMINFO (the format's mandatory first metadata block) and Ogg
# page framing (RFC 3533) — the audio-container analogs of the MP4 box
# walk: sample rate / channels / duration for FLAC, page/packet counts
# and granule-position duration for Ogg, all without touching a coded
# frame. Spectral decode (FLAC subframes, Vorbis/Opus) stays behind the
# StubImageCodec boundary.

FLAC_STATS_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bits_per_sample int, "
    "total_samples bigint, duration_ms bigint, n_metadata_blocks int"
)

OGG_STATS_SCHEMA = (
    "doc_id long, n_pages int, n_packets int, last_granule bigint, "
    "serial bigint, total_bytes bigint"
)


def encode_flac_streaminfo(
    *,
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    extra_blocks: int = 0,
) -> bytes:
    """Serialize a FLAC header: ``fLaC`` magic + the mandatory
    STREAMINFO block + ``extra_blocks`` PADDING blocks, with the
    is-last flag on the final block — the encoder twin of
    :func:`decode_flac_streaminfo`."""
    if not 1 <= channels <= 8 or not 4 <= bits_per_sample <= 32:
        raise ValueError("channels 1-8, bits 4-32")
    if sample_rate >= 1 << 20 or total_samples >= 1 << 36:
        raise ValueError("sample_rate/total_samples out of field range")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00\x00\x10" + b"\xff\xff\xff"  # min/max framesize (24-bit)
        + packed.to_bytes(8, "big")
        + bytes(16)  # MD5 of the unencoded audio (not carried here)
    )
    out = b"fLaC"
    is_last = 0x80 if extra_blocks == 0 else 0
    out += bytes([is_last]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for i in range(extra_blocks):
        last = 0x80 if i == extra_blocks - 1 else 0
        pad = bytes(i % 7 + 1)
        out += bytes([last | 1]) + len(pad).to_bytes(3, "big") + pad
    return out


def decode_flac_streaminfo(
    payload: bytes,
) -> tuple[int, int, int, int, int, int]:
    """Parse a FLAC header's metadata-block chain: returns (sample_rate,
    channels, bits_per_sample, total_samples, duration_ms,
    n_metadata_blocks). STREAMINFO must be the first block (the spec
    mandates it); later blocks are length-skipped; a chain that never
    sets the is-last flag, a truncated block, or a zero sample rate
    raise the quarantine class (ValueError)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, n_blocks, first = 4, 0, True
    rate = channels = bits = total = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata-block header")
        head = payload[pos]
        btype, is_last = head & 0x7F, head & 0x80
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if first:
            if btype != 0:
                raise ValueError("first FLAC block is not STREAMINFO")
            if blen != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {blen}")
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("FLAC sample rate is zero")
            first = False
        elif btype == 0:
            raise ValueError("duplicate STREAMINFO block")
        n_blocks += 1
        pos += 4 + blen
        if is_last:
            break
    return rate, channels, bits, total, total * 1000 // rate, n_blocks


_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7 if _r & 0x80000000 else _r << 1) & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC (RFC 3533 §6): CRC-32, polynomial 0x04C11DB7,
    init 0, unreflected, no final xor — NOT zlib's crc32."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def encode_ogg_pages(
    pages: list[tuple[int, list[int]]], serial: int
) -> bytes:
    """Serialize an Ogg physical stream: each ``(granule, lacing)``
    becomes one page (bos flag on the first, eos on the last, correct
    CRC over the whole page with the CRC field zeroed). Lacing values
    must be < 255 — every segment terminates a packet, keeping the
    packet count closed-form for the oracle."""
    out = bytearray()
    for i, (granule, lacing) in enumerate(pages):
        if not 1 <= len(lacing) <= 255 or any(
            not 0 <= v < 255 for v in lacing
        ):
            raise ValueError("1-255 lacing values, each in [0, 255)")
        htype = (0x02 if i == 0 else 0) | (
            0x04 if i == len(pages) - 1 else 0
        )
        body = b"".join(
            bytes((v * 131 + s) % 256 for s in range(v)) for v in lacing
        )
        page = bytearray(
            b"OggS\x00"
            + bytes([htype])
            + struct.pack("<q", granule)
            + struct.pack("<I", serial)
            + struct.pack("<I", i)
            + b"\x00\x00\x00\x00"  # crc placeholder
            + bytes([len(lacing)])
            + bytes(lacing)
            + body
        )
        struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
        out += page
    return bytes(out)


def decode_ogg_stats(payload: bytes) -> tuple[int, int, int, int, int]:
    """Walk an Ogg physical stream's page framing (RFC 3533): returns
    (n_pages, n_packets, last_granule, serial, total_bytes). Every
    page's CRC is verified (poly 0x04C11DB7, unreflected — a walker
    that mis-sizes a page lands mid-body and fails the capture or the
    checksum); packets are counted at lacing values < 255 (packet
    terminations). Lost capture, CRC mismatch, serial changes
    mid-stream, non-monotonic page sequence, and truncation all raise
    the quarantine class (ValueError)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg payload (no OggS capture)")
    pos = n_pages = n_packets = 0
    serial = None
    granule = 0
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture at {pos}")
        if pos + 27 > len(payload):
            raise ValueError("truncated Ogg page header")
        if payload[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        granule, this_serial, seq, crc = struct.unpack_from(
            "<qIII", payload, pos + 6
        )
        if serial is None:
            serial = this_serial
        elif serial != this_serial:
            raise ValueError("multiplexed Ogg streams not supported")
        if seq != n_pages:
            raise ValueError(
                f"Ogg page sequence {seq} at page index {n_pages}"
            )
        nseg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(lacing)
        end = pos + 27 + nseg + body_len
        if end > len(payload):
            raise ValueError("truncated Ogg page body")
        page = bytearray(payload[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at {pos}")
        n_packets += sum(1 for v in lacing if v < 255)
        n_pages += 1
        pos = end
    if n_pages == 0:
        raise ValueError("no Ogg pages in payload")
    return n_pages, n_packets, granule, serial, len(payload)


def extract_flac_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """STREAMINFO stats stage for FLAC payloads — sample rate, channel
    count, bit depth and exact duration from the mandatory first
    metadata block, without decoding a subframe. Same quarantine policy
    as :func:`extract_audio_stats`."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows.append(decode_flac_streaminfo(bytes(p)))
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 6)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": [r[0] for r in rows],
                    "channels": [r[1] for r in rows],
                    "bits_per_sample": [r[2] for r in rows],
                    "total_samples": [r[3] for r in rows],
                    "duration_ms": [r[4] for r in rows],
                    "n_metadata_blocks": [r[5] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=FLAC_STATS_SCHEMA)


def extract_ogg_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Page-framing stats stage for Ogg payloads — page/packet counts
    and the last granule position (the stream's duration in codec
    units), with per-page CRC verification. Same quarantine policy as
    :func:`extract_audio_stats`."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows.append(decode_ogg_stats(bytes(p)))
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 5)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_pages": [r[0] for r in rows],
                    "n_packets": [r[1] for r in rows],
                    "last_granule": [r[2] for r in rows],
                    "serial": [r[3] for r in rows],
                    "total_bytes": [r[4] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=OGG_STATS_SCHEMA)


def attach_flac_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one FLAC header per row. Closed form the oracle
    replays: sample rate from a 7-entry table at doc_id % 7, channels
    doc_id % 2 + 1, bit depth 16, total samples doc_id * 371 % 100000
    + 1000, plus doc_id % 3 PADDING blocks (so both the is-last-on-
    STREAMINFO and the chain-walk paths are on the checked slice)."""
    rates = (8000, 16000, 22050, 24000, 32000, 44100, 48000)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                payloads.append(
                    encode_flac_streaminfo(
                        sample_rate=rates[did % 7],
                        channels=did % 2 + 1,
                        bits_per_sample=16,
                        total_samples=did * 371 % 100000 + 1000,
                        extra_blocks=did % 3,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/flac",
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string"
    )


def attach_ogg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one Ogg physical stream per row. Closed form
    the oracle replays: doc_id % 7 + 2 pages, each with doc_id % 4 + 1
    lacing segments of (doc_id + page*7 + seg*13) % 255 bytes, page i
    granule (i+1) * (doc_id % 1000 + 100), serial doc_id % 65536 + 1 —
    so page sizes, packet counts and the final granule are all
    arithmetic the walker must reproduce against verified CRCs."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                n_pages = did % 7 + 2
                nseg = did % 4 + 1
                pages = [
                    (
                        (i + 1) * (did % 1000 + 100),
                        [(did + i * 7 + s * 13) % 255 for s in range(nseg)],
                    )
                    for i in range(n_pages)
                ]
                payloads.append(encode_ogg_pages(pages, did % 65536 + 1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/ogg",
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string"
    )


G711_STATS_SCHEMA = (
    "doc_id long, coding string, sample_rate int, n_samples int, "
    "sample_sum bigint, s_min int, s_max int"
)


def extract_g711_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Expanded-sample stats stage for G.711 companded WAV payloads
    (A-law/mu-law, the telephony-corpus formats): each 8-bit sample is
    expanded to linear through the exact ITU-T G.711 segment arithmetic
    before aggregation. Same quarantine policy as
    :func:`extract_audio_stats`."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows.append(decode_wav_g711(bytes(p)))
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 6)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "coding": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "n_samples": [r[2] for r in rows],
                    "sample_sum": [r[3] for r in rows],
                    "s_min": [r[4] for r in rows],
                    "s_max": [r[5] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=G711_STATS_SCHEMA)


def attach_g711_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one companded mono WAV per row — mu-law for
    even doc_ids, A-law for odd, so both expansion formulas are on the
    checked path. Closed form the oracle replays: doc_id % 40 + 8
    encoded bytes, byte i = (doc_id*13 + i*29) % 256, expanded through
    the exact G.711 segment arithmetic."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                n = did % 40 + 8
                enc = bytes((did * 13 + i * 29) % 256 for i in range(n))
                payloads.append(encode_wav_g711(enc, alaw=bool(did % 2)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/wav",
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string"
    )


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

    return _fixture_ids(df, id_col).mapInPandas(
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
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_rgb8(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff_rgb8(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_gray(payload)
    raise ValueError("unrecognized image payload (not BMP/PNG/GIF/TIFF/JPEG)")


def extract_image_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Real decode stage: Arrow-batched ``mapInPandas`` over image
    payloads (BMP, PNG or JPEG, sniffed per record) -> per-image
    integer channel stats. The (huge) payload column is consumed here
    and dropped — project early, shuffle small.

    ``on_error`` is the quarantine policy for undecodable payloads — a
    100 TB corpus always contains truncated/corrupt blobs, and the
    policy must be explicit, never silent:

    - ``"error"`` (default): the first bad payload fails the job with
      the decoder's message — right for fixture-grade inputs where a
      bad byte IS the bug;
    - ``"null"``: the row survives with null stat columns, so the
      caller can count/inspect the quarantine set (``width IS NULL``)
      and no row silently disappears;
    - ``"skip"``: the row is dropped — only for callers that have
      already recorded the quarantine elsewhere.
    """
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows.append(_decode_image(bytes(p)))
                # Quarantine only the decoders' documented failure types
                # for malformed payloads; anything else (schema drift,
                # Arrow/pandas type errors) is a code bug and must fail
                # the job, not masquerade as corrupt data.
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 7)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
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


def extract_audio_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Real decode stage for PCM16 WAV payloads -> integer sample stats.

    ``on_error`` is the same quarantine policy as
    :func:`extract_image_stats` (``"error"`` fail fast, ``"null"`` keep
    the row with null stats, ``"skip"`` drop it) — the WAV decoder
    fails fast on truncated chunks, so a corrupt blob in a large corpus
    needs the same explicit, observable handling as the image path.
    """
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows.append(decode_wav_pcm16(bytes(p)))
                # Same narrow quarantine contract as the image stage.
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 5)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "sample_sum": [r[2] for r in rows],
                    "s_min": [r[3] for r in rows],
                    "s_max": [r[4] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=AUDIO_STATS_SCHEMA)


def extract_mp3_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Frame-header stats stage for MP3 payloads (n_frames / sample
    rate / bitrate min-max-sum / byte length). Header walks are the
    standard first pass over a crawled audio corpus — duration and
    bitrate histograms without paying for spectral decode. Payloads are
    sniffed (ID3v2 magic or frame sync) like the image dispatch; the
    same quarantine policy as :func:`extract_audio_stats` applies."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    b = bytes(p)
                    if b[:3] != b"ID3" and not (
                        len(b) > 1 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
                    ):
                        raise ValueError("not an MP3 payload (no sync/ID3)")
                    rows.append(decode_mp3_frame_stats(b))
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 6)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "kbps_min": [r[2] for r in rows],
                    "kbps_max": [r[3] for r in rows],
                    "kbps_sum": [r[4] for r in rows],
                    "total_bytes": [r[5] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=MP3_STATS_SCHEMA)


def extract_mp4_stats(
    media_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Container-level stats stage for MP4/ISO-BMFF payloads (duration,
    timescale, track counts by kind, presentation dimensions, codec
    fourccs, mdat byte size). The box walk is the standard first pass
    over a crawled video corpus — duration histograms, resolution
    buckets and codec mixes without decoding a single frame. Payloads
    are sniffed on the ``ftyp`` box at offset 4; the same quarantine
    policy as :func:`extract_audio_stats` applies."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    b = bytes(p)
                    if len(b) < 12 or b[4:8] != b"ftyp":
                        raise ValueError("not an ISO BMFF payload (no ftyp)")
                    rows.append(decode_mp4_stats(b))
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((None,) * 9)
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "timescale": [r[0] for r in rows],
                    "duration_ms": [r[1] for r in rows],
                    "n_tracks": [r[2] for r in rows],
                    "n_video": [r[3] for r in rows],
                    "n_audio": [r[4] for r in rows],
                    "width": [r[5] for r in rows],
                    "height": [r[6] for r in rows],
                    "codecs": [r[7] for r in rows],
                    "mdat_bytes": [r[8] for r in rows],
                }
            )

    return media_df.mapInPandas(_decode, schema=MP4_STATS_SCHEMA)


def attach_mp4_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one conformant ISO BMFF container per row.
    Closed form the oracle replays: movie timescale 600*(doc_id%4+1),
    duration doc_id%9000+600 units, one avc1 video track at
    (doc_id%16+4)*16 x (doc_id%9+3)*16, doc_id%3 mp4a audio tracks,
    and an mdat of doc_id%257+9 body bytes. The container rotates the
    walker's variation axes by doc_id: 64-bit (version 1) mvhd/tkhd/
    mdhd time fields for odd doc_ids, a ``free`` box of doc_id%23
    filler bytes between moov and mdat, and the size==1 + 64-bit
    largesize mdat form for doc_id%5==0 — so the v0/v1, skip and
    largesize paths are all on the driver-checked slice."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                payloads.append(
                    encode_mp4_metadata(
                        timescale=600 * (did % 4 + 1),
                        duration=did % 9000 + 600,
                        width=(did % 16 + 4) * 16,
                        height=(did % 9 + 3) * 16,
                        n_audio=did % 3,
                        version=did % 2,
                        free_bytes=did % 23,
                        mdat_bytes=did % 257 + 9,
                        mdat_largesize=did % 5 == 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "video/mp4",
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string"
    )


def attach_mp3_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one conformant MPEG-1 Layer III header stream
    per row. Closed form the oracle replays: doc_id % 20 + 5 frames at
    sample-rate index doc_id % 3; frame i uses bitrate index
    (doc_id + i) % 14 + 1 and padding (doc_id + i) % 2; odd doc_ids
    additionally carry an ID3v2 tag of doc_id % 17 content bytes
    (10-byte header + syncsafe size), so both the tag-skip and the
    bare-sync entry paths stay on the checked path."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, counts = [], []
            for did in pdf[id_col]:
                did = int(did)
                n = did % 20 + 5
                frames = [((did + i) % 14 + 1, (did + i) % 2) for i in range(n)]
                payloads.append(
                    encode_mp3_headers(
                        frames,
                        did % 3,
                        id3_size=(did % 17) if did % 2 else None,
                    )
                )
                counts.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/mpeg",
                    "n_frames": counts,
                }
            )

    return _fixture_ids(df, id_col).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string, n_frames int"
    )


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
        if b[:2] == b"\xff\xd8":
            return decode_jpeg_pixels(b)  # gray or color
        raise ValueError("unrecognized image payload (not BMP/PNG/JPEG)")

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


# ---------------------------------------------------------------------------
# Perceptual near-duplicate detection: difference hash (dHash) over decoded
# pixels, banded Hamming self-join
# ---------------------------------------------------------------------------

IMAGE_GRAY_SCHEMA = "doc_id long, width int, height int, gray array<int>"

# Canonical dHash frame: 9 columns x 8 rows -> 8 comparisons per row,
# 64 bits total (Krawetz's difference hash — public algorithm).
DHASH_W, DHASH_H = 9, 8


def attach_bmp_neardup_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real 9x8 grayscale BMP per row with PLANTED
    near-duplicates.

    Pixel bytes are md5-derived so an external SQL engine replays them
    exactly: ``v(base, p) = int(md5(f"{base}-{p}")[:2], 16)`` for
    ``p in [0, 72)``, written as (v, v, v). Every ``doc_id % 10 == 1``
    row re-renders its neighbor's content (``base = doc_id - 1``)
    perturbed at p=0 and p=31 by +96 mod 256 — p=0 participates in one
    dHash comparison and p=31 in two, so each planted pair sits within
    Hamming distance 3 of its base by construction. All other image
    pairs get independent md5 pixel noise (expected Hamming ~32; the
    probability any lands <= 3 is ~2.4e-15 per pair)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                dup = did % 10 == 1
                base = did - 1 if dup else did
                vals = [
                    int(
                        hashlib.md5(f"{base}-{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(DHASH_W * DHASH_H)
                ]
                if dup:
                    vals[0] = (vals[0] + 96) % 256
                    vals[31] = (vals[31] + 96) % 256
                payloads.append(
                    encode_bmp_24(
                        DHASH_W, DHASH_H, [(v, v, v) for v in vals]
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "image/bmp",
                    "width": DHASH_W,
                    "height": DHASH_H,
                }
            )

    # Measured exception to the _fixture_ids rebalance (r15): this
    # adapter's Python work is tiny (a few hundred md5-derived
    # bytes in a tiny container per row), so the extra exchange +
    # 32-task scheduling costs more than the parallelism returns
    # (sf0.1 floors WITH the rebalance: dhash 1.36 s -> 1.85 s, audio
    # fingerprint 1.02 s -> 1.49 s). The heavy-codec adapters keep it; at real scale the scan
    # itself supplies the splits either way.
    return df.select(F.col(id_col)).mapInPandas(_gen, schema=IMAGE_SCHEMA)


def extract_image_gray(
    media_df: DataFrame, *, on_error: str = "error", decode_counter=None
) -> DataFrame:
    """Decode stage -> per-image grayscale vector (row-major,
    ``(r + g + b) // 3`` integer mean), via the same magic-byte
    sniffing decoders and quarantine policy as
    :func:`extract_image_stats`. The payload column is consumed here —
    downstream hashing sees width/height and a small int array only.

    ``decode_counter`` (optional, accumulator-like with ``.add(n)``,
    e.g. ``sparkContext.accumulator(0)``) counts decode ATTEMPTS —
    one per payload reaching the codec, before the quarantine policy.
    This is the executable form of the decode-once contract behind the
    ``_banded_hamming_pairs`` pin (docs/BENCH_NOTES_r12.md): a plan
    that re-runs this stage shows ``counter > n_rows``, which
    tests/test_decode_once.py pins at exactly ``n_rows``.
    """
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _pixels(b: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
        if b[:2] == b"BM":
            return decode_bmp_24_pixels(b)
        if b[: len(_PNG_SIG)] == _PNG_SIG:
            return decode_png_rgb8_pixels(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif_rgb8_pixels(b)
        if b[:4] in (b"II*\x00", b"MM\x00*"):
            return decode_tiff_rgb8_pixels(b)
        if b[:2] == b"\xff\xd8":
            return decode_jpeg_pixels(b)
        raise ValueError(
            "unrecognized image payload (not BMP/PNG/GIF/TIFF/JPEG)"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_counter is not None:
                decode_counter.add(len(pdf))
            ids, ws, hs, grays = [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, px = _pixels(bytes(p))
                    g = [(r + gg + b) // 3 for r, gg, b in px]
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    w, h, g = None, None, None
                ids.append(did)
                ws.append(w)
                hs.append(h)
                grays.append(g)
            if not ids:
                # an all-skipped batch must not yield: an empty pandas
                # frame types 'gray' as float64, which Arrow cannot
                # cast to list<int>
                continue
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "gray": grays}
            )

    return media_df.mapInPandas(_decode, schema=IMAGE_GRAY_SCHEMA)


def _pack_bands(arr: str, index_for_bit) -> list:
    """The 4×16-bit sign-comparison band layout, defined ONCE for both
    fingerprint families: bit ``b`` of the 64-bit hash is set iff
    ``arr[i] < arr[ii]`` for ``(i, ii) = index_for_bit(b)`` (1-based
    element positions); band ``bc`` packs bits ``[16c, 16c+16)``. One
    JVM-side expression per band inside whole-stage codegen."""
    bands = []
    for c in range(4):
        terms = []
        for j in range(16):
            i, ii = index_for_bit(16 * c + j)
            terms.append(
                f"(CASE WHEN element_at({arr}, {i})"
                f" < element_at({arr}, {ii})"
                f" THEN {1 << j} ELSE 0 END)"
            )
        bands.append(F.expr(" + ".join(terms)).cast("long").alias(f"b{c}"))
    return bands


def _frame_guard(ok, what: str, got) -> "F.Column":
    """Null-safe in-plan dimension assert: a quarantined (on_error=
    'null') row reaching the hash stage fails LOUD with a readable
    message — a NULL condition must neither pass silently nor produce
    assert_true's null-message crash."""
    return F.assert_true(
        F.coalesce(ok, F.lit(False)),
        F.concat(
            F.lit(what),
            F.coalesce(got, F.lit("NULL (quarantined decode row?)")),
        ),
    ).isNull()


def image_dhash_bands(gray_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Difference hash from a 9x8 grayscale frame, as FOUR 16-bit band
    values (b0..b3) — the banding IS the output representation, so the
    pigeonhole join needs no bit-slicing later and no value ever nears
    the 64-bit sign bit.

    Bit ``b = y*8 + c`` (row-major comparisons) is set iff
    ``gray[y*9 + c] < gray[y*9 + c + 1]`` (:func:`_pack_bands`).
    Python touched the bytes once, in the decode stage. Inputs must be
    exactly 9x8 (resample upstream with ``resize_images``); anything
    else — including quarantined NULL rows from ``on_error="null"``
    decodes, which must be inspected and filtered BEFORE hashing —
    fails in-plan with a readable message, not silently.
    """
    guard = F.when(
        _frame_guard(
            (F.col("width") == DHASH_W) & (F.col("height") == DHASH_H),
            "image_dhash_bands: expected 9x8 grayscale frame, got ",
            # F.concat propagates NULL (unlike concat_ws), so a
            # quarantined row falls through to the coalesce hint
            F.concat(
                F.col("width").cast("string"), F.lit("x"),
                F.col("height").cast("string"),
            ),
        ),
        F.col("gray"),
    )

    def _idx(b: int) -> tuple[int, int]:
        y, cx = divmod(b, 8)
        i = y * DHASH_W + cx + 1  # element_at is 1-based
        return i, i + 1

    return gray_df.select(
        F.col(id_col), guard.alias("__g")
    ).select(F.col(id_col), *_pack_bands("__g", _idx))


def image_dhash_neardups(
    gray_df: DataFrame,
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    observation=None,
    on_over_cap: str = "error",
) -> DataFrame:
    """Image near-duplicate pairs with dHash Hamming distance <=
    ``max_hamming``: (doc_a, doc_b, hamming).

    Same pigeonhole contract as the SimHash text path
    (`operators/dedup.py`): 4 exact-match bands of 16 bits guarantee
    any pair within Hamming 3 shares at least one band, so candidates
    come from a capped self-equi-join on (band_id, band_value) — never
    an all-pairs scan. ``on_over_cap`` defaults to ``"error"`` because
    the pigeonhole recall contract forbids silent drops; a corpus with
    a boilerplate band (solid-color thumbnails) should surface it, and
    the caller can switch to ``observation`` + ``"drop"`` knowingly.
    """
    hashed = image_dhash_bands(gray_df, id_col)
    return _banded_hamming_pairs(
        hashed,
        id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        observation=observation,
        on_over_cap=on_over_cap,
    )


def _banded_hamming_pairs(
    hashed: DataFrame,
    id_col: str,
    *,
    max_hamming: int,
    max_bucket: int,
    observation,
    on_over_cap: str,
) -> DataFrame:
    """Pairs within Hamming ``max_hamming`` of a 64-bit fingerprint
    held as four 16-bit band columns b0..b3 — the shared join tail of
    the image-dHash and audio-fingerprint near-dup operators. 4 bands
    pigeonhole Hamming <= 3; candidates come from the capped
    self-equi-join on (band_id, band), never an all-pairs scan.

    The ``hashed`` frame is PINNED (``dedup._pin`` — the FIFO-bounded
    cache registry ``simhash_pairs`` uses for the identical shape): the
    capped pair join consumes it up to three times (bucket-occupancy
    aggregate + both self-join sides), and each consumption would
    otherwise re-run the upstream DECODE stage — the Arrow-batched
    Python codec pass that dominates these operators' cost (measured at
    sf0.1: 1.44 s decode vs 0.79 s join; the unpinned plan paid decode
    twice, 4.8 s end-to-end vs ~2.3 s pinned). The pinned frame is one
    ``(id, 4 x int)`` row per document — negligible next to the media
    bytes it replaces — and the registry unpersists oldest-first, so
    storage is bounded across invocations."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4x16-bit pigeonhole): {max_hamming}"
        )
    from .dedup import _bucket_pairs, _pin

    hashed = _pin(hashed)

    payload = F.struct(
        F.col(id_col).alias("id"),
        *[F.col(f"b{c}").alias(f"b{c}") for c in range(4)],
    ).alias("__idh")
    banded = hashed.select(
        payload,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("band_id"), F.col(f"b{c}").alias("band")
                )
                for c in range(4)
            ])
        ).alias("c"),
    ).select("__idh", F.col("c.band_id"), F.col("c.band"))
    cand = _bucket_pairs(
        banded,
        ["band_id", "band"],
        "__idh",
        max_size=max_bucket,
        observation=observation,
        on_over_cap=on_over_cap,
    )
    hamming = sum(
        F.bit_count(
            F.col(f"doc_a.b{c}").bitwiseXOR(F.col(f"doc_b.b{c}"))
        )
        for c in range(4)
    )
    return (
        cand.filter(hamming <= max_hamming)
        .select(
            F.col("doc_a.id").alias("doc_a"),
            F.col("doc_b.id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Audio near-duplicate detection: frame-energy delta fingerprint over
# decoded PCM16 samples — the audio leg of the modality triplet
# (SimHash text / dHash image / this)
# ---------------------------------------------------------------------------

AUDIO_ENERGY_SCHEMA = "doc_id long, n_frames int, energies array<long>"

# 65 frames of 4 samples -> 64 energy deltas -> a 64-bit fingerprint,
# same band layout as dHash (Haitsma-Kalker-style sign-of-change
# fingerprint reduced to frame energy — public technique).
AFP_FRAME_LEN = 4
AFP_N_FRAMES = 65
AFP_MIN_SAMPLES = AFP_FRAME_LEN * AFP_N_FRAMES


def decode_wav_pcm16_samples(payload: bytes) -> tuple[int, list[int]]:
    """Decode a PCM16 mono WAV into (sample_rate, samples) — the
    sample-returning twin of :func:`decode_wav_pcm16` (which aggregates
    to stats in-decoder and stays the cheap path for stats-only
    consumers). Same RIFF chunk walk, same fail-loud truncation rules.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + sz > len(payload):
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {sz} bytes, "
                f"{len(payload) - pos - 8} present"
            )
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_code != 1 or bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def attach_wav_neardup_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one real PCM16 mono WAV per row (260 samples)
    with PLANTED near-duplicates. Samples are md5-derived
    (``s(base, i) = int(md5(f"a{base}-{i}")[:4], 16) - 32768``); every
    ``doc_id % 10 == 1`` row re-renders its neighbor's samples
    (``base = doc_id - 1``) with sample 30 shifted by +24000 (mod the
    16-bit ring) — one sample sits in one frame, so at most the two
    deltas touching frame 7 flip: each planted pair is within Hamming 2
    of its base by construction."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                dup = did % 10 == 1
                base = did - 1 if dup else did
                samples = [
                    int(
                        hashlib.md5(f"a{base}-{i}".encode()).hexdigest()[:4],
                        16,
                    )
                    - 32768
                    for i in range(AFP_MIN_SAMPLES)
                ]
                if dup:
                    samples[30] = (
                        (samples[30] + 32768 + 24000) % 65536
                    ) - 32768
                payloads.append(encode_wav_pcm16(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "audio/wav",
                    "n_samples": AFP_MIN_SAMPLES,
                }
            )

    # Measured exception to the _fixture_ids rebalance (r15): this
    # adapter's Python work is tiny (a few hundred md5-derived
    # bytes in a tiny container per row), so the extra exchange +
    # 32-task scheduling costs more than the parallelism returns
    # (sf0.1 floors WITH the rebalance: dhash 1.36 s -> 1.85 s, audio
    # fingerprint 1.02 s -> 1.49 s). The heavy-codec adapters keep it; at real scale the scan
    # itself supplies the splits either way.
    return df.select(F.col(id_col)).mapInPandas(
        _gen,
        schema="doc_id long, payload binary, format string, n_samples int",
    )


def extract_audio_frame_energies(
    media_df: DataFrame, *, on_error: str = "error", decode_counter=None
) -> DataFrame:
    """Decode stage -> per-clip frame-energy vector: sum of squared
    PCM16 samples over each of the first ``AFP_N_FRAMES`` frames of
    ``AFP_FRAME_LEN`` samples (exact integers — 4·32768² fits easily in
    64 bits). A clip shorter than ``AFP_MIN_SAMPLES`` is a DATA error
    (quarantine-eligible under the same explicit policy as the image
    extractors); the payload is consumed here. ``decode_counter``:
    decode-attempt counter, same contract as
    :func:`extract_image_gray`."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_counter is not None:
                decode_counter.add(len(pdf))
            ids, nf, es = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _rate, samples = decode_wav_pcm16_samples(bytes(p))
                    if len(samples) < AFP_MIN_SAMPLES:
                        raise ValueError(
                            f"clip too short for fingerprint: "
                            f"{len(samples)} < {AFP_MIN_SAMPLES} samples"
                        )
                    e = [
                        sum(
                            s * s
                            for s in samples[
                                f * AFP_FRAME_LEN : (f + 1) * AFP_FRAME_LEN
                            ]
                        )
                        for f in range(AFP_N_FRAMES)
                    ]
                    n = AFP_N_FRAMES
                except (ValueError, struct.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    n, e = None, None
                ids.append(did)
                nf.append(n)
                es.append(e)
            if not ids:
                continue  # see extract_image_gray: empty frames mistype
            yield pd.DataFrame(
                {"doc_id": ids, "n_frames": nf, "energies": es}
            )

    return media_df.mapInPandas(_decode, schema=AUDIO_ENERGY_SCHEMA)


def audio_fingerprint_bands(
    energy_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """64-bit energy-delta fingerprint as four 16-bit bands: bit ``b``
    is set iff ``energies[b] < energies[b+1]`` (0-based) — the
    sign-of-change sequence, robust to level scaling just like dHash is
    to brightness (:func:`_pack_bands` — one band layout for both
    fingerprint families). Quarantined NULL rows from
    ``on_error="null"`` decodes fail in-plan with a readable message;
    inspect and filter them before hashing."""
    guard = F.when(
        _frame_guard(
            F.col("n_frames") == AFP_N_FRAMES,
            f"audio_fingerprint_bands: expected {AFP_N_FRAMES} frames,"
            f" got ",
            F.col("n_frames").cast("string"),
        ),
        F.col("energies"),
    )
    return energy_df.select(
        F.col(id_col), guard.alias("__e")
    ).select(F.col(id_col), *_pack_bands("__e", lambda b: (b + 1, b + 2)))


def audio_fingerprint_neardups(
    energy_df: DataFrame,
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    observation=None,
    on_over_cap: str = "error",
) -> DataFrame:
    """Audio near-duplicate pairs with fingerprint Hamming distance <=
    ``max_hamming``: (doc_a, doc_b, hamming). Shares the capped
    pigeonhole band join with the image path — see
    :func:`_banded_hamming_pairs` for the recall contract."""
    hashed = audio_fingerprint_bands(energy_df, id_col)
    return _banded_hamming_pairs(
        hashed,
        id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        observation=observation,
        on_over_cap=on_over_cap,
    )
