"""Multimodal (image/audio) decode + stats entries.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import register_tables




def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL multimodal decode, fully oracle-checked: real 24-bit BMP
    # containers are synthesized per document (closed-form pixel values
    # derived from doc_id), then decoded back by a pure-stdlib BMP parser
    # (header offsets, row padding, BGR order) inside an Arrow-batched
    # mapInPandas stage. The oracle re-derives the same integer channel
    # stats from the pixel formula alone — the decoder must parse the
    # container bit-exactly for the hashes to meet. Compressed formats
    # (JPEG/MP3) stay behind the StubImageCodec boundary.
    from ..operators.multimodal import attach_bmp_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_bmp_payloads(t["documents"])
    return extract_image_stats(media)


_MULTIMODAL_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS INT) AS width,
         CAST(doc_id % 11 + 4 AS INT) AS height
  FROM documents
),
px AS (
  SELECT d.doc_id, d.width, d.height, c.c,
         (d.doc_id*7 + y.y*31 + x.x*3 + c.c*11) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.height)) AS y) y,
       LATERAL (SELECT unnest(range(0, d.width)) AS x) x,
       LATERAL (SELECT unnest([0,1,2]) AS c) c
)
SELECT doc_id, width, height,
       CAST(SUM(CASE WHEN c=0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c=1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c=2 THEN v END) AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id, width, height
"""


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL image resize, fully oracle-checked end-to-end: a mixed-
    # container corpus (BMP for even doc_ids, PNG for odd — the resize
    # stage must sniff both) is nearest-neighbor resampled to 6x5 with
    # the explicit index map sx = x*w//6, sy = y*h//5, re-encoded as
    # BMP, and decoded AGAIN for channel stats. The oracle replays the
    # index map against the closed-form pixel formula — four codec
    # passes (encode, decode, encode, decode) must all be bit-exact for
    # the hashes to meet.
    from ..operators.multimodal import (
        attach_bmp_payloads,
        attach_png_payloads,
        extract_image_stats,
        resize_images,
    )

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    media = attach_bmp_payloads(docs.filter("doc_id % 2 = 0")).unionByName(
        attach_png_payloads(docs.filter("doc_id % 2 = 1"))
    )
    return extract_image_stats(
        resize_images(media, target_width=6, target_height=5)
    )


_MULTIMODAL_RESIZE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS INT) AS w,
         CAST(doc_id % 11 + 4 AS INT) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, c.c,
         (d.doc_id*7 + ((y.y * d.h) // 5)*31 + ((x.x * d.w) // 6)*3
          + c.c*11) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, 5)) AS y) y,
       LATERAL (SELECT unnest(range(0, 6)) AS x) x,
       LATERAL (SELECT unnest([0,1,2]) AS c) c
)
SELECT doc_id, CAST(6 AS INT) AS width, CAST(5 AS INT) AS height,
       CAST(SUM(CASE WHEN c=0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c=1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c=2 THEN v END) AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
"""


def _q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Third real codec behind the multimodal boundary: 8-bit RGB PNG,
    # pure stdlib (zlib inflate + chunk CRC verification + all five
    # scanline filters reconstructed — the encoder cycles filter types
    # per row, so unfiltering is genuinely on the checked path). Same
    # closed-form pixel content as the BMP entry, so the SAME oracle
    # re-derives the stats from the formula; the decode stage sniffs the
    # container from magic bytes. JPEG/MP3/H.264 remain behind the
    # explicit StubImageCodec boundary (no stdlib codec exists).
    from ..operators.multimodal import attach_png_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_png_payloads(t["documents"])
    return extract_image_stats(media)


def _q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fourth real STILL-IMAGE codec behind the multimodal boundary:
    # GIF89a, pure stdlib (logical-screen/extension/descriptor block
    # walk, global color table, variable-width LSB-first LZW decode
    # with the KwKwK case, deferred-clear tolerance and the 12-bit
    # table ceiling, 4-pass interlace reorder for odd doc_ids). GIF's
    # palette path is LOSSLESS, so the fixture reuses the BMP/PNG
    # closed-form pixel content and the SAME external oracle re-derives
    # the stats — three containers, one oracle, and the decode stage
    # sniffs which codec applies from magic bytes alone.
    from ..operators.multimodal import attach_gif_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_gif_payloads(t["documents"])
    return extract_image_stats(media)


def _q_multimodal_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fifth real STILL-IMAGE codec behind the multimodal boundary:
    # baseline TIFF 6.0, pure stdlib (IFD walk in both byte orders,
    # strip assembly, compression none / MSB-first LZW with the
    # early-change width bump / PackBits, horizontal differencing
    # predictor). TIFF's 8-bit path is LOSSLESS, so the fixture reuses
    # the BMP/PNG/GIF closed-form pixel content and the SAME external
    # oracle re-derives the stats — four lossless containers, one
    # oracle, and the decode stage sniffs which codec applies from the
    # II*/MM* magic alone. The fixture rotates compression, predictor,
    # byte order and strip layout per doc_id so every decoder branch is
    # on the driver-checked path.
    from ..operators.multimodal import attach_tiff_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_tiff_payloads(t["documents"])
    return extract_image_stats(media)


def _q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fourth real codec behind the multimodal boundary, and the one a
    # real multimodal corpus always contains: BASELINE JPEG, pure
    # stdlib (marker walk, canonical huffman reconstruction from DHT,
    # DPCM DC + EOB/ZRL run-length AC entropy decode, dequantize,
    # dezigzag, float IDCT). JPEG is lossy, so the fixture makes the
    # loss provably zero instead of tolerated: every 8x8 block is
    # constant, whose DCT is a single integer DC coefficient stored
    # exactly under the all-ones quantization table — decode is
    # bit-exact by construction and the oracle re-derives the stats
    # from the per-block closed form (sum = 64 * block value).
    # Progressive streams have their own entry below; arithmetic-coded
    # JPEG remains behind the documented StubImageCodec boundary.
    from ..operators.multimodal import attach_jpeg_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_jpeg_payloads(t["documents"])
    return extract_image_stats(media)


_MULTIMODAL_JPEG_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 3 + 1 AS INT) AS wb,
         CAST(doc_id % 2 + 1 AS INT) AS hb
  FROM documents
),
blk AS (
  SELECT d.doc_id, d.wb * 8 AS width, d.hb * 8 AS height,
         (d.doc_id*7 + by.by*31 + bx.bx*3) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.hb)) AS by) by,
       LATERAL (SELECT unnest(range(0, d.wb)) AS bx) bx
)
SELECT doc_id, width, height,
       CAST(SUM(v) * 64 AS BIGINT) AS r_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS g_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM blk GROUP BY doc_id, width, height
"""


def _q_multimodal_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Fifth real codec variant: PROGRESSIVE JPEG (SOF2 — spectral
    # selection + successive approximation per T.81 annex G), the
    # dominant JPEG flavor in web-crawled corpora. The decode walks the
    # full 6-scan luminance ladder: DC first/refine, AC band scans with
    # EOBn end-of-band runs, AC refinement correction bits, and (for
    # 2/3 of the docs) restart markers INSIDE progressive scans. Same
    # bit-exact meet-in-the-middle construction as the baseline JPEG
    # entry: per-block-constant content -> single DC coefficient ->
    # lossless under the all-ones quantization table, with the oracle
    # re-deriving the stats from the closed-form block formula.
    from ..operators.multimodal import (
        attach_jpeg_progressive_payloads,
        extract_image_stats,
    )

    t = register_tables(spark, sf_dir)
    media = attach_jpeg_progressive_payloads(t["documents"])
    return extract_image_stats(media)


_MULTIMODAL_JPEG_PROG_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 4 + 1 AS INT) AS wb,
         CAST(doc_id % 3 + 1 AS INT) AS hb
  FROM documents
),
blk AS (
  SELECT d.doc_id, d.wb * 8 AS width, d.hb * 8 AS height,
         (d.doc_id*11 + by.by*17 + bx.bx*5) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.hb)) AS by) by,
       LATERAL (SELECT unnest(range(0, d.wb)) AS bx) bx
)
SELECT doc_id, width, height,
       CAST(SUM(v) * 64 AS BIGINT) AS r_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS g_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM blk GROUP BY doc_id, width, height
"""


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same meet-in-the-middle check for audio: real PCM16 mono WAV
    # containers (RIFF/fmt/data chunks) decoded by a chunk-walking
    # parser; the oracle replays the sample formula.
    from ..operators.multimodal import attach_wav_payloads, extract_audio_stats

    t = register_tables(spark, sf_dir)
    media = attach_wav_payloads(t["documents"])
    return extract_audio_stats(media)


_MULTIMODAL_AUDIO_ORACLE = """
WITH n AS (
  SELECT doc_id, CAST(doc_id % 50 + 10 AS INT) AS n_samples FROM documents
),
s AS (
  SELECT n.doc_id, n.n_samples,
         ((n.doc_id*13 + i.i*17) % 65536) - 32768 AS v
  FROM n, LATERAL (SELECT unnest(range(0, n.n_samples)) AS i) i
)
SELECT doc_id,
       8000 AS sample_rate,
       n_samples,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       CAST(MIN(v) AS INT) AS s_min,
       CAST(MAX(v) AS INT) AS s_max
FROM s GROUP BY doc_id, n_samples
"""


def _q_multimodal_mp3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MP3 frame-HEADER stats (not spectral decode — that stays behind
    # the documented codec boundary): walk ISO 11172-3 Layer III frame
    # headers, skipping a leading ID3v2 container via its syncsafe
    # size, and aggregate frame count / sample rate / bitrate min-max-
    # sum / byte length. The standard first pass over a crawled audio
    # corpus: duration and bitrate histograms for free. The fixture
    # emits conformant header streams with closed-form per-frame
    # bitrate/padding the oracle replays, including the exact
    # 144*bitrate/sample_rate+padding frame-length arithmetic — a
    # header walker that mis-sizes any frame loses sync and fails loud.
    from ..operators.multimodal import attach_mp3_payloads, extract_mp3_stats

    t = register_tables(spark, sf_dir)
    media = attach_mp3_payloads(t["documents"])
    return extract_mp3_stats(media)


_MULTIMODAL_MP3_ORACLE = """
WITH fr AS (
  SELECT d.doc_id,
         CAST(d.doc_id % 20 + 5 AS INT) AS n_frames,
         CAST(d.doc_id % 3 AS INT) AS sridx,
         list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                      CAST((d.doc_id + i.i) % 14 + 1 AS INT)) AS kbps,
         CAST((d.doc_id + i.i) % 2 AS INT) AS pad
  FROM documents d,
       LATERAL (SELECT unnest(range(0, d.doc_id % 20 + 5)) AS i) i
)
SELECT doc_id,
       n_frames,
       CAST(list_extract([44100, 48000, 32000], sridx + 1) AS INT)
         AS sample_rate,
       CAST(MIN(kbps) AS INT) AS kbps_min,
       CAST(MAX(kbps) AS INT) AS kbps_max,
       CAST(SUM(kbps) AS BIGINT) AS kbps_sum,
       CAST(SUM(144000 * kbps
                // list_extract([44100, 48000, 32000], sridx + 1) + pad)
            + CASE WHEN doc_id % 2 = 1 THEN 10 + doc_id % 17 ELSE 0 END
            AS BIGINT) AS total_bytes
FROM fr GROUP BY doc_id, n_frames, sridx
"""


def _q_multimodal_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VIDEO modality, container level (the MP3-header analog): walk the
    # ISO BMFF (MP4) box tree — ftyp, moov/mvhd (32- and 64-bit time
    # variants), per-track tkhd 16.16 presentation dimensions, hdlr
    # kind dispatch, stsd codec fourccs, and mdat byte size including
    # the size==1 + 64-bit largesize form — for duration / resolution /
    # codec-mix stats without decoding a single coded frame. The
    # fixture emits conformant containers with closed-form field values
    # the oracle replays (including the duration*1000//timescale
    # millisecond arithmetic); a walker that mis-sizes any box overruns
    # its scope and fails loud. Coded-stream decode (H.264/AAC) stays
    # behind the documented StubImageCodec boundary.
    from ..operators.multimodal import attach_mp4_payloads, extract_mp4_stats

    t = register_tables(spark, sf_dir)
    media = attach_mp4_payloads(t["documents"])
    return extract_mp4_stats(media)


_MULTIMODAL_MP4_ORACLE = """
SELECT doc_id,
       CAST(600 * (doc_id % 4 + 1) AS INT) AS timescale,
       CAST((doc_id % 9000 + 600) * 1000
            // (600 * (doc_id % 4 + 1)) AS BIGINT) AS duration_ms,
       CAST(1 + doc_id % 3 AS INT) AS n_tracks,
       CAST(1 AS INT) AS n_video,
       CAST(doc_id % 3 AS INT) AS n_audio,
       CAST((doc_id % 16 + 4) * 16 AS INT) AS width,
       CAST((doc_id % 9 + 3) * 16 AS INT) AS height,
       CASE WHEN doc_id % 3 = 0 THEN 'avc1' ELSE 'avc1,mp4a' END AS codecs,
       CAST(doc_id % 257 + 9 AS BIGINT) AS mdat_bytes
FROM documents
"""


def _q_multimodal_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AUDIO container breadth: FLAC's mandatory STREAMINFO block —
    # sample rate (20-bit field), channels (3-bit), bit depth (5-bit)
    # and total samples (36-bit) from one bit-packed 64-bit word, plus
    # the metadata-block chain walk (is-last flags, length-skipped
    # PADDING blocks). Exact duration for free: total*1000//rate, no
    # subframe decode. The fixture rotates rates/channels/block-chain
    # length; the oracle replays the closed form including the
    # millisecond arithmetic.
    from ..operators.multimodal import attach_flac_payloads, extract_flac_stats

    t = register_tables(spark, sf_dir)
    return extract_flac_stats(attach_flac_payloads(t["documents"]))


_MULTIMODAL_FLAC_ORACLE = """
SELECT doc_id,
       CAST(list_extract([8000,16000,22050,24000,32000,44100,48000],
                         CAST(doc_id % 7 + 1 AS INT)) AS INT) AS sample_rate,
       CAST(doc_id % 2 + 1 AS INT) AS channels,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(doc_id * 371 % 100000 + 1000 AS BIGINT) AS total_samples,
       CAST((doc_id * 371 % 100000 + 1000) * 1000
            // list_extract([8000,16000,22050,24000,32000,44100,48000],
                            CAST(doc_id % 7 + 1 AS INT)) AS BIGINT)
         AS duration_ms,
       CAST(1 + doc_id % 3 AS INT) AS n_metadata_blocks
FROM documents
"""


def _q_multimodal_ogg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AUDIO container breadth: Ogg page framing (RFC 3533) — page and
    # packet counts from the lacing tables, stream duration from the
    # last page's granule position, with every page's CRC verified
    # (poly 0x04C11DB7, unreflected — NOT zlib's crc32). The walker
    # must reproduce the exact 27 + n_segments + sum(lacing) page
    # arithmetic against checksums; the oracle replays the same sums
    # from the closed-form lacing values.
    from ..operators.multimodal import attach_ogg_payloads, extract_ogg_stats

    t = register_tables(spark, sf_dir)
    return extract_ogg_stats(attach_ogg_payloads(t["documents"]))


_MULTIMODAL_OGG_ORACLE = """
WITH p AS (
  SELECT d.doc_id,
         CAST(d.doc_id % 7 + 2 AS INT) AS n_pages,
         CAST(d.doc_id % 4 + 1 AS INT) AS nseg,
         (d.doc_id + i.i * 7 + s.s * 13) % 255 AS lacing
  FROM documents d,
       LATERAL (SELECT unnest(range(0, d.doc_id % 7 + 2)) AS i) i,
       LATERAL (SELECT unnest(range(0, d.doc_id % 4 + 1)) AS s) s
)
SELECT doc_id,
       n_pages,
       CAST(n_pages * nseg AS INT) AS n_packets,
       CAST(n_pages * (doc_id % 1000 + 100) AS BIGINT) AS last_granule,
       CAST(doc_id % 65536 + 1 AS BIGINT) AS serial,
       CAST(SUM(lacing) + n_pages * (27 + nseg) AS BIGINT) AS total_bytes
FROM p GROUP BY doc_id, n_pages, nseg
"""


def _q_multimodal_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real sample-level AUDIO DECODE beyond PCM: G.711 companded WAV
    # (format 6 A-law / 7 mu-law — the telephony-corpus formats), each
    # 8-bit byte expanded to linear through the exact ITU-T segment
    # arithmetic before aggregation. mu-law for even doc_ids, A-law
    # for odd; the oracle replays BOTH expansion formulas bit-for-bit
    # in SQL (xor/shift/segment CASE), so a decoder off by one table
    # segment or a flipped sign bit hash-mismatches.
    from ..operators.multimodal import attach_g711_payloads, extract_g711_stats

    t = register_tables(spark, sf_dir)
    return extract_g711_stats(attach_g711_payloads(t["documents"]))


_MULTIMODAL_G711_ORACLE = """
WITH b AS (
  SELECT d.doc_id, (d.doc_id * 13 + i.i * 29) % 256 AS v
  FROM documents d,
       LATERAL (SELECT unnest(range(0, d.doc_id % 40 + 8)) AS i) i
),
s AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN
      CASE WHEN (xor(v, 255) & 128) > 0
        THEN 132 - ((((xor(v, 255) & 15) << 3) + 132)
                    << ((xor(v, 255) >> 4) & 7))
        ELSE ((((xor(v, 255) & 15) << 3) + 132)
              << ((xor(v, 255) >> 4) & 7)) - 132 END
    ELSE
      CASE WHEN (xor(v, 85) & 128) > 0 THEN 1 ELSE -1 END *
      CASE (xor(v, 85) & 112) >> 4
        WHEN 0 THEN ((xor(v, 85) & 15) << 4) + 8
        WHEN 1 THEN ((xor(v, 85) & 15) << 4) + 264
        ELSE (((xor(v, 85) & 15) << 4) + 264)
             << (((xor(v, 85) & 112) >> 4) - 1) END
    END AS lin
  FROM b
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS coding,
       CAST(8000 AS INT) AS sample_rate,
       CAST(doc_id % 40 + 8 AS INT) AS n_samples,
       CAST(SUM(lin) AS BIGINT) AS sample_sum,
       CAST(MIN(lin) AS INT) AS s_min,
       CAST(MAX(lin) AS INT) AS s_max
FROM s GROUP BY doc_id
"""


def _q_multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IMAGE near-dup detection end-to-end through the real codec
    # boundary: decode 9x8 grayscale BMPs (md5-derived pixel content
    # with planted neighbor-duplicates for doc_id % 10 == 1), compute
    # the 64-bit difference hash as four JVM-side 16-bit bands, and
    # find all pairs within Hamming 3 via the capped pigeonhole
    # self-join — never an all-pairs scan. The oracle replays pixels,
    # hash bits AND the pair search from the closed form, brute-force
    # (a different algorithm meeting the same answer).
    from ..operators.multimodal import (
        attach_bmp_neardup_payloads,
        extract_image_gray,
        image_dhash_neardups,
    )

    t = register_tables(spark, sf_dir)
    gray = extract_image_gray(attach_bmp_neardup_payloads(t["documents"]))
    return image_dhash_neardups(gray, max_hamming=3, on_over_cap="error")


_MULTIMODAL_DHASH_ORACLE = """
WITH px AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
           AS base,
         d.doc_id % 10 = 1 AS dup, p.p
  FROM documents d, LATERAL (SELECT unnest(range(0, 72)) AS p) p
),
v AS (
  SELECT doc_id, p,
    CASE WHEN dup AND (p = 0 OR p = 31)
      THEN (('0x' || substr(md5(base || '-' || p), 1, 2))::INTEGER + 96) % 256
      ELSE ('0x' || substr(md5(base || '-' || p), 1, 2))::INTEGER
    END AS v
  FROM px
),
bits AS (
  SELECT l.doc_id, (l.p // 9) * 8 + (l.p % 9) AS b
  FROM v l JOIN v r ON r.doc_id = l.doc_id AND r.p = l.p + 1
  WHERE l.p % 9 < 8 AND l.v < r.v
),
bands AS (
  SELECT doc_id,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 0 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b0,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 1 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b1,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 2 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b2,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 3 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b3
  FROM bits GROUP BY doc_id
),
allb AS (
  SELECT d.doc_id, COALESCE(b0, 0) AS b0, COALESCE(b1, 0) AS b1,
         COALESCE(b2, 0) AS b2, COALESCE(b3, 0) AS b3
  FROM documents d LEFT JOIN bands USING (doc_id)
)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          AS INTEGER) AS hamming
FROM allb x JOIN allb y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


def _q_multimodal_audio_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # AUDIO near-dup detection end-to-end through the real WAV decode:
    # 260-sample PCM16 clips (md5-derived samples, planted neighbor-
    # duplicates with one shifted sample for doc_id % 10 == 1), frame
    # energies in the decode stage, the 64-bit energy-delta fingerprint
    # as JVM-side band expressions, pairs via the shared capped
    # pigeonhole join. The oracle replays samples, energies, bits AND a
    # brute-force pair search from the closed form.
    from ..operators.multimodal import (
        attach_wav_neardup_payloads,
        audio_fingerprint_neardups,
        extract_audio_frame_energies,
    )

    t = register_tables(spark, sf_dir)
    energies = extract_audio_frame_energies(
        attach_wav_neardup_payloads(t["documents"])
    )
    return audio_fingerprint_neardups(
        energies, max_hamming=3, on_over_cap="error"
    )


_MULTIMODAL_AUDIO_FP_ORACLE = """
WITH raw AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
           AS base,
         d.doc_id % 10 = 1 AS dup, i.i
  FROM documents d, LATERAL (SELECT unnest(range(0, 260)) AS i) i
),
s AS (
  SELECT doc_id, i,
    CASE WHEN dup AND i = 30
      THEN (('0x' || substr(md5('a' || base || '-' || i), 1, 4))::INTEGER
            + 24000) % 65536 - 32768
      ELSE ('0x' || substr(md5('a' || base || '-' || i), 1, 4))::INTEGER
           - 32768
    END AS v
  FROM raw
),
e AS (
  SELECT doc_id, i // 4 AS f, SUM(CAST(v AS BIGINT) * v) AS energy
  FROM s GROUP BY 1, 2
),
bits AS (
  SELECT l.doc_id, l.f AS b
  FROM e l JOIN e r ON r.doc_id = l.doc_id AND r.f = l.f + 1
  WHERE l.f < 64 AND l.energy < r.energy
),
bands AS (
  SELECT doc_id,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 0 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b0,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 1 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b1,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 2 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b2,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 3 THEN 1 << (b % 16) END), 0)
         AS BIGINT) AS b3
  FROM bits GROUP BY doc_id
),
allb AS (
  SELECT d.doc_id, COALESCE(b0, 0) AS b0, COALESCE(b1, 0) AS b1,
         COALESCE(b2, 0) AS b2, COALESCE(b3, 0) AS b3
  FROM documents d LEFT JOIN bands USING (doc_id)
)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          AS INTEGER) AS hamming
FROM allb x JOIN allb y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


def _q_multimodal_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The multimodal capstone: one pass produces per-document keep/drop
    # verdicts across ALL THREE modalities — exact text dedup (md5
    # fingerprint, min-doc_id wins; duplicates planted at doc_id%10==5
    # as neighbor copies), image near-dup (dHash pigeonhole pairs,
    # larger side drops) and audio near-dup (energy-delta fingerprint,
    # same rule) — each leg through its REAL decode path. The oracle
    # replays every leg from the closed forms, including both
    # brute-force pair searches. Flags are reported independently (no
    # precedence collapse), keep = none set.
    from ..operators.multimodal import (
        attach_bmp_neardup_payloads,
        attach_wav_neardup_payloads,
        audio_fingerprint_neardups,
        extract_audio_frame_energies,
        extract_image_gray,
        image_dhash_neardups,
    )

    t = register_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    neigh = docs.select(
        (F.col("doc_id") + 1).alias("nid"), F.col("text").alias("prev_text")
    )
    eff = docs.join(neigh, F.col("doc_id") == F.col("nid"), "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10 == 5) & F.col("prev_text").isNotNull(),
            F.col("prev_text"),
        )
        .otherwise(F.col("text"))
        .alias("eff_text"),
    )
    fp = eff.select("doc_id", F.md5("eff_text").alias("fp"))
    # keepers is corpus-proportional (one row per distinct text) — it
    # must NOT be broadcast-hinted; a plain equi-join on fp shuffles
    # both sides (the exact_dedup shape) and AQE may still broadcast
    # it when it measures small
    keepers = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    tdup = fp.join(keepers, "fp").select(
        "doc_id", (F.col("doc_id") != F.col("keep_id")).alias("text_dup")
    )
    img_dup = (
        image_dhash_neardups(
            extract_image_gray(attach_bmp_neardup_payloads(docs))
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__i", F.lit(True))
    )
    aud_dup = (
        audio_fingerprint_neardups(
            extract_audio_frame_energies(attach_wav_neardup_payloads(docs))
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__a", F.lit(True))
    )
    return (
        tdup.join(img_dup, "doc_id", "left")
        .join(aud_dup, "doc_id", "left")
        .select(
            "doc_id",
            "text_dup",
            F.coalesce(F.col("__i"), F.lit(False)).alias("image_dup"),
            F.coalesce(F.col("__a"), F.lit(False)).alias("audio_dup"),
            (
                ~(
                    F.col("text_dup")
                    | F.coalesce(F.col("__i"), F.lit(False))
                    | F.coalesce(F.col("__a"), F.lit(False))
                )
            ).alias("keep"),
        )
    )


_MULTIMODAL_CORPUS_PREP_ORACLE = """
WITH docs AS (SELECT doc_id, text FROM documents),
eff AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 5 AND p.text IS NOT NULL
              THEN p.text ELSE d.text END AS eff_text
  FROM docs d LEFT JOIN docs p ON p.doc_id = d.doc_id - 1
),
fp AS (SELECT doc_id, md5(eff_text) AS f FROM eff),
keepers AS (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY 1),
tdup AS (
  SELECT fp.doc_id, fp.doc_id <> k.keep_id AS text_dup
  FROM fp JOIN keepers k USING (f)
),
ipx AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
           AS base,
         d.doc_id % 10 = 1 AS dup, p.p
  FROM documents d, LATERAL (SELECT unnest(range(0, 72)) AS p) p
),
iv AS (
  SELECT doc_id, p,
    CASE WHEN dup AND (p = 0 OR p = 31)
      THEN (('0x' || substr(md5(base || '-' || p), 1, 2))::INTEGER + 96) % 256
      ELSE ('0x' || substr(md5(base || '-' || p), 1, 2))::INTEGER
    END AS v
  FROM ipx
),
ibits AS (
  SELECT l.doc_id, (l.p // 9) * 8 + (l.p % 9) AS b
  FROM iv l JOIN iv r ON r.doc_id = l.doc_id AND r.p = l.p + 1
  WHERE l.p % 9 < 8 AND l.v < r.v
),
ibands AS (
  SELECT doc_id,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 0 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b0,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 1 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b1,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 2 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b2,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 3 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b3
  FROM ibits GROUP BY doc_id
),
iallb AS (
  SELECT d.doc_id, COALESCE(b0, 0) AS b0, COALESCE(b1, 0) AS b1,
         COALESCE(b2, 0) AS b2, COALESCE(b3, 0) AS b3
  FROM documents d LEFT JOIN ibands USING (doc_id)
),
idup AS (
  SELECT DISTINCT y.doc_id
  FROM iallb x JOIN iallb y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
),
araw AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
           AS base,
         d.doc_id % 10 = 1 AS dup, i.i
  FROM documents d, LATERAL (SELECT unnest(range(0, 260)) AS i) i
),
asmp AS (
  SELECT doc_id, i,
    CASE WHEN dup AND i = 30
      THEN (('0x' || substr(md5('a' || base || '-' || i), 1, 4))::INTEGER
            + 24000) % 65536 - 32768
      ELSE ('0x' || substr(md5('a' || base || '-' || i), 1, 4))::INTEGER
           - 32768
    END AS v
  FROM araw
),
ae AS (
  SELECT doc_id, i // 4 AS f, SUM(CAST(v AS BIGINT) * v) AS energy
  FROM asmp GROUP BY 1, 2
),
abits AS (
  SELECT l.doc_id, l.f AS b
  FROM ae l JOIN ae r ON r.doc_id = l.doc_id AND r.f = l.f + 1
  WHERE l.f < 64 AND l.energy < r.energy
),
abands AS (
  SELECT doc_id,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 0 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b0,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 1 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b1,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 2 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b2,
    CAST(COALESCE(SUM(CASE WHEN b // 16 = 3 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b3
  FROM abits GROUP BY doc_id
),
aallb AS (
  SELECT d.doc_id, COALESCE(b0, 0) AS b0, COALESCE(b1, 0) AS b1,
         COALESCE(b2, 0) AS b2, COALESCE(b3, 0) AS b3
  FROM documents d LEFT JOIN abands USING (doc_id)
),
adup AS (
  SELECT DISTINCT y.doc_id
  FROM aallb x JOIN aallb y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
)
SELECT d.doc_id, t.text_dup,
       i.doc_id IS NOT NULL AS image_dup,
       a.doc_id IS NOT NULL AS audio_dup,
       NOT (t.text_dup OR i.doc_id IS NOT NULL OR a.doc_id IS NOT NULL)
         AS keep
FROM docs d
JOIN tdup t USING (doc_id)
LEFT JOIN idup i ON i.doc_id = d.doc_id
LEFT JOIN adup a ON a.doc_id = d.doc_id
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "multimodal_features": (_q_multimodal, _MULTIMODAL_ORACLE),
    "multimodal_corpus_prep": (
        _q_multimodal_corpus_prep,
        _MULTIMODAL_CORPUS_PREP_ORACLE,
    ),
    "multimodal_image_dhash_neardup": (
        _q_multimodal_dhash_neardup,
        _MULTIMODAL_DHASH_ORACLE,
    ),
    "multimodal_audio_fingerprint_neardup": (
        _q_multimodal_audio_fingerprint,
        _MULTIMODAL_AUDIO_FP_ORACLE,
    ),
    "multimodal_image_png": (_q_multimodal_png, _MULTIMODAL_ORACLE),
    "multimodal_image_gif": (_q_multimodal_gif, _MULTIMODAL_ORACLE),
    "multimodal_image_tiff": (_q_multimodal_tiff, _MULTIMODAL_ORACLE),
    "multimodal_image_jpeg": (_q_multimodal_jpeg, _MULTIMODAL_JPEG_ORACLE),
    "multimodal_image_jpeg_progressive": (
        _q_multimodal_jpeg_progressive,
        _MULTIMODAL_JPEG_PROG_ORACLE,
    ),
    "multimodal_image_resize": (_q_multimodal_resize, _MULTIMODAL_RESIZE_ORACLE),
    "multimodal_audio_stats": (_q_multimodal_audio, _MULTIMODAL_AUDIO_ORACLE),
    "multimodal_audio_mp3_stats": (_q_multimodal_mp3, _MULTIMODAL_MP3_ORACLE),
    "multimodal_video_mp4_stats": (_q_multimodal_mp4, _MULTIMODAL_MP4_ORACLE),
    "multimodal_audio_flac_stats": (_q_multimodal_flac, _MULTIMODAL_FLAC_ORACLE),
    "multimodal_audio_ogg_stats": (_q_multimodal_ogg, _MULTIMODAL_OGG_ORACLE),
    "multimodal_audio_g711_stats": (_q_multimodal_g711, _MULTIMODAL_G711_ORACLE),
}
