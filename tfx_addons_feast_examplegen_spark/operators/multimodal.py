"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension: at 100 TB, image/audio/video columns ride through
the engine as ``binary`` payloads with typed metadata columns; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` stages on
executors. The decode kernels themselves need codec libraries that are
NOT in this container, so the kernel boundary is explicit:

- the Spark-side plumbing (schemas, batch iteration, partition sizing,
  UDF signatures, metadata propagation) is REAL and tested;
- the pixel/sample decoding is stubbed: :class:`StubImageCodec` raises
  ``NotImplementedError`` unless ``deterministic_fake=True``, which
  produces seeded, content-derived fake features so pipelines and tests
  exercise realistic shapes end-to-end.

Swap in a real codec by implementing ``decode(payload) -> features`` with
the same signature; nothing else changes.
"""

from __future__ import annotations

import hashlib
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
