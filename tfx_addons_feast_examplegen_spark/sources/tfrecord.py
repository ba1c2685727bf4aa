"""TFRecord file sink for serialized example bytes.

The reference's terminal stage ([delegated] to TFX's
``BaseExampleGenExecutor`` at ``executor.py:163,181``) writes gzipped
TFRecord files of serialized ``tf.Example`` under ``Split-{name}/``.
Rebuilt here without TensorFlow: the TFRecord framing is public and tiny —

    uint64 length (LE) | uint32 masked_crc32c(length) |
    bytes  data        | uint32 masked_crc32c(data)

crc32c (Castagnoli) is implemented with a precomputed table; the mask is
``((crc >> 15) | (crc << 17)) + 0xa282ead8``.

Scale note: writing happens per-partition on executors via
``foreachPartition`` — embarrassingly parallel, no shuffle, one file per
partition per split (the same layout a FileFormat sink would produce).
This is imperative I/O at the serialization edge, the one place the
SURVEY sanctions mapPartitions-style code.
"""

from __future__ import annotations

import gzip
import os
import struct
import uuid

_CRC_TABLE = []
_POLY = 0x82F63B78  # Castagnoli, reflected


def _build_table() -> None:
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _POLY if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _write_record(f, rec: bytes) -> None:
    """Append one framed record to an open file handle (streaming)."""
    length = struct.pack("<Q", len(rec))
    f.write(length)
    f.write(struct.pack("<I", _masked_crc(length)))
    f.write(rec)
    f.write(struct.pack("<I", _masked_crc(rec)))


def write_tfrecords(records, path: str, compress: bool = True) -> int:
    """Write an iterable of bytes records as one TFRecord file. Returns count."""
    opener = gzip.open if compress else open
    n = 0
    with opener(path, "wb") as f:
        for rec in records:
            _write_record(f, rec)
            n += 1
    return n


def _iter_framed(f, origin: str):
    """Yield records from an open TFRecord stream, verifying both CRCs."""
    while True:
        header = f.read(8)
        if not header:
            return
        (length,) = struct.unpack("<Q", header)
        (lcrc,) = struct.unpack("<I", f.read(4))
        if lcrc != _masked_crc(header):
            raise IOError(f"corrupt TFRecord length crc in {origin}")
        data = f.read(length)
        (dcrc,) = struct.unpack("<I", f.read(4))
        if dcrc != _masked_crc(data):
            raise IOError(f"corrupt TFRecord data crc in {origin}")
        yield data


def read_tfrecords(path: str, compressed: bool = True):
    """Iterate serialized records from a TFRecord file (verifies CRCs)."""
    opener = gzip.open if compressed else open
    with opener(path, "rb") as f:
        yield from _iter_framed(f, path)


def read_tfrecord_dataset(spark, path: str, schema):
    """Distributed read of a TFRecord dataset back into a typed DataFrame.

    The source side of the S6 sink: ``binaryFile`` lists and loads whole
    files in parallel (TFRecord is not splittable without an index, so
    file granularity is the natural parallel unit — the same contract the
    TF data loader uses). Scale note: each task holds one whole file
    (plus its gzip expansion) in memory, so size the SINK's partitions —
    one file per partition from ``write_partitioned_tfrecords`` — to fit
    executor memory; repartition before writing if a 100 TB dataset
    would otherwise produce multi-GB files. Decode is an Arrow-batched
    ``mapInPandas`` stage
    deframes (CRC-verified), decodes each ``tf.train.Example`` with the
    hand-rolled wire codec, and coerces features onto ``schema``'s types.

    Supported field types mirror the encode map (SURVEY.md §1.2): int/
    long, float/double (float32 fidelity — that is the tf.Example
    contract, not a reader limitation), string, binary, boolean, and
    ``ArrayType`` of those for repeated features. A feature absent from
    a record surfaces as null; a MULTI-VALUED feature read into a scalar
    schema field raises (silent first-value truncation loses data).
    """
    import io
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
    )

    from ..functions.tfexample import decode_example

    names = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}

    def _scalar(v0, dt, name):
        if isinstance(dt, (LongType, IntegerType)):
            return int(v0)
        if isinstance(dt, BooleanType):
            return bool(v0)
        if isinstance(dt, (DoubleType, FloatType)):
            return float(v0)
        if isinstance(dt, StringType):
            return v0.decode("utf-8") if isinstance(v0, bytes) else str(v0)
        if isinstance(dt, BinaryType):
            return bytes(v0)
        raise TypeError(f"unsupported TFRecord read type for {name!r}: {dt}")

    def _coerce(v, dt, name):
        if v is None or len(v) == 0:
            return None
        if isinstance(dt, ArrayType):
            return [_scalar(x, dt.elementType, name) for x in v]
        if len(v) > 1:
            raise ValueError(
                f"feature {name!r} holds {len(v)} values but the schema "
                f"declares scalar {dt}; declare ArrayType to read "
                f"repeated features (refusing to truncate)"
            )
        return _scalar(v[0], dt, name)

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.tfrecord*")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if p.endswith(".gz"):
                    blob = gzip.decompress(blob)
                for rec in _iter_framed(io.BytesIO(blob), p):
                    ex = decode_example(rec)
                    for n in names:
                        cols[n].append(_coerce(ex.get(n), types[n], n))
            yield pd.DataFrame(cols, columns=names)

    return files.mapInPandas(_parse, schema=schema)


def write_partitioned_tfrecords(
    bytes_df,
    out_dir: str,
    *,
    bytes_col: str = "example",
    split_col: str | None = None,
    compress: bool = True,
) -> None:
    """Executor-parallel TFRecord write, ``Split-{name}/`` layout.

    ``bytes_df``: DataFrame with a binary column (and optionally a split
    column). Each task streams its partition's records into one open file
    handle per split it sees — O(1) executor memory per handle regardless
    of partition size, no shuffle — mirroring the reference's per-split
    TFRecord dirs (``executor.py:186-188`` [delegated]).

    Re-running into the same ``out_dir`` replaces the previous dataset:
    stale ``Split-*/`` dirs and ``part-*.tfrecord*`` files are cleared
    first (the parquet path gets this from ``mode("overwrite")``; without
    it, uuid-named part files from consecutive runs would silently
    accumulate and duplicate the dataset).
    """
    import glob
    import shutil

    if os.path.isdir(out_dir):
        for p in glob.glob(os.path.join(out_dir, "Split-*")):
            if os.path.isdir(p):
                shutil.rmtree(p)
        for p in glob.glob(os.path.join(out_dir, "part-*.tfrecord*")):
            os.remove(p)
    os.makedirs(out_dir, exist_ok=True)
    if split_col is not None:
        for r in bytes_df.select(split_col).distinct().collect():
            os.makedirs(os.path.join(out_dir, f"Split-{r[0]}"), exist_ok=True)

    suffix = ".gz" if compress else ""
    opener = gzip.open if compress else open

    def _write_partition(rows):
        fid = uuid.uuid4().hex[:12]
        handles: dict[str, object] = {}
        try:
            for row in rows:
                key = row[split_col] if split_col else ""
                f = handles.get(key)
                if f is None:
                    sub = (
                        os.path.join(out_dir, f"Split-{key}")
                        if split_col
                        else out_dir
                    )
                    os.makedirs(sub, exist_ok=True)
                    f = opener(
                        os.path.join(sub, f"part-{fid}.tfrecord{suffix}"), "wb"
                    )
                    handles[key] = f
                _write_record(f, row[bytes_col])
        finally:
            for f in handles.values():
                f.close()

    bytes_df.foreachPartition(_write_partition)
