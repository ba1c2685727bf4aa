"""WARC (ISO 28500) record walking: the Common Crawl ingestion format.

Web-crawl corpora — the largest single input to LLM training pipelines —
arrive as WARC archives: concatenated records, each a ``WARC/1.0``
version line + CRLF header block + ``Content-Length`` payload +
``\\r\\n\\r\\n`` trailer, usually with every record compressed as its own
gzip member so readers can split archives at member boundaries without
decompressing the whole file. The reference reads only BigQuery exports
(``/root/reference/feast_component/executor.py:103-108``); this module
is the crawl-archive edge of the engine's source surface.

Scale notes: parsing runs behind Arrow-batched ``mapInPandas`` — one
Python pass per archive blob, no per-row UDF. At 100 TB the unit of
parallelism is the archive file (Common Crawl segments are ~1 GB);
Spark's binaryFile source or a doc-keyed parquet of blobs partitions by
file, and the per-record gzip members mean a future split-by-offset
reader can start mid-archive. The walker is strict: a record that
declares a wrong Content-Length desynchronizes the stream and fails
loudly rather than emitting shifted garbage.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


class WarcFormatError(ValueError):
    """Malformed WARC framing (bad version line, header, or trailer)."""


def build_warc_record(
    rec_type: str,
    uri: str,
    payload: bytes,
    *,
    record_id: str,
    date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """Serialize one WARC/1.0 record (version line, named headers,
    Content-Length payload, CRLF CRLF trailer)."""
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("ascii")
    return headers + payload + _CRLF + _CRLF


def build_warc(
    records: list[tuple[str, str, bytes, str]], *, gzip_members: bool = False
) -> bytes:
    """Concatenate ``(rec_type, uri, payload, record_id)`` records into
    a WARC archive. ``gzip_members=True`` compresses each record as its
    own gzip member (the Common Crawl layout — archives stay splittable
    at member boundaries)."""
    out = bytearray()
    for rec_type, uri, payload, record_id in records:
        raw = build_warc_record(rec_type, uri, payload, record_id=record_id)
        if gzip_members:
            comp = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            raw = comp.compress(raw) + comp.flush()
        out += raw
    return bytes(out)


def _split_gzip_members(blob: bytes) -> list[bytes]:
    """Decompress a concatenated-gzip-member stream member by member."""
    members, rest = [], blob
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise WarcFormatError("gzip member stream desynchronized")
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        members.append(d.decompress(rest))
        if not d.eof:
            raise WarcFormatError("truncated gzip member")
        rest = d.unused_data
    return members


def parse_warc_records(
    blob: bytes,
) -> list[tuple[int, str, str, int, int, bool]]:
    """Walk a WARC archive (plain or per-record-gzip) and return one
    ``(rec_idx, rec_type, uri, content_length, payload_sum, was_gzip)``
    tuple per record. ``payload_sum`` is the sum of payload byte values
    — evidence the walker consumed the actual payload bytes, not just
    the headers. Strict framing: any Content-Length mismatch or missing
    CRLF CRLF trailer raises :class:`WarcFormatError`."""
    was_gzip = blob[:2] == b"\x1f\x8b"
    if was_gzip:
        members = _split_gzip_members(blob)
        data, n_members = b"".join(members), len(members)
    else:
        data, n_members = blob, None
    records, pos, idx = [], 0, 0
    while pos < len(data):
        eol = data.find(_CRLF, pos)
        if eol < 0 or data[pos:eol] not in (b"WARC/1.0", b"WARC/1.1"):
            raise WarcFormatError(
                f"record {idx}: bad version line at offset {pos}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise WarcFormatError(f"record {idx}: unterminated headers")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise WarcFormatError(f"record {idx}: bad header {line!r}")
            headers[name.strip().decode("ascii").lower()] = (
                value.strip().decode("ascii")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError(
                f"record {idx}: missing/bad Content-Length"
            ) from exc
        if pos + clen + 4 > len(data):
            raise WarcFormatError(
                f"record {idx}: payload overruns archive "
                f"({clen} declared + 4-byte trailer, "
                f"{len(data) - pos} remaining)"
            )
        payload = data[pos : pos + clen]
        pos += clen
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise WarcFormatError(f"record {idx}: missing record trailer")
        pos += 4
        records.append(
            (
                idx,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                clen,
                sum(payload),
                was_gzip,
            )
        )
        idx += 1
    if n_members is not None and n_members != len(records):
        raise WarcFormatError(
            f"{n_members} gzip members but {len(records)} records "
            "(member boundaries must align with record boundaries)"
        )
    return records


WARC_RECORD_SCHEMA = (
    "doc_id long, rec_idx int, rec_type string, uri string, "
    "content_length bigint, payload_sum bigint, was_gzip boolean"
)

_REC_TYPES = ("response", "request", "resource")


def extract_warc_records(
    archive_df: DataFrame, *, on_error: str = "error"
) -> DataFrame:
    """Explode WARC archive blobs into one row per record (Arrow-batched
    ``mapInPandas``; same quarantine policy as the media codecs:
    ``error`` raises, ``skip`` drops the bad archive, ``null`` emits a
    single null-stats row for it)."""
    if on_error not in ("error", "null", "skip"):
        raise ValueError("on_error must be 'error', 'null' or 'skip'")

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for did, blob in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    recs = parse_warc_records(bytes(blob))
                except (WarcFormatError, zlib.error):
                    if on_error == "error":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((did, None, None, None, None, None, None))
                    continue
                rows.extend((did, *r) for r in recs)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "rec_idx",
                    "rec_type",
                    "uri",
                    "content_length",
                    "payload_sum",
                    "was_gzip",
                ],
            )

    return archive_df.mapInPandas(_walk, schema=WARC_RECORD_SCHEMA)


def attach_warc_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: one deterministic WARC archive per row — plain
    concatenation for even doc_ids, per-record gzip members (the Common
    Crawl layout) for odd, so both walks are on the checked path.
    Closed form the oracle replays: doc_id % 6 + 2 records; record i
    has type ``['response','request','resource'][(doc_id+i) % 3]``,
    URI ``http://example.com/{doc_id}/{i}``, payload length
    ``(doc_id*17 + i*31) % 120 + 16`` with byte j =
    ``(doc_id + i*7 + j*3) % 256``."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                recs = []
                for i in range(did % 6 + 2):
                    clen = (did * 17 + i * 31) % 120 + 16
                    body = bytes((did + i * 7 + j * 3) % 256 for j in range(clen))
                    recs.append(
                        (
                            _REC_TYPES[(did + i) % 3],
                            f"http://example.com/{did}/{i}",
                            body,
                            f"{did:08x}-{i:04x}",
                        )
                    )
                payloads.append(build_warc(recs, gzip_members=bool(did % 2)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "format": "application/warc",
                }
            )

    return df.select(F.col(id_col)).mapInPandas(
        _gen, schema="doc_id long, payload binary, format string"
    )
