"""WARC (ISO 28500) walker: framing strictness, gzip members, Spark stage."""

import zlib

import pytest

from tfx_addons_feast_examplegen_spark.sources.warc import (
    WarcFormatError,
    attach_warc_payloads,
    build_warc,
    build_warc_record,
    parse_warc_records,
)


def _recs(n=3):
    return [
        (
            ["response", "request", "resource"][i % 3],
            f"http://example.com/x/{i}",
            bytes((i * 7 + j) % 256 for j in range(20 + i)),
            f"0000000a-{i:04x}",
        )
        for i in range(n)
    ]


def test_roundtrip_plain():
    blob = build_warc(_recs())
    out = parse_warc_records(blob)
    assert [(r[0], r[1], r[2], r[3]) for r in out] == [
        (i, t, u, len(p)) for i, (t, u, p, _) in enumerate(_recs())
    ]
    assert all(r[5] is False for r in out)
    assert out[1][4] == sum(_recs()[1][2])


def test_roundtrip_gzip_members():
    blob = build_warc(_recs(), gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    out = parse_warc_records(blob)
    assert len(out) == 3
    assert all(r[5] is True for r in out)
    # member-per-record layout: same parse as the plain archive
    assert [r[:5] for r in out] == [
        r[:5] for r in parse_warc_records(build_warc(_recs()))
    ]


def test_bad_version_line_raises():
    blob = b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(WarcFormatError, match="version"):
        parse_warc_records(blob)


def test_content_length_overrun_raises():
    rec = build_warc_record("response", "http://e/1", b"abcdef", record_id="x")
    # inflate the declared length so the payload overruns the archive
    broken = rec.replace(b"Content-Length: 6", b"Content-Length: 60")
    with pytest.raises(WarcFormatError, match="overruns"):
        parse_warc_records(broken)


def test_missing_trailer_desyncs():
    rec = build_warc_record("response", "http://e/1", b"abcdef", record_id="x")
    # shrink the declared length: the walker lands mid-payload where the
    # CRLF CRLF trailer cannot be, and must fail rather than resync
    broken = rec.replace(b"Content-Length: 6", b"Content-Length: 2")
    with pytest.raises(WarcFormatError, match="trailer"):
        parse_warc_records(broken)


def test_missing_content_length_raises():
    blob = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n" + b"\r\n\r\n"
    )
    with pytest.raises(WarcFormatError, match="Content-Length"):
        parse_warc_records(blob)


def test_gzip_member_record_misalignment_raises():
    # one gzip member holding TWO records violates the splittable
    # member-per-record contract the fixture (and Common Crawl) promise
    raw = build_warc(_recs(2))
    comp = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    blob = comp.compress(raw) + comp.flush()
    with pytest.raises(WarcFormatError, match="members"):
        parse_warc_records(blob)


def test_truncated_gzip_member_raises():
    blob = build_warc(_recs(2), gzip_members=True)
    with pytest.raises((WarcFormatError, zlib.error)):
        parse_warc_records(blob[:-5])


def test_empty_payload_record():
    blob = build_warc([("warcinfo", "http://e/0", b"", "y")])
    out = parse_warc_records(blob)
    assert out == [(0, "warcinfo", "http://e/0", 0, 0, False)]


def test_attach_extract_spark(spark):
    from tfx_addons_feast_examplegen_spark.sources.warc import (
        extract_warc_records,
    )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    out = extract_warc_records(attach_warc_payloads(docs)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did in range(8):
        rows = sorted(by_doc[did], key=lambda r: r.rec_idx)
        assert len(rows) == did % 6 + 2
        for i, r in enumerate(rows):
            assert r.rec_idx == i
            assert r.rec_type == ["response", "request", "resource"][(did + i) % 3]
            assert r.uri == f"http://example.com/{did}/{i}"
            clen = (did * 17 + i * 31) % 120 + 16
            assert r.content_length == clen
            assert r.payload_sum == sum(
                (did + i * 7 + j * 3) % 256 for j in range(clen)
            )
            assert r.was_gzip == bool(did % 2)


def test_quarantine_policies(spark):
    import pandas as pd
    from tfx_addons_feast_examplegen_spark.sources.warc import (
        extract_warc_records,
    )

    good = build_warc(_recs(2))
    bad = b"not a warc at all"
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [good, bad]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception):
        extract_warc_records(df, on_error="error").collect()
    skipped = extract_warc_records(df, on_error="skip").collect()
    assert {r.doc_id for r in skipped} == {1} and len(skipped) == 2
    nulled = extract_warc_records(df, on_error="null").collect()
    assert sum(1 for r in nulled if r.rec_type is None) == 1
