"""WARC Python DataSource: format registration, planning, parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.sources.warc import (
    attach_warc_payloads,
    build_warc,
    extract_warc_records,
)
from tfx_addons_feast_examplegen_spark.sources.warc_datasource import (
    WarcReader,
    register_warc_source,
)


def _write_fixture_files(spark, sf_dir, tmp_path, mod=25):
    from tfx_addons_feast_examplegen_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % mod == 0
    )
    base = tmp_path / "warcs"
    base.mkdir()
    for r in attach_warc_payloads(docs).collect():
        (base / f"{r['doc_id']}.warc").write_bytes(bytes(r["payload"]))
    return docs, str(base)


def test_reader_matches_mapinpandas_path(spark, sf_dir, tmp_path):
    docs, base = _write_fixture_files(spark, sf_dir, tmp_path)
    register_warc_source(spark)
    via_ds = {
        tuple(r)
        for r in spark.read.format("warc").load(base).collect()
    }
    via_mip = {
        tuple(r)
        for r in extract_warc_records(attach_warc_payloads(docs)).collect()
    }
    assert via_ds == via_mip
    assert len(via_ds) > 0


def test_one_partition_per_file(spark, sf_dir, tmp_path):
    _, base = _write_fixture_files(spark, sf_dir, tmp_path)
    import os

    n_files = len(os.listdir(base))
    reader = WarcReader({"path": base})
    parts = reader.partitions()
    assert len(parts) == n_files
    # and the planned scan really parallelizes that way
    register_warc_source(spark)
    df = spark.read.format("warc").load(base)
    assert df.rdd.getNumPartitions() == n_files


def test_corrupt_archive_fails_loud(spark, tmp_path):
    base = tmp_path / "w"
    base.mkdir()
    good = build_warc(
        [("response", "http://e/1", b"x" * 20, "0001")], gzip_members=False
    )
    (base / "1.warc").write_bytes(good[:-2])  # truncate the trailer
    register_warc_source(spark)
    with pytest.raises(Exception, match="WarcFormatError|trailer|overruns"):
        spark.read.format("warc").load(str(base)).collect()


def test_bad_filename_and_empty_dir_rejected(tmp_path):
    base = tmp_path / "w2"
    base.mkdir()
    with pytest.raises(ValueError, match="no warc files"):
        WarcReader({"path": str(base)}).partitions()
    (base / "notanid.warc").write_bytes(b"")
    with pytest.raises(ValueError, match="doc_id"):
        WarcReader({"path": str(base)}).partitions()
    with pytest.raises(ValueError, match="path"):
        WarcReader({})
