"""Format-dispatched ingestion: parquet/JSONL/CSV round-trip identity."""

import pytest

from tfx_addons_feast_examplegen_spark.session import load_table
from tfx_addons_feast_examplegen_spark.sources.ingest import (
    FORMAT_CSV,
    FORMAT_JSONL,
    SourceFormatError,
    read_corpus,
    write_corpus,
)


def test_unknown_format_raises(spark, tmp_path):
    with pytest.raises(SourceFormatError, match="unknown source format"):
        read_corpus(spark, str(tmp_path), source_format="avro")


def test_jsonl_requires_schema(spark, tmp_path):
    with pytest.raises(SourceFormatError, match="explicit schema"):
        read_corpus(spark, str(tmp_path), source_format=FORMAT_JSONL)


def _roundtrip_rows(spark, df, path, fmt):
    write_corpus(df, path, source_format=fmt)
    back = read_corpus(spark, path, source_format=fmt, schema=df.schema)
    key = lambda r: tuple(str(x) for x in r)
    return sorted(map(tuple, df.collect()), key=key) == sorted(
        map(tuple, back.collect()), key=key
    )


def test_jsonl_roundtrip_documents_exact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    assert _roundtrip_rows(spark, docs, str(tmp_path / "jd"), FORMAT_JSONL)


def test_csv_roundtrip_survives_quotes_commas_newlines(spark, tmp_path):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(i=1, s='plain'),
            Row(i=2, s='comma, inside'),
            Row(i=3, s='quote " inside'),
            Row(i=4, s='newline\ninside'),
            Row(i=5, s=None),
        ],
        "i long, s string",
    )
    assert _roundtrip_rows(spark, df, str(tmp_path / "cd"), FORMAT_CSV)
