"""Format-dispatched corpus ingestion: parquet, JSONL, CSV.

The reference reads exactly one physical format (a BigQuery Avro export,
``executor.py:103-108``); real training-data corpora arrive as parquet,
JSONL (one JSON document per line — the lingua franca of LLM datasets),
or CSV. This module is the engine's source plug-point for those formats:
one dispatch table, explicit schemas (schema inference is a full extra
pass over the data at 100 TB — never rely on it in production paths),
and symmetric writers so round-trip identity is testable.

Scale notes: all three readers are Spark's native vectorized sources —
they split by file/block, push projections down (parquet prunes columns;
JSON/CSV parse only requested fields with a schema), and parallelize by
``spark.sql.files.maxPartitionBytes``. JSONL/CSV cannot push predicates
into the decoder the way parquet does, so prefer parquet for hot tables
and treat JSONL/CSV as ingest formats to be normalized once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMAT_PARQUET = "parquet"
FORMAT_JSONL = "jsonl"
FORMAT_CSV = "csv"
FORMAT_ORC = "orc"

_READ_FORMATS = {
    FORMAT_PARQUET: "parquet",
    FORMAT_JSONL: "json",
    FORMAT_CSV: "csv",
    FORMAT_ORC: "orc",
}

# CSV needs explicit quoting/escape symmetry so text containing commas,
# quotes, or newlines survives the round trip.
_CSV_OPTIONS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
}


class SourceFormatError(ValueError):
    """Unknown ingestion format (mirrors the sink-side format dispatch)."""


def read_corpus(
    spark: SparkSession,
    path: str,
    *,
    source_format: str = FORMAT_PARQUET,
    schema: StructType | str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a corpus table in the given format with an explicit schema.

    ``schema`` is required for JSONL/CSV (inference costs a full extra
    pass and can drift between runs — a silent schema change at 100 TB is
    an outage, not a convenience).
    """
    if source_format not in _READ_FORMATS:
        raise SourceFormatError(
            f"unknown source format {source_format!r}; "
            f"expected one of {sorted(_READ_FORMATS)}"
        )
    if source_format not in (FORMAT_PARQUET, FORMAT_ORC) and schema is None:
        raise SourceFormatError(
            f"{source_format!r} requires an explicit schema "
            "(inference is a full extra pass over the data; "
            "parquet/ORC carry their own)"
        )
    reader = spark.read.format(_READ_FORMATS[source_format])
    if schema is not None:
        reader = reader.schema(schema)
    opts = dict(_CSV_OPTIONS) if source_format == FORMAT_CSV else {}
    opts.update(options or {})
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    source_format: str = FORMAT_PARQUET,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` in the given format (symmetric with read_corpus)."""
    if source_format not in _READ_FORMATS:
        raise SourceFormatError(
            f"unknown source format {source_format!r}; "
            f"expected one of {sorted(_READ_FORMATS)}"
        )
    writer = df.write.format(_READ_FORMATS[source_format]).mode(mode)
    opts = dict(_CSV_OPTIONS) if source_format == FORMAT_CSV else {}
    opts.update(options or {})
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save(path)
