"""Dataset statistics and schema artifacts (SURVEY.md A3/A4).

The reference's usage sketch declares (commented-out) ``statistics`` and
``schema`` outputs (``usage_prototype.py:60-61``) — TFDV-style per-feature
statistics and a schema artifact. Rebuilt natively:

- :func:`column_stats` — one row per column: count / nulls / distinct /
  min / max / mean / stddev. Computed in a SINGLE aggregation pass over
  the table (one job, map-side partials — the 100 TB-safe shape), then
  unpivoted to rows driver-side (a constant-size result).
- :func:`schema_artifact` — the DataFrame schema as JSON (the analog of
  the schema output; Catalyst gives it without any probe query, unlike
  the reference's ``LIMIT 0`` round-trip at ``converters.py:43-48``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column statistics as rows: (column, count, n_null, n_distinct,
    min_val, max_val, mean_val, stddev_val) — numeric-only fields NULL for
    non-numeric columns; min/max reported as strings for portability.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        is_num = dtypes[c].split("(")[0] in _NUMERIC
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.col(c)), 4)
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"__mean_{c}"),
            (
                F.round(F.stddev_samp(F.col(c)), 4)
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"__std_{c}"),
        ]
    wide = df.agg(*aggs)  # single pass

    spark = df.sparkSession
    row = wide.collect()[0]
    out = [
        (
            c,
            row[f"__cnt_{c}"],
            row[f"__null_{c}"],
            row[f"__nd_{c}"],
            row[f"__min_{c}"],
            row[f"__max_{c}"],
            row[f"__mean_{c}"],
            row[f"__std_{c}"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, count bigint, n_null bigint, n_distinct bigint, "
        "min_val string, max_val string, mean_val double, stddev_val double",
    )


def schema_artifact(df: DataFrame) -> str:
    """Schema as a stable JSON artifact (name/type/nullable per field)."""
    fields = [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]
    return json.dumps({"fields": fields}, indent=2, sort_keys=True)
