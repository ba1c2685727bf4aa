"""Versioned parquet tables: snapshot isolation, time travel, compaction.

A minimal lakehouse-style table layout over plain parquet — the
mechanism Delta/Iceberg provide, reduced to the invariants the engine's
operators need (snapshot reads for :func:`..operators.snapshot.snapshot_diff`,
reproducible training runs pinned to a table version, small-file
compaction without changing visible rows):

    root/
      v0/ part-*.parquet        immutable data directories
      v1/ ...
      _commits/0.json           one manifest per committed version
      _commits/1.json

A version is VISIBLE iff its manifest exists; manifests are written
AFTER the data directory completes and created atomically via
os.rename, so a crashed writer leaves only an invisible orphan data
dir, never a torn table (readers list _commits/, not data dirs). Each
manifest records row count and schema JSON for audit; ``compact``
rewrites the latest version's rows into fewer files as a NEW version —
time travel to the pre-compaction version still sees the old layout.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _commits_dir(root: str) -> str:
    return os.path.join(root, "_commits")


def list_versions(root: str) -> list[int]:
    d = _commits_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
    )


def write_version(
    df: DataFrame,
    root: str,
    *,
    target_files: int | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as the next version; returns the version number.

    ``stats_cols`` records per-FILE min/max for those columns in the
    manifest (one distributed aggregate over the committed files, paid
    once at commit time) — the Iceberg-style skipping index
    :func:`read_version_pruned` uses to open only overlapping files.
    """
    from pyspark.sql import functions as F

    versions = list_versions(root)
    v = (versions[-1] + 1) if versions else 0
    data_dir = os.path.join(root, f"v{v}")
    out = df if target_files is None else df.coalesce(target_files)
    out.write.mode("overwrite").parquet(data_dir)
    back = df.sparkSession.read.parquet(data_dir)
    file_stats = {}
    if stats_cols:
        aggs = []
        for c in stats_cols:
            aggs += [
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            ]
        rows = (
            back.withColumn("__file", F.input_file_name())
            .groupBy("__file")
            .agg(*aggs)
            .collect()  # one row per committed file — driver-small
        )
        file_stats = {
            os.path.basename(r["__file"]): {
                c: [r[f"min_{c}"], r[f"max_{c}"]] for c in stats_cols
            }
            for r in rows
        }
    manifest = {
        "version": v,
        "row_count": back.count(),
        "schema": back.schema.jsonValue(),
        "n_files": sum(
            1 for f in os.listdir(data_dir) if f.endswith(".parquet")
        ),
        "file_stats": file_stats,
    }
    os.makedirs(_commits_dir(root), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_commits_dir(root), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(_commits_dir(root), f"{v}.json"))
    return v


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read; ``version=None`` reads the latest committed one."""
    versions = list_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not committed (have {versions})")
    return spark.read.parquet(os.path.join(root, f"v{v}"))


def read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_commits_dir(root), f"{version}.json")) as f:
        return json.load(f)


def compact(spark: SparkSession, root: str, *, target_files: int = 1) -> int:
    """Rewrite the latest version's rows into ``target_files`` files as a
    NEW version (visible rows unchanged — layout only). Time travel to
    the pre-compaction version still sees the original files."""
    latest = read_version(spark, root)
    return write_version(latest, root, target_files=target_files)


def read_version_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo: str,
    hi: str,
    *,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Manifest-driven data skipping: open only the files whose recorded
    [min, max] range for ``col`` overlaps [lo, hi] (string-compared —
    commit casts stats to string, so use ISO dates / zero-padded keys
    for range columns). Returns (df, files_opened, files_total); the
    caller still applies the exact predicate — skipping is a superset
    guarantee, pruning is never allowed to change the answer.

    This is the table-format half of partition pruning: the query never
    lists or opens non-overlapping files, which at 100 TB is the
    difference between touching 3 files and 3,000.
    """
    versions = list_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    v = versions[-1] if version is None else version
    m = read_manifest(root, v)
    stats = m.get("file_stats") or {}
    if not stats or col not in next(iter(stats.values()), {}):
        raise ValueError(
            f"version {v} has no file stats for column {col!r}; "
            "commit with stats_cols to enable skipping"
        )
    data_dir = os.path.join(root, f"v{v}")
    # Null min/max (all-null or empty file) means "no information" —
    # skipping must stay a superset guarantee, so such a file is always
    # opened rather than compared (None < str would raise).
    keep = [
        os.path.join(data_dir, fname)
        for fname, s in stats.items()
        if s[col][0] is None
        or s[col][1] is None
        or not (s[col][1] < lo or s[col][0] > hi)
    ]
    total = len(stats)
    if not keep:
        df = spark.read.parquet(data_dir).limit(0)
        return df, 0, total
    return spark.read.parquet(*keep), len(keep), total
