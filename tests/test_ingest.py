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


def test_versioned_table_time_travel_and_compaction(spark, sf_dir, tmp_path):
    from tfx_addons_feast_examplegen_spark.sources.versioned import (
        compact,
        list_versions,
        read_manifest,
        read_version,
        write_version,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    root = str(tmp_path / "orders_tbl")
    v0 = write_version(orders.filter("o_orderdate < DATE'1995-01-01'"), root)
    v1 = write_version(orders, root)
    assert (v0, v1) == (0, 1) and list_versions(root) == [0, 1]

    n_old = orders.filter("o_orderdate < DATE'1995-01-01'").count()
    assert read_version(spark, root, 0).count() == n_old
    assert read_version(spark, root).count() == orders.count()
    assert read_manifest(root, 0)["row_count"] == n_old

    # compaction: new version, same rows, fewer files
    v2 = compact(spark, root, target_files=1)
    assert v2 == 2
    assert read_manifest(root, 2)["n_files"] == 1
    a = {tuple(r) for r in read_version(spark, root, 1).collect()}
    b = {tuple(r) for r in read_version(spark, root, 2).collect()}
    assert a == b
    # time travel below the compaction still sees the old layout
    assert read_manifest(root, 1)["n_files"] >= 1


def test_versioned_table_missing_version_raises(spark, tmp_path):
    import pytest

    from tfx_addons_feast_examplegen_spark.sources.versioned import (
        read_version,
    )

    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))


def test_versioned_read_pruned_skips_files(spark, sf_dir, tmp_path):
    from tfx_addons_feast_examplegen_spark.session import load_table
    from tfx_addons_feast_examplegen_spark.sources.versioned import (
        read_version_pruned,
        write_version,
    )

    orders = load_table(spark, sf_dir, "orders")
    root = str(tmp_path / "orders_stats")
    # range-partition on the date so per-file min/max ranges are tight
    write_version(
        orders.repartitionByRange(8, "o_orderdate"),
        root,
        stats_cols=["o_orderdate"],
    )
    lo, hi = "1996-01-01", "1996-12-31"
    df, opened, total = read_version_pruned(
        spark, root, "o_orderdate", lo, hi
    )
    assert total == 8 and 0 < opened < total  # skipping actually happened
    got = df.filter(
        (df.o_orderdate >= lo) & (df.o_orderdate <= hi + " 23:59:59")
    ).count()
    want = orders.filter(
        (orders.o_orderdate >= lo) & (orders.o_orderdate <= hi + " 23:59:59")
    ).count()
    assert got == want  # pruning never changes the answer


def test_versioned_pruning_keeps_null_stats_files(spark, tmp_path):
    # ADVICE r5: a file whose stats column is all-null records null
    # min/max; pruning must conservatively OPEN it (superset guarantee)
    # rather than raise comparing None to a string.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.sources.versioned import (
        read_version_pruned,
        write_version,
    )

    df = spark.createDataFrame(
        [
            Row(pk=1, d="2024-01-05"),
            Row(pk=2, d="2024-06-05"),
            Row(pk=3, d=None),  # all-null stats in its own file
        ],
        "pk long, d string",
    )
    root = str(tmp_path / "nullstats")
    write_version(df.repartition(3, "pk"), root, stats_cols=["d"])
    got, opened, total = read_version_pruned(
        spark, root, "d", "2024-01-01", "2024-01-31"
    )
    # the null-stats file is kept; the exact predicate still applies
    assert opened >= 1
    rows = got.filter(
        (got.d >= "2024-01-01") & (got.d <= "2024-01-31")
    ).collect()
    assert [r.pk for r in rows] == [1]


def test_pruned_scan_contract_catches_corrupt_manifest(spark, tmp_path):
    # Mutation hardening (same doctrine as the simhash/ANN contract
    # mutation tests): if manifest stats lie — a file's recorded max is
    # below its true values — pruning silently drops rows, and the
    # "answer unchanged" half of the table_pruned_scan contract must be
    # able to see that. Tamper one file's stats and assert the pruned
    # read really loses rows vs the full read.
    import glob
    import json
    import os

    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.sources.versioned import (
        read_version,
        read_version_pruned,
        write_version,
    )

    df = spark.createDataFrame(
        [Row(pk=i, d=f"2024-{(i % 12) + 1:02d}-15") for i in range(60)],
        "pk long, d string",
    )
    root = str(tmp_path / "tamper")
    write_version(df.repartitionByRange(4, "d"), root, stats_cols=["d"])
    manifests = glob.glob(os.path.join(root, "_commits", "*.json"))
    assert manifests
    m = json.load(open(manifests[0]))
    stats = m["file_stats"]
    # pick the file that actually covers June and shrink its range away
    victim = next(
        f for f, s in stats.items()
        if s["d"][0] <= "2024-06-15" <= s["d"][1]
    )
    stats[victim]["d"] = ["2024-01-01", "2024-01-02"]
    json.dump(m, open(manifests[0], "w"))
    full = (
        read_version(spark, root)
        .filter("d >= '2024-06-01' and d <= '2024-06-30'")
        .count()
    )
    pruned_df, opened, total = read_version_pruned(
        spark, root, "d", "2024-06-01", "2024-06-30"
    )
    pruned = pruned_df.filter(
        "d >= '2024-06-01' and d <= '2024-06-30'"
    ).count()
    assert full > 0
    assert pruned < full  # corrupt stats DO lose rows -> contract can fail
