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


def test_writer_roundtrip_and_layout(spark, sf_dir, tmp_path):
    from tfx_addons_feast_examplegen_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )
    rows = docs.select(
        F.concat(F.lit("http://e/"), F.col("doc_id")).alias("uri"),
        F.lit("resource").alias("rec_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("rec_id"),
    )
    base = str(tmp_path / "out")
    register_warc_source(spark)
    rows.repartition(4).write.format("warc").mode("append").save(base)
    import os

    # one archive per non-empty task
    assert 1 <= len(os.listdir(base)) <= 4
    back = spark.read.format("warc").load(base)
    agg = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("content_length").alias("cl"),
    ).collect()[0]
    want = docs.agg(
        F.count(F.lit(1)), F.sum(F.length("text"))
    ).collect()[0]
    assert (agg.n, agg.cl) == (want[0], want[1])
    # URIs survive exactly
    assert {r.uri for r in back.collect()} == {
        f"http://e/{r.doc_id}" for r in docs.collect()
    }


def test_writer_rejects_wrong_schema(spark, tmp_path):
    register_warc_source(spark)
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    with pytest.raises(Exception, match="must carry|missing"):
        df.write.format("warc").mode("append").save(str(tmp_path / "w3"))


def test_writer_empty_partitions_write_no_file(spark, tmp_path):
    register_warc_source(spark)
    df = spark.createDataFrame(
        [("http://e/1", "resource", b"abc", "r1")],
        ["uri", "rec_type", "payload", "rec_id"],
    ).repartition(8)
    base = str(tmp_path / "w4")
    df.write.format("warc").mode("append").save(base)
    import os

    assert len(os.listdir(base)) == 1  # 7 empty tasks wrote nothing


def _rows(spark, ids):
    return spark.createDataFrame(
        [(f"http://e/{i}", "resource", f"body-{i}".encode(), f"r{i}")
         for i in ids],
        ["uri", "rec_type", "payload", "rec_id"],
    )


def test_overwrite_clears_stale_archives(spark, tmp_path):
    # A previous write with MORE partitions must not leak stale
    # archives into an overwrite: 8 tasks then overwrite with 1 — the
    # reader must see only the second write's records.
    register_warc_source(spark)
    base = str(tmp_path / "ow")
    _rows(spark, range(8)).repartition(8).write.format("warc").mode(
        "append"
    ).save(base)
    _rows(spark, [99]).coalesce(1).write.format("warc").mode(
        "overwrite"
    ).save(base)
    back = spark.read.format("warc").load(base).collect()
    assert {r.uri for r in back} == {"http://e/99"}
    import os

    assert os.listdir(base) == ["0.warc"]  # partition-id layout


class _FakeTaskCtx:
    def __init__(self, pid, attempt):
        self._pid, self._attempt = pid, attempt

    def partitionId(self):
        return self._pid

    def taskAttemptId(self):
        return self._attempt


def test_append_survives_attempt_id_restart(monkeypatch, tmp_path):
    # The ADVICE scenario: task attempt ids are unique only within one
    # SparkContext — a LATER APPLICATION RUN restarts them near 0, so a
    # bare attempt-id stem would open(path, 'wb') over the previous
    # run's archive. The per-write driver salt must keep the stems
    # distinct even when both runs present the identical attempt id.
    import time as _time

    import pyspark

    from tfx_addons_feast_examplegen_spark.sources.warc_datasource import (
        WarcWriter,
    )

    base = str(tmp_path / "xapp")
    monkeypatch.setattr(
        pyspark.TaskContext, "get", staticmethod(lambda: _FakeTaskCtx(0, 0))
    )
    w1 = WarcWriter({"path": base}, overwrite=False)
    while True:  # two writers = two "applications"; force distinct salts
        w2 = WarcWriter({"path": base}, overwrite=False)
        if w2._write_salt != w1._write_salt:
            break
        _time.sleep(0.001)
    row1 = type("R", (), {"uri": "http://e/1", "rec_type": "resource",
                          "payload": b"one", "rec_id": "r1"})()
    row2 = type("R", (), {"uri": "http://e/2", "rec_type": "resource",
                          "payload": b"two", "rec_id": "r2"})()
    m1 = w1.write(iter([row1]))
    m2 = w2.write(iter([row2]))
    assert m1.path != m2.path
    import os

    files = sorted(os.listdir(base))
    assert len(files) == 2 and all(f.endswith(".warc") for f in files)
    stems = [f.split(".")[0] for f in files]
    assert all(s.isdigit() for s in stems)  # reader contract holds
    assert all(int(s) < 2**63 for s in stems)  # doc_id long parse
    # a RETRY of the same task (same writer, same partition) is
    # idempotent: identical content renamed onto the same final path
    m1b = w1.write(iter([row1]))
    assert m1b.path == m1.path
    assert sorted(os.listdir(base)) == files


def test_reader_ignores_leftover_tmp_files(spark, tmp_path):
    # A task attempt that dies mid-write leaves only <stem>.warc.tmp
    # (temp-then-rename); abort gets no commit message for it, so the
    # reader — not abort — is what keeps it from corrupting reads.
    base = tmp_path / "tmpleft"
    base.mkdir()
    good = build_warc(
        [("response", "http://e/1", b"x" * 20, "0001")], gzip_members=False
    )
    (base / "7.warc").write_bytes(good)
    (base / "123456789000000000001.warc.tmp").write_bytes(good[:10])
    register_warc_source(spark)
    rows = spark.read.format("warc").load(str(base)).collect()
    assert {r.uri for r in rows} == {"http://e/1"}
    assert len({r.doc_id for r in rows}) == 1


def test_append_never_clobbers_prior_write(spark, tmp_path):
    # Two successive appends with the same partitioning: salted
    # (salt<<22 | pid) naming keeps both writes' archives (bare
    # partition-id naming silently clobbered the first write's files).
    register_warc_source(spark)
    base = str(tmp_path / "ap")
    _rows(spark, [1]).coalesce(1).write.format("warc").mode("append").save(base)
    _rows(spark, [2]).coalesce(1).write.format("warc").mode("append").save(base)
    back = spark.read.format("warc").load(base).collect()
    assert {r.uri for r in back} == {"http://e/1", "http://e/2"}
    import os

    stems = [f.split(".")[0] for f in os.listdir(base)]
    assert len(stems) == 2 and all(s.isdigit() for s in stems)


def test_tmp_litter_swept_on_overwrite_and_abort(monkeypatch, tmp_path):
    # ADVICE r14: attempt-unique temp names no longer self-overwrite,
    # so dead attempts would accumulate *.tmp litter unboundedly.
    # Overwrite sweeps ALL prior litter; abort sweeps THIS write's own
    # orphaned temps while leaving a concurrent append's temps alone.
    import os

    import pyspark

    from tfx_addons_feast_examplegen_spark.sources.warc_datasource import (
        WarcWriter,
    )

    base = tmp_path / "litter"
    base.mkdir()
    (base / "7.warc.123.tmp").write_bytes(b"dead attempt")
    (base / "900000000.warc.55.tmp").write_bytes(b"older dead attempt")
    (base / "3.warc").write_bytes(b"stale archive")
    WarcWriter({"path": str(base)}, overwrite=True)
    assert os.listdir(str(base)) == []  # archives AND litter gone

    # abort(): only this write's salted temps are removed
    monkeypatch.setattr(
        pyspark.TaskContext, "get", staticmethod(lambda: _FakeTaskCtx(0, 9))
    )
    w = WarcWriter({"path": str(base)}, overwrite=False)
    own_stem = str(w._write_salt << w._PID_BITS)
    (base / f"{own_stem}.warc.9.tmp").write_bytes(b"our zombie")
    other_stem = str(((w._write_salt ^ 1) << w._PID_BITS) | 1)
    (base / f"{other_stem}.warc.4.tmp").write_bytes(b"concurrent write")
    row = type("R", (), {"uri": "http://e/1", "rec_type": "resource",
                         "payload": b"one", "rec_id": "r1"})()
    m = w.write(iter([row]))
    w.abort([m])
    left = sorted(os.listdir(str(base)))
    assert left == [f"{other_stem}.warc.4.tmp"]  # ours + committed gone
