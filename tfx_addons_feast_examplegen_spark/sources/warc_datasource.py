"""WARC as a first-class Spark data source (Python DataSource API).

Spark 4's ``pyspark.sql.datasource`` lets a pure-Python format plug
into the regular reader surface — ``spark.read.format("warc")
.load(dir)`` — with planned partitions, instead of the
binaryFile-scan + mapInPandas pipeline :mod:`.warc` uses. Both paths
share ONE parser (:func:`..sources.warc.parse_warc_records`), so the
framing rules (strict Content-Length, CRLF trailers, per-record gzip
member alignment, ISO 28500) cannot drift between them; the registry
entry proves row-identity against the closed-form oracle the
mapInPandas path is checked by.

Partitioning: one :class:`~pyspark.sql.datasource.InputPartition` per
archive FILE — the WARC-native parallel unit (Common Crawl ships
~1 GB per-record-gzip archives; member-range sub-splits are the next
rung and slot into ``partitions()`` without touching ``read()``).
Each worker opens only its own file: no driver-side byte movement, no
whole-directory materialization.

Reference: BACtaki/tfx-addons-feast-examplegen delegates ingestion to
BigQuery export files (executor.py:128-163); a pluggable source format
is the Spark-native generalization of that seam.
"""

from __future__ import annotations

import os
import random
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# doc_id parsed from the file name (``<doc_id>.warc[.gz]``), then the
# record tuple the shared parser emits
WARC_DS_SCHEMA = (
    "doc_id long, rec_idx int, rec_type string, uri string, "
    "content_length bigint, payload_sum bigint, was_gzip boolean"
)


class _WarcFile(InputPartition):
    def __init__(self, path: str, doc_id: int):
        self.path = path
        self.doc_id = doc_id


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc datasource requires a path")
        self._dir = path

    def partitions(self) -> Sequence[InputPartition]:
        parts = []
        for fname in sorted(os.listdir(self._dir)):
            # only committed archives participate; a failed/aborted write
            # attempt leaves at most a ``*.warc.tmp`` file (see
            # WarcWriter.write's temp-then-rename protocol), which must
            # never be parsed as data
            if not fname.endswith((".warc", ".warc.gz")):
                continue
            stem = fname.split(".")[0]
            if not stem.lstrip("-").isdigit():
                raise ValueError(
                    f"warc file name must be <doc_id>.warc[.gz]: {fname!r}"
                )
            parts.append(
                _WarcFile(os.path.join(self._dir, fname), int(stem))
            )
        if not parts:
            raise ValueError(f"no warc files under {self._dir!r}")
        return parts

    def read(self, partition: _WarcFile) -> Iterator[tuple]:
        # runs on the executor: one file, the SHARED strict parser
        from tfx_addons_feast_examplegen_spark.sources.warc import (
            parse_warc_records,
        )

        with open(partition.path, "rb") as f:
            blob = f.read()
        for rec in parse_warc_records(blob):
            yield (partition.doc_id, *rec)


# write-side input contract: one row per record to archive
WARC_WRITE_COLUMNS = ("uri", "rec_type", "payload", "rec_id")


class _WarcCommit(WriterCommitMessage):
    def __init__(self, path: str | None, n_records: int):
        self.path = path
        self.n_records = n_records


class WarcWriter(DataSourceWriter):
    """One WARC archive per write TASK — the Common Crawl layout (many
    records per ~fixed-size archive), built by the same
    :func:`..sources.warc.build_warc` framer the tests and fixture
    generator use. Empty partitions write no file.

    Modes: ``overwrite`` clears every existing ``*.warc[.gz]`` — plus
    any ``*.warc.*.tmp`` litter dead attempts of prior runs left —
    under the target (driver-side, at write planning) and names files
    by partition id — a fresh deterministic layout; ``append`` composes
    the stem as ``(salt << 22) | partitionId`` where ``salt`` is a
    per-write token (planning-time epoch micros XOR driver pid XOR 21
    fresh random bits, folded into 41 bits, captured DRIVER-side when
    the writer is constructed and shipped to tasks via writer
    pickling). The result is a positive integer below
    2**63, so the reader's ``<doc_id>.warc`` digits-parse-to-long
    contract holds, and it is unique ACROSS application runs, not
    just within one SparkContext: a bare task-attempt-id stem (the
    previous scheme) restarts near 0 in a new application and would
    silently ``open(path, 'wb')`` over the prior run's archives.
    Two appends to the same directory collide only if their planning
    micros agree under the 41-bit fold AND the driver pids and random
    draws cancel — practically impossible rather than time-dependent
    (the pure-timestamp salt wrapped every ~25 days). Partition ids
    must fit 22 bits
    (4.19M tasks per write — far above Spark's practical partition
    counts); the writer raises past that rather than wrapping.

    Durability protocol: every task attempt writes to its OWN
    ``<stem>.warc.<taskAttemptId>.tmp`` and ``os.replace``s to the
    final name only after the full archive body is on disk. The temp
    name is attempt-unique, so a speculative twin or a zombie attempt
    racing its retry never shares a file handle with another attempt —
    each builds its complete archive privately and the last finished
    rename wins with COMPLETE content (interleaved writes through one
    shared temp path were the failure mode this closes). A task
    attempt that dies mid-write never leaves a readable ``.warc``
    beside the committed ones (the reader skips non-``*.warc[.gz]``
    names), so a failed attempt that abort() cannot see — it returned
    no commit message — is inert. Because the stem depends on the
    PARTITION (not the attempt), concurrent attempts rename identical
    content onto the same final path: no duplicate archive, no
    truncated archive, no double-counted records on subsequent reads."""

    _PID_BITS = 22

    def __init__(self, options: dict, *, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("warc datasource requires a path")
        self._dir = path
        self._overwrite = overwrite
        # per-write salt, generated once on the DRIVER at planning time
        # and shipped to every task via writer pickling; 41 bits keeps
        # (salt << 22 | pid) inside the reader's signed-long doc_id.
        # Epoch micros alone wrap mod 2**41 every ~25 days; XOR-ing in
        # the driver pid and fresh random bits (each < 2**41, so the
        # fold stays in range) makes a cross-run stem collision require
        # three independent coincidences at once.
        salt = (time.time_ns() // 1000) % (1 << 41)
        salt ^= (os.getpid() & 0xFFFFF) << 21
        salt ^= random.getrandbits(21)
        self._write_salt = salt
        if overwrite and os.path.isdir(path):
            for fname in os.listdir(path):
                # also sweep `<stem>.warc.<attemptId>.tmp` litter from
                # failed/zombie attempts of ANY prior run (ADVICE r14:
                # attempt-unique temp names no longer self-overwrite,
                # so dead attempts accumulate unboundedly otherwise)
                if fname.endswith((".warc", ".warc.gz")) or (
                    ".warc." in fname and fname.endswith(".tmp")
                ):
                    os.remove(os.path.join(path, fname))

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        from tfx_addons_feast_examplegen_spark.sources.warc import build_warc

        recs = [
            (row.rec_type, row.uri, bytes(row.payload), row.rec_id)
            for row in iterator
        ]
        if not recs:
            return _WarcCommit(None, 0)
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        if self._overwrite:
            stem = str(pid)
        else:
            if pid >= (1 << self._PID_BITS):
                raise ValueError(
                    f"warc append supports < 2**{self._PID_BITS} "
                    f"partitions per write; got partition {pid}"
                )
            stem = str((self._write_salt << self._PID_BITS) | pid)
        os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f"{stem}.warc")
        # attempt-unique temp: a speculative twin / zombie retry must
        # never interleave writes through a shared handle on one path
        tmp = f"{path}.{ctx.taskAttemptId()}.tmp"
        with open(tmp, "wb") as f:
            f.write(build_warc(recs, gzip_members=False))
        os.replace(tmp, path)
        return _WarcCommit(path, len(recs))

    def commit(self, messages) -> None:
        pass  # files are final on write; nothing to move

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and getattr(m, "path", None):
                try:
                    os.remove(m.path)
                except OSError:
                    pass
        # sweep THIS write's orphaned attempt temps (attempts that died
        # mid-write returned no commit message, so the loop above never
        # sees them). Scoped to this write's own stems — overwrite mode
        # owns the directory outright; append stems embed our salt in
        # the bits above _PID_BITS — so a concurrent append's live
        # temps are never touched.
        try:
            fnames = os.listdir(self._dir)
        except OSError:
            return
        for fname in fnames:
            if ".warc." not in fname or not fname.endswith(".tmp"):
                continue
            stem = fname.split(".warc.", 1)[0]
            if not stem.isdigit():
                continue
            ours = (
                True
                if self._overwrite
                else (int(stem) >> self._PID_BITS) == self._write_salt
            )
            if ours:
                try:
                    os.remove(os.path.join(self._dir, fname))
                except OSError:
                    pass


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(dir)`` over ``<doc_id>.warc``
    files, and ``df.write.format("warc").save(dir)`` producing one
    archive per task. Register once per session via
    :func:`register_warc_source`.
    """

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_DS_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def writer(self, schema, overwrite: bool) -> WarcWriter:
        missing = [c for c in WARC_WRITE_COLUMNS if c not in schema.names]
        if missing:
            raise ValueError(
                f"warc writer input must carry {WARC_WRITE_COLUMNS}; "
                f"missing {missing}"
            )
        return WarcWriter(self.options, overwrite=overwrite)


def register_warc_source(spark) -> None:
    """Idempotently register the ``warc`` format on this session."""
    spark.dataSource.register(WarcDataSource)
