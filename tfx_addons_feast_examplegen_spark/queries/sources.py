"""Source/sink round-trips, versioned tables, MERGE/CDC, layout.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import register_tables




def _q_split_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.examplegen import route_split_patterns

    register_tables(spark, sf_dir)
    out = route_split_patterns(
        spark,
        {
            "train": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
            "eval": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",
        },
    )
    return out


_SPLIT_ROUTING_ORACLE = """
SELECT o_orderkey, o_totalprice, 'train' AS split FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_totalprice, 'eval' AS split FROM orders WHERE o_orderstatus = 'O'
"""


def _q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z-order (Morton) clustering key, oracle-checked: the bit-interleave
    # is pure shift/mask integer arithmetic, so DuckDB replays it exactly.
    # Rows are bucketed by the key's high bits (the file-boundary analog)
    # and each bucket reports its min-max footprint in BOTH dimensions —
    # the stats a parquet footer would carry and the reader would prune
    # on. compact hypercube buckets instead of one-dimensional stripes.
    from ..operators.layout import zorder_key

    t = register_tables(spark, sf_dir)
    dims = t["orders"].select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("cx"),
        F.expr("unix_timestamp(o_orderdate) div 86400 % 65536").alias("cy"),
    )
    keyed = dims.withColumn("zkey", zorder_key(["cx", "cy"], bits=16))
    return (
        keyed.groupBy(F.shiftrightunsigned("zkey", 16).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cx").alias("min_cx"),
            F.max("cx").alias("max_cx"),
            F.min("cy").alias("min_cy"),
            F.max("cy").alias("max_cy"),
        )
    )


def _zorder_oracle() -> str:
    terms = []
    for j in range(16):
        for i, c in enumerate(("cx", "cy")):
            out_pos = j * 2 + (1 - i)
            terms.append(f"(((CAST({c} AS BIGINT) >> {j}) & 1) << {out_pos})")
    interleave = " + ".join(terms)
    return f"""
WITH dims AS (
  SELECT o_orderkey,
         o_custkey % 65536 AS cx,
         (CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 65536 AS cy
  FROM orders
),
keyed AS (
  SELECT o_orderkey, cx, cy, {interleave} AS zkey FROM dims
)
SELECT zkey >> 16 AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(cx) AS min_cx, MAX(cx) AS max_cx,
       MIN(cy) AS min_cy, MAX(cy) AS max_cy
FROM keyed GROUP BY zkey >> 16
"""


def _q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Source-format dispatch proven by round-trip identity: documents ->
    # JSONL on disk -> schema'd JSON reader -> aggregate. The oracle runs
    # the same aggregate on the original parquet, so any loss in the
    # JSONL writer/reader (escaping, nulls, unicode) breaks the hash.
    import tempfile as _tempfile

    from ..sources.ingest import FORMAT_JSONL, read_corpus, write_corpus

    t = register_tables(spark, sf_dir)
    path = _tempfile.mkdtemp(prefix="ingest_jsonl_") + "/documents"
    write_corpus(t["documents"], path, source_format=FORMAT_JSONL)
    back = read_corpus(
        spark, path, source_format=FORMAT_JSONL,
        schema=t["documents"].schema,
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.count_distinct("doc_id").alias("n_ids"),
    )


_JSONL_ROUNDTRIP_ORACLE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
FROM documents GROUP BY source
"""


def _q_federated_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mixed-format federation: one logical corpus spread across parquet,
    # JSONL, and CSV partitions (a real ingest estate), unioned into a
    # single declarative plan — format dispatch happens per leaf scan,
    # the aggregate is format-agnostic. Oracle: 3 x the per-source
    # aggregate over the original table (each shard holds one third).
    import tempfile as _tempfile

    from ..sources.ingest import (
        FORMAT_CSV,
        FORMAT_JSONL,
        read_corpus,
        write_corpus,
    )

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    base = _tempfile.mkdtemp(prefix="federated_")
    shards = [
        (docs.filter("doc_id % 3 = 0"), FORMAT_JSONL),
        (docs.filter("doc_id % 3 = 1"), FORMAT_CSV),
    ]
    frames = [docs.filter("doc_id % 3 = 2")]  # parquet stays in place
    for i, (shard, fmt) in enumerate(shards):
        p = f"{base}/shard{i}"
        write_corpus(shard, p, source_format=fmt)
        frames.append(
            read_corpus(spark, p, source_format=fmt, schema=docs.schema)
        )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    return union.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.countDistinct("doc_id").alias("n_ids"),
    )


_FEDERATED_UNION_ORACLE = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
FROM documents GROUP BY lang
"""


def _q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Third columnar-adjacent source format: documents -> ORC on disk ->
    # ORC reader -> aggregate, same round-trip-identity oracle as the
    # JSONL/CSV entries (DuckDB can't read ORC, so the oracle runs the
    # aggregate over the original table — any writer/reader loss breaks
    # the hash).
    import tempfile as _tempfile

    from ..sources.ingest import FORMAT_ORC, read_corpus, write_corpus

    t = register_tables(spark, sf_dir)
    path = _tempfile.mkdtemp(prefix="ingest_orc_") + "/documents"
    write_corpus(t["documents"], path, source_format=FORMAT_ORC)
    back = read_corpus(spark, path, source_format=FORMAT_ORC)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.count_distinct("doc_id").alias("n_ids"),
    )


def _q_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The FULL reference output chain, both directions: orders rows ->
    # tf.Example bytes (S7) -> hash split (D1) -> gzipped TFRecord files
    # under Split-{name}/ (S6) -> distributed read-back (binaryFile +
    # CRC-verified deframe + proto decode) -> aggregate. The oracle runs
    # the aggregate on the original table, so any corruption in framing,
    # CRC, proto encode/decode, or split routing breaks the hash.
    # Integer/string columns only: float features are float32 by the
    # tf.Example contract and would not replay in a double oracle.
    import tempfile as _tempfile

    from pyspark.sql.types import StructType

    from ..operators.split import hash_split
    from ..sources.examplegen import encode_examples
    from ..sources.tfrecord import (
        read_tfrecord_dataset,
        write_partitioned_tfrecords,
    )

    t = register_tables(spark, sf_dir)
    subset = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    encoded = encode_examples(subset)
    routed = hash_split(encoded, ["example"])
    out_dir = _tempfile.mkdtemp(prefix="tfrecord_roundtrip_")
    write_partitioned_tfrecords(routed, out_dir, split_col="split")
    back = read_tfrecord_dataset(
        spark, out_dir, StructType.fromDDL(
            "o_orderkey long, o_custkey long, "
            "o_orderstatus string, o_orderpriority string"
        ),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.sum("o_custkey").alias("custkey_sum"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
    )


_TFRECORD_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(sum(o_custkey) AS BIGINT) AS custkey_sum,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM orders GROUP BY o_orderstatus
"""


def _q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CSV round-trip with quoting/escape symmetry: orders (numerics,
    # timestamps, free-text priority strings) -> CSV -> schema'd reader
    # -> aggregate vs the parquet-based oracle.
    import tempfile as _tempfile

    from ..sources.ingest import FORMAT_CSV, read_corpus, write_corpus

    t = register_tables(spark, sf_dir)
    path = _tempfile.mkdtemp(prefix="ingest_csv_") + "/orders"
    write_corpus(t["orders"], path, source_format=FORMAT_CSV)
    back = read_corpus(
        spark, path, source_format=FORMAT_CSV, schema=t["orders"].schema
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.min(F.unix_timestamp("o_orderdate")).alias("first_order_ts"),
    )


_CSV_ROUNDTRIP_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS first_order_ts
FROM orders GROUP BY o_orderpriority
"""


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lakehouse MERGE INTO: a January per-user state table absorbs a
    # February CDC batch — newest-per-key update wins (seq = event_id),
    # 'error'-typed rows act as tombstones. Anti-join + union; at scale
    # the base side is bucketed so the anti-join is exchange-free.
    from ..operators.snapshot import merge_upsert

    register_tables(spark, sf_dir)
    base = spark.sql("""
        SELECT user_id,
               max_by(round(value, 2), struct(ts, event_id)) AS value,
               max(ts) AS state_ts,
               CAST(NULL AS BIGINT) AS seq
        FROM events WHERE ts < TIMESTAMP'2024-02-01 00:00:00'
        GROUP BY user_id
    """)
    updates = spark.sql("""
        SELECT user_id, round(value, 2) AS value, ts AS state_ts,
               event_id, event_type = 'error' AS is_delete
        FROM events
        WHERE ts >= TIMESTAMP'2024-02-01 00:00:00'
          AND ts < TIMESTAMP'2024-03-01 00:00:00'
    """)
    return merge_upsert(
        base, updates.withColumnRenamed("event_id", "seq"),
        ["user_id"], seq_col="seq", delete_col="is_delete",
    ).select("user_id", "value", "state_ts", "seq")


_MERGE_UPSERT_ORACLE = """
WITH base AS (
  SELECT user_id, round(value, 2) AS value, ts AS state_ts,
         CAST(NULL AS BIGINT) AS seq
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS brn
    FROM events WHERE ts < TIMESTAMP'2024-02-01 00:00:00'
  ) WHERE brn = 1
),
up AS (
  SELECT user_id, round(value, 2) AS value, ts AS state_ts,
         event_id AS seq, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rn
  FROM events
  WHERE ts >= TIMESTAMP'2024-02-01 00:00:00'
    AND ts < TIMESTAMP'2024-03-01 00:00:00'
)
SELECT b.user_id, b.value, b.state_ts, b.seq
FROM base b ANTI JOIN (SELECT DISTINCT user_id FROM up) u USING (user_id)
UNION ALL
SELECT user_id, value, state_ts, seq
FROM up WHERE rn = 1 AND NOT is_delete
"""


def _q_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Versioned-table time travel driving CDC: commit v0 (pre-1995
    # orders, the fixture's first half) and v1 (all orders) under the
    # manifest-committed layout
    # (sources/versioned.py — manifests rename-committed AFTER data, so
    # readers never see a torn table), snapshot-read BOTH versions, diff
    # them. The oracle recomputes the same change sets from the raw
    # table: time travel must reproduce the exact snapshots.
    import tempfile as _tempfile

    from ..operators.snapshot import snapshot_diff
    from ..sources.versioned import read_version, write_version

    t = register_tables(spark, sf_dir)
    orders = t["orders"]
    root = _tempfile.mkdtemp(prefix="versioned_orders_") + "/tbl"
    write_version(orders.filter("o_orderdate < DATE'1998-01-01'"), root)
    write_version(orders, root)
    d = snapshot_diff(
        read_version(spark, root, 0),
        read_version(spark, root, 1),
        ["o_orderkey"],
        ["o_totalprice", "o_orderstatus"],
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.coalesce(F.col("new_o_totalprice"),
                             F.col("old_o_totalprice"))), 2
        ).alias("total_price"),
    )


_TIME_TRAVEL_DIFF_ORACLE = """
SELECT CASE WHEN o_orderdate < DATE'1998-01-01'
            THEN 'unchanged' ELSE 'added' END AS change_type,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY 1
"""


def _q_table_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Manifest-driven data skipping: orders committed range-partitioned
    # on o_orderdate with per-file min/max stats; a 1996 range read
    # opens only overlapping files. Output carries the aggregate AND the
    # skipping contract (files_opened < files_total, answer unchanged);
    # the oracle computes the aggregate from the raw table and literal
    # TRUE for the contract.
    import tempfile as _tempfile

    from ..sources.versioned import read_version_pruned, write_version

    t = register_tables(spark, sf_dir)
    orders = t["orders"]
    root = _tempfile.mkdtemp(prefix="pruned_orders_") + "/tbl"
    write_version(
        orders.repartitionByRange(8, "o_orderdate"),
        root,
        stats_cols=["o_orderdate"],
    )
    df, opened, total = read_version_pruned(
        spark, root, "o_orderdate", "1996-01-01", "1996-12-31"
    )
    agg = df.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    return agg.select(
        "n_orders",
        "total_price",
        F.lit(opened < total).alias("skipped_files"),
        F.lit(opened > 0).alias("opened_some"),
    )


_TABLE_PRUNED_SCAN_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       TRUE AS skipped_files,
       TRUE AS opened_some
FROM orders
WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
"""


def _q_ivm_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental view maintenance: the per-user (count, cents-sum)
    # state computed through January absorbs February's DELTA by
    # associative merge (full-outer join + coalesce-add) — no base
    # recompute. The oracle computes the through-February aggregate
    # directly: the merged state must equal it exactly (integer cents).
    register_tables(spark, sf_dir)
    state = spark.sql("""
        SELECT user_id, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE ts < TIMESTAMP'2024-02-01 00:00:00'
        GROUP BY user_id
    """)
    delta = spark.sql("""
        SELECT user_id, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events
        WHERE ts >= TIMESTAMP'2024-02-01 00:00:00'
          AND ts < TIMESTAMP'2024-03-01 00:00:00'
        GROUP BY user_id
    """)
    s = state.select(
        "user_id",
        F.col("n_events").alias("sn"),
        F.col("cents").alias("sc"),
    )
    d = delta.select(
        "user_id",
        F.col("n_events").alias("dn"),
        F.col("cents").alias("dc"),
    )
    return (
        s.join(d, "user_id", "full_outer")
        .select(
            "user_id",
            (F.coalesce("sn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long")
            .alias("n_events"),
            (F.coalesce("sc", F.lit(0)) + F.coalesce("dc", F.lit(0)))
            .cast("long")
            .alias("cents"),
        )
    )


_IVM_DELTA_AGG_ORACLE = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events WHERE ts < TIMESTAMP'2024-03-01 00:00:00'
GROUP BY user_id
"""


def _q_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVM for a JOIN view: orders x lineitem split at the 2001-01-01
    # cutoff into base and insert batches on BOTH sides (the fixture's
    # last ~8 months arriving as one ingest); the emitted frame is the
    # textbook delta dA x (B + dB) UNION A x dB — two joins, each with
    # the small delta side broadcast, neither base table shuffled. The
    # oracle derives the same delta the expensive way the operator
    # exists to avoid: full-minus-full via EXCEPT ALL (bag semantics).
    from ..operators.ivm import delta_join

    t = register_tables(spark, sf_dir)
    o = t["orders"].select(
        F.col("o_orderkey").alias("okey"), "o_orderdate"
    )
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        "l_linenumber",
        "l_shipdate",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
    )
    cut = "2001-01-01"
    return delta_join(
        o.where(F.col("o_orderdate") < cut),
        o.where(F.col("o_orderdate") >= cut),
        li.where(F.col("l_shipdate") < cut),
        li.where(F.col("l_shipdate") >= cut),
        ["okey"],
    )


_IVM_DELTA_JOIN_ORACLE = """
WITH o AS (SELECT o_orderkey AS okey, o_orderdate FROM orders),
li AS (
  SELECT l_orderkey AS okey, l_linenumber, l_shipdate,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM lineitem
)
SELECT o.okey, o.o_orderdate, li.l_linenumber, li.l_shipdate,
       li.price_cents
FROM o JOIN li ON o.okey = li.okey
EXCEPT ALL
SELECT o.okey, o.o_orderdate, li.l_linenumber, li.l_shipdate,
       li.price_cents
FROM o JOIN li ON o.okey = li.okey
WHERE o.o_orderdate < TIMESTAMP'2001-01-01 00:00:00'
  AND li.l_shipdate < TIMESTAMP'2001-01-01 00:00:00'
"""


def _q_sequence_example_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S8 beyond parity, end-to-end: per-user event sequences (ordered by
    # (ts, event_id) via sort_array on a struct) are encoded as REAL
    # tf.train.SequenceExample bytes (hand-rolled wire format,
    # functions/tfexample.py), decoded back, and the decoded payload's
    # aggregates are emitted — so a wire-format bug anywhere in
    # encode/decode breaks the hash against the SQL oracle, which derives
    # the same aggregates relationally. Values ride int64 centi-units
    # (floor(value*100)): float_list is float32 and would not replay
    # exactly in a double-precision oracle.
    import math

    from ..functions.tfexample import (
        decode_sequence_example,
        encode_sequence_example_full,
    )

    t = register_tables(spark, sf_dir)
    grouped = (
        t["events"]
        .select(
            "user_id",
            F.struct("ts", "event_id", "event_type", "value").alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("steps"))
    )

    import pandas as pd

    def _roundtrip(batches):
        for pdf in batches:
            uids, n_steps, firsts, lasts, sums = [], [], [], [], []
            for uid, steps in zip(pdf["user_id"], pdf["steps"]):
                types = [s["event_type"] for s in steps]
                cents = [int(math.floor(s["value"] * 100)) for s in steps]
                payload = encode_sequence_example_full(
                    {"user_id": int(uid), "n_events": len(types)},
                    {"event_type": types, "value_c": cents},
                )
                ctx, fl = decode_sequence_example(payload)
                d_types = [step[0].decode("utf-8") for step in fl["event_type"]]
                d_cents = [step[0] for step in fl["value_c"]]
                uids.append(ctx["user_id"][0])
                n_steps.append(ctx["n_events"][0])
                firsts.append(d_types[0])
                lasts.append(d_types[-1])
                sums.append(sum(d_cents))
            yield pd.DataFrame(
                {
                    "user_id": uids,
                    "n_steps": n_steps,
                    "first_event_type": firsts,
                    "last_event_type": lasts,
                    "value_centisum": sums,
                }
            )

    return grouped.mapInPandas(
        _roundtrip,
        schema=(
            "user_id long, n_steps long, first_event_type string, "
            "last_event_type string, value_centisum long"
        ),
    )


_SEQUENCE_EXAMPLE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS vc,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_steps,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS first_event_type,
       MAX(CASE WHEN rn = n THEN event_type END) AS last_event_type,
       CAST(SUM(vc) AS BIGINT) AS value_centisum
FROM ordered GROUP BY user_id
"""


def _q_param_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D2: span/range bind-parameter substitution through the real user
    # path (sources.examplegen.substitute_params; reference pattern
    # usage_prototype.py:46-48). The oracle inlines the same literals by
    # hand, so the substitution engine itself is what's under test.
    import datetime as dt

    from ..sources.examplegen import substitute_params

    register_tables(spark, sf_dir)
    q = """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        WHERE ts >= @begin_timestamp AND ts < @end_timestamp
        GROUP BY event_type
    """
    sql = substitute_params(
        q,
        {
            "begin_timestamp": dt.datetime(2024, 1, 8),
            "end_timestamp": dt.datetime(2024, 1, 22),
        },
    )
    return spark.sql(sql)


_PARAM_SUBSTITUTION_ORACLE = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts < TIMESTAMP '2024-01-22 00:00:00'
GROUP BY event_type
"""


def _q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucketed co-located join: both sides materialized bucketed on the
    # join key (the one-time layout cost), after which the join plans
    # with NO exchange on either side — the 100 TB pattern for feature
    # tables that are joined on every retrieval. The oracle joins the
    # raw parquet, proving bucketing changed the physical plan only.
    from ..sources.bucketing import register_bucketed_feature_table

    t = register_tables(spark, sf_dir)
    sf_tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    li = register_bucketed_feature_table(
        spark,
        t["lineitem"].select("l_orderkey", "l_extendedprice"),
        f"bkt_lineitem_{sf_tag}",
        bucket_cols=["l_orderkey"],
        n_buckets=16,
    )
    od = register_bucketed_feature_table(
        spark,
        t["orders"].select("o_orderkey", "o_orderpriority"),
        f"bkt_orders_{sf_tag}",
        bucket_cols=["o_orderkey"],
        n_buckets=16,
    )
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                )
            ).cast("double")
            / 100.0,
            2,
        ).alias("revenue"),
    )


_BUCKETED_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Change-data detection between two feature-snapshot versions; the
    # diff classifies every user as added / changed / unchanged (no
    # removals — event logs only append). Counts plus a value digest per
    # class; the oracle derives both snapshots with window dedup and
    # replays the null-safe CASE.
    from ..operators.snapshot import snapshot_diff

    t = register_tables(spark, sf_dir)
    ev = t["events"]

    def latest(df):
        return df.groupBy("user_id").agg(
            F.max_by(
                F.struct("value", "event_type"),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("__p")
        ).select(
            "user_id",
            F.col("__p.value").alias("value"),
            F.col("__p.event_type").alias("event_type"),
        )

    # Cutoff near the end of data so users whose last event precedes it
    # come out unchanged; users with later events come out changed; and
    # entities excluded from the old snapshot (user_id % 10 == 3 — "not
    # yet onboarded") come out added. All three classes exercised.
    cutoff = "2024-01-30 12:00:00"
    old = latest(
        ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")).filter(
            F.col("user_id") % 10 != 3
        )
    )
    new = latest(ev)
    d = snapshot_diff(old, new, ["user_id"], ["value", "event_type"])
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("user_id").alias("user_id_sum"),
        F.round(
            F.sum(
                F.floor(F.col("new_value") * 100 + F.lit(0.5)).cast("long")
            ).cast("double")
            / 100.0,
            2,
        ).alias("new_value_sum"),
    )


_SNAPSHOT_DIFF_ORACLE = """
WITH ranked AS (
  SELECT user_id, value, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
new AS (SELECT user_id, value, event_type FROM ranked WHERE rn = 1),
ranked_old AS (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts < TIMESTAMP '2024-01-30 12:00:00' AND user_id % 10 <> 3
),
old AS (SELECT user_id, value, event_type FROM ranked_old WHERE rn = 1),
d AS (
  SELECT COALESCE(o.user_id, n.user_id) AS user_id,
         n.value AS new_value,
         CASE WHEN o.user_id IS NULL THEN 'added'
              WHEN n.user_id IS NULL THEN 'removed'
              WHEN o.value IS NOT DISTINCT FROM n.value
               AND o.event_type IS NOT DISTINCT FROM n.event_type
                   THEN 'unchanged'
              ELSE 'changed' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
)
SELECT change_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(user_id) AS BIGINT) AS user_id_sum,
       round(CAST(sum(CAST(floor(new_value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS new_value_sum
FROM d GROUP BY change_type
"""


def _q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Crawl-archive ingestion: WARC (ISO 28500) record walking, the
    # Common Crawl format. One deterministic archive per document —
    # plain concatenation for even doc_ids, per-record gzip members
    # (the splittable Common Crawl layout) for odd — exploded to one
    # row per record with the payload byte sum as evidence the walker
    # consumed the declared Content-Length bytes. A walker that
    # mis-sizes any record loses framing sync and fails loud; the
    # oracle replays the record/payload arithmetic in closed form.
    from ..sources.warc import attach_warc_payloads, extract_warc_records

    t = register_tables(spark, sf_dir)
    return extract_warc_records(attach_warc_payloads(t["documents"]))


_WARC_RECORDS_ORACLE = """
WITH r AS (
  SELECT d.doc_id, CAST(i.i AS INT) AS rec_idx,
         (d.doc_id * 17 + i.i * 31) % 120 + 16 AS clen
  FROM documents d,
       LATERAL (SELECT unnest(range(0, d.doc_id % 6 + 2)) AS i) i
),
s AS (
  SELECT r.doc_id, r.rec_idx, r.clen,
         SUM((r.doc_id + r.rec_idx * 7 + j.j * 3) % 256) AS psum
  FROM r, LATERAL (SELECT unnest(range(0, r.clen)) AS j) j
  GROUP BY r.doc_id, r.rec_idx, r.clen
)
SELECT doc_id,
       rec_idx,
       CASE (doc_id + rec_idx) % 3
         WHEN 0 THEN 'response' WHEN 1 THEN 'request'
         ELSE 'resource' END AS rec_type,
       'http://example.com/' || doc_id || '/' || rec_idx AS uri,
       CAST(clen AS BIGINT) AS content_length,
       CAST(psum AS BIGINT) AS payload_sum,
       doc_id % 2 = 1 AS was_gzip
FROM s
"""


def _q_warc_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WARC as a REGISTERED READER FORMAT (Spark 4 Python DataSource
    # API): the same deterministic fixture archives land on disk as
    # <doc_id>.warc files, and spark.read.format("warc").load(dir)
    # plans one partition per archive and walks each with the SAME
    # strict parser the mapInPandas path uses — so this entry proves
    # the pluggable-source seam end to end against the identical
    # closed-form oracle (restricted to the doc_id % 5 = 0 stripe the
    # fixture writes).
    import tempfile as _tempfile

    from ..sources.warc import attach_warc_payloads
    from ..sources.warc_datasource import register_warc_source

    t = register_tables(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") % 5 == 0)
    base = _tempfile.mkdtemp(prefix="warc_ds_")
    # fixture construction (driver-side, ~100 small files at sf0.01);
    # the measured operator is the distributed datasource READ below
    for r in attach_warc_payloads(docs).collect():
        with open(f"{base}/{r['doc_id']}.warc", "wb") as f:
            f.write(bytes(r["payload"]))
    register_warc_source(spark)
    return spark.read.format("warc").load(base)


_WARC_DATASOURCE_ORACLE = """
WITH r AS (
  SELECT d.doc_id, CAST(i.i AS INT) AS rec_idx,
         (d.doc_id * 17 + i.i * 31) % 120 + 16 AS clen
  FROM documents d,
       LATERAL (SELECT unnest(range(0, d.doc_id % 6 + 2)) AS i) i
  WHERE d.doc_id % 5 = 0
),
s AS (
  SELECT r.doc_id, r.rec_idx, r.clen,
         SUM((r.doc_id + r.rec_idx * 7 + j.j * 3) % 256) AS psum
  FROM r, LATERAL (SELECT unnest(range(0, r.clen)) AS j) j
  GROUP BY r.doc_id, r.rec_idx, r.clen
)
SELECT doc_id,
       rec_idx,
       CASE (doc_id + rec_idx) % 3
         WHEN 0 THEN 'response' WHEN 1 THEN 'request'
         ELSE 'resource' END AS rec_type,
       'http://example.com/' || doc_id || '/' || rec_idx AS uri,
       CAST(clen AS BIGINT) AS content_length,
       CAST(psum AS BIGINT) AS payload_sum,
       doc_id % 2 = 1 AS was_gzip
FROM s
"""


def _q_warc_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The WRITE side of the registered warc format: every document
    # becomes one record, df.write.format("warc") archives each task's
    # rows into one ISO 28500 file (the Common Crawl many-records-per-
    # archive layout), and the registered reader walks them back. The
    # aggregate — record count, distinct URIs, total declared bytes,
    # and the payload BYTE SUM (evidence the bodies survived framing
    # byte-for-byte) — is replayed by the oracle from the original
    # table (text is pure ASCII, so ord(char) == byte value).
    import tempfile as _tempfile

    from ..sources.warc_datasource import register_warc_source

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    rows = docs.select(
        F.concat(F.lit("http://example.com/"), F.col("doc_id")).alias("uri"),
        F.lit("resource").alias("rec_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lpad(
            F.conv(F.col("doc_id").cast("string"), 10, 16), 12, "0"
        ).alias("rec_id"),
    )
    base = _tempfile.mkdtemp(prefix="warc_write_") + "/out"
    register_warc_source(spark)
    rows.repartition(8).write.format("warc").mode("append").save(base)
    back = spark.read.format("warc").load(base)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("uri").cast("long").alias("n_uris"),
        F.sum("content_length").cast("long").alias("total_bytes"),
        F.sum("payload_sum").cast("long").alias("payload_bytes_sum"),
    )


_WARC_WRITE_ORACLE = """
WITH b AS (
  SELECT doc_id, text,
         coalesce(list_sum(list_transform(
             range(1, length(text) + 1), i -> ord(substr(text, i, 1)))), 0)
           AS bytesum
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_uris,
       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
       CAST(sum(bytesum) AS BIGINT) AS payload_bytes_sum
FROM b
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "source_jsonl_roundtrip": (_q_jsonl_roundtrip, _JSONL_ROUNDTRIP_ORACLE),
    "source_warc_write_roundtrip": (
        _q_warc_write_roundtrip,
        _WARC_WRITE_ORACLE,
    ),
    "source_csv_roundtrip": (_q_csv_roundtrip, _CSV_ROUNDTRIP_ORACLE),
    "split_pattern_routing": (_q_split_routing, _SPLIT_ROUTING_ORACLE),
    "param_substitution": (_q_param_substitution, _PARAM_SUBSTITUTION_ORACLE),
    "merge_upsert_cdc": (_q_merge_upsert, _MERGE_UPSERT_ORACLE),
    "source_orc_roundtrip": (_q_orc_roundtrip, _JSONL_ROUNDTRIP_ORACLE),
    "federated_union_agg": (_q_federated_union, _FEDERATED_UNION_ORACLE),
    "ivm_delta_agg": (_q_ivm_delta_agg, _IVM_DELTA_AGG_ORACLE),
    "ivm_delta_join": (_q_ivm_delta_join, _IVM_DELTA_JOIN_ORACLE),
    "table_time_travel_diff": (
        _q_time_travel_diff,
        _TIME_TRAVEL_DIFF_ORACLE,
    ),
    "table_pruned_scan": (_q_table_pruned_scan, _TABLE_PRUNED_SCAN_ORACLE),
    "sequence_example_roundtrip": (
        _q_sequence_example_roundtrip,
        _SEQUENCE_EXAMPLE_ORACLE,
    ),
    "zorder_layout": (_q_zorder_layout, _zorder_oracle()),
    "source_tfrecord_roundtrip": (
        _q_tfrecord_roundtrip,
        _TFRECORD_ROUNDTRIP_ORACLE,
    ),
    "snapshot_diff": (_q_snapshot_diff, _SNAPSHOT_DIFF_ORACLE),
    "bucketed_join": (_q_bucketed_join, _BUCKETED_JOIN_ORACLE),
    "source_warc_records": (_q_warc_records, _WARC_RECORDS_ORACLE),
    "source_warc_datasource": (_q_warc_datasource, _WARC_DATASOURCE_ORACLE),
}
