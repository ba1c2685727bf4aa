"""Query corpus: every implemented operator as a (Spark, oracle-SQL) pair.

This is the engine's executable specification, mirroring SURVEY.md §2's
operator inventory. Each entry is a callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle can run over the same parquet fixtures. Column names are
aligned on both sides because the driver's comparator sorts columns by
name before hashing values.

Conventions for cross-engine determinism:

- timestamps in outputs are projected as epoch seconds (``unix_timestamp``
  / ``epoch(...)::BIGINT``) — engine-native timestamp objects differ in
  precision plumbing (parquet NANOS vs Spark MICROS);
- floating-point aggregates are ``round``-ed (summation order differs
  across engines; rounding collapses ulp noise);
- every ordering has a total tie-break so ties cannot reorder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.pit_join import materialize_features
from .operators.split import fingerprint_split, split_counts
from .registry import Registry, testdata_registry
from .session import register_tables

# ---------------------------------------------------------------------------
# Shared fixtures for the point-in-time queries
# ---------------------------------------------------------------------------

# Weekly training-snapshot timestamps inside the events fixture's Jan-2024
# span — the "entity dataframe" pattern of the reference's usage sketch
# (/root/reference/example/usage_prototype.py:46-47: an arbitrary SQL spine
# with an event-time column).
_SNAPSHOTS = "(VALUES (TIMESTAMP '2024-01-08 00:00:00'), (TIMESTAMP '2024-01-15 00:00:00'), (TIMESTAMP '2024-01-22 00:00:00'), (TIMESTAMP '2024-01-29 00:00:00')) AS t(event_timestamp)"

_SPINE_SQL = f"""
SELECT c_custkey AS user_id, event_timestamp
FROM customer CROSS JOIN {_SNAPSHOTS}
"""

# DuckDB rendering of the reference's compiled join template
# (SURVEY.md §2.3 / executor.py:128-129): candidates by equi-key + as-of
# predicate, ROW_NUMBER latest-wins dedup (ts DESC, created DESC), LEFT
# JOIN back onto the spine. Our Spark implementation uses max_by instead of
# a window sort; the oracle keeps the reference's ROW_NUMBER form so the
# two derivations are independent.
def _pit_oracle(ttl_days: int | None = None) -> str:
    ttl_pred = (
        f" AND e.ts >= s.event_timestamp - INTERVAL {ttl_days} DAY"
        if ttl_days
        else ""
    )
    return f"""
WITH spine AS ({_SPINE_SQL}),
cand AS (
  SELECT s.user_id, s.event_timestamp, e.value, e.event_type,
         ROW_NUMBER() OVER (
           PARTITION BY s.user_id, s.event_timestamp
           ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM spine s
  JOIN events e ON e.user_id = s.user_id AND e.ts <= s.event_timestamp{ttl_pred}
)
SELECT s.user_id,
       CAST(epoch(s.event_timestamp) AS BIGINT) AS snapshot_ts,
       c.value, c.event_type
FROM spine s
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.user_id = s.user_id AND c.event_timestamp = s.event_timestamp
"""


def _pit_query(view_refs: list[str] | str, registry: Registry | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        df = materialize_features(
            spark,
            entity_query=_SPINE_SQL,
            features=view_refs,
            registry=registry or testdata_registry(),
            sf_dir=sf_dir,
        )
        return df.select(
            F.col("user_id"),
            F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
            F.col("value"),
            F.col("event_type"),
        )

    return run


def _q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_query(["user_events:value", "user_events:event_type"])(spark, sf_dir)


def _q_pit_join_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_query(["user_events_7d:value", "user_events_7d:event_type"])(
        spark, sf_dir
    )


def _q_feature_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Feature-service expansion (P2): service name -> stored refs.
    return _pit_query("user_activity")(spark, sf_dir)


def _q_pit_multiview(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5: one as-of view + one static dimension view on a different key.
    register_tables(spark, sf_dir)
    spine = f"""
        SELECT c_custkey, c_custkey AS user_id, event_timestamp
        FROM customer CROSS JOIN {_SNAPSHOTS}
    """
    df = materialize_features(
        spark,
        entity_query=spine,
        features=[
            "user_events:value",
            "customer_profile:c_acctbal",
            "customer_profile:c_mktsegment",
        ],
        registry=testdata_registry(),
        sf_dir=sf_dir,
    )
    return df.select(
        F.col("user_id"),
        F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
        F.col("value"),
        F.col("c_acctbal"),
        F.col("c_mktsegment"),
    )


_PIT_MULTIVIEW_ORACLE = f"""
WITH spine AS (
  SELECT c_custkey, c_custkey AS user_id, event_timestamp
  FROM customer CROSS JOIN {_SNAPSHOTS}
),
cand AS (
  SELECT s.user_id, s.event_timestamp, e.value,
         ROW_NUMBER() OVER (
           PARTITION BY s.user_id, s.event_timestamp
           ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM spine s
  JOIN events e ON e.user_id = s.user_id AND e.ts <= s.event_timestamp
)
SELECT s.user_id,
       CAST(epoch(s.event_timestamp) AS BIGINT) AS snapshot_ts,
       c.value, cu.c_acctbal, cu.c_mktsegment
FROM spine s
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.user_id = s.user_id AND c.event_timestamp = s.event_timestamp
LEFT JOIN customer cu ON cu.c_custkey = s.c_custkey
"""


# ---------------------------------------------------------------------------
# Split (D1) — oracle-expressible fingerprint variant
# ---------------------------------------------------------------------------

def _q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    orders = spark.table("orders")
    return split_counts(fingerprint_split(orders, "o_orderkey"))


_SPLIT_ORACLE = """
SELECT CASE WHEN ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 3 < 2
            THEN 'train' ELSE 'eval' END AS split,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY split
"""


# ---------------------------------------------------------------------------
# Declared-SQL breadth (S1/A2): the entity-query surface is the whole SQL
# language; exercise it with star-schema analytics, all via spark.sql.
# ---------------------------------------------------------------------------

def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


# TPC-H Q1-shaped pricing summary (aggregations; doubles rounded).
_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# TPC-H Q3-shaped top-k join (join + agg + order + limit).
_Q3 = """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_ts
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

# TPC-H Q5-shaped star join through region/nation (multi-join).
_Q5 = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""

# Window functions (A1 surface beyond row_number): rank within group +
# running aggregate.
_QWINDOW = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
         round(sum(c_acctbal) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_bal
  FROM customer
) WHERE bal_rank <= 5
ORDER BY c_mktsegment, bal_rank
"""

# Set ops (D5).
_QSETOPS = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""

# JSON + string/date scalar functions over the events table (§2.6: the
# scalar surface ships via the SQL function library; props is a JSON blob).
_QJSON_SPARK = """
SELECT event_type,
       CAST(date_format(ts, 'yyyy-MM-dd') AS STRING) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(avg(CAST(get_json_object(props, '$.k') AS DOUBLE)), 4) AS avg_k
FROM events
WHERE upper(event_type) IN ('PURCHASE', 'CLICK')
GROUP BY event_type, date_format(ts, 'yyyy-MM-dd')
ORDER BY event_type, day
"""

_QJSON_ORACLE = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
FROM events
WHERE upper(event_type) IN ('PURCHASE', 'CLICK')
GROUP BY event_type, strftime(ts, '%Y-%m-%d')
ORDER BY event_type, day
"""

# Correlated/uncorrelated subquery + HAVING (declared-SQL breadth).
_QHAVING = """
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
FROM orders
GROUP BY o_custkey
HAVING sum(o_totalprice) > (SELECT avg(o_totalprice) * 3 FROM orders)
ORDER BY spend DESC, o_custkey
"""


# ---------------------------------------------------------------------------
# Registry: name -> (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "pit_join": (_q_pit_join, _pit_oracle()),
    "pit_join_ttl": (_q_pit_join_ttl, _pit_oracle(ttl_days=7)),
    "pit_join_multiview": (_q_pit_multiview, _PIT_MULTIVIEW_ORACLE),
    "feature_service": (_q_feature_service, _pit_oracle()),
    "hash_split_counts": (_q_split_counts, _SPLIT_ORACLE),
    "q1_pricing_summary": (_sql_query(_Q1), _Q1.replace("TIMESTAMP '1998-09-02 00:00:00'", "TIMESTAMP '1998-09-02 00:00:00'")),
    "q3_top_revenue": (
        _sql_query(
            _Q3.replace(
                "CAST(epoch(o.o_orderdate) AS BIGINT)",
                "CAST(unix_timestamp(o.o_orderdate) AS BIGINT)",
            )
        ),
        _Q3,
    ),
    "q5_region_revenue": (_sql_query(_Q5), _Q5),
    "window_topk_running": (_sql_query(_QWINDOW), _QWINDOW),
    "setop_intersect": (_sql_query(_QSETOPS), _QSETOPS),
    "json_events_daily": (_sql_query(_QJSON_SPARK), _QJSON_ORACLE),
    "having_subquery": (_sql_query(_QHAVING), _QHAVING),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
