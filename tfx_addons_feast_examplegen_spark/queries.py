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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import similarity as sim
from .operators import text as tx
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


def _q_pit_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB scale path (time_bucketed=True) against the SAME oracle
    # as the plain TTL join — result equivalence is part of the contract.
    from .operators.pit_join import point_in_time_join

    t = register_tables(spark, sf_dir)
    spine = spark.sql(_SPINE_SQL)
    out = point_in_time_join(
        spine,
        t["events"],
        join_keys=["user_id"],
        entity_ts_col="event_timestamp",
        feature_ts_col="ts",
        features=["value", "event_type"],
        created_col="event_id",
        ttl_seconds=7 * 24 * 3600,
        time_bucketed=True,
    )
    return out.select(
        F.col("user_id"),
        F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
        F.col("value"),
        F.col("event_type"),
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


def _q_three_way_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SplitConfig generalizes past the TFX train/eval default: an
    # 8/1/1 train/val/test assignment from the same portable fingerprint
    # arithmetic, plus a per-split min/max key digest so the oracle locks
    # membership (not just cardinality) without emitting every row.
    register_tables(spark, sf_dir)
    orders = spark.table("orders")
    three = fingerprint_split(
        orders, "o_orderkey", [("train", 8), ("val", 1), ("test", 1)]
    )
    return three.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum("o_orderkey").alias("key_sum"),
    )


_THREE_WAY_SPLIT_ORACLE = """
WITH b AS (
  SELECT o_orderkey,
         ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10
           AS bucket
  FROM orders
)
SELECT CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket < 9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM b GROUP BY 1
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

# TPC-H Q7-shaped bilateral volume: nation-pair revenue by ship year
# (6-table join, OR-of-conjuncts pair filter, year() extraction).
_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       round(CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                            + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""

# TPC-H Q10-shaped returned-item reporting: top customers by lost
# revenue in a quarter (join + range filter + top-k). Revenue (here and
# in Q7) sums exact integer cents — floor(x*100+0.5) of identical
# per-row doubles — so neither the value nor the top-k cutoff depends on
# double summation order (a raw round(sum(...), 2) flipped a last cent
# between engines at a .xx5 boundary).
_Q10 = """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(c.c_acctbal, 2) AS acctbal,
       round(CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                            + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# TPC-H Q18-shaped large-volume customers: IN-subquery over a grouped
# HAVING, then join back and re-aggregate.
_Q18 = """
SELECT c.c_custkey, o.o_orderkey,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY c.c_custkey, o.o_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
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


def _q_window_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-5 balances per market segment with a running total: one
    # window partitioning shared by both frames, so rank and running
    # sum compute in a single exchange + sort; the rank filter prunes
    # before the final order.
    t = register_tables(spark, sf_dir)
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t["customer"]
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("bal_rank"),
            F.round(F.sum("c_acctbal").over(w_run), 2).alias(
                "running_bal"
            ),
        )
        .filter(F.col("bal_rank") <= 5)
        .orderBy("c_mktsegment", "bal_rank")
    )

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

# ROLLUP aggregation (grouping-sets surface; D5-adjacent).
_QROLLUP = """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

# Anti-join via NOT EXISTS: customers who ordered but never status 'F'.
_QANTI = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""

# String-function surface over part names.
_QSTRING = """
SELECT upper(substr(p_type, 1, 5)) AS type_prefix,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(length(p_name)) AS BIGINT) AS total_name_len,
       min(concat(p_brand, ':', p_name)) AS first_branded,
       CAST(sum(CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gold
FROM part
GROUP BY upper(substr(p_type, 1, 5))
"""

# Date arithmetic + lag window: month-over-month order volume.
_QMONTHLY = """
SELECT mon_ts, n_orders,
       n_orders - lag(n_orders) OVER (ORDER BY mon_ts) AS delta
FROM (
  SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS mon_ts,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY date_trunc('month', o_orderdate)
)
"""

# Sessionization: 30-minute-gap sessions per user (lag + running sum),
# the classic event-stream pattern expressed in portable window SQL.
_QSESSION = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
         AS duration_s
FROM numbered
GROUP BY user_id, session_id
"""

# DuckDB's epoch() keeps fractional seconds (so it is floored above);
# Spark's unix_timestamp() already floors to whole seconds.
_QSESSION_SPARK = _QSESSION.replace(
    "CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)",
    "CAST(unix_timestamp(max(ts)) - unix_timestamp(min(ts)) AS BIGINT)",
)

# Percentiles (ordered-set aggregates; linear interpolation both engines).
_QPERCENTILE = """
SELECT l_returnflag,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4)
         AS p50_price,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4)
         AS p90_price,
       round(median(l_quantity), 4) AS med_qty
FROM lineitem GROUP BY l_returnflag
"""

# CUBE over two dimensions (full grouping-set lattice).
_QCUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# Manual (CASE-based) pivot: portable across engines, the declarative
# form of df.groupBy().pivot() for a fixed column set.
_QPIVOT = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
         AS purchase_value
FROM events GROUP BY user_id
"""

# Window-function breadth: lead/lag/first/last/ntile with explicit frames
# over per-user event sequences.
_QWINDOW_FULL = """
SELECT user_id, event_id,
       round(value, 2) AS value,
       round(lag(value) OVER w, 2) AS prev_value,
       round(lead(value) OVER w, 2) AS next_value,
       round(first_value(value) OVER w, 2) AS first_value_seen,
       round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS final_value,
       ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
         AS value_quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
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
# North-star extensions: dedup / similarity / text analysis (BASELINE.md)
# ---------------------------------------------------------------------------

def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return dd.exact_dedup(t["documents"], ["text"], "doc_id")


_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM documents GROUP BY md5(text)
"""


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    # on_over_cap="error": this entry is gated by the UNCAPPED exact
    # _JACCARD_ORACLE, so a dropped over-cap bucket would silently
    # diverge — fail loudly instead (ADVICE: no silent caps on
    # oracle-checked paths).
    return dd.jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.5,
        on_over_cap="error",
    )


# Exact 3-gram Jaccard, independently derived in DuckDB (list slices +
# lateral unnest instead of Spark's transform/sequence/explode).
_JACCARD_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (sa.nsh + sb.nsh - common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
"""


def _q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PPJoin-style prefix filtering: rare-first global order, only the
    # (1-t)-fraction prefix of each shingle set is indexed (lemma in the
    # operator docstring — no false negatives), exact verify over full
    # sets. Output bit-identical to jaccard_pairs: same uncapped oracle.
    t = register_tables(spark, sf_dir)
    return dd.jaccard_pairs_prefix(
        t["documents"], "doc_id", "text", n=3, threshold=0.5,
        on_over_cap="error",
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LSH-banded candidates + exact-Jaccard verification. At the fixture's
    # similarity levels (planted near-dups at j>=0.9) LSH recall is
    # 1-(1-j^4)^16 ~= 1-4e-8, so the verified output equals the exact
    # jaccard_pairs result and shares its oracle.
    t = register_tables(spark, sf_dir)
    return dd.minhash_lsh_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.5, verify=True,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The production (xxhash64) SimHash as an oracle-checkable CONTRACT
    # (same pattern as the sketch error bounds / ANN recall contracts):
    # the bit votes themselves aren't portable SQL, but their semantic
    # guarantees are. The pipeline runs in full (max_hamming=3, within
    # the 4x16-bit pigeonhole completeness bound, fail-fast cap) and the
    # output rows assert, per check, values DuckDB reproduces exactly:
    #
    # - exact_dup_pairs_total: pairs of docs with IDENTICAL distinct
    #   token sets — a real, fixture-sized number (hundreds at sf0.01)
    #   the oracle computes independently.
    # - exact_dup_pairs_missed_by_prod: identical token sets hash to
    #   identical simhashes under ANY hash family -> hamming 0 -> all 4
    #   chunks collide -> the pigeonhole join MUST emit the pair. A
    #   missed pair means broken vote/fold/band arithmetic; oracle
    #   asserts literal 0.
    # - prod_pairs_ge_exact: the hamming<=3 candidate set is a superset
    #   of the exact-dup pairs.
    # - prod_pairs_wellformed: every emitted pair has doc_a < doc_b and
    #   0 <= hamming <= 3.
    #
    # The md5 twin (dedup_simhash_portable) hash-verifies the full
    # arithmetic externally; this entry locks the production hash path
    # to the same machinery.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    prod = dd.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, on_over_cap="error"
    )
    toks = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda x: x != "",
                )
            )
        ).alias("ts"),
    ).filter(F.size("ts") > 0)
    # Exact-dup pairs via a self-equi-join on (token-set hash, token
    # set) — the same capped-pair shape every production pair-producer
    # uses: the pair SET is inherently quadratic in a degenerate group,
    # but the join spreads it across tasks, where the earlier
    # collect_list form held each whole group as one in-task array
    # before exploding. The array itself rides the join key so a 64-bit
    # hash collision between DIFFERENT token sets cannot fabricate an
    # "exact" pair and spuriously redden the completeness check; the
    # hash narrows the shuffle comparison, the array equality makes it
    # exact.
    keyed = toks.select(
        "doc_id",
        "ts",
        F.xxhash64(F.col("ts").cast("string")).alias("tsh"),
    )
    ka = keyed.select("tsh", "ts", F.col("doc_id").alias("doc_a"))
    kb = keyed.select("tsh", "ts", F.col("doc_id").alias("doc_b"))
    exact_pairs = (
        ka.join(kb, ["tsh", "ts"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    n_exact = exact_pairs.agg(
        F.count(F.lit(1)).cast("long").alias("value")
    )
    missed = (
        exact_pairs.join(
            prod.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("value"))
    )
    n_prod = prod.agg(F.count(F.lit(1)).cast("long").alias("value"))
    malformed = prod.filter(
        ~(
            (F.col("doc_a") < F.col("doc_b"))
            & F.col("hamming").between(0, 3)
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("value"))
    row = lambda name, df, val, ok: df.select(  # noqa: E731
        F.lit(name).alias("check"), val.alias("value"), ok.alias("ok")
    )
    v = F.col("value")
    return (
        row("exact_dup_pairs_total", n_exact, v, F.lit(True))
        .unionAll(row("exact_dup_pairs_missed_by_prod", missed, v, v == 0))
        .unionAll(
            row(
                "prod_pairs_ge_exact",
                n_prod.crossJoin(
                    n_exact.select(F.col("value").alias("__ne"))
                ),
                F.when(v >= F.col("__ne"), F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
                v >= F.col("__ne"),
            )
        )
        .unionAll(row("prod_pairs_wellformed", malformed, v, v == 0))
    )


_SIMHASH_CONTRACT_ORACLE = """
WITH tok AS (
  SELECT doc_id, list_sort(list(DISTINCT t)) AS ts
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS t
    FROM documents
  )
  GROUP BY doc_id
),
g AS (SELECT count(*) AS c FROM tok GROUP BY ts),
n AS (
  SELECT CAST(coalesce(sum(c * (c - 1) / 2), 0) AS BIGINT) AS n_exact
  FROM g
)
SELECT 'exact_dup_pairs_total' AS check, n_exact AS value, TRUE AS ok FROM n
UNION ALL
SELECT 'exact_dup_pairs_missed_by_prod', CAST(0 AS BIGINT), TRUE
UNION ALL
SELECT 'prod_pairs_ge_exact', CAST(1 AS BIGINT), TRUE
UNION ALL
SELECT 'prod_pairs_wellformed', CAST(0 AS BIGINT), TRUE
"""


def _q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle-checkable SimHash variant: md5-derived 60-bit token
    # hashes replay bit-for-bit in DuckDB, so the WHOLE pipeline —
    # per-bit votes, hash fold, pigeonhole candidate join, Hamming
    # filter — is verified externally (the xxhash64 production variant
    # stays rows-only; semantics are identical by construction).
    t = register_tables(spark, sf_dir)
    return dd.simhash_pairs(
        t["documents"], "doc_id", "text", max_hamming=3, portable=True,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
        # Portable mode folds to 15-bit chunks (32k bucket values), so
        # bucket occupancy grows linearly with corpus size: the sf0.1
        # sweep measured a 1582-doc chunk bucket, over the default 1000
        # cap. 4000 keeps the fail-fast guarantee (it would still trip
        # on a degenerate corpus) while letting the oracle-twin verify
        # at 10x the driver scale.
        max_bucket=4000,
    )


def _simhash_portable_oracle() -> str:
    nbits = dd._PORTABLE_BITS
    votes = ",\n    ".join(
        f"sum((h >> {j}) & 1) AS v{j}" for j in range(nbits)
    )
    fold = "\n      + ".join(
        f"(CASE WHEN 2*v{j} > n THEN (CAST(1 AS BIGINT) << {j})"
        f" ELSE 0 END)"
        for j in range(nbits)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS t
    FROM documents
  )
),
agg AS (
  SELECT doc_id, count(*) AS n,
    {votes}
  FROM tok GROUP BY doc_id
),
sh AS (
  SELECT doc_id,
    {fold}
    AS simhash
  FROM agg
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.quality_score(t["documents"]).select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
        "punct_ratio", "uniq_token_ratio", "quality_score",
    )


def _dd_profile(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_TEXT_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    round(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
          / greatest(len(toks), 1), 4) AS mean_token_len,
    round(len(list_intersect(list_distinct(toks),
              {_dd_profile(tx.LANG_PROFILES["en"])})) * 1.0
          / greatest(len(list_distinct(toks)), 1), 4) AS stopword_ratio,
    round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
          / greatest(length(text), 1), 4) AS punct_ratio,
    round(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 4)
      AS uniq_token_ratio
  FROM t
)
SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, punct_ratio,
       uniq_token_ratio,
       floor(greatest(least(
         0.5 * least(n_tokens / 100.0, 1.0)
         + 0.5 * uniq_token_ratio
         - 0.2 * least(punct_ratio * 5, 1.0), 1.0), 0.0) * 10000 + 0.5) / 10000
         AS quality_score
FROM f
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("predicted", tx.lang_id("text"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _langid_case() -> str:
    langs = list(tx.LANG_PROFILES)
    hit_defs = ",\n    ".join(
        f"len(list_intersect(toks, {_dd_profile(tx.LANG_PROFILES[lang])})) AS h_{lang}"
        for lang in langs
    )
    branches = []
    for lang in langs:
        conds = [f"h_{lang} > 0"] + [
            f"h_{lang} >= h_{o}" for o in langs if o != lang
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT lang,
         list_distinct(list_filter(string_split(lower(text), ' '),
                                   x -> x <> '')) AS toks
  FROM documents
), h AS (
  SELECT lang,
    {hit_defs}
  FROM t
)
SELECT lang, {case} AS predicted, CAST(count(*) AS BIGINT) AS n
FROM h GROUP BY 1, 2
"""


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "source",
            tx.token_count("text").alias("n_tok"),
            F.length("text").alias("len_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.sum("len_chars").alias("total_chars"),
        )
    )


_TOKEN_STATS_ORACLE = """
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 4) AS avg_tokens,
       CAST(sum(len_chars) AS BIGINT) AS total_chars
FROM (
  SELECT source,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok,
         length(text) AS len_chars
  FROM documents
)
GROUP BY source
"""


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.doc_fingerprints(t["documents"])


_FINGERPRINT_ORACLE = """
SELECT doc_id, md5(text) AS fp_exact,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp_normalized
FROM documents
"""


def _q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    out = sim.cosine_topk(t["embeddings"], query_filter="vec_id < 20", k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("cos", 4).alias("cos"),
        F.col("rank").cast("long").alias("rank"),
    )


_SIM_TOPK_ORACLE = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos6
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos6,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos6, 4) AS cos, rank
FROM ranked WHERE rank <= 5
"""


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contrastive hard-negative mining: per query, the top-5 nearest
    # OTHER-label vectors (the near-misses a contrastive trainer needs).
    # Label inequality rides the broadcast-join condition.
    t = register_tables(spark, sf_dir)
    out = sim.hard_negatives(
        t["embeddings"], query_filter="vec_id < 20", k=5
    )
    return out.select(
        "query_id",
        F.col("query_label").cast("long").alias("query_label"),
        "neighbor_id",
        F.col("neighbor_label").cast("long").alias("neighbor_label"),
        F.round("cos", 4).alias("cos"),
        F.col("rank").cast("long").alias("rank"),
    )


_HARD_NEGATIVES_ORACLE = """
WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, CAST(q.label AS BIGINT) AS query_label,
         c.vec_id AS neighbor_id, CAST(c.label AS BIGINT) AS neighbor_label,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos6
  FROM q JOIN c ON q.label <> c.label
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       round(cos6, 4) AS cos, rank
FROM ranked WHERE rank <= 5
"""


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked triangle join: equi-join on a block-pair key (no
    # BroadcastNestedLoopJoin), bit-identical to the naive all-pairs
    # verifier — the exact-at-scale plan for diffuse embeddings whose
    # near-threshold pair mass rules out banded-LSH recall=1.
    t = register_tables(spark, sf_dir)
    return sim.cosine_pairs_blocked(t["embeddings"], threshold=0.4)


def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-level duplicate clustering: blocked-triangle cosine pairs
    # feed the SAME min-label-propagation loop the text path uses
    # (operators/corpus.py connected_components — edge-source agnostic).
    # The oracle derives the identical edge set with
    # list_cosine_similarity and closes it with a recursive CTE.
    from .operators.corpus import connected_components

    t = register_tables(spark, sf_dir)
    pairs = sim.cosine_pairs_blocked(t["embeddings"], threshold=0.4).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return connected_components(pairs, id_col="vec_id").select(
        F.col("vec_id"), F.col("cluster")
    )


_EMB_CLUSTERS_ORACLE = """
WITH RECURSIVE
e0 AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM e0
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM e0
),
reach (id, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS vec_id, min(lab) AS cluster FROM reach GROUP BY id
"""


_EMB_NEARDUP_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def _q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch form of the streaming tumbling-window aggregation (§2.7
    # extension); day windows align with date_trunc so the oracle is SQL.
    t = register_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_ts"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_WINDOWED_EVENTS_ORACLE = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS window_start_ts,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def _q_split_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.examplegen import route_split_patterns

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


def _q_pit_prefixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1 full_feature_names: outputs prefixed view__feature columns.
    register_tables(spark, sf_dir)
    df = materialize_features(
        spark,
        entity_query=_SPINE_SQL,
        features=["user_events:value", "user_events:event_type"],
        registry=testdata_registry(),
        sf_dir=sf_dir,
        full_feature_names=True,
    )
    return df.select(
        F.col("user_id"),
        F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
        F.col("user_events__value"),
        F.col("user_events__event_type"),
    )


_PIT_PREFIXED_ORACLE = _pit_oracle().replace(
    "c.value, c.event_type", "c.value AS user_events__value, c.event_type AS user_events__event_type"
)


def _q_dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.stats import column_stats

    t = register_tables(spark, sf_dir)
    return column_stats(
        t["lineitem"],
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"],
    )


def _stats_oracle() -> str:
    def one(col: str, numeric: bool) -> str:
        mean = f"round(avg({col}), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        std = f"round(stddev_samp({col}), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        return f"""
SELECT '{col}' AS "column", CAST(count({col}) AS BIGINT) AS count,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS min_val,
       CAST(max({col}) AS VARCHAR) AS max_val,
       {mean} AS mean_val, {std} AS stddev_val
FROM lineitem"""

    parts = [
        one("l_orderkey", True),
        one("l_quantity", True),
        one("l_extendedprice", True),
        one("l_returnflag", False),
        one("l_shipdate", False),
    ]
    return "\nUNION ALL\n".join(parts)


def _q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog++ sketches: the 100 TB path for distinct counting —
    # constant memory per group vs countDistinct's exact shuffle. Sketch
    # estimates aren't bit-portable across engines, so the oracle-checked
    # contract is the ERROR BOUND, not the estimate: emit the exact
    # counts (portable) plus a boolean per sketch asserting the estimate
    # lies within 3x the configured rsd (0.02); the oracle emits the same
    # exact counts with literal TRUE. A sketch drifting out of its
    # accuracy contract hash-mismatches and turns the row red.
    t = register_tables(spark, sf_dir)
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("__ao"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__ap"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    def in_bound(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.col(exact).cast("double") * 0.06
        )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        in_bound("__ao", "exact_orders").alias("orders_in_bound"),
        in_bound("__ap", "exact_parts").alias("parts_in_bound"),
    )


_SKETCH_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS orders_in_bound,
       TRUE AS parts_in_bound
FROM lineitem GROUP BY l_returnflag
"""


def _q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable quantile sketches (percentile_approx, Greenwald-Khanna
    # style): the 100 TB alternative to exact ordered-set aggregates.
    # Same bound-as-contract oracle as sketch_distinct_counts: at
    # accuracy=1000 the rank error is 0.1%, so the approx p50/p90 must
    # land between the exact 45th/55th (resp. 85th/95th) percentiles — a
    # 50x margin. Output carries the exact interpolated percentiles
    # (identical (n-1)*q arithmetic in both engines) plus the in-bracket
    # booleans; the oracle emits TRUE.
    t = register_tables(spark, sf_dir)
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("__a50"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("__a90"),
        F.expr(
            "percentile(l_extendedprice, array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))"
        ).alias("__ex"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("__ex")[1], 4).alias("exact_p50"),
        F.round(F.col("__ex")[4], 4).alias("exact_p90"),
        F.col("__a50").between(F.col("__ex")[0], F.col("__ex")[2]).alias(
            "p50_in_bound"
        ),
        F.col("__a90").between(F.col("__ex")[3], F.col("__ex")[5]).alias(
            "p90_in_bound"
        ),
    )


_SKETCH_QUANTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
       TRUE AS p50_in_bound,
       TRUE AS p90_in_bound
FROM lineitem GROUP BY l_returnflag
"""


def _q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Subword-ish token budget per source. The token pattern uses explicit
    # ASCII classes (text.BPE_ISH_TOKEN_PATTERN) so the identical regex
    # runs under Java regex (Spark) and RE2 (DuckDB) -> oracle-checked.
    t = register_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("source", tx.bpe_ish_token_count("text").alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 2).alias("avg_bpe_tokens"),
        )
    )


_BPE_TOKENS_ORACLE = r"""
WITH b AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z_]+|[0-9]|[^A-Za-z0-9_ \t\n\r]'))
           AS n_bpe
  FROM documents
)
SELECT source, CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       round(avg(n_bpe), 2) AS avg_bpe_tokens
FROM b GROUP BY source
"""


def _q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flagship composite: quality gate -> exact dedup -> near-dup removal
    # as ONE composed Catalyst plan (operators/corpus.py). LSH generates
    # near-dup candidates; the oracle recomputes the identical survivor
    # set with exact SQL (LSH recall is ~1 at the fixture's similarity
    # levels, and verification thresholds exactly).
    from .operators.corpus import prepare_corpus

    t = register_tables(spark, sf_dir)
    kept = prepare_corpus(
        t["documents"], min_quality=0.35, jaccard_threshold=0.5
    )
    return kept.select("doc_id", "quality_score")


def _corpus_prep_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
q AS (
  SELECT d.doc_id, d.text, tq.quality_score
  FROM documents d JOIN tq ON tq.doc_id = d.doc_id
  WHERE tq.quality_score >= 0.35
),
canon AS (SELECT min(doc_id) AS keep_id FROM q GROUP BY md5(text)),
kept AS (SELECT q.* FROM q WHERE q.doc_id IN (SELECT keep_id FROM canon)),
t2 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM kept),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t2, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
)
SELECT doc_id, quality_score FROM kept k
WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_b = k.doc_id)
"""


def _q_scoped_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Provenance-scoped dedup: containment pairs where both docs SHARE a
    # source — the bucket join simply gains the scope column as an extra
    # equi-key (bucket_cols=["source","shingle"] via a composed id), so
    # cross-source pairs never even become candidates. The common policy
    # "dedup within a crawl, never across crawls" costs zero extra plan.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    # compose (source, doc_id) into the shingle stream by prefixing the
    # text-derived shingles with the source via a scoped frame
    sh = dd.shingles(docs, "doc_id", "text", 3, hashed=True)
    src = docs.select("doc_id", "source")
    scoped = sh.join(src, "doc_id")
    sizes = scoped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    pairs = (
        dd._bucket_pairs(
            scoped, ["source", "shingle"], "doc_id",
            max_size=1000, on_over_cap="error",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    cont = F.col("common") / F.least(F.col("na"), F.col("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(cont >= 0.3)
        .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
    )


_SCOPED_CONTAINMENT_ORACLE = """
WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b
    ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.3
"""


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Asymmetric near-dup: a short doc quoted inside a long one. Same
    # bucket-explode plan as jaccard_pairs, min-size denominator.
    t = register_tables(spark, sf_dir)
    return dd.containment_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.8,
        on_over_cap="error",  # gated by the uncapped oracle — no silent drops
    )


_CONTAINMENT_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.8
"""


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Connected components over the near-dup graph (distributed min-label
    # propagation, operators/corpus.py). Edges are LSH candidates
    # exact-verified at the threshold, so the oracle's exact-Jaccard edge
    # set is identical; the oracle derives components independently via a
    # recursive transitive-closure CTE instead of label propagation.
    from .operators.corpus import duplicate_clusters

    t = register_tables(spark, sf_dir)
    return duplicate_clusters(
        t["documents"], jaccard_threshold=0.5, ngram=3
    )


_DEDUP_CLUSTERS_ORACLE = """
WITH RECURSIVE
t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e0 AS (
  SELECT doc_a, doc_b
  FROM prs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM e0
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM e0
),
reach (id, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS doc_id, min(lab) AS cluster FROM reach GROUP BY id
"""


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental ingest dedup: a "new batch" (every 10th doc) matched
    # against the standing corpus (the rest) via the cross-corpus LSH
    # join. LSH recall is ~1 at the fixture's planted similarity levels
    # (see _q_minhash), so the exact cross-partition Jaccard oracle
    # applies.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return dd.minhash_lsh_join(
        batch, corpus, "doc_id", "text", n=3, threshold=0.5
    )


_DEDUP_INCREMENTAL_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (sa.nsh + sb.nsh - common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
"""


def _q_dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The amortized form of dedup_incremental: corpus band/shingle/size
    # artifacts materialized once (write_minhash_index), the batch joined
    # against the stored index. Output is bit-identical to the direct
    # join, so the same exact cross-partition oracle applies.
    import tempfile as _tempfile

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = _tempfile.mkdtemp(prefix="minhash_index_")
    dd.write_minhash_index(corpus, idx, "doc_id", "text", n=3, target_files=4)
    return dd.minhash_lsh_join_indexed(
        batch, idx, "doc_id", "text", n=3, threshold=0.5
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-weighted resampling: keep-probability = the document's
    # quality score, decided by the portable key fingerprint (no RNG) so
    # the oracle replays the selection exactly.
    from .operators.curation import weighted_sample

    t = register_tables(spark, sf_dir)
    scored = tx.quality_score(t["documents"])
    return weighted_sample(scored, "doc_id", "quality_score").select(
        "doc_id", "quality_score"
    )


def _weighted_sample_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE})
SELECT doc_id, quality_score FROM tq
WHERE ((doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10000
      < floor(greatest(least(quality_score, 1.0), 0.0) * 10000 + 0.5)
"""


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return tx.tfidf_top_terms(t["documents"], "doc_id", "text", k=3)


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok2 GROUP BY 1
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.doc_freq,
         round(t.tf * ln(n.n_docs * 1.0 / d.doc_freq), 4) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, tfidf FROM ranked WHERE rn <= 3
"""


def _q_training_dataset_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full corpus -> training-sequences composition in ONE Catalyst
    # plan: quality gate -> exact dedup -> LSH near-dup removal
    # (prepare_corpus) -> RAG chunking -> per-source sequence packing at
    # a 512-token budget. Every stage is an engine operator; the oracle
    # re-derives the whole pipeline in SQL from first principles.
    from .operators.corpus import prepare_corpus
    from .operators.curation import pack_sequences

    t = register_tables(spark, sf_dir)
    kept = prepare_corpus(
        t["documents"], min_quality=0.35, jaccard_threshold=0.5
    )
    chunks = tx.chunk_documents(
        kept, "doc_id", "text", chunk_tokens=64, stride=32
    ).join(kept.select("doc_id", "source"), "doc_id")
    # composite chunk key: document order, then chunk order within it
    chunks = chunks.withColumn(
        "cid", F.col("doc_id") * 100000 + F.col("chunk_idx")
    )
    packed = pack_sequences(
        chunks,
        group_col="source",
        id_col="cid",
        token_col="n_tokens",
        budget=512,
    )
    return packed.select(
        "doc_id",
        "chunk_idx",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "pack_id",
        "pack_offset",
    )


def _training_dataset_oracle() -> str:
    return f"""
WITH tq AS ({_TEXT_QUALITY_ORACLE}),
q AS (
  SELECT d.doc_id, d.source, d.text, tq.quality_score
  FROM documents d JOIN tq ON tq.doc_id = d.doc_id
  WHERE tq.quality_score >= 0.35
),
canon AS (SELECT min(doc_id) AS keep_id FROM q GROUP BY md5(text)),
kept0 AS (SELECT q.* FROM q WHERE q.doc_id IN (SELECT keep_id FROM canon)),
t2 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM kept0),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t2, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_a, doc_b
  FROM prs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.nsh + sb.nsh - common) >= 0.5
),
kept AS (
  SELECT * FROM kept0 k
  WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_b = k.doc_id)
),
tk AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM kept
),
c AS (
  SELECT doc_id, source, CAST(s // 32 AS INT) AS chunk_idx,
         toks[s + 1 : s + 64] AS w
  FROM tk, LATERAL (
    SELECT unnest(generate_series(0, greatest(len(toks) - 64 + 32 - 1, 0), 32)) AS s
  )
),
ch AS (
  SELECT doc_id, source, chunk_idx, CAST(len(w) AS BIGINT) AS n_tokens,
         doc_id * 100000 + chunk_idx AS cid
  FROM c WHERE len(w) > 0
),
p AS (
  SELECT doc_id, chunk_idx, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY cid
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start
  FROM ch
)
SELECT doc_id, chunk_idx, source, n_tokens,
       CAST(floor(start / 512) AS BIGINT) AS pack_id,
       CAST(start % 512 AS BIGINT) AS pack_offset
FROM p
"""


def _q_sessionization_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The stateful applyInPandasWithState sessionizer, driven to
    # completion over time-sliced micro-batches — ORACLE-CHECKED via the
    # sentinel-watermark technique: a final one-event micro-batch (user
    # -1, ts = max + 4h) advances the watermark past every real
    # session's (end + gap), so the no-data batch that follows finalizes
    # ALL sessions and bounded replay equals batch sessionization
    # exactly. The sentinel's own session stays pending (its end + gap
    # is above the final watermark) and is filtered defensively.
    import os as _os
    import tempfile
    import time as _time

    from pyspark.sql import functions as F2

    from .session import load_table
    from .streaming.events import read_events_stream, run_to_completion
    from .streaming.sessions import sessionize_stream

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="sessionize_stream_") + "/ev"
    mid = "2024-01-16 00:00:00"
    sentinel = (
        ev.orderBy(F2.desc("ts"))
        .limit(1)
        .select(
            *[
                (F2.col("ts") + F2.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F2.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F2.col(c)
                for c in ev.columns
            ]
        )
    )
    slices = [
        ev.filter(F2.col("ts") < mid),
        ev.filter(F2.col("ts") >= mid),
        sentinel,
    ]
    # The file stream orders batches by mtime; stamp each slice's files
    # with explicit increasing mtimes instead of sleeping between writes.
    base = _time.time() - 60
    stamped: set[str] = set()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        for fname in _os.listdir(src):
            p = _os.path.join(src, fname)
            if p not in stamped:
                _os.utime(p, (base + 10 * i, base + 10 * i))
                stamped.add(p)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 hour"),
        query_name="q_sessionization_streaming",
    )
    return out.filter(F2.col("user_id") >= 0).select(
        "user_id",
        F2.unix_timestamp("session_start").alias("session_start_ts"),
        F2.unix_timestamp("session_end").alias("session_end_ts"),
        "n_events",
    )


def _q_stream_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second custom stateful operator (CEP-lite pattern matching): each
    # 'error' event matches its EARLIEST 'purchase' within 30 min, or
    # reports recovered=false once the deadline passes the watermark.
    # Same sentinel-watermark full-replay technique as the streaming
    # sessionizer: a far-future sentinel event advances the watermark
    # past every real deadline, so bounded replay finalizes everything
    # and equals the batch per-error min-purchase lookup exactly.
    import os as _os
    import tempfile
    import time as _time

    from .session import load_table
    from .streaming.events import read_events_stream, run_to_completion
    from .streaming.patterns import match_recovery_stream

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="recovery_stream_") + "/ev"
    mid = "2024-01-16 00:00:00"
    sentinel = (
        ev.orderBy(F.desc("ts"))
        .limit(1)
        .select(
            *[
                (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F.col(c)
                for c in ev.columns
            ]
        )
    )
    slices = [
        ev.filter(F.col("ts") < mid),
        ev.filter(F.col("ts") >= mid),
        sentinel,
    ]
    base = _time.time() - 60
    stamped: set[str] = set()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        for fname in _os.listdir(src):
            p = _os.path.join(src, fname)
            if p not in stamped:
                _os.utime(p, (base + 10 * i, base + 10 * i))
                stamped.add(p)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        match_recovery_stream(
            stream, timeout_seconds=1800, watermark_delay="1 hour"
        ),
        query_name="q_stream_error_recovery",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.unix_micros("error_ts").alias("error_us"),
        F.unix_micros("recovery_ts").alias("recovery_us"),
        "recovered",
    )


_STREAM_RECOVERY_ORACLE = """
WITH err AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
),
pur AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id,
       epoch_us(e.ts) AS error_us,
       epoch_us(min(p.pts)) AS recovery_us,
       min(p.pts) IS NOT NULL AS recovered
FROM err e LEFT JOIN pur p
  ON p.user_id = e.user_id
 AND p.pts > e.ts
 AND epoch_us(p.pts) <= epoch_us(e.ts) + 1800000000
GROUP BY e.user_id, e.ts
"""


_SESSIONIZATION_STREAM_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_ts,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


def _q_windowed_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming path made hash-checkable: a tumbling-window aggregate
    # run as a real Structured Streaming query (file source, availableNow)
    # in COMPLETE output mode — over bounded input the final state equals
    # the batch aggregation bit-for-bit, so the SAME daily-counts oracle
    # applies. (Append-mode queries stay rows-only: their emission set
    # depends on the final watermark.)
    import os as _os
    import uuid as _uuid

    from .streaming.events import (
        read_events_stream,
        run_to_completion,
        windowed_event_counts,
    )

    register_tables(spark, sf_dir)
    stream = read_events_stream(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    out = run_to_completion(
        windowed_event_counts(stream, watermark_delay="1 hour"),
        output_mode="complete",
        query_name=f"wec_stream_{_uuid.uuid4().hex[:8]}",
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_ts"),
        "event_type",
        "n_events",
        "total_value",
    )


def _q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Salted skew-join: physically spreads any hot l_suppkey over 8
    # reducers (positional salt on the big side, replicated small side)
    # while producing a row-identical result — so the oracle is simply
    # the PLAIN join+aggregate, proving the rewrite is semantics-free.
    from .operators.skew import salted_join

    t = register_tables(spark, sf_dir)
    li = t["lineitem"].select("l_suppkey", "l_extendedprice")
    sup = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, sup, ["l_suppkey"], n_salts=8)
    # exact integer cents -> order-free sum (see the Q10 comment)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(cents).cast("double") / 100.0, 2).alias("revenue"),
    )


_SKEW_SALTED_JOIN_ORACLE = """
SELECT s.s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       round(CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
"""


def _q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z-order (Morton) clustering key, oracle-checked: the bit-interleave
    # is pure shift/mask integer arithmetic, so DuckDB replays it exactly.
    # Rows are bucketed by the key's high bits (the file-boundary analog)
    # and each bucket reports its min-max footprint in BOTH dimensions —
    # the stats a parquet footer would carry and the reader would prune
    # on. compact hypercube buckets instead of one-dimensional stripes.
    from .operators.layout import zorder_key

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


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming exactly-once dedup (dropDuplicatesWithinWatermark) made
    # hash-checkable: the event stream is UNIONED WITH ITSELF so every
    # row arrives exactly twice, then deduped on event_id inside the
    # streaming query. The injected duplicates are bit-identical rows, so
    # which copy survives is irrelevant (no arrival-order sensitivity),
    # and a post-dedup aggregate equals the plain batch aggregate — while
    # a dedup failure would double every count. Append mode: dedup emits
    # each first-seen row immediately, so bounded replay is complete
    # without sentinel tricks.
    import os as _os
    import uuid as _uuid

    from .streaming.events import (
        dedup_events_stream,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    path = _os.path.join(sf_dir, "events.parquet")
    doubled = read_events_stream(spark, path).union(
        read_events_stream(spark, path)
    )
    deduped = dedup_events_stream(doubled, watermark_delay="1 hour")
    out = run_to_completion(
        deduped,
        output_mode="append",
        query_name=f"dedup_stream_{_uuid.uuid4().hex[:8]}",
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(cents).cast("double") / 100.0, 2).alias("total_value"),
    )


def _q_streaming_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming materialized-view maintenance: the event stream arrives
    # as micro-batches (4-file source, one file per trigger) and each
    # batch folds into a versioned parquet serving table via
    # latest-wins merge — union(previous state, batch) -> one row per
    # user, newest (ts, event_id) wins. The fold is ORDER-INDEPENDENT
    # (max is associative/commutative over batches), so the final state
    # equals the batch latest-per-user answer no matter how the file
    # source slices or orders the input — which is the property that
    # makes the pattern safe under redelivery. Full oracle: plain
    # latest-per-user SQL over the whole table.
    import os as _os
    import tempfile as _tempfile

    t = register_tables(spark, sf_dir)
    src = _tempfile.mkdtemp(prefix="mv_src_")
    t["events"].select(
        "user_id", "ts", "value", "event_id"
    ).repartition(4).write.mode("overwrite").parquet(src)
    state_root = _tempfile.mkdtemp(prefix="mv_state_")
    versions: list[str] = []

    def _fold(batch_df, batch_id):
        latest_b = (
            batch_df.groupBy("user_id")
            .agg(
                F.max(F.struct("ts", "event_id", "value")).alias("s")
            )
            .select("user_id", "s.ts", "s.event_id", "s.value")
        )
        merged = latest_b
        if versions:
            prev = batch_df.sparkSession.read.parquet(versions[-1])
            merged = (
                prev.unionByName(latest_b)
                .groupBy("user_id")
                .agg(
                    F.max(F.struct("ts", "event_id", "value")).alias("s")
                )
                .select("user_id", "s.ts", "s.event_id", "s.value")
            )
        out = _os.path.join(state_root, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        versions.append(out)

    q = (
        spark.readStream.schema("user_id long, ts timestamp, value double,"
                                " event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_fold)
        .option(
            "checkpointLocation", _os.path.join(state_root, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(versions[-1])
    return final.select(
        "user_id",
        F.col("ts").alias("state_ts"),
        "event_id",
        F.round("value", 2).alias("value"),
    )


_STREAMING_MATVIEW_ORACLE = """
SELECT user_id, ts AS state_ts, event_id, round(value, 2) AS value
FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


_STREAM_DEDUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS total_value
FROM events GROUP BY event_type
"""


def _q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The int-code array is serialized to a '|'-joined scalar for the
    # harness: array cells break pandas-based canonicalizers (unhashable
    # list), and the joined string compares the same values. The operator
    # itself keeps the real array<int> output.
    t = register_tables(spark, sf_dir)
    q = sim.quantize_embeddings(t["embeddings"], "vec_id", "embedding")
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("q_embedding").cast("array<string>"), "|").alias(
            "q_embedding"
        ),
    )


# Element floats are widened to double on BOTH sides before any
# arithmetic (float->double widening is exact), so scale and codes are
# bit-identical across engines.
_EMB_QUANT_ORACLE = """
WITH s AS (
  SELECT vec_id, embedding,
         list_aggregate(
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'
         ) AS sc
  FROM embeddings
)
SELECT vec_id, round(sc, 6) AS scale,
       array_to_string(list_transform(embedding, x ->
         CASE WHEN sc = 0 THEN 0
              ELSE CAST(round(CAST(x AS DOUBLE) / sc * 127) AS INT) END
       ), '|') AS q_embedding
FROM s
"""


# Event funnel: per-user earliest view -> click after it -> purchase
# after that, counted corpus-wide. min(CASE...) conditional aggregates +
# one self-free pass over events; identical text runs on both engines.
_QFUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_any
  FROM events GROUP BY user_id
),
steps AS (
  SELECT user_id,
         CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN t_view IS NOT NULL AND t_click_any > t_view
              THEN 1 ELSE 0 END AS s2,
         CASE WHEN t_view IS NOT NULL AND t_click_any > t_view
                   AND t_buy_any > t_click_any
              THEN 1 ELSE 0 END AS s3
  FROM per_user
)
SELECT CAST(sum(s1) AS BIGINT) AS n_viewed,
       CAST(sum(s2) AS BIGINT) AS n_clicked_after_view,
       CAST(sum(s3) AS BIGINT) AS n_full_funnel
FROM steps
"""


# Pearson correlations between lineitem measures: corr() exists in both
# engines with the same definition; rounded to 3 decimals to absorb
# summation-order ulps.
_QCORR = """
SELECT round(corr(l_quantity, l_extendedprice), 3) AS corr_qty_price,
       round(corr(l_extendedprice, l_discount), 3) AS corr_price_discount,
       round(corr(l_quantity, l_discount), 3) AS corr_qty_discount
FROM lineitem
"""


def _q_event_funnel_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Strictly-ordered view -> click -> purchase funnel as ONE shuffle:
    # the conditional-min step times per user are a single hash
    # aggregate (map-side partials), and the three step counts reduce
    # that tiny per-user frame to one row. No window, no self-join —
    # the classic funnel-by-n-self-joins shape would shuffle the events
    # table three times at 100 TB.
    t = register_tables(spark, sf_dir)
    per_user = t["events"].groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == name, F.col("ts"))).alias(a)
            for name, a in (
                ("view", "t_view"),
                ("click", "t_click_any"),
                ("purchase", "t_buy_any"),
            )
        ]
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click_any") > F.col("t_view"))
    bought = clicked & (F.col("t_buy_any") > F.col("t_click_any"))
    step = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return per_user.agg(
        F.sum(step(viewed)).cast("long").alias("n_viewed"),
        F.sum(step(clicked)).cast("long").alias("n_clicked_after_view"),
        F.sum(step(bought)).cast("long").alias("n_full_funnel"),
    )


def _q_column_correlations_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pearson correlations over three measure pairs in one pass:
    # corr() is an algebraic aggregate (co-moment partials), so the
    # whole query is a single map-side-combined scan with a 1-row
    # reduce — nothing to optimize further at any scale.
    t = register_tables(spark, sf_dir)
    return t["lineitem"].agg(
        *[
            F.round(F.corr(x, y), 3).alias(a)
            for x, y, a in (
                ("l_quantity", "l_extendedprice", "corr_qty_price"),
                ("l_extendedprice", "l_discount", "corr_price_discount"),
                ("l_quantity", "l_discount", "corr_qty_discount"),
            )
        ]
    )


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RAG-style chunking: overlapping 64-token windows every 32 tokens,
    # generated as a pure flat-map (no shuffle) over the scan.
    t = register_tables(spark, sf_dir)
    return tx.chunk_documents(
        t["documents"], "doc_id", "text", chunk_tokens=64, stride=32
    )


_CHUNK_DOCUMENTS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, CAST(s // 32 AS INT) AS chunk_idx,
         toks[s + 1 : s + 64] AS w
  FROM t, LATERAL (
    SELECT unnest(generate_series(0, greatest(len(toks) - 64 + 32 - 1, 0), 32)) AS s
  )
)
SELECT doc_id, chunk_idx, array_to_string(w, ' ') AS chunk_text,
       CAST(len(w) AS INT) AS n_tokens
FROM c WHERE len(w) > 0
"""


def _q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic negatives: 2 never-purchased parts per customer,
    # drawn from the customer's fingerprint bucket (equi-join, no cross
    # join) and ranked by a pairwise fingerprint — RNG-free, so the
    # oracle replays the identical sample.
    from .operators.curation import negative_sample

    t = register_tables(spark, sf_dir)
    interactions = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
    )
    return negative_sample(
        t["customer"],
        t["part"],
        interactions,
        user_col="c_custkey",
        item_col="p_partkey",
        k=2,
        n_buckets=16,
    )


_NEGATIVE_SAMPLE_ORACLE = """
WITH u AS (
  SELECT c_custkey,
         ((c_custkey * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 16 AS b
  FROM customer
),
i AS (
  SELECT p_partkey,
         ((p_partkey * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 16 AS b
  FROM part
),
inter AS (
  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
negs AS (
  SELECT u.c_custkey, i.p_partkey
  FROM u JOIN i USING (b)
  WHERE NOT EXISTS (
    SELECT 1 FROM inter
    WHERE inter.c_custkey = u.c_custkey
      AND inter.p_partkey = i.p_partkey
  )
),
ranked AS (
  SELECT c_custkey, p_partkey,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY ((c_custkey * 31 + p_partkey) * 2654435761)
                      % 2147483648 % 1073741824,
                    p_partkey
         ) AS rank
  FROM negs
)
SELECT c_custkey, p_partkey, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 2
"""


def _q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Forward-fill over a dense calendar: days with no purchases carry
    # the last observed daily average (IGNORE NULLS running window) —
    # the other half of time-series completion next to gap_fill's
    # zero-fill. Sparse day selection (WHERE pmod(day(ts), 3) = 0)
    # guarantees real gaps to fill at every scale factor.
    register_tables(spark, sf_dir)
    return spark.sql("""
        WITH days AS (
          SELECT explode(sequence(DATE '2024-01-01', DATE '2024-02-10',
                                  INTERVAL 1 DAY)) AS d
        ),
        rev AS (
          SELECT CAST(ts AS DATE) AS d, round(avg(value), 2) AS avg_value
          FROM events
          WHERE event_type = 'purchase' AND pmod(day(ts), 3) = 0
          GROUP BY CAST(ts AS DATE)
        )
        SELECT CAST(unix_timestamp(CAST(days.d AS TIMESTAMP)) AS BIGINT)
                 AS day_ts,
               last_value(rev.avg_value) IGNORE NULLS OVER (
                 ORDER BY days.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM days LEFT JOIN rev ON rev.d = days.d
    """)


_FORWARD_FILL_ORACLE = """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-02-10',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
rev AS (
  SELECT CAST(ts AS DATE) AS d, round(avg(value), 2) AS avg_value
  FROM events
  WHERE event_type = 'purchase' AND day(ts) % 3 = 0
  GROUP BY CAST(ts AS DATE)
)
SELECT CAST(epoch(CAST(days.d AS TIMESTAMP)) AS BIGINT) AS day_ts,
       last_value(rev.avg_value IGNORE NULLS) OVER (
         ORDER BY days.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM days LEFT JOIN rev ON rev.d = days.d
"""


# Array aggregation with deterministic ordering: collect_list /
# list() have engine-defined order, so both sides sort the collected
# array before emitting (the portable form of ARRAY_AGG ... ORDER BY).
# The sorted array is serialized to a '|'-joined scalar so the result
# frame holds only hashable columns (array cells break pandas-based
# canonicalizers); the values compared are identical either way.
_QARRAY_AGG = """
SELECT r.r_name,
       concat_ws('|', sort_array(collect_list(n.n_name))) AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

_QARRAY_AGG_ORACLE = """
SELECT r.r_name,
       array_to_string(list_sort(list(n.n_name)), '|') AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


# EXCEPT set operation (the INTERSECT sibling of setop_intersect):
# customers who have never hit an error event.
_QEXCEPT = """
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id AS c_custkey FROM events WHERE event_type = 'error'
"""


# SCD2-style validity intervals: each purchase's value holds from its
# event time until the key's next purchase (NULL = still current) — the
# history-table form that makes any point-in-time state reconstructable
# with a BETWEEN probe (the batch complement of latest_feature_snapshot).
_QSCD2 = """
SELECT user_id, event_id, value,
       CAST(floor(epoch(vf)) AS BIGINT) AS valid_from_ts,
       CAST(floor(epoch(vt)) AS BIGINT) AS valid_to_ts
FROM (
  SELECT user_id, event_id, round(value, 2) AS value, ts AS vf,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM events WHERE event_type = 'purchase'
)
"""

_QSCD2_SPARK = _QSCD2.replace(
    "CAST(floor(epoch(vf)) AS BIGINT)", "unix_timestamp(vf)"
).replace("CAST(floor(epoch(vt)) AS BIGINT)", "unix_timestamp(vt)")


# Correlated LATERAL subquery with per-key ORDER BY + LIMIT: the SQL-level
# form of top-k-per-group (the DataFrame form is operators/curation.py's
# group_quota / WindowGroupLimit). Identical text runs on both engines.
_QLATERAL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_mktsegment = 'BUILDING'
"""


def _q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF surface (SURVEY §2.8): one doc row -> N sentence rows
    # via a registered table function called through SQL LATERAL. The
    # oracle replays the identical split rule in pure SQL — proving the
    # UDTF's output, and demonstrating that this logic COULD stay
    # JVM-side (the UDTF exists to exercise the plug surface).
    from .functions.udtfs import register_udtfs

    register_tables(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM documents d, LATERAL split_sentences(d.text) s
        """
    )


_UDTF_SENTENCES_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[.!?]+ +'), x -> x <> '')
           AS parts
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS sent_idx, parts[i] AS sentence,
       CAST(length(parts[i]) AS INT) AS n_chars
FROM s, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i)
"""


def _q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Left-outer stream-stream join: purchases with NO qualifying click
    # emit null click columns — but only once the watermark proves no
    # match can still arrive. Sentinel rows on BOTH sides (user -1,
    # ts = max + 4h, one per event_type so each survives its side's
    # filter) push the final watermark past every join window, so
    # bounded replay equals the batch LEFT JOIN exactly.
    import os as _os
    import tempfile as _tempfile

    from .session import load_table
    from .streaming.events import (
        interval_join_streams,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    sentinels = (
        ev.orderBy(F.desc("ts"))
        .limit(1)
        .crossJoin(
            spark.createDataFrame(
                [("purchase",), ("click",)], "sentinel_type string"
            )
        )
        .select(
            *[
                (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts")
                if c == "ts"
                else F.lit(-1).cast("long").alias(c)
                if c == "user_id"
                else F.col("sentinel_type").alias(c)
                if c == "event_type"
                else F.col(c)
                for c in ev.columns
            ]
        )
    )
    src = _tempfile.mkdtemp(prefix="ssj_left_") + "/ev"
    ev.unionByName(sentinels).coalesce(2).write.parquet(src)
    purchases = read_events_stream(spark, src).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, src).filter(
        F.col("event_type") == "click"
    )
    out = run_to_completion(
        interval_join_streams(
            purchases, clicks, lookback="1 hour", how="left_outer"
        ),
        query_name=f"ssjl_{_os.path.basename(src) or 'q'}",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.unix_timestamp("l_ts").alias("purchase_ts"),
        F.unix_timestamp("r_ts").alias("click_ts"),
        F.round("l_value", 2).alias("purchase_value"),
    )


def _q_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-static join: each micro-batch of events enriched with the
    # customer dimension (joined per batch, no watermark/state — the
    # static side is fixed for the query's lifetime). Bounded replay is
    # trivially the batch join, which the oracle runs.
    import os as _os
    import uuid as _uuid

    from .streaming.events import (
        enrich_stream_with_dim,
        read_events_stream,
        run_to_completion,
    )

    t = register_tables(spark, sf_dir)
    stream = read_events_stream(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    enriched = enrich_stream_with_dim(
        stream,
        t["customer"],
        stream_key="user_id",
        dim_key="c_custkey",
        dim_cols=["c_mktsegment", "c_nationkey"],
        how="inner",
    )
    out = run_to_completion(
        enriched, query_name=f"enrich_{_uuid.uuid4().hex[:8]}"
    )
    return (
        out.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_STREAM_STATIC_ENRICH_ORACLE = """
SELECT c.c_mktsegment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment, e.event_type
"""


_STREAM_STREAM_LEFT_JOIN_ORACLE = """
SELECT a.user_id,
       a.event_id AS purchase_id,
       b.event_id AS click_id,
       CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(b.ts)) AS BIGINT) AS click_ts,
       round(a.value, 2) AS purchase_value
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.event_type = 'click'
 AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
WHERE a.event_type = 'purchase'
"""


def _q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Source-format dispatch proven by round-trip identity: documents ->
    # JSONL on disk -> schema'd JSON reader -> aggregate. The oracle runs
    # the same aggregate on the original parquet, so any loss in the
    # JSONL writer/reader (escaping, nulls, unicode) breaks the hash.
    import tempfile as _tempfile

    from .sources.ingest import FORMAT_JSONL, read_corpus, write_corpus

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

    from .sources.ingest import (
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

    from .sources.ingest import FORMAT_ORC, read_corpus, write_corpus

    t = register_tables(spark, sf_dir)
    path = _tempfile.mkdtemp(prefix="ingest_orc_") + "/documents"
    write_corpus(t["documents"], path, source_format=FORMAT_ORC)
    back = read_corpus(spark, path, source_format=FORMAT_ORC)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.count_distinct("doc_id").alias("n_ids"),
    )


def _q_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MAP-typed surface: the JSON props column parsed as map<string,int>
    # (not a fixed struct), keys exploded, aggregated per key — the
    # schema-on-read path for open-ended event properties.
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT k AS prop_key,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(v) AS BIGINT) AS value_sum,
               CAST(min(v) AS BIGINT) AS value_min,
               CAST(max(v) AS BIGINT) AS value_max
        FROM (
          SELECT explode(from_json(props, 'map<string,int>')) AS (k, v)
          FROM events
        )
        GROUP BY k
    """)


_PROPS_MAP_ORACLE = """
SELECT k AS prop_key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v) AS BIGINT) AS value_sum,
       CAST(min(v) AS BIGINT) AS value_min,
       CAST(max(v) AS BIGINT) AS value_max
FROM (
  SELECT unnest(json_keys(props)) AS k,
         CAST(json_extract(props, '$.' || unnest(json_keys(props)))
              AS BIGINT) AS v
  FROM events
)
GROUP BY k
"""


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

    from .operators.split import hash_split
    from .sources.examplegen import encode_examples
    from .sources.tfrecord import (
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

    from .sources.ingest import FORMAT_CSV, read_corpus, write_corpus

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


def _q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-stream interval join run as a real Structured Streaming
    # query: purchases attributed to same-user clicks within the
    # preceding hour. Inner-join matches emit independently of the final
    # watermark (it only gates state eviction), so bounded-input replay
    # equals the batch interval join and the SQL oracle applies.
    import os as _os
    import uuid as _uuid

    from .streaming.events import (
        interval_join_streams,
        read_events_stream,
        run_to_completion,
    )

    register_tables(spark, sf_dir)
    path = _os.path.join(sf_dir, "events.parquet")
    purchases = read_events_stream(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, path).filter(
        F.col("event_type") == "click"
    )
    out = run_to_completion(
        interval_join_streams(purchases, clicks, lookback="1 hour"),
        query_name=f"ssj_{_uuid.uuid4().hex[:8]}",
    )
    return out.select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.unix_timestamp("l_ts").alias("purchase_ts"),
        F.unix_timestamp("r_ts").alias("click_ts"),
        F.round("l_value", 2).alias("purchase_value"),
    )


_STREAM_STREAM_JOIN_ORACLE = """
SELECT a.user_id,
       a.event_id AS purchase_id,
       b.event_id AS click_id,
       CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(b.ts)) AS BIGINT) AS click_ts,
       round(a.value, 2) AS purchase_value
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
WHERE a.event_type = 'purchase' AND b.event_type = 'click'
"""


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL multimodal decode, fully oracle-checked: real 24-bit BMP
    # containers are synthesized per document (closed-form pixel values
    # derived from doc_id), then decoded back by a pure-stdlib BMP parser
    # (header offsets, row padding, BGR order) inside an Arrow-batched
    # mapInPandas stage. The oracle re-derives the same integer channel
    # stats from the pixel formula alone — the decoder must parse the
    # container bit-exactly for the hashes to meet. Compressed formats
    # (JPEG/MP3) stay behind the StubImageCodec boundary.
    from .operators.multimodal import attach_bmp_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_bmp_payloads(t["documents"])
    return extract_image_stats(media)


_MULTIMODAL_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS INT) AS width,
         CAST(doc_id % 11 + 4 AS INT) AS height
  FROM documents
),
px AS (
  SELECT d.doc_id, d.width, d.height, c.c,
         (d.doc_id*7 + y.y*31 + x.x*3 + c.c*11) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.height)) AS y) y,
       LATERAL (SELECT unnest(range(0, d.width)) AS x) x,
       LATERAL (SELECT unnest([0,1,2]) AS c) c
)
SELECT doc_id, width, height,
       CAST(SUM(CASE WHEN c=0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c=1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c=2 THEN v END) AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id, width, height
"""


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL image resize, fully oracle-checked end-to-end: a mixed-
    # container corpus (BMP for even doc_ids, PNG for odd — the resize
    # stage must sniff both) is nearest-neighbor resampled to 6x5 with
    # the explicit index map sx = x*w//6, sy = y*h//5, re-encoded as
    # BMP, and decoded AGAIN for channel stats. The oracle replays the
    # index map against the closed-form pixel formula — four codec
    # passes (encode, decode, encode, decode) must all be bit-exact for
    # the hashes to meet.
    from .operators.multimodal import (
        attach_bmp_payloads,
        attach_png_payloads,
        extract_image_stats,
        resize_images,
    )

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    media = attach_bmp_payloads(docs.filter("doc_id % 2 = 0")).unionByName(
        attach_png_payloads(docs.filter("doc_id % 2 = 1"))
    )
    return extract_image_stats(
        resize_images(media, target_width=6, target_height=5)
    )


_MULTIMODAL_RESIZE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS INT) AS w,
         CAST(doc_id % 11 + 4 AS INT) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, c.c,
         (d.doc_id*7 + ((y.y * d.h) // 5)*31 + ((x.x * d.w) // 6)*3
          + c.c*11) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, 5)) AS y) y,
       LATERAL (SELECT unnest(range(0, 6)) AS x) x,
       LATERAL (SELECT unnest([0,1,2]) AS c) c
)
SELECT doc_id, CAST(6 AS INT) AS width, CAST(5 AS INT) AS height,
       CAST(SUM(CASE WHEN c=0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c=1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c=2 THEN v END) AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
"""


def _q_interpolate_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear interpolation onto a dense daily grid — the third leg of
    # time-series completion next to gap_fill (zeros) and forward_fill
    # (last-observation-carried-forward). Per user: daily spine LEFT
    # JOIN per-day observed value, then bracketing neighbors via
    # last/first IGNORE NULLS window frames and a linear blend. All
    # arithmetic is order-free: per-row integer cents before the sum,
    # integer day arithmetic for the blend fraction, one deterministic
    # double expression rounded back to cents — identical IEEE ops in
    # both engines.
    register_tables(spark, sf_dir)
    return spark.sql("""
WITH samples AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE user_id < 100
  GROUP BY user_id, CAST(ts AS DATE)
),
grid AS (
  SELECT user_id, explode(sequence(DATE '2024-01-05', DATE '2024-02-10',
                                   INTERVAL 1 DAY)) AS d
  FROM (SELECT DISTINCT user_id FROM samples)
),
j AS (
  SELECT g.user_id, g.d, s.cents
  FROM grid g LEFT JOIN samples s ON g.user_id = s.user_id AND g.d = s.d
),
w AS (
  SELECT user_id, d, cents,
    last(cents, true) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
    last(CASE WHEN cents IS NOT NULL THEN d END, true) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_prev,
    first(cents, true) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
    first(CASE WHEN cents IS NOT NULL THEN d END, true) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d_next
  FROM j
)
SELECT user_id, CAST(unix_timestamp(CAST(d AS TIMESTAMP)) AS BIGINT) AS day_ts,
  CASE
    WHEN cents IS NOT NULL THEN cents
    WHEN v_prev IS NULL OR v_next IS NULL THEN NULL
    ELSE CAST(floor(
      CAST(v_prev AS DOUBLE)
      + (CAST(v_next AS DOUBLE) - CAST(v_prev AS DOUBLE))
        * (CAST(datediff(d, d_prev) AS DOUBLE)
           / CAST(datediff(d_next, d_prev) AS DOUBLE))
      + 0.5) AS BIGINT)
  END AS cents_interp,
  (cents IS NOT NULL) AS observed
FROM w
""")


_INTERPOLATE_ORACLE = """
WITH samples AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE user_id < 100
  GROUP BY user_id, CAST(ts AS DATE)
),
grid AS (
  SELECT user_id, unnest(CAST(generate_series(DATE '2024-01-05',
                              DATE '2024-02-10', INTERVAL 1 DAY) AS DATE[]))
         AS d
  FROM (SELECT DISTINCT user_id FROM samples)
),
j AS (
  SELECT g.user_id, g.d, s.cents
  FROM grid g LEFT JOIN samples s ON g.user_id = s.user_id AND g.d = s.d
),
w AS (
  SELECT user_id, d, cents,
    last_value(cents IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
    last_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_prev,
    first_value(cents IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
    first_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY d
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d_next
  FROM j
)
SELECT user_id, CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS day_ts,
  CASE
    WHEN cents IS NOT NULL THEN cents
    WHEN v_prev IS NULL OR v_next IS NULL THEN NULL
    ELSE CAST(floor(
      CAST(v_prev AS DOUBLE)
      + (CAST(v_next AS DOUBLE) - CAST(v_prev AS DOUBLE))
        * (CAST((d - d_prev) AS DOUBLE)
           / CAST((d_next - d_prev) AS DOUBLE))
      + 0.5) AS BIGINT)
  END AS cents_interp,
  (cents IS NOT NULL) AS observed
FROM w
"""


def _q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The diagnostics half of skew mitigation: hottest keys + integer
    # basis-point share + skew factor, so the mitigation choice (none /
    # AQE / salting / time-bucketing) is measured, not guessed.
    from .operators.skew import skew_report

    t = register_tables(spark, sf_dir)
    return skew_report(t["documents"], ["lang"], top_n=10)


_SKEW_REPORT_ORACLE = """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
s AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM c)
SELECT lang, CAST(cnt AS BIGINT) AS cnt,
       CAST(floor(cnt * 10000 / total + 0.5) AS BIGINT) AS pct_e4,
       CAST(floor(cnt * 100 * nkeys / total + 0.5) AS BIGINT) AS skew_x_e2
FROM c, s
ORDER BY cnt DESC, lang ASC
LIMIT 10
"""


def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-space curation gate: cosine against the own-label
    # centroid, integer micro-unit coordinates so every cross-engine sum
    # is an integer sum (order-free) and the double arithmetic downstream
    # is the same deterministic expression on both sides.
    from .operators.similarity import embedding_outliers

    t = register_tables(spark, sf_dir)
    return embedding_outliers(t["embeddings"], threshold_e4=0)


_EMBEDDING_OUTLIERS_ORACLE = """
WITH m AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE) * 1000000 + 0.5)) AS v
  FROM embeddings
),
e AS (
  SELECT label, i AS pos, CAST(sum(v[i]) AS BIGINT) AS s
  FROM m, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
  GROUP BY label, i
),
c AS (
  SELECT label, list(CAST(s AS DOUBLE) ORDER BY pos) AS cvec
  FROM e GROUP BY label
),
scored AS (
  SELECT m.vec_id, m.label,
    CAST(floor(
      list_sum(list_transform(generate_series(1, len(v)),
                              i -> v[i] * cvec[i]))
      / (sqrt(list_sum(list_transform(v, x -> x * x)))
         * sqrt(list_sum(list_transform(cvec, x -> x * x))))
      * 10000 + 0.5) AS BIGINT) AS cos_e4
  FROM m JOIN c USING (label)
)
SELECT vec_id, label, cos_e4, (cos_e4 < 0) AS is_outlier FROM scored
"""


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perplexity-proxy curation signal: per-doc unigram NLL under the
    # corpus's own token distribution (no external LM). Costs are
    # floor(-ln(c/T)*1e6) micro-nat BIGINTs summed per doc — integer
    # sums, so summation order can't move the hash across engines.
    from .operators.text import unigram_logprob

    t = register_tables(spark, sf_dir)
    return unigram_logprob(t["documents"], "doc_id", "text")


_UNIGRAM_LOGPROB_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
v AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
t AS (SELECT count(*) AS t FROM tok),
costed AS (
  SELECT token,
         CAST(floor(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000)
              AS BIGINT) AS cost
  FROM v, t
)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(cost) AS BIGINT) AS nll_micro_nats
FROM tok JOIN costed USING (token)
GROUP BY tok.doc_id
"""


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lakehouse MERGE INTO: a January per-user state table absorbs a
    # February CDC batch — newest-per-key update wins (seq = event_id),
    # 'error'-typed rows act as tombstones. Anti-join + union; at scale
    # the base side is bucketed so the anti-join is exchange-free.
    from .operators.snapshot import merge_upsert

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


def _q_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # merge_asof(direction='nearest'): each purchase attaches its
    # closest click within ±10 min — always time-bucketed (the mandatory
    # tolerance bounds candidates to three windows per row), ties break
    # backward-first then newest event_id, microsecond integer
    # arithmetic end-to-end.
    from .operators.pit_join import nearest_event_join

    t = register_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("cts"), "value", "event_id"
    )
    out = nearest_event_join(
        purchases,
        clicks,
        join_keys=["user_id"],
        entity_ts_col="ts",
        feature_ts_col="cts",
        features=["value"],
        tolerance_seconds=600,
        created_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "matched_ts",
        F.round("value", 2).alias("click_value"),
    )


_NEAREST_EVENT_ORACLE = """
WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts AS cts, value, event_id
      FROM events WHERE event_type = 'click'),
cand AS (
  SELECT sp.user_id, sp.ts, c.cts, c.value, c.event_id,
         abs(epoch_us(c.cts) - epoch_us(sp.ts)) AS dist,
         CASE WHEN c.cts <= sp.ts THEN 0 ELSE 1 END AS fwd
  FROM (SELECT DISTINCT user_id, ts FROM p) sp
  JOIN c USING (user_id)
  WHERE abs(epoch_us(c.cts) - epoch_us(sp.ts)) <= 600000000
),
best AS (
  SELECT user_id, ts, cts, value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY dist, fwd, cts, event_id DESC) AS rn
  FROM cand
)
SELECT p.user_id, p.ts AS purchase_ts, b.cts AS matched_ts,
       round(b.value, 2) AS click_value
FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (user_id, ts)
"""


def _q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-safe split: hash the GROUP key (user), not the row — every
    # event follows its user into one split, the hygiene rule that keeps
    # a user's history out of both train and eval. Output also counts
    # straddling users (provably zero when the split is a pure function
    # of the group key — the oracle recomputes it, not assumes it).
    from .operators.split import fingerprint_split

    t = register_tables(spark, sf_dir)
    s = fingerprint_split(t["events"], "user_id")
    per = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    leak = (
        s.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaky_users"))
    )
    return per.crossJoin(F.broadcast(leak)).select(
        "split",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_leaky_users").cast("long").alias("n_leaky_users"),
    )


_GROUPED_SPLIT_ORACLE = """
WITH s AS (
  SELECT *, CASE WHEN ((user_id * 2654435761) % 2147483648 + 2147483648)
                      % 2147483648 % 3 < 2
                 THEN 'train' ELSE 'eval' END AS split
  FROM events
),
per AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM s GROUP BY split
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaky_users FROM (
    SELECT user_id FROM s GROUP BY user_id
    HAVING count(DISTINCT split) > 1
  )
)
SELECT split, n_events, n_users, n_leaky_users FROM per, leak
"""


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenizer vocabulary coverage curve (OOV-rate planning): share of
    # token OCCURRENCES covered by the top-V types at three budgets.
    # The corpus scans ONCE into a pinned vocab-sized count frame (the
    # SQL-text form re-tokenized per LATERAL reuse — 4 scans); ranking
    # and the three budget sums then run over the tiny pinned frame.
    # The global type ranking is a vocab-sized sort.
    t = register_tables(spark, sf_dir)
    c = dd._pin(
        t["documents"]
        .select(
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "),
                         lambda x: x != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = c.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))),
    )
    tot = c.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("n_types")
    )
    out = None
    for v in (10, 100, 1000):
        cov = ranked.filter(F.col("rnk") <= v).agg(
            F.sum("cnt").alias("covered")
        )
        row = cov.crossJoin(F.broadcast(tot)).select(
            F.lit(v).cast("int").alias("vocab_budget"),
            F.floor(10000.0 * F.col("covered") / F.col("t"))
            .cast("long")
            .alias("covered_bp"),
            F.col("n_types").cast("long").alias("n_types"),
        )
        out = row if out is None else out.unionByName(row)
    return out

_QVOCAB_COVERAGE_ORACLE = """
WITH c AS (
  SELECT token, count(*) AS cnt FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS token
    FROM documents
  ) GROUP BY token
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk FROM c
),
tot AS (SELECT sum(cnt) AS t, count(*) AS n_types FROM ranked)
SELECT v.v AS vocab_budget,
       CAST(floor(10000.0 * cov.covered / tot.t) AS BIGINT) AS covered_bp,
       CAST(tot.n_types AS BIGINT) AS n_types
FROM (SELECT 10 AS v UNION ALL SELECT 100 UNION ALL SELECT 1000) v,
     tot,
     LATERAL (SELECT sum(cnt) AS covered FROM ranked
              WHERE rnk <= v.v) cov
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

    from .operators.snapshot import snapshot_diff
    from .sources.versioned import read_version, write_version

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


def _q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inverted-index full-text search: postings materialized once
    # (distinct (token, doc_id), clustered by token), an AND query
    # probes postings and joins back by id — the text column is never
    # scanned at query time. Oracle: direct token-membership scan.
    import tempfile as _tempfile

    from .operators.text import keyword_search_indexed, write_token_index

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    idx = _tempfile.mkdtemp(prefix="token_index_") + "/idx"
    write_token_index(docs, idx)
    out = keyword_search_indexed(docs, idx, ["spark", "hash"])
    return out.select("doc_id", "lang", "source", "n_chars")


_KEYWORD_SEARCH_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE list_contains(string_split(lower(text), ' '), 'spark')
  AND list_contains(string_split(lower(text), ' '), 'hash')
"""


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-phrase search via positional postings: "table value" found
    # by chaining (id, pos) equi-joins — adjacency resolved entirely in
    # the index, text never read. Oracle: token-position self-join.
    import tempfile as _tempfile

    from .operators.text import phrase_search_indexed, write_positional_index

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    idx = _tempfile.mkdtemp(prefix="pos_index_") + "/idx"
    write_positional_index(docs, idx)
    return phrase_search_indexed(docs, idx, ["table", "value"])


_PHRASE_SEARCH_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
)
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.tok = 'table' AND b.tok = 'value'
GROUP BY a.doc_id
"""


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25-ranked OR search (Lucene idf variant), per-term micro floors
    # before the integer per-doc sum — cross-engine summation order
    # cannot move a score.
    t = register_tables(spark, sf_dir)
    return tx.bm25_search(t["documents"], ["spark", "hash"])


_BM25_SEARCH_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
hits AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE token IN ('hash', 'spark')
  GROUP BY doc_id, token
),
dft AS (SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token),
scored AS (
  SELECT h.doc_id,
         CAST(floor(
           ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * h.tf * 2.2
           / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl))
           * 1000000) AS BIGINT) AS s
  FROM hits h JOIN dft d USING (token) JOIN dl l USING (doc_id), corpus c
)
SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM scored GROUP BY doc_id
"""


def _q_table_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Manifest-driven data skipping: orders committed range-partitioned
    # on o_orderdate with per-file min/max stats; a 1996 range read
    # opens only overlapping files. Output carries the aggregate AND the
    # skipping contract (files_opened < files_total, answer unchanged);
    # the oracle computes the aggregate from the raw table and literal
    # TRUE for the contract.
    import tempfile as _tempfile

    from .sources.versioned import read_version_pruned, write_version

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


def _q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VARIANT semi-structured type (Spark 4.x): props parsed once into
    # the binary variant encoding, fields extracted with typed
    # variant_get — the schema-flexible path that replaces per-query
    # from_json re-parses (the variant parse is paid once per row, each
    # extraction is a cheap binary probe). Oracle: plain JSON extraction.
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(variant_get(v, '$.k', 'long')) AS BIGINT) AS k_sum,
               CAST(count(try_variant_get(v, '$.missing', 'long'))
                    AS BIGINT) AS n_missing_hits
        FROM (SELECT event_type, parse_json(props) AS v FROM events)
        GROUP BY event_type
    """)


_VARIANT_PROPS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(count(json_extract(props, '$.missing')) AS BIGINT)
         AS n_missing_hits
FROM events
GROUP BY event_type
"""


# Recursive CTE (new in Spark 4.x): walk each user's event chain via
# the lead()-derived successor edge, 50 steps deep — linear recursion
# the optimizer executes as iterative self-joins. IDENTICAL text on both
# engines. For corpus-scale graph closure the iterative
# connected_components operator (pointer doubling, O(log d) rounds)
# remains the 100 TB path; the recursive CTE is the declarative form
# for bounded-depth walks.
_QRECURSIVE_WALK = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         lead(event_id) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
walk AS (
  SELECT user_id, event_id, next_id, 1 AS steps FROM seq WHERE rn = 1
  UNION ALL
  SELECT w.user_id, s.event_id, s.next_id, w.steps + 1
  FROM walk w
  JOIN seq s ON s.user_id = w.user_id AND s.event_id = w.next_id
  WHERE w.steps < 50
)
SELECT user_id, CAST(max(steps) AS BIGINT) AS chain_len,
       CAST(count(*) AS BIGINT) AS n_visited
FROM walk GROUP BY user_id
"""


# Event-type association (pointwise mutual information over per-user
# event baskets): which event types co-occur in the same user's history
# more than independence predicts — market-basket lite. Per-pair
# micro-nat floor; counts are BIGINT.
_QPMI_SPARK = """
WITH s AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id) AS n FROM events),
singles AS (SELECT event_type, count(*) AS c FROM s GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       CAST(floor(ln(CAST(p.n_both AS DOUBLE) * n.n
                     / (ca.c * cb.c)) * 1000000) AS BIGINT) AS pmi_micro
FROM pairs p
JOIN singles ca ON ca.event_type = p.type_a
JOIN singles cb ON cb.event_type = p.type_b, n
"""

# identical modulo nothing — same ANSI text
_QPMI_ORACLE = _QPMI_SPARK


# Rolling 7-day active users per day (the WAU curve): the day grid
# joins the distinct (user, day) activity on a bounded 7-day band —
# each activity row lands in at most 7 day-buckets.
_QWAU_SPARK = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT days.d AS day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
FROM days JOIN act a ON a.d BETWEEN date_sub(days.d, 6) AND days.d
GROUP BY days.d
"""

_QWAU_ORACLE = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT days.d AS day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
FROM days JOIN act a ON a.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
"""


def _q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MERGEABLE sketches — the property that makes sketch
    # infrastructure work at 100 TB: per-source HLL sketches built
    # independently (one pass, map-side combinable), then UNIONED
    # without touching the raw data; the merged estimate must land
    # within ±5% of the exact global distinct count, per-source
    # estimates within ±5% of theirs (error-bound contract, oracle
    # emits exact counts + literal TRUE). Datasketches HLL via Spark's
    # hll_sketch_agg / hll_union_agg / hll_sketch_estimate.
    register_tables(spark, sf_dir)
    return spark.sql("""
        WITH per AS (
          SELECT source, hll_sketch_agg(CAST(doc_id AS STRING)) AS sk,
                 count(DISTINCT doc_id) AS exact
          FROM documents GROUP BY source
        ),
        per_rows AS (
          SELECT source AS scope, CAST(exact AS BIGINT) AS exact_distinct,
                 abs(hll_sketch_estimate(sk) - exact) <= 0.05 * exact
                   AS est_in_bound
          FROM per
        ),
        merged AS (
          SELECT 'merged' AS scope,
                 (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                  FROM documents) AS exact_distinct,
                 abs(hll_sketch_estimate(hll_union_agg(sk))
                     - (SELECT count(DISTINCT doc_id) FROM documents))
                   <= 0.05 * (SELECT count(DISTINCT doc_id) FROM documents)
                   AS est_in_bound
          FROM per
        )
        SELECT * FROM per_rows UNION ALL SELECT * FROM merged
    """)


_SKETCH_HLL_MERGE_ORACLE = """
SELECT source AS scope, CAST(count(DISTINCT doc_id) AS BIGINT)
         AS exact_distinct, TRUE AS est_in_bound
FROM documents GROUP BY source
UNION ALL
SELECT 'merged', CAST(count(DISTINCT doc_id) AS BIGINT), TRUE
FROM documents
"""


# Inter-event gap distribution per event type: exact median and p90 of
# the per-user time between consecutive events of that type — the
# cadence profile behind TTL/watermark tuning (how stale can a feature
# get; how late can an event be). lag() inside user+type, grouped
# exact percentiles (the proven-portable percentile_cont).
_QGAP_STATS = """
WITH gaps AS (
  SELECT event_type,
         CAST(ts AS TIMESTAMP) AS ts,
         lag(CAST(ts AS TIMESTAMP))
           OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS prev_ts
  FROM events
),
d AS (
  SELECT event_type,
         CAST(floor((epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0)
              AS BIGINT) AS gap_s
  FROM gaps WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_s), 2)
         AS median_gap_s,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_s), 2)
         AS p90_gap_s
FROM d GROUP BY event_type
"""

_QGAP_STATS_SPARK = _QGAP_STATS.replace("epoch_us(", "unix_micros(")


# CUSUM changepoint surveillance: per event_type, the running sum of
# (daily mean - global mean) deviations in cents; days where |CUSUM|
# exceeds the threshold mark sustained drift (the classic control-chart
# signal, not a single-day spike). The running window sum accumulates
# in ORDER BY order — identical addition sequence in both engines.
_QCUSUM = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents,
         count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
g AS (SELECT event_type,
             CAST(sum(cents) AS DOUBLE) / sum(n) AS gmean
      FROM daily GROUP BY event_type),
c AS (
  SELECT daily.event_type, daily.d,
         sum(CAST(daily.cents AS DOUBLE) / daily.n - g.gmean)
           OVER (PARTITION BY daily.event_type ORDER BY daily.d) AS cusum
  FROM daily JOIN g ON g.event_type = daily.event_type
)
SELECT event_type, d AS day,
       CAST(round(cusum, 2) AS DOUBLE) AS cusum_cents
FROM c WHERE abs(cusum) >= 200
"""


# Pareto / revenue-concentration analysis: customers ranked by spend
# into deciles (NTILE over integer cents, id tie-break), per-decile
# share of total in basis points — the 80/20 curve. Frame-ordered
# window sums; integer arithmetic end-to-end.
_QPARETO = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, cents,
         NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM spend
),
tot AS (SELECT sum(cents) AS t FROM spend)
SELECT CAST(decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS spend_cents,
       CAST(floor(10000.0 * sum(cents) / t) AS BIGINT) AS share_bp
FROM ranked, tot
GROUP BY decile, t
"""


def _q_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dedup EXPLAINABILITY: for every Jaccard pair the pipeline flags,
    # the shared-shingle count plus a deterministic example shingle
    # (lexicographic min) — the evidence a reviewer needs to trust a
    # drop decision. String shingles here (evidence must be readable),
    # joined only for the ~25 flagged pairs.
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = dd.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, on_over_cap="error"
    ).select("doc_a", "doc_b")
    sh = dd.shingles(docs, "doc_id", "text", 3, hashed=False)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min("shingle").alias("example_shingle"),
        )
    )


_PAIR_EVIDENCE_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS n_shared, min(a.s) AS example_shingle
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared, example_shingle
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_shared * 1.0 / (sa.nsh + sb.nsh - n_shared) >= 0.5
"""


# Corpus novelty rate: what fraction of each source's distinct
# 3-gram shingles is NOT already covered by the even-doc_id half of the
# corpus (the "what did the new crawl actually add" audit). Anti-join
# of distinct shingles against the baseline shingle set, basis points.
_QNOVELTY_SPARK = """
WITH sh AS (
  SELECT DISTINCT d.doc_id, d.source, s.s
  FROM documents d,
  LATERAL (
    SELECT explode(transform(
      sequence(1, greatest(size(split(lower(d.text), ' ')) - 2, 0)),
      i -> concat_ws(' ', slice(split(lower(d.text), ' '), i, 3)))) AS s
  ) s
),
base AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
novel AS (
  SELECT n.source, count(DISTINCT n.s) AS n_new
  FROM (SELECT source, s FROM sh WHERE doc_id % 2 = 1) n
  ANTI JOIN base b ON n.s = b.s
  GROUP BY n.source
),
tot AS (
  SELECT source, count(DISTINCT s) AS n_all
  FROM sh WHERE doc_id % 2 = 1 GROUP BY source
)
SELECT t.source, CAST(t.n_all AS BIGINT) AS n_shingles,
       CAST(coalesce(v.n_new, 0) AS BIGINT) AS n_novel,
       CAST(floor(10000.0 * coalesce(v.n_new, 0) / t.n_all) AS BIGINT)
         AS novelty_bp
FROM tot t LEFT JOIN novel v ON v.source = t.source
"""

_QNOVELTY_ORACLE = """
WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
base AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
novel AS (
  SELECT n.source, count(DISTINCT n.s) AS n_new
  FROM (SELECT source, s FROM sh WHERE doc_id % 2 = 1) n
  ANTI JOIN base b ON n.s = b.s
  GROUP BY n.source
),
tot AS (
  SELECT source, count(DISTINCT s) AS n_all
  FROM sh WHERE doc_id % 2 = 1 GROUP BY source
)
SELECT t.source, CAST(t.n_all AS BIGINT) AS n_shingles,
       CAST(coalesce(v.n_new, 0) AS BIGINT) AS n_novel,
       CAST(floor(10000.0 * coalesce(v.n_new, 0) / t.n_all) AS BIGINT)
         AS novelty_bp
FROM tot t LEFT JOIN novel v ON v.source = t.source
"""


# Referential-integrity audit: one row per declared relationship with
# orphan counts (child keys with no parent) and parent key-uniqueness
# violations — the data-contract check a feature platform runs before
# every materialization. Anti-joins + grouped uniqueness, all
# map-side-combinable.
_QFK_AUDIT = """
SELECT 'orders.o_custkey -> customer' AS relationship,
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        ANTI JOIN customer c ON o.o_custkey = c.c_custkey) AS n_orphans,
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT c_custkey FROM customer GROUP BY c_custkey
          HAVING count(*) > 1)) AS n_dup_parents
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey),
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1))
UNION ALL
SELECT 'nation.n_regionkey -> region',
       (SELECT CAST(count(*) AS BIGINT) FROM nation n
        ANTI JOIN region r ON n.n_regionkey = r.r_regionkey),
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT r_regionkey FROM region GROUP BY r_regionkey
          HAVING count(*) > 1))
"""


# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
# each row draws priority -ln(u)/w from a DETERMINISTIC u (portable
# fingerprint mapped into (0,1)); the k smallest priorities are the
# weighted sample. Selection runs on the MICRO-FLOORED integer key with
# id tie-break, so both engines pick the identical set (no float
# boundary ambiguity). Weight = document length in chars.
_QWSAMPLE_WOR = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(floor(
           -ln((((doc_id * 2654435761) % 2147483648 + 2147483648)
                % 2147483648 % 10000 + 0.5) / 10000.0)
           / n_chars * 1000000000) AS BIGINT) AS prio_nano
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, prio_nano
FROM keyed
ORDER BY prio_nano, doc_id
LIMIT 100
"""


# Rolling z-score anomaly flags per user: each event scored against the
# mean/stddev of its OWN trailing 7-event window (ROWS frame — the
# window-local aggregation order is frame-defined, so double sums are
# deterministic in both engines). Events beyond |z| >= 1.5 with a full
# window are flagged.
_QROLLING_Z = """
WITH w AS (
  SELECT user_id, event_id, value,
         avg(value) OVER win AS mu,
         stddev_samp(value) OVER win AS sd,
         count(*) OVER win AS n_win
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, round(value, 2) AS value,
       round((value - mu) / sd, 4) AS z
FROM w
WHERE n_win = 7 AND sd > 0 AND abs((value - mu) / sd) >= 1.5
"""


# K-fold cross-validation assignment: portable-fingerprint fold per
# USER (grouped, leakage-safe like grouped_split_no_leakage), with
# per-fold event counts and user digests — the eval-protocol primitive.
_QKFOLD = """
WITH f AS (
  SELECT user_id, event_id, value,
         ((user_id * 2654435761) % 2147483648 + 2147483648)
           % 2147483648 % 5 AS fold
  FROM events
)
SELECT CAST(fold AS INT) AS fold,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(user_id) AS BIGINT) AS user_digest,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM f GROUP BY fold
"""


# Deterministic epoch shuffle for training: each epoch permutes the
# corpus by a salted portable fingerprint (pure function of (id, epoch)
# — reproducible across runs, partitionings, engines; change the epoch
# literal, get an independent permutation) and NTILE slices the
# permuted order into equal-size shards. Per-shard set digests pin the
# shard CONTENTS, min/max fingerprints pin the boundaries. Identical
# ANSI text on both engines.
_QEPOCH_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         ((doc_id * 2654435761 + 3 * 40503) % 2147483648 + 2147483648)
           % 2147483648 AS hkey
  FROM documents
),
sharded AS (
  SELECT doc_id, hkey, NTILE(8) OVER (ORDER BY hkey, doc_id) AS shard
  FROM h
)
SELECT CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS id_digest,
       CAST(min(hkey) AS BIGINT) AS min_h,
       CAST(max(hkey) AS BIGINT) AS max_h
FROM sharded GROUP BY shard
"""


# Multi-granularity time rollup in ONE pass: GROUPING SETS over
# (day, week, month) derived dims — one scan, one aggregate, three
# granularities (vs three separate jobs); GROUPING() flags which level a
# row belongs to. Portable date_trunc + integer counts.
_QTIME_ROLLUP_SPARK = """
SELECT CAST(grouping(d) AS INT) AS g_day,
       CAST(grouping(w) AS INT) AS g_week,
       CAST(grouping(m) AS INT) AS g_month,
       CAST(d AS DATE) AS day, CAST(w AS DATE) AS week,
       CAST(m AS DATE) AS month,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM (
  SELECT value,
         date_trunc('day', ts) AS d,
         date_trunc('week', ts) AS w,
         date_trunc('month', ts) AS m
  FROM events
)
GROUP BY GROUPING SETS ((d), (w), (m))
"""

_QTIME_ROLLUP_ORACLE = _QTIME_ROLLUP_SPARK  # identical ANSI text


# Per-group percent-rank feature transform (rank normalization — the
# scale-free feature encoding): percent_rank of value within event_type,
# tie-broken by event_id for a deterministic total order, emitted in
# basis points (integer).
_QPERCENT_RANK = """
SELECT event_id, event_type,
       round(value, 2) AS value,
       CAST(floor(percent_rank() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) * 10000)
            AS BIGINT) AS pct_rank_bp
FROM events
"""


# Per-group OLS trend: regression of event value on event time (days
# since epoch) — slope/intercept/R² per event_type via the ANSI regr_*
# aggregates, which both engines implement identically. Days (not
# seconds) keep the slope magnitudes printable at round(6).
_QOLS_TREND_SPARK = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, unix_micros(ts) / 86400e6), 6) AS slope,
       round(regr_intercept(value, unix_micros(ts) / 86400e6), 4)
         AS intercept,
       round(regr_r2(value, unix_micros(ts) / 86400e6), 6) AS r2
FROM events GROUP BY event_type
"""

_QOLS_TREND_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, epoch_us(ts) / 86400e6), 6) AS slope,
       round(regr_intercept(value, epoch_us(ts) / 86400e6), 4)
         AS intercept,
       round(regr_r2(value, epoch_us(ts) / 86400e6), 6) AS r2
FROM events GROUP BY event_type
"""


# Robust outlier detection: median absolute deviation per event_type,
# flag values beyond 3 scaled MADs (1.4826 ~ consistency constant for
# normal data). Median/MAD resist the contamination that breaks
# mean/stddev gates — the robust-statistics data-quality primitive.
# Identical SQL text runs on both engines (percentile_cont WITHIN GROUP
# is the proven-portable exact quantile).
_QMAD_OUTLIERS = """
WITH med AS (
  SELECT event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         percentile_cont(0.5)
           WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
       round(m.med, 4) AS med, round(d.mad, 4) AS mad
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
"""


# Recency-weighted activity score (feature-engineering primitive): each
# event contributes value * 2^(-age/7d) — a 7-day half-life exponential
# decay — floored to integer centi-units PER EVENT before the integer
# sum, so engine summation order cannot move the result. One map-side-
# combinable aggregate over the scan; age arithmetic in integer micros
# against a fixed reference instant.
_QDECAYED_SPARK = """
SELECT user_id,
       CAST(sum(CAST(floor(exp(-(ln(2) / 7) * age_days) * value * 100)
                     AS BIGINT)) AS BIGINT) AS score_centi,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id, value,
         (unix_micros(TIMESTAMP'2024-04-01 00:00:00') - unix_micros(ts))
           / 86400000000.0 AS age_days
  FROM events
)
GROUP BY user_id
"""

_QDECAYED_ORACLE = """
SELECT user_id,
       CAST(sum(CAST(floor(exp(-(ln(2) / 7) * age_days) * value * 100)
                     AS BIGINT)) AS BIGINT) AS score_centi,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id, value,
         (epoch_us(TIMESTAMP '2024-04-01 00:00:00') - epoch_us(ts))
           / 86400000000.0 AS age_days
  FROM events
)
GROUP BY user_id
"""


# Retention cohort matrix: users cohorted by first-activity week, one
# row per (cohort_week, week_offset) with distinct active users. Two
# map-side-combinable aggregates + one equi-join on user_id (AQE
# broadcasts the cohort side when small); integer week arithmetic —
# epoch seconds div 604800 — so offsets are bit-portable.
_QRETENTION = """
WITH fw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT CAST(fw.cw AS DATE) AS cohort_week,
       CAST((unix_timestamp(act.w) - unix_timestamp(fw.cw)) div 604800
            AS BIGINT) AS week_offset,
       CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active
FROM act JOIN fw ON act.user_id = fw.user_id
GROUP BY 1, 2
"""

_QRETENTION_ORACLE = """
WITH fw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT CAST(fw.cw AS DATE) AS cohort_week,
       CAST((epoch(act.w) - epoch(fw.cw)) // 604800 AS BIGINT)
         AS week_offset,
       CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active
FROM act JOIN fw ON act.user_id = fw.user_id
GROUP BY 1, 2
"""


def _q_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Population-stability-index drift between two order cohorts (1995
    # split point): fixed-width value bins, add-1 Laplace smoothing so
    # empty bins stay finite, per-bin micro-nat floor BEFORE the integer
    # sum (order-free). The monitoring primitive a feature platform runs
    # per feature per day; one scan, two conditional aggregates.
    register_tables(spark, sf_dir)
    return spark.sql("""
WITH binned AS (
  SELECT least(9, CAST(floor(o_totalprice / 60000) AS INT)) AS bin,
         CASE WHEN o_orderdate < DATE'1995-01-01' THEN 0 ELSE 1 END AS era
  FROM orders
),
counts AS (
  SELECT b.bin,
         sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS c_new
  FROM binned b GROUP BY b.bin
),
tot AS (SELECT sum(c_ref) AS n_ref, sum(c_new) AS n_new FROM counts),
terms AS (
  SELECT bin,
         CAST(c_ref AS BIGINT) AS c_ref, CAST(c_new AS BIGINT) AS c_new,
         CAST(floor(
           ((c_ref + 1) / (n_ref + 10) - (c_new + 1) / (n_new + 10)) *
           ln(((c_ref + 1) / (n_ref + 10)) / ((c_new + 1) / (n_new + 10)))
           * 1000000) AS BIGINT) AS psi_term_micro
  FROM counts, tot
)
SELECT bin, c_ref, c_new, psi_term_micro FROM terms
""")


# Same text modulo dialect: DuckDB divides BIGINTs to DOUBLE with '/'
# exactly like Spark, so the oracle is near-verbatim.
_FEATURE_DRIFT_PSI_ORACLE = """
WITH binned AS (
  SELECT least(9, CAST(floor(o_totalprice / 60000) AS INT)) AS bin,
         CASE WHEN o_orderdate < DATE'1995-01-01' THEN 0 ELSE 1 END AS era
  FROM orders
),
counts AS (
  SELECT b.bin,
         sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS c_new
  FROM binned b GROUP BY b.bin
),
tot AS (SELECT sum(c_ref) AS n_ref, sum(c_new) AS n_new FROM counts),
terms AS (
  SELECT bin,
         CAST(c_ref AS BIGINT) AS c_ref, CAST(c_new AS BIGINT) AS c_new,
         CAST(floor(
           ((c_ref + 1) / (n_ref + 10) - (c_new + 1) / (n_new + 10)) *
           ln(((c_ref + 1) / (n_ref + 10)) / ((c_new + 1) / (n_new + 10)))
           * 1000000) AS BIGINT) AS psi_term_micro
  FROM counts, tot
)
SELECT bin, c_ref, c_new, psi_term_micro FROM terms
"""


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed triangle counting (node-iterator with ordered
    # orientation — each triangle counted once via t1 < t2 < t3) on the
    # token co-occurrence graph: nodes = the 30 most frequent tokens,
    # edges = pairs co-occurring in >= 50 documents. The distinct
    # (doc, token) frame and the edge list are PINNED (localCheckpoint):
    # Spark CTEs don't materialize, and the naive declarative form
    # re-tokenized the corpus 17x (one scan per reuse in the plan) — the
    # pinned form scans it once; the triangle join then runs over the
    # tiny materialized edge list.
    t = register_tables(spark, sf_dir)
    tok = dd._pin(
        t["documents"]
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "),
                         lambda x: x != "")
            ).alias("token"),
        )
        .distinct()
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(30)
        .select("token")
    )
    vt = tok.join(F.broadcast(vocab), "token")
    a = vt.select(F.col("doc_id"), F.col("token").alias("t1"))
    b = vt.select(F.col("doc_id"), F.col("token").alias("t2"))
    edges = dd._pin(
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 50)
        .select("t1", "t2")
    )
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e2.t1") == F.col("e1.t2"))
        .join(
            edges.alias("e3"),
            (F.col("e3.t1") == F.col("e1.t1"))
            & (F.col("e3.t2") == F.col("e2.t2")),
        )
    )
    n_nodes = vocab.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(
        F.broadcast(n_tri)
    )

_QTRIANGLES_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS token
    FROM documents
  )
),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS df FROM tok GROUP BY token
    ORDER BY df DESC, token LIMIT 30
  )
),
vt AS (SELECT t.doc_id, t.token FROM tok t JOIN vocab v USING (token)),
edges AS (
  SELECT a.token AS t1, b.token AS t2
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
  HAVING count(*) >= 50
),
tri AS (
  SELECT e1.t1, e1.t2, e2.t2 AS t3
  FROM edges e1
  JOIN edges e2 ON e2.t1 = e1.t2
  JOIN edges e3 ON e3.t1 = e1.t1 AND e3.t2 = e2.t2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM vocab) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles
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


def _q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dataset data card: (metric, value) BIGINT rows — size, vocabulary,
    # provenance spread, exact-dup mass, language balance. Fixed-point
    # scaling everywhere; entropy floors per language BEFORE the integer
    # sum, so the card is bit-portable.
    from .operators.corpus import corpus_report

    t = register_tables(spark, sf_dir)
    return corpus_report(t["documents"])


_CORPUS_REPORT_ORACLE = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM documents
),
vocab AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab_size
  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS token FROM documents)
),
ent AS (
  SELECT CAST(sum(term) AS BIGINT) AS lang_entropy_micro_nats
  FROM (
    SELECT CAST(floor(-ln(CAST(n_l AS DOUBLE) / b.n_docs) * 1000000
                      * n_l / b.n_docs) AS BIGINT) AS term
    FROM (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang), base b
  )
)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, n_docs AS value FROM base
  UNION ALL SELECT 'n_tokens', n_tokens FROM base
  UNION ALL SELECT 'vocab_size', vocab_size FROM vocab
  UNION ALL SELECT 'n_langs', n_langs FROM base
  UNION ALL SELECT 'n_sources', n_sources FROM base
  UNION ALL SELECT 'exact_dup_docs', n_docs - n_distinct_texts FROM base
  UNION ALL SELECT 'mean_doc_len_centitokens',
                   CAST(floor(n_tokens * 100 / n_docs) AS BIGINT) FROM base
  UNION ALL SELECT 'lang_entropy_micro_nats', lang_entropy_micro_nats
            FROM ent
)
"""


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cross-source contamination audit: containment_pairs with the
    # SOURCE as the identity — distinct shingles per source, pairwise
    # shared-shingle containment (shared / min set size). The operator
    # is id-agnostic by design; the same capped bucket join that pairs
    # documents pairs provenance groups.
    t = register_tables(spark, sf_dir)
    out = dd.containment_pairs(
        t["documents"], "source", "text", n=3, threshold=0.01,
        on_over_cap="error", max_bucket=100000,
    )
    return out.select(
        F.col("doc_a").alias("source_a"),
        F.col("doc_b").alias("source_b"),
        "containment",
    )


_SOURCE_OVERLAP_ORACLE = """
WITH t AS (SELECT source, string_split(lower(text), ' ') AS w
           FROM documents),
sh AS (
  SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
sizes AS (SELECT source, count(*) AS nsh FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       round(common * 1.0 / least(sa.nsh, sb.nsh), 4) AS containment
FROM pairs
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
WHERE common * 1.0 / least(sa.nsh, sb.nsh) >= 0.01
"""


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second-order perplexity proxy: add-1-smoothed bigram NLL under the
    # corpus's own transition counts — flags text whose token TRANSITIONS
    # are unusual even when every token is common. Same integer
    # micro-nat portability contract as text_unigram_logprob.
    t = register_tables(spark, sf_dir)
    return tx.bigram_logprob(t["documents"], "doc_id", "text")


_BIGRAM_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
v AS (SELECT count(*) AS v FROM uni),
p AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2),
costed AS (
  SELECT bi.w1, bi.w2,
         CAST(floor(-ln(CAST(bi.c2 + 1 AS DOUBLE)
                        / CAST(uni.c1 + v.v AS DOUBLE)) * 1000000)
              AS BIGINT) AS cost
  FROM bi JOIN uni ON uni.token = bi.w1, v
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(cost) AS BIGINT) AS nll_micro_nats
FROM p JOIN costed USING (w1, w2)
GROUP BY p.doc_id
"""


def _q_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Length-bucketed batching stats (padding-waste reducer): exact
    # NTILE(8) over (token count, doc_id); per-bucket rectangular-batch
    # padding cost. At 100 TB boundaries come from the quantile sketch
    # twin; NTILE keeps the oracle exact.
    from .operators.curation import length_bucketing

    t = register_tables(spark, sf_dir)
    return length_bucketing(t["documents"], "doc_id", "text", n_buckets=8)


_LENGTH_BUCKETING_ORACLE = """
WITH lens AS (
  SELECT doc_id AS id,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens,
         NTILE(8) OVER (ORDER BY n_tokens, id) AS bucket
  FROM lens
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_tokens) AS BIGINT) AS min_len,
       CAST(max(n_tokens) AS BIGINT) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS sum_len,
       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
         AS padding_waste
FROM b GROUP BY bucket
"""


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LLM data mixing: sample language g with probability ~ n_g^alpha
    # (alpha=0.5 upweights tail languages). Deterministic portable-hash
    # selection; the per-group cut lands on a 1/10000 grid in both
    # engines, so the float pow() only has to agree to ~1e-5 relative.
    from .operators.curation import temperature_mix

    t = register_tables(spark, sf_dir)
    out = temperature_mix(
        t["documents"], "doc_id", "lang", alpha=0.5, target_rows=300
    )
    return out.select("doc_id", "lang")


_TEMPERATURE_MIX_ORACLE = """
WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT sum(pow(n, 0.5)) AS t FROM s),
r AS (
  SELECT lang,
         CAST(round(10000 * least(1.0, 300 * pow(n, 0.5) / t / n), 0)
              AS BIGINT) AS cut
  FROM s, tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE ((d.doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648
      % 10000 < r.cut
"""


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-language heavy-hitter tokens (freq > n_g/50), Misra-Gries
    # candidates + exact verify — sketch-then-verify like MinHash/
    # Jaccard, so the output EQUALS the exact relational answer and the
    # oracle is plain SQL (no contract needed; integer threshold).
    from .operators.text import heavy_hitters

    t = register_tables(spark, sf_dir)
    return heavy_hitters(t["documents"], "lang", "text", k=50)


_HEAVY_HITTERS_ORACLE = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS token
  FROM documents
),
n AS (SELECT lang, count(*) AS n_g FROM tok GROUP BY lang),
c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token)
SELECT c.lang, c.token, CAST(c.cnt AS BIGINT) AS cnt
FROM c JOIN n USING (lang)
WHERE c.cnt * 50 > n.n_g
"""


def _q_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One distributed BPE merge step (Sennrich et al. 2016): corpus-wide
    # adjacent-token-pair counts, top-20 merge candidates. Map-side
    # combinable aggregation; tie-break on (left, right) makes the
    # selected set deterministic across engines.
    t = register_tables(spark, sf_dir)
    return tx.bpe_pair_merges(t["documents"], "doc_id", "text", top_n=20)


_BPE_PAIR_MERGES_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
p AS (
  SELECT doc_id, w[i] AS left_tok, w[i+1] AS right_tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
),
c AS (
  SELECT left_tok, right_tok,
         CAST(count(*) AS BIGINT) AS pair_count,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM p GROUP BY 1, 2
)
SELECT left_tok, right_tok, left_tok || right_tok AS merged_tok,
       pair_count, doc_freq
FROM c
ORDER BY pair_count DESC, left_tok, right_tok
LIMIT 20
"""


def _q_shared_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-substring dedup (Lee et al. 2022 ExactSubstr): longest
    # verbatim shared token run per pair via positional seed-grams +
    # diagonal islands — the distributed stand-in for their suffix
    # array. on_over_cap="error": gated by an uncapped exact oracle.
    t = register_tables(spark, sf_dir)
    return dd.shared_run_pairs(
        t["documents"], "doc_id", "text",
        seed_n=5, min_run=8, on_over_cap="error",
    )


# Independent DuckDB derivation: string seed-grams (no hash fold),
# lateral generate_series positions, same diagonal islands-and-gaps.
_SHARED_RUN_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i)
  WHERE len(w) >= 5
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT doc_a, doc_b, diag, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                 ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, CAST(count(*) + 4 AS BIGINT) AS run_tokens
  FROM r GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b, max(run_tokens) AS longest_run,
       CAST(count(*) FILTER (WHERE run_tokens >= 8) AS BIGINT) AS n_runs
FROM runs GROUP BY doc_a, doc_b
HAVING max(run_tokens) >= 8
"""


def _q_remove_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The transform half of ExactSubstr dedup: excise every >=8-token
    # verbatim run shared with a lower-id doc, keep one occurrence
    # corpus-wide. Uncapped + fail-fast (exact oracle gates it).
    t = register_tables(spark, sf_dir)
    return dd.remove_shared_runs(
        t["documents"], "doc_id", "text",
        seed_n=5, min_run=8, on_over_cap="error",
    )


# Independent re-derivation: 1-based string grams, diagonal islands,
# span union at token-position level, order-preserving string_agg.
_REMOVE_SHARED_RUNS_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i)
  WHERE len(w) >= 5
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT doc_a, doc_b, diag, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                 ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc_b, count(*) + 4 AS run_tokens, min(pa) - diag AS b_start
  FROM r GROUP BY doc_a, doc_b, diag, grp
),
spans AS (
  SELECT doc_b AS doc_id, b_start AS s, b_start + run_tokens - 1 AS e
  FROM runs WHERE run_tokens >= 8
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
),
removed AS (
  SELECT DISTINCT tok.doc_id, tok.pos
  FROM tok JOIN spans ON tok.doc_id = spans.doc_id
  WHERE tok.pos BETWEEN spans.s AND spans.e
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tok
  FROM tok ANTI JOIN removed USING (doc_id, pos)
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
),
nrem AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_removed
  FROM removed GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(c.clean_text, '') AS clean_text,
       coalesce(n.n_tokens_removed, 0) AS n_tokens_removed
FROM t
LEFT JOIN clean c USING (doc_id)
LEFT JOIN nrem n USING (doc_id)
"""


def _q_training_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-5 capstone composition — the LLM-data pipeline built from
    # THIS round's operators, one Catalyst plan end-to-end:
    #   exact-substring REMOVAL (excise shared >=8-token runs, keep one
    #   occurrence corpus-wide) -> language temperature mixing over the
    #   cleaned corpus -> per-language packing budget (64-token bins).
    # The oracle replays every stage in SQL.
    from .operators.curation import temperature_mix

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    cleaned = dd.remove_shared_runs(
        docs, "doc_id", "text", seed_n=5, min_run=8, on_over_cap="error"
    )
    enriched = cleaned.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = temperature_mix(
        enriched, "doc_id", "lang", alpha=0.5, target_rows=300
    )
    tok_cnt = F.size(
        F.filter(
            F.split(F.col("clean_text"), " "), lambda x: x != ""
        )
    ).cast("long")
    return mixed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok_cnt).alias("n_tokens"),
        F.sum(F.floor((tok_cnt + 63) / 64)).cast("long").alias("pack_bins"),
        F.sum("n_tokens_removed").alias("n_tokens_removed"),
    )


_TRAINING_PIPELINE_V2_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i)
  WHERE len(w) >= 5
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT doc_a, doc_b, diag, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                 ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc_b, count(*) + 4 AS run_tokens, min(pa) - diag AS b_start
  FROM r GROUP BY doc_a, doc_b, diag, grp
),
spans AS (
  SELECT doc_b AS doc_id, b_start AS s, b_start + run_tokens - 1 AS e
  FROM runs WHERE run_tokens >= 8
),
tok AS (
  SELECT doc_id, i AS pos, w[i] AS tk
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
),
removed AS (
  SELECT DISTINCT tok.doc_id, tok.pos
  FROM tok JOIN spans ON tok.doc_id = spans.doc_id
  WHERE tok.pos BETWEEN spans.s AND spans.e
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tk
  FROM tok ANTI JOIN removed USING (doc_id, pos)
),
cleaned AS (
  SELECT t.doc_id,
         coalesce(c.clean_text, '') AS clean_text,
         coalesce(n.nrem, 0) AS n_removed
  FROM t
  LEFT JOIN (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos)
                    AS clean_text FROM kept GROUP BY doc_id) c
    USING (doc_id)
  LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS nrem
             FROM removed GROUP BY doc_id) n USING (doc_id)
),
fullc AS (
  SELECT cl.doc_id, cl.clean_text, cl.n_removed, d.lang
  FROM cleaned cl JOIN documents d USING (doc_id)
),
s AS (SELECT lang, count(*) AS n FROM fullc GROUP BY lang),
tt AS (SELECT sum(pow(n, 0.5)) AS tt FROM s),
rr AS (
  SELECT lang,
         CAST(round(10000 * least(1.0, 300 * pow(n, 0.5) / tt / n), 0)
              AS BIGINT) AS cut
  FROM s, tt
),
mixed AS (
  SELECT f.* FROM fullc f JOIN rr USING (lang)
  WHERE ((f.doc_id * 2654435761) % 2147483648 + 2147483648) % 2147483648
        % 10000 < rr.cut
),
counted AS (
  SELECT lang, n_removed,
         len(list_filter(string_split(clean_text, ' '), x -> x <> ''))
           AS ntok
  FROM mixed
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor((ntok + 63) / 64) AS BIGINT)) AS BIGINT)
         AS pack_bins,
       CAST(sum(n_removed) AS BIGINT) AS n_tokens_removed
FROM counted GROUP BY lang
"""


def _q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Third real codec behind the multimodal boundary: 8-bit RGB PNG,
    # pure stdlib (zlib inflate + chunk CRC verification + all five
    # scanline filters reconstructed — the encoder cycles filter types
    # per row, so unfiltering is genuinely on the checked path). Same
    # closed-form pixel content as the BMP entry, so the SAME oracle
    # re-derives the stats from the formula; the decode stage sniffs the
    # container from magic bytes. JPEG/MP3/H.264 remain behind the
    # explicit StubImageCodec boundary (no stdlib codec exists).
    from .operators.multimodal import attach_png_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_png_payloads(t["documents"])
    return extract_image_stats(media)


def _q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fourth real codec behind the multimodal boundary, and the one a
    # real multimodal corpus always contains: BASELINE JPEG, pure
    # stdlib (marker walk, canonical huffman reconstruction from DHT,
    # DPCM DC + EOB/ZRL run-length AC entropy decode, dequantize,
    # dezigzag, float IDCT). JPEG is lossy, so the fixture makes the
    # loss provably zero instead of tolerated: every 8x8 block is
    # constant, whose DCT is a single integer DC coefficient stored
    # exactly under the all-ones quantization table — decode is
    # bit-exact by construction and the oracle re-derives the stats
    # from the per-block closed form (sum = 64 * block value). Color/
    # subsampled/progressive JPEG remain behind the documented
    # StubImageCodec boundary.
    from .operators.multimodal import attach_jpeg_payloads, extract_image_stats

    t = register_tables(spark, sf_dir)
    media = attach_jpeg_payloads(t["documents"])
    return extract_image_stats(media)


_MULTIMODAL_JPEG_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 3 + 1 AS INT) AS wb,
         CAST(doc_id % 2 + 1 AS INT) AS hb
  FROM documents
),
blk AS (
  SELECT d.doc_id, d.wb * 8 AS width, d.hb * 8 AS height,
         (d.doc_id*7 + by.by*31 + bx.bx*3) % 256 AS v
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.hb)) AS by) by,
       LATERAL (SELECT unnest(range(0, d.wb)) AS bx) bx
)
SELECT doc_id, width, height,
       CAST(SUM(v) * 64 AS BIGINT) AS r_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS g_sum,
       CAST(SUM(v) * 64 AS BIGINT) AS b_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM blk GROUP BY doc_id, width, height
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

    from .functions.tfexample import (
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


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same meet-in-the-middle check for audio: real PCM16 mono WAV
    # containers (RIFF/fmt/data chunks) decoded by a chunk-walking
    # parser; the oracle replays the sample formula.
    from .operators.multimodal import attach_wav_payloads, extract_audio_stats

    t = register_tables(spark, sf_dir)
    media = attach_wav_payloads(t["documents"])
    return extract_audio_stats(media)


_MULTIMODAL_AUDIO_ORACLE = """
WITH n AS (
  SELECT doc_id, CAST(doc_id % 50 + 10 AS INT) AS n_samples FROM documents
),
s AS (
  SELECT n.doc_id, n.n_samples,
         ((n.doc_id*13 + i.i*17) % 65536) - 32768 AS v
  FROM n, LATERAL (SELECT unnest(range(0, n.n_samples)) AS i) i
)
SELECT doc_id,
       8000 AS sample_rate,
       n_samples,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       CAST(MIN(v) AS INT) AS s_min,
       CAST(MAX(v) AS INT) AS s_max
FROM s GROUP BY doc_id, n_samples
"""


def _q_pit_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4 breadth: composite entity key (user_id, event_type) — the as-of
    # join's equi-conjuncts span both keys plus the created-ts tie-break.
    register_tables(spark, sf_dir)
    spine = f"""
        SELECT user_id, event_type, event_timestamp
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        CROSS JOIN {_SNAPSHOTS}
    """
    df = materialize_features(
        spark,
        entity_query=spine,
        features=["user_type_events:value"],
        registry=testdata_registry(),
        sf_dir=sf_dir,
    )
    return df.select(
        F.col("user_id"),
        F.col("event_type"),
        F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
        F.col("value"),
    )


_PIT_COMPOSITE_ORACLE = f"""
WITH spine AS (
  SELECT user_id, event_type, event_timestamp
  FROM (SELECT DISTINCT user_id, event_type FROM events)
  CROSS JOIN {_SNAPSHOTS}
),
cand AS (
  SELECT s.user_id, s.event_type, s.event_timestamp, e.value,
         ROW_NUMBER() OVER (
           PARTITION BY s.user_id, s.event_type, s.event_timestamp
           ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM spine s
  JOIN events e ON e.user_id = s.user_id AND e.event_type = s.event_type
               AND e.ts <= s.event_timestamp
)
SELECT s.user_id, s.event_type,
       CAST(epoch(s.event_timestamp) AS BIGINT) AS snapshot_ts,
       c.value
FROM spine s
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.user_id = s.user_id AND c.event_type = s.event_type
 AND c.event_timestamp = s.event_timestamp
"""


def _q_pit_field_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3: registry field_mapping renames source `value` to feature
    # `activity_value` before selection; same as-of semantics otherwise.
    register_tables(spark, sf_dir)
    df = materialize_features(
        spark,
        entity_query=_SPINE_SQL,
        features=["user_events_renamed:activity_value"],
        registry=testdata_registry(),
        sf_dir=sf_dir,
    )
    return df.select(
        F.col("user_id"),
        F.unix_timestamp("event_timestamp").alias("snapshot_ts"),
        F.col("activity_value"),
    )


_PIT_FIELD_MAPPING_ORACLE = _pit_oracle().replace(
    "c.value, c.event_type", "c.value AS activity_value"
)


def _q_param_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D2: span/range bind-parameter substitution through the real user
    # path (sources.examplegen.substitute_params; reference pattern
    # usage_prototype.py:46-48). The oracle inlines the same literals by
    # hand, so the substitution engine itself is what's under test.
    import datetime as dt

    from .sources.examplegen import substitute_params

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


def _q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Skew-salted two-stage aggregation vs the plain-groupBy oracle:
    # result equivalence is the contract (salting changes the shuffle
    # layout, never the answer). l_returnflag has 3 hot values — each
    # spreads over n_salts stage-1 reducers.
    from .operators.skew import salted_agg

    t = register_tables(spark, sf_dir)
    out = salted_agg(
        t["lineitem"],
        ["l_returnflag"],
        {
            "n_rows": ("count", "l_quantity"),
            "sum_qty": ("sum", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        "min_price",
        "max_price",
    )


_SALTED_AGG_ORACLE = """
SELECT l_returnflag, count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style within-doc repeated-n-gram signals, as a no-shuffle
    # scan-time projection.
    from .operators.text import intra_doc_repetition

    t = register_tables(spark, sf_dir)
    return intra_doc_repetition(t["documents"], n=3)


_REPETITION_ORACLE = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                              x -> x <> '') AS w
           FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT s) AS BIGINT) AS n_distinct_grams
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_distinct_grams, 0) AS n_distinct_grams,
       round((coalesce(a.n_grams, 0) - coalesce(a.n_distinct_grams, 0)) * 1.0
             / greatest(coalesce(a.n_grams, 0), 1), 4) AS rep_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scrub synthetic PII appended to each doc; output md5 of the
    # redacted text so the oracle checks byte-identical transformation.
    from .operators.text import redact_pii

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 123-4567 at 192.168.0."),
            F.col("doc_id").cast("string"),
        ),
    )
    return redact_pii(docs).select("doc_id", F.md5("text").alias("redacted_md5"))


_PII_REDACTION_ORACLE = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 (555) 123-4567 at 192.168.0.'
              || CAST(doc_id AS VARCHAR),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g'),
         '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g')) AS redacted_md5
FROM documents
"""


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TFDV-style feature statistics: fixed-width histogram of order
    # totals per priority — bin assignment is scan-time arithmetic, the
    # shuffle carries only (group, bin) partial counts. floor of a linear
    # map on identical doubles replays exactly in the oracle.
    from .operators.stats import fixed_width_histogram

    t = register_tables(spark, sf_dir)
    return fixed_width_histogram(
        t["orders"],
        "o_totalprice",
        lo=0.0,
        hi=600000.0,
        n_bins=12,
        group_cols=["o_orderpriority"],
    )


_HISTOGRAM_ORACLE = """
WITH binned AS (
  SELECT o_orderpriority,
         CAST(least(greatest(floor((o_totalprice - 0.0) / 50000.0), 0), 11)
              AS INT) AS bin
  FROM orders
)
SELECT o_orderpriority, bin,
       round(0.0 + bin * 50000.0, 6) AS bin_lo,
       round(0.0 + (bin + 1) * 50000.0, 6) AS bin_hi,
       CAST(count(*) AS BIGINT) AS n
FROM binned GROUP BY o_orderpriority, bin
"""


def _q_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Model inference at scan time: a seeded linear probe scored over
    # every embedding as a pure expression (no UDF — the curation-
    # classifier shape), aggregated per label. Scores round to 6 before
    # the integer-e4 digest so engine last-ulp float differences are
    # absorbed (the cosine-oracle precedent); the digest sum is then
    # order-free BIGINT arithmetic.
    import random as _random

    rng = _random.Random(7)
    w = [round(rng.uniform(-1, 1), 4) for _ in range(64)]
    t = register_tables(spark, sf_dir)
    scored = sim.linear_score(t["embeddings"], w, bias=-0.05)
    s6 = F.round(F.col("score"), 6)
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((s6 > 0).cast("long")).alias("n_positive"),
        F.sum(
            F.floor(s6 * 10000 + F.lit(0.5)).cast("long")
        ).alias("score_e4_sum"),
    )


def _linear_scorer_oracle() -> str:
    import random as _random

    rng = _random.Random(7)
    w = [round(rng.uniform(-1, 1), 4) for _ in range(64)]
    w_sql = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in w) + "]"
    return f"""
WITH scored AS (
  SELECT label,
         round(list_dot_product(CAST(embedding AS DOUBLE[]), {w_sql})
               + CAST(-0.05 AS DOUBLE), 6) AS s6
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN s6 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
       CAST(sum(CAST(floor(s6 * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS score_e4_sum
FROM scored GROUP BY label
"""


def _q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucketed co-located join: both sides materialized bucketed on the
    # join key (the one-time layout cost), after which the join plans
    # with NO exchange on either side — the 100 TB pattern for feature
    # tables that are joined on every retrieval. The oracle joins the
    # raw parquet, proving bucketing changed the physical plan only.
    from .sources.bucketing import register_bucketed_feature_table

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
    from .operators.snapshot import snapshot_diff

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


def _q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The "materialize to online store" shape (Feast materialize): latest
    # feature row per entity as of now — max_by agg, one map-side-
    # combinable shuffle (vs the oracle's full window sort).
    t = register_tables(spark, sf_dir)
    ev = t["events"]
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("value", "event_type"),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("__p"),
            F.max("ts").alias("__ts"),
        )
        .select(
            "user_id",
            # unix_micros, not unix_timestamp: event times are fractional
            # seconds, and second-granular casts disagree across engines
            # (Spark truncates, DuckDB's double->BIGINT cast rounds).
            F.unix_micros("__ts").alias("last_ts_us"),
            F.col("__p.value").alias("value"),
            F.col("__p.event_type").alias("event_type"),
        )
    )


_LATEST_SNAPSHOT_ORACLE = """
WITH ranked AS (
  SELECT user_id, ts, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, epoch_us(ts) AS last_ts_us, value, event_type
FROM ranked WHERE rn = 1
"""


# GROUPING SETS + FILTER-ed aggregates + grouping() markers (A2 breadth).
_QGROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
       round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""

# Correlated scalar subquery (decorrelated by Catalyst into a join;
# integer counts keep membership engine-exact).
_QCORRELATED = """
SELECT o_orderkey,
       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items
FROM orders o
WHERE (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) >= 6
"""


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Calendar gap-fill: dense daily spine (sequence/explode) LEFT JOIN
    # per-day revenue, absent days filled with zeros — the time-series
    # completion every metrics pipeline needs.
    register_tables(spark, sf_dir)
    return spark.sql("""
        WITH days AS (
          SELECT explode(sequence(DATE '2024-01-01', DATE '2024-02-10',
                                  INTERVAL 1 DAY)) AS d
        ),
        rev AS (
          SELECT CAST(ts AS DATE) AS d, round(sum(value), 2) AS revenue,
                 count(*) AS n_events
          FROM events GROUP BY CAST(ts AS DATE)
        )
        SELECT CAST(unix_timestamp(CAST(days.d AS TIMESTAMP)) AS BIGINT) AS day_ts,
               coalesce(rev.revenue, 0.0) AS revenue,
               coalesce(rev.n_events, 0) AS n_events
        FROM days LEFT JOIN rev ON rev.d = days.d
    """)


_GAP_FILL_ORACLE = """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-02-10',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
rev AS (
  SELECT CAST(ts AS DATE) AS d, round(sum(value), 2) AS revenue,
         count(*) AS n_events
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT CAST(epoch(CAST(days.d AS TIMESTAMP)) AS BIGINT) AS day_ts,
       coalesce(rev.revenue, 0.0) AS revenue,
       coalesce(rev.n_events, 0) AS n_events
FROM days LEFT JOIN rev ON rev.d = days.d
"""

# Unpivot: Spark's stack() generator vs the oracle's UNION ALL rendering.
_QUNPIVOT_SPARK = """
SELECT c_custkey, kind, val FROM (
  SELECT c_custkey,
         stack(2, 'acctbal', c_acctbal,
                  'nationkey', CAST(c_nationkey AS DOUBLE)) AS (kind, val)
  FROM customer
)
"""

_QUNPIVOT_ORACLE = """
SELECT c_custkey, 'acctbal' AS kind, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
"""

# Interval RANGE window frame: trailing 7-day per-user running revenue
# (event-time range frame, peers included deterministically).
_QRANGE_WINDOW = """
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS v7d
FROM events
"""


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eval-set decontamination: corpus docs sharing any 3-gram with the
    # pseudo-benchmark slice (every 20th doc) are dropped. n=3 because
    # fixture docs are short; production default is 8.
    from .operators.curation import decontaminate

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, benchmark, n=3).select("doc_id", "source")


_DECONTAMINATE_ORACLE = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
cw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM corpus),
csh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM cw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
bw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM bench),
bsh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
  FROM bw, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i)
),
bad AS (SELECT DISTINCT doc_id FROM csh WHERE s IN (SELECT s FROM bsh))
SELECT doc_id, source FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
"""


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic domain-mix downsampling: per-status fractions via the
    # portable fingerprint hash (no RNG — identical row set on any
    # engine/cluster).
    from .operators.curation import stratified_sample

    t = register_tables(spark, sf_dir)
    out = stratified_sample(
        t["orders"],
        "o_orderkey",
        "o_orderstatus",
        {"F": 0.2, "O": 0.1, "P": 0.5},
    )
    return out.select("o_orderkey", "o_orderstatus")


_STRATIFIED_SAMPLE_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE ((o_orderkey * 2654435761) % 2147483648 + 2147483648) % 2147483648 % 10000
      < CASE o_orderstatus WHEN 'F' THEN 2000 WHEN 'O' THEN 1000
                           WHEN 'P' THEN 5000 ELSE 0 END
"""


def _q_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-source document cap: keep the 5 longest docs per source
    # (ties by doc_id) — the data-mixing quota operator.
    from .operators.curation import group_quota

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn("n_chars", F.length("text"))
    out = group_quota(
        docs, "source", "n_chars", 5, id_col="doc_id", descending=True
    )
    return out.select(
        "source", "doc_id", "n_chars", F.col("quota_rank").cast("long").alias("quota_rank")
    )


_GROUP_QUOTA_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, length(text) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY length(text) DESC, doc_id) AS quota_rank
  FROM documents
)
SELECT source, doc_id, n_chars, quota_rank FROM ranked WHERE quota_rank <= 5
"""


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Concat-and-chunk packing: per source, docs in id order are cut into
    # 512-token packs; each doc annotated with (pack_id, pack_offset).
    from .operators.curation import pack_sequences

    t = register_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    out = pack_sequences(
        docs, group_col="source", id_col="doc_id", token_col="n_tokens",
        budget=512,
    )
    return out.select("source", "doc_id", "n_tokens", "pack_id", "pack_offset")


_SEQUENCE_PACKING_ORACLE = """
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start
  FROM t
)
SELECT source, doc_id, n_tokens,
       CAST(floor(start / 512) AS BIGINT) AS pack_id,
       CAST(start % 512 AS BIGINT) AS pack_offset
FROM c
"""


def _q_ann_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANN recall made driver-visible: IVF with n_probe = n_cells probes
    # every cell, so the candidate set is the full corpus and the result
    # provably equals exact top-k — hash-checked against the same oracle
    # as similarity_topk. The approximate variants (similarity_ann_lsh /
    # _ivf) keep their rows-only entries; this locks the ANN machinery
    # (quantizer, cell equi-join, re-rank) to the exact answer.
    t = register_tables(spark, sf_dir)
    out = sim.ivf_topk(
        t["embeddings"],
        query_filter="vec_id < 20",
        k=5,
        n_cells=16,
        n_probe=16,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cos", 4).alias("cos"),
        F.col("rank").cast("long").alias("rank"),
    )


def _q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ANN recall CONTRACT as an oracle row (same pattern as the
    # sketch error bounds): multi-probe LSH top-5 is compared against the
    # exact top-5 computed in the same query, and the single output row
    # asserts mean recall@5 >= 0.7 (measured 0.89 at sf0.01 / 0.93 at
    # sf0.1 — deterministic: seeded hyperplanes over fixed data). The
    # oracle emits the query count and literal TRUE; an LSH change that
    # degrades recall below the contract turns the row red.
    t = register_tables(spark, sf_dir)
    ann = sim.lsh_topk(t["embeddings"], query_filter="vec_id < 20", k=5)
    exact = sim.cosine_topk(t["embeddings"], query_filter="vec_id < 20", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg(F.col("n_hits") / 5.0) >= 0.7).alias("recall_ok"),
    )


_ANN_LSH_RECALL_ORACLE = """
SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id < 20
"""

# Textually identical today, but a separate name so an LSH-specific edit
# (different query_filter / k) can't silently corrupt the IVF contract.
_ANN_IVF_RECALL_ORACLE = _ANN_LSH_RECALL_ORACLE
_ANN_PQ_RECALL_ORACLE = _ANN_LSH_RECALL_ORACLE  # same portable shape


def _q_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialized-index ANN as an equivalence CONTRACT: the corpus is
    # signed/banded once into parquet artifacts (write_ann_index), the
    # query batch probes the stored index with shortlist-then-fetch
    # vector retrieval, and the output row asserts the probe result is
    # ROW-IDENTICAL to the in-memory lsh_topk at the same parameters
    # (symmetric difference on (query_id, neighbor_id, rank) = 0). The
    # oracle emits the query count and literal TRUE.
    import tempfile as _tempfile

    t = register_tables(spark, sf_dir)
    emb = t["embeddings"]
    idx = _tempfile.mkdtemp(prefix="ann_index_")
    sim.write_ann_index(emb, idx, target_files=4)
    qbatch = emb.filter("vec_id < 20")
    via_index = sim.lsh_topk_indexed(qbatch, idx, k=5)
    in_mem = sim.lsh_topk(emb, query_filter="vec_id < 20", k=5)
    key = ["query_id", "neighbor_id", "rank"]
    a, b = via_index.select(*key), in_mem.select(*key)
    sym_diff = (
        a.join(b, key, "left_anti").unionByName(b.join(a, key, "left_anti"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_q = qbatch.agg(F.countDistinct("vec_id").alias("nq"))
    return n_q.crossJoin(F.broadcast(sym_diff)).select(
        F.col("nq").cast("long").alias("n_queries"),
        (F.col("n") == 0).alias("identical"),
    )


_ANN_INDEXED_ORACLE = """
SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
       TRUE AS identical
FROM embeddings WHERE vec_id < 20
"""


def _q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Product-quantization ADC recall contract (same pattern as the
    # LSH/IVF contracts): m=8 subspaces x 16 codes (8 bits -> 4 bytes of
    # code per 256-byte vector), ADC shortlist of 150 re-ranked exactly,
    # mean recall@5 >= 0.6 vs the exact top-5. Measured 0.95 at sf0.01 /
    # 0.70 at sf0.1 — deterministic (hash-seeded init over fixed data).
    # The fixture's near-random 64-dim embeddings are PQ's hard case
    # (little subspace structure to exploit); real text embeddings
    # cluster and quantize far better.
    t = register_tables(spark, sf_dir)
    ann = sim.pq_topk(
        t["embeddings"], query_filter="vec_id < 20", k=5,
        m=8, n_codes=16, shortlist=150,
    )
    exact = sim.cosine_topk(t["embeddings"], query_filter="vec_id < 20", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg(F.col("n_hits") / 5.0) >= 0.6).alias("recall_ok"),
    )


def _q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF recall contract (same pattern as the LSH one): probing half the
    # cells (n_probe=8 of 16) must reach mean recall@5 >= 0.6 against the
    # exact top-5 (measured 0.81 at sf0.01 / 0.77 at sf0.1 —
    # deterministic: hash-seeded k-means init over fixed data).
    t = register_tables(spark, sf_dir)
    ann = sim.ivf_topk(
        t["embeddings"], query_filter="vec_id < 20", k=5, n_cells=16, n_probe=8
    )
    exact = sim.cosine_topk(t["embeddings"], query_filter="vec_id < 20", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg(F.col("n_hits") / 5.0) >= 0.6).alias("recall_ok"),
    )


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The production multi-probe LSH as a PER-QUERY contract (finer than
    # the aggregate mean-recall twin similarity_ann_lsh_recall): for
    # EVERY query id, at least one true top-5 neighbor must appear in
    # the LSH top-5 (measured per-query minimum: 4/5 hits at sf0.001,
    # 2/5 at sf0.01, 4/5 at sf0.1 — deterministic, seeded hyperplanes).
    # One query falling to zero hits turns exactly its row red, so the
    # driver pinpoints which query regressed; the oracle emits the query
    # id set (portable) with literal TRUE.
    t = register_tables(spark, sf_dir)
    emb = t["embeddings"]
    ann = sim.lsh_topk(emb, query_filter="vec_id < 20", k=5)
    exact = sim.cosine_topk(emb, query_filter="vec_id < 20", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 1).alias("hit_ok"),
        )
    )


_ANN_LSH_PERQUERY_ORACLE = """
SELECT DISTINCT CAST(vec_id AS BIGINT) AS query_id, TRUE AS hit_ok
FROM embeddings WHERE vec_id < 20
"""


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The production IVF config (n_probe=4 of 16 cells) under its own
    # aggregate recall contract — distinct from the n_probe=8 twin
    # (similarity_ann_ivf_recall, floor 0.6): probing a quarter of the
    # cells must still reach mean recall@5 >= 0.3 (measured 0.48-0.54
    # across sf0.001/0.01/0.1; per-query floors don't hold at n_probe=4,
    # the minimum is legitimately 0 for queries whose neighbors live in
    # unprobed cells). Deterministic: hash-seeded k-means over fixed
    # data. Oracle: portable query count + literal TRUE.
    t = register_tables(spark, sf_dir)
    emb = t["embeddings"]
    ann = sim.ivf_topk(
        emb, query_filter="vec_id < 20", k=5, n_cells=16, n_probe=4
    )
    exact = sim.cosine_topk(emb, query_filter="vec_id < 20", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg(F.col("n_hits") / 5.0) >= 0.3).alias("recall_ok"),
    )


_ANN_IVF_PROBE4_ORACLE = _ANN_LSH_RECALL_ORACLE  # same portable shape


# ---------------------------------------------------------------------------
# DataFrame-API conversions of former identical-SQL-text entries (round 6).
# The SQL string these used to execute verbatim becomes the INDEPENDENT
# oracle: the engine runs a declaratively-built DataFrame plan, DuckDB
# runs the SQL, and the hashes must meet — upgrading the evidence class
# from ANSI-compat to engine correctness (VERDICT r5, "What's missing" #2).
# ---------------------------------------------------------------------------


def _q_mad_outliers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Robust outliers: per-type median + MAD (two exact-percentile
    # aggregates), events > 3 sigma-equivalents away. Both stat frames
    # are one-row-per-type — broadcast, so the events scan never
    # shuffles for the joins.
    t = register_tables(spark, sf_dir)
    e = t["events"]
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("dev")
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(
            F.abs(F.col("value") - F.col("med"))
            > F.lit(3) * F.lit(1.4826) * F.col("mad")
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
        )
    )


def _q_percent_rank_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return t["events"].select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.floor(F.percent_rank().over(w) * 10000)
        .cast("bigint")
        .alias("pct_rank_bp"),
    )


def _q_epoch_shuffle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic epoch shuffle: Knuth-hash the ids, NTILE into 8
    # shards over the hash order. The global NTILE window is the
    # documented scale boundary of this entry (one sort partition);
    # the production path for sharding at 100 TB is hash_split /
    # epoch_shuffle in operators/split.py.
    t = register_tables(spark, sf_dir)
    h = t["documents"].select(
        "doc_id",
        (
            (
                (F.col("doc_id") * F.lit(2654435761) + F.lit(3 * 40503))
                % F.lit(2147483648)
                + F.lit(2147483648)
            )
            % F.lit(2147483648)
        ).alias("hkey"),
    )
    sharded = h.withColumn(
        "shard", F.ntile(8).over(Window.orderBy("hkey", "doc_id"))
    )
    return sharded.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_digest"),
        F.min("hkey").cast("bigint").alias("min_h"),
        F.max("hkey").cast("bigint").alias("max_h"),
    )


def _q_kfold_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    f = t["events"].select(
        "user_id",
        "value",
        (
            (
                (F.col("user_id") * F.lit(2654435761)) % F.lit(2147483648)
                + F.lit(2147483648)
            )
            % F.lit(2147483648)
            % F.lit(5)
        ).alias("fold"),
    )
    return f.groupBy(F.col("fold").cast("int").alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("user_id").cast("bigint").alias("user_digest"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )


def _q_wsample_wor_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis weighted sampling without replacement:
    # priority = -ln(u)/weight with a deterministic hash-derived u,
    # global top-100 by priority (TakeOrdered — no full sort).
    t = register_tables(spark, sf_dir)
    u = (
        (
            (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
            + F.lit(2147483648)
        )
        % F.lit(2147483648)
        % F.lit(10000)
        + F.lit(0.5)
    ) / F.lit(10000.0)
    keyed = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.floor(
                -F.log(u) / F.col("n_chars") * F.lit(1000000000)
            )
            .cast("bigint")
            .alias("prio_nano"),
        )
    )
    return keyed.orderBy("prio_nano", "doc_id").limit(100)


def _q_retention_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohort retention triangle: first-activity week per user joined to
    # the user's distinct active weeks, counted by (cohort, offset).
    t = register_tables(spark, sf_dir)
    e = t["events"]
    fw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = e.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    return (
        act.join(fw, "user_id")
        .groupBy(
            F.col("cw").cast("date").alias("cohort_week"),
            F.floor(
                (F.unix_timestamp("w") - F.unix_timestamp("cw"))
                / F.lit(604800)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


def _q_decayed_activity_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Half-life-decayed engagement score (7-day half-life anchored at a
    # fixed as-of timestamp); the decay constant stays an in-engine
    # expression so the floor boundary floats identically to the r1-5
    # SQL form.
    t = register_tables(spark, sf_dir)
    aged = t["events"].select(
        "user_id",
        "value",
        (
            (
                F.expr("unix_micros(TIMESTAMP'2024-04-01 00:00:00')")
                - F.unix_micros("ts")
            )
            / F.lit(86400000000.0)
        ).alias("age_days"),
    )
    decayed = F.exp(F.expr("-(ln(2) / 7)") * F.col("age_days"))
    return aged.groupBy("user_id").agg(
        F.sum(F.floor(decayed * F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("score_centi"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def _q_event_pmi_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pointwise mutual information between event types co-occurring in
    # a user's history: distinct (user, type) self-join on user with
    # type_a < type_b, marginals and the corpus total broadcast onto
    # the pair counts.
    t = register_tables(spark, sf_dir)
    e = t["events"]
    s = e.select("user_id", "event_type").distinct()
    n = e.agg(F.countDistinct("user_id").alias("n"))
    singles = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        s.alias("a")
        .join(
            s.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = singles.select(
        F.col("event_type").alias("type_a"), F.col("c").alias("ca")
    )
    cb = singles.select(
        F.col("event_type").alias("type_b"), F.col("c").alias("cb")
    )
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.floor(
                F.log(
                    F.col("n_both").cast("double")
                    * F.col("n")
                    / (F.col("ca") * F.col("cb"))
                )
                * F.lit(1000000)
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )


def _q_rolling_wau_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 7-day rolling weekly-active-users per calendar day: the distinct
    # day spine is tiny — broadcast it against distinct (user, day)
    # activity with a range predicate, then count distinct users per
    # anchor day.
    t = register_tables(spark, sf_dir)
    e = t["events"]
    days = e.select(F.col("ts").cast("date").alias("d")).distinct()
    act = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    return (
        act.alias("a")
        .join(
            F.broadcast(days.select(F.col("d").alias("day"))),
            (F.col("a.d") >= F.date_sub(F.col("day"), 6))
            & (F.col("a.d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("a.user_id").cast("bigint").alias("wau"))
    )


def _q_time_rollup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-grain rollup in one pass: GROUPING SETS (day), (week),
    # (month) via the DataFrame groupingSets API, grouping() flags
    # identifying the grain of each output row.
    t = register_tables(spark, sf_dir)
    inner = t["events"].select(
        "value",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("w"),
        F.date_trunc("month", "ts").alias("m"),
    )
    return (
        inner.groupingSets([["d"], ["w"], ["m"]], "d", "w", "m")
        .agg(
            F.grouping("d").cast("int").alias("g_day"),
            F.grouping("w").cast("int").alias("g_week"),
            F.grouping("m").cast("int").alias("g_month"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            "g_day",
            "g_week",
            "g_month",
            F.col("d").cast("date").alias("day"),
            F.col("w").cast("date").alias("week"),
            F.col("m").cast("date").alias("month"),
            "n_events",
            "value_cents",
        )
    )


def _q_rolling_z_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trailing-window anomaly detection: per-user mean/stddev over the
    # 7 rows BEFORE each event (rowsBetween(-7, -1) — the current row
    # never contaminates its own baseline), z-scores >= 1.5 flagged.
    t = register_tables(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, -1)
    )
    w = t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("n_win"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        w.filter(
            (F.col("n_win") == 7) & (F.col("sd") > 0) & (F.abs(z) >= 1.5)
        )
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


def _q_novelty_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-source novelty of a held-out half against a base half: 3-gram
    # shingles, odd-doc shingles anti-joined against the distinct even
    # half, rate in basis points.
    t = register_tables(spark, sf_dir)
    # The CASE guard matters: for a <3-token doc, sequence(1, 0) in
    # Spark DESCENDS to [1, 0] and slice(..., 0, 3) then raises — a
    # short doc anywhere in the corpus would fail the job (the DuckDB
    # oracle's generate_series is empty for the same doc). Emitting an
    # empty array makes both engines agree: no shingles, row drops at
    # the explode.
    shingle_expr = (
        "CASE WHEN size(split(lower(text), ' ')) >= 3 THEN "
        "transform(sequence(1, size(split(lower(text), ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(lower(text), ' '), i, 3))) "
        "ELSE array() END"
    )
    sh = (
        t["documents"]
        .select(
            "doc_id", "source", F.explode(F.expr(shingle_expr)).alias("s")
        )
        .distinct()
    )
    base = sh.filter(F.col("doc_id") % 2 == 0).select("s").distinct()
    odd = sh.filter(F.col("doc_id") % 2 == 1)
    novel = (
        odd.select("source", "s")
        .join(base, "s", "left_anti")
        .groupBy("source")
        .agg(F.countDistinct("s").alias("n_new"))
    )
    tot = odd.groupBy("source").agg(F.countDistinct("s").alias("n_all"))
    n_new = F.coalesce(F.col("n_new"), F.lit(0))
    return tot.join(novel, "source", "left").select(
        "source",
        F.col("n_all").cast("bigint").alias("n_shingles"),
        n_new.cast("bigint").alias("n_novel"),
        F.floor(F.lit(10000.0) * n_new / F.col("n_all"))
        .cast("bigint")
        .alias("novelty_bp"),
    )


def _q_fk_audit_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Referential-integrity audit as relational algebra: orphans via
    # left-anti join, duplicate parents via a HAVING-style aggregate;
    # one row per relationship (all count frames are 1-row, so the
    # crossJoins are literal-scale).
    t = register_tables(spark, sf_dir)

    def rel(name: str, child, ckey: str, parent, pkey: str) -> DataFrame:
        orphans = (
            child.join(
                parent, child[ckey] == parent[pkey], "left_anti"
            ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        dups = (
            parent.groupBy(pkey)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_parents"))
        )
        return orphans.crossJoin(dups).select(
            F.lit(name).alias("relationship"), "n_orphans", "n_dup_parents"
        )

    return (
        rel(
            "orders.o_custkey -> customer",
            t["orders"], "o_custkey", t["customer"], "c_custkey",
        )
        .unionByName(
            rel(
                "lineitem.l_orderkey -> orders",
                t["lineitem"], "l_orderkey", t["orders"], "o_orderkey",
            )
        )
        .unionByName(
            rel(
                "nation.n_regionkey -> region",
                t["nation"], "n_regionkey", t["region"], "r_regionkey",
            )
        )
    )


def _q_pareto_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Revenue concentration: customer spend deciles (global NTILE over
    # the per-customer aggregate — one row per customer, documented
    # single-sort-partition boundary) with share-of-total in basis
    # points via a broadcast 1-row total.
    t = register_tables(spark, sf_dir)
    spend = t["orders"].groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .alias("cents")
    )
    ranked = spend.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("cents"), "o_custkey")),
    )
    tot = spend.agg(F.sum("cents").alias("t"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(F.col("decile").cast("int").alias("decile"), F.col("t"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("spend_cents"),
            F.floor(F.lit(10000.0) * F.sum("cents") / F.col("t"))
            .cast("bigint")
            .alias("share_bp"),
        )
        .select("decile", "n_customers", "spend_cents", "share_bp")
    )


def _q_cusum_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUSUM changepoint signal: daily per-type means centred on the
    # grand mean, cumulatively summed in day order; excursions past the
    # threshold flag a level shift.
    t = register_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    g = daily.groupBy("event_type").agg(
        (F.sum("cents").cast("double") / F.sum("n")).alias("gmean")
    )
    cusum = F.sum(
        F.col("cents").cast("double") / F.col("n") - F.col("gmean")
    ).over(Window.partitionBy("event_type").orderBy("d"))
    return (
        daily.join(F.broadcast(g), "event_type")
        .withColumn("cusum", cusum)
        .filter(F.abs(F.col("cusum")) >= 200)
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.round("cusum", 2).cast("double").alias("cusum_cents"),
        )
    )


def _q_gap_stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inter-event cadence profile per type: lag() gaps in seconds,
    # exact interpolated median and p90 — the distribution TTL and
    # watermark settings are tuned from.
    t = register_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = t["events"].select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts2"),
        F.lag(F.col("ts").cast("timestamp")).over(w).alias("prev_ts"),
    )
    d = gaps.filter(F.col("prev_ts").isNotNull()).select(
        "event_type",
        F.floor(
            (F.unix_micros("ts2") - F.unix_micros("prev_ts"))
            / F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("gap_s"),
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 2).alias("p90_gap_s"),
    )


def _q_ols_trend_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group OLS trend via the regr_* aggregate family (one pass,
    # map-side combinable — no per-group matrix solve).
    t = register_tables(spark, sf_dir)
    x = F.unix_micros("ts") / F.lit(86400e6)
    return t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Registry: name -> (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

# Ordering contract: the driver's correctness harness records only the
# FIRST 50 dict entries (insertion order).  `pit_join` stays at position 0
# (entry() smoke check); entries that have never produced a driver
# correctness row — plus entries fixed or added this round — come next so
# they land inside the checked window; entries with driver-green rows from
# rounds 1-2 are rotated to the tail (each still re-proved every round by
# scripts/check_correctness.py over the full dict — see CORRECTNESS_LOCAL_*).
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "pit_join": (_q_pit_join, _pit_oracle()),
    # --- never driver-verified before round 3 (positions 50-85 in r2) ---
    "similarity_ann_exhaustive": (_q_ann_exhaustive, _SIM_TOPK_ORACLE),
    "windowed_event_counts": (_q_windowed_events, _WINDOWED_EVENTS_ORACLE),
    "windowed_event_counts_streaming": (
        _q_windowed_streaming,
        _WINDOWED_EVENTS_ORACLE,  # complete-mode stream ≡ batch aggregate
    ),
    "stream_stream_join": (_q_stream_stream_join, _STREAM_STREAM_JOIN_ORACLE),
    "stream_stream_left_join": (
        _q_stream_stream_left_join,
        _STREAM_STREAM_LEFT_JOIN_ORACLE,
    ),
    "stream_static_enrichment": (
        _q_stream_static_enrichment,
        _STREAM_STATIC_ENRICH_ORACLE,
    ),
    "source_jsonl_roundtrip": (_q_jsonl_roundtrip, _JSONL_ROUNDTRIP_ORACLE),
    "source_csv_roundtrip": (_q_csv_roundtrip, _CSV_ROUNDTRIP_ORACLE),
    "split_pattern_routing": (_q_split_routing, _SPLIT_ROUTING_ORACLE),
    "pit_join_prefixed": (_q_pit_prefixed, _PIT_PREFIXED_ORACLE),
    "pit_join_composite_key": (_q_pit_composite_key, _PIT_COMPOSITE_ORACLE),
    "pit_join_field_mapping": (_q_pit_field_mapping, _PIT_FIELD_MAPPING_ORACLE),
    "param_substitution": (_q_param_substitution, _PARAM_SUBSTITUTION_ORACLE),
    "skew_salted_agg": (_q_salted_agg, _SALTED_AGG_ORACLE),
    "decontaminate": (_q_decontaminate, _DECONTAMINATE_ORACLE),
    "stratified_sample": (_q_stratified_sample, _STRATIFIED_SAMPLE_ORACLE),
    "group_quota": (_q_group_quota, _GROUP_QUOTA_ORACLE),
    "sequence_packing": (_q_sequence_packing, _SEQUENCE_PACKING_ORACLE),
    "latest_feature_snapshot": (_q_latest_snapshot, _LATEST_SNAPSHOT_ORACLE),
    "text_repetition": (_q_repetition, _REPETITION_ORACLE),
    "pii_redaction": (_q_pii_redaction, _PII_REDACTION_ORACLE),
    "grouping_sets_filter": (_sql_query(_QGROUPING_SETS), _QGROUPING_SETS),
    "correlated_subquery": (_sql_query(_QCORRELATED), _QCORRELATED),
    "lateral_topk_per_key": (_sql_query(_QLATERAL), _QLATERAL),
    "udtf_split_sentences": (_q_udtf_sentences, _UDTF_SENTENCES_ORACLE),
    "embedding_quantization": (_q_embedding_quantization, _EMB_QUANT_ORACLE),
    "event_funnel": (_q_event_funnel_df, _QFUNNEL),
    "scd2_validity_intervals": (_sql_query(_QSCD2_SPARK), _QSCD2),
    "forward_fill_timeseries": (_q_forward_fill, _FORWARD_FILL_ORACLE),
    "negative_sample": (_q_negative_sample, _NEGATIVE_SAMPLE_ORACLE),
    "chunk_documents": (_q_chunk_documents, _CHUNK_DOCUMENTS_ORACLE),
    "column_correlations": (_q_column_correlations_df, _QCORR),
    "gap_fill_timeseries": (_q_gap_fill, _GAP_FILL_ORACLE),
    "unpivot_stack": (_sql_query(_QUNPIVOT_SPARK), _QUNPIVOT_ORACLE),
    "range_interval_window": (_sql_query(_QRANGE_WINDOW), _QRANGE_WINDOW),
    "dataset_stats": (_q_dataset_stats, _stats_oracle()),
    # --- fixed or added in round 3 ---
    "array_agg_sorted": (_sql_query(_QARRAY_AGG), _QARRAY_AGG_ORACLE),
    "sketch_distinct_counts": (_q_sketch_distinct, _SKETCH_DISTINCT_ORACLE),
    "sketch_quantiles": (_q_sketch_quantiles, _SKETCH_QUANTILES_ORACLE),
    "multimodal_features": (_q_multimodal, _MULTIMODAL_ORACLE),
    "multimodal_image_png": (_q_multimodal_png, _MULTIMODAL_ORACLE),
    "multimodal_image_jpeg": (_q_multimodal_jpeg, _MULTIMODAL_JPEG_ORACLE),
    "temperature_mix": (_q_temperature_mix, _TEMPERATURE_MIX_ORACLE),
    "text_heavy_hitters": (_q_heavy_hitters, _HEAVY_HITTERS_ORACLE),
    # new in r5 but OUTSIDE the r5 window (it is full): locally proven,
    # leads the r6 window with the eight deferred triple-proven entries
    "interpolate_timeseries": (
        _q_interpolate_timeseries,
        _INTERPOLATE_ORACLE,
    ),
    "text_unigram_logprob": (_q_unigram_logprob, _UNIGRAM_LOGPROB_ORACLE),
    "bpe_pair_merges": (_q_bpe_pair_merges, _BPE_PAIR_MERGES_ORACLE),
    "dedup_exact_substring": (_q_shared_run, _SHARED_RUN_ORACLE),
    "dedup_remove_shared_runs": (
        _q_remove_shared_runs,
        _REMOVE_SHARED_RUNS_ORACLE,
    ),
    "training_pipeline_v2": (
        _q_training_pipeline_v2,
        _TRAINING_PIPELINE_V2_ORACLE,
    ),
    "contrastive_hard_negatives": (_q_hard_negatives, _HARD_NEGATIVES_ORACLE),
    "similarity_ann_pq_recall": (_q_ann_pq_recall, _ANN_PQ_RECALL_ORACLE),
    "multimodal_image_resize": (_q_multimodal_resize, _MULTIMODAL_RESIZE_ORACLE),
    "text_bigram_logprob": (_q_bigram_logprob, _BIGRAM_LOGPROB_ORACLE),
    "length_bucketing": (_q_length_bucketing, _LENGTH_BUCKETING_ORACLE),
    "corpus_report": (_q_corpus_report, _CORPUS_REPORT_ORACLE),
    "source_overlap_audit": (_q_source_overlap, _SOURCE_OVERLAP_ORACLE),
    "retention_cohorts": (_q_retention_df, _QRETENTION_ORACLE),
    "similarity_ann_indexed": (_q_ann_indexed, _ANN_INDEXED_ORACLE),
    "nearest_event_join": (_q_nearest_event_join, _NEAREST_EVENT_ORACLE),
    "merge_upsert_cdc": (_q_merge_upsert, _MERGE_UPSERT_ORACLE),
    "decayed_activity_score": (_q_decayed_activity_df, _QDECAYED_ORACLE),
    "mad_outliers": (_q_mad_outliers_df, _QMAD_OUTLIERS),
    "time_rollup_multigrain": (_q_time_rollup_df, _QTIME_ROLLUP_ORACLE),
    "percent_rank_transform": (_q_percent_rank_df, _QPERCENT_RANK),
    "grouped_split_no_leakage": (_q_grouped_split, _GROUPED_SPLIT_ORACLE),
    "epoch_shuffle_shards": (_q_epoch_shuffle_df, _QEPOCH_SHUFFLE),
    "kfold_assignment": (_q_kfold_df, _QKFOLD),
    "dedup_containment_scoped": (_q_scoped_containment, _SCOPED_CONTAINMENT_ORACLE),
    "event_type_pmi": (_q_event_pmi_df, _QPMI_ORACLE),
    "rolling_wau": (_q_rolling_wau_df, _QWAU_ORACLE),
    "weighted_sample_wor": (_q_wsample_wor_df, _QWSAMPLE_WOR),
    "rolling_zscore_anomalies": (_q_rolling_z_df, _QROLLING_Z),
    "corpus_novelty_rate": (_q_novelty_df, _QNOVELTY_ORACLE),
    "fk_integrity_audit": (_q_fk_audit_df, _QFK_AUDIT),
    "revenue_concentration": (_q_pareto_df, _QPARETO),
    "cusum_changepoints": (_q_cusum_df, _QCUSUM),
    "sketch_hll_mergeable": (_q_sketch_hll_merge, _SKETCH_HLL_MERGE_ORACLE),
    "interevent_gap_stats": (_q_gap_stats_df, _QGAP_STATS),
    "dedup_pair_evidence": (_q_pair_evidence, _PAIR_EVIDENCE_ORACLE),
    "vocab_coverage_curve": (_q_vocab_coverage, _QVOCAB_COVERAGE_ORACLE),
    "streaming_matview_latest": (
        _q_streaming_matview,
        _STREAMING_MATVIEW_ORACLE,
    ),
    "source_orc_roundtrip": (_q_orc_roundtrip, _JSONL_ROUNDTRIP_ORACLE),
    "federated_union_agg": (_q_federated_union, _FEDERATED_UNION_ORACLE),
    "ivm_delta_agg": (_q_ivm_delta_agg, _IVM_DELTA_AGG_ORACLE),
    "graph_triangle_count": (_q_triangles, _QTRIANGLES_ORACLE),
    "props_map_explode": (_q_props_map, _PROPS_MAP_ORACLE),
    "stream_error_recovery": (
        _q_stream_error_recovery,
        _STREAM_RECOVERY_ORACLE,
    ),
    "recursive_chain_walk": (_sql_query(_QRECURSIVE_WALK), _QRECURSIVE_WALK),
    "variant_props_typed": (_q_variant_props, _VARIANT_PROPS_ORACLE),
    "table_time_travel_diff": (
        _q_time_travel_diff,
        _TIME_TRAVEL_DIFF_ORACLE,
    ),
    "table_pruned_scan": (_q_table_pruned_scan, _TABLE_PRUNED_SCAN_ORACLE),
    "group_ols_trend": (_q_ols_trend_df, _QOLS_TREND_ORACLE),
    "keyword_search_indexed": (_q_keyword_search, _KEYWORD_SEARCH_ORACLE),
    "bm25_ranked_search": (_q_bm25_search, _BM25_SEARCH_ORACLE),
    "phrase_search_positional": (_q_phrase_search, _PHRASE_SEARCH_ORACLE),
    "feature_drift_psi": (_q_feature_drift_psi, _FEATURE_DRIFT_PSI_ORACLE),
    "embedding_outliers": (_q_embedding_outliers, _EMBEDDING_OUTLIERS_ORACLE),
    "skew_report": (_q_skew_report, _SKEW_REPORT_ORACLE),
    "multimodal_audio_stats": (_q_multimodal_audio, _MULTIMODAL_AUDIO_ORACLE),
    "sequence_example_roundtrip": (
        _q_sequence_example_roundtrip,
        _SEQUENCE_EXAMPLE_ORACLE,
    ),
    "stream_dedup": (_q_stream_dedup, _STREAM_DEDUP_ORACLE),
    "zorder_layout": (_q_zorder_layout, _zorder_oracle()),
    "skew_salted_join": (_q_skew_salted_join, _SKEW_SALTED_JOIN_ORACLE),
    "three_way_split_counts": (_q_three_way_split, _THREE_WAY_SPLIT_ORACLE),
    "source_tfrecord_roundtrip": (
        _q_tfrecord_roundtrip,
        _TFRECORD_ROUNDTRIP_ORACLE,
    ),
    "q7_nation_volume": (_sql_query(_Q7), _Q7),
    "q10_returned_items": (_sql_query(_Q10), _Q10),
    "q18_large_orders": (_sql_query(_Q18), _Q18),
    "snapshot_diff": (_q_snapshot_diff, _SNAPSHOT_DIFF_ORACLE),
    "bucketed_join": (_q_bucketed_join, _BUCKETED_JOIN_ORACLE),
    "embedding_linear_scorer": (_q_linear_scorer, _linear_scorer_oracle()),
    "feature_histogram": (_q_histogram, _HISTOGRAM_ORACLE),
    "similarity_ann_lsh_recall": (_q_ann_lsh_recall, _ANN_LSH_RECALL_ORACLE),
    "embedding_dedup_clusters": (_q_embedding_clusters, _EMB_CLUSTERS_ORACLE),
    "similarity_ann_ivf_recall": (_q_ann_ivf_recall, _ANN_IVF_RECALL_ORACLE),
    "dedup_simhash": (_q_simhash, _SIMHASH_CONTRACT_ORACLE),
    # --- driver-green in rounds 1-2; rotated behind the 50-entry window ---
    "pit_join_ttl": (_q_pit_join_ttl, _pit_oracle(ttl_days=7)),
    "pit_join_time_bucketed": (_q_pit_join_bucketed, _pit_oracle(ttl_days=7)),
    "pit_join_multiview": (_q_pit_multiview, _PIT_MULTIVIEW_ORACLE),
    "feature_service": (_q_feature_service, _pit_oracle()),
    "hash_split_counts": (_q_split_counts, _SPLIT_ORACLE),
    "q1_pricing_summary": (_sql_query(_Q1), _Q1),
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
    "window_topk_running": (_q_window_topk_df, _QWINDOW),
    "setop_intersect": (_sql_query(_QSETOPS), _QSETOPS),
    "setop_except": (_sql_query(_QEXCEPT), _QEXCEPT),
    "json_events_daily": (_sql_query(_QJSON_SPARK), _QJSON_ORACLE),
    "having_subquery": (_sql_query(_QHAVING), _QHAVING),
    "rollup_region_nation": (_sql_query(_QROLLUP), _QROLLUP),
    "anti_join_exists": (_sql_query(_QANTI), _QANTI),
    "string_funcs_parts": (_sql_query(_QSTRING), _QSTRING),
    "monthly_order_delta": (
        _sql_query(
            _QMONTHLY.replace("epoch(date_trunc", "unix_timestamp(date_trunc")
        ),
        _QMONTHLY,
    ),
    "sessionization": (_sql_query(_QSESSION_SPARK), _QSESSION),
    "window_lead_lag_ntile": (_sql_query(_QWINDOW_FULL), _QWINDOW_FULL),
    "percentiles": (_sql_query(_QPERCENTILE), _QPERCENTILE),
    "cube_lattice": (_sql_query(_QCUBE), _QCUBE),
    "case_pivot": (_sql_query(_QPIVOT), _QPIVOT),
    "text_bpe_token_budget": (_q_bpe_tokens, _BPE_TOKENS_ORACLE),
    "sessionization_streaming": (
        _q_sessionization_streaming,
        _SESSIONIZATION_STREAM_ORACLE,  # sentinel-watermark full replay
    ),
    "corpus_prep_pipeline": (_q_corpus_prep, _corpus_prep_oracle()),
    "training_dataset_pipeline": (
        _q_training_dataset_pipeline,
        _training_dataset_oracle(),
    ),
    # north-star extensions
    "dedup_exact": (_q_dedup_exact, _DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": (_q_jaccard, _JACCARD_ORACLE),
    "dedup_jaccard_prefix_filter": (_q_jaccard_prefix, _JACCARD_ORACLE),
    "dedup_minhash_lsh": (_q_minhash, _JACCARD_ORACLE),
    "dedup_simhash_portable": (_q_simhash_portable, _simhash_portable_oracle()),
    "dedup_containment": (_q_containment, _CONTAINMENT_ORACLE),
    "dedup_clusters": (_q_dedup_clusters, _DEDUP_CLUSTERS_ORACLE),
    "dedup_incremental": (_q_dedup_incremental, _DEDUP_INCREMENTAL_ORACLE),
    "dedup_incremental_indexed": (
        _q_dedup_incremental_indexed,
        _DEDUP_INCREMENTAL_ORACLE,
    ),
    "weighted_sample": (_q_weighted_sample, _weighted_sample_oracle()),
    "text_tfidf_topterms": (_q_tfidf, _TFIDF_ORACLE),
    "text_quality": (_q_text_quality, _TEXT_QUALITY_ORACLE),
    "text_lang_id": (_q_lang_id, _langid_case()),
    "text_token_stats": (_q_token_stats, _TOKEN_STATS_ORACLE),
    "text_fingerprint": (_q_fingerprints, _FINGERPRINT_ORACLE),
    "similarity_topk": (_q_similarity_topk, _SIM_TOPK_ORACLE),
    "embedding_neardup": (_q_embedding_neardup, _EMB_NEARDUP_ORACLE),
    "similarity_ann_lsh": (_q_ann_lsh, _ANN_LSH_PERQUERY_ORACLE),
    "similarity_ann_ivf": (_q_ann_ivf, _ANN_IVF_PROBE4_ORACLE),
}


# Driver-window ordering: the correctness harness records only the FIRST
# 50 dict entries, so entries whose implementation changed this round —
# plus entries whose last driver-green row is oldest — are surfaced ahead
# of recently-re-verified ones. pit_join stays at position 0 (entry()
# smoke). Refresh per round; scripts/check_correctness.py still proves
# the full registry locally regardless of this order.
_DRIVER_PRIORITY = [
    "pit_join",
    # Round-8 rotation (VERDICT r7 item 1). Slots 2-10: the 9 entries
    # with ZERO driver attestation across rounds 1-7 (green only in the
    # committed builder-run local sweeps). Slots 11-24: the 14 entries
    # whose last driver row predates their current implementation
    # (11 late-r6 modifications + 3 touched by the r7 error-path
    # hardening outside the window). Slots 25-27: the three
    # identical-SQL entries converted to DataFrame plans THIS round
    # (window_topk_running, event_funnel, column_correlations) so
    # conversion and driver attestation land together. Slot 28:
    # dedup_jaccard_prefix_filter (its _required_overlap_expr changes
    # again this round for the ADVICE r7 rational-overflow fix).
    # Remaining slots backfill with the oldest driver-green vintage
    # (r1-r4 rows). scripts/check_correctness.py still proves the full
    # 163-entry registry locally regardless of this order; see
    # ATTESTATION.json for the per-entry ledger.
    "weighted_sample_wor",
    "rolling_zscore_anomalies",
    "corpus_novelty_rate",
    "fk_integrity_audit",
    "revenue_concentration",
    "cusum_changepoints",
    "interevent_gap_stats",
    "recursive_chain_walk",
    "group_ols_trend",
    # stale-attestation re-checks:
    "chunk_documents",
    "sessionization_streaming",
    "sequence_packing",
    "text_repetition",
    "text_quality",
    "corpus_prep_pipeline",
    "multimodal_image_png",
    "multimodal_audio_stats",
    "dedup_simhash_portable",
    "embedding_dedup_clusters",
    "training_dataset_pipeline",
    "multimodal_features",
    "source_tfrecord_roundtrip",
    "sequence_example_roundtrip",
    # r8 SQL->DataFrame conversions (attested the round they land):
    "window_topk_running",
    "event_funnel",
    "column_correlations",
    # r8 implementation change (ADVICE rational-overflow fix):
    "dedup_jaccard_prefix_filter",
    # oldest driver-green vintage backfill (r1-r4 rows):
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_tfidf_topterms",
    "similarity_topk",
    "text_bpe_token_budget",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "feature_service",
    "hash_split_counts",
    "sessionization",
    "windowed_event_counts",
    "json_events_daily",
    "pit_join_ttl",
    "pit_join_multiview",
    "text_lang_id",
    "text_token_stats",
    "text_fingerprint",
    "embedding_neardup",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
]


def _ordered() -> list[str]:
    prio = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    return prio + [n for n in _REGISTRY if n not in set(prio)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _ordered()
        if _REGISTRY[name][1] is not None
    }
