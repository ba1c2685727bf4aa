"""TPC-H-style star-schema analytics and the arbitrary-SQL surface (S1/A2).

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..session import register_tables

from ._shared import (
    _sql_query,
)



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


# Pearson correlations between lineitem measures: corr() exists in both
# engines with the same definition; rounded to 3 decimals to absorb
# summation-order ulps.
_QCORR = """
SELECT round(corr(l_quantity, l_extendedprice), 3) AS corr_qty_price,
       round(corr(l_extendedprice, l_discount), 3) AS corr_price_discount,
       round(corr(l_quantity, l_discount), 3) AS corr_qty_discount
FROM lineitem
"""


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
    # Revenue concentration: customer spend deciles with share-of-total
    # in basis points via a broadcast 1-row total. Deciles are exact
    # NTILE semantics via rowid.exact_ntile over the NEGATED cents
    # (descending spend order) — no single-partition Window (VERDICT
    # r14 item 3). Ranking by cents alone is tie-invariant here: every
    # decile statistic aggregates cents itself (counts, sums, shares),
    # so permuting equal-spend customers across a decile boundary
    # cannot change any output cell — the old custkey tie-break was
    # bookkeeping, not semantics.
    from ..operators.rowid import exact_ntile

    t = register_tables(spark, sf_dir)
    spend = t["orders"].groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .alias("cents")
    )
    ranked = exact_ntile(
        spend.withColumn("__negcents", -F.col("cents")),
        "__negcents",
        10,
        tile_col="decile",
    ).drop("__negcents")
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


def _q_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape, DataFrame-composed (independent of the oracle
    # text): outer join that must preserve zero-order customers, a
    # conditional count over the nullable side, then a second
    # aggregation over the first's result — the "histogram of group
    # sizes" pattern. The left join shuffles on custkey once; the
    # distribution agg is over at most |customers| rows.
    t = register_tables(spark, sf_dir)
    filtered = t["orders"].where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(filtered, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) counts
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def _q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape, DataFrame-composed: a base join filtered by a
    # chained SEMI join (another supplier shipped in the same order)
    # and a chained ANTI join (no other supplier's line in the order
    # was returned) — the exists / not-exists pair correlated on the
    # same fact table with an inequality on the correlation column.
    # Spark plans both as one-pass hash semi/anti joins on l_orderkey;
    # no subquery re-scan per row.
    t = register_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    base = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        "l_returnflag",
    )
    exists_other = base.join(
        other,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    not_exists_other_returned = exists_other.join(
        other.where(F.col("l_returnflag") == "R"),
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        not_exists_other_returned.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("l_suppkey"))
        .limit(10)
        .select(F.col("l_suppkey").alias("s_suppkey"), "numwait")
    )


_Q21_ORACLE = """
SELECT l1.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY l1.l_suppkey
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


def _q_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q2 SHAPE over the available tables (the fixture has no
    # partsupp, so "supply cost" is the lineitem unit price): for each
    # medium-size part of a given type prefix, the supplier(s) whose
    # line matched the part's MINIMUM unit price — the correlated
    # scalar-min subquery joined back on equality, Q2's defining
    # decorrelation test. DataFrame composition: per-part min as one
    # combinable aggregate, equality join back (doubles: both engines
    # do IEEE division on the same parquet values, so min and the
    # equality match bit-identically), then supplier/nation broadcast
    # enrich. Top-10 by supplier balance plans as TakeOrdered.
    t = register_tables(spark, sf_dir)
    parts = t["part"].where(
        (F.col("p_size") <= 15) & F.col("p_type").startswith("PROMO")
    ).select("p_partkey", "p_type")
    li = t["lineitem"].where(F.col("l_quantity") > 0).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
    )
    li_parts = li.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    min_unit = li_parts.groupBy("p_partkey").agg(
        F.min("__unit").alias("__min_unit")
    )
    winners = li_parts.join(min_unit, "p_partkey").where(
        F.col("__unit") == F.col("__min_unit")
    )
    sup = t["supplier"].join(
        F.broadcast(t["nation"]),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    return (
        winners.select("p_partkey", "p_type", "l_suppkey", "__min_unit")
        .distinct()
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy(
            F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey")
        )
        .limit(10)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("__min_unit", 4).alias("min_unit_price"),
        )
    )


_Q2_ORACLE = """
WITH parts AS (
  SELECT p_partkey, p_type FROM part
  WHERE p_size <= 15 AND p_type LIKE 'PROMO%'
),
lu AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit
  FROM lineitem WHERE l_quantity > 0
),
w AS (
  SELECT DISTINCT p.p_partkey, p.p_type, l.l_suppkey, l.unit
  FROM parts p JOIN lu l ON l.l_partkey = p.p_partkey
  WHERE l.unit = (SELECT min(l2.unit) FROM lu l2
                  WHERE l2.l_partkey = p.p_partkey)
)
SELECT s.s_suppkey, s.s_name, n.n_name, w.p_partkey, w.p_type,
       round(w.unit, 4) AS min_unit_price
FROM w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_acctbal DESC, w.p_partkey, s.s_suppkey
LIMIT 10
"""


def _q_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 shape: revenue lost to small-quantity orders — lines
    # whose quantity is below 20% of the PER-PART average quantity (the
    # per-group scalar-avg subquery), for one brand's parts, summed and
    # scaled by 1/7. Spark decorrelates as one combinable avg aggregate
    # joined back; the part filter broadcasts ahead of both scans of
    # lineitem so the avg is computed only for the brand's parts.
    t = register_tables(spark, sf_dir)
    parts = t["part"].where(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t["lineitem"].select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li.groupBy("p_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("__q20")
    )
    return (
        li.join(avg_qty, "p_partkey")
        .where(F.col("l_quantity") < F.col("__q20"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q17_ORACLE = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
WHERE l.l_quantity < (
  SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
"""


def _q_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape: positive-balance customers in a nation set who
    # are RICHER than the average such customer (a one-row global
    # scalar subquery, broadcast-attached) and are DORMANT — no order
    # since 2000-01-01 (anti join on the date-filtered orders; the
    # fixture has no phone column and every customer has SOME order, so
    # the country-code and no-orders predicates become the nation set
    # and a recency cutoff — same plan shape: scalar agg -> broadcast
    # one-row cross join -> anti join -> agg).
    t = register_tables(spark, sf_dir)
    cust = t["customer"].where(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5)
        & (F.col("c_acctbal") > 0.0)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("__avg"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(
            t["orders"]
            .where(F.col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_ORACLE = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 2, 3, 4, 5) AND c.c_acctbal > 0.0
  AND c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_nationkey IN (1, 2, 3, 4, 5) AND c2.c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Poisson-bootstrap 95% CI for mean order value per priority
    # (Chamandy et al. 2012): every per-(row, replicate) Poisson(1)
    # weight is a deterministic md5-uniform inverse-CDF draw, so the
    # full procedure — weights, replicate means, discrete percentile
    # bounds — replays exactly in the oracle. Values in integer cents:
    # replicate sums are exact 64-bit arithmetic.
    from ..operators.stats import bootstrap_metric_ci

    t = register_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    return bootstrap_metric_ci(
        orders, "cents", "o_orderkey",
        group_cols=["o_orderpriority"], replicates=100, level=0.95,
        salt="r11",
    )


_BOOTSTRAP_CI_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS prio, o_orderkey AS id,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
),
reps AS (SELECT unnest(generate_series(0, 99)) AS rep),
ex AS (
  SELECT prio, rep, v,
         (CAST(('0x' || substr(md5(concat_ws(chr(31),
                   CAST(id AS VARCHAR), CAST(rep AS VARCHAR), 'r11')),
                   1, 13)) AS BIGINT) + 0.5) / 4503599627370496.0 AS u
  FROM base, reps
),
wx AS (
  SELECT prio, rep, v,
    CASE WHEN u < 0.36787944117144233 THEN 0
         WHEN u < 0.7357588823428847 THEN 1
         WHEN u < 0.9196986029286058 THEN 2
         WHEN u < 0.9810118431238463 THEN 3
         WHEN u < 0.9963401531726563 THEN 4
         WHEN u < 0.9994058151824183 THEN 5
         WHEN u < 0.999916758850712 THEN 6
         WHEN u < 0.9999897508033253 THEN 7
         WHEN u < 0.999998874797402 THEN 8
         WHEN u < 0.9999998885745216 THEN 9
         WHEN u < 0.9999999899522336 THEN 10
         WHEN u < 0.9999999991683892 THEN 11
         WHEN u < 0.9999999999364022 THEN 12
         ELSE 13 END AS w
  FROM ex
),
rm AS (
  SELECT prio, rep, sum(w * v) * 1.0 / sum(w) AS m
  FROM wx GROUP BY prio, rep HAVING sum(w) > 0
),
pg AS (
  SELECT prio, list_sort(list(m)) AS arr, count(*) AS nr
  FROM rm GROUP BY prio
),
pt AS (SELECT prio, sum(v) * 1.0 / count(v) AS p FROM base GROUP BY prio)
SELECT pg.prio AS o_orderpriority,
       round(pt.p, 4) AS point,
       round(arr[greatest(CAST(ceil(0.025 * nr) AS INT), 1)], 4) AS ci_lo,
       round(arr[greatest(CAST(ceil(0.975 * nr) AS INT), 1)], 4) AS ci_hi,
       CAST(nr AS BIGINT) AS n_replicates
FROM pg JOIN pt ON pg.prio = pt.prio
"""


def _q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact global running revenue in order-key order with NO
    # single-partition Window: the prefix_sum primitive (bucket-
    # decomposed running total — per-bucket integer sums + literal
    # offsets + bucket-local cumulative Window). Cents fixed-point so
    # the running sum is integer-exact; the oracle IS the naive
    # SUM OVER (ORDER BY) the operator refuses to plan.
    from ..operators.rowid import prefix_sum

    t = register_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    return prefix_sum(
        o, "o_orderkey", "cents", out_col="cum_cents", num_buckets=16
    )


_RUNNING_TOTAL_ORACLE = """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              OVER (ORDER BY o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM orders
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "global_running_total": (_q_running_total, _RUNNING_TOTAL_ORACLE),
    "bootstrap_metric_ci": (_q_bootstrap_ci, _BOOTSTRAP_CI_ORACLE),
    "grouping_sets_filter": (_sql_query(_QGROUPING_SETS), _QGROUPING_SETS),
    "correlated_subquery": (_sql_query(_QCORRELATED), _QCORRELATED),
    "lateral_topk_per_key": (_sql_query(_QLATERAL), _QLATERAL),
    "column_correlations": (_q_column_correlations_df, _QCORR),
    "unpivot_stack": (_sql_query(_QUNPIVOT_SPARK), _QUNPIVOT_ORACLE),
    "array_agg_sorted": (_sql_query(_QARRAY_AGG), _QARRAY_AGG_ORACLE),
    "mad_outliers": (_q_mad_outliers_df, _QMAD_OUTLIERS),
    "time_rollup_multigrain": (_q_time_rollup_df, _QTIME_ROLLUP_ORACLE),
    "percent_rank_transform": (_q_percent_rank_df, _QPERCENT_RANK),
    "fk_integrity_audit": (_q_fk_audit_df, _QFK_AUDIT),
    "revenue_concentration": (_q_pareto_df, _QPARETO),
    "group_ols_trend": (_q_ols_trend_df, _QOLS_TREND_ORACLE),
    "q2_min_cost_supplier": (_q_q2_min_cost, _Q2_ORACLE),
    "q17_small_quantity_revenue": (_q_q17_small_qty, _Q17_ORACLE),
    "q22_dormant_customers": (_q_q22_dormant, _Q22_ORACLE),
    "q7_nation_volume": (_sql_query(_Q7), _Q7),
    "q10_returned_items": (_sql_query(_Q10), _Q10),
    "q18_large_orders": (_sql_query(_Q18), _Q18),
    "q1_pricing_summary": (_sql_query(_Q1), _Q1),
    "q13_customer_distribution": (_q_q13_custdist, _Q13_ORACLE),
    "q21_waiting_suppliers": (_q_q21_waiting_suppliers, _Q21_ORACLE),
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
    "having_subquery": (_sql_query(_QHAVING), _QHAVING),
    "rollup_region_nation": (_sql_query(_QROLLUP), _QROLLUP),
    "anti_join_exists": (_sql_query(_QANTI), _QANTI),
    "string_funcs_parts": (_sql_query(_QSTRING), _QSTRING),
    "window_lead_lag_ntile": (_sql_query(_QWINDOW_FULL), _QWINDOW_FULL),
    "percentiles": (_sql_query(_QPERCENTILE), _QPERCENTILE),
    "cube_lattice": (_sql_query(_QCUBE), _QCUBE),
    "case_pivot": (_sql_query(_QPIVOT), _QPIVOT),
}
