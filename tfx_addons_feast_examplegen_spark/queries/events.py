"""Event-stream batch analytics: sessions, funnels, time series.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..session import register_tables

from ._shared import (
    _QGAP_STATS,
    _WINDOWED_EVENTS_ORACLE,
    _sql_query,
)


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

_QWAU_ORACLE = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT days.d AS day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
FROM days JOIN act a ON a.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
"""


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

# Interval RANGE window frame: trailing 7-day per-user running revenue
# (event-time range frame, peers included deterministically).
_QRANGE_WINDOW = """
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS v7d
FROM events
"""


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


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank over the symmetrized customer<->supplier trade graph
    # (distinct pairs from high-value orders; 'c'/'s' prefixes keep the
    # two TPC-H key spaces from colliding). Symmetrizing guarantees
    # every node has in- AND out-edges, so the recursive-CTE oracle
    # needs no dangling branch — the operator's dangling path is
    # pytest-covered instead (tests/test_graph.py). Ranks are compared
    # at 9 decimals: cross-engine float-sum order differs at ~1e-15
    # relative, far inside the rounding step.
    from ..operators.graph import pagerank

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    r = pagerank(edges, iterations=6, pre_collapsed=True)
    return r.select("node", F.round("rank", 9).alias("rank"))


_QPAGERANK_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
-- NB: explicit DISTINCT-over-UNION-ALL, not bare UNION: inside WITH
-- RECURSIVE DuckDB parses a CTE body's top-level UNION as potential
-- recursion syntax and does NOT deduplicate it
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),
cnt AS (SELECT COUNT(*) AS n FROM nodes),
pr AS (
  SELECT 0 AS iter, node, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes
  UNION ALL
  SELECT p.iter + 1, e.dst AS node,
         0.15 / (SELECT n FROM cnt) + 0.85 * SUM(p.rank / dg.d)
  FROM pr p
  JOIN edges e ON e.src = p.node
  JOIN deg dg ON dg.src = p.node
  WHERE p.iter < 6
  GROUP BY p.iter, e.dst
)
SELECT node, round(rank, 9) AS rank FROM pr WHERE iter = 6
"""


def _q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reachability over the same symmetrized trade graph as
    # graph_pagerank: min hops from the high-balance customer seeds.
    # max_hops=3 exercises multiple frontier rounds (the bipartite hub
    # graph reaches most nodes by level 2; level-3 rows prove the
    # frontier keeps expanding past the first wave).
    from ..operators.graph import bfs_levels

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    out = bfs_levels(edges, seeds, max_hops=3, pre_distinct=True)
    return out.select("node", F.col("level").cast("long").alias("level"))


_QBFS_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),
walk AS (
  SELECT DISTINCT 'c' || c_custkey AS node, 0 AS level
  FROM customer WHERE c_acctbal > 9000
  UNION
  SELECT e.dst AS node, w.level + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.level < 3
)
SELECT node, CAST(MIN(level) AS BIGINT) AS level FROM walk GROUP BY node
"""


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS hubs/authorities over the DIRECTED customer->supplier trade
    # graph (no symmetrization: the bipartite direction is the whole
    # point — customers are pure hubs, suppliers pure authorities, and
    # the scores couple through the link structure). iterations=3 keeps
    # the unrolled oracle readable; normalize="end" makes every
    # intermediate an exact integer (all-ones init), so both engines
    # do identical arithmetic until the single final sqrt+divide.
    from ..operators.graph import hits

    t = register_tables(spark, sf_dir)
    edges = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    out = hits(edges, iterations=3)
    return out.select(
        "node",
        F.round("hub", 9).alias("hub"),
        F.round("authority", 9).alias("authority"),
    )


_QHITS_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM pairs UNION ALL SELECT dst FROM pairs
  )
),
h0 AS (SELECT node, 1.0 AS h FROM nodes),
a1s AS (SELECT e.dst AS node, SUM(x.h) AS a FROM pairs e JOIN h0 x ON x.node = e.src GROUP BY e.dst),
a1 AS (SELECT n.node, COALESCE(s.a, 0) AS a FROM nodes n LEFT JOIN a1s s USING (node)),
h1s AS (SELECT e.src AS node, SUM(x.a) AS h FROM pairs e JOIN a1 x ON x.node = e.dst GROUP BY e.src),
h1 AS (SELECT n.node, COALESCE(s.h, 0) AS h FROM nodes n LEFT JOIN h1s s USING (node)),
a2s AS (SELECT e.dst AS node, SUM(x.h) AS a FROM pairs e JOIN h1 x ON x.node = e.src GROUP BY e.dst),
a2 AS (SELECT n.node, COALESCE(s.a, 0) AS a FROM nodes n LEFT JOIN a2s s USING (node)),
h2s AS (SELECT e.src AS node, SUM(x.a) AS h FROM pairs e JOIN a2 x ON x.node = e.dst GROUP BY e.src),
h2 AS (SELECT n.node, COALESCE(s.h, 0) AS h FROM nodes n LEFT JOIN h2s s USING (node)),
a3s AS (SELECT e.dst AS node, SUM(x.h) AS a FROM pairs e JOIN h2 x ON x.node = e.src GROUP BY e.dst),
a3 AS (SELECT n.node, COALESCE(s.a, 0) AS a FROM nodes n LEFT JOIN a3s s USING (node)),
h3s AS (SELECT e.src AS node, SUM(x.a) AS h FROM pairs e JOIN a3 x ON x.node = e.dst GROUP BY e.src),
h3 AS (SELECT n.node, COALESCE(s.h, 0) AS h FROM nodes n LEFT JOIN h3s s USING (node)),
hn AS (SELECT sqrt(SUM(h * h)) AS v FROM h3),
an AS (SELECT sqrt(SUM(a * a)) AS v FROM a3)
SELECT n.node,
       round(CASE WHEN hn.v > 0 THEN h3.h / hn.v ELSE 0 END, 9) AS hub,
       round(CASE WHEN an.v > 0 THEN a3.a / an.v ELSE 0 END, 9) AS authority
FROM nodes n
JOIN h3 USING (node) JOIN a3 USING (node), hn, an
"""


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synchronous LPA communities over the SYMMETRIZED trade graph
    # (same fixture as pagerank/bfs — undirected semantics per the
    # paper). 2 iterations, smallest-label tie-break: deterministic by
    # construction, so the unrolled oracle replays it exactly.
    from ..operators.graph import label_propagation

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    return label_propagation(edges, iterations=2, pre_collapsed=True)


def _lpa_round_sql(prev: str, out: str, vote: str = "COUNT(*)") -> str:
    # one synchronous round: in-neighbor label votes -> most frequent,
    # smallest label on ties, previous label when no in-neighbors.
    # `vote` is the per-(node,label) tally expression — COUNT(*) for
    # the unweighted entry, SUM(e.w) for the weighted one.
    return f"""
v{out} AS (
  SELECT e.dst AS node, p.label, {vote} AS c
  FROM edges e JOIN {prev} p ON p.node = e.src
  GROUP BY 1, 2
),
p{out} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label)
             AS rn
    FROM v{out}
  ) WHERE rn = 1
),
{out} AS (
  SELECT q.node, COALESCE(p.label, q.label) AS label
  FROM {prev} q LEFT JOIN p{out} p USING (node)
)"""


_QLPA_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),
l0 AS (
  SELECT DISTINCT node, node AS label FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),{_lpa_round_sql('l0', 'l1')},{_lpa_round_sql('l1', 'l2')}
SELECT node, label FROM l2
"""


def _q_label_propagation_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted LPA over the symmetrized trade graph: each (customer,
    # supplier) edge carries its distinct-order count — evidence
    # strength, the shared-shingle-count analogue for dedup-cluster
    # graphs. Votes SUM the weight (exact long arithmetic), same
    # smallest-label tie-break, so the unrolled oracle replays it
    # exactly. Same iterations=2 as the unweighted entry — the two
    # differ where a heavier minority label outvotes a more numerous
    # one.
    from ..operators.graph import label_propagation

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("w"))
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    return label_propagation(edges, weight_col="w", iterations=2, pre_collapsed=True)


_QLPA_WEIGHTED_ORACLE = f"""
WITH pairs AS (
  SELECT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b,
         COUNT(DISTINCT o.o_orderkey) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
  GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, w FROM pairs
),
l0 AS (
  SELECT DISTINCT node, node AS label FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),{_lpa_round_sql('l0', 'l1', vote='SUM(e.w)')},{
    _lpa_round_sql('l1', 'l2', vote='SUM(e.w)')}
SELECT node, label FROM l2
"""


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted shortest paths (bounded Bellman-Ford) over the
    # symmetrized trade graph: edge weight = MIN l_quantity linking
    # the pair (integral-valued doubles, so both engines' sums are
    # exact). Seeds = high-balance customers, max_rounds=3 — enough to
    # reach suppliers (1 hop), second-tier customers (2) and their
    # suppliers (3), with strict-improvement pruning exercised where a
    # cheap 2-hop path undercuts an expensive 1-hop edge.
    from ..operators.graph import sssp

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .agg(F.min("l_quantity").alias("w"))
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    seeds = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
    )
    # pre_collapsed: the groupBy above already collapsed parallel edges
    # to MIN weight, and the two union branches have disjoint key
    # spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's re-collapse
    # would be an identity exchange over the whole edge frame.
    out = sssp(edges, seeds, weight_col="w", max_rounds=3, pre_collapsed=True)
    return out.select("node", F.round("dist", 6).alias("dist"))


def _sssp_round_sql(prev: str, out: str) -> str:
    # one hop-limited Bellman-Ford relaxation: candidate distances
    # through `prev`'s frontier, min-merged with the running best
    return f"""
r{out} AS (
  SELECT e.dst AS node, MIN(w.d + e.w) AS d
  FROM {prev} w JOIN edges e ON e.src = w.node
  GROUP BY e.dst
),
{out} AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM {prev} UNION ALL SELECT node, d FROM r{out}
  ) GROUP BY node
)"""


_QSSSP_ORACLE = f"""
WITH pairs AS (
  SELECT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b,
         MIN(l.l_quantity) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
  GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, w FROM pairs
),
d0 AS (
  SELECT DISTINCT 'c' || c_custkey AS node, CAST(0 AS DOUBLE) AS d
  FROM customer WHERE c_acctbal > 9000
),{_sssp_round_sql('d0', 'd1')},{_sssp_round_sql('d1', 'd2')},{
    _sssp_round_sql('d2', 'd3')}
SELECT node, round(d, 6) AS dist FROM d3
"""


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # K-core of the symmetrized trade graph (k=3): the link-graph
    # quality filter — customers/suppliers that keep >= 3 trading
    # partners AFTER all weaker nodes peel away. max_rounds=4 is
    # enough for the peeling cascade at every SF (extra rounds are
    # no-ops at the fixed point, so the bound is not load-bearing for
    # correctness — the oracle replays the same 4 peels).
    from ..operators.graph import kcore

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # pre_distinct: pairs is DISTINCT above and the union branches have
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-dedup would be an identity exchange over the edge frame.
    return kcore(edges, k=3, max_rounds=4, pre_distinct=True)


def _kcore_round_sql(prev: str, out: str, k: int) -> str:
    # one peel: degree over the surviving subgraph, drop nodes < k,
    # keep only edges with both endpoints surviving
    return f"""
d{out} AS (SELECT src AS node, COUNT(*) AS degree FROM {prev} GROUP BY 1),
a{out} AS (SELECT node FROM d{out} WHERE degree >= {k}),
{out} AS (
  SELECT e.src, e.dst FROM {prev} e
  JOIN a{out} s ON e.src = s.node
  JOIN a{out} t ON e.dst = t.node
)"""


_QKCORE_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),{_kcore_round_sql('e0', 'e1', 3)},{_kcore_round_sql('e1', 'e2', 3)},{
    _kcore_round_sql('e2', 'e3', 3)},{_kcore_round_sql('e3', 'e4', 3)}
SELECT src AS node, COUNT(*) AS degree FROM e4
GROUP BY 1 HAVING COUNT(*) >= 3
"""


def _q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Personalized PageRank from the high-balance customer seeds over
    # the symmetrized trade graph — rank mass decays with distance
    # from the seeds (crawl-frontier prioritization / topic affinity).
    # Seeds OUTSIDE the trade graph stay in the universe holding their
    # teleport share (isolated -> pure dangling recirculation).
    from ..operators.graph import personalized_pagerank

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
    )
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    r = personalized_pagerank(edges, seeds, iterations=6, pre_distinct=True)
    return r.select("node", F.round("rank", 9).alias("rank"))


def _ppr_round_sql(prev: str, out: str) -> str:
    # one iteration: contributions keyed on the receiver, dangling mass
    # (nodes with no out-edges) recirculated to the seeds, teleport on
    # the seeds — rank' = 0.15*p + 0.85*(contrib + dmass*p)
    return f"""
c{out} AS (
  SELECT e.dst AS node, SUM(p.rank / dg.d) AS contrib
  FROM edges e JOIN {prev} p ON p.node = e.src
  JOIN deg dg ON dg.src = e.src
  GROUP BY 1
),
dm{out} AS (
  SELECT COALESCE(SUM(p.rank), 0) AS m FROM {prev} p
  WHERE p.node NOT IN (SELECT src FROM deg)
),
{out} AS (
  SELECT n.node, n.seed,
         0.15 * (CASE WHEN n.seed THEN 1.0 / (SELECT ns FROM nsc)
                      ELSE 0 END)
         + 0.85 * (COALESCE(c.contrib, 0)
                   + (SELECT m FROM dm{out})
                     * (CASE WHEN n.seed THEN 1.0 / (SELECT ns FROM nsc)
                             ELSE 0 END)) AS rank
  FROM nodes n LEFT JOIN c{out} c USING (node)
)"""


_QPPR_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),
seeds AS (
  SELECT DISTINCT 'c' || c_custkey AS node
  FROM customer WHERE c_acctbal > 9000
),
nodes AS (
  SELECT node, MAX(is_seed) AS seed FROM (
    SELECT src AS node, FALSE AS is_seed FROM edges
    UNION ALL SELECT dst, FALSE FROM edges
    UNION ALL SELECT node, TRUE FROM seeds
  ) GROUP BY 1
),
nsc AS (SELECT COUNT(*) AS ns FROM seeds),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
r0 AS (
  SELECT node, seed,
         CASE WHEN seed THEN 1.0 / (SELECT ns FROM nsc) ELSE 0 END AS rank
  FROM nodes
),{_ppr_round_sql('r0', 'r1')},{_ppr_round_sql('r1', 'r2')},{
    _ppr_round_sql('r2', 'r3')},{_ppr_round_sql('r3', 'r4')},{
    _ppr_round_sql('r4', 'r5')},{_ppr_round_sql('r5', 'r6')}
SELECT node, round(rank, 9) AS rank FROM r6
"""


def _q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted PageRank over the distinct-order-count-weighted
    # symmetrized trade graph: a node's outflow splits proportionally
    # to trading volume instead of uniformly — the link-count edition
    # crawl graphs rank with. Same 6 iterations as the unweighted
    # entry; integral weights keep deg sums exact.
    from ..operators.graph import pagerank

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("w"))
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    # pre_collapsed/pre_distinct: `pairs` is DISTINCT (or pre-
    # aggregated to one weight per pair) and the union branches live in
    # disjoint key spaces ('c…'->'s…' vs 's…'->'c…'), so the operator's
    # re-collapse would be an identity exchange over the whole edge
    # frame (the sssp/kcore certificate).
    r = pagerank(edges, weight_col="w", iterations=6, pre_collapsed=True)
    return r.select("node", F.round("rank", 9).alias("rank"))


_QPAGERANK_WEIGHTED_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b,
         COUNT(DISTINCT o.o_orderkey) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
  GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, w FROM pairs
),
deg AS (SELECT src, SUM(w) AS d FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),
cnt AS (SELECT COUNT(*) AS n FROM nodes),
pr AS (
  SELECT 0 AS iter, node, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes
  UNION ALL
  SELECT p.iter + 1, e.dst AS node,
         0.15 / (SELECT n FROM cnt) + 0.85 * SUM(p.rank * e.w / dg.d)
  FROM pr p
  JOIN edges e ON e.src = p.node
  JOIN deg dg ON dg.src = p.node
  WHERE p.iter < 6
  GROUP BY p.iter, e.dst
)
SELECT node, round(rank, 9) AS rank FROM pr WHERE iter = 6
"""


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Degree assortativity of the symmetrized trade graph: the
    # bipartite customer-supplier structure should read strongly
    # NEGATIVE (hubs attach to leaves) — the one-number structural QA
    # before link-based curation trusts the graph.
    from ..operators.graph import degree_assortativity

    t = register_tables(spark, sf_dir)
    pairs = (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return degree_assortativity(edges)


_QASSORTATIVITY_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice > 150000
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
  )
),
deg AS (SELECT src AS n, COUNT(*) AS d FROM edges GROUP BY 1),
j AS (
  SELECT CAST(ds.d AS DOUBLE) AS x, CAST(dd.d AS DOUBLE) AS y
  FROM edges e JOIN deg ds ON ds.n = e.src JOIN deg dd ON dd.n = e.dst
),
nn AS (
  SELECT COUNT(DISTINCT node) AS c FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
)
SELECT CAST((SELECT c FROM nn) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       round(corr(x, y), 6) AS assortativity
FROM j
"""


def _q_interval_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyless temporal containment — the range-join shape Spark plans
    # as a nested loop and this engine rewrites as a binned equi-join
    # (operators/interval.py). 40 overlapping 8-hour audit windows
    # anchored at every 250th event; count events inside each. Window
    # always contains its anchor, so the inner join keeps all 40 rows.
    from ..operators.interval import point_in_interval_join

    t = register_tables(spark, sf_dir)
    pts = t["events"].select(
        F.col("event_id").alias("pid"), F.unix_micros("ts").alias("t")
    )
    anchors = (
        t["events"]
        .where(F.col("event_id") % 250 == 0)
        .select(
            F.col("event_id").alias("window_id"),
            (F.unix_micros("ts") - F.lit(7_200_000_000)).alias("lo"),
            (F.unix_micros("ts") + F.lit(21_600_000_000)).alias("hi"),
        )
    )
    joined = point_in_interval_join(
        pts, anchors, ts="t", lo="lo", hi="hi", bin_width=3_600_000_000
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


_INTERVAL_CONTAINMENT_ORACLE = """
WITH pts AS (
  SELECT event_id AS pid, epoch_us(ts) AS t FROM events
),
anch AS (
  SELECT event_id AS window_id,
         epoch_us(ts) - 7200000000 AS lo,
         epoch_us(ts) + 21600000000 AS hi
  FROM events WHERE event_id % 250 = 0
)
SELECT a.window_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM anch a JOIN pts p ON a.lo <= p.t AND p.t < a.hi
GROUP BY 1
"""


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyless interval×interval OVERLAP — the shape Spark plans as a
    # BroadcastNestedLoopJoin and this engine rewrites as a both-sides-
    # binned equi-join with an expression-only first-shared-bin dedup
    # (operators/interval.py). 8-hour audit windows anchored at every
    # 250th event vs 3-hour incident windows at every 97th; count the
    # incidents each audit window collides with.
    from ..operators.interval import interval_overlap_join

    t = register_tables(spark, sf_dir)
    audits = (
        t["events"]
        .where(F.col("event_id") % 250 == 0)
        .select(
            F.col("event_id").alias("window_id"),
            (F.unix_micros("ts") - F.lit(7_200_000_000)).alias("lo"),
            (F.unix_micros("ts") + F.lit(21_600_000_000)).alias("hi"),
        )
    )
    incidents = (
        t["events"]
        .where(F.col("event_id") % 97 == 0)
        .select(
            F.col("event_id").alias("incident_id"),
            (F.unix_micros("ts") - F.lit(3_600_000_000)).alias("ilo"),
            (F.unix_micros("ts") + F.lit(7_200_000_000)).alias("ihi"),
        )
    )
    joined = interval_overlap_join(
        audits,
        incidents,
        lo_l="lo",
        hi_l="hi",
        lo_r="ilo",
        hi_r="ihi",
        bin_width=3_600_000_000,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_incidents")
    )


_INTERVAL_OVERLAP_ORACLE = """
WITH audits AS (
  SELECT event_id AS window_id,
         epoch_us(ts) - 7200000000 AS lo,
         epoch_us(ts) + 21600000000 AS hi
  FROM events WHERE event_id % 250 = 0
),
inc AS (
  SELECT event_id AS incident_id,
         epoch_us(ts) - 3600000000 AS ilo,
         epoch_us(ts) + 7200000000 AS ihi
  FROM events WHERE event_id % 97 = 0
)
SELECT a.window_id, CAST(COUNT(*) AS BIGINT) AS n_incidents
FROM audits a JOIN inc i ON a.lo < i.ihi AND i.ilo < a.hi
GROUP BY 1
"""


ENTRIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "windowed_event_counts": (_q_windowed_events, _WINDOWED_EVENTS_ORACLE),
    "event_funnel": (_q_event_funnel_df, _QFUNNEL),
    "scd2_validity_intervals": (_sql_query(_QSCD2_SPARK), _QSCD2),
    "forward_fill_timeseries": (_q_forward_fill, _FORWARD_FILL_ORACLE),
    "gap_fill_timeseries": (_q_gap_fill, _GAP_FILL_ORACLE),
    "range_interval_window": (_sql_query(_QRANGE_WINDOW), _QRANGE_WINDOW),
    "interpolate_timeseries": (
        _q_interpolate_timeseries,
        _INTERPOLATE_ORACLE,
    ),
    "retention_cohorts": (_q_retention_df, _QRETENTION_ORACLE),
    "decayed_activity_score": (_q_decayed_activity_df, _QDECAYED_ORACLE),
    "event_type_pmi": (_q_event_pmi_df, _QPMI_ORACLE),
    "rolling_wau": (_q_rolling_wau_df, _QWAU_ORACLE),
    "rolling_zscore_anomalies": (_q_rolling_z_df, _QROLLING_Z),
    "cusum_changepoints": (_q_cusum_df, _QCUSUM),
    "interevent_gap_stats": (_q_gap_stats_df, _QGAP_STATS),
    "graph_triangle_count": (_q_triangles, _QTRIANGLES_ORACLE),
    "graph_pagerank": (_q_pagerank, _QPAGERANK_ORACLE),
    "graph_bfs_levels": (_q_bfs_levels, _QBFS_ORACLE),
    "graph_hits": (_q_hits, _QHITS_ORACLE),
    "graph_label_propagation": (_q_label_propagation, _QLPA_ORACLE),
    "graph_label_propagation_weighted": (
        _q_label_propagation_weighted,
        _QLPA_WEIGHTED_ORACLE,
    ),
    "graph_sssp": (_q_sssp, _QSSSP_ORACLE),
    "graph_kcore": (_q_kcore, _QKCORE_ORACLE),
    "graph_pagerank_personalized": (_q_ppr, _QPPR_ORACLE),
    "graph_pagerank_weighted": (_q_pagerank_weighted, _QPAGERANK_WEIGHTED_ORACLE),
    "graph_degree_assortativity": (_q_assortativity, _QASSORTATIVITY_ORACLE),
    "interval_containment_join": (_q_interval_containment, _INTERVAL_CONTAINMENT_ORACLE),
    "interval_overlap_join": (_q_interval_overlap, _INTERVAL_OVERLAP_ORACLE),
    "props_map_explode": (_q_props_map, _PROPS_MAP_ORACLE),
    "recursive_chain_walk": (_sql_query(_QRECURSIVE_WALK), _QRECURSIVE_WALK),
    "variant_props_typed": (_q_variant_props, _VARIANT_PROPS_ORACLE),
    "json_events_daily": (_sql_query(_QJSON_SPARK), _QJSON_ORACLE),
    "monthly_order_delta": (
        _sql_query(
            _QMONTHLY.replace("epoch(date_trunc", "unix_timestamp(date_trunc")
        ),
        _QMONTHLY,
    ),
    "sessionization": (_sql_query(_QSESSION_SPARK), _QSESSION),
}
