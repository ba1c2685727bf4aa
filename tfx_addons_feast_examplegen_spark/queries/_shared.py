"""Shared fixtures and helpers used across query domains.

Mechanically split from the former single-module query corpus; see
the package __init__ for the registry assembly and driver window.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..operators import text as tx
from ..session import register_tables




# ---------------------------------------------------------------------------
# Declared-SQL breadth (S1/A2): the entity-query surface is the whole SQL
# language; exercise it with star-schema analytics, all via spark.sql.
# ---------------------------------------------------------------------------

def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


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


_WINDOWED_EVENTS_ORACLE = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS window_start_ts,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


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
