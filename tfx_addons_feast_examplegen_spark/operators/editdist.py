"""Edit-distance similarity join (threshold Levenshtein, exact).

The 100 TB problem: "find all pairs of strings within k edits" is the
string-similarity join under edit distance — near-dup titles, URLs,
OCR'd lines, mutated boilerplate. The naive spelling is a cross join
with a quadratic ``levenshtein`` verify; q-gram count filtering (the
classic Gravano-style candidate generator) collapses on low-entropy
corpora because frequent q-grams put most of the corpus in one bucket.

This module implements the **segment-partition (pigeonhole) join** —
PassJoin, Li/Deng/Wang/Feng, ICDE 2011 (public paper): partition each
string into ``k+1`` contiguous segments; if ``ed(r, s) <= k`` then at
least one of the shorter string's segments survives in the longer
string **exactly**, shifted by at most ``k`` positions (each edit
destroys at most one segment and shifts positions by at most one).
So an *equi*-join on ``(partner_length, segment_index, segment_text)``
— the shorter side emitting its ``k+1`` segments, the longer side
emitting the substrings at the pigeonhole windows — generates a
candidate superset with **no false negatives**, and a built-in
``levenshtein(a, b, k)`` verify (thresholded: the JVM band algorithm
bails at ``k+1``) confirms. Exact segments are far more selective than
q-grams: a bucket is "strings sharing this exact ~len/(k+1)-char
substring at this slot", so low-entropy corpora stay sub-quadratic.

Spark shape (everything JVM-side, no Python UDF):
- segment/window enumeration is a nested ``transform``/``sequence``
  expression chain, flattened and exploded — whole-stage codegen up to
  the explode;
- candidates carry **ids only** (the text never rides the candidate
  shuffle); texts re-attach by two id equi-joins on the distinct
  candidate set, which is ``O(output)``-sized, not corpus-sized;
- the verify is ``F.levenshtein(..., threshold=k)`` — banded, O(k·n)
  per pair instead of O(n²).

Scale notes: the candidate join shuffles ``O(k)`` segment rows per
indexed string and ``O(k^2 * (2k+1))`` window rows per probing string
— linear in corpus size with a small ``k``-dependent constant, never
quadratic. Strings shorter than ``k+1`` cannot be partitioned (a
segment would be empty and match everywhere); they pair only with
strings of length ``<= 2k``, so the short pool is handled by a
broadcast length-filtered join — degenerate-short corpora are the one
shape this operator does not scale on (document-level inputs are never
that short; cap inputs upstream if they can be).

Reference scope: the reference delegates all execution to BigQuery and
has no similarity-join surface (feast_component/executor.py:128-163);
this operator is part of the Spark-native training-data extension
inventoried in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _layout_sql(m: int, lvar: str, ivar: str) -> tuple[str, str]:
    """SQL for (start_pos, seg_len) of segment ``ivar`` in the even
    ``m``-way partition of a length-``lvar`` string (1-based).

    First ``m - l%m`` segments have length ``l div m``, the rest one
    more — so lengths differ by at most one and sum to ``l``.
    """
    start = (
        f"(1 + {ivar} * ({lvar} div {m})"
        f" + greatest(0, {ivar} - ({m} - {lvar} % {m})))"
    )
    seglen = (
        f"(({lvar} div {m})"
        f" + (CASE WHEN {ivar} >= {m} - {lvar} % {m} THEN 1 ELSE 0 END))"
    )
    return start, seglen


def _indexed_segments(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_a, la, i, seg): the k+1 partition segments of each string
    of length >= k+1 — the join's build vocabulary."""
    m = k + 1
    start, seglen = _layout_sql(m, "la", "i")
    return (
        df.select(
            F.col(id_col).alias("doc_a"),
            F.col(text_col).alias("__t"),
            F.length(text_col).alias("la"),
        )
        .where(F.col("la") >= m)
        .select(
            "doc_a",
            "la",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {k}),"
                    f" i -> struct(i AS i,"
                    f" substring(__t, {start}, {seglen}) AS seg))"
                )
            ).alias("s"),
        )
        .select("doc_a", "la", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))
    )


def _probe_windows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_b, l, i, seg): every substring of each string that could be
    a preserved segment of a shorter-or-equal partner of length ``l``.

    For each candidate partner length ``l`` in ``[max(k+1, lb-k), lb]``
    and each segment slot ``i``, the substring windows are the
    partition start position shifted by at most ``k`` (clamped to the
    string). ``sequence`` counts DOWN when hi < lo, so every range is
    guarded by an explicit CASE.
    """
    m = k + 1
    start, seglen = _layout_sql(m, "l", "i")
    lo = f"greatest(1, {start} - {k})"
    hi = f"least(lb - {seglen} + 1, {start} + {k})"
    windows = (
        f"CASE WHEN lb >= {m} THEN "
        f"flatten(flatten(transform(sequence(greatest({m}, lb - {k}), lb),"
        f" l -> transform(sequence(0, {k}),"
        f"  i -> CASE WHEN {hi} >= {lo} THEN"
        f"   transform(sequence({lo}, {hi}),"
        f"    p -> struct(l AS l, i AS i, substring(__t, p, {seglen}) AS seg))"
        f"  ELSE array() END))))"
        f" ELSE array() END"
    )
    return (
        df.select(
            F.col(id_col).alias("doc_b"),
            F.col(text_col).alias("__t"),
            F.length(text_col).alias("lb"),
        )
        .select("doc_b", "lb", F.explode(F.expr(windows)).alias("s"))
        .select(
            "doc_b",
            "lb",
            F.col("s.l").alias("l"),
            F.col("s.i").alias("i"),
            F.col("s.seg").alias("seg"),
        )
    )


def editdist_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int,
    dist_col: str = "ed",
) -> DataFrame:
    """All pairs with ``levenshtein(text_a, text_b) <= k`` — exact.

    Returns ``(doc_a, doc_b, {dist_col})`` with ``doc_a < doc_b`` (by
    id). Ids must be unique; NULL texts never match (consistent with
    SQL similarity predicates). ``k = 0`` degenerates to an exact
    equi-join on the full string.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    m = k + 1
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__p")).where(
        F.col(text_col).isNotNull()
    )

    seg = _indexed_segments(base, "__id", "__p", k)
    win = _probe_windows(base, "__id", "__p", k)
    # The indexed side is the SHORTER string of the pair (the probe
    # enumerated partner lengths <= its own); equal lengths appear on
    # both sides, so id order dedups them.
    cand = (
        seg.join(win, ["i", "seg"])
        .where(
            (F.col("la") == F.col("l"))
            & (
                (F.col("la") < F.col("lb"))
                | ((F.col("la") == F.col("lb")) & (F.col("doc_a") < F.col("doc_b")))
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Short pool: strings of length < k+1 have no non-empty partition;
    # any partner is itself short (length <= 2k by the length filter),
    # so a broadcast join over the tiny pool is exact and cheap. Pairs
    # never overlap the segment path (the segment path's shorter side
    # always has length >= k+1).
    short_a = base.where(F.length("__p") < m).select(
        F.col("__id").alias("doc_a"), F.col("__p").alias("pa"),
        F.length("__p").alias("la"),
    )
    short_b = base.where(F.length("__p") <= 2 * k).select(
        F.col("__id").alias("doc_b"), F.col("__p").alias("pb"),
        F.length("__p").alias("lb"),
    )
    short_cand = (
        F.broadcast(short_a)
        .join(
            short_b,
            (F.abs(F.col("la") - F.col("lb")) <= k)
            & (
                (F.col("la") < F.col("lb"))
                | ((F.col("la") == F.col("lb")) & (F.col("doc_a") < F.col("doc_b")))
            ),
        )
        .select("doc_a", "doc_b")
    )
    cand = cand.unionByName(short_cand).distinct()

    # Verify on the candidate set only: texts re-attach by id so the
    # candidate shuffle above moved ids, not documents. Banded
    # levenshtein (threshold arg) is O(k*n) per pair and returns -1
    # above the threshold.
    ta = base.select(F.col("__id").alias("doc_a"), F.col("__p").alias("__ta"))
    tb = base.select(F.col("__id").alias("doc_b"), F.col("__p").alias("__tb"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("__d", F.levenshtein("__ta", "__tb", k))
        .where(F.col("__d") >= 0)
    )
    out_a = F.least("doc_a", "doc_b").alias("doc_a")
    out_b = F.greatest("doc_a", "doc_b").alias("doc_b")
    return verified.select(out_a, out_b, F.col("__d").alias(dist_col))
