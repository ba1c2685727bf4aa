"""Binned point-in-interval join — the scalable range join.

The 100 TB problem: "which intervals contain this point" with no (or a
low-cardinality) equi key is a range predicate, and Spark plans a bare
``p.ts >= i.lo AND p.ts < i.hi`` join as BroadcastNestedLoopJoin (one
side must fit in memory, every point scans every interval). Engines
with a native interval strategy (DuckDB's IEJoin, Databricks'
range-join hints) rewrite it; open-source Spark does not, so this
operator carries the standard rewrite explicitly:

pick a bin width ``W``; each interval replicates to every bin index it
overlaps (``floor(lo/W) .. floor((hi-1)/W)``, an expression-only
``explode(sequence(...))``); each point computes its single bin
``floor(ts/W)``; an ordinary **equi-join on the bin** meets every
candidate pair, and the exact ``lo <= ts < hi`` predicate filters bin
co-residents that don't actually overlap. Cost: the interval side
inflates by ``~avg_len/W + 1`` rows and the join is a plain hash/SMJ
shuffle — no nested loop, no broadcast requirement, AQE-skew-splittable.
Pick ``W`` near the median interval length: smaller W inflates the
build side, larger W packs unrelated points into shared bins.

Guards: intervals spanning more than ``max_bins_per_interval`` bins
raise in-plan (``assert_true`` inside the sequence bound — a degenerate
open-ended interval would otherwise silently explode the build side;
the repo's no-silent-caps rule). Empty/invalid intervals
(``hi <= lo``) match nothing, NULL bounds and NULL points drop —
standard SQL range-predicate semantics.

Reference scope: the reference delegates all execution to BigQuery and
has no join surface beyond the Feast point-in-time call
(feast_component/executor.py:87,128-163); this operator is part of the
Spark-native extension inventoried in SURVEY.md §2.9.
"""

from __future__ import annotations

import operator as _op

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _resolve_bin_width(bin_width, sides) -> int:
    """Validate/normalize a ``bin_width`` argument: ``"auto"`` measures
    (:func:`_auto_bin_width`); any integral type (int, numpy integer —
    e.g. a width computed from a percentile) normalizes via
    ``__index__``; bool and non-integrals are rejected with a
    ValueError rather than leaking into SQL text."""
    if isinstance(bin_width, str):
        if bin_width != "auto":
            raise ValueError(f"bin_width must be >= 1 or 'auto': {bin_width!r}")
        return _auto_bin_width(*sides)
    if isinstance(bin_width, bool):
        raise ValueError(f"bin_width must be an integer, not bool: {bin_width}")
    try:
        bin_width = _op.index(bin_width)
    except TypeError:
        raise ValueError(
            f"bin_width must be an integer or 'auto': {bin_width!r}"
        ) from None
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1: {bin_width}")
    return bin_width

# Bounded sample size for bin_width="auto" (one extra aggregate job at
# operator-BUILD time, never on the repeated query path — the same
# philosophy as the as-of join's registry-time depth probe).
_AUTO_SAMPLE_ROWS = 100_000


def _auto_bin_width(*sides: tuple[DataFrame, str, str]) -> int:
    """Median interval length over a bounded sample, maximized across
    the given (df, lo, hi) sides.

    The docstrings' manual guidance — "pick W near the median interval
    length: smaller W inflates the build side, larger W packs unrelated
    rows into shared bins" — as a measurement instead of a guess. Of
    several sides (the overlap join replicates BOTH), the larger median
    wins: it caps the longer side's replication factor at ~2× while the
    shorter side's packing loss is bounded by the ratio of medians —
    the probe's W-sweep (docs/BENCH_NOTES_r10.md) shows the penalty
    curve is mild above the median and steep below it. Empty/degenerate
    sides contribute nothing; all-empty falls back to 1 (the join is
    empty anyway)."""
    medians = []
    for df, lo, hi in sides:
        row = (
            df.where(
                F.col(lo).isNotNull()
                & F.col(hi).isNotNull()
                & (F.col(hi) > F.col(lo))
            )
            .select(
                (F.col(hi).cast("bigint") - F.col(lo).cast("bigint")).alias(
                    "__len"
                )
            )
            .limit(_AUTO_SAMPLE_ROWS)
            .agg(F.percentile_approx("__len", 0.5).alias("m"))
            .collect()[0]
        )
        if row["m"] is not None:
            medians.append(int(row["m"]))
    return max(1, max(medians)) if medians else 1


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts: str,
    lo: str,
    hi: str,
    bin_width: int | str,
    max_bins_per_interval: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= ts < hi``.

    ``ts``/``lo``/``hi`` are integral (epoch seconds/millis — cast
    upstream); column sets of the two inputs must be disjoint. ``how``
    is ``inner`` or ``left_outer`` (every point at least once, interval
    columns NULL when nothing contains it — the enrich-else-keep
    shape). Returns points columns + intervals columns. For
    ``left_outer``, byte-identical duplicate point rows are classified
    by value — all copies match together, or all miss together — but a
    left-anti join preserves left-side multiplicity, so every unmatched
    copy survives as its own NULL-extended row; a unique point id is
    only needed when per-copy lineage matters.

    ``bin_width="auto"`` measures the interval side's median length
    with one bounded build-time job (:func:`_auto_bin_width`) instead
    of requiring the caller to know the data.
    """
    bin_width = _resolve_bin_width(bin_width, [(intervals, lo, hi)])
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer: {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")

    # integer `div` keeps the arithmetic exact for any epoch range
    # (floating / rounds above 2^53). `div` truncates toward zero, so
    # the bin straddling zero is effectively double-width for negative
    # epochs — candidate generation stays CORRECT regardless (trunc-div
    # is monotone, and the interval emits every bin between its
    # endpoints' bins), it just packs pre-1970 points a little coarser.
    lo_bin = F.expr(f"CAST({lo} AS BIGINT) div {bin_width}")
    hi_bin = F.expr(f"(CAST({hi} AS BIGINT) - 1) div {bin_width}")
    n_bins = hi_bin - lo_bin + 1
    guarded_hi_bin = F.when(
        F.assert_true(
            n_bins <= max_bins_per_interval,
            F.concat(
                F.lit(
                    f"point_in_interval_join: interval spans more than "
                    f"{max_bins_per_interval} bins of width {bin_width}; n_bins="
                ),
                n_bins.cast("string"),
            ),
        ).isNull(),
        hi_bin,
    )
    binned_iv = intervals.where(
        F.col(lo).isNotNull() & F.col(hi).isNotNull() & (F.col(hi) > F.col(lo))
    ).withColumn(
        "__bin",
        F.explode(F.sequence(lo_bin, guarded_hi_bin)),
    )
    binned_pt = points.where(F.col(ts).isNotNull()).withColumn(
        "__bin", F.expr(f"CAST({ts} AS BIGINT) div {bin_width}")
    )
    pred = (F.col(lo) <= F.col(ts)) & (F.col(ts) < F.col(hi))
    matched = (
        binned_pt.join(binned_iv, "__bin")
        .where(pred)
        .drop("__bin")
    )
    if how == "inner":
        return matched
    # left_outer: points matching nothing re-attach with NULL interval
    # columns; NULL-ts points are "contained by nothing" and kept too.
    misses = points.join(
        matched.select(*points.columns), points.columns, "left_anti"
    )
    for c in intervals.columns:
        misses = misses.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(misses)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    lo_l: str,
    hi_l: str,
    lo_r: str,
    hi_r: str,
    bin_width: int | str,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP: ``lo_l < hi_r AND
    lo_r < hi_l`` (half-open ``[lo, hi)`` semantics — touching
    endpoints do not overlap).

    The interval×interval twin of :func:`point_in_interval_join`: with
    no equi key Spark plans the bare overlap predicate as a
    BroadcastNestedLoopJoin (cost |L|·|R|, one side in memory). The
    standard rewrite bins BOTH sides — each interval replicates to
    every width-``W`` bin it touches — and an ordinary equi-join on
    the bin meets every overlapping pair, because two overlapping
    intervals necessarily co-reside in the bin holding
    ``max(lo_l, lo_r)`` (the later start lies inside both). A pair
    sharing several bins would duplicate, so the join keeps a pair
    ONLY in that first-shared-bin: ``__bin == greatest(lo_l, lo_r)
    div W`` — an expression-only dedup, no ``distinct()`` shuffle over
    the pair stream. Cost: each side inflates by ``~len/W + 1`` and
    the join is a plain hash/SMJ shuffle — AQE-skew-splittable,
    no broadcast requirement on either side.

    Bounds are integral (cast epochs upstream); column sets must be
    disjoint. Empty/invalid intervals (``hi <= lo``) and NULL bounds
    match nothing. The same ``max_bins_per_interval`` fail-fast guards
    both sides (no silent truncation of a degenerate open interval).
    ``bin_width="auto"`` takes the larger of the two sides' measured
    median lengths (see :func:`_auto_bin_width` for why larger wins).
    """
    bin_width = _resolve_bin_width(
        bin_width, [(left, lo_l, hi_l), (right, lo_r, hi_r)]
    )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")

    def _binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_bin = F.expr(f"CAST({lo} AS BIGINT) div {bin_width}")
        hi_bin = F.expr(f"(CAST({hi} AS BIGINT) - 1) div {bin_width}")
        n_bins = hi_bin - lo_bin + 1
        guarded = F.when(
            F.assert_true(
                n_bins <= max_bins_per_interval,
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans more than "
                        f"{max_bins_per_interval} bins of width {bin_width};"
                        f" n_bins="
                    ),
                    n_bins.cast("string"),
                ),
            ).isNull(),
            hi_bin,
        )
        return df.where(
            F.col(lo).isNotNull()
            & F.col(hi).isNotNull()
            & (F.col(hi) > F.col(lo))
        ).withColumn("__bin", F.explode(F.sequence(lo_bin, guarded)))

    pred = (F.col(lo_l) < F.col(hi_r)) & (F.col(lo_r) < F.col(hi_l))
    # trunc-div spelling must match the bin assignment exactly
    first_shared = F.expr(
        f"greatest(CAST({lo_l} AS BIGINT), CAST({lo_r} AS BIGINT))"
        f" div {bin_width}"
    )
    return (
        _binned(left, lo_l, hi_l)
        .join(_binned(right, lo_r, hi_r), "__bin")
        .where(pred & (F.col("__bin") == first_shared))
        .drop("__bin")
    )
