"""Dataset statistics and schema artifacts (SURVEY.md A3/A4).

The reference's usage sketch declares (commented-out) ``statistics`` and
``schema`` outputs (``usage_prototype.py:60-61``) — TFDV-style per-feature
statistics and a schema artifact. Rebuilt natively:

- :func:`column_stats` — one row per column: count / nulls / distinct /
  min / max / mean / stddev. One single-column aggregation job per
  column, submitted concurrently (each scans ONLY its column through
  parquet pruning, stays in whole-stage codegen, map-side partials);
  results assemble driver-side (a constant-size result).
- :func:`schema_artifact` — the DataFrame schema as JSON (the analog of
  the schema output; Catalyst gives it without any probe query, unlike
  the reference's ``LIMIT 0`` round-trip at ``converters.py:43-48``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    max_concurrency: int = 8,
) -> DataFrame:
    """Per-column statistics as rows: (column, count, n_null, n_distinct,
    min_val, max_val, mean_val, stddev_val) — numeric-only fields NULL for
    non-numeric columns; min/max reported as strings for portability.

    One aggregation job PER COLUMN, submitted from a thread pool. The
    obvious alternative — a single wide aggregate with one
    ``countDistinct`` per column — plans an Expand that duplicates every
    input row (ncols + 1) times and a 30+-field aggregate that falls out
    of whole-stage codegen: measured 4x slower at sf0.1, and the Expand
    multiplies shuffle volume by the column count at ANY scale. The
    per-column jobs each read only their own column (parquet pruning,
    codegen, exact distinct via the standard two-phase rewrite), and
    concurrent submission keeps the cluster busy across job boundaries.

    Consistency caveat: each column is computed by an independent job, so
    if the underlying files change between jobs (e.g. a concurrently
    appended table) different columns may reflect different snapshots.
    For mutable inputs, snapshot the table first (or cache ``df``) —
    immutable parquet at a fixed path (the normal case here) is safe.
    """
    if max_concurrency < 1:
        raise ValueError(f"max_concurrency must be >= 1, got {max_concurrency}")
    cols = columns if columns is not None else df.columns
    dtypes = dict(df.dtypes)

    def one(c: str):
        is_num = dtypes[c].split("(")[0] in _NUMERIC
        r = (
            df.select(F.col(c))
            .agg(
                F.count(F.col(c)).alias("cnt"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("nnull"),
                F.countDistinct(F.col(c)).alias("nd"),
                F.min(F.col(c)).cast("string").alias("mn"),
                F.max(F.col(c)).cast("string").alias("mx"),
                (
                    F.round(F.avg(F.col(c)), 4)
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("mean"),
                (
                    F.round(F.stddev_samp(F.col(c)), 4)
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("std"),
            )
            .collect()[0]
        )
        return (c, r["cnt"], r["nnull"], r["nd"], r["mn"], r["mx"],
                r["mean"], r["std"])

    from concurrent.futures import ThreadPoolExecutor

    spark = df.sparkSession
    if cols:
        with ThreadPoolExecutor(min(max_concurrency, len(cols))) as ex:
            out = list(ex.map(one, cols))  # preserves column order
    else:
        out = []
    return spark.createDataFrame(
        out,
        "column string, count bigint, n_null bigint, n_distinct bigint, "
        "min_val string, max_val string, mean_val double, stddev_val double",
    )


def schema_artifact(df: DataFrame) -> str:
    """Schema as a stable JSON artifact (name/type/nullable per field)."""
    fields = [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]
    return json.dumps({"fields": fields}, indent=2, sort_keys=True)


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column (TFDV-style statistics,
    drift monitoring between dataset versions): one map-side-combinable
    aggregation — bin assignment is a scan-time expression, the shuffle
    moves (group, bin, count) partials only, so 100 TB histograms cost
    one light shuffle.

    Bins are [lo, hi) in ``n_bins`` equal widths, with underflow clamped
    to bin 0 and overflow to bin ``n_bins - 1`` (closed histogram — every
    NON-NULL row lands somewhere, so counts reconcile with the non-null
    row count; NULLs are excluded — count them upstream via
    :func:`column_stats`, which already reports ``n_null``).
    Output: (group_cols..., bin, bin_lo, bin_hi, n). Pure portable
    arithmetic (floor of a linear map) — SQL-oracle replayable.
    """
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive: {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo: lo={lo}, hi={hi}")
    df = df.filter(F.col(col).isNotNull())
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    keys = [*(group_cols or []), "bin"]
    return (
        df.withColumn("bin", bin_)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias(
                "bin_hi"
            ),
            "n",
        )
    )


# Truncated Poisson(1) CDF, P(K > 12) ~ 6e-11: the same double literals
# evaluate identically in any engine, so the bootstrap replays exactly.
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
    0.9999998885745216,
    0.9999999899522336,
    0.9999999991683892,
    0.9999999999364022,
]


def bootstrap_metric_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    group_cols: list[str] | None = None,
    replicates: int = 100,
    level: float = 0.95,
    salt: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a per-group mean.

    The scale-out bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", Google 2012; ubiquitous in A/B metric
    pipelines): instead of resampling n rows with replacement per
    replicate — which needs global coordination — each (row, replicate)
    pair draws an independent Poisson(1) weight, which converges to the
    multinomial bootstrap for large n. Every weight here is a
    DETERMINISTIC function of (row id, replicate, salt) via the md5
    uniform + inverse-CDF trick (the repo's DSIR/DP precedent), so the
    whole procedure — weights, replicate metrics, percentile bounds —
    replays bit-for-bit in an ANSI oracle and across retries.

    Output per group: ``point`` (the unweighted mean), ``ci_lo`` /
    ``ci_hi`` (the ``level`` percentile interval of the replicate
    means, discrete — element at ceil(q * n_replicates) of the sorted
    replicate metrics), and ``n_replicates`` actually used. Replicates
    whose resample is empty (all weights 0 — probability ~e^-n per
    replicate, only relevant for tiny groups) are dropped from the
    percentile basis and reflected in ``n_replicates``.

    Exactness: pass an INTEGER ``value_col`` (the cents pattern) and
    every replicate sum is exact 64-bit arithmetic; the only floats are
    the final divisions and the CDF thresholds, both deterministic.

    Plan shape (scale notes): the replicate dimension explodes
    MAP-LOCALLY (``explode(sequence(...))`` — no join, no shuffle for
    the blowup) and immediately partial-aggregates: the shuffle carries
    one row per (group, replicate) per mapper, never the exploded data.
    The percentile step sorts ``replicates`` values per group inside an
    array — bounded, driver-free. Total shuffle volume:
    |groups| x replicates tiny rows.
    """
    if replicates < 2:
        raise ValueError(f"replicates must be >= 2: {replicates}")
    if not 0.0 < level < 1.0:
        raise ValueError(f"level must be in (0, 1): {level}")
    gcols = list(group_cols or [])

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.col(id_col).cast("string"),
                        F.col("__rep").cast("string"),
                        F.lit(salt),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))
    w = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)

    exploded = df.select(
        *gcols,
        F.col(id_col),
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("__rep"),
    ).withColumn("__w", w)
    rep_metrics = (
        exploded.groupBy(*gcols, "__rep")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__s"),
            F.sum("__w").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .select(
            *gcols,
            (F.col("__s") / F.col("__n")).alias("__m"),
        )
    )
    lo_q = (1.0 - level) / 2.0
    hi_q = (1.0 + level) / 2.0
    per_group = rep_metrics.groupBy(*gcols).agg(
        F.array_sort(F.collect_list("__m")).alias("__arr"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    lo_idx = F.ceil(F.lit(lo_q) * F.col("n_replicates")).cast("int")
    hi_idx = F.ceil(F.lit(hi_q) * F.col("n_replicates")).cast("int")
    point = df.groupBy(*gcols).agg(
        (F.sum(value_col) / F.count(value_col)).alias("__point")
    )
    joined = (
        per_group.join(point, gcols) if gcols
        else per_group.crossJoin(point)
    )
    return joined.select(
        *gcols,
        F.round(F.col("__point"), 4).alias("point"),
        F.round(
            F.element_at(F.col("__arr"), F.greatest(lo_idx, F.lit(1))), 4
        ).alias("ci_lo"),
        F.round(
            F.element_at(F.col("__arr"), F.greatest(hi_idx, F.lit(1))), 4
        ).alias("ci_hi"),
        F.col("n_replicates").cast("long").alias("n_replicates"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error for a [0,1]
    score against a binary label (Naeini et al. 2015's binned ECE —
    the standard audit before a model/heuristic score is USED as a
    probability, which :func:`..curation.weighted_sample` literally
    does when it treats ``quality_score`` as a keep-probability).

    Equal-width bins ``[i/n, (i+1)/n)`` with score 1.0 clamped into
    the top bin. Input contract, enforced LOUD: scores must be
    non-NULL and inside [0,1], labels non-NULL — a mis-scaled score
    (logit instead of probability, a stray -1 sentinel, NULLs from an
    outer join) raises at execution via a JVM-side ``raise_error``
    branch instead of quietly landing in a phantom bin and biasing the
    n-weighted ECE scalar. The guard is a ``when`` over the same
    projection — no extra scan, no UDF. Output, one row per NON-EMPTY
    bin: ``(bin, n,
    mean_score, pos_rate, gap, ece)`` — ``gap = |mean_score -
    pos_rate|`` is the bin's reliability deviation and ``ece`` (the
    n-weighted mean gap, identical on every row) rides along so one
    frame carries both the diagram and the scalar.

    Plan shape: one hash aggregate keyed on the bin (map-side
    combinable — the shuffle moves ``n_bins`` partials per mapper, not
    rows); the ECE scalar is a global window over the RESULTING bin
    frame, which is bounded by ``n_bins`` rows — so the single-
    partition window is free, and crucially the corpus subtree is
    consumed ONCE (an aggregate-and-join-back spelling re-derives the
    bin aggregate from a second full scan — the multi-consumer defect
    class the r12 pin audit hunts). 100 TB of scored documents costs
    one scan + one tiny shuffle.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    bad = s.isNull() | y.isNull() | (s < 0.0) | (s > 1.0)
    checked = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "calibration_bins: out-of-contract input "
                "(%s must be a non-NULL probability in [0,1], "
                "%s non-NULL): score=%s label=%s",
                F.lit(score_col),
                F.lit(label_col),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.coalesce(y.cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(s)
    bin_ = F.least(
        F.floor(checked * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per = (
        df.select(
            bin_.alias("bin"),
            checked.alias("__s"),
            y.alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("__ms"),
            F.avg("__y").alias("__pr"),
        )
    )
    # <= n_bins rows from here on: the global window costs nothing and
    # keeps the corpus subtree single-consumer
    w_all = Window.partitionBy()
    gap = F.abs(F.col("__ms") - F.col("__pr"))
    ece = F.sum(F.col("n") * gap).over(w_all) / F.sum("n").over(w_all)
    return per.select(
        "bin",
        "n",
        F.round("__ms", 6).alias("mean_score"),
        F.round("__pr", 6).alias("pos_rate"),
        F.round(gap, 6).alias("gap"),
        F.round(ece, 6).alias("ece"),
    )


def _grid_range_guard(
    per: DataFrame,
    *,
    decimals: int,
    max_grid_cells: int,
    op: str,
    with_groups: bool = False,
) -> DataFrame:
    """Enforce the bounded-grid contract shared by :func:`ks_two_sample`
    and :func:`quantile_shift` (ADVICE r14 medium): ``round(v, decimals)``
    only bounds the grid frame for values in a bounded range — for
    general numeric columns (latencies, counts, doc lengths) snapping
    reduces nothing and the unkeyed cumulative-ECDF windows downstream
    would funnel every distinct value through ONE task. This guard makes
    the window input STRUCTURALLY bounded: the OCCUPIED grid-cell count
    (exact — counted off the grid frame itself, so wide-range but
    low-cardinality columns stay in contract) must be at most
    ``max_grid_cells``, else every row raises LOUD with a rescale hint
    naming the observed value range.

    Plan shape: the 1-row ``(cells, min, max)`` bounds frame is a
    map-side-combinable global aggregate over the SAME grid-groupBy
    exchange the main path consumes (the count forces it to read the
    grouped frame, so Catalyst cannot collapse it onto a second corpus
    scan and ReuseExchange dedupes — still ONE corpus scan),
    broadcast-cross-joined back; the ``raise_error`` gates ``__v``
    itself (never prunable) and fires in the DISTRIBUTED pre-window
    stage, before any single-partition exchange exists. Out-of-contract
    input costs one distributed grid shuffle before raising — never a
    one-task funnel.

    ``with_groups=True`` (r16, VERDICT r15 item 7) additionally rides
    the lexicographic group names and the distinct-group count on the
    SAME 1-row bounds aggregate and passes them through as ``__ga`` /
    ``__gb`` / ``__ngrp`` columns: the callers previously re-derived
    them with three unkeyed window functions over the grid frame — one
    more single-partition exchange + sort per query for values the
    broadcast bounds row already visits. Same values by construction
    (both spellings aggregate the same grid frame).
    """
    # summing __c (not just counting cells) keeps the grid groupBy —
    # with its count aggregate — in this branch's plan, so its shuffle
    # exchange is byte-identical to the main path's and ReuseExchange
    # collapses the two into ONE corpus scan
    bound_aggs = [
        F.count(F.lit(1)).alias("__cells"),
        F.min("__v").alias("__vmin"),
        F.max("__v").alias("__vmax"),
        F.sum("__c").alias("__nrows"),
    ]
    if with_groups:
        # size(collect_set) — the same spelling the removed windows
        # used — stays a single-pass aggregate; count_distinct would
        # trigger the Expand rewrite and cost an extra exchange
        bound_aggs += [
            F.min("__grp").alias("__ga"),
            F.max("__grp").alias("__gb"),
            F.size(F.collect_set("__grp")).alias("__ngrp"),
        ]
    bounds = per.agg(*bound_aggs)
    guarded_v = F.when(
        F.col("__cells") <= F.lit(max_grid_cells), F.col("__v")
    ).otherwise(
        F.raise_error(
            F.format_string(
                op + ": %s occupied (value, group) grid cells over range"
                " [%s, %s] (%s rows) at decimals=" + str(decimals)
                + ", past the max_grid_cells=" + str(max_grid_cells)
                + " bounded-grid contract — rescale the column to a"
                " bounded domain (e.g. a [0, 1] score), lower decimals,"
                " or raise max_grid_cells",
                F.col("__cells").cast("string"),
                F.col("__vmin").cast("string"),
                F.col("__vmax").cast("string"),
                F.col("__nrows").cast("string"),
            )
        ).cast("double")
    )
    passthrough = ["__ga", "__gb", "__ngrp"] if with_groups else []
    return per.crossJoin(F.broadcast(bounds)).select(
        guarded_v.alias("__v"), "__grp", "__c", *passthrough
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    decimals: int = 4,
    max_grid_cells: int = 2_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of exactly two groups - the drift audit that
    complements :func:`feature_drift_psi`'s binned divergence with the
    sup-norm ECDF distance (no binning choice to defend; PSI can
    under-read when drift concentrates between bin edges). Typical
    use: quality-score distribution of this week's crawl vs last
    week's, or train split vs eval split.

    Values are snapped to a ``decimals`` grid first (engine-portable:
    the ECDF is evaluated at grid points; with ties counted - which
    snapping does - the sup over grid points equals the sup over the
    snapped sample). NULL values/groups are dropped. Returns ONE row:
    ``(group_a, group_b, n_a, n_b, ks_stat)`` with groups in
    lexicographic order; raises LOUD (in-plan ``raise_error``, the
    :func:`calibration_bins` contract style) if the column holds a
    number of distinct groups other than 2.

    Bounded-grid contract: snapping bounds the grid frame ONLY when
    the value range is bounded (a [0, 1] score at ``decimals=4`` means
    <= 10^4 + 1 distinct snapped values per group). For an unbounded
    high-cardinality column the cumulative-ECDF window below would
    funnel every distinct value through one task, so the plan raises
    LOUD (in the distributed pre-window stage, via
    :func:`_grid_range_guard`) when the occupied ``(value, group)``
    grid-cell count exceeds ``max_grid_cells`` — rescale to a bounded
    domain or lower ``decimals`` instead.

    Plan shape: ONE corpus scan - a map-side-combinable count
    aggregate keyed on the snapped ``(value, group)`` pair (repeated
    values pre-collapse per mapper; the shuffle moves at most one
    partial per grid cell per mapper, not rows). Everything after
    operates on that grid frame, structurally bounded by
    ``max_grid_cells`` rows: the group-name/window bookkeeping and the
    cumulative-ECDF window are the same "single-partition window over
    a provably tiny frame" contract as :func:`calibration_bins`.
    Nothing data-sized reaches the driver.
    """
    if decimals < 1:
        raise ValueError(f"decimals must be >= 1: {decimals}")
    from pyspark.sql import Window

    snapped = df.select(
        F.round(F.col(value_col).cast("double"), decimals).alias("__v"),
        F.col(group_col).cast("string").alias("__grp"),
    ).where(F.col("__v").isNotNull() & F.col("__grp").isNotNull())
    # the ONLY corpus-sized job: everything below runs on the guarded
    # grid frame, structurally <= max_grid_cells rows
    # group names + distinct-group count ride the guard's 1-row bounds
    # aggregate (with_groups) instead of three unkeyed windows over the
    # grid frame (r16): the window bookkeeping pass over the grid frame
    # is gone. The explicit repartition(1) keeps the OLD plan's
    # post-grid shape — one single-partition exchange that the wide
    # pivot, the cumulative-ECDF window and the final aggregate all run
    # on in place (the removed windows' exchange used to play that
    # role; without it the pivot would pay a distributed exchange AND
    # the window its own gather — two exchanges of the grid frame
    # instead of one, measured +0.3 s at sf0.1). Bounded by the
    # max_grid_cells contract, so the single partition is the designed
    # shape, not a funnel.
    per = _grid_range_guard(
        snapped.groupBy("__v", "__grp").agg(F.count(F.lit(1)).alias("__c")),
        decimals=decimals,
        max_grid_cells=max_grid_cells,
        op="ks_two_sample",
        with_groups=True,
    )
    w_all = Window.partitionBy()
    wide = per.repartition(1).groupBy("__v", "__ga", "__gb", "__ngrp").agg(
        F.sum(
            F.when(F.col("__grp") == F.col("__ga"), F.col("__c")).otherwise(
                F.lit(0)
            )
        ).alias("__ca"),
        F.sum(
            F.when(F.col("__grp") == F.col("__gb"), F.col("__c")).otherwise(
                F.lit(0)
            )
        ).alias("__cb"),
    )
    w_cum = Window.partitionBy().orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the 2-group contract gates the statistic itself, so Catalyst can
    # never prune the guard away as an unused column
    diff = F.abs(
        F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_all)
        - F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_all)
    )
    guarded = F.when(F.col("__ngrp") == 2, diff).otherwise(
        F.raise_error(
            F.format_string(
                "ks_two_sample: %s must hold exactly 2 groups, got %s",
                F.lit(group_col),
                F.col("__ngrp").cast("string"),
            )
        ).cast("double")
    )
    scored = wide.select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        F.sum("__ca").over(w_all).alias("n_a"),
        F.sum("__cb").over(w_all).alias("n_b"),
        guarded.alias("__d"),
    )
    return scored.groupBy("group_a", "group_b", "n_a", "n_b").agg(
        F.round(F.max("__d"), 6).alias("ks_stat")
    )


def categorical_mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Mutual information (bits) between two categorical columns, with
    both marginal entropies and the normalized MI — the feature-
    selection / leakage audit ("does the split correlate with the
    label?", "how much does language predict the quality bucket?")
    that belongs beside :func:`~.stats.ks_two_sample` in a dataset
    card. NULL in either column drops the row (MI is defined over the
    joint support).

    Returns ONE row ``(n, mi, h_a, h_b, nmi)``; ``nmi = mi /
    sqrt(h_a * h_b)`` (NULL when either entropy is 0 — a constant
    column carries no information to normalize by).

    All four statistics come off ONE corpus scan: the joint ``(a, b)``
    count aggregate is the only corpus-sized job (map-side
    combinable); marginals attach as windows over the JOINT frame
    (bounded by |A| x |B| rows — this operator is for categorical
    columns, where that product is small by definition), using the
    identity ``sum_pairs c * log2(c_a) = sum_a c_a * log2(c_a)``
    (the inner sum over b of c is c_a), so no second aggregate or
    join-back ever touches the corpus::

        MI  = sum_pairs (c/n) * (log2 c + log2 n - log2 c_a - log2 c_b)
        H_a = log2 n - (sum_pairs c * log2 c_a) / n
    """
    from pyspark.sql import Window

    joint = (
        df.select(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_all = Window.partitionBy()
    w_a = Window.partitionBy("__a")
    w_b = Window.partitionBy("__b")
    scored = joint.select(
        F.col("__c"),
        F.sum("__c").over(w_all).alias("__n"),
        F.sum("__c").over(w_a).alias("__ca"),
        F.sum("__c").over(w_b).alias("__cb"),
    )
    agg = scored.agg(
        F.max("__n").alias("n"),
        (
            F.sum(
                F.col("__c")
                * (
                    F.log2("__c")
                    + F.log2("__n")
                    - F.log2("__ca")
                    - F.log2("__cb")
                )
            )
            / F.max("__n")
        ).alias("__mi"),
        (
            F.log2(F.max("__n"))
            - F.sum(F.col("__c") * F.log2("__ca")) / F.max("__n")
        ).alias("__ha"),
        (
            F.log2(F.max("__n"))
            - F.sum(F.col("__c") * F.log2("__cb")) / F.max("__n")
        ).alias("__hb"),
    )
    return agg.select(
        "n",
        F.round("__mi", 6).alias("mi"),
        F.round("__ha", 6).alias("h_a"),
        F.round("__hb", 6).alias("h_b"),
        F.when(
            (F.col("__ha") > 0) & (F.col("__hb") > 0),
            F.round(
                F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")), 6
            ),
        ).alias("nmi"),
    )


def quantile_shift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    quantiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    decimals: int = 4,
    max_grid_cells: int = 2_000_000,
) -> DataFrame:
    """Quantile-quantile drift table between exactly two groups: for
    each requested quantile, the value at that ECDF level in each
    group and the shift between them — the WHERE-did-it-move
    companion to :func:`ks_two_sample`'s single sup-norm number (a
    monitor wants both: KS says drift exists, the QQ table says "the
    median moved +0.04 but the tails are stable").

    Quantile convention: ``v_g(q) = min { v : F_g(v) >= q }`` on the
    ``decimals``-snapped grid (the inverse-ECDF / type-1 quantile —
    exact, no interpolation, so both engines agree bit-for-bit).
    Returns one row per quantile: ``(q, group_a, group_b, v_a, v_b,
    shift)`` with groups lexicographic and ``shift = v_b - v_a``;
    raises LOUD in-plan on != 2 groups (the
    :func:`ks_two_sample` contract).

    Plan shape: identical to :func:`ks_two_sample` — ONE corpus scan
    into a map-side-combinable ``(value, group)`` count aggregate,
    then everything (cumulative ECDFs, the broadcast quantile frame,
    the min-over-threshold picks) runs on the grid frame, structurally
    bounded by ``max_grid_cells`` rows under the same bounded-grid
    contract (:func:`_grid_range_guard` raises LOUD, pre-window and
    distributed, when occupied grid cells exceed the cap).
    """
    if decimals < 1:
        raise ValueError(f"decimals must be >= 1: {decimals}")
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1]: {q}")
    from pyspark.sql import Window

    spark = df.sparkSession
    snapped = df.select(
        F.round(F.col(value_col).cast("double"), decimals).alias("__v"),
        F.col(group_col).cast("string").alias("__grp"),
    ).where(F.col("__v").isNotNull() & F.col("__grp").isNotNull())
    # group bookkeeping rides the guard's bounds aggregate; the
    # repartition(1) keeps the one-exchange post-grid shape — see
    # ks_two_sample (r16)
    per = _grid_range_guard(
        snapped.groupBy("__v", "__grp").agg(F.count(F.lit(1)).alias("__c")),
        decimals=decimals,
        max_grid_cells=max_grid_cells,
        op="quantile_shift",
        with_groups=True,
    )
    w_all = Window.partitionBy()
    wide = per.repartition(1).groupBy("__v", "__ga", "__gb", "__ngrp").agg(
        F.sum(
            F.when(F.col("__grp") == F.col("__ga"), F.col("__c")).otherwise(
                F.lit(0)
            )
        ).alias("__ca"),
        F.sum(
            F.when(F.col("__grp") == F.col("__gb"), F.col("__c")).otherwise(
                F.lit(0)
            )
        ).alias("__cb"),
    )
    w_cum = Window.partitionBy().orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fa = F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_all)
    fb = F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_all)
    guarded_fa = F.when(F.col("__ngrp") == 2, fa).otherwise(
        F.raise_error(
            F.format_string(
                "quantile_shift: %s must hold exactly 2 groups, got %s",
                F.lit(group_col),
                F.col("__ngrp").cast("string"),
            )
        ).cast("double")
    )
    fracs = wide.select(
        "__v",
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        guarded_fa.alias("__fa"),
        fb.alias("__fb"),
    )
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    return (
        fracs.crossJoin(F.broadcast(qf))
        .groupBy("q", "group_a", "group_b")
        .agg(
            # plain >=, no epsilon: both engines compute the fraction
            # as the SAME exact-long division, so the doubles agree
            # bit-for-bit and the oracle replays the comparison as-is
            F.min(F.when(F.col("__fa") >= F.col("q"), F.col("__v")))
            .alias("v_a"),
            F.min(F.when(F.col("__fb") >= F.col("q"), F.col("__v")))
            .alias("v_b"),
        )
        .select(
            "q",
            "group_a",
            "group_b",
            "v_a",
            "v_b",
            F.round(F.col("v_b") - F.col("v_a"), decimals).alias("shift"),
        )
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    num_buckets: int = 64,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """EXACT tie-aware ROC-AUC (the Mann-Whitney U statistic) of a
    numeric score against a binary label — the classifier-quality
    audit a curation pipeline runs before trusting a learned quality /
    toxicity / contamination score at corpus scale.

    The textbook spelling ranks every row through ``row_number() OVER
    (ORDER BY score)`` — a single-partition global Window that never
    finishes at 100 TB. Here the global rank comes from the
    bucket-decomposed machinery (:func:`..rowid.assign_global_row_ids`),
    which is safe under ties for THIS statistic: the bucket function is
    value-based, so a tied score group is a contiguous rank block, and
    the tie-average rank used by the U statistic is
    ``(min_rank + max_rank) / 2`` of that block — permutation-invariant
    even though individual tied rows get arbitrary ranks.

    Exact-integer portability: with ``S2 = sum over scores of
    n_pos(score) * (min_rank + max_rank)`` (twice the positive rank
    sum, an INTEGER), ``AUC = (S2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg)``
    — every term is an exact integer (summed in ``decimal(38,0)`` so
    100 TB rank sums cannot overflow long) and the ONE double division
    at the end is the same IEEE op in any engine; no float aggregation
    order anywhere.

    Input contract, enforced LOUD in-plan: labels must be non-NULL 0/1
    and scores non-NULL (a NULL or stray label value raises instead of
    silently shrinking a class); a single-class input (``n_pos`` or
    ``n_neg`` zero) raises at the final projection — AUC is undefined.

    Plan: rank assignment (two passes over the (score,label)
    projection), one map-side-combinable per-score aggregate, one 1-row
    global aggregate. Output: one row ``(n_pos, n_neg, u2, auc)`` where
    ``u2`` is the exact integer numerator ``2*U``.

    Reference scope: the reference delegates execution to BigQuery and
    has no evaluation surface (feast_component/executor.py:87-163);
    part of the SURVEY.md §2.9 scale extension inventory.
    """
    from .rowid import assign_global_row_ids

    s = F.col(score_col)
    y = F.col(label_col).cast("bigint")
    bad = s.isNull() | y.isNull() | ~y.isin(0, 1)
    checked_y = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "auc_roc: out-of-contract input (%s must be non-NULL, "
                "%s a non-NULL 0/1 label): score=%s label=%s",
                F.lit(score_col),
                F.lit(label_col),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.coalesce(y.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(y)
    vals = df.select(s.alias("__v"), checked_y.alias("__y"))
    ranked = assign_global_row_ids(
        vals,
        "__v",
        id_col="__rid",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    per_score = ranked.groupBy("__v").agg(
        F.sum("__y").alias("__npos"),
        (F.min("__rid") + 1).alias("__rmin"),  # ranks are 1-based
        (F.max("__rid") + 1).alias("__rmax"),
    )
    totals = per_score.agg(
        F.sum(
            (F.col("__npos") * (F.col("__rmin") + F.col("__rmax"))).cast(
                "decimal(38,0)"
            )
        ).alias("__s2"),
        F.sum("__npos").alias("__np"),
        F.sum(F.col("__rmax") - F.col("__rmin") + 1).alias("__n"),
    )
    np_ = F.col("__np")
    nn = F.col("__n") - F.col("__np")
    u2 = (F.col("__s2") - (np_ * (np_ + 1)).cast("decimal(38,0)")).cast(
        "decimal(38,0)"
    )
    degenerate = (np_ == 0) | (nn == 0)
    auc = F.when(
        degenerate,
        F.raise_error(
            F.format_string(
                "auc_roc: AUC undefined for a single-class input "
                "(n_pos=%s n_neg=%s)",
                np_.cast("string"),
                nn.cast("string"),
            )
        ).cast("double"),
    ).otherwise(
        u2.cast("double") / (2.0 * np_.cast("double") * nn.cast("double"))
    )
    return totals.select(
        np_.cast("bigint").alias("n_pos"),
        nn.cast("bigint").alias("n_neg"),
        u2.cast("bigint").alias("u2"),
        auc.alias("auc"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    num_buckets: int = 64,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Average Precision (the PR-AUC finite sum: ``AP = sum over
    descending score thresholds t of (npos_t / n_pos) * (cumTP_t /
    cumN_t)``) — :func:`auc_roc`'s companion for the imbalanced-class
    regime every filter-gate audit lives in (precision against the
    rare positive class, not ranking against the majority).

    Ties handled at THRESHOLD granularity (the deterministic
    convention): scores collapse to one per-score row first, so which
    tied row is "first" never matters. The cumulative TP / cumulative
    N columns come from :func:`..rowid.prefix_sum` over the per-score
    frame ordered by DESCENDING score (negated key) — no
    single-partition Window even when the score is continuous and the
    per-score frame is corpus-sized. Each threshold's term is floored
    to integer nano-units from EXACT integer inputs (one fixed IEEE
    double sequence, so any engine lands on the same integer), and the
    final AP is the exact long sum of terms over 1e9 — summation-order
    free. Same LOUD contracts as :func:`auc_roc`: non-0/1 or NULL
    labels, NULL scores, and a positive-free input all raise.

    Output: one row ``(n_pos, n_neg, ap_nano, ap)``.

    Reference scope: no evaluation surface in the reference
    (feast_component/executor.py:87-163); SURVEY.md §2.9 extension.
    """
    from .rowid import prefix_sum

    s = F.col(score_col)
    y = F.col(label_col).cast("bigint")
    bad = s.isNull() | y.isNull() | ~y.isin(0, 1)
    checked_y = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "average_precision: out-of-contract input (%s must be "
                "non-NULL, %s a non-NULL 0/1 label): score=%s label=%s",
                F.lit(score_col),
                F.lit(label_col),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.coalesce(y.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(y)
    per_score = (
        df.select((-s).alias("__negs"), checked_y.alias("__y"))
        .groupBy("__negs")
        .agg(
            F.count(F.lit(1)).cast("int").alias("__n"),
            F.sum("__y").cast("int").alias("__npos"),
        )
    )
    cum_n = prefix_sum(
        per_score,
        "__negs",
        "__n",
        out_col="__cn",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    cum = prefix_sum(
        cum_n,
        "__negs",
        "__npos",
        out_col="__ctp",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    totals = cum.agg(
        F.max("__cn").alias("__ntot"), F.max("__ctp").alias("__np")
    )
    np_d = F.col("__np").cast("double")
    term = F.when(
        F.col("__np") == 0,
        F.raise_error(
            F.lit("average_precision: undefined without positives (n_pos=0)")
        ).cast("long"),
    ).otherwise(
        F.floor(
            F.col("__npos").cast("double")
            * F.col("__ctp").cast("double")
            * F.lit(1e9)
            / (np_d * F.col("__cn").cast("double"))
            + F.lit(0.5)
        ).cast("long")
    )
    out = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(term).alias("ap_nano"),
            F.max("__np").alias("__np2"),
            F.max("__ntot").alias("__nt2"),
        )
    )
    np2 = F.col("__np2")
    return out.select(
        np2.cast("bigint").alias("n_pos"),
        (F.col("__nt2") - np2).cast("bigint").alias("n_neg"),
        F.col("ap_nano").alias("ap_nano"),
        (F.col("ap_nano").cast("double") / F.lit(1e9)).alias("ap"),
    )


def roc_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    num_buckets: int = 64,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """The full ROC curve table — one row per distinct score threshold
    with ``(tpr, fpr)`` at "predict positive when score >= threshold"
    — completing the evaluation trio beside :func:`auc_roc` (the
    scalar) and :func:`average_precision` (the PR scalar). A monitor
    plots it, a threshold-picker scans it; at corpus scale with
    continuous scores the threshold frame is itself corpus-sized,
    which is exactly why the cumulative columns ride
    :func:`..rowid.prefix_sum` (descending threshold order via the
    negated key) instead of a single-partition cumulative Window.

    ``tpr = cum_tp / n_pos`` and ``fpr = (cum_n - cum_tp) / n_neg``
    are each ONE IEEE division of exact integers — deterministic in
    any engine, no float aggregation anywhere. Contracts as
    :func:`auc_roc`, enforced LOUD in-plan: non-0/1 or NULL labels,
    NULL scores, single-class inputs.

    Output: ``(threshold, n_at, pos_at, cum_n, cum_tp, tpr, fpr)``
    ordered meaning-free (consumers sort by threshold).
    """
    from .rowid import prefix_sum

    s = F.col(score_col)
    y = F.col(label_col).cast("bigint")
    bad = s.isNull() | y.isNull() | ~y.isin(0, 1)
    checked_y = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "roc_curve: out-of-contract input (%s must be non-NULL, "
                "%s a non-NULL 0/1 label): score=%s label=%s",
                F.lit(score_col),
                F.lit(label_col),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.coalesce(y.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(y)
    per_score = (
        df.select((-s).alias("__negs"), checked_y.alias("__y"))
        .groupBy("__negs")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_at"),
            F.sum("__y").cast("int").alias("pos_at"),
        )
    )
    cum = prefix_sum(
        prefix_sum(
            per_score,
            "__negs",
            "n_at",
            out_col="cum_n",
            num_buckets=num_buckets,
            sample_fraction=sample_fraction,
        ),
        "__negs",
        "pos_at",
        out_col="cum_tp",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    totals = cum.agg(
        F.max("cum_n").alias("__nt"), F.max("cum_tp").alias("__np")
    )
    np_ = F.col("__np")
    nn = F.col("__nt") - np_
    guard = (np_ == 0) | (nn == 0)
    tpr = F.when(
        guard,
        F.raise_error(
            F.format_string(
                "roc_curve: undefined for a single-class input "
                "(n_pos=%s n_neg=%s)",
                np_.cast("string"),
                nn.cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.col("cum_tp").cast("double") / np_.cast("double"))
    fpr = (F.col("cum_n") - F.col("cum_tp")).cast("double") / nn.cast(
        "double"
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        (-F.col("__negs")).alias("threshold"),
        F.col("n_at").cast("bigint").alias("n_at"),
        F.col("pos_at").cast("bigint").alias("pos_at"),
        F.col("cum_n").alias("cum_n"),
        F.col("cum_tp").alias("cum_tp"),
        tpr.alias("tpr"),
        fpr.alias("fpr"),
    )


def grouped_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    *,
    num_buckets: int = 64,
    sample_fraction: float = 0.1,
    max_offset_entries: int = 65_536,
) -> DataFrame:
    """Per-GROUP exact tie-aware ROC-AUC — the per-language /
    per-source edition of :func:`auc_roc`, for the audit a curation
    pipeline actually runs ("is the quality score as discriminative on
    Thai as on English?"). One row per group.

    The per-group rank comes from
    :func:`..rowid.assign_grouped_row_ids` (global frozen boundaries,
    per-(group, bucket) literal offsets — bounded group set, capped
    LOUD), so no group ever funnels through one task; the tie-block
    contiguity argument of :func:`auc_roc` holds within each group
    because the bucket function is value-based. Same integer-exact U
    arithmetic up to ONE IEEE division per group.

    A single-class group (all-positive or all-negative — plausible in
    real per-language slices, not a caller error) yields ``auc = NULL``
    rather than raising; the exact integer ``u2`` is NULL there too.
    Label contract stays LOUD as in :func:`auc_roc`.

    Output: ``(group_cols..., n_pos, n_neg, u2, auc)``.
    """
    from .rowid import assign_grouped_row_ids

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    s = F.col(score_col)
    y = F.col(label_col).cast("bigint")
    bad = s.isNull() | y.isNull() | ~y.isin(0, 1)
    checked_y = F.when(
        bad,
        F.raise_error(
            F.format_string(
                "grouped_auc: out-of-contract input (%s must be "
                "non-NULL, %s a non-NULL 0/1 label): score=%s label=%s",
                F.lit(score_col),
                F.lit(label_col),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.coalesce(y.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(y)
    vals = df.select(
        *group_cols, s.alias("__v"), checked_y.alias("__y")
    )
    ranked = assign_grouped_row_ids(
        vals,
        list(group_cols),
        "__v",
        id_col="__grk",  # 1-based within the group
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
        max_offset_entries=max_offset_entries,
    )
    per_score = ranked.groupBy(*group_cols, "__v").agg(
        F.sum("__y").alias("__npos"),
        F.min("__grk").alias("__rmin"),
        F.max("__grk").alias("__rmax"),
    )
    totals = per_score.groupBy(*group_cols).agg(
        F.sum(
            (F.col("__npos") * (F.col("__rmin") + F.col("__rmax"))).cast(
                "decimal(38,0)"
            )
        ).alias("__s2"),
        F.sum("__npos").alias("__np"),
        F.sum(F.col("__rmax") - F.col("__rmin") + 1).alias("__n"),
    )
    np_ = F.col("__np")
    nn = F.col("__n") - np_
    u2 = (F.col("__s2") - (np_ * (np_ + 1)).cast("decimal(38,0)")).cast(
        "decimal(38,0)"
    )
    defined = (np_ > 0) & (nn > 0)
    return totals.select(
        *group_cols,
        np_.cast("bigint").alias("n_pos"),
        nn.cast("bigint").alias("n_neg"),
        F.when(defined, u2.cast("bigint")).alias("u2"),
        F.when(
            defined,
            u2.cast("double")
            / (2.0 * np_.cast("double") * nn.cast("double")),
        ).alias("auc"),
    )
