"""Distributed contiguous row-id assignment without a global sort.

The 100 TB problem: training pipelines need stable, dense ids
(``0..N-1`` in a total order) for shard addressing, sample bookkeeping,
and join-back after shuffling — but the naive Spark spelling,
``row_number() OVER (ORDER BY key)``, plans an **empty-frame global
Window**: every row funnels through ONE partition on one executor. At
100 TB that stage never finishes.

This operator decomposes the global rank into
``rank(row) = offset(bucket) + local_rank(row within bucket)``:

1. **Bucket boundaries** (tiny job, column-pruned scan): sample-based
   quantile cut points over the order key, computed ONCE on the driver
   and embedded as a *literal* in both downstream plans — unlike
   ``repartitionByRange`` (whose RangePartitioner re-samples per job,
   so two passes over the same input may disagree), the bucket
   function is frozen, making the two-pass scheme deterministic.
2. **Bucket counts** (map-side-combined aggregate): ``COUNT(*)`` per
   bucket; the driver turns the ``O(buckets)`` rows into exclusive
   prefix-sum offsets, re-embedded as a literal map.
3. **Local rank**: one hash exchange on the bucket id + an in-bucket
   sort — ``row_number() OVER (PARTITION BY bucket ORDER BY key)``.
   Each Window partition holds ~``N/buckets`` rows, so the sort is
   distributed and spill-bounded; no single-partition stage anywhere.

Correctness does not depend on boundary *quality* — only determinism.
Skewed samples make buckets uneven (a throughput concern, surfaced by
choosing ``num_buckets`` ≳ cluster parallelism), never wrong ids,
because every key maps to exactly one bucket and buckets partition the
key space in order. Ties across the order columns would make ids
nondeterministic in ANY engine, so the caller must pass a total order
(e.g. a unique key last).

The two driver collects are ``O(num_buckets)`` scalars — parameters,
not data (the repo-wide collect() policy).

Reference scope: the reference delegates all execution to BigQuery and
has no id-assignment surface (feast_component/executor.py:128-163);
this operator is part of the Spark-native scale extension inventoried
in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def assign_global_row_ids(
    df: DataFrame,
    order_col: str,
    *,
    id_col: str = "row_id",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Add ``id_col`` = dense global rank of ``order_col`` (0-based).

    ``order_col`` must be a total order (unique values) for the ids to
    be deterministic, and numeric (the boundary sampler is
    ``percentile_approx``); note ids never depend on boundary values —
    only bucket sizes do — so approximate/sampled boundaries stay
    exact-correct. NULL keys rank first (Spark ``ASC NULLS FIRST``).
    ``num_buckets`` bounds the size of each distributed sort partition
    (~``N/num_buckets`` rows) and the driver-side state.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    dtype = dict(df.dtypes).get(order_col)
    if dtype is None:
        raise ValueError(f"order_col {order_col!r} not in {df.columns}")
    if dtype not in {"tinyint", "smallint", "int", "bigint", "float",
                     "double"} and not dtype.startswith("decimal"):
        raise ValueError(
            f"order_col must be numeric for the quantile sampler: "
            f"{order_col}:{dtype}"
        )
    if id_col in df.columns:
        raise ValueError(f"id_col {id_col!r} already present")
    key = F.col(order_col)

    # Pass 1 — frozen boundaries. percentile_approx on a sample keeps
    # this a cheap one-column scan; exactness is irrelevant (see module
    # docstring), determinism comes from embedding the result as a
    # literal. Nulls sort first (Spark ASC NULLS FIRST) and are routed
    # to bucket 0 explicitly since comparisons against NULL are unknown.
    probs = [i / num_buckets for i in range(1, num_buckets)]
    sampled = df.select(order_col).where(key.isNotNull())
    if sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=8)
    row = sampled.agg(
        F.percentile_approx(key, probs, 10_000).alias("bounds")
    ).collect()[0]
    bounds = [b for b in (row["bounds"] or []) if b is not None]

    if bounds:
        lit_bounds = F.array(*[F.lit(b) for b in bounds])
        bucket = F.when(key.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(lit_bounds, lambda b: b < key))
        )
    else:  # empty/constant input or num_buckets == 1
        bucket = F.lit(0)
    with_bucket = df.withColumn("__bucket", bucket)

    # Pass 2 — exclusive prefix-sum offsets, embedded as a literal map.
    counts = {
        r["__bucket"]: r["n"]
        for r in with_bucket.groupBy("__bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        lit_offsets = F.map_from_arrays(
            F.array(*[F.lit(b) for b in offsets]),
            F.array(*[F.lit(v).cast("long") for v in offsets.values()]),
        )
    else:
        lit_offsets = F.map_from_arrays(F.array().cast("array<int>"),
                                        F.array().cast("array<long>"))

    # Pass 3 — one hash exchange on __bucket + distributed in-bucket sort.
    w = Window.partitionBy("__bucket").orderBy(key.asc_nulls_first())
    return (
        with_bucket
        .withColumn(
            id_col,
            (F.element_at(lit_offsets, F.col("__bucket"))
             + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("__bucket")
    )


def assign_grouped_row_ids(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    *,
    id_col: str = "group_rank",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
    max_offset_entries: int = 65_536,
) -> DataFrame:
    """Per-GROUP dense 1-based rank of ``order_col`` without a
    per-group single-partition Window — the grouped edition of
    :func:`assign_global_row_ids`, for when one group holds an
    arbitrary share of the corpus (the naive ``row_number() OVER
    (PARTITION BY group ORDER BY key)`` funnels each whole group
    through ONE task; a 90%-of-100 TB source never finishes).

    Same three-pass decomposition: frozen GLOBAL quantile boundaries
    over the order key (boundary quality only affects balance, never
    correctness), one map-side-combined count per ``(group, bucket)``
    whose driver-side exclusive prefix sums (within each group, in
    bucket order) embed as a literal map, then one hash exchange on
    ``(group, bucket)`` + a distributed in-bucket sort. Driver state
    is ``O(groups x num_buckets)`` scalars, capped loud at
    ``max_offset_entries`` — this operator is for a BOUNDED set of
    groups (sources, shards, languages), not high-cardinality keys.

    ``order_col`` must be numeric and a total order within each group;
    NULL keys rank first. Output adds ``id_col`` (1-based — ranks, not
    the global edition's 0-based ids).
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    dtype = dict(df.dtypes).get(order_col)
    if dtype is None:
        raise ValueError(f"order_col {order_col!r} not in {df.columns}")
    if dtype not in {"tinyint", "smallint", "int", "bigint", "float",
                     "double"} and not dtype.startswith("decimal"):
        raise ValueError(
            f"order_col must be numeric for the quantile sampler: "
            f"{order_col}:{dtype}"
        )
    if id_col in df.columns:
        raise ValueError(f"id_col {id_col!r} already present")
    key = F.col(order_col)

    probs = [i / num_buckets for i in range(1, num_buckets)]
    sampled = df.select(order_col).where(key.isNotNull())
    if sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=8)
    row = sampled.agg(
        F.percentile_approx(key, probs, 10_000).alias("bounds")
    ).collect()[0]
    bounds = [b for b in (row["bounds"] or []) if b is not None]
    if bounds:
        lit_bounds = F.array(*[F.lit(b) for b in bounds])
        bucket = F.when(key.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(lit_bounds, lambda b: b < key))
        )
    else:
        bucket = F.lit(0)
    with_bucket = df.withColumn("__bucket", bucket)

    # group key as one string (groups are categorical by contract);
    # \x1f (unit separator) keeps composite keys collision-free for
    # any values not containing the separator themselves. NULL is
    # encoded DISTINCTLY per column (ADVICE r14: concat_ws silently
    # skips NULL parts, so a bare cast would collide NULL with the
    # empty string and ('a', NULL) with (NULL, 'a') — merging offset
    # cells the row_number window still keeps apart): every part is
    # non-null by construction — "\x00N" for NULL, "\x00V" + value
    # otherwise — so concat_ws drops nothing and the value prefix
    # keeps a literal "\x00N" string from impersonating NULL.
    gkey = F.concat_ws(
        "\x1f",
        *[
            F.when(F.col(c).isNull(), F.lit("\x00N")).otherwise(
                F.concat(F.lit("\x00V"), F.col(c).cast("string"))
            )
            for c in group_cols
        ],
    )
    counts_rows = (
        with_bucket.groupBy(gkey.alias("__g"), "__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if len(counts_rows) > max_offset_entries:
        raise ValueError(
            f"assign_grouped_row_ids: {len(counts_rows)} (group, bucket) "
            f"cells exceed max_offset_entries={max_offset_entries}; this "
            f"operator is for a bounded group set — reduce num_buckets or "
            f"use fewer groups"
        )
    per_group: dict[str, dict[int, int]] = {}
    for r in counts_rows:
        per_group.setdefault(r["__g"], {})[r["__bucket"]] = r["n"]
    okeys, ovals = [], []
    for g, bc in per_group.items():
        acc = 0
        for b in sorted(bc):
            okeys.append(f"{g}\x1f{b}")
            ovals.append(acc)
            acc += bc[b]
    if okeys:
        lit_offsets = F.map_from_arrays(
            F.array(*[F.lit(k) for k in okeys]),
            F.array(*[F.lit(v).cast("long") for v in ovals]),
        )
    else:
        lit_offsets = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<long>")
        )

    w = Window.partitionBy(*group_cols, "__bucket").orderBy(
        key.asc_nulls_first()
    )
    return (
        with_bucket.withColumn(
            id_col,
            (
                F.element_at(
                    lit_offsets,
                    F.concat(gkey, F.lit("\x1f"),
                             F.col("__bucket").cast("string")),
                )
                + F.row_number().over(w)
            ).cast("long"),
        )
        .drop("__bucket")
    )


def exact_ntile(
    df: DataFrame,
    order_col: str,
    n_tiles: int,
    *,
    tile_col: str = "ntile",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Exact SQL ``NTILE(n_tiles) OVER (ORDER BY order_col)`` without
    the single-partition global Window that spelling plans (the same
    100 TB cliff :func:`assign_global_row_ids` removes, and the same
    cure): the global 0-based rank comes from the bucket-decomposed
    machinery, then the standard NTILE arithmetic — with ``N = q *
    n_tiles + rem``, the first ``rem`` tiles take ``q + 1`` rows and
    the rest ``q`` — maps ranks to tiles as a pure codegen projection
    (integral ``div``, no float rounding at any N).

    ``order_col`` must be numeric. Ties make the RANK nondeterministic
    (as in any engine); callers either pass a total order (encode a
    composite tie-break into one numeric key) or — the common case for
    tile-level AGGREGATES — rely on tie-permutation invariance: tied
    rows carry equal order values, so swapping them across a tile
    boundary cannot change any aggregate of the order value itself.
    ``N`` costs one extra map-side-combinable COUNT job over ``df``
    (O(1) driver rows, never data).
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1: {n_tiles}")
    if tile_col in df.columns:
        raise ValueError(f"tile_col {tile_col!r} already present")
    ranked = assign_global_row_ids(
        df,
        order_col,
        id_col="__xnt_rid",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    n_total = df.count()
    q, rem = divmod(n_total, n_tiles)
    if q == 0:
        # fewer rows than tiles: SQL NTILE gives rank + 1
        tile = F.col("__xnt_rid") + 1
    else:
        head = rem * (q + 1)  # rows inside the (q + 1)-sized tiles
        tile = F.when(
            F.col("__xnt_rid") < head,
            F.expr(f"__xnt_rid div {q + 1}") + 1,
        ).otherwise(
            F.expr(f"(__xnt_rid - {head}) div {q}") + F.lit(rem) + 1
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("__xnt_rid")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    *,
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """EXACT type-1 quantiles (``v(q) = min { v : F(v) >= q }``, the
    inverse ECDF — no interpolation, engine-portable) of a numeric
    column WITHOUT a global sort: the complement of the approximate
    ``percentile_approx``/KLL path (`sketch_quantiles`) for when the
    report needs the true order statistic, not an epsilon-bound.

    Decomposition: the bucket-decomposed global rank
    (:func:`assign_global_row_ids`) makes value-at-rank addressable —
    the q-th quantile is the value at 0-based rank ``ceil(q * N) - 1``
    — so the plan FILTERS the ranked frame down to ``len(quantiles)``
    rows instead of sorting anything globally. Value-at-rank is
    deterministic even under ties: tied keys share one bucket and one
    value, so whichever tied row takes the rank carries the same
    value.

    NULL values are dropped (quantiles are over the observed sample).
    Returns one row per requested quantile: ``(q, value)``. Driver
    state: the ``O(num_buckets)`` scalars the rank machinery already
    holds, plus one COUNT.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1]: {q}")
    vals = df.select(F.col(value_col).alias("__v")).where(
        F.col(value_col).isNotNull()
    )
    ranked = assign_global_row_ids(
        vals,
        "__v",
        id_col="__xq_rid",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    n_total = vals.count()
    if n_total == 0:
        raise ValueError(f"exact_quantiles: no non-null {value_col!r} rows")
    # 0-based target rank per quantile; math.ceil on exact integers
    # only (q * N can hit an integer exactly — ceil is the contract)
    import math

    targets = {}
    for q in quantiles:
        r = math.ceil(q * n_total) - 1
        targets.setdefault(r, []).append(float(q))
    hit = ranked.where(
        F.col("__xq_rid").isin(*[int(r) for r in targets])
    )
    # one rank can serve several quantiles: explode the q list per rank
    qlists = F.map_from_arrays(
        F.array(*[F.lit(int(r)) for r in targets]),
        F.array(*[
            F.array(*[F.lit(q) for q in qs]) for qs in targets.values()
        ]),
    )
    return (
        hit.select(
            F.explode(F.element_at(qlists, F.col("__xq_rid"))).alias("q"),
            F.col("__v").alias("value"),
        )
        .orderBy("q")
    )


def grouped_exact_ntile(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n_tiles: int,
    *,
    tile_col: str = "ntile",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
    max_offset_entries: int = 65_536,
) -> DataFrame:
    """Exact per-group ``NTILE(n_tiles) OVER (PARTITION BY group ORDER
    BY order_col)`` without a per-group single-partition Window — the
    grouped edition of :func:`exact_ntile`, for when one group holds an
    arbitrary share of the corpus (per-source/per-language
    equal-population buckets feeding stratified curricula).

    The per-group 1-based rank comes from
    :func:`assign_grouped_row_ids` (same bounded-group-set contract:
    sources, shards, languages — capped LOUD at
    ``max_offset_entries``), the per-group row count attaches as a
    map-side-combinable broadcast aggregate, and the standard NTILE
    arithmetic — the first ``N % n`` tiles take one extra row — runs
    as a pure projection with in-plan integral ``div`` (no float
    rounding at any N, and per-group counts ride the plan, never the
    driver). Tie caveat as :func:`exact_ntile`: tied order values make
    the rank nondeterministic; tile-level aggregates of the order
    value itself are tie-permutation invariant.
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1: {n_tiles}")
    if tile_col in df.columns:
        raise ValueError(f"tile_col {tile_col!r} already present")
    ranked = assign_grouped_row_ids(
        df,
        group_cols,
        order_col,
        id_col="__xgt_rank",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
        max_offset_entries=max_offset_entries,
    )
    # per-group sizes, null-safe keyed (NULL is a group, same as the
    # rank machinery and SQL NTILE's PARTITION BY)
    counts = df.groupBy(
        *[F.col(c).alias(f"__xgt_g{i}") for i, c in enumerate(group_cols)]
    ).agg(F.count(F.lit(1)).alias("__xgt_n"))
    join_cond = None
    for i, c in enumerate(group_cols):
        term = F.col(c).eqNullSafe(F.col(f"__xgt_g{i}"))
        join_cond = term if join_cond is None else (join_cond & term)
    rid0 = F.col("__xgt_rank") - 1  # 0-based within the group
    q = F.expr(f"__xgt_n div {n_tiles}")
    rem = F.col("__xgt_n") % n_tiles
    head = rem * (q + 1)
    tile = F.when(q == 0, rid0 + 1).otherwise(
        F.when(
            rid0 < head,
            F.expr(f"(__xgt_rank - 1) div ((__xgt_n div {n_tiles}) + 1)")
            + 1,
        ).otherwise(
            rem
            + F.expr(
                f"(__xgt_rank - 1 - (__xgt_n % {n_tiles})"
                f" * ((__xgt_n div {n_tiles}) + 1))"
                f" div (__xgt_n div {n_tiles})"
            )
            + 1
        )
    )
    return (
        ranked.join(F.broadcast(counts), join_cond)
        .withColumn(tile_col, tile.cast("int"))
        .drop(
            "__xgt_rank",
            "__xgt_n",
            *[f"__xgt_g{i}" for i in range(len(group_cols))],
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_col: str,
    *,
    window: int = 3,
    id_col: str = "row_id",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995) — the
    classic entity-resolution candidate generator: order records by a
    blocking key and emit every pair within a sliding ``window``, so a
    downstream matcher (edit distance, field compare) only scores
    near-neighbors instead of the quadratic cross join.

    The textbook spelling sorts the whole relation (a single-partition
    ``row_number`` Window). Here the global rank comes from
    :func:`assign_global_row_ids`, and the within-``window`` pairing
    becomes a BANDED self-equi-join: with ``block = rank div
    (window - 1)``, any pair at rank distance ``<= window - 1`` sits
    in the same block or adjacent blocks, so the right side is
    duplicated onto keys ``(block, block + 1)`` (one ``explode`` of a
    2-array) and the join is a plain hash equi-join on the block id —
    one shuffle per side, no range join, no single-partition stage.
    The rank-distance filter then trims the superset exactly.

    ``order_col`` must be numeric with a TOTAL order (compose a
    tie-break into the key — the same contract as every rank-machinery
    caller); ``window >= 2``. Output: one row per candidate pair,
    ``(<id>_a, <id>_b, rank_a, rank_b)`` with ``rank_a < rank_b``,
    where ``<id>`` columns are every non-key column of ``df`` suffixed
    ``_a`` / ``_b``. Pair count is exactly
    ``sum over i of min(window - 1, n - 1 - rank_i)`` — linear in the
    corpus for fixed ``window``, never quadratic.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2: {window}")
    span = window - 1
    ranked = assign_global_row_ids(
        df,
        order_col,
        id_col="__snm_rank",
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
    )
    block = F.expr(f"__snm_rank div {span}")
    payload = [c for c in df.columns]
    left = ranked.select(
        *[F.col(c).alias(f"{c}_a") for c in payload],
        F.col("__snm_rank").alias("rank_a"),
        block.alias("__blk"),
    )
    right = ranked.select(
        *[F.col(c).alias(f"{c}_b") for c in payload],
        F.col("__snm_rank").alias("rank_b"),
        F.explode(F.array(block, block - 1)).alias("__blk"),
    )
    return (
        left.join(right, "__blk")
        .where(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= span)
        )
        .drop("__blk")
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "cum",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Distributed running total — exact ``SUM(value) OVER (ORDER BY
    order_col ROWS UNBOUNDED PRECEDING)`` with NO single-partition
    global Window: the SUM sibling of :func:`assign_global_row_ids`,
    and the primitive behind every "cumulative X by rank" report
    (running revenue, Lorenz/concentration curves, ECDFs, budget
    prefixes) that otherwise funnels 100 TB through one task.

    Same two-pass decomposition: frozen sample-quantile bucket
    boundaries embedded as literals, per-bucket ``SUM(value)``
    aggregated map-side (``O(buckets)`` driver scalars), exclusive
    prefix-sum offsets re-embedded as a literal map, then ONE hash
    exchange on the bucket id + a bucket-local cumulative Window —
    each partition sums ~``N/num_buckets`` rows, nothing global
    anywhere. Boundary quality affects only balance, never values.

    ``order_col`` must be numeric and a TOTAL order (ties would make
    the intermediate running sum nondeterministic in ANY engine —
    compose a tie-break into the key, as every rank-machinery caller
    does); ``value_col`` must be integer-typed — integer running sums
    are order-free and engine-exact, which is what makes the oracle
    contract equality rather than tolerance (fixed-point encode
    doubles first, the repo-wide idiom). NULL values raise LOUD
    in-plan (a NULL silently poisons every suffix after it).
    """
    dtypes = dict(df.dtypes)
    vt = dtypes.get(value_col)
    if vt is None:
        raise ValueError(f"value_col {value_col!r} not in {df.columns}")
    if vt not in {"tinyint", "smallint", "int", "bigint"}:
        raise ValueError(
            f"value_col must be integer-typed for an exact running sum "
            f"(fixed-point encode first): {value_col}:{vt}"
        )
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already present")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    ot = dtypes.get(order_col)
    if ot is None:
        raise ValueError(f"order_col {order_col!r} not in {df.columns}")
    if ot not in {"tinyint", "smallint", "int", "bigint", "float",
                  "double"} and not ot.startswith("decimal"):
        raise ValueError(
            f"order_col must be numeric for the quantile sampler: "
            f"{order_col}:{ot}"
        )
    key = F.col(order_col)
    val = F.when(
        F.col(value_col).isNull(),
        F.raise_error(
            F.format_string(
                "prefix_sum: NULL %s (a NULL poisons every running "
                "total after it) at %s=%s",
                F.lit(value_col),
                F.lit(order_col),
                F.coalesce(key.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.col(value_col).cast("long"))

    probs = [i / num_buckets for i in range(1, num_buckets)]
    sampled = df.select(order_col).where(key.isNotNull())
    if sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=8)
    row = sampled.agg(
        F.percentile_approx(key, probs, 10_000).alias("bounds")
    ).collect()[0]
    bounds = [b for b in (row["bounds"] or []) if b is not None]
    if bounds:
        lit_bounds = F.array(*[F.lit(b) for b in bounds])
        bucket = F.when(key.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(lit_bounds, lambda b: b < key))
        )
    else:
        bucket = F.lit(0)
    with_bucket = df.withColumn("__psv", val).withColumn("__bucket", bucket)

    sums = {
        r["__bucket"]: r["s"]
        for r in with_bucket.groupBy("__bucket").agg(
            F.sum("__psv").alias("s")
        ).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    if offsets:
        lit_offsets = F.map_from_arrays(
            F.array(*[F.lit(b) for b in offsets]),
            F.array(*[F.lit(int(v)).cast("long") for v in offsets.values()]),
        )
    else:
        lit_offsets = F.map_from_arrays(F.array().cast("array<int>"),
                                        F.array().cast("array<long>"))

    w = (
        Window.partitionBy("__bucket")
        .orderBy(key.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_bucket
        .withColumn(
            out_col,
            (F.element_at(lit_offsets, F.col("__bucket"))
             + F.sum("__psv").over(w)).cast("long"),
        )
        .drop("__bucket", "__psv")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    *,
    out_col: str = "cum",
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
    max_offset_entries: int = 65_536,
) -> DataFrame:
    """Per-GROUP exact running total — ``SUM(value) OVER (PARTITION BY
    group ORDER BY order_col ROWS UNBOUNDED PRECEDING)`` without the
    per-group single-partition Window: the grouped edition of
    :func:`prefix_sum` for when one group holds an arbitrary share of
    the corpus (per-source token budgets, per-language running
    quotas — a 90%-of-100 TB source would funnel through one task in
    the naive spelling).

    Same decomposition as :func:`assign_grouped_row_ids` with SUM in
    place of COUNT: frozen GLOBAL boundaries over the order key, one
    map-side-combined ``SUM(value)`` per ``(group, bucket)`` whose
    driver-side exclusive prefix sums (within each group, bucket
    order) embed as a literal map — capped LOUD at
    ``max_offset_entries`` (bounded group set, not high-cardinality
    keys) — then ONE hash exchange on ``(group, bucket)`` + a
    bucket-local cumulative Window. NULL group values are first-class
    (the same collision-free ``\\x00N``/``\\x00V`` key encoding).

    Contracts as :func:`prefix_sum`: integer ``value_col`` (exact,
    order-free — fixed-point encode first) with a LOUD in-plan NULL
    guard; numeric total-order ``order_col`` per group.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    dtypes = dict(df.dtypes)
    vt = dtypes.get(value_col)
    if vt is None:
        raise ValueError(f"value_col {value_col!r} not in {df.columns}")
    if vt not in {"tinyint", "smallint", "int", "bigint"}:
        raise ValueError(
            f"value_col must be integer-typed for an exact running sum "
            f"(fixed-point encode first): {value_col}:{vt}"
        )
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already present")
    ot = dtypes.get(order_col)
    if ot is None:
        raise ValueError(f"order_col {order_col!r} not in {df.columns}")
    if ot not in {"tinyint", "smallint", "int", "bigint", "float",
                  "double"} and not ot.startswith("decimal"):
        raise ValueError(
            f"order_col must be numeric for the quantile sampler: "
            f"{order_col}:{ot}"
        )
    key = F.col(order_col)
    val = F.when(
        F.col(value_col).isNull(),
        F.raise_error(
            F.format_string(
                "grouped_prefix_sum: NULL %s (a NULL poisons every "
                "running total after it) at %s=%s",
                F.lit(value_col),
                F.lit(order_col),
                F.coalesce(key.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.col(value_col).cast("long"))

    probs = [i / num_buckets for i in range(1, num_buckets)]
    sampled = df.select(order_col).where(key.isNotNull())
    if sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=8)
    row = sampled.agg(
        F.percentile_approx(key, probs, 10_000).alias("bounds")
    ).collect()[0]
    bounds = [b for b in (row["bounds"] or []) if b is not None]
    if bounds:
        lit_bounds = F.array(*[F.lit(b) for b in bounds])
        bucket = F.when(key.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(lit_bounds, lambda b: b < key))
        )
    else:
        bucket = F.lit(0)
    with_bucket = df.withColumn("__psv", val).withColumn("__bucket", bucket)

    gkey = F.concat_ws(
        "\x1f",
        *[
            F.when(F.col(c).isNull(), F.lit("\x00N")).otherwise(
                F.concat(F.lit("\x00V"), F.col(c).cast("string"))
            )
            for c in group_cols
        ],
    )
    sums_rows = (
        with_bucket.groupBy(gkey.alias("__g"), "__bucket")
        .agg(F.sum("__psv").alias("s"))
        .collect()
    )
    if len(sums_rows) > max_offset_entries:
        raise ValueError(
            f"grouped_prefix_sum: {len(sums_rows)} (group, bucket) cells "
            f"exceed max_offset_entries={max_offset_entries}; this "
            f"operator is for a bounded group set — reduce num_buckets "
            f"or use fewer groups"
        )
    per_group: dict[str, dict[int, int]] = {}
    for r in sums_rows:
        per_group.setdefault(r["__g"], {})[r["__bucket"]] = r["s"]
    okeys, ovals = [], []
    for g, bs in per_group.items():
        acc = 0
        for b in sorted(bs):
            okeys.append(f"{g}\x1f{b}")
            ovals.append(acc)
            acc += bs[b]
    if okeys:
        lit_offsets = F.map_from_arrays(
            F.array(*[F.lit(k) for k in okeys]),
            F.array(*[F.lit(int(v)).cast("long") for v in ovals]),
        )
    else:
        lit_offsets = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<long>")
        )

    w = (
        Window.partitionBy(*group_cols, "__bucket")
        .orderBy(key.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_bucket.withColumn(
            out_col,
            (
                F.element_at(
                    lit_offsets,
                    F.concat(gkey, F.lit("\x1f"),
                             F.col("__bucket").cast("string")),
                )
                + F.sum("__psv").over(w)
            ).cast("long"),
        )
        .drop("__bucket", "__psv")
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    *,
    num_buckets: int = DEFAULT_BUCKETS,
    sample_fraction: float = 0.1,
    max_offset_entries: int = 65_536,
) -> DataFrame:
    """Per-GROUP exact type-1 quantiles (``min { v : F_g(v) >= q }``)
    — the grouped edition of :func:`exact_quantiles`, completing the
    rank-machinery family (ids / ntile / quantiles / prefix-sum, each
    global + grouped): per-language length medians, per-source score
    quartiles, with NO per-group sort and no per-group single-partition
    Window even when one group holds the corpus.

    The per-group rank comes from :func:`assign_grouped_row_ids`
    (bounded group set, capped LOUD); the per-group count attaches as
    a null-safe broadcast aggregate join (the
    :func:`grouped_exact_ntile` pattern); and the q-th quantile is the
    value at 1-based rank ``ceil(q * n_g)`` — computed IN-PLAN per
    group with the quantiles as one exploded literal array, so driver
    state stays ``O(groups x buckets)`` scalars regardless of how many
    groups exist. Both engines evaluate ``ceil`` on the SAME double
    product (the oracle casts ``q`` to DOUBLE), so binary-vs-decimal
    literal drift cannot split the rank at an exact-integer boundary.
    Value-at-rank is tie-deterministic (tied keys share one bucket and
    one value). NULL values are dropped; NULL GROUPS are first-class.

    Output: one row per (group, quantile): ``(group_cols..., q,
    value)``.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1]: {q}")
    vals = df.select(
        *group_cols, F.col(value_col).alias("__v")
    ).where(F.col(value_col).isNotNull())
    ranked = assign_grouped_row_ids(
        vals,
        list(group_cols),
        "__v",
        id_col="__gqr",  # 1-based rank within the group
        num_buckets=num_buckets,
        sample_fraction=sample_fraction,
        max_offset_entries=max_offset_entries,
    )
    counts = vals.groupBy(
        *[F.col(c).alias(f"__gqg{i}") for i, c in enumerate(group_cols)]
    ).agg(F.count(F.lit(1)).alias("__gqn"))
    join_cond = None
    for i, c in enumerate(group_cols):
        term = F.col(c).eqNullSafe(F.col(f"__gqg{i}"))
        join_cond = term if join_cond is None else (join_cond & term)
    qarr = F.array(*[F.lit(float(q)).cast("double") for q in quantiles])
    # evaluate the tiny literal array per row and keep only the
    # quantiles this row's rank serves — the corpus is FILTERED before
    # the explode, so no |quantiles|-fold row amplification anywhere
    qs_here = F.filter(
        qarr,
        lambda q: F.ceil(q * F.col("__gqn")).cast("long")
        == F.col("__gqr"),
    )
    hit = (
        ranked.join(F.broadcast(counts), join_cond)
        .withColumn("__qs", qs_here)
        .where(F.size("__qs") > 0)
        .select(*group_cols, F.col("__v"), F.explode("__qs").alias("q"))
    )
    return hit.select(*group_cols, "q", F.col("__v").alias("value"))
