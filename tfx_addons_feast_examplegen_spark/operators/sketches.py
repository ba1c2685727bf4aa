"""Count-Min frequency sketch — the third leg of the mergeable-sketch
family (HLL = cardinality, KLL/GK = quantiles, CMS = per-key frequency).

The 100 TB problem: per-key counts over a high-cardinality key (URLs,
n-grams, user ids) cost an exact shuffle proportional to the number of
DISTINCT keys. A Count-Min sketch (Cormode & Muthukrishnan, 2005 —
public paper) is a ``depth × width`` counter grid: each key increments
one counter per row (row-seeded hash), a point estimate is the MIN of
its ``depth`` counters. Properties: never underestimates; overshoot is
bounded by ``e·N/width`` with probability ``1 − e^(−depth)``; and the
grid is MERGEABLE — sketches built per shard/day add cell-wise, so the
raw data is touched once and never re-shuffled.

Spark shape:
- build is an ``explode(depth)`` + one map-side-combinable ``count``
  aggregate grouped on ``(row, bucket)`` — the shuffle carries at most
  ``depth × width`` partial rows per mapper regardless of input size,
  and the finished sketch is at most ``depth × width`` rows total;
- estimates join query keys against the sketch on ``(row, bucket)``
  (a broadcast join — the sketch is parameter-sized) and take
  ``min`` over rows; an absent cell is a zero count, not a miss.

The row hashes are the repo's SQL-portable fingerprint family
(``abs((key·K_j) % 2³¹) % width`` with distinct odd multipliers K_j —
`operators/split.py:88` precedent), so an external engine can replay
the ENTIRE sketch arithmetic exactly: the oracle for this operator is
a full replay, not just an error-bound contract like the HLL/quantile
entries. Integral keys only (the multiply must stay exact in 64-bit).

Reference scope: the reference delegates all execution to BigQuery and
has no sketch surface (feast_component/executor.py:128-163); this
operator is part of the Spark-native scale extension inventoried in
SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import require_integral_key

# Distinct odd multipliers (Knuth / xxhash / Murmur-family constants);
# depth is capped by the family size.
CMS_MULTIPLIERS = (2654435761, 2246822519, 3266489917, 668265263)
_M = 2**31


def _check(width: int, depth: int) -> None:
    if width < 1:
        raise ValueError(f"width must be >= 1: {width}")
    if not 1 <= depth <= len(CMS_MULTIPLIERS):
        raise ValueError(
            f"depth out of range [1, {len(CMS_MULTIPLIERS)}]: {depth}"
        )


def _bucket(key, j: int, width: int):
    return F.pmod(
        F.pmod(key.cast("long") * F.lit(CMS_MULTIPLIERS[j]), F.lit(_M)),
        F.lit(width),
    )


def countmin_build(
    df: DataFrame, key_col: str, *, width: int, depth: int = 4
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — at most depth×width
    rows; cells no occurrence hashed into are simply absent (= 0)."""
    _check(width, depth)
    require_integral_key(df, key_col, "countmin_build")
    key = F.col(key_col)
    cells = F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("row"), _bucket(key, j, width).alias("bucket")
            )
            for j in range(depth)
        ])
    ).alias("c")
    return (
        df.where(key.isNotNull())
        .select(cells)
        .groupBy("c.row", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int,
    depth: int = 4,
    est_col: str = "cm_est",
) -> DataFrame:
    """Point estimates for ``keys[key_col]``: min over the key's depth
    cells. ``width``/``depth`` MUST match the build call. The sketch
    side is broadcast (it is parameter-sized by construction)."""
    _check(width, depth)
    require_integral_key(keys, key_col, "countmin_estimate")
    key = F.col(key_col)
    probes = keys.select(
        key,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(key, j, width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("c"),
    ).select(key_col, "c.row", "c.bucket")
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(est_col)
    )


def minhash_corpus_sketch(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    k: int = 256,
    shingle_n: int = 3,
) -> DataFrame:
    """One-permutation MinHash sketch per corpus: ``(group, bucket,
    min_h)`` — at most ``k`` rows per group.

    The 100 TB problem this solves: "how much do corpus A and corpus B
    overlap?" asked exactly (a shingle join) costs a shuffle of both
    corpora's full shingle streams. The one-permutation MinHash (Li,
    Owen, Zhang 2012 — public paper) answers it from two k-row
    sketches: hash every shingle once, route it to bucket ``h % k``,
    keep the MIN hash per bucket. For a bucket filled on both sides,
    ``P(min_a == min_b) = J(A, B)`` — each bucket is an independent
    min-wise sample of the union restricted to that hash residue.

    Scale shape: one shingle explode (NO distinct — min over a
    multiset equals min over its set, so duplicate shingles never
    shuffle) + one map-side-combinable ``min`` aggregate; the shuffle
    carries at most ``k`` partial rows per group per mapper no matter
    the corpus size, and sketches MERGE by cell-wise min (per-shard /
    per-day builds compose without touching raw data again).

    The shingle hash is the repo's portable 60-bit md5 fingerprint
    (`operators/dedup.py:1041` precedent), so an external SQL engine
    replays the ENTIRE sketch — the oracle for this operator is a full
    arithmetic replay, not an error-bound contract.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if shingle_n < 1:
        raise ValueError(f"shingle_n must be >= 1: {shingle_n}")
    from .dedup import _grams_expr

    h = F.expr("CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT)")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(group_col),
            F.explode(_grams_expr(text_col, shingle_n)).alias("shingle"),
        )
        .select(F.col(group_col), h.alias("__h"))
        .groupBy(group_col, F.pmod(F.col("__h"), F.lit(k)).alias("bucket"))
        .agg(F.min("__h").alias("min_h"))
    )


def minhash_corpus_overlap(
    sketch: DataFrame, group_col: str, *, round_to: int = 4
) -> DataFrame:
    """Pairwise corpus-overlap estimates from a
    :func:`minhash_corpus_sketch` frame.

    Output per unordered group pair (``group_a < group_b``):
    ``filled_a`` / ``filled_b`` (non-empty buckets per side),
    ``both_filled``, ``matched`` (co-filled buckets whose minima
    agree), and ``jaccard_e4 = round(matched / both_filled,
    round_to)`` — the one-permutation estimator restricted to
    co-filled buckets. A group pair with ZERO co-filled buckets is
    absent from the output (there is nothing to estimate from — only
    possible when k exceeds a corpus's distinct-shingle count, i.e.
    outside the operating regime below). Every input here is
    sketch-sized: the joins are broadcast by construction, nothing
    rescans a corpus.

    Operating regime: choose ``k`` well BELOW the distinct-shingle
    count of the smaller corpus. When sets are k-sized, conditioning
    on "both filled" biases the estimate UP — a bucket is likelier to
    be co-filled when one shared element fills both sides at once
    (measured: ~+0.13 absolute at |A∪B| ≈ 2.3·k; < 0.03 at
    |A∪B| ≈ 16·k with k=256). Real corpora are always in the second
    regime; shrink k, not the corpus, if in doubt.
    """
    # The sketch frame is consumed three times (both join sides + the
    # filled counts); left lazy, each consumer would re-run the corpus
    # scan + shingle explode. _pin is dedup's FIFO-bounded cache()
    # (lazy — materialized at the first action, plan-matched for
    # cross-invocation reuse, unpersisted on FIFO overflow); the frame
    # is ≤ k rows per group by construction, so the corpus is read
    # exactly once per materialization.
    from .dedup import _pin

    sketch = _pin(sketch)
    g = group_col
    a = sketch.select(
        F.col(g).alias("group_a"), "bucket", F.col("min_h").alias("__ma")
    )
    b = sketch.select(
        F.col(g).alias("group_b"), "bucket", F.col("min_h").alias("__mb")
    )
    filled = sketch.groupBy(g).agg(F.count(F.lit(1)).alias("__filled"))
    pair = (
        a.join(b, "bucket")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("both_filled"),
            F.sum(
                (F.col("__ma") == F.col("__mb")).cast("long")
            ).alias("matched"),
        )
    )
    fa = F.broadcast(
        filled.select(F.col(g).alias("group_a"), F.col("__filled").alias("filled_a"))
    )
    fb = F.broadcast(
        filled.select(F.col(g).alias("group_b"), F.col("__filled").alias("filled_b"))
    )
    return (
        pair.join(fa, "group_a")
        .join(fb, "group_b")
        .select(
            "group_a",
            "group_b",
            "filled_a",
            "filled_b",
            "both_filled",
            "matched",
            F.round(
                F.col("matched") / F.col("both_filled"), round_to
            ).alias("jaccard_e4"),
        )
    )


def countmin_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    depth: int = 4,
    est_col: str = "cm_join_est",
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min grids — the
    classic CMS inner product (Cormode & Muthukrishnan §4.2): for each
    row ``j``, ``sum_b cntA[j][b] * cntB[j][b]`` over-counts the true
    ``sum_k fA(k) * fB(k)`` by exactly the collision cross-terms, so
    the row-wise MIN never underestimates the join size and tightens
    with depth. This is what a planner needs to choose broadcast vs
    shuffle WITHOUT touching either input: both grids are
    parameter-sized, the estimate is a join of two tiny frames.

    Both sketches MUST be built with the same ``width``/``depth``.
    Returns one row ``(est_col,)``; an empty overlap estimates 0 (a
    matching key occupies the same bucket on both sides in EVERY row,
    so zero overlap in any row proves an empty join).
    """
    _check(64, depth)  # width only matters for build; validate depth
    a = sketch_a.select("row", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("row", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"))
    )
    # a row with zero overlapping cells is ABSENT from per_row, and a
    # nonempty join overlaps in every row — so fewer than depth rows
    # present proves the join empty and the estimate is exactly 0.
    return per_row.agg(
        F.when(F.count(F.lit(1)) == depth, F.min("__dot"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias(est_col)
    )
