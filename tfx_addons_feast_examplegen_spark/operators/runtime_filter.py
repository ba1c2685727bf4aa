"""Portable Bloom-filter runtime join reduction.

The 100 TB join problem this solves: a selective dimension predicate
(build side) should prune the fact-table scan (probe side) BEFORE the
join shuffle, but the key set is too large to broadcast as an IN-list
and Spark's own runtime filters (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) only fire on plans the optimizer recognizes. This
module makes the pattern explicit and portable: build a dense Bloom
bitmap (array<long>, `n_bits` total) from the build side with nothing
but built-in JVM expressions — `xxhash64` seeded by hash index, bit_or
word aggregation — then attach the ONE-ROW bitmap to the probe side via
a broadcast and filter with pure expression arithmetic. No Python UDF,
no driver-side key set, no shuffle added: the probe side keeps its scan
partitioning and drops rows map-side, shrinking the downstream join
exchange by the filter's selectivity.

Guarantees: no false negatives (every build key passes), bounded false
positives (classic (1-e^{-kn/m})^k; FPs are re-checked by the exact
join that follows, so end results are exact). The bitmap costs
`n_bits/8` bytes on the wire regardless of build-side row count — the
whole point versus broadcasting the keys themselves.

Reference scope: the reference delegates joins to BigQuery and carries
no runtime-filter surface (feast_component/executor.py:128-163); this
operator is part of the Spark-native scale extension inventoried in
SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 18
DEFAULT_HASHES = 5


def _check_params(n_bits: int, n_hashes: int) -> None:
    if n_bits <= 0 or n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a positive multiple of 64: {n_bits}")
    if not 1 <= n_hashes <= 16:
        raise ValueError(f"n_hashes out of range [1,16]: {n_hashes}")


def build_bloom_bitmap(
    build: DataFrame,
    key: str,
    *,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """One-row DataFrame ``(__bloom: array<bigint>)`` covering ``build[key]``.

    Per key, ``n_hashes`` positions ``pmod(xxhash64(key, i), n_bits)``
    (hash-index seeding keeps the hashes independent without a second
    hash family). Set bits aggregate map-side via ``bit_or`` grouped by
    64-bit word, then densify to a fixed-length array so the probe can
    index it O(1). Null keys set no bits — a Bloom prefilter is a
    semi-join surrogate and SQL semi-joins never match NULL.
    """
    _check_params(n_bits, n_hashes)
    n_words = n_bits // 64
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(F.xxhash64(F.col(key), i), F.lit(n_bits)),
        )
    ).alias("pos")
    words = (
        build.where(F.col(key).isNotNull())
        .select(pos)
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("__m"), w.cast("long")),
                F.lit(0).cast("long"),
            ),
        ).alias("__bloom")
    )


def bloom_prefilter(
    probe: DataFrame,
    key: str,
    bloom: DataFrame,
    *,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key`` might be in the bitmap.

    The one-row bitmap is attached with an explicit broadcast (plans as
    BroadcastNestedLoopJoin over a single row — a constant attachment,
    not a data-sized cross product) and membership is tested with
    expression-only arithmetic, so the filter runs inside codegen on
    the scan partitioning. ``n_bits``/``n_hashes`` MUST match the build
    call or membership tests read the wrong bits.
    """
    _check_params(n_bits, n_hashes)
    conds = []
    for i in range(n_hashes):
        p = f"pmod(xxhash64({key}, {i}), CAST({n_bits} AS BIGINT))"
        conds.append(
            "(shiftright(get(__bloom, CAST(({p}) div 64 AS INT)),"
            " CAST(({p}) % 64 AS INT)) & 1L) = 1L".format(p=p)
        )
    attached = probe.join(F.broadcast(bloom))
    return attached.where(F.expr(" AND ".join(conds))).drop("__bloom")
