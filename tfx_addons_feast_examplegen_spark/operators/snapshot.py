"""Snapshot diffing: change-data detection between feature-table versions.

Feature-store lifecycle extension. A standing materialization pipeline
needs to know, between yesterday's and today's snapshot of a feature
table, which entities were ADDED, which CHANGED, which are UNCHANGED
(and optionally which were REMOVED) — both to ship incremental updates
to an online store (write only added+changed keys, not the full 100 TB
snapshot) and to monitor feature drift.

One full-outer equi-join on the entity keys, comparing the tracked
columns null-safely; at scale both snapshots are large, so the join
shuffles both sides on the keys — co-locate by bucketing both snapshot
writes on the keys (``sources/bucketing.py``) to make the diff
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    *,
    change_col: str = "change_type",
) -> DataFrame:
    """Full-outer diff of two snapshot versions keyed by ``key_cols``.

    Output: key columns, each compare column as ``old_<c>`` / ``new_<c>``,
    plus ``change_type`` in {'added', 'removed', 'changed', 'unchanged'}.
    Comparison is null-safe (``eqNullSafe``): a feature flipping to/from
    NULL counts as changed, NULL==NULL does not.
    """
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.withColumn(change_col, change).drop("__in_old", "__in_new")


def incremental_upsert_set(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """The rows an online-store sync actually ships: the NEW version of
    every added or changed key (removed keys are a deletion feed, not an
    upsert). Project of :func:`snapshot_diff` — Catalyst prunes the old
    columns from the scan."""
    d = snapshot_diff(old, new, key_cols, compare_cols)
    return d.filter(F.col("change_type").isin("added", "changed")).select(
        *key_cols,
        *[F.col(f"new_{c}").alias(c) for c in compare_cols],
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    *,
    seq_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a CDC batch to a base table — the MERGE INTO of a lakehouse
    sync, as two shuffle-friendly relational steps: keys present in the
    batch leave the base (left-anti join), then the batch's surviving
    rows union in. Updates therefore win on key collision; with
    ``delete_col`` set, rows whose flag is true act as tombstones
    (removed, not re-inserted); with ``seq_col`` set, only the
    newest-per-key batch row applies (late/duplicated CDC events
    collapse deterministically — ties break on the full sort of
    ``seq_col`` descending then key order, so pass a unique sequence).
    Without ``seq_col`` a batch carrying key collisions is still
    collapsed to one row per key via a deterministic all-column
    tie-break — the output always upholds the one-row-per-key MERGE
    invariant.

    Both steps shuffle on the merge keys; bucket the base table on the
    keys (``sources/bucketing.py``) and the anti-join co-locates with
    zero base-side exchange — the standing-sync layout at 100 TB.
    """
    from pyspark.sql import Window

    up = updates
    if seq_col is not None:
        order = [F.desc(seq_col)]
    else:
        # No sequence column: a batch with key collisions must still
        # produce ONE row per key (the MERGE invariant), so fall back to
        # a deterministic tie-break over the non-key columns sorted by
        # name — arbitrary but stable across runs and partitionings.
        # Unorderable types (maps, and arrays/structs containing them)
        # are excluded: ordering by one would raise AnalysisException
        # even for a collision-free batch. If NO orderable payload
        # column exists, colliding rows are indistinguishable to a sort
        # anyway — the pick is then arbitrary-but-single, documented.
        def _orderable(dt) -> bool:
            from pyspark.sql.types import ArrayType, MapType, StructType

            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        order = [
            F.desc(f.name)
            for f in sorted(up.schema.fields, key=lambda f: f.name)
            if f.name not in key_cols and _orderable(f.dataType)
        ] or [F.lit(1).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    up = (
        up.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(
        up.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    if delete_col is not None:
        up = up.filter(~F.col(delete_col)).drop(delete_col)
    if seq_col is not None and seq_col not in base.columns:
        up = up.drop(seq_col)  # ordering-only column, not payload
    return survivors.unionByName(up)
