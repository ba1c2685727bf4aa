"""Incremental view maintenance: join deltas.

The registry's ``ivm_delta_agg`` entry maintains an AGGREGATE view by
associative merge; this module covers the other classic IVM case — a
JOIN view absorbing insert batches without recomputing the base join.

Reference parity: the reference (BACtaki/tfx-addons-feast-examplegen)
delegates all query execution to its warehouse and has no incremental
surface; this is a north-star extension for the pipeline-refresh side
of a 100 TB deployment, where "recompute A ⋈ B nightly" is the cost
center IVM exists to delete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["delta_join"]


def delta_join(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Insert-delta of an inner-join view (classic IVM delta algebra).

    For insert-only batches dA, dB the new join rows are exactly

        d(A ⋈ B) = dA ⋈ (B ∪ dB)  ∪  A ⋈ dB

    — the textbook three-term expansion dA⋈B ∪ A⋈dB ∪ dA⋈dB folded to
    two joins (dA⋈dB rides inside the first term). Appending the result
    to the maintained view gives bag-exact (A∪dA) ⋈ (B∪dB), PROVIDED
    the deltas are true inserts: dA shares no rows with A and dB none
    with B (the caller's contract — partition-append ingestion gives it
    for free; enforcing it here would cost the full-table scan IVM
    exists to avoid). Inner join only: outer/anti views need retraction
    handling (deletes emitting negative multiplicities), a different
    operator.

    Plan shape (scale notes): the base tables appear once each, and
    each join pairs a BASE scan with a DELTA side. Deltas are one
    ingest batch — small by construction — so ``broadcast_deltas``
    (default) hints them into broadcast hash joins: NEITHER base table
    shuffles, the dominant cost at view scale. The delta columns and
    join-key filters push into the base scans as usual (Catalyst sees
    plain joins). With the hint off, AQE picks sides — for the rare
    backfill-sized delta that outgrows broadcast. The two terms are
    unioned, not joined, so there is no barrier between them; output
    columns are ``on`` + the non-key columns of A then B (both sides'
    key columns collapse to one, as in a plain equi-join).
    """
    if not on:
        raise ValueError("on must be a non-empty list of join keys")
    for side, df in (("A", base_a), ("dA", delta_a), ("B", base_b),
                     ("dB", delta_b)):
        missing = [c for c in on if c not in df.columns]
        if missing:
            raise ValueError(f"join key(s) {missing} missing from {side}")
    if set(base_a.columns) != set(delta_a.columns):
        raise ValueError("A and dA schemas differ")
    if set(base_b.columns) != set(delta_b.columns):
        raise ValueError("B and dB schemas differ")
    overlap = (set(base_a.columns) & set(base_b.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    hint = F.broadcast if broadcast_deltas else (lambda d: d)
    b_full = base_b.unionByName(delta_b)
    term1 = hint(delta_a).join(b_full, on, "inner")
    term2 = base_a.join(hint(delta_b), on, "inner")
    cols = (
        on
        + [c for c in base_a.columns if c not in on]
        + [c for c in base_b.columns if c not in on]
    )
    return term1.select(*cols).unionByName(term2.select(*cols))
