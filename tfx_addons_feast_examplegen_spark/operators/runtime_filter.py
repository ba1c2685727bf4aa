"""Portable Bloom-filter runtime join reduction.

The 100 TB join problem this solves: a selective dimension predicate
(build side) should prune the fact-table scan (probe side) BEFORE the
join shuffle, but the key set is too large to broadcast as an IN-list
and Spark's own runtime filters (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) only fire on plans the optimizer recognizes. This
module makes the pattern explicit and portable: build a dense Bloom
bitmap (array<long>, `n_bits` total) from the build side with nothing
but built-in JVM expressions — `xxhash64` seeded by hash index, bit_or
word aggregation — then embed the fixed-size bitmap as a CONSTANT in
the probe-side filter expression. No Python UDF, no driver-side key
set (only the O(n_bits/8)-byte bitmap crosses the driver, a parameter
by the repo collect() policy), no join operator, no shuffle added: the
probe side keeps its scan partitioning and drops rows map-side inside
codegen, shrinking the downstream join exchange by the filter's
selectivity.

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
    """SPARSE bitmap over ``build[key]``: one row per 64-bit word with
    any bit set — ``(__word: int, __bits: bigint)``.

    Per key, ``n_hashes`` positions ``pmod(xxhash64(key, i), n_bits)``
    (hash-index seeding keeps the hashes independent without a second
    hash family); set bits aggregate map-side via ``bit_or`` grouped by
    word. The sparse rows are densified DRIVER-SIDE by
    ``bloom_prefilter`` — a ``O(n_bits/64)`` Python loop. An
    executor-side densify (sequence + element_at over a collected map,
    all in one row) was tried first and rejected on measurement: map
    lookup in a single interpreted projection is a linear scan, making
    the densify O(n_words^2) — **80 s of the probe's 103 s total at
    n_bits=2^21** (`scripts/scale_probe_rowid_bloom.py`), for work a
    flat Python array does in milliseconds. Null keys set no bits — a
    Bloom prefilter is a semi-join surrogate and SQL semi-joins never
    match NULL.
    """
    _check_params(n_bits, n_hashes)
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(F.xxhash64(F.col(key), i), F.lit(n_bits)),
        )
    ).alias("pos")
    return (
        build.where(F.col(key).isNotNull())
        .select(pos)
        .select(
            F.expr("CAST(pos div 64 AS INT)").alias("__word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("__m"),
        )
        .groupBy("__word")
        .agg(F.expr("bit_or(__m)").alias("__bits"))
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

    The sparse bitmap rows are collected ONCE to the driver — at most
    ``n_bits/64`` rows (``n_bits/8`` bytes) by construction regardless
    of build-side row count, i.e. a plan PARAMETER like a join
    threshold, not data — densified to a flat array in Python, and
    embedded as a constant, so the membership test compiles to a pure
    map-side Filter inside whole-stage codegen on the scan
    partitioning: no join operator, no exchange, nothing added to the
    row. Two earlier designs were rejected on measurement
    (`scripts/scale_probe_rowid_bloom.py`, 50M probe rows): attaching
    a one-row dense bitmap via ``broadcast()`` + cross-join (the BNLJ
    materializes the 256 KiB bitmap column into every joined row), and
    densifying executor-side (interpreted ``element_at`` over a
    one-row map is O(n_words) per lookup — 80 s at n_bits=2^21 for
    work a Python loop does in milliseconds). With both removed the
    filter's cost is ``n_hashes`` xxhash64 calls + O(1) constant-array
    reads per row.

    ``n_bits``/``n_hashes`` MUST match the build call or membership
    tests read the wrong bits (a word index outside the bitmap raises
    here). Calling this triggers the (distributed) bitmap-build job
    immediately.
    """
    _check_params(n_bits, n_hashes)
    n_words = n_bits // 64
    words = [0] * n_words
    for r in bloom.collect():
        if not 0 <= r["__word"] < n_words:
            raise ValueError(
                f"bitmap word {r['__word']} outside n_bits={n_bits}: "
                "build/probe parameter mismatch"
            )
        words[r["__word"]] = r["__bits"]
    lit_bloom = F.lit(words)
    cond = None
    for i in range(n_hashes):
        # seed-by-index as an INT literal, matching the array<int>
        # sequence elements the build side hashes alongside the key
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        word = F.get(lit_bloom, F.shiftright(p, 6).cast("int"))
        bit = F.call_function(
            "shiftright", word, p.bitwiseAND(F.lit(63)).cast("int")
        ).bitwiseAND(F.lit(1))
        c = bit == 1
        cond = c if cond is None else cond & c
    return probe.where(cond)
