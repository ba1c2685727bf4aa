"""Data-layout operators: Z-order (Morton) clustering for data skipping.

North-star extension. At 100 TB the dominant read cost is scanning data
the query doesn't need; engines skip parquet row groups / files whose
min-max column stats exclude the predicate. Sorting by ONE column gives
perfect skipping on that column and none on others; interleaving the
bits of several columns (a Z-order / Morton key) gives each dimension
locality, so range predicates on ANY of the interleaved columns prune
most files. This is the same technique Delta Lake's OPTIMIZE ZORDER BY
and ClickHouse's mortonEncode expose; here it is a pure Spark-expression
key plus a repartition+sort, so it works on vanilla parquet.

The key arithmetic is shift/mask integer ops only — replayable in any
SQL engine, which is how the `zorder_layout` query entry is
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each (non-negative
    integer) column into one BIGINT sort key.

    Bit j of column i lands at output position ``j*len(cols) + (len(cols)
    - 1 - i)`` — column 0 owns the most-significant bit of each group, so
    equal-prefix runs of the key are hypercubes in value space. The whole
    key is one parsed SQL expression (shift/and/or chains stay inside
    whole-stage codegen; no UDF).

    Callers map their values to non-negative ints first (e.g. day
    numbers, dictionary codes, ``pmod`` of a hash); only the low ``bits``
    bits participate.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) must fit a BIGINT: {bits}*{n}")
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            out_pos = j * n + (n - 1 - i)
            terms.append(
                f"shiftleft(shiftrightunsigned(CAST({c} AS BIGINT), {j}) & 1, "
                f"{out_pos})"
            )
    return F.expr(" + ".join(terms))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Physically cluster ``df`` for multi-dimensional data skipping:
    range-partition on the Morton key of ``cols``, sort within
    partitions, drop the key. Write the result straight to parquet — each
    file then covers a compact hypercube of the interleaved dimensions,
    so min-max stats prune reads for predicates on any of them.

    ``repartitionByRange`` samples the key to pick balanced boundaries
    (one extra pass over the key column only); the sort is per-partition,
    no global sort.
    """
    keyed = df.withColumn(key_col, zorder_key(cols, bits=bits))
    parted = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col).drop(key_col)


def partition_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition min/max of ``cols`` (plus row count) — the same
    stats a parquet writer would put in file footers, surfaced as a
    DataFrame so layout quality is measurable: tighter per-partition
    ranges = more skipping. Used by tests to prove Z-order clustering
    beats the unclustered layout quantitatively.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(*aggs)
    )
