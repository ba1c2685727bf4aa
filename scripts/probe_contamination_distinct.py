"""A/B probe: contamination_report corpus-shingle dedup placement.

VERDICT r13 nit 1: the r13 spelling ran ``shingles(corpus).distinct()``
BEFORE the broadcast probe join — a shuffle keyed on the full corpus
shingle stream (map-side partial dedup, but still corpus-sized). The
r14 spelling probes RAW corpus shingles against the broadcast benchmark
frame and defers dedup into ``count(DISTINCT shingle)`` keyed on
``(doc, bench)`` — the dedup shuffle then keys on probe SURVIVORS only.

This probe times both spellings on the sf0.1 `documents` fixture with
the entry's exact split (corpus = doc_id %% 20 != 0, benchmark = %% 20
== 0, n=3, min_frac=0.05) and asserts their results are identical.
Numbers go to docs/BENCH_NOTES_r14.md.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.curation import (
    contamination_report,
)
from tfx_addons_feast_examplegen_spark.operators.dedup import _pin, shingles
from tfx_addons_feast_examplegen_spark.session import get_spark, register_tables


def _old_spelling(corpus, benchmark, *, n=3, min_frac=0.05):
    """The r13 plan: corpus-side distinct BEFORE the probe join."""
    doc_sh = shingles(corpus, "doc_id", "text", n, hashed=True)
    bench_sh = _pin(
        shingles(
            benchmark.select(
                F.col("doc_id").alias("bench_id"),
                F.col("text").alias("__btext"),
            ),
            "bench_id",
            "__btext",
            n,
            hashed=True,
        )
    )
    totals = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    overlaps = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )
    return (
        overlaps.join(F.broadcast(totals), "bench_id")
        .withColumn(
            "frac",
            F.round(F.col("overlap_ngrams") / F.col("bench_ngrams"), 6),
        )
        .filter(F.col("frac") >= min_frac)
        .select("doc_id", "bench_id", "overlap_ngrams", "bench_ngrams", "frac")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    docs = register_tables(spark, sf_dir)["documents"]
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)

    def run(tag, build):
        df = build(corpus, bench)
        df.write.format("noop").mode("overwrite").save()  # warm
        floor = float("inf")
        for _ in range(passes):
            t0 = time.monotonic()
            build(corpus, bench).write.format("noop").mode(
                "overwrite"
            ).save()
            floor = min(floor, time.monotonic() - t0)
        print(f"{tag}: floor {floor:.3f}s over {passes} passes")
        return floor

    # identical results first (order-insensitive multiset)
    new_rows = sorted(
        map(tuple, contamination_report(corpus, bench, n=3, min_frac=0.05)
            .collect())
    )
    old_rows = sorted(map(tuple, _old_spelling(corpus, bench).collect()))
    assert new_rows == old_rows, "spellings disagree"
    print(f"results identical: {len(new_rows)} pairs")

    old = run("old (corpus distinct pre-probe)", _old_spelling)
    new = run(
        "new (raw probe + countDistinct)",
        lambda c, b: contamination_report(c, b, n=3, min_frac=0.05),
    )
    print(f"speedup old/new: {old / new:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
