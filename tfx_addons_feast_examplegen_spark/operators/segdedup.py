"""Sub-document segment dedup with first-wins rewrite (CCNet-style).

Document-level dedup (exact / MinHash / SimHash — ``dedup.py``) drops
whole documents, but web corpora mostly repeat at the *fragment* level:
boilerplate headers, navigation, license blocks pasted into otherwise
novel pages. The CCNet pipeline (Wenzek et al., 2020 — public paper)
dedups at paragraph granularity: hash every fragment across the whole
corpus, keep the first occurrence, delete the rest, and reassemble the
surviving fragments per document.

This operator is the fixed-width variant over word segments (the
fixture corpus has no paragraph marks): split each document into
consecutive ``width``-word segments (trailing partial kept), declare
the globally-first occurrence of each distinct segment — minimal
``(doc_id, seg_idx)`` — the keeper, drop every other occurrence, and
re-concatenate each document's kept segments in order.

Spark shape, chosen for the 100 TB case:
- the winner per segment is ``min(struct(doc_id, seg_idx))`` under a
  hash aggregate — **map-side combinable**, so a boilerplate segment
  repeated a billion times contributes one partial row per mapper and
  can never skew a sort the way a
  ``row_number() OVER (PARTITION BY seg)`` window would (one task
  would sort the hot segment's entire occurrence list);
- in the default raw-string mode the winner rows already carry the
  segment text, so they ARE the kept occurrences — one explode, one
  combinable agg shuffle, no join back; with ``hashed=True`` the
  segment string folds to ``xxhash64`` before the shuffle (8-byte
  keys instead of segment strings) and the text re-attaches by an
  equi-join on ``(key, doc_id, seg_idx)`` (first-wins picks per hash;
  a collision merges two distinct segments with probability
  ~``n²/2⁶⁴`` — deterministic, vanishing; the default is exactly
  oracle-equal);
- reassembly is ``array_sort(collect_list(struct(idx, seg)))`` per
  document — bounded by document size, not corpus size — and a final
  left join restores documents whose every segment lost.

Reference scope: the reference delegates all execution to BigQuery and
has no dedup surface (feast_component/executor.py:128-163); this
operator is part of the Spark-native training-data extension
inventoried in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_occurrences(
    df: DataFrame, id_col: str, text_col: str, *, width: int
) -> DataFrame:
    """(id, seg_idx, seg): consecutive ``width``-word segments, trailing
    partial included. Pure expression chain (split → sequence →
    slice → concat_ws), exploded."""
    if width < 1:
        raise ValueError(f"width must be >= 1: {width}")
    segs = (
        f"transform(sequence(0,"
        f" CAST(ceil(size(split({text_col}, ' ')) / {width}) AS INT) - 1),"
        f" j -> struct(j AS seg_idx,"
        f" concat_ws(' ', slice(split({text_col}, ' '), j * {width} + 1, {width}))"
        f" AS seg))"
    )
    return df.select(
        F.col(id_col), F.explode(F.expr(segs)).alias("s")
    ).select(id_col, F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    width: int = 20,
    hashed: bool = False,
) -> DataFrame:
    """Rewrite each document to its globally-first segments.

    Returns ``(id_col, text_col, n_segs, n_kept)`` — one row per input
    document (possibly with empty text when every segment lost), where
    ``text_col`` is the kept segments re-joined in original order.
    First-wins order is ``(doc_id, seg_idx)`` lexicographic, so the
    result is deterministic and idempotent (re-running dedups nothing:
    every surviving segment is already its group's minimum).

    NULL-text contract: a NULL ``text_col`` input contributes no
    segments and comes back as ``('', n_segs=0, n_kept=0)`` — the same
    row shape as a document whose every segment lost (all four output
    columns are non-null for every input row).
    """
    occ = segment_occurrences(df, id_col, text_col, width=width)
    if hashed:
        # winners carry only the 8-byte key, so the segment text must
        # re-attach by an equi-join on (key, doc, idx). The keyed frame
        # has TWO consumers (the winners aggregate and the join back),
        # each of which would re-run the corpus scan + segment explode
        # + hash — the decode-pin audit's defect class (dedup._pin,
        # docs/BENCH_NOTES_r12.md); pin it so the explode runs once.
        from .dedup import _pin

        keyed = _pin(occ.select(
            F.col(id_col), "seg_idx", "seg", F.xxhash64("seg").alias("__k")
        ))
        winners = keyed.groupBy("__k").agg(
            F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("w")
        ).select(
            F.col("__k"),
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.seg_idx").alias("seg_idx"),
        )
        kept = keyed.join(winners, ["__k", id_col, "seg_idx"]).select(
            id_col, "seg_idx", "seg"
        )
    else:
        # raw-string mode: the group key IS the segment text, so the
        # winner rows are already the kept occurrences — no join back,
        # one explode, one combinable agg shuffle.
        kept = occ.groupBy("seg").agg(
            F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("w")
        ).select(
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.seg_idx").alias("seg_idx"),
            F.col("seg"),
        )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(seg_idx, seg))), x -> x.seg)"),
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # n_segs is segmentation arithmetic, not data: no explode, no agg.
    # coalesce(0) covers NULL text (split(NULL) is NULL), keeping the
    # row shape consistent with the coalesced n_kept/text below.
    n_segs = F.expr(
        f"coalesce(CAST(ceil(size(split({text_col}, ' ')) / {width})"
        f" AS BIGINT), CAST(0 AS BIGINT))"
    )
    return (
        df.select(F.col(id_col), n_segs.alias("n_segs"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
            F.col("n_segs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
