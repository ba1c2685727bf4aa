"""Python UDTF surface: table functions expanding one row into many.

pyspark 4's ``@udtf`` is the third user-function plug-point next to
scalar UDFs (U1, ``sources/examplegen.py``) and source hooks (U2,
``registry.py``). Like all row-at-a-time Python, a UDTF is the SLOW
path — use it for logic that genuinely needs imperative Python per row;
everything below is ALSO expressible as pure SQL (the oracle proves it),
so the UDTF here documents the plug surface, not a recommendation.

Executors pickle the class, run ``eval`` per input row, and yield output
rows; with ``useArrow=True`` batches transfer via Arrow. State lives per
partition instance — safe for counters/caches, never for cross-partition
coordination.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string, n_chars: int")
class SplitSentences:
    """Explode a document into (index, sentence, char-count) rows.

    Splitting rule — ``[.!?]+ +`` with empties dropped — is chosen to be
    replayable in ANSI SQL (``string_split_regex`` + ``list_filter``),
    so oracle checks can verify the UDTF bit-for-bit.
    """

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        idx = 0
        for part in re.split(r"[.!?]+ +", text):
            if part != "":
                idx += 1
                yield idx, part, len(part)


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
