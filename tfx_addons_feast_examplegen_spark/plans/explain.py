"""Plan introspection helpers.

The reference exposes its compiled query via ``retrieval_job.to_sql()``
(``executor.py:128-129``) as debugging IR. The engine's IR is the Catalyst
plan end-to-end (SURVEY.md §3.4); these helpers surface the properties
the 100 TB design cares about — what pushed down, what broadcasts, where
the shuffles are — so operators can assert on their own plans.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Counts of scale-relevant physical operators in the plan."""
    text = plan_text(df)
    # "formatted" output = operator tree, blank line, numbered details;
    # count operators in the tree only (details repeat every name).
    tree = text.split("\n\n", 1)[0]
    return {
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "broadcasts": len(re.findall(r"BroadcastExchange", tree)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", tree)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", tree)),
        "nested_loop_joins": len(re.findall(r"NestedLoopJoin", tree)),
        "sorts": len(re.findall(r"\bSort\b", tree)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", text),
    }


def assert_pushdown(df: DataFrame, expected_fragment: str) -> None:
    """Assert a filter reached the parquet scan (PushedFilters)."""
    summary = plan_summary(df)
    joined = ";".join(summary["pushed_filters"])  # type: ignore[arg-type]
    if expected_fragment not in joined:
        raise AssertionError(
            f"expected pushed filter {expected_fragment!r}, got: {joined!r}"
        )
