"""HTML extraction and URL canonicalization edge cases.

The driver oracle exercises the fixture shapes; this suite pins the
corners — single-pass entity decoding, tags inside scripts, port/path
edge combinations — plus the expression-only plan contract (no UDF,
no shuffle: extraction must stay a map-side Project).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.crawl import (
    canonicalize_url,
    extract_html_text,
)


def _extract1(spark, html: str) -> str:
    return (
        spark.createDataFrame([(html,)], "h: string")
        .select(extract_html_text(F.col("h")).alias("t"))
        .collect()[0]["t"]
    )


def _canon1(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "u: string")
        .select(canonicalize_url(F.col("u")).alias("c"))
        .collect()[0]["c"]
    )


def test_extract_strips_script_with_tags_inside(spark):
    h = '<p>a</p><script>document.write("</div><p>fake</p>");</script><p>b</p>'
    # everything between <script> and the FIRST </script> goes, even
    # HTML-looking strings; non-greedy match stops at the real closer
    assert _extract1(spark, h) == "a b"


def test_extract_decodes_entities_single_pass(spark):
    # double-encoded text decodes exactly one level: &amp;lt; -> &lt;
    h = "<p>&amp;lt;tag&amp;gt; &lt;real&gt; &quot;q&quot; &#39;s&#39;</p>"
    assert _extract1(spark, h) == "&lt;tag&gt; <real> \"q\" 's'"


def test_extract_block_vs_inline_boundaries(spark):
    h = "<div>one</div><span>two</span> <b>three</b><br>four"
    assert _extract1(spark, h) == "one two three four"


def test_extract_comments_and_whitespace_collapse(spark):
    h = "<p>  a  <!-- <p>hidden</p> -->   b\t\nc  </p>"
    assert _extract1(spark, h) == "a b c"


@pytest.mark.parametrize(
    ("url", "want"),
    [
        # root path materializes; default port drops; host lowercases
        ("HTTP://EXAMPLE.com:80", "http://example.com/"),
        ("https://example.com:443/#frag", "https://example.com/"),
        # non-default port survives, including http on 443
        ("http://example.com:443/x", "http://example.com:443/x"),
        # duplicate + trailing slashes; root slash stays
        ("http://e.com///", "http://e.com/"),
        ("http://e.com//a//b/", "http://e.com/a/b"),
        # all-tracking query drops its '?'; mixed query sorts
        ("http://e.com/p?utm_source=a&utm_medium=b", "http://e.com/p"),
        ("http://e.com/p?b=2&a=10&a=1", "http://e.com/p?a=1&a=10&b=2"),
        # fragment strips even when it contains '?'
        ("http://e.com/p?a=1#frag?b=2", "http://e.com/p?a=1"),
        # bare tracking key without '=' also drops
        ("http://e.com/p?fbclid&x=1", "http://e.com/p?x=1"),
        # non-tracking param whose name merely CONTAINS utm_ stays
        ("http://e.com/p?xutm_a=1", "http://e.com/p?xutm_a=1"),
    ],
)
def test_canonicalize_cases(spark, url, want):
    assert _canon1(spark, url) == want


def test_both_are_pure_projections(spark):
    df = spark.range(10).select(
        F.concat(F.lit("<p>x</p>")).alias("h"),
        F.lit("HTTP://A.com:80/?utm_source=1&b=2").alias("u"),
    )
    out = df.select(
        extract_html_text(F.col("h")).alias("t"),
        canonicalize_url(F.col("u")).alias("c"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
