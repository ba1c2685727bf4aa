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


# ---------------------------------------------------------------------------
# robots_filter — RFC 9309 longest-match via prefix-explode equi-join
# ---------------------------------------------------------------------------

from tfx_addons_feast_examplegen_spark.operators.crawl import (  # noqa: E402
    robots_filter,
)


def _robots_fixture(spark):
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/private/docs/x"),
            (2, "a.com", "/private/public/y"),
            (3, "a.com", "/open/z"),
            (4, "b.com", "/private/docs/x"),   # no rules for b.com
            (5, "a.com", "/tie/path"),
            (6, "a.com", None),                # NULL path: default allow
        ],
        "url_id: long, host: string, path: string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "/private", False),
            ("a.com", "/private/public", True),   # longer allow wins
            ("a.com", "/tie", False),
            ("a.com", "/tie", True),              # equal length: allow wins
            ("a.com", "", False),                 # empty prefix ignored
            ("a.com", None, True),                # NULL prefix ignored
        ],
        "host: string, prefix: string, allow: boolean",
    )
    return urls, rules


def test_robots_longest_match_tie_and_default(spark):
    urls, rules = _robots_fixture(spark)
    rows = {r["url_id"]: r for r in robots_filter(urls, rules).collect()}
    assert rows[1]["allowed"] is False and rows[1]["rule_len"] == 8
    assert rows[2]["allowed"] is True and rows[2]["rule_len"] == 15
    assert rows[3]["allowed"] is True and rows[3]["rule_len"] is None
    assert rows[4]["allowed"] is True and rows[4]["rule_len"] is None
    assert rows[5]["allowed"] is True and rows[5]["rule_len"] == 4
    assert rows[6]["allowed"] is True and rows[6]["rule_len"] is None
    assert len(rows) == 6  # every URL exactly once


def test_robots_matches_bruteforce(spark):
    import random

    rng = random.Random(17)
    urls = [
        (i, f"h{rng.randint(0, 3)}",
         "/" + "/".join(rng.choice("abcd") for _ in range(rng.randint(1, 5))))
        for i in range(200)
    ]
    rules = []
    for h in range(4):
        for _ in range(6):
            depth = rng.randint(1, 3)
            rules.append(
                (f"h{h}",
                 "/" + "/".join(rng.choice("abcd") for _ in range(depth)),
                 rng.random() < 0.5)
            )
    u = spark.createDataFrame(urls, "url_id: long, host: string, path: string")
    r = spark.createDataFrame(rules, "host: string, prefix: string, allow: boolean")
    got = {row["url_id"]: row["allowed"] for row in robots_filter(u, r).collect()}
    for uid, host, path in urls:
        cand = [
            (len(p), a)
            for rh, p, a in rules
            if rh == host and p and path.startswith(p)
        ]
        exp = max(cand)[1] if cand else True
        assert got[uid] == exp, (uid, path, sorted(cand, reverse=True))


def test_robots_path_cap_fails_loud(spark):
    urls = spark.createDataFrame(
        [(1, "a.com", "/" + "x" * 50)], "url_id: long, host: string, path: string"
    )
    rules = spark.createDataFrame(
        [("a.com", "/x", False)], "host: string, prefix: string, allow: boolean"
    )
    with pytest.raises(Exception, match="max_path_len"):
        robots_filter(urls, rules, max_path_len=10).collect()
    with pytest.raises(ValueError):
        robots_filter(urls, rules, max_path_len=0)


def test_robots_plan_no_nested_loop(spark):
    urls, rules = _robots_fixture(spark)
    plan = (
        robots_filter(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_robots_null_allow_rule_is_ignored_not_allowed(spark):
    # a rule whose verdict was lost upstream (NULL allow) must be
    # IGNORED, not silently become the winning allow/deny
    urls = spark.createDataFrame(
        [(1, "a.com", "/private/x")], "url_id: long, host: string, path: string"
    )
    rules = spark.createDataFrame(
        [("a.com", "/private", None), ("a.com", "/pri", False)],
        "host: string, prefix: string, allow: boolean",
    )
    r = robots_filter(urls, rules).collect()[0]
    # the NULL-verdict longest rule is dropped; the shorter deny wins
    assert r["allowed"] is False and r["rule_len"] == 4, r


def test_robots_empty_path_no_spurious_prefixes(spark):
    # sequence(1, 0) counts DOWN in Spark; an empty path must emit no
    # prefix rows (and default to allowed), not two '' prefixes
    urls = spark.createDataFrame(
        [(1, "a.com", "")], "url_id: long, host: string, path: string"
    )
    rules = spark.createDataFrame(
        [("a.com", "", False)], "host: string, prefix: string, allow: boolean"
    )
    rows = robots_filter(urls, rules).collect()
    assert len(rows) == 1
    assert rows[0]["allowed"] is True and rows[0]["rule_len"] is None


def test_robots_output_column_collision_rejected(spark):
    urls = spark.createDataFrame(
        [(1, "a.com", "/x", True)],
        "url_id: long, host: string, path: string, allowed: boolean",
    )
    rules = spark.createDataFrame(
        [("a.com", "/x", False)], "host: string, prefix: string, allow: boolean"
    )
    with pytest.raises(ValueError, match="collide"):
        robots_filter(urls, rules)
