"""Crawl-corpus text plumbing: HTML -> text extraction, URL canonicalization.

Both operators are **pure column expressions** — regexp/replace chains
that run inside whole-stage codegen on the scan partitioning. No UDF,
no shuffle, no per-row Python: at 100 TB these are the map-side steps
of a WET-style extraction pipeline (WARC walking lives in
``sources/warc.py``; this module is the stage after it).

Regex dialect note: every pattern here is written in the common subset
of Java regex (Spark) and RE2 (DuckDB oracle) — in particular NO
backreferences (RE2 lacks them; the script/style strips are spelled as
two alternations instead of ``<(script|style)>.*?</\\1>``) and only
``(?is)`` inline flags, which both engines accept.

Reference scope: the reference has no text-processing surface at all
(it delegates to BigQuery SQL, feast_component/executor.py:128-163);
these operators are part of the Spark-native LLM-pipeline extension
inventoried in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decode order matters and is part of the contract: named/numeric
# entities first, ampersand LAST, so double-encoded text ("&amp;lt;")
# decodes one level per pass exactly like the W3C reference decoder
# applied once.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# Tags whose boundaries imply a text break (the WET convention);
# everything else is inline and strips to a space.
_BLOCK_TAGS = "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article"


def extract_html_text(html: Column) -> Column:
    """WET-style visible-text extraction from an HTML column.

    Steps (each a codegen-friendly regexp/replace):

    1. drop ``<script>``/``<style>`` elements INCLUDING their content
       (their text is code, not prose — and it is where stray ``<``
       and ``&&`` live, so it must go before the generic tag strip);
    2. drop comments;
    3. block-level tag boundaries -> newline, remaining tags -> space;
    4. decode the six entities that dominate crawl text;
    5. collapse all whitespace runs to single spaces and trim.
    """
    c = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, rf"(?i)</?({_BLOCK_TAGS})(\s[^>]*)?>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _ENTITIES:
        c = F.call_function("replace", c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


_TRACKING_PARAMS = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)(=|$)"
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one expression tree.

    Normalizations (the standard crawl-dedup set, RFC 3986 §6 plus the
    tracking-param strip every pipeline adds):

    - scheme and host lowercased;
    - default port dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept;
    - fragment dropped;
    - duplicate slashes in the path collapsed, trailing slash dropped
      (root stays ``/``; an empty path becomes ``/``);
    - tracking query params removed (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``mc_eid``), the rest SORTED bytewise and rejoined —
      param order never distinguishes resources in practice, and
      sorting makes the canonical form a pure function of the param
      set; an emptied query drops its ``?``.
    """
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.lower(F.regexp_extract(nofrag, r"^[^:]+://([^/?]*)", 1))
    host = F.regexp_extract(authority, r"^([^:]*)", 1)
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    norm_auth = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)

    raw_path = F.regexp_extract(nofrag, r"^[^:]+://[^/?]*([^?]*)", 1)
    collapsed = F.regexp_replace(raw_path, r"/{2,}", "/")
    no_trail = F.regexp_replace(collapsed, r"/$", "")
    path = F.when(no_trail == "", F.lit("/")).otherwise(no_trail)

    raw_query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(raw_query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAMS),
        )
    )
    query = F.array_join(kept, "&")

    return F.concat(
        scheme,
        F.lit("://"),
        norm_auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_id: str = "url_id",
    host: str = "host",
    path: str = "path",
    prefix: str = "prefix",
    allow: str = "allow",
    max_path_len: int = 256,
) -> DataFrame:
    """Robots-exclusion verdict per URL by the longest-matching-prefix
    rule (the REP tie-break standardized in RFC 9309 §2.2.2: the most
    specific — longest — matching rule wins; on equal length, allow
    wins; a URL matching no rule is allowed).

    The 100 TB shape: rules are per-host string prefixes, so the naive
    spelling is a theta-join (host equality + ``starts_with``) whose
    cost is |urls| × rules-per-host — LINEAR in the rule count of each
    host, and the hot hosts are exactly the mega-sites with the
    biggest robots files. This operator makes it an EXACT equi-join:
    each URL explodes into its ≤ ``max_path_len`` character prefixes
    (expression-only ``transform(sequence(...))``), rules join on
    ``(host, prefix)`` by equality, and one ``max(struct(len, allow))``
    aggregate per URL implements longest-wins + allow-on-tie. Cost is
    |urls|·path_len + matches — FLAT in rules-per-host,
    hash-partitioned, AQE-splittable. Measured at 1M URLs on one host
    (docs/BENCH_NOTES_r10.md): theta 4.3 s at 5k rules but 90.7 s at
    20k and 296 s at 80k; this operator 2.7–5.4 s at every rule count.
    The theta form stays ~4× faster when every host has only dozens of
    rules — use it only when rules-per-host is provably small. Paths
    longer than ``max_path_len`` fail in-plan (a rule prefix longer
    than the cap could otherwise silently never match its URL).

    ``urls``: (url_id, host, path); ``rules``: (host, prefix, allow
    boolean). Output: urls columns + ``allowed`` boolean +
    ``rule_len`` (length of the winning rule's prefix; NULL when no
    rule matched). NULL paths never match; rules with a NULL/empty
    prefix or a NULL ``allow`` verdict are malformed and ignored (a
    verdict-less rule must not silently become an allow — or a deny).
    """
    if max_path_len < 1:
        raise ValueError(f"max_path_len must be >= 1: {max_path_len}")
    reserved = {"allowed", "rule_len", "__win", "__pfx", "__allow"}
    clash = reserved & set(urls.columns)
    if clash:
        raise ValueError(
            f"urls columns collide with robots_filter outputs: {sorted(clash)}"
        )
    guarded_len = F.when(
        F.assert_true(
            F.length(F.col(path)) <= max_path_len,
            F.concat(
                F.lit(
                    f"robots_filter: path longer than max_path_len="
                    f"{max_path_len}: "
                ),
                F.col(path),
            ),
        ).isNull(),
        F.length(F.col(path)),
    )
    # the length > 0 conjunct matters: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]) — an empty path would otherwise emit two spurious
    # ''-prefix rows per URL (the _grams_expr pitfall)
    pfx = urls.where(
        F.col(path).isNotNull() & (F.length(F.col(path)) > 0)
    ).select(
        F.col(url_id),
        F.col(host),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), guarded_len),
                lambda i: F.col(path).substr(F.lit(1), i),
            )
        ).alias("__pfx"),
    )
    matches = pfx.join(
        rules.where(
            F.col(prefix).isNotNull()
            & (F.length(F.col(prefix)) > 0)
            & F.col(allow).isNotNull()
        ).select(
            F.col(host),
            F.col(prefix).alias("__pfx"),
            F.col(allow).cast("int").alias("__allow"),
        ),
        [host, "__pfx"],
    )
    verdict = matches.groupBy(url_id).agg(
        F.max(
            F.struct(
                F.length("__pfx").alias("len"), F.col("__allow").alias("a")
            )
        ).alias("__win")
    )
    return (
        urls.join(verdict, url_id, "left_outer")
        .select(
            *urls.columns,
            F.coalesce(F.col("__win.a") == 1, F.lit(True)).alias("allowed"),
            F.col("__win.len").alias("rule_len"),
        )
    )
