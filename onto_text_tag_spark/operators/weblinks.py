"""Web link-graph extraction from raw HTML — (src_url, dst_url, anchor).

The reference's corpus is hyperlink-free abstracts, but its *output*
hyperlinks every tagged entity to a vocab site (link projection P8,
app.py:694-698) and the north_star corpus is Common-Crawl-style pages —
where the page-to-page anchor graph is the other first-class KG a
construction pipeline must emit (host ranking, seed discovery, spam
neighborhoods, anchor-text as free entity labels).

Shape at scale: extraction is pure per-row string work, so it stays
ENTIRELY JVM-side — ``regexp_extract_all`` + ``arrays_zip`` + ``explode``
inside whole-stage codegen; no Python boundary, no UDF.  The html column
is read only here (column pruning keeps it out of every other scan).
Host-graph aggregation is one edge-keyed shuffle with map-side partial
counts; host keys are the classic web-skew hazard (facebook.com), which
the two-phase hash aggregate absorbs — no per-host row concentration
before the partial combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one anchor tag: href value + inner markup (non-greedy to the first
# closing </a>); attribute order tolerated before/after href
ANCHOR_PATTERN = '<a [^>]*href="([^"]*)"[^>]*>(.*?)</a>'

# scheme+host prefix of an absolute http(s) url
_HOST_PATTERN = "^(https?://[^/]+)"


def _strip_tags(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, "<[^>]+>", ""))


def extract_links(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url, anchor) rows, one per ``<a href>`` tag.

    Resolution policy (documented contract, pinned by tests):

    * absolute ``http(s)://`` hrefs pass through;
    * root-relative ``/path`` hrefs resolve against the src page's
      scheme+host;
    * everything else (fragment ``#x``, ``mailto:``, protocol-relative,
      directory-relative) is dropped — at crawl scale these are
      overwhelmingly navigation noise, and directory-relative resolution
      needs the full RFC 3986 merge, which belongs in a dedicated UDF if
      a corpus ever demands it.

    Anchor text = inner markup with tags stripped and trimmed.
    """
    html_str = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 1)
    inners = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 2)
    pairs = (
        docs.select(
            F.col(url_col).cast("string").alias("src_url"),
            F.explode(F.arrays_zip(hrefs.alias("href"), inners.alias("inner")))
            .alias("a"),
        )
        .select(
            "src_url",
            F.col("a.href").alias("href"),
            _strip_tags(F.col("a.inner")).alias("anchor"),
        )
    )
    src_base = F.regexp_extract(F.col("src_url"), _HOST_PATTERN, 1)
    dst = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(
            F.col("href").rlike("^/($|[^/])") & (src_base != ""),
            F.concat(src_base, F.col("href")),
        )
        .otherwise(F.lit(None))
    )
    return (
        pairs.withColumn("dst_url", dst)
        .where(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url", "anchor")
    )


_TRACKING = "(?i)(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"
_SCHEME_HOST = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url(col: Column) -> Column:
    """Canonical form of a url — the key url-level dedup and link-graph
    node identity hang on.  Policy (pinned by tests, mirrored exactly by
    ``canonical_url_sql``):

    1. drop the fragment (``#...``);
    2. lowercase scheme+host ONLY (path/query case is significant);
    3. strip default ports (``:80`` http, ``:443`` https; others kept);
    4. remove tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
       case-insensitive) and clean the separators they leave behind.

    A value with no ``scheme://`` prefix passes through (minus fragment).
    All JVM-side regexp — whole-stage codegen, no UDF.
    """
    u = F.regexp_replace(col.cast("string"), "#.*$", "")
    prefix = F.regexp_extract(u, _SCHEME_HOST, 1)
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    lp = F.regexp_replace(
        F.regexp_replace(F.lower(prefix), "^(https://[^/:]+):443$", "$1"),
        "^(http://[^/:]+):80$",
        "$1",
    )
    r = F.regexp_replace(rest, _TRACKING, "")
    r = F.regexp_replace(r, "&&+", "&")
    r = F.regexp_replace(r, "\\?&", "?")
    r = F.regexp_replace(r, "[?&]+$", "")
    return F.when(prefix == "", u).otherwise(F.concat(lp, r))


def canonical_url_sql(expr: str) -> str:
    """DuckDB rendering of ``canonical_url`` over a SQL expression
    (DuckDB replaces first-match-only by default → 'g'; backreference
    syntax differs, semantics identical)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    pre = f"regexp_extract({u}, '{_SCHEME_HOST}', 1)"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    lp = (
        f"regexp_replace(regexp_replace(lower({pre}),"
        f" '^(https://[^/:]+):443$', '\\1'),"
        f" '^(http://[^/:]+):80$', '\\1')"
    )
    r = f"regexp_replace({rest}, '{_TRACKING}', '', 'g')"
    r = f"regexp_replace({r}, '&&+', '&', 'g')"
    r = f"regexp_replace({r}, '\\?&', '?', 'g')"
    r = f"regexp_replace({r}, '[?&]+$', '', 'g')"
    return f"(CASE WHEN {pre} = '' THEN {u} ELSE {lp} || {r} END)"


def host_of(col: Column) -> Column:
    """Bare hostname of an absolute http(s) url ('' when not absolute)."""
    return F.regexp_extract(col, "^https?://([^/:]+)", 1)


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, weight) — link counts between hosts,
    self-loops (intra-site navigation) excluded; the edge set host-rank /
    neighborhood analyses run on."""
    return (
        links.select(
            host_of(F.col("src_url")).alias("src_host"),
            host_of(F.col("dst_url")).alias("dst_host"),
        )
        .where(
            (F.col("src_host") != "")
            & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )
