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


def resolve_redirects(
    redirects: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src_url",
    dst: str = "dst_url",
    node_col: str = "url",
    max_doubling: int = 20,
) -> DataFrame:
    """Resolve every url's redirect chain to its final destination and
    flag redirect loops — (url, resolved_url, is_loop).

    A crawl's HTTP 301/302 map is a functional graph (at most one
    out-edge per url once normalized); canonical-identity resolution
    must follow chains (a → b → c) to the terminal AND terminate on
    loops (a → b → a), which real crawls always contain.  Following
    chains one hop per round is O(longest chain) shuffles; POINTER
    DOUBLING is O(log n): each round every node's pointer jumps to its
    pointer's pointer, so after k rounds ptr = f^(2^k)(url).  With
    2^k ≥ n the pointer has entered the chain's terminal cycle — a
    terminal url (no out-edge, modeled as a self-loop f(t)=t) or a
    real redirect loop.  Alongside the pointer, each round folds a
    running min over the visited orbit (min_{i<2^k} f^i(url)); the
    orbit of a node ON a cycle is exactly the cycle, so joining the
    settled pointer to its orbit-min yields a deterministic loop
    representative: the lexicographically smallest url of the loop.

    Resolution: ``resolved_url`` = the terminal url, or the loop's
    smallest url; ``is_loop`` = the settled pointer still has a real
    out-edge (true self-redirects u→u are loops of length 1).

    Multi-valued redirect rows are normalized to min(dst) per src
    first, keeping the graph functional and the result deterministic.

    Scale shape: each doubling round is ONE self-equi-join of the
    (url, ptr, orbit_min) state on ptr = url — shuffle-partitioned by
    the join key, no window, no driver data path; ``localCheckpoint``
    caps the lineage per round (the iterative-join trap).  Round
    count is ⌈log2(n)⌉ capped at ``max_doubling`` (2^20 ≈ 10^6 hops
    covers any real redirect chain; crawl frontiers cap at ~10-30).
    """
    f = (
        redirects.groupBy(F.col(src).alias("url"))
        .agg(F.min(dst).alias("next"))
    )
    universe = (
        redirects.select(F.col(src).alias("url"))
        .unionByName(redirects.select(F.col(dst).alias("url")))
    )
    if nodes is not None:
        universe = universe.unionByName(nodes.select(F.col(node_col).alias("url")))
    universe = universe.distinct()

    # state invariant after k rounds: ptr = f^(2^k)(url),
    # mn = min over {f^0(url) .. f^(2^k - 1)(url)}
    state = (
        universe.join(f, "url", "left")
        .select(
            "url",
            F.coalesce("next", F.col("url")).alias("ptr"),
            F.col("url").alias("mn"),
        )
        .localCheckpoint(eager=True)
    )
    n = state.count()
    rounds = max(1, min(max_doubling, int(n).bit_length()))
    for r in range(rounds):
        hop = state.select(
            F.col("url").alias("_u2"),
            F.col("ptr").alias("_p2"),
            F.col("mn").alias("_m2"),
        )
        state = state.join(hop, state["ptr"] == hop["_u2"]).select(
            "url",
            F.col("_p2").alias("ptr"),
            F.least("mn", "_m2").alias("mn"),
        )
        # Checkpoint every SECOND round (and at the end): each eager
        # checkpoint is a driver-synchronized job, and that per-round
        # barrier is the measured serial fraction of the whole
        # operator (bench: 11 rounds over 4M urls).  One uncheckpointed
        # level quadruples the leaf references in the plan — still
        # trivially small — while halving the barrier count; deeper
        # batching grows the plan exponentially for no further win.
        if r % 2 == 1 or r == rounds - 1:
            state = state.localCheckpoint(eager=True)
    # settled pointer -> its orbit-min (= cycle min, or the terminal
    # itself); is_loop = the settled pointer still redirects somewhere
    orbit = state.select(
        F.col("url").alias("_ou"), F.col("mn").alias("_omin")
    )
    looped = f.select(F.col("url").alias("_lu"), F.lit(True).alias("_has_out"))
    return (
        state.join(orbit, state["ptr"] == orbit["_ou"])
        .join(looped, state["ptr"] == looped["_lu"], "left")
        .select(
            "url",
            F.col("_omin").alias("resolved_url"),
            F.coalesce("_has_out", F.lit(False)).alias("is_loop"),
        )
    )


# one embedded JSON-LD block: schema.org microdata carried in a script
# tag (non-greedy to the first closing tag; blocks never nest).
# (?s): real pages pretty-print the JSON across lines — without DOTALL
# every multi-line block (i.e. most of them) silently fails to match
JSONLD_PATTERN = '(?s)<script type="application/ld\\+json">(.*?)</script>'


def extract_jsonld(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, entity_type, name) — schema.org JSON-LD entities embedded
    in raw pages: the structured-data channel of web KG construction.
    Search engines and open KGs (schema.org via Common Crawl's WAT
    sidecars, Web Data Commons) mine exactly these blocks; they carry
    entity names with TYPES — a labeled complement to the
    dictionary-tagging channel, and the obvious candidate stream for
    entity linking against the ontology.

    Stays ENTIRELY JVM-side: ``regexp_extract_all`` pulls the script
    payloads, ``explode`` one row per block (pages may carry several),
    ``from_json`` parses the fields under an explicit schema
    (PERMISSIVE — a malformed block yields NULLs and is dropped, it
    never kills the scan).  No UDF, no shuffle; column pruning keeps
    the html column out of every other operator's scan.
    """
    blocks = docs.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"),
                F.lit(JSONLD_PATTERN), 1,
            )
        ).alias("_block"),
    )
    parsed = blocks.select(
        "url",
        F.from_json(
            F.col("_block"), "`@type` STRING, name STRING"
        ).alias("_j"),
    )
    return parsed.select(
        "url",
        F.col("_j").getField("@type").alias("entity_type"),
        F.col("_j").getField("name").alias("name"),
    ).where(F.col("entity_type").isNotNull() & F.col("name").isNotNull())
