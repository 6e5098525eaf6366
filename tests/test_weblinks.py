"""Web link-graph extraction (operators/weblinks.py): resolution policy,
anchor-text stripping, host aggregation — all JVM-side (plan pinned)."""

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.operators.weblinks import (
    extract_jsonld,
    extract_links,
    host_graph,
    resolve_redirects,
)
from onto_text_tag_spark.session import local_df


def _docs(spark, rows):
    return local_df(spark, rows, "url string, html string")


def test_extract_links_resolution_policy(spark):
    docs = _docs(spark, [
        (
            "https://a.example.com/page/1",
            '<p>x</p>'
            '<a class="nav" href="https://b.example.com/t">to b</a>'
            '<a href="/local/2" rel="nofollow">local</a>'
            '<a href="#frag">frag</a>'
            '<a href="mailto:x@y.z">mail</a>'
            '<a href="sibling.html">rel</a>'
            '<a href="//cdn.example.com/x">proto-rel</a>',
        ),
    ])
    got = {
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_links(docs).collect()
    }
    assert got == {
        ("https://a.example.com/page/1", "https://b.example.com/t", "to b"),
        # root-relative resolves against the src scheme+host
        ("https://a.example.com/page/1", "https://a.example.com/local/2",
         "local"),
    }


def test_extract_links_anchor_text_and_multiplicity(spark):
    docs = _docs(spark, [
        (
            "http://h.com/p",
            '<a href="http://x.com/1"><b>bold</b> link </a>'
            '<a href="http://x.com/1">again</a>',
        ),
        ("http://h.com/q", "<p>no links</p>"),
    ])
    rows = extract_links(docs).collect()
    # duplicate hrefs kept (multiplicity matters for host weights)
    assert len(rows) == 2
    anchors = sorted(r["anchor"] for r in rows)
    assert anchors == ["again", "bold link"]  # tags stripped, trimmed


def test_extract_links_binary_html(spark):
    docs = local_df(
        spark,
        [("https://a.com/1", '<a href="https://b.com/x">b</a>'.encode())],
        "url string, html binary",
    )
    rows = extract_links(docs).collect()
    assert [(r["src_url"], r["dst_url"]) for r in rows] == [
        ("https://a.com/1", "https://b.com/x")
    ]
    assert rows[0]["anchor"] == "b"


def test_host_graph_weights_and_self_loop_exclusion(spark):
    docs = _docs(spark, [
        ("https://a.com/1",
         '<a href="https://b.com/x">1</a><a href="https://b.com/y">2</a>'
         '<a href="/self">me</a>'),
        ("https://a.com/2", '<a href="https://b.com/z">3</a>'),
        ("https://b.com/1", '<a href="https://a.com/">back</a>'),
    ])
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(extract_links(docs)).collect()
    }
    # a->b counted across pages; intra-a self link excluded
    assert got == {("a.com", "b.com"): 3, ("b.com", "a.com"): 1}


def test_extract_links_plan_stays_jvm_side(spark):
    docs = _docs(spark, [("https://a.com/1", '<a href="/x">x</a>')])
    plan = extract_links(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_canonical_url_policy(spark):
    from onto_text_tag_spark.operators.weblinks import canonical_url

    cases = [
        # fragment dropped; scheme+host lowered; PATH case preserved
        ("HTTPS://WWW.Example.COM/Path/UP?x=1#frag",
         "https://www.example.com/Path/UP?x=1"),
        # default ports stripped, non-default kept
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),
        # tracking params removed in every position, separators cleaned
        ("https://a.com/p?utm_source=f&id=5", "https://a.com/p?id=5"),
        ("https://a.com/p?id=5&UTM_campaign=c", "https://a.com/p?id=5"),
        ("https://a.com/p?id=5&gclid=g&y=2", "https://a.com/p?id=5&y=2"),
        ("https://a.com/p?utm_a=1&utm_b=2", "https://a.com/p"),
        ("https://a.com/p?fbclid=z", "https://a.com/p"),
        # no scheme: passthrough minus fragment
        ("not a url#x", "not a url"),
    ]
    df = local_df(spark, [(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in
           df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_sql_twin_matches(spark):
    import duckdb

    from onto_text_tag_spark.operators.weblinks import (
        canonical_url,
        canonical_url_sql,
    )

    urls = [
        "HTTPS://A.com:443/P?utm_x=1&id=2#f",
        "http://B.COM:80/q?gclid=1",
        "https://c.com/r?a=1&utm_b=2&c=3",
        "ftp://Mixed.Case/keep?utm_a=1",
        "plain text",
    ]
    df = local_df(spark, [(u,) for u in urls], "u string")
    spark_out = [r["c"] for r in
                 df.select(canonical_url(F.col("u")).alias("c")).collect()]
    con = duckdb.connect()
    vals = ", ".join(f"('{u}')" for u in urls)
    duck_out = [r[0] for r in con.execute(
        f"SELECT {canonical_url_sql('u')} FROM (VALUES {vals}) t(u)"
    ).fetchall()]
    assert spark_out == duck_out


# ---------------------------------------------------------------------------
# resolve_redirects — pointer-doubling chain resolution + loop detection
# ---------------------------------------------------------------------------

def _redirects(spark, pairs):
    return local_df(spark, pairs, "src_url string, dst_url string")


def test_resolve_redirects_chain_loop_terminal_isolated(spark):
    # a -> b -> c (terminal); p -> q -> r -> p (3-loop); s -> s
    # (self-redirect = 1-loop); z isolated (appears only via nodes)
    edges = _redirects(spark, [
        ("u:a", "u:b"), ("u:b", "u:c"),
        ("u:p", "u:q"), ("u:q", "u:r"), ("u:r", "u:p"),
        ("u:s", "u:s"),
    ])
    nodes = local_df(spark, [("u:z",)], "url string")
    got = {
        r["url"]: (r["resolved_url"], r["is_loop"])
        for r in resolve_redirects(edges, nodes=nodes).collect()
    }
    assert got == {
        "u:a": ("u:c", False),
        "u:b": ("u:c", False),
        "u:c": ("u:c", False),        # terminal resolves to itself
        "u:p": ("u:p", True),         # loop representative = min url
        "u:q": ("u:p", True),
        "u:r": ("u:p", True),
        "u:s": ("u:s", True),         # self-redirect IS a loop
        "u:z": ("u:z", False),        # isolated = its own terminal
    }


def test_resolve_redirects_chain_into_loop_resolves_to_cycle_min(spark):
    # long chain c9 -> c8 -> ... -> c0 -> L1 -> L0 -> L1 (2-loop):
    # every chain member resolves to the LOOP min, never a chain url
    # (the chain prefix must not leak into the representative)
    chain = [(f"u:c{i}", f"u:c{i-1}") for i in range(9, 0, -1)]
    edges = _redirects(spark, chain + [
        ("u:c0", "u:L1"), ("u:L1", "u:L0"), ("u:L0", "u:L1"),
    ])
    rows = resolve_redirects(edges).collect()
    assert all(r["resolved_url"] == "u:L0" and r["is_loop"] for r in rows)


def test_resolve_redirects_normalizes_multivalued_src(spark):
    # two contradictory redirect records for the same src: min(dst) wins
    edges = _redirects(spark, [("u:a", "u:y"), ("u:a", "u:x")])
    got = {r["url"]: r["resolved_url"]
           for r in resolve_redirects(edges).collect()}
    assert got["u:a"] == "u:x"


# ---------------------------------------------------------------------------
# extract_jsonld — schema.org microdata blocks
# ---------------------------------------------------------------------------

def test_extract_jsonld_blocks_and_malformed(spark):
    docs = _docs(spark, [
        (
            "https://a.example.com/1",
            '<p>x</p>'
            '<script type="application/ld+json">'
            '{"@type": "Product", "name": "hash join"}</script>'
            '<script type="application/ld+json">'
            '{"@type": "Organization", "name": "acme"}</script>'
            # malformed json -> PERMISSIVE nulls -> dropped, not fatal
            '<script type="application/ld+json">{oops</script>'
            # missing name -> dropped
            '<script type="application/ld+json">'
            '{"@type": "Article"}</script>'
            # plain script (wrong type attr) -> never extracted
            '<script>var x = {"@type": "No", "name": "no"}</script>',
        ),
    ])
    got = {
        (r["url"], r["entity_type"], r["name"])
        for r in extract_jsonld(docs).collect()
    }
    assert got == {
        ("https://a.example.com/1", "Product", "hash join"),
        ("https://a.example.com/1", "Organization", "acme"),
    }


def test_extract_jsonld_plan_stays_jvm_side(spark):
    docs = _docs(spark, [("u", '<script type="application/ld+json">'
                               '{"@type": "T", "name": "n"}</script>')])
    plan = extract_jsonld(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_extract_jsonld_multiline_block(spark):
    """Real pages pretty-print JSON-LD across lines — the (?s) DOTALL
    flag must keep multi-line blocks extractable."""
    docs = _docs(spark, [(
        "https://a.example.com/2",
        '<script type="application/ld+json">\n'
        '{\n  "@type": "Product",\n  "name": "hash join"\n}\n'
        '</script>',
    )])
    got = [(r["entity_type"], r["name"])
           for r in extract_jsonld(docs).collect()]
    assert got == [("Product", "hash join")]
