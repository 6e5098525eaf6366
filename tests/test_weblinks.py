"""Web link-graph extraction (operators/weblinks.py): resolution policy,
anchor-text stripping, host aggregation — all JVM-side (plan pinned)."""

import pytest

from onto_text_tag_spark.operators.weblinks import (
    extract_links,
    host_graph,
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
