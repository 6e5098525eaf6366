"""Golden + differential tests for the byte-identical HTML extractor (P1).

Contract: output byte-identical per url to the reference ``strip_tags``
(app.py:259-277). Golden pairs are self-contained; the differential fuzz
additionally execs the reference extractor from /root/reference when that
snapshot is present (skipped otherwise so the repo stands alone).
"""

import os
import random
import re

import pytest

from onto_text_tag_spark.functions.html_extract import strip_tags

GOLDEN = [
    # (html, expected text)
    ("<p>Hello</p>", "Hello"),
    ("<p>A &amp; B</p>", "A & B"),
    ("&#65;&#x42;", "AB"),
    ("no tags at all", "no tags at all"),
    ("<div><b>bold</b> plain <i>ital</i></div>", "bold plain ital"),
    ("<script>var x=1;</script>after", "var x=1;after"),  # HTMLParser keeps script data
    ("<!-- comment -->kept", "kept"),
    ("literal \\x0f here", "literal  here"),
    ("literal \\uABCD here", "literal  here"),
    ("\\xZZ also removed (any two chars)", " also removed (any two chars)"),
    ("broken <tag never closes", "broken "),
    ("unicode café stays", "unicode café stays"),
    ("nested <a href='u'>link text</a>.", "nested link text."),
    ("&nbsp;spaced", "\xa0spaced"),
    ("", ""),
]


@pytest.mark.parametrize("html,expected", GOLDEN)
def test_golden_pairs(html, expected):
    assert strip_tags(html) == expected


REFERENCE_APP = "/root/reference/app.py"


@pytest.mark.skipif(not os.path.exists(REFERENCE_APP), reason="reference absent")
def test_differential_vs_reference():
    src = open(REFERENCE_APP).read()
    block = src[src.index("from io import StringIO") : src.index("# page with button")]
    ns = {"re": re}
    exec(block, ns)  # stdlib-only extractor lines
    ref_strip = ns["strip_tags"]

    rng = random.Random(7)
    pieces = [
        "<p>", "</p>", '<div class="x">', "&amp;", "&lt;", "&#65;", "hello",
        "smoke &amp; fire", r"\x1f", "é", "<br/>", "<!-- c -->",
        "<script>var a=1;</script>", "café", '<a href="u">link</a>',
        "text with \\x00 literal", "<b", ">>", "&nbsp;", "<![CDATA[x]]>",
        "</", "<>", "a<b>c", "&unknown;", "\\uABCD tail",
        '<meta charset="utf-8">', "\n\t ", "ümlaut", "<td>1</td><td>2</td>",
        "<style>.a{}</style>", "&#x41;", "<?php ?>", "<!DOCTYPE html>",
    ]
    for _ in range(2000):
        html = "".join(rng.choices(pieces, k=rng.randint(1, 30)))
        assert strip_tags(html) == ref_strip(html)


def test_spark_udf_matches_local(spark):
    """extract_text_udf over the synthetic corpus == stored text column."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import documents_df
    from onto_text_tag_spark.functions.html_extract import extract_text_udf

    docs = documents_df(spark, n_docs=50)
    mismatches = (
        docs.withColumn("re_extracted", extract_text_udf(F.col("html")))
        .where(F.col("re_extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0
