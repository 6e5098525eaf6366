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

from onto_text_tag_spark.functions.html_extract import (
    _fast_text,
    extract_text,
    strip_tags,
)

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
    assert extract_text(html) == expected


# Cases chosen to hit every fast-path branch AND every bail condition:
# CDATA elements (incl. mixed case, unterminated, self-closing, embedded
# markup), comments (incl. the '--!>' non-close), doctype, malformed tags,
# bare '<'/'&', the trailing truncated-charref drop window, attr quoting
# with '>' inside, and entity edge cases.
FAST_VS_SLOW = [
    "", "plain text", "a < b & c > d", "x &amp; y &lt;z&gt; &#65;&#x42;",
    "<p>a</p><p>b</p>", "<P CLASS='x'>mixed</P>", "<br/><hr />",
    '<a href="x>y">q</a>', "<a href='h&amp;q'>r</a>",
    "<!DOCTYPE html><html>t</html>", "<!doctype other junk>x",
    "<!-- comment -->after", "<!-- unterminated", "<!--a--!>b-->c",
    '<script>var a = "&amp;<p>";</script>tail',
    "<STYLE media=x>.a{}</Style>rest", "<script>never closed",
    "<script src='x'/>after", "<script defer>a</script>b",
    "</bogus attr>x", "</>y", "</ spaced>z", "<1invalid>w",
    "trailing &amp", "trailing &am", "trailing &nbsp",
    "trailing & done", "mid &amp chunk<p>x</p>", "&incomplete",
    "x<", "x<p", "x<p class='y", "x &#", "&#x41;&#65 y",
    "<p>a \\x1f b \\u0041 c</p>", "<div d>bare</div>",
    "<t a=>empty</t>", "<t a==b>dd</t>", "<t a = 'q' >s</t>",
    "&" * 40, "&;" * 20, "a&b;c", "text &unknownentity; more",
    "<p>" + "&amp;" * 50 + "</p>", "<x y='a<b'>q</x>",
    "<p>uppercase &AMP; &Amp;</p>", "\\xff\\uffff",
    "<script>a</script x>b</script>c",
    "<p>nested <b>bold <i>italic</i></b> done</p>",
    "<!-- <script>x</script> -->y", "<script>//<!-- hide\nx</script>y",
    "<!doctype a <!-- b --> c>z", '<p title="<script>a</script>">q</p>',
    "<scriptx>not cdata</scriptx>", "<style>a</style><style>b</style>c",
    "pre<script>mid</script>", "<script></script>empty",
    "<SCRIPT>up</script>ok", "<script>low</SCRIPT>ok",
    "a<p>b", "a<p>b&amp", "a<p>b&amp x", "end with construct<p>",
]


@pytest.mark.parametrize("html", FAST_VS_SLOW)
def test_fast_path_byte_identical(html):
    assert extract_text(html) == strip_tags(html)


def test_fast_path_covers_synthetic_corpus():
    """The synthetic corpus must take the fast path (perf guard): a
    regression here silently re-routes 100% of extraction through the
    ~5x slower HTMLParser."""
    from onto_text_tag_spark.corpus import synth_row

    for i in range(200):
        html = synth_row(i, seed=42, min_sents=2, max_sents=8,
                         filler_prob=0.8)["html"].decode()
        fast = _fast_text(html)
        assert fast is not None, html[:120]
        parser_equal = strip_tags(html)
        # _fast_text output feeds the same literal-escape subs, so compare
        # through the public function
        assert extract_text(html) == parser_equal


def test_fast_vs_slow_piece_fuzz():
    """Compose random documents from markup shards (incl. malformed ones)
    and require byte-equality between the fast path + fallback and the
    reference-exact HTMLParser path."""
    rng = random.Random(99)
    pieces = [
        "<p>", "</p>", '<div class="x">', "&amp;", "&lt;", "&#65;", "hello",
        "smoke &amp; fire", r"\x1f", "é", "<br/>", "<!-- c -->",
        "<script>var a=1;</script>", "café", '<a href="u">link</a>',
        "text with \\x00 literal", "<b", ">>", "&nbsp;", "<![CDATA[x]]>",
        "</", "<>", "a<b>c", "&unknown;", "\\uABCD tail", "&", ";", "--",
        '<meta charset="utf-8">', "\n\t ", "ümlaut", "<td>1</td><td>2</td>",
        "<style>.a{}</style>", "&#x41;", "<?php ?>", "<!DOCTYPE html>",
        "<script>", "</script>", "<style>", "</style>", "-->", "<!--",
        "&am", "&#x", "<p", ">", "<",
    ]
    for _ in range(3000):
        html = "".join(rng.choices(pieces, k=rng.randint(1, 30)))
        assert extract_text(html) == strip_tags(html), repr(html)


def test_fast_vs_slow_hypothesis_chars():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("<>&;/!-\"'= \npbscriptyle0aA\\xu#"))

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=120))
    def check(html):
        assert extract_text(html) == strip_tags(html)

    check()


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
        expected = ref_strip(html)
        assert strip_tags(html) == expected
        assert extract_text(html) == expected  # fast path, same oracle


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
