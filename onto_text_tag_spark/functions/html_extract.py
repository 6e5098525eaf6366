"""Boilerplate-stripping HTML → text extraction.

Hard contract (BASELINE.json ``input_hint``): output must be byte-identical
per url to the reference extractor ``strip_tags`` at app.py:259-277, which

1. feeds the HTML through a non-strict ``html.parser.HTMLParser`` with
   ``convert_charrefs=True`` and keeps only text nodes (``handle_data``),
2. deletes every *literal* ``\\xNN``-shaped sequence — regex ``r'\\\\x..'``
   matches a real backslash, the letter x, and any two characters
   (app.py:275), and
3. deletes every literal ``\\uNNNN``-shaped sequence — ``r'\\\\u....'``
   (app.py:276).

Steps 2-3 clean up escape artifacts left behind by ``str()``-ified Entrez
XML payloads; they operate on *literal backslashes in the text*, not on
encodings. We reproduce all three steps exactly.

The Spark surface is an Arrow-vectorized pandas UDF so the per-document
Python work is batched (no per-row Python, per input_hint). HTML parsing
is genuinely row-local, so this is the correct — not merely acceptable —
placement: no shuffle, pipelined with the scan.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_LITERAL_X_ESCAPE = re.compile(r"\\x..")
_LITERAL_U_ESCAPE = re.compile(r"\\u....")


class _TextOnlyParser(HTMLParser):
    """Accumulates text nodes only; tolerant of malformed markup.

    Mirrors the reference MLStripper (app.py:259-269): strict=False,
    convert_charrefs=True (entities like ``&amp;`` decode before
    handle_data fires), tags/comments/declarations discarded.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.strict = False
        self._buf = StringIO()

    def handle_data(self, data: str) -> None:
        self._buf.write(data)

    def text(self) -> str:
        return self._buf.getvalue()


def strip_tags(html: str) -> str:
    """Byte-identical re-derivation of the reference extractor.

    Reference: app.py:271-277 (strip_tags) over MLStripper app.py:259-269.
    """
    parser = _TextOnlyParser()
    parser.feed(html)
    out = parser.text()
    out = _LITERAL_X_ESCAPE.sub("", out)
    out = _LITERAL_U_ESCAPE.sub("", out)
    return out


# ---------------------------------------------------------------------------
# Fast path.  ``strip_tags`` above is the reference-exact oracle, but
# ``html.parser`` walks the document in interpreted Python (~0.5 ms for a
# realistic 6 KB page) and extraction is >70% of the tagging stage's CPU.
# The profile of ``HTMLParser.goahead`` with ``convert_charrefs=True``, no
# ``close()`` (the reference never calls it, app.py:272-273), and only
# *clean* markup reduces to exactly:
#
#   * split the document at each '<' that opens a well-formed construct;
#   * each inter-tag segment is emitted as ``unescape(segment)``
#     (parser.py:161-162 of CPython 3.11's html/parser.py);
#   * clean start/end tags, comments (dropped via handle_comment),
#     doctype declarations, and PIs emit no data;
#   * a ``<script>``/``<style>`` start tag enters CDATA mode: everything
#     up to the first ``</script\s*>`` (case-insensitive) is emitted RAW
#     — no charref conversion (parser.py:152-164);
#   * the final segment (after the last '<'-construct) is ONLY emitted
#     when it cannot end in a truncated charref: goahead's buffered-feed
#     guard drops it if an '&' occurs in the last 34 chars with no
#     whitespace/';' after it (parser.py:139-151) — and because the
#     reference never closes the parser, that buffered tail is dropped
#     FOREVER, which we must reproduce.
#
# The fast path recognizes a conservative subset of constructs whose
# behavior provably equals the above, entirely with C-engine regex passes.
# ANY '<' not consumed by a clean construct makes ``_fast_text`` return
# None and the caller falls back to the exact HTMLParser path — so the
# fast path can only ever be byte-identical (equivalence is additionally
# golden- and fuzz-tested in tests/test_html_extract.py).
# ---------------------------------------------------------------------------

# Attributes: name (letter/underscore/colon start), optional value that is
# quoted (no quote/'<'/'&' inside — supersets bail) or bare from a charset
# that excludes '/', '>', '&', whitespace.  Subset of CPython's
# locatestarttagend_tolerant + attrfind_tolerant: everything this matches,
# HTMLParser parses to the same end position with no data emitted.
_ATTRS = (
    r"(?:\s+[a-zA-Z_:][\-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<&]*\"|'[^'<&]*'|[\-a-zA-Z0-9_.:%#?=~+]*))?)*\s*"
)

# Pass 1 splits out the construct kinds whose *content spans matter*
# (CDATA elements keep raw content; comments/doctypes drop theirs) in one
# left-to-right C scan — leftmost-match order is exactly the order the
# parser discovers constructs, so e.g. a '<script>' inside a comment is
# consumed by the comment alternative first, as HTMLParser would.
_SPLIT_RE = re.compile(
    r"<(?:"
    r"!--.*?--\s*>"  # comment: consumed to the first '--\s*>'
    r"|!doctype[^>]*>"  # doctype: first '>' past '<!doctype'
    # script/style element: clean start tag, raw content up to the FIRST
    # case-insensitive </name\s*> (the parser's set_cdata_mode
    # "interesting" regex, parser.py:124); re.I makes the backref
    # case-insensitive like the parser's scan
    r"|(?P<cname>script|style)" + _ATTRS + r">(?P<ccontent>.*?)"
    r"</\s*(?P=cname)\s*>"
    r")",
    re.IGNORECASE | re.DOTALL,
)

# Pass 2 (per chunk): clean start/end tags.  script/style start tags are
# EXCLUDED (negative lookahead): if one survived pass 1 its element is
# unterminated or otherwise unclean, and the leftover '<' forces the
# count-mismatch bail below.
_TAGS_RE = re.compile(
    r"<(?:"
    r"(?!(?:script|style)(?![\-a-zA-Z0-9]))[a-zA-Z][\-a-zA-Z0-9]*"
    + _ATTRS
    + r"/?>"
    r"|/[a-zA-Z][\-.a-zA-Z0-9:_]*\s*>"  # subset of endtagfind, parser.py:58
    r")",
    re.IGNORECASE,
)

_WS_OR_SEMI = re.compile(r"[\s;]")


def _fast_text(html: str) -> str | None:
    """Concatenated text nodes of ``html`` — byte-identical to feeding the
    reference parser — or None when the markup leaves the proven-clean
    subset and the caller must run the real ``HTMLParser``.

    Per-document work is three C-level regex passes (split / subn / split)
    plus ``unescape`` on the segments that contain '&'; replacing every
    clean tag with a lone '<' sentinel and splitting on it means ANY
    unconsumed '<' (malformed tag, bare less-than, construct pass 1 broke
    by over-matching) shows up as a segment-count mismatch → fallback.
    """
    pieces = _SPLIT_RE.split(html)
    parts: list[str] = []
    last = len(pieces) - 1
    for idx in range(0, len(pieces), 3):
        chunk = pieces[idx]
        if chunk:
            flat, n = _TAGS_RE.subn("<", chunk)
            segs = flat.split("<")
            if len(segs) != n + 1:
                return None
            if idx == last:
                tail = segs.pop()
            parts.extend(
                [s if "&" not in s else unescape(s) for s in segs if s]
            )
            if idx == last and tail:
                # goahead's truncated-charref guard: with no close(), a
                # final data run whose last-34-char window has an '&' not
                # followed by [\s;] is buffered and never emitted
                # (parser.py:139-151) — dropped forever by the reference
                amppos = tail.rfind("&", max(0, len(tail) - 34))
                if amppos < 0 or _WS_OR_SEMI.search(tail, amppos):
                    parts.append(unescape(tail))
        if idx + 2 <= last:
            content = pieces[idx + 2]
            if content is not None:
                parts.append(content)  # CDATA content: raw, never unescaped
    return "".join(parts)


def extract_text(html: str) -> str:
    """Fast extractor with guaranteed-identical fallback.

    Output is byte-identical to ``strip_tags`` (the app.py:271-277
    re-derivation) on ALL inputs: clean markup takes the single-regex-pass
    fast path (~20x cheaper), anything unproven falls back to the real
    ``HTMLParser``.
    """
    out = _fast_text(html)
    if out is None:
        parser = _TextOnlyParser()
        parser.feed(html)
        out = parser.text()
    if "\\" not in out:  # both escape regexes require a literal backslash
        return out
    out = _LITERAL_X_ESCAPE.sub("", out)
    return _LITERAL_U_ESCAPE.sub("", out)


def _extract_series(html: pd.Series) -> pd.Series:
    def one(value) -> str | None:
        if value is None:
            return None
        if isinstance(value, (bytes, bytearray, memoryview)):
            value = bytes(value).decode("utf-8", errors="replace")
        return extract_text(value)

    return html.map(one)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """``html: binary|string`` column → extracted text, Arrow-batched."""
    return _extract_series(html)
