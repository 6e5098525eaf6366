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


def _extract_series(html: pd.Series) -> pd.Series:
    def one(value) -> str | None:
        if value is None:
            return None
        if isinstance(value, (bytes, bytearray, memoryview)):
            value = bytes(value).decode("utf-8", errors="replace")
        return strip_tags(value)

    return html.map(one)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """``html: binary|string`` column → extracted text, Arrow-batched."""
    return _extract_series(html)
