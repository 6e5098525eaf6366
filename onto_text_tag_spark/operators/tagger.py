"""Dictionary tagging: documents → mention rows (F2 + W1 + J1).

Reference behavior: OGER exact-dictionary tagging per request
(app.py:57-60,681-708) / spaCy PhraseMatcher with ``attr='LOWER'`` and
``filter_spans`` overlap resolution (ontotagtext.py:110-141).  One
document row fans out to N mention rows — UDTF-shaped, so the Spark
surface is ``mapInPandas`` (Arrow-batched, no per-row Python at the
JVM↔Python boundary).

Physical design for 10^12-document scale:

* The compiled Aho–Corasick automaton (surface → linked term entry) is
  built ONCE on the driver from the collision-resolved dictionary and
  shipped with ``sc.broadcast`` — one copy per executor, not per task.
  Entity linking (J1) therefore happens inline during matching: the
  payload already carries (curie, pref_label, ont), so no separate
  shuffle-join against the dictionary is needed on the fact-table side.
* Tagging is embarrassingly parallel: no shuffle, pipelined with the
  parquet scan; column pruning keeps ``html:binary`` unread when ``text``
  is already materialized.
* Output partitioning: mentions inherit input file-split partitioning;
  downstream aggregations repartition by their own keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from onto_text_tag_spark.functions.aho_corasick import (
    TokenIndexMatcher,
    build_matcher,
    filter_spans,
)
from onto_text_tag_spark.schemas import MENTIONS

# Arrow-friendly output schema of the tagging stage (FIXTURES.md §4).
MENTION_COLUMNS = ["url", "begin", "end", "span_text", "curie", "pref_label", "ont"]


def compile_dictionary(dictionary_rows) -> TokenIndexMatcher:
    """(surface, curie, name, ont) rows → matcher (token-indexed; same
    match semantics as the Aho–Corasick reference implementation, ~15x
    faster per document — equivalence is property-tested).

    ``dictionary_rows``: iterable of dict-like rows with at least
    ``surface``, ``id``, ``name``, ``ont`` (build_dictionary output after
    resolve_collisions — one concept per surface, A5).
    """
    return build_matcher(
        (row["surface"], (row["id"], row["name"], row["ont"]))
        for row in dictionary_rows
    )


def tag_text(automaton: TokenIndexMatcher, url: str, text: str) -> list[tuple]:
    """Tag one document: match, resolve overlaps (W1), emit mention rows."""
    if not text:
        return []
    candidates = automaton.find(text)
    resolved = filter_spans(candidates)
    return [
        (url, begin, end, text[begin:end], payload[0], payload[1], payload[2])
        for begin, end, _pattern, payload in resolved
    ]


def tag_documents(
    documents: DataFrame,
    dictionary: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    html_col: str | None = None,
    warc_mode: bool = False,
) -> DataFrame:
    """documents(url, text) × dictionary → mentions DataFrame.

    The dictionary DF is collected to the driver (it is small by
    construction — SURVEY.md §1.1 pins it at broadcast scale), compiled,
    and broadcast; matching runs in ``mapInPandas`` batches.

    ``html_col``: tag straight from raw HTML — P1 extraction
    (byte-identical ``extract_text``) runs INSIDE the tagging batch, so
    the raw-HTML production path crosses the JVM↔Python Arrow boundary
    once instead of twice (extract UDF then tag) and the intermediate
    text column is never shipped back to the JVM.

    ``warc_mode``: ``documents`` is a ``binaryFile`` scan of WARC crawl
    archives (path, content); record parse + P1 extraction + tagging all
    run inside ONE batch, so the only Arrow traffic is raw archive bytes
    in and small mention rows out — the decompressed corpus (~4× the
    archive) never crosses back to the JVM.
    """
    spark = documents.sparkSession
    if isinstance(dictionary, DataFrame):
        rows = dictionary.select("surface", "id", "name", "ont").collect()
    else:  # pre-collected rows (driver-side dictionaries skip the Spark job)
        rows = dictionary
    automaton = compile_dictionary(rows)
    bc = spark.sparkContext.broadcast(automaton)

    if warc_mode:
        from onto_text_tag_spark.functions.html_extract import extract_text
        from onto_text_tag_spark.sources.warc import parse_warc_file

        def tag_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            ac = bc.value
            for batch in batches:
                out: list[tuple] = []
                for fpath, content in zip(batch["path"], batch["content"]):
                    gz = str(fpath).endswith(".gz")
                    for rec in parse_warc_file(bytes(content), gzipped=gz):
                        if rec["warc_type"] != "response" or not rec["url"]:
                            continue
                        html = rec["html"].decode("utf-8", errors="replace")
                        out.extend(
                            tag_text(ac, rec["url"], extract_text(html)))
                        if len(out) >= 50_000:
                            yield pd.DataFrame(out, columns=MENTION_COLUMNS)
                            out = []
                if out:
                    yield pd.DataFrame(out, columns=MENTION_COLUMNS)

        source = documents.select("path", "content")
        return source.mapInPandas(tag_batches, schema=MENTIONS)

    if html_col is not None:
        from onto_text_tag_spark.functions.html_extract import extract_text

        def tag_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ac = bc.value
            for batch in batches:
                out: list[tuple] = []
                for url, html in zip(batch[id_col], batch[html_col]):
                    if html is None:
                        continue
                    if isinstance(html, (bytes, bytearray, memoryview)):
                        html = bytes(html).decode("utf-8", errors="replace")
                    out.extend(tag_text(ac, url, extract_text(html)))
                yield pd.DataFrame(out, columns=MENTION_COLUMNS)

        source = documents.select(
            F.col(id_col).cast("string").alias(id_col), F.col(html_col)
        )
        return source.mapInPandas(tag_batches, schema=MENTIONS)

    def tag_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = bc.value
        for batch in batches:
            out: list[tuple] = []
            for url, text in zip(batch[id_col], batch[text_col]):
                if text is not None:
                    out.extend(tag_text(ac, url, text))
            yield pd.DataFrame(out, columns=MENTION_COLUMNS)

    source = documents.select(
        F.col(id_col).cast("string").alias(id_col), F.col(text_col)
    )
    return source.mapInPandas(tag_batches, schema=MENTIONS)
