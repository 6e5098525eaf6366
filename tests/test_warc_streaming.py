"""Streaming WARC ingest: crawl archives landing in a directory flow
through the continuous-KG foreachBatch sink.

Composes sources/warc.py's record parse (stateless mapInPandas — legal
on streaming DataFrames) with streaming/incremental.py's exactly-once
absorb commits: archives arrive → documents micro-batch → delta tag →
file-append mention triples + pair-keyed co-occurrence merge.  Pins
the stream-built KG equal to the batch build over the union corpus.
"""

import os
import shutil

import pytest


@pytest.fixture(scope="module")
def warc_batches(tmp_path_factory, spark):
    """Two WARC shard batches (.gz) + the same docs as a DataFrame."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import distributed_documents_df
    from onto_text_tag_spark.sources.warc import write_warc_shards

    tmp = tmp_path_factory.mktemp("warcstream")
    docs = distributed_documents_df(spark, 150, seed=19, partitions=2)
    docs.cache().count()
    b0 = docs.where(F.crc32("url") % 2 == 0).repartition(1)
    b1 = docs.where(F.crc32("url") % 2 == 1).repartition(1)
    d0, d1 = str(tmp / "b0"), str(tmp / "b1")
    write_warc_shards(b0, d0).collect()
    write_warc_shards(b1, d1).collect()
    return {"docs": docs, "b0": os.path.join(d0, "seg-00000.warc.gz"),
            "b1": os.path.join(d1, "seg-00000.warc.gz"), "tmp": str(tmp)}


def test_streaming_warc_ingest_builds_full_kg(spark, warc_batches):
    """Archives dropped into the watched directory build the same KG as
    the batch pipeline over all documents (no lang filter: WARC records
    carry no lang column, so the absorb tags every page)."""
    from onto_text_tag_spark.corpus import mini_ontology
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import (
        cooccurrence_edges,
        doc_term_arrays,
    )
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.kg_absorb import init_kg_root
    from onto_text_tag_spark.sources.warc import read_warc_document_stream
    from onto_text_tag_spark.streaming.incremental import (
        start_kg_update_sink,
    )

    tmp = warc_batches["tmp"]
    incoming = os.path.join(tmp, "incoming")
    os.makedirs(incoming, exist_ok=True)
    kg_root = os.path.join(tmp, "kgroot")
    ckpt = os.path.join(tmp, "ckpt")

    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    init_kg_root(spark, kg_root, onto)

    shutil.copy(warc_batches["b0"], os.path.join(incoming, "b0.warc.gz"))
    q = start_kg_update_sink(
        read_warc_document_stream(spark, incoming), kg_root, dict_rows,
        ckpt)
    try:
        q.processAllAvailable()
        shutil.copy(warc_batches["b1"],
                    os.path.join(incoming, "b1.warc.gz"))
        q.processAllAvailable()
    finally:
        q.stop()

    mentions = tag_documents(warc_batches["docs"], dict_rows)
    want_mention_triples = {
        (r.url, t)
        for r in doc_term_arrays(mentions).collect() for t in r._terms
    }
    want_edges = {
        tuple(r) for r in cooccurrence_edges(mentions).collect()
    }
    triples = spark.read.parquet(os.path.join(kg_root, "triples", "data"))
    got_mention_triples = {
        (r.subj, r.obj)
        for r in triples.where("pred = 'mentions'").collect()
    }
    got_edges = {
        (r.subj, r.obj, r.weight)
        for r in triples.where("pred = 'co_occurs_with'").collect()
    }
    assert got_mention_triples == want_mention_triples
    assert got_edges == want_edges
    assert len(got_edges) > 0
