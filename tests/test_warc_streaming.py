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


def test_streaming_warc_crawl_sink_dedup_gated_kg(spark, tmp_path):
    """The full production composition: raw Common-Crawl-style archives
    land in a drop directory → ONE continuous sink dedups each batch,
    absorbs only survivors into the KG, and retracts demotions
    (``start_crawl_sink``).  P1 extraction is materialized on the
    stream (``extract_texts`` — narrow ops, streaming-legal) so the
    dedup gate fingerprints the same byte-identical text the tagger
    sees.  Pins: cross-drop exact mirror pages never enter the KG, and
    the final live KG equals a batch build over the live deduped
    corpus."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import cooccurrence_edges
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.dedup_absorb import read_deduped
    from onto_text_tag_spark.plans.kg_absorb import read_live_triples
    from onto_text_tag_spark.plans.kg_pipeline import (
        extract_texts,
        mention_triples,
    )
    from onto_text_tag_spark.sources.warc import (
        read_warc_document_stream,
        write_warc_shards,
    )
    from onto_text_tag_spark.streaming.incremental import (
        init_crawl_root,
        start_crawl_sink,
    )

    docs = distributed_documents_df(spark, 120, seed=23, partitions=2) \
        .select("url", "warc_ts", "html")
    docs.cache().count()
    b0 = docs.where(F.crc32("url") % 2 == 0)
    mirrors = b0.sort("url").limit(3) \
        .withColumn("url", F.concat("url", F.lit("?mirror")))
    mirror_urls = {r["url"] for r in mirrors.select("url").collect()}
    b1 = docs.where(F.crc32("url") % 2 == 1).unionByName(mirrors)

    incoming = str(tmp_path / "incoming")
    import os
    os.makedirs(incoming)
    root = str(tmp_path / "crawlroot")
    ckpt = str(tmp_path / "ckpt")
    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    init_crawl_root(
        spark, root, onto,
        "url string, warc_ts timestamp, html binary, text string")

    for i, batch in enumerate((b0, b1)):
        d = str(tmp_path / f"shards{i}")
        write_warc_shards(batch.repartition(1), d).collect()
        import shutil
        shutil.copy(os.path.join(d, "seg-00000.warc.gz"),
                    os.path.join(incoming, f"drop{i}.warc.gz"))
        stream = extract_texts(read_warc_document_stream(spark, incoming))
        q = start_crawl_sink(stream, root, dict_rows, ckpt, lang=None)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    dedup_root = os.path.join(root, "dedup")
    kg_root = os.path.join(root, "kg")
    live = read_deduped(spark, dedup_root).cache()
    live_urls = {r["url"] for r in live.select("url").collect()}
    assert not (mirror_urls & live_urls)  # the gate dropped the mirrors
    assert len(live_urls) > 0

    m = tag_documents(live, dict_rows)
    want_mentions = {
        (r.subj, r.obj)
        for r in mention_triples(m).select("subj", "obj").collect()
    }
    want_edges = {tuple(r) for r in cooccurrence_edges(m).collect()}
    live.unpersist()
    triples = read_live_triples(spark, kg_root)
    got_mentions = {
        (r.subj, r.obj)
        for r in triples.where("pred = 'mentions'").collect()
    }
    got_edges = {
        (r.subj, r.obj, r.weight)
        for r in triples.where("pred = 'co_occurs_with'").collect()
    }
    assert got_mentions == want_mentions
    assert got_edges == want_edges
    assert len(got_edges) > 0
