"""N-Triples sink/source (sources/ntriples.py): spec shape + lossless
roundtrip over the engine's triple value space."""

import re

from pyspark.sql import functions as F

from onto_text_tag_spark.session import local_df
from onto_text_tag_spark.sources.ntriples import (
    OBO_BASE,
    VOCAB_BASE,
    read_ntriples,
    triples_to_ntriples,
    write_ntriples,
)

SCHEMA = "subj string, pred string, obj string, weight long"

ROWS = [
    # url-subject mention triple (weightless)
    ("https://example.com/a?q=1", "mentions", "OP:0002", None),
    # CURIE-CURIE weighted co-occurrence edge
    ("OP:0002", "co_occurs_with", "STREAM:0001", 374),
    # is-a edge
    ("OP:0003", "is_a", "OP:0002", None),
    # adversarial ids: IRI-forbidden chars + a pre-existing percent escape
    ('doc with space"and<quote>', "mentions", "ML:0001", None),
    ("https://example.com/a%20b|c", "mentions", "ML:0001", 7),
]


def test_line_shapes(spark):
    lines = {
        r["value"]
        for r in triples_to_ntriples(local_df(spark, ROWS, SCHEMA)).collect()
    }
    assert (
        f"<https://example.com/a?q=1> <{VOCAB_BASE}mentions> "
        f"<{OBO_BASE}OP_0002> ." in lines
    )
    assert (
        f"<{OBO_BASE}OP_0002> <{VOCAB_BASE}co_occurs_with> "
        f"<{OBO_BASE}STREAM_0001> ." in lines
    )
    # weighted edge additionally carries ONE RDF-star annotation line
    assert (
        f"<< <{OBO_BASE}OP_0002> <{VOCAB_BASE}co_occurs_with> "
        f"<{OBO_BASE}STREAM_0001> >> <{VOCAB_BASE}weight> "
        '"374"^^<http://www.w3.org/2001/XMLSchema#long> .' in lines
    )
    # 5 base lines + 2 weight lines
    assert len(lines) == 7
    # every line is pure N-Triples surface syntax: IRIs contain no
    # forbidden characters
    for ln in lines:
        for iri in re.findall(r"<([^<>]*)>", ln):
            assert not set(iri) & set(' <"{}|^`\\'), iri


def test_roundtrip_lossless(spark, tmp_path):
    df = local_df(spark, ROWS, SCHEMA)
    path = str(tmp_path / "nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_export_of_real_pipeline_triples(spark, tmp_path):
    from onto_text_tag_spark.driver_queries import q_kg_cooccur

    edges = q_kg_cooccur(spark, "/root/testdata/sf0.001")
    triples = edges.select(
        F.col("src").alias("subj"),
        F.lit("co_occurs_with").alias("pred"),
        F.col("dst").alias("obj"),
        F.col("weight"),
    )
    path = str(tmp_path / "nt")
    write_ntriples(triples, path)
    back = read_ntriples(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, triples.collect())
    )
