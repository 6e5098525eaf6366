"""Connected components, canonicalization, and streaming tagging tests."""

import pytest
from pyspark.sql import functions as F


# threshold 0 forces the distributed star-contraction loop; the default
# takes the driver union-find fast path on graphs this small — both must
# produce identical min-id labelings
@pytest.mark.parametrize("threshold", [0, 1_000_000],
                         ids=["distributed", "unionfind"])
def test_connected_components_basic(spark, threshold):
    from onto_text_tag_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"),            # chain → comp a
            ("d", "e"),                        # pair → comp d
            ("f", "f"),                        # self loop (dropped; f isolated-ish)
            ("x", "y"), ("y", "z"), ("z", "x"),  # cycle → comp x
        ],
        ["src", "dst"],
    )
    comp = {r["node"]: r["comp"]
            for r in connected_components(
                edges, driver_threshold=threshold).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["x"] == comp["y"] == comp["z"] == "x"
    assert "f" not in comp  # only self-loop → no edges → not in node set


@pytest.mark.parametrize("threshold", [0, 1_000_000],
                         ids=["distributed", "unionfind"])
def test_connected_components_long_chain(spark, threshold):
    from onto_text_tag_spark.operators.components import connected_components

    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], ["src", "dst"]
    )
    comp = connected_components(edges, driver_threshold=threshold)
    assert comp.select("comp").distinct().count() == 1
    assert comp.count() == n + 1


def test_connected_components_paths_agree(spark):
    """Random graph: distributed and union-find labelings identical."""
    import random

    from onto_text_tag_spark.operators.components import connected_components

    rng = random.Random(3)
    edges = spark.createDataFrame(
        [(f"v{rng.randrange(200)}", f"v{rng.randrange(200)}")
         for _ in range(150)],
        ["src", "dst"],
    )
    dist = {(r["node"], r["comp"])
            for r in connected_components(edges, driver_threshold=0).collect()}
    uf = {(r["node"], r["comp"])
          for r in connected_components(edges).collect()}
    assert dist == uf


def test_canonicalize_surfaces(spark):
    from onto_text_tag_spark.operators.components import canonicalize_surfaces

    surfaces = spark.createDataFrame(
        [
            ("tobacco smoking",),
            ("tobacco-smoking",),
            ("tobacco  smoking",),
            ("smoking of tobacco",),
            ("caffeine",),
            ("ethanol",),
        ],
        ["surface"],
    )
    got = {
        r["surface"]: r["canonical"]
        for r in canonicalize_surfaces(surfaces, jaccard_threshold=0.5).collect()
    }
    # the three near-identical variants merge into one cluster
    variants = {"tobacco smoking", "tobacco-smoking", "tobacco  smoking"}
    canons = {got[v] for v in variants}
    assert len(canons) == 1
    # unrelated surfaces stay singleton (canonical = self)
    assert got["caffeine"] == "caffeine"
    assert got["ethanol"] == "ethanol"


def test_streaming_tagging_matches_batch(spark, tmp_path):
    from onto_text_tag_spark.corpus import documents_df, ontology_df
    from onto_text_tag_spark.dictionary import build_dictionary, resolve_collisions
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.streaming.incremental import (
        read_document_stream,
        start_mentions_sink,
        tag_stream,
    )

    docs = documents_df(spark, n_docs=30)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.parquet(src)

    dictionary = resolve_collisions(build_dictionary(ontology_df(spark)))
    stream = read_document_stream(spark, src)
    assert stream.isStreaming
    mentions = tag_stream(stream, dictionary)
    q = start_mentions_sink(mentions, out, ckpt)
    try:
        q.processAllAvailable()  # blocks until every input file is processed
    finally:
        q.stop()

    streamed = spark.read.parquet(out)
    batch = tag_documents(docs, dictionary)
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_stateful_streaming_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carries across
    micro-batches; a gap closes the session, a new one opens."""
    import time

    from pyspark.sql import functions as F

    from onto_text_tag_spark.streaming.incremental import sessionize_stream

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id string, ts timestamp"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # batch 1: two close events for u1, one for u2
    write_batch("b1", [
        ("u1", t0), ("u1", t0 + dt.timedelta(seconds=60)),
        ("u2", t0),
    ])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .start(checkpointLocation=ckpt)
    )
    try:
        q.processAllAvailable()
        open_rows = {
            r["user_id"]: r
            for r in spark.sql(
                "SELECT * FROM sess_test WHERE NOT closed"
            ).collect()
        }
        assert open_rows["u1"]["n_events"] == 2
        assert open_rows["u2"]["n_events"] == 1

        # batch 2: u1 event far beyond the gap -> closes session 1
        write_batch("b2", [("u1", t0 + dt.timedelta(seconds=7200))])
        q.processAllAvailable()

        closed = spark.sql(
            "SELECT * FROM sess_test WHERE closed"
        ).collect()
        assert len(closed) == 1
        c = closed[0]
        assert c["user_id"] == "u1" and c["n_events"] == 2
        assert c["session_start"] == t0
        reopened = [
            r
            for r in spark.sql(
                "SELECT * FROM sess_test WHERE NOT closed"
            ).collect()
            if r["user_id"] == "u1" and r["n_events"] == 1
        ]
        assert reopened, "new open session for u1 after the gap"
    finally:
        q.stop()
