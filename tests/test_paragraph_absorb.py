"""Incremental paragraph-dedup absorb (plans/paragraph_absorb.py):
absorb-equals-batch, replay idempotence, within-batch collapse."""

from pyspark.sql import functions as F

DOC_SCHEMA = "url string, text string, lang string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


BATCH_A = [
    ("a01", "Accept all cookies\nalpha body one", "en"),
    ("a02", "accept ALL   cookies\nbeta body two\nshared footer", "en"),
    ("a03", "", "en"),
]
BATCH_B = [
    ("b01", "Accept all cookies\nshared footer\nfresh gamma body", "en"),
    ("b02", "fresh gamma body\ndelta body four", "de"),
]


def test_absorb_equals_batch_and_replay_noop(spark, tmp_path):
    from onto_text_tag_spark.operators.dedup import paragraph_dedup
    from onto_text_tag_spark.plans.paragraph_absorb import (
        absorb_paragraph_batch,
        init_paragraph_root,
        read_para_deduped,
    )

    root = str(tmp_path / "para_root")
    init_paragraph_root(spark, root, DOC_SCHEMA)

    r1 = absorb_paragraph_batch(
        spark, root, _docs(spark, BATCH_A), "fp-A")
    assert r1["status"] == "committed"
    r2 = absorb_paragraph_batch(
        spark, root, _docs(spark, BATCH_B), "fp-B")
    assert r2["status"] == "committed"

    # batch twin: paragraph_dedup over the union corpus (ids of B sort
    # after A — the append-only crawl ordering the contract assumes)
    union = _docs(spark, BATCH_A + BATCH_B)
    expected = {
        r["url"]: r
        for r in paragraph_dedup(union, id_col="url").collect()
    }
    live = {r["url"]: r for r in read_para_deduped(spark, root).collect()}
    assert set(live) == set(expected)
    for url, exp in expected.items():
        got = live[url]
        assert got["text"] == exp["text"], url
        assert got["n_paragraphs"] == exp["n_paragraphs"], url
        assert got["n_kept"] == exp["n_kept"], url
    # non-text delta columns ride along
    assert live["b02"]["lang"] == "de"

    # replay of an already-committed batch is a no-op
    r3 = absorb_paragraph_batch(
        spark, root, _docs(spark, BATCH_B), "fp-B")
    assert r3["status"] == "noop_already_committed"
    assert read_para_deduped(spark, root).count() == len(live)

    # digest store grew by exactly the distinct new paragraphs
    n_digests = (
        spark.read.parquet(f"{root}/para_digests/data").count()
    )
    distinct_paras = (
        union.select(
            F.explode(
                F.expr(
                    "filter(transform(split(text, '\\n'), x -> trim(x)),"
                    " x -> x != '')"
                )
            ).alias("p")
        )
        .select(F.lower(F.regexp_replace(F.trim("p"), "\\s+", " ")))
        .distinct()
        .count()
    )
    assert n_digests == distinct_paras


def test_within_batch_duplicates_collapse(spark, tmp_path):
    from onto_text_tag_spark.plans.paragraph_absorb import (
        absorb_paragraph_batch,
        init_paragraph_root,
        read_para_deduped,
    )

    root = str(tmp_path / "para_root2")
    init_paragraph_root(spark, root, DOC_SCHEMA)
    batch = [
        ("c01", "same line\nsame line\nother line", "en"),
        ("c02", "same line\nsecond doc", "en"),
    ]
    absorb_paragraph_batch(spark, root, _docs(spark, batch), "fp-C")
    live = {r["url"]: r for r in read_para_deduped(spark, root).collect()}
    assert live["c01"]["text"] == "same line\nother line"
    assert live["c02"]["text"] == "second doc"


def test_streaming_paragraph_sink_equals_batch(spark, tmp_path):
    from onto_text_tag_spark.operators.dedup import paragraph_dedup
    from onto_text_tag_spark.plans.paragraph_absorb import (
        init_paragraph_root,
        read_para_deduped,
    )
    from onto_text_tag_spark.sinks import read_manifest
    from onto_text_tag_spark.streaming.incremental import (
        start_paragraph_update_sink,
    )

    root = str(tmp_path / "para_stream_root")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    init_paragraph_root(spark, root, DOC_SCHEMA)

    _docs(spark, BATCH_A).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = start_paragraph_update_sink(stream, root, ckpt,
                                    compact_every=1)
    try:
        q.processAllAvailable()
        assert read_para_deduped(spark, root).count() == len(BATCH_A)
        _docs(spark, BATCH_B).coalesce(1).write.mode("append") \
            .parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    union = _docs(spark, BATCH_A + BATCH_B)
    expected = {
        r["url"]: r
        for r in paragraph_dedup(union, id_col="url").collect()
    }
    live = {r["url"]: r for r in read_para_deduped(spark, root).collect()}
    assert set(live) == set(expected)
    for url, exp in expected.items():
        assert live[url]["text"] == exp["text"], url
        assert live[url]["n_kept"] == exp["n_kept"], url
    # compact_every=1 folded the appends back to single-file stages
    assert read_manifest(root, "deduped").get("n_files", 0) == 1
