"""Incremental perceptual image dedup (plans/image_absorb.py):
absorbing media batches must yield exactly the batch operator's pair
set over the union, replays must no-op, in-batch and cross-batch
repeats of a media_id must hash once."""

import numpy as np
import pytest


def _png(seed: int, nudge: bool = False) -> bytes:
    from onto_text_tag_spark.functions import media_codecs as mc

    h, w = 20 + seed % 5, 28 + seed % 5
    yy, xx = np.mgrid[0:h, 0:w]
    chans = []
    for c in range(3):
        base = (xx.astype(np.uint64) * np.uint64(0x9E3779B1)
                + yy.astype(np.uint64) * np.uint64(0x85EBCA77)
                + np.uint64((seed * 0xC2B2AE3D + c * 0x27D4EB2F)
                            & 0xFFFFFFFF)) & np.uint64(0xFFFFFFFF)
        v = (base * base + base) & np.uint64(0xFFFFFFFF)
        chans.append(((v >> np.uint64(13)) % 256).astype(np.uint8))
    px = np.stack(chans, axis=2)
    if nudge:
        px[2, 3] = (px[2, 3] + 5) % 256
    return mc.encode_png(px)


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, format string, payload binary",
    )


def _rows(ids, near_of=None):
    out = []
    for i in ids:
        if near_of and i in near_of:
            out.append((str(i), "image", "png",
                        _png(near_of[i], nudge=True)))
        else:
            out.append((str(i), "image", "png", _png(i)))
    return out


def test_absorb_equals_batch_and_replay_noop(spark, tmp_path):
    from onto_text_tag_spark.operators.multimodal import (
        image_near_duplicates,
    )
    from onto_text_tag_spark.plans.image_absorb import (
        absorb_image_batch,
        init_image_root,
        read_image_dups,
    )
    from onto_text_tag_spark.sinks import read_stage

    # batch A: ids 0-19, where 7 is a near-dup of 3
    # batch B: ids 20-39, where 25 is a near-dup of 3 (CROSS-batch) and
    # 31 a near-dup of 22 (in-batch); id 5 re-delivered (already seen)
    rows_a = _rows(range(20), near_of={7: 3})
    rows_b = _rows(range(20, 40), near_of={25: 3, 31: 22}) + \
        _rows([5])

    root = str(tmp_path / "img")
    init_image_root(spark, root)
    s1 = absorb_image_batch(
        spark, root, _media(spark, rows_a), "fp-A",
        max_bucket_size=None)
    assert s1["status"] == "committed" and s1["n_new_images"] == 20
    s2 = absorb_image_batch(
        spark, root, _media(spark, rows_b), "fp-B",
        max_bucket_size=None)
    assert s2["status"] == "committed"
    assert s2["n_new_images"] == 20  # re-delivered id 5 hashed once
    assert s2["n_images_total"] == 40

    union = _media(spark, rows_a + rows_b[:-1])
    expected = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(
            union, max_dist=10, max_bucket_size=None).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_image_dups(spark, root).collect()
    }
    assert live == expected
    # the planted pairs are all present
    for pair in [("3", "7"), ("25", "3"), ("22", "31")]:
        a, b = sorted(pair)
        assert (a, b) in live, pair

    # replay: committed no-op
    rep = absorb_image_batch(
        spark, root, _media(spark, rows_a), "fp-A",
        max_bucket_size=None)
    assert rep["status"] == "noop_already_committed"
    assert read_stage(spark, root, "image_sigs").count() == 40
    assert read_image_dups(spark, root).count() == len(expected)


def test_image_absorb_refused_under_catalog(spark, tmp_path, monkeypatch):
    from onto_text_tag_spark.plans.image_absorb import absorb_image_batch

    spark.conf.set(
        "spark.sql.catalog.spark_catalog",
        "org.apache.iceberg.spark.SparkSessionCatalog")
    try:
        with pytest.raises(NotImplementedError, match="Iceberg"):
            absorb_image_batch(
                spark, str(tmp_path / "img"),
                _media(spark, _rows([1])), "fp")
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")


def test_streaming_image_sink_equals_batch(spark, tmp_path):
    from onto_text_tag_spark.operators.multimodal import (
        image_near_duplicates,
    )
    from onto_text_tag_spark.plans.image_absorb import (
        init_image_root,
        read_image_dups,
    )
    from onto_text_tag_spark.sinks import read_manifest
    from onto_text_tag_spark.streaming.incremental import (
        start_image_update_sink,
    )

    schema = ("media_id string, kind string, format string, "
              "payload binary")
    rows_a = _rows(range(12), near_of={7: 3})
    rows_b = _rows(range(12, 24), near_of={15: 3, 21: 13})

    root = str(tmp_path / "img_stream_root")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    init_image_root(spark, root)

    _media(spark, rows_a).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_image_update_sink(stream, root, ckpt,
                                max_bucket_size=None, compact_every=1)
    try:
        q.processAllAvailable()
        assert read_image_dups(spark, root).count() >= 1
        _media(spark, rows_b).coalesce(1).write.mode("append") \
            .parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    expected = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(
            _media(spark, rows_a + rows_b), max_dist=10,
            max_bucket_size=None).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_image_dups(spark, root).collect()
    }
    assert live == expected
    # compact_every=1 folded the appends back to single-file stages
    assert read_manifest(root, "image_dups").get("n_files", 0) == 1
