"""Incremental perceptual AUDIO and VIDEO dedup through the
generalized media absorb (plans/image_absorb.py:absorb_media_batch):
absorbing batches must yield exactly the family batch operator's pair
set over the union, replays must no-op, re-delivered media ids must
hash once, and the streaming sink must equal the batch operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _wav(seed: int, scale: int = 100) -> bytes:
    """Deterministic waveform per seed; ``scale`` (percent) produces an
    amplitude-scaled near-copy with the same loudness envelope."""
    from onto_text_tag_spark.functions import media_codecs as mc

    n = 1300 + (seed % 7) * 40
    t = np.arange(n, dtype=np.int64)
    base = (t * (seed * 31 % 97 + 3) + t * t % 613) % 2003 - 1001
    samples = (base * scale // 100).astype(np.int16)
    return mc.encode_wav(samples, 8000)


def _avi(seed: int, scale: int = 100) -> bytes:
    """Deterministic footage per seed; ``scale`` (percent) produces a
    brightness-scaled near-copy with the same frame-mean ordering."""
    from onto_text_tag_spark.functions import media_codecs as mc

    nf, h, w = 70 + seed % 5, 6, 8
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    frames = np.stack(
        [(xx * 3 + yy * 5 + (ff * ff * (seed % 11 + 2)) % 251 + c * 7)
         % 256 for c in range(3)],
        axis=3,
    )
    frames = (frames * scale // 100).astype(np.uint8)
    return mc.encode_avi(frames, fps=10)


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, format string, payload binary",
    )


def _rows(family, ids, near_of=None):
    kind, fmt, enc = {
        "audio": ("audio", "wav", _wav),
        "video": ("video", "avi", _avi),
    }[family]
    out = []
    for i in ids:
        if near_of and i in near_of:
            out.append((str(i), kind, fmt, enc(near_of[i], scale=90)))
        else:
            out.append((str(i), kind, fmt, enc(i)))
    return out


def _batch_pairs(family, media, max_dist):
    from onto_text_tag_spark.operators.multimodal import (
        audio_near_duplicates,
        video_near_duplicates,
    )

    op = {"audio": audio_near_duplicates,
          "video": video_near_duplicates}[family]
    return {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in op(media, max_dist=max_dist,
                    max_bucket_size=None).collect()
    }


@pytest.mark.parametrize("family", ["audio", "video"])
def test_media_absorb_equals_batch_and_replay_noop(
        spark, tmp_path, family):
    from onto_text_tag_spark.plans.image_absorb import (
        absorb_media_batch,
        init_media_root,
        read_media_dups,
    )
    from onto_text_tag_spark.sinks import read_stage

    # batch A: ids 0-11 with 7 a near-copy of 3; batch B: ids 12-23
    # with 15 a near-copy of 3 (CROSS-batch) and 21 of 13 (in-batch);
    # id 5 re-delivered (already seen)
    rows_a = _rows(family, range(12), near_of={7: 3})
    rows_b = _rows(family, range(12, 24), near_of={15: 3, 21: 13}) + \
        _rows(family, [5])

    root = str(tmp_path / family)
    init_media_root(spark, root, family)
    s1 = absorb_media_batch(
        spark, root, _media(spark, rows_a), "fp-A", family=family,
        max_bucket_size=None)
    assert s1["status"] == "committed" and s1["n_new_items"] == 12
    s2 = absorb_media_batch(
        spark, root, _media(spark, rows_b), "fp-B", family=family,
        max_bucket_size=None)
    assert s2["status"] == "committed"
    assert s2["n_new_items"] == 12  # re-delivered id 5 hashed once
    assert s2["n_items_total"] == 24

    expected = _batch_pairs(
        family, _media(spark, rows_a + rows_b[:-1]), max_dist=8)
    live = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_media_dups(spark, root, family).collect()
    }
    assert live == expected
    for pair in [("3", "7"), ("15", "3"), ("13", "21")]:
        a, b = sorted(pair)
        assert (a, b) in live, pair

    rep = absorb_media_batch(
        spark, root, _media(spark, rows_a), "fp-A", family=family,
        max_bucket_size=None)
    assert rep["status"] == "noop_already_committed"
    assert read_stage(spark, root, f"{family}_sigs").count() == 24
    assert read_media_dups(spark, root, family).count() == len(expected)


def test_absorb_media_batch_unknown_family(spark, tmp_path):
    from onto_text_tag_spark.plans.image_absorb import absorb_media_batch

    with pytest.raises(ValueError, match="unknown media family"):
        absorb_media_batch(
            spark, str(tmp_path / "x"),
            _media(spark, _rows("video", [1])), "fp", family="text")


def test_streaming_video_sink_equals_batch(spark, tmp_path):
    from onto_text_tag_spark.plans.image_absorb import (
        init_media_root,
        read_media_dups,
    )
    from onto_text_tag_spark.sinks import read_manifest
    from onto_text_tag_spark.streaming.incremental import (
        start_media_update_sink,
    )

    schema = ("media_id string, kind string, format string, "
              "payload binary")
    rows_a = _rows("video", range(10), near_of={7: 3})
    rows_b = _rows("video", range(10, 20), near_of={15: 3, 19: 11})

    root = str(tmp_path / "vid_stream_root")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    init_media_root(spark, root, "video")

    _media(spark, rows_a).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_media_update_sink(stream, root, ckpt, family="video",
                                max_bucket_size=None, compact_every=1)
    try:
        q.processAllAvailable()
        assert read_media_dups(spark, root, "video").count() >= 1
        _media(spark, rows_b).coalesce(1).write.mode("append") \
            .parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    expected = _batch_pairs(
        "video", _media(spark, rows_a + rows_b), max_dist=8)
    live = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_media_dups(spark, root, "video").collect()
    }
    assert live == expected
    # compact_every=1 folded the appends back to single-file stages
    assert read_manifest(root, "video_dups").get("n_files", 0) == 1


def test_video_frames_absorb_equals_batch_shared_footage(
        spark, tmp_path):
    """Incremental shared-footage detection (family ``video_frames``):
    absorbing two crawl batches must yield exactly the batch
    operator's video-pair set over the union — including a CROSS-batch
    planted clip (a batch-B video re-embedding frames of a batch-A
    video), the case the incremental pass exists for."""
    from onto_text_tag_spark.operators.multimodal import (
        synthesize_footage_media,
        video_shared_frames,
    )
    from onto_text_tag_spark.plans.image_absorb import (
        absorb_media_batch,
        init_media_root,
        read_video_shared_frames,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(15)], "doc_id long, text string"
    )
    media = synthesize_footage_media(docs)
    # planted clips: (2,4) within batch A, (7,9) CROSS-batch,
    # (12,14) within batch B
    batch_a = media.where(F.col("media_id").cast("long") < 8)
    batch_b = media.where(F.col("media_id").cast("long") >= 8)

    root = str(tmp_path / "vf")
    init_media_root(spark, root, "video_frames")
    s1 = absorb_media_batch(
        spark, root, batch_a, "fp-A", family="video_frames",
        max_bucket_size=None)
    assert s1["status"] == "committed"
    s2 = absorb_media_batch(
        spark, root, batch_b, "fp-B", family="video_frames",
        max_bucket_size=None)
    assert s2["status"] == "committed"

    expected = {
        (r["id_a"], r["id_b"]): (r["n_shared_frames"], r["min_hamming"])
        for r in video_shared_frames(
            media, max_dist=4, min_frames=2,
            max_bucket_size=None).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): (r["n_shared_frames"], r["min_hamming"])
        for r in read_video_shared_frames(spark, root).collect()
    }
    assert live == expected
    assert ("7", "9") in live  # the cross-batch clip
    assert live == {("2", "4"): (3, 0), ("7", "9"): (3, 0),
                    ("12", "14"): (3, 0)}


def test_audio_segments_absorb_equals_batch(spark, tmp_path):
    """Incremental shared-segment detection (family ``audio_segments``):
    two absorbed batches == the batch operator over the union,
    including a CROSS-batch re-broadcast (a batch-B clip embedding the
    first two segments of a batch-A clip)."""
    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        audio_shared_segments,
    )
    from onto_text_tag_spark.plans.image_absorb import (
        absorb_media_batch,
        init_media_root,
        read_audio_shared_segments,
    )

    t = np.arange(2400, dtype=np.int64)

    def clip(seed):
        return ((t * (seed * 31 % 97 + 3) + t * t % 613)
                % 2003 - 1001).astype(np.int16)

    base = clip(1)
    excerpt = base.copy()
    excerpt[1600:] = clip(99)[1600:]
    rows_a = [("a%d" % i, "audio", "wav",
               mc.encode_wav(clip(i), 8000)) for i in range(5)]
    rows_a.append(("base", "audio", "wav", mc.encode_wav(base, 8000)))
    rows_b = [("b%d" % i, "audio", "wav",
               mc.encode_wav(clip(10 + i), 8000)) for i in range(5)]
    rows_b.append(("reb", "audio", "wav",
                   mc.encode_wav(excerpt, 8000)))  # cross-batch
    media_a, media_b = _media(spark, rows_a), _media(spark, rows_b)

    root = str(tmp_path / "aseg")
    init_media_root(spark, root, "audio_segments")
    for media, fp in ((media_a, "fp-A"), (media_b, "fp-B")):
        st = absorb_media_batch(
            spark, root, media, fp, family="audio_segments",
            max_bucket_size=None)
        assert st["status"] == "committed"

    union = _media(spark, rows_a + rows_b)
    expected = {
        (r["id_a"], r["id_b"]): (r["n_shared_segments"],
                                 r["min_hamming"])
        for r in audio_shared_segments(
            union, max_dist=4, min_segments=2,
            max_bucket_size=None).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): (r["n_shared_segments"],
                                 r["min_hamming"])
        for r in read_audio_shared_segments(spark, root).collect()
    }
    assert live == expected
    assert live[("base", "reb")][0] == 2  # the cross-batch excerpt


def test_image_tiles_absorb_equals_batch(spark, tmp_path):
    """Incremental shared-region detection (family ``image_tiles``):
    two absorbed batches == the batch operator over the union,
    including a CROSS-batch planted region (a batch-B image
    re-embedding the top tile row of a batch-A image)."""
    from onto_text_tag_spark.operators.multimodal import (
        image_shared_tiles,
        synthesize_tiled_media,
    )
    from onto_text_tag_spark.plans.image_absorb import (
        absorb_media_batch,
        init_media_root,
        read_image_shared_tiles,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(15)], "doc_id long, text string"
    )
    media = synthesize_tiled_media(docs)
    # planted regions: (2,4) within A, (7,9) CROSS-batch, (12,14) in B
    batch_a = media.where(F.col("media_id").cast("long") < 8)
    batch_b = media.where(F.col("media_id").cast("long") >= 8)

    root = str(tmp_path / "tiles")
    init_media_root(spark, root, "image_tiles")
    for batch, fp in ((batch_a, "fp-A"), (batch_b, "fp-B")):
        st = absorb_media_batch(
            spark, root, batch, fp, family="image_tiles",
            max_bucket_size=None)
        assert st["status"] == "committed"

    expected = {
        (r["id_a"], r["id_b"]): (r["n_shared_tiles"], r["min_hamming"])
        for r in image_shared_tiles(
            media, max_dist=4, min_tiles=2,
            max_bucket_size=None).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): (r["n_shared_tiles"], r["min_hamming"])
        for r in read_image_shared_tiles(spark, root).collect()
    }
    assert live == expected
    assert live == {("2", "4"): (2, 0), ("7", "9"): (2, 0),
                    ("12", "14"): (2, 0)}
