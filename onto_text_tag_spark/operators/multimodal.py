"""Multimodal columns: binary payloads + typed metadata + real codecs.

A web-scale corpus carries images/audio/video alongside text.  The
engine treats each payload as an opaque ``binary`` column plus a typed
metadata struct, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages — the same
physical shape as the HTML extractor (row-local, no shuffle, pipelined
with the scan).

Decoders are REAL for the formats stdlib can handle
(functions/media_codecs.py): PNG (full pixel decode: zlib inflate +
scanline unfiltering), JPEG/GIF headers, WAV (RIFF parse), MP4
(moov/mvhd box walk) — registered by default.  ``register_decoder``
plugs further codecs in (Pillow/ffmpeg on a cluster image with them
installed); a format with no decoder raises ``NotImplementedError``
rather than guessing.  The legacy deterministic container
(``encode_fake_media``) remains for plumbing-only tests.

Scale notes: binary columns dominate bytes; always project them away
before shuffles (the metadata struct is enough downstream), and size
``spark.sql.files.maxPartitionBytes`` so one task's Arrow batches of
payloads fit executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from onto_text_tag_spark.functions.hashing import md5_long
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("format", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("payload_digest", LongType(), False),
    ]
)

# A deterministic synthetic container format for tests: magic "SYNM",
# kind byte, width/height/duration packed little-endian, then raw bytes.
_MAGIC = b"SYNM"
_KINDS = {0: "image", 1: "audio", 2: "video"}
_KIND_IDS = {v: k for k, v in _KINDS.items()}


def encode_fake_media(kind: str, width: int = 0, height: int = 0,
                      duration_ms: int = 0, body: bytes = b"") -> bytes:
    return (
        _MAGIC
        + struct.pack("<BIIQ", _KIND_IDS[kind], width, height, duration_ms)
        + body
    )


def _decode_fake(payload: bytes) -> dict | None:
    if payload is None or not payload.startswith(_MAGIC):
        return None
    kind_id, width, height, duration = struct.unpack_from("<BIIQ", payload, 4)
    return {
        "kind": _KINDS.get(kind_id, "unknown"),
        "width": width or None,
        "height": height or None,
        "duration_ms": duration or None,
    }


# Pluggable decoders: format -> callable(bytes) -> dict of features.
_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(fmt: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[fmt] = fn


def _register_stdlib_decoders() -> None:
    """The real, stdlib-only codecs (functions/media_codecs.py) — the
    default decoder set; ``register_decoder`` overrides per format."""
    from onto_text_tag_spark.functions import media_codecs as mc

    def _png(payload: bytes) -> dict:
        info = mc.png_info(payload)
        return {"kind": "image", "width": info["width"],
                "height": info["height"], "channels": info["channels"]}

    def _jpeg(payload: bytes) -> dict:
        info = mc.jpeg_info(payload)
        return {"kind": "image", **info}

    def _gif(payload: bytes) -> dict:
        info = mc.gif_info(payload)
        return {"kind": "image", "width": info["width"],
                "height": info["height"]}

    def _wav(payload: bytes) -> dict:
        info = mc.wav_info(payload)
        return {"kind": "audio", "duration_ms": info["duration_ms"],
                "channels": info["channels"],
                "sample_rate": info["sample_rate"]}

    def _mp4(payload: bytes) -> dict:
        info = mc.mp4_info(payload)
        return {"kind": "video", "duration_ms": info["duration_ms"]}

    def _avi(payload: bytes) -> dict:
        info = mc.avi_info(payload)
        return {"kind": "video", "width": info["width"],
                "height": info["height"],
                "duration_ms": info["duration_ms"]}

    _DECODERS.setdefault("png", _png)
    _DECODERS.setdefault("jpeg", _jpeg)
    _DECODERS.setdefault("jpg", _jpeg)
    _DECODERS.setdefault("gif", _gif)
    _DECODERS.setdefault("wav", _wav)
    _DECODERS.setdefault("mp4", _mp4)
    _DECODERS.setdefault("avi", _avi)


_register_stdlib_decoders()


def _decode_one(fmt: str | None, payload: bytes) -> dict:
    if fmt in _DECODERS:
        return _DECODERS[fmt](payload)
    fake = _decode_fake(payload)
    if fake is not None:
        return fake
    raise NotImplementedError(
        f"no decoder registered for format {fmt!r} — register_decoder() "
        f"to plug one in (the stdlib set covers png/jpeg/gif/wav/mp4; "
        f"Pillow/ffmpeg extend it on a real cluster image)"
    )


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents → deterministic media(media_id, kind, format, payload).

    Test/bench corpus synthesis: every document becomes one media row
    whose kind/dimensions/duration are pure functions of the id and
    whose payload body is the document text bytes — so an oracle can
    re-derive the decoded features arithmetically without decoding.  A
    production pipeline replaces this stage with a WARC/object-store
    reader producing the same schema; everything downstream is shared.

    Arrow-batched ``mapInPandas`` (the encode twin of the decode stage).
    """
    src = docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        (F.col(id_col) % 3).cast("int").alias("kind_id"),
        F.when(F.col(id_col) % 3 != 1, (640 + (F.col(id_col) % 64) * 10))
        .otherwise(0).cast("int").alias("width"),
        F.when(F.col(id_col) % 3 != 1, (360 + (F.col(id_col) % 36) * 10))
        .otherwise(0).cast("int").alias("height"),
        F.when(F.col(id_col) % 3 != 0, (1 + F.col(id_col) % 30) * 1000)
        .otherwise(0).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("body"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            payloads = [
                encode_fake_media(
                    _KINDS[int(k)], int(w), int(h), int(d),
                    bytes(body) if body is not None else b"",
                )
                for k, w, h, d, body in zip(
                    batch["kind_id"], batch["width"], batch["height"],
                    batch["duration_ms"], batch["body"],
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": [_KINDS[int(k)] for k in batch["kind_id"]],
                    "format": "synm",
                    "payload": payloads,
                }
            )

    return src.mapInPandas(batches, schema=MEDIA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, format, payload) → typed feature rows.

    Arrow-batched ``mapInPandas``; the payload digest is the portable
    md5_long over raw bytes (joins/dedup on content downstream)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = []
            for media_id, kind, fmt, payload in zip(
                batch["media_id"], batch["kind"], batch["format"],
                batch["payload"],
            ):
                payload = bytes(payload) if payload is not None else b""
                feats = _decode_one(fmt, payload)
                digest = int(hashlib.md5(payload).hexdigest()[:15], 16)
                out.append(
                    (
                        media_id,
                        feats.get("kind", kind),
                        fmt,
                        len(payload),
                        feats.get("width"),
                        feats.get("height"),
                        feats.get("duration_ms"),
                        feats.get("channels"),
                        feats.get("sample_rate"),
                        digest,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_FEATURES.fields]
            )

    return media.mapInPandas(batches, schema=MEDIA_FEATURES)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame offset.

    The actual frame decode is the stubbed kernel; the fan-out (explode
    over offsets derived from duration) is the real distributed shape.
    """
    feats = extract_media_features(media.where(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_offset_ms"),
    )


def synthesize_real_media(docs: DataFrame, id_col: str = "doc_id",
                          video_format: str = "mp4") -> DataFrame:
    """documents → media rows with GENUINE file payloads: PNG images
    (real zlib-compressed scanlines), PCM WAV audio, and videos —
    metadata-only MP4 by default, or REAL frame-carrying AVI
    (uncompressed DIB movi chunks) with ``video_format="avi"`` —
    every byte produced by the encode twins in
    functions/media_codecs.py and readable by any standard decoder.

    Deterministic by doc id so an oracle re-derives the decoded
    features arithmetically (kind = id%3; image w=16+id%16,
    h=8+id%8 RGB; audio 80*(1+id%30) frames at 8 kHz →
    duration 10*(1+id%30) ms; mp4 video duration (1+id%30)*1000 ms;
    avi video 6+id%10 frames of w=8+id%8 × h=6+id%6 at 10 fps with
    frame-f pixel (x,y,c) = (x*3 + y*5 + f*11 + id + c*7) % 256):
    the cross-check exercises the real decode path end-to-end.
    Arrow-batched ``mapInPandas``, row-local like every media kernel.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    if video_format not in ("mp4", "avi"):
        raise ValueError(
            f"synthesize_real_media: video_format must be 'mp4' or "
            f"'avi', got {video_format!r}")
    src = docs.select(F.col(id_col).cast("long").alias("_id"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id in batch["_id"]:
                i = int(media_id)
                k = i % 3
                if k == 0:
                    w, h = 16 + i % 16, 8 + i % 8
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [(xx * 3 + yy * 5 + i + c * 7) % 256
                         for c in range(3)], axis=2,
                    ).astype(np.uint8)
                    rows.append((str(i), "image", "png",
                                 mc.encode_png(px)))
                elif k == 1:
                    n = 80 * (1 + i % 30)
                    samples = (
                        (np.arange(n) * (i % 17 + 1)) % 2003 - 1001
                    ).astype(np.int16)
                    rows.append((str(i), "audio", "wav",
                                 mc.encode_wav(samples, 8000)))
                elif video_format == "avi":
                    nf, w, h = 6 + i % 10, 8 + i % 8, 6 + i % 6
                    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
                    frames = np.stack(
                        [(xx * 3 + yy * 5 + ff * 11 + i + c * 7) % 256
                         for c in range(3)], axis=3,
                    ).astype(np.uint8)
                    rows.append((str(i), "video", "avi",
                                 mc.encode_avi(frames, fps=10)))
                else:
                    rows.append((str(i), "video", "mp4",
                                 mc.encode_mp4_stub((1 + i % 30) * 1000)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload"]
            )

    return src.mapInPandas(batches, schema=MEDIA)


IMAGE_STATS = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("mean_luma", LongType(), False),   # mean * 1000, exact
        StructField("min_px", IntegerType(), False),
        StructField("max_px", IntegerType(), False),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Pixel-level feature extraction over real image payloads: full
    PNG decode (inflate + unfilter) then luminance statistics — the
    stage an image-quality gate or embedding preprocessor runs.

    ``mean_luma`` is the pixel mean scaled by 1000 and truncated
    (integer — bit-stable across numpy versions for oracle checks).
    PNG and baseline JPEG payloads decode (media_codecs.decode_image);
    other image formats are skipped."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    src = media.where(
        (F.col("kind") == "image")
        & F.col("format").isin("png", "jpeg", "jpg")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                px = mc.decode_image(bytes(payload))
                c = 1 if px.ndim == 2 else px.shape[2]
                flat = px.reshape(-1).astype(np.int64)
                rows.append((
                    media_id,
                    int(px.shape[1]), int(px.shape[0]), c,
                    int(flat.sum() * 1000 // flat.size),
                    int(flat.min()), int(flat.max()),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_STATS)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, format-preserving
    (PNG → PNG, baseline JPEG → baseline JPEG): the thumbnail /
    model-input-normalization stage, run as a row-local Arrow-batched
    kernel (no shuffle; payload bytes never leave the task).  Rows in
    other formats pass through unchanged."""
    from onto_text_tag_spark.functions import media_codecs as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            payloads = []
            for fmt, payload in zip(batch["format"], batch["payload"]):
                if fmt == "png" and payload is not None:
                    px = mc.decode_png(bytes(payload))
                    payloads.append(
                        mc.encode_png(mc.resize_nearest(px, width, height))
                    )
                elif fmt in ("jpeg", "jpg") and payload is not None:
                    px = mc.decode_jpeg(bytes(payload))
                    payloads.append(
                        mc.encode_jpeg(mc.resize_nearest(px, width, height))
                    )
                else:
                    payloads.append(payload)
            out = batch.copy()
            out["payload"] = payloads
            yield out

    return media.mapInPandas(batches, schema=media.schema)


IMAGE_DHASH = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sig", ArrayType(LongType(), False), False),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over real image payloads — the
    multimodal member of the dedup family (reference scope: text-only;
    this extends the corpus-dedup stack to image columns).

    dHash (Krawetz): decode → integer per-pixel luminance (channel sum
    // channels, exact integer arithmetic so an oracle can replay it
    from known pixels) → nearest-neighbor resize to 9×8 → one bit per
    horizontal neighbor pair (right > left), 64 bits total.  The hash
    survives re-encoding, resizing, and small edits — byte-level
    digests (``content_digest``) miss all three.

    Output ``sig``: the 64 bits packed as FOUR 16-bit band values
    (rows 2b, 2b+1 → band b) — exactly the (id, sig) shape
    ``dedup.lsh_candidate_pairs`` accepts as precomputed signatures,
    so Hamming-banded candidate generation reuses the text-LSH
    machinery unchanged: two images within Hamming distance d agree
    exactly on at least one band whenever d < 4 bands (pigeonhole),
    so banding loses no pair a ``max_dist ≤ 3×16`` verify would keep.
    Row-local Arrow kernel; PNG and baseline-JPEG payloads decode,
    other formats are skipped.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    src = media.where(
        (F.col("kind") == "image")
        & F.col("format").isin("png", "jpeg", "jpg")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                px = mc.decode_image(bytes(payload))
                if px.ndim == 2:
                    luma = px.astype(np.int64)
                else:
                    luma = (px.astype(np.int64).sum(axis=2)
                            // px.shape[2])
                r = mc.resize_nearest(luma, 9, 8)
                bits = (r[:, 1:] > r[:, :-1]).astype(np.int64)
                sig = []
                for b in range(4):
                    v = 0
                    for dy in range(2):
                        for x in range(8):
                            v |= int(bits[2 * b + dy, x]) << (dy * 8 + x)
                    sig.append(v)
                rows.append((media_id, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_DHASH)


def image_near_duplicates(
    media: DataFrame,
    max_dist: int = 10,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash → Hamming-banded
    candidate pairs (``lsh_candidate_pairs`` over the four 16-bit
    bands) → exact Hamming verify ``<= max_dist``.

    Scale shape is the text near-dup stack's, unchanged: one
    (band, bucket) shuffle groups ids per bucket, intra-bucket pairs
    generate joinlessly with a bucket cap, and the verify joins only
    the CANDIDATE pairs back to the (small) hash relation — never an
    all-pairs comparison over the store.  Output: (id_a, id_b,
    hamming) with id_a < id_b (string order, the banding machinery's
    contract).
    """
    return banded_hamming_pairs(
        image_dhash(media), max_dist, max_bucket_size=max_bucket_size)


def sig_hamming_col() -> "F.Column":
    """Hamming distance between two 4-band dHash signatures riding as
    ``_sa``/``_sb`` array<long> columns — 4 xor+popcount folds."""
    return F.expr(
        " + ".join(
            f"bit_count(element_at(_sa, {i + 1}) ^ "
            f"element_at(_sb, {i + 1}))"
            for i in range(4)
        )
    ).cast("long")


def verify_hamming_pairs(
    pairs: DataFrame,
    hashes: DataFrame,
    max_dist: int,
) -> DataFrame:
    """Exact Hamming verify of candidate (id_a, id_b) pairs against an
    (media_id, sig) hash relation: joins only the CANDIDATE pairs back
    to the (small) hash relation — shared by the batch operator and
    the incremental absorb."""
    h1 = hashes.select(F.col("media_id").alias("id_a"),
                       F.col("sig").alias("_sa"))
    h2 = hashes.select(F.col("media_id").alias("id_b"),
                       F.col("sig").alias("_sb"))
    return (
        pairs.join(h1, "id_a")
        .join(h2, "id_b")
        .withColumn("hamming", sig_hamming_col())
        .where(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
    )


def audio_dhash(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint over real PCM payloads — the audio
    member of the multimodal dedup family (image twin: ``image_dhash``).

    Block-energy difference hash: decode the 16-bit PCM samples, split
    the waveform into 65 equal blocks (boundaries ``j·n//65`` — the
    audio analog of the 9×8 nearest-neighbor resize), compute each
    block's integer mean absolute amplitude, and emit one bit per
    adjacent block pair (later louder than earlier).  Loudness-envelope
    shape survives re-encoding, mild resampling, and amplitude scaling
    — byte digests miss all three.  All-integer arithmetic, so an
    oracle replays it exactly from known samples.  Output ``sig``:
    64 bits as FOUR 16-bit bands — the ``lsh_candidate_pairs``
    precomputed-signature shape, same as ``image_dhash``.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    src = media.where(
        (F.col("kind") == "audio") & (F.col("format") == "wav")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                s = np.abs(
                    mc.decode_wav_samples(bytes(payload))
                    .astype(np.int64))
                n = len(s)
                energy = []
                for j in range(65):
                    lo, hi = j * n // 65, (j + 1) * n // 65
                    cnt = hi - lo
                    energy.append(
                        int(s[lo:hi].sum()) // cnt if cnt else 0)
                sig = []
                for b in range(4):
                    v = 0
                    for k in range(16):
                        j = 16 * b + k
                        if energy[j + 1] > energy[j]:
                            v |= 1 << k
                    sig.append(v)
                rows.append((media_id, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_DHASH)


def audio_near_duplicates(
    media: DataFrame,
    max_dist: int = 8,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Perceptual near-duplicate audio pairs: block-energy dHash →
    Hamming-banded candidates through ``lsh_candidate_pairs`` → exact
    Hamming verify — the same scale shape as ``image_near_duplicates``
    (one banded shuffle, capped joinless pair generation, verify joins
    only candidates)."""
    return banded_hamming_pairs(
        audio_dhash(media), max_dist, max_bucket_size=max_bucket_size)


def video_dhash(media: DataFrame) -> DataFrame:
    """Perceptual video fingerprint over real frame payloads — the
    video member of the multimodal dedup family (image twin:
    ``image_dhash``; audio twin: ``audio_dhash``).

    Temporal luma-envelope difference hash: decode the AVI frames
    (``media_codecs.decode_avi_frames`` — uncompressed DIB and MJPG
    streams both decode to pixels), compute each frame's integer mean
    luminance (per-pixel channel sum // 3, then frame sum // (w·h) —
    all-integer so an oracle replays it exactly), nearest-neighbor
    resample the per-frame envelope to 65 points (index ``t·n//65``,
    the temporal analog of the 9×8 spatial resize), and emit one bit
    per adjacent pair (later frame brighter than earlier).  The
    brightness-ORDER of frames survives re-encoding (MJPG), spatial
    resizing, and linear brightness scaling — byte digests miss all
    three.  Output ``sig``: 64 bits as FOUR 16-bit bands — the
    ``lsh_candidate_pairs`` precomputed-signature shape shared with
    the image and audio hashes.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    src = media.where(
        (F.col("kind") == "video") & (F.col("format") == "avi")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                frames = mc.decode_avi_frames(bytes(payload))
                nf, h, w = frames.shape[0], frames.shape[1], \
                    frames.shape[2]
                luma = frames.astype(np.int64).sum(axis=3) // 3
                means = [int(luma[f].sum()) // (w * h)
                         for f in range(nf)]
                env = [means[t * nf // 65] for t in range(65)]
                sig = []
                for b in range(4):
                    v = 0
                    for k in range(16):
                        j = 16 * b + k
                        if env[j + 1] > env[j]:
                            v |= 1 << k
                    sig.append(v)
                rows.append((media_id, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_DHASH)


def video_near_duplicates(
    media: DataFrame,
    max_dist: int = 8,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Perceptual near-duplicate video pairs: temporal luma-envelope
    dHash → Hamming-banded candidates through ``lsh_candidate_pairs``
    → exact Hamming verify — the same scale shape as
    ``image_near_duplicates``/``audio_near_duplicates`` (one banded
    shuffle, capped joinless pair generation, verify joins only
    candidates — never all-pairs over the store)."""
    return banded_hamming_pairs(
        video_dhash(media), max_dist, max_bucket_size=max_bucket_size)


FRAME_DHASH = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("sig", ArrayType(LongType(), False), False),
    ]
)


def video_frame_hashes(media: DataFrame,
                       frame_stride: int = 1) -> DataFrame:
    """Per-frame spatial dHash over real video payloads: decode the
    AVI frames and apply the IMAGE hash (integer luma → 9×8
    nearest-neighbor resize → horizontal-neighbor bits) to every
    ``frame_stride``-th frame.  One row per (video, sampled frame) —
    the frame-granular hash relation ``video_shared_frames`` pairs on,
    and the video analog of splitting documents into paragraphs before
    ``paragraph_dedup``.  Row-local Arrow kernel."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    src = media.where(
        (F.col("kind") == "video") & (F.col("format") == "avi")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                frames = mc.decode_avi_frames(bytes(payload))
                for f in range(0, frames.shape[0], frame_stride):
                    luma = (frames[f].astype(np.int64).sum(axis=2)
                            // frames.shape[3])
                    r = mc.resize_nearest(luma, 9, 8)
                    bits = (r[:, 1:] > r[:, :-1]).astype(np.int64)
                    sig = []
                    for b in range(4):
                        v = 0
                        for dy in range(2):
                            for x in range(8):
                                v |= (int(bits[2 * b + dy, x])
                                      << (dy * 8 + x))
                        sig.append(v)
                    rows.append((media_id, f, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=FRAME_DHASH)


def video_shared_frames(
    media: DataFrame,
    max_dist: int = 4,
    min_frames: int = 2,
    frame_stride: int = 1,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Cross-video shared-footage detection — the FRAME-granular member
    of the video dedup pair, exactly as ``paragraph_dedup`` is the
    paragraph-granular member of the text pair: ``video_near_duplicates``
    catches whole-video copies (one temporal envelope per video);
    this catches videos that SHARE FOOTAGE — reposts embedding a clip,
    intros/outros, syndicated segments — which whole-video hashes miss
    whenever the surrounding content differs.

    Shape: per-frame spatial dHashes (``video_frame_hashes``) keyed
    ``media_id#frame_idx`` feed the SAME banded candidate machinery
    (one (band, bucket) shuffle, capped joinless in-bucket pair
    generation — never all-pairs over the frame store), exact Hamming
    verify ``<= max_dist`` on candidates only, then cross-video pairs
    aggregate to (id_a, id_b, n_shared_frames, min_hamming) keeping
    pairs with ``>= min_frames`` matching frame pairs.  ``#`` is safe
    as a separator because the banding contract only needs ids unique
    and consistently ordered.
    """
    verified = banded_hamming_pairs(
        video_frame_sigs(media, frame_stride), max_dist,
        max_bucket_size=max_bucket_size)
    return aggregate_frame_pairs(verified, min_frames)


def video_frame_sigs(media: DataFrame,
                     frame_stride: int = 1) -> DataFrame:
    """``video_frame_hashes`` keyed ``media_id#frame_idx`` — the
    (id, sig) relation the banded machinery consumes, shared by the
    batch operator and the incremental ``video_frames`` absorb
    family."""
    return video_frame_hashes(media, frame_stride).select(
        F.concat_ws(
            "#", "media_id", F.col("frame_idx").cast("string")
        ).alias("media_id"),
        "sig",
    )


def aggregate_frame_pairs(verified: DataFrame,
                          min_frames: int = 2,
                          count_col: str = "n_shared_frames") -> DataFrame:
    """Verified ``media_id#unit_idx`` pairs → cross-media pairs with
    matched-unit counts — shared by the batch operators (video frames,
    audio segments) and the incremental pair-ledger readers."""
    va = F.split(F.col("id_a"), "#").getItem(0)
    vb = F.split(F.col("id_b"), "#").getItem(0)
    return (
        verified
        .select(
            F.least(va, vb).alias("id_a"),
            F.greatest(va, vb).alias("id_b"),
            "hamming",
        )
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("long").alias(count_col),
            F.min("hamming").alias("min_hamming"),
        )
        .where(F.col(count_col) >= min_frames)
    )


def synthesize_footage_media(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """documents → one REAL AVI payload per document, built for
    frame-level shared-footage tests: every frame's pixels are a full
    murmur-style avalanche of a FOOTAGE id ``g`` and the pixel
    coordinates (so unrelated frames sit ~32 hash bits apart — no
    accidental near-matches), and every 5th video (id % 5 == 4)
    re-embeds frames 0-2 of video id-2 verbatim (``g`` computed with
    id-2) — the planted shared clip ``video_shared_frames`` must find.

    Deterministic contract the mm_frame_dups oracle replays: all
    videos are 12×8 with nf = 6 + id%10 frames; frame f of video id
    carries footage g = (id' · 1000003 + f) with id' = id-2 when
    (id % 5 == 4 and f < 3) else id; pixel (x, y, c) =
    mix32(g·0x9E3779B1 + x·0x85EBCA77 + y·0xC2B2AE3D + c·0x27D4EB2F)
    % 256, where mix32 is the murmur3-32 finalizer (xor-shift 16,
    ·0x85EBCA6B, xor-shift 13, ·0xC2B2AE35, xor-shift 16, all mod
    2^32).  Arrow-batched ``mapInPandas``, row-local.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    m32 = np.uint64(0xFFFFFFFF)

    def mix32(v: "np.ndarray") -> "np.ndarray":
        v = v & m32
        v ^= v >> np.uint64(16)
        v = (v * np.uint64(0x85EBCA6B)) & m32
        v ^= v >> np.uint64(13)
        v = (v * np.uint64(0xC2B2AE35)) & m32
        v ^= v >> np.uint64(16)
        return v

    src = docs.select(F.col(id_col).cast("long").alias("_id"))
    w, h = 12, 8

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id in batch["_id"]:
                i = int(media_id)
                nf = 6 + i % 10
                frames = np.empty((nf, h, w, 3), dtype=np.uint8)
                yy, xx = np.mgrid[0:h, 0:w]
                for f in range(nf):
                    src_id = i - 2 if (i % 5 == 4 and f < 3) else i
                    g = np.uint64(src_id * 1000003 + f)
                    for c in range(3):
                        v = (g * np.uint64(0x9E3779B1)
                             + xx.astype(np.uint64)
                             * np.uint64(0x85EBCA77)
                             + yy.astype(np.uint64)
                             * np.uint64(0xC2B2AE3D)
                             + np.uint64(c) * np.uint64(0x27D4EB2F))
                        frames[f, :, :, c] = (mix32(v) % 256).astype(
                            np.uint8)
                rows.append((str(i), "video", "avi",
                             mc.encode_avi(frames, fps=10)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload"]
            )

    return src.mapInPandas(batches, schema=MEDIA)


def audio_segment_sigs(media: DataFrame,
                       segment_samples: int = 800) -> DataFrame:
    """Per-segment block-energy hashes over real PCM payloads, keyed
    ``media_id#segment_idx`` — the audio analog of
    ``video_frame_sigs``: the waveform splits into fixed
    ``segment_samples``-sample segments (trailing remainder dropped —
    a partial segment's energy profile is not comparable) and each
    segment gets the 65-block energy dHash ``audio_dhash`` applies to
    whole clips.  Fixed absolute segment boundaries make re-broadcast
    copies and embedded excerpts line up block-for-block when they
    start on a segment boundary.  Row-local Arrow kernel."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    if segment_samples < 65:
        raise ValueError(
            f"segment_samples must be >= 65 (one sample per energy "
            f"block), got {segment_samples}")
    src = media.where(
        (F.col("kind") == "audio") & (F.col("format") == "wav")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                s = np.abs(
                    mc.decode_wav_samples(bytes(payload))
                    .astype(np.int64))
                for seg in range(len(s) // segment_samples):
                    block = s[seg * segment_samples:
                              (seg + 1) * segment_samples]
                    energy = []
                    for j in range(65):
                        lo = j * segment_samples // 65
                        hi = (j + 1) * segment_samples // 65
                        energy.append(
                            int(block[lo:hi].sum()) // (hi - lo))
                    sig = []
                    for b in range(4):
                        v = 0
                        for k in range(16):
                            j = 16 * b + k
                            if energy[j + 1] > energy[j]:
                                v |= 1 << k
                        sig.append(v)
                    rows.append((f"{media_id}#{seg}", sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_DHASH)


def audio_shared_segments(
    media: DataFrame,
    max_dist: int = 4,
    min_segments: int = 2,
    segment_samples: int = 800,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Cross-audio shared-segment detection — the SEGMENT-granular
    member of the audio dedup pair, completing the granularity matrix
    (text: doc `dedup_exact` / paragraph `paragraph_dedup`; video:
    whole `video_near_duplicates` / frame `video_shared_frames`;
    audio: whole `audio_near_duplicates` / segment here): finds audio
    pairs sharing ``>= min_segments`` near-identical fixed-length
    segments — syndicated jingles, sampled clips, re-broadcast
    excerpts — which whole-clip envelope hashes miss whenever the
    surrounding audio differs.  Same scale shape as the frame path:
    one (band, bucket) shuffle over the segment store, capped joinless
    in-bucket pairs, exact Hamming verify on candidates only,
    cross-audio aggregation.  Output: (id_a, id_b,
    n_shared_segments, min_hamming)."""
    verified = banded_hamming_pairs(
        audio_segment_sigs(media, segment_samples), max_dist,
        max_bucket_size=max_bucket_size)
    return aggregate_frame_pairs(
        verified, min_segments, count_col="n_shared_segments")


def image_tile_sigs(media: DataFrame,
                    grid: tuple[int, int] = (2, 2)) -> DataFrame:
    """Per-tile dHashes over real image payloads, keyed
    ``media_id#tile_idx`` — the image analog of ``video_frame_sigs``:
    the decoded image splits into a ``grid = (cols, rows)`` of equal
    tiles (boundaries ``i·w//cols`` / ``j·h//rows``) and each tile
    gets the 9×8 spatial dHash ``image_dhash`` applies to whole
    images.  Tile index = ``row · cols + col``.  Row-local Arrow
    kernel."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    cols, tile_rows = grid
    if cols < 1 or tile_rows < 1:
        raise ValueError(f"grid must be >= (1, 1), got {grid}")
    src = media.where(
        (F.col("kind") == "image")
        & F.col("format").isin("png", "jpeg", "jpg")
    ).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id, payload in zip(batch["media_id"],
                                         batch["payload"]):
                px = mc.decode_image(bytes(payload))
                if px.ndim == 2:
                    luma = px.astype(np.int64)
                else:
                    luma = (px.astype(np.int64).sum(axis=2)
                            // px.shape[2])
                h, w = luma.shape
                for ty in range(tile_rows):
                    for tx in range(cols):
                        tile = luma[ty * h // tile_rows:
                                    (ty + 1) * h // tile_rows,
                                    tx * w // cols:
                                    (tx + 1) * w // cols]
                        r = mc.resize_nearest(tile, 9, 8)
                        bits = (r[:, 1:] > r[:, :-1]).astype(np.int64)
                        sig = []
                        for b in range(4):
                            v = 0
                            for dy in range(2):
                                for x in range(8):
                                    v |= (int(bits[2 * b + dy, x])
                                          << (dy * 8 + x))
                            sig.append(v)
                        rows.append(
                            (f"{media_id}#{ty * cols + tx}", sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_DHASH.fields]
            )

    return src.mapInPandas(batches, schema=IMAGE_DHASH)


def image_shared_tiles(
    media: DataFrame,
    max_dist: int = 4,
    min_tiles: int = 2,
    grid: tuple[int, int] = (2, 2),
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Cross-image shared-region detection — the TILE-granular member
    of the image dedup pair, the last cell of the granularity matrix
    (text doc/paragraph; video whole/frame; audio whole/segment;
    image whole/tile): finds image pairs sharing ``>= min_tiles``
    near-identical grid tiles — meme-template reuse, shared UI chrome
    in screenshots, watermarked regions — which whole-image dHashes
    miss whenever the rest of the image differs.  Same scale shape as
    the frame/segment paths: one (band, bucket) shuffle over the tile
    store, capped joinless in-bucket pairs, exact Hamming verify on
    candidates only, cross-image aggregation.  Output: (id_a, id_b,
    n_shared_tiles, min_hamming)."""
    verified = banded_hamming_pairs(
        image_tile_sigs(media, grid), max_dist,
        max_bucket_size=max_bucket_size)
    return aggregate_frame_pairs(
        verified, min_tiles, count_col="n_shared_tiles")


def synthesize_tiled_media(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """documents → one REAL PNG payload per document, built for
    tile-level shared-region tests: a 24×16 image of four 12×8
    quadrant tiles whose pixels are a full murmur-style avalanche of a
    REGION id ``g`` and the within-tile coordinates (so unrelated
    tiles sit ~32 hash bits apart), and every 5th image (id % 5 == 4)
    re-embeds tiles 0-1 (the top row) of image id-2 verbatim — the
    planted shared region ``image_shared_tiles`` must find.

    Deterministic contract the mm_tile_dups oracle replays: tile t of
    image id carries region g = (id' · 1000003 + t) with id' = id-2
    when (id % 5 == 4 and t < 2) else id; pixel (x, y, c) within the
    tile = mix32(g·0x9E3779B1 + x·0x85EBCA77 + y·0xC2B2AE3D +
    c·0x27D4EB2F) % 256 with mix32 the murmur3-32 finalizer — the
    ``synthesize_footage_media`` device one modality over.
    """
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    m32 = np.uint64(0xFFFFFFFF)

    def mix32(v: "np.ndarray") -> "np.ndarray":
        v = v & m32
        v ^= v >> np.uint64(16)
        v = (v * np.uint64(0x85EBCA6B)) & m32
        v ^= v >> np.uint64(13)
        v = (v * np.uint64(0xC2B2AE35)) & m32
        v ^= v >> np.uint64(16)
        return v

    src = docs.select(F.col(id_col).cast("long").alias("_id"))
    tw, th = 12, 8

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id in batch["_id"]:
                i = int(media_id)
                img = np.empty((2 * th, 2 * tw, 3), dtype=np.uint8)
                yy, xx = np.mgrid[0:th, 0:tw]
                for t in range(4):
                    src_id = i - 2 if (i % 5 == 4 and t < 2) else i
                    g = np.uint64(src_id * 1000003 + t)
                    ty, tx = divmod(t, 2)
                    for c in range(3):
                        v = (g * np.uint64(0x9E3779B1)
                             + xx.astype(np.uint64)
                             * np.uint64(0x85EBCA77)
                             + yy.astype(np.uint64)
                             * np.uint64(0xC2B2AE3D)
                             + np.uint64(c) * np.uint64(0x27D4EB2F))
                        img[ty * th:(ty + 1) * th,
                            tx * tw:(tx + 1) * tw, c] = (
                            mix32(v) % 256).astype(np.uint8)
                rows.append((str(i), "image", "png",
                             mc.encode_png(img)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload"]
            )

    return src.mapInPandas(batches, schema=MEDIA)


def thumbnail_links(
    media: DataFrame,
    max_dist: int = 4,
    frame_stride: int = 1,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Cross-modal thumbnail linking: images that appear as FRAMES of
    videos — preview/thumbnail attribution, video-source discovery
    for crawled stills, dedup across modalities.  Works because the
    whole-image dHash and the per-frame video dHash are the SAME
    64-bit spatial hash: one banded pass over the union of the image
    hash relation and the ``media_id#frame_idx``-keyed frame relation
    surfaces image↔frame candidates, exact Hamming verify keeps pairs
    ``<= max_dist``, and only cross-modal pairs (exactly one side
    carrying a frame key) survive.  Same scale shape as every banded
    pass: one (band, bucket) shuffle, capped joinless in-bucket
    pairs, verify joins candidates only.  Output: (image_id,
    video_id, frame_idx, hamming).  Image media_ids must not contain
    ``#`` (the frame-key separator)."""
    imgs = image_dhash(media)
    frames = video_frame_sigs(media, frame_stride)
    verified = banded_hamming_pairs(
        imgs.unionByName(frames), max_dist,
        max_bucket_size=max_bucket_size)
    a_is_frame = F.col("id_a").contains("#")
    b_is_frame = F.col("id_b").contains("#")
    cross = verified.where(a_is_frame != b_is_frame)
    frame_key = F.when(a_is_frame, F.col("id_a")).otherwise(
        F.col("id_b"))
    image_id = F.when(a_is_frame, F.col("id_b")).otherwise(
        F.col("id_a"))
    return cross.select(
        image_id.alias("image_id"),
        F.split(frame_key, "#").getItem(0).alias("video_id"),
        F.split(frame_key, "#").getItem(1).cast("int")
        .alias("frame_idx"),
        "hamming",
    )


def synthesize_thumb_media(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """documents → a mixed image+video corpus for cross-modal
    thumbnail tests: ids with id % 3 == 2 become footage videos under
    EXACTLY the ``synthesize_footage_media`` contract (12×8,
    nf = 6 + id%10 frames, avalanche-noise pixels, every 5th video
    re-embedding frames 0-2 of video id-2); ids with id % 3 == 0
    become 12×8 PNG THUMBNAILS of video id+2 — pixel-identical to its
    frame 0 (including the re-embedding rule, so a thumbnail of a
    clip-reusing video also links to the clip's source video).  Ids
    with id % 3 == 1 are skipped (no audio in this corpus).  The
    mm_thumb_links oracle replays both sides arithmetically."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    m32 = np.uint64(0xFFFFFFFF)

    def mix32(v: "np.ndarray") -> "np.ndarray":
        v = v & m32
        v ^= v >> np.uint64(16)
        v = (v * np.uint64(0x85EBCA6B)) & m32
        v ^= v >> np.uint64(13)
        v = (v * np.uint64(0xC2B2AE35)) & m32
        v ^= v >> np.uint64(16)
        return v

    src = docs.select(F.col(id_col).cast("long").alias("_id"))
    w, h = 12, 8

    def frame_pixels(video_id: int, f: int) -> "np.ndarray":
        src_id = video_id - 2 if (video_id % 5 == 4 and f < 3) \
            else video_id
        g = np.uint64(src_id * 1000003 + f)
        yy, xx = np.mgrid[0:h, 0:w]
        out = np.empty((h, w, 3), dtype=np.uint8)
        for c in range(3):
            v = (g * np.uint64(0x9E3779B1)
                 + xx.astype(np.uint64) * np.uint64(0x85EBCA77)
                 + yy.astype(np.uint64) * np.uint64(0xC2B2AE3D)
                 + np.uint64(c) * np.uint64(0x27D4EB2F))
            out[:, :, c] = (mix32(v) % 256).astype(np.uint8)
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_id in batch["_id"]:
                i = int(media_id)
                if i % 3 == 2:
                    nf = 6 + i % 10
                    frames = np.stack(
                        [frame_pixels(i, f) for f in range(nf)],
                        axis=0)
                    rows.append((str(i), "video", "avi",
                                 mc.encode_avi(frames, fps=10)))
                elif i % 3 == 0:
                    rows.append((str(i), "image", "png",
                                 mc.encode_png(frame_pixels(i + 2, 0))))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "format", "payload"]
            )

    return src.mapInPandas(batches, schema=MEDIA)


def banded_hamming_pairs(
    hashes: DataFrame,
    max_dist: int,
    num_hashes: int = 4,
    bands: int = 4,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Fused banding + verify for perceptual-hash relations: one pass
    from (media_id, sig) to verified (id_a, id_b, hamming <=
    max_dist) pairs.

    Value-identical to ``dedup.lsh_candidate_pairs`` followed by
    ``verify_hamming_pairs`` (same band keys via ``_band_rows``'s md5
    bucket, same bucket cap, same id-ordered pair generation, same
    Hamming filter) — but the SIGNATURES RIDE THE BANDING SHUFFLE
    (32 bytes/row) and the Hamming distance is computed in-bucket, so
    the plan has exactly ONE consumer of the hash relation.  The
    compose-then-join form evaluates the decode+hash Python kernel up
    to three times (banding + both verify join sides — Spark cannot
    reuse exchanges across differently-shaped consumers); at corpus
    scale, re-decoding every payload twice more costs far beyond
    shipping 4 longs per band row.  All pair work stays JVM-side.
    """
    sigs = hashes.select(F.col("media_id").alias("id"), "sig")
    rows_per_band = num_hashes // bands
    band_rows = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_long(
                            F.expr(
                                f"array_join(transform(slice(sig, "
                                f"{b * rows_per_band + 1}, "
                                f"{rows_per_band}), "
                                f"x -> cast(x as string)), ',')"
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    buckets = band_rows.groupBy("band", "bucket").agg(
        F.array_sort(
            F.collect_list(F.struct("id", "sig"))
        ).alias("items")
    )
    buckets = buckets.where(F.size("items") > 1)
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("items") <= max_bucket_size)
    ham = " + ".join(
        f"bit_count(element_at(a.sig, {i + 1}) ^ "
        f"element_at(b.sig, {i + 1}))"
        for i in range(bands)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (a, i) -> "
                "transform(slice(items, i + 2, size(items) - i - 1), "
                f"b -> struct(a.id AS id_a, b.id AS id_b, "
                f"cast({ham} as bigint) AS hamming))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
        .where(F.col("hamming") <= max_dist)
    )
