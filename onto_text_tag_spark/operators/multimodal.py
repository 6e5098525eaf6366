"""Multimodal column plumbing: binary payloads + typed metadata.

A web-scale corpus carries images/audio/video alongside text.  The
engine treats each payload as an opaque ``binary`` column plus a typed
metadata struct, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages — the same
physical shape as the HTML extractor (row-local, no shuffle, pipelined
with the scan).

The decode kernels themselves need codec libraries (Pillow, ffmpeg,
torchaudio...) that are NOT in this container, so the kernel boundary is
explicit: ``register_decoder`` plugs a real decoder in; without one the
stage uses a deterministic structural fake (parses our own synthetic
header) or raises ``NotImplementedError`` for unknown formats.  The
Spark-side plumbing — schemas, batch iteration, partition sizing — is
real and tested (tests/test_dedup_similarity.py, oracle-checked via the
mm_features/mm_frames driver queries).

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
from pyspark.sql.types import (
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


# Pluggable real decoders: format -> callable(bytes) -> dict of features.
_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(fmt: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[fmt] = fn


def _decode_one(fmt: str | None, payload: bytes) -> dict:
    if fmt in _DECODERS:
        return _DECODERS[fmt](payload)
    fake = _decode_fake(payload)
    if fake is not None:
        return fake
    raise NotImplementedError(
        f"no decoder registered for format {fmt!r}; codec libraries are "
        f"not available in this environment — register_decoder() to plug "
        f"one in (Pillow/ffmpeg on a real cluster image)"
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
