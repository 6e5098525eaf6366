"""spark-submit entry point for perceptual media dedup: absorb a media
batch (image / audio / video rows) into a persistent perceptual-hash
root — the deployment form of the multimodal dedup family.

The absorb core, its batch-equivalence argument, and the crash-safe
staged commit protocol live in
``onto_text_tag_spark/plans/image_absorb.py`` (one core, three
families).  First submit against an empty root bootstraps it, so the
whole media corpus can arrive as a sequence of absorb commits; a
re-submitted batch is a committed no-op (epoch-safe under retrying
schedulers).  Equality with the family's batch operator over the union
of all absorbed batches is pinned by tests/test_media_dedup_job.py.

Usage:
    spark-submit --master local[N] --py-files pkg.zip jobs/media_dedup.py \
        --root <hash-store root> --input <media parquet> --family video
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="perceptual-hash store root (created on first "
                    "submit)")
    ap.add_argument("--input", required=True,
                    help="media parquet batch: (media_id, kind, format, "
                    "payload)")
    ap.add_argument("--family", choices=("image", "audio", "video", "video_frames",
                             "audio_segments", "image_tiles"),
                    default="image")
    ap.add_argument("--max-dist", type=int, default=None,
                    help="exact-verify Hamming threshold (family "
                    "default when omitted; must match prior submits)")
    ap.add_argument("--max-bucket-size", type=int, default=200)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.image_absorb import (
        absorb_media_batch,
        init_media_root,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import fingerprint_parquet_inputs

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        import pandas as _pd  # noqa: F401

        spark.range(0, 10_000, numPartitions=4).toDF("id").mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        spark.read.parquet(args.input).limit(1000).count()

    if not os.path.isdir(os.path.join(args.root, f"{args.family}_dups")):
        init_media_root(spark, args.root, args.family)

    batch = spark.read.parquet(args.input)
    batch_fp = fingerprint_parquet_inputs([args.input]) + (
        f"|fam={args.family}|d={args.max_dist}"
        f"|mb={args.max_bucket_size}"
    )
    stats = absorb_media_batch(
        spark, args.root, batch, batch_fp, family=args.family,
        max_dist=args.max_dist, max_bucket_size=args.max_bucket_size,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
