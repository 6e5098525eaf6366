"""spark-submit entry point for INCREMENTAL corpus dedup: absorb a new
crawl batch into an existing ``jobs/dedup_corpus.py`` snapshot root
without re-fingerprinting or re-verifying the base corpus.

The absorb core, its rebuild-equivalence argument, and the crash-safe
staged commit protocol live in
``onto_text_tag_spark/plans/dedup_absorb.py``.  Equality with a full
rebuild over the union corpus is pinned by
tests/test_dedup_update_job.py.

Knobs must match the base run (asserted against the stored signature
width).  Against a ``--store-shingles`` root the absorb runs off the
fingerprint store alone; otherwise the base corpus parquet
(``--base-input``) is read once to fetch candidate texts for
exact-Jaccard verification — a semi-joined two-column scan.

Usage:
    spark-submit --master local[N] --py-files pkg.zip jobs/dedup_update.py \
        --dedup <dedup_corpus output root> --base-input <base corpus parquet> \
        --input <delta docs parquet>
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dedup", required=True,
                    help="existing jobs/dedup_corpus.py snapshot root")
    ap.add_argument("--base-input", default=None,
                    help="the base corpus parquet the root was built from "
                    "(only needed when the root does NOT store shingle "
                    "arrays — dedup_corpus --store-shingles roots verify "
                    "off the fingerprint store alone)")
    ap.add_argument("--input", required=True,
                    help="delta documents parquet (new crawl batch)")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-mode", choices=("word", "char"),
                    default="word")
    ap.add_argument("--prefilter-margin", type=float, default=0.1)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--max-bucket-size", type=int, default=200)
    ap.add_argument("--minhash-method", choices=("oph", "dense"),
                    default="oph")
    ap.add_argument("--portable-minhash", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.dedup_absorb import absorb_dedup_batch
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import fingerprint_parquet_inputs

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        import pandas as _pd  # noqa: F401

        spark.range(0, 10_000, numPartitions=4).toDF("id").mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        spark.read.parquet(args.input).limit(1000).count()

    delta = spark.read.parquet(args.input)
    batch_fp = fingerprint_parquet_inputs([args.input]) + (
        f"|t={args.threshold}|h={args.num_hashes}|b={args.bands}"
        f"|k={args.shingle_k}|sm={args.shingle_mode}"
        f"|pm={args.prefilter_margin}"
    )
    stats = absorb_dedup_batch(
        spark, args.dedup, args.base_input, delta, batch_fp,
        id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, num_hashes=args.num_hashes,
        bands=args.bands, shingle_k=args.shingle_k,
        shingle_mode=args.shingle_mode,
        max_bucket_size=args.max_bucket_size,
        prefilter_margin=args.prefilter_margin,
        minhash_method=args.minhash_method,
        portable_minhash=args.portable_minhash,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
