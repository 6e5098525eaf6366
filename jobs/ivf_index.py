"""spark-submit entry point for the incrementally maintained IVF ANN
index: train centroids + initialize the index root, then absorb
embedding deltas batch-by-batch in O(delta).

The absorb core, its exactly-once commit protocol, and the additive
stats algebra live in ``onto_text_tag_spark/plans/ivf_absorb.py``
(equality with a from-scratch assignment over the union is pinned by
tests/test_ivf_absorb.py).  ``--report`` prints the index-health
signals (occupancy skew, mean assignment score) that tell an operator
when corpus drift warrants a retrain + rebuild.

Usage:
    # build: train k-means centroids on the seed corpus, assign it
    spark-submit --py-files pkg.zip jobs/ivf_index.py \
        --root /idx --init --input seed_embeddings.parquet \
        --num-centroids 64

    # update: absorb a crawl delta's embeddings
    spark-submit --py-files pkg.zip jobs/ivf_index.py \
        --root /idx --input delta_embeddings.parquet

    # health check
    spark-submit --py-files pkg.zip jobs/ivf_index.py --root /idx --report
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="index snapshot root")
    ap.add_argument("--input", default=None,
                    help="embeddings parquet (seed corpus for --init, "
                    "else the delta batch)")
    ap.add_argument("--init", action="store_true",
                    help="train centroids on --input (distributed "
                    "spherical k-means) and initialize the root, then "
                    "absorb --input as the first batch")
    ap.add_argument("--num-centroids", type=int, default=64)
    ap.add_argument("--kmeans-iterations", type=int, default=5)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--report", action="store_true",
                    help="print index health and exit")
    args = ap.parse_args()
    if not args.report and not args.input:
        ap.error("--input is required unless --report")

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.ivf_absorb import (
        absorb_embeddings,
        init_ivf_root,
        ivf_index_report,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import fingerprint_parquet_inputs

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    out: dict = {}
    if args.report:
        out = ivf_index_report(spark, args.root)
    else:
        emb = spark.read.parquet(args.input)
        if args.init:
            from onto_text_tag_spark.operators.similarity import (
                kmeans_centroids,
            )

            cents = kmeans_centroids(
                emb, k=args.num_centroids,
                iterations=args.kmeans_iterations,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            out["init"] = init_ivf_root(spark, args.root, cents)
        out["absorb"] = absorb_embeddings(
            spark, args.root, emb,
            batch_fp=fingerprint_parquet_inputs([args.input]),
            id_col=args.id_col, vec_col=args.vec_col,
        )
        out["report"] = ivf_index_report(spark, args.root)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
