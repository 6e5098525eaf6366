"""spark-submit entry point for the incrementally maintained PQ code
store: train per-subspace codebooks + initialize the store root, then
absorb embedding deltas batch-by-batch in O(delta).

The absorb core, its exactly-once commit protocol, the codebook-tamper
refusal, and the additive reconstruction-error stats live in
``onto_text_tag_spark/plans/pq_absorb.py`` (equality with a
from-scratch encode over the union is pinned by
tests/test_pq_absorb.py).  ``--report`` prints the store-health
signals (total + per-batch mean reconstruction error) that tell an
operator when corpus drift warrants a codebook retrain + rebuild.

Usage:
    # build: train Lloyd's codebooks on the seed corpus, encode it
    spark-submit --py-files pkg.zip jobs/pq_index.py \
        --root /pq --init --input seed_embeddings.parquet \
        --m 8 --ksub 16

    # update: absorb a crawl delta's embeddings
    spark-submit --py-files pkg.zip jobs/pq_index.py \
        --root /pq --input delta_embeddings.parquet

    # health check
    spark-submit --py-files pkg.zip jobs/pq_index.py --root /pq --report
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="store snapshot root")
    ap.add_argument("--input", default=None,
                    help="embeddings parquet (seed corpus for --init, "
                    "else the delta batch)")
    ap.add_argument("--init", action="store_true",
                    help="train per-subspace codebooks on --input "
                    "(distributed Lloyd's) and initialize the root, "
                    "then absorb --input as the first batch")
    ap.add_argument("--m", type=int, default=8,
                    help="number of subspaces")
    ap.add_argument("--ksub", type=int, default=16,
                    help="centroids per subspace")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--report", action="store_true",
                    help="print store health and exit")
    args = ap.parse_args()
    if not args.report and not args.input:
        ap.error("--input is required unless --report")

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.pq_absorb import (
        absorb_pq_batch,
        init_pq_root,
        pq_store_report,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import fingerprint_parquet_inputs

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    out: dict = {}
    if args.report:
        out = pq_store_report(spark, args.root)
    else:
        emb = spark.read.parquet(args.input)
        if args.init:
            from onto_text_tag_spark.operators.similarity import (
                pq_trained_codebooks,
            )

            cbs = pq_trained_codebooks(
                emb, m=args.m, ksub=args.ksub,
                iterations=args.iterations,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            out["init"] = init_pq_root(spark, args.root, cbs)
        out["absorb"] = absorb_pq_batch(
            spark, args.root, emb,
            batch_fp=fingerprint_parquet_inputs([args.input]),
            id_col=args.id_col, vec_col=args.vec_col,
        )
        out["report"] = pq_store_report(spark, args.root)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
