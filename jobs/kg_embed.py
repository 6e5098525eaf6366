"""spark-submit entry point for KG node-embedding training.

Closes the graph-representation loop the analytics operators open:
deterministic random walks over the stored edge set (operators/
graph_metrics.py:random_walks) become the "sentence" corpus for
Spark ML's Word2Vec (skip-gram), yielding a dense vector per node —
the representation similarity search, clustering, and downstream
link-prediction features consume.  Companion to jobs/kg_analytics.py:
same input (any (src, dst[, weight]) edge parquet, e.g. the triples
stage's co_occurs_with branch), same stage contract (resumable
fingerprinted snapshots).

Stages:

1. ``walks``     — (walk_id, step, node) deterministic walk corpus.
2. ``vectors``   — (node, vector array<float>) from Word2Vec fit on the
                   per-walk node sequences.  Training is the one
                   non-oracle-able step (SGD); determinism is pinned by
                   seed + fixed partitioning, and the walk INPUT is
                   bit-reproducible (checked by the kg_walks oracle).
3. ``neighbors`` — top-3 cosine neighbors per node from the trained
                   vectors (operators/similarity.py:cosine_topk) — the
                   embedding-space twin of the co-occurrence partner
                   list.

Usage:
    spark-submit --master local[8] --py-files pkg.zip jobs/kg_embed.py \
        --edges edges.parquet --output /tmp/embed_out --dim 32
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="edge parquet with src/dst columns")
    ap.add_argument("--output", required=True, help="snapshot root dir")
    ap.add_argument("--walk-length", type=int, default=8)
    ap.add_argument("--walks-per-node", type=int, default=4)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--topk", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.operators.graph_metrics import random_walks
    from onto_text_tag_spark.operators.similarity import cosine_topk
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import (
        fingerprint_parquet_inputs,
        read_manifest,
        run_stage,
    )

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    t0 = time.time()
    edges = spark.read.parquet(args.edges)
    knobs = (args.walk_length, args.walks_per_node, args.dim, args.window,
             args.iters, args.seed, args.topk)
    fp = (
        fingerprint_parquet_inputs([args.edges])
        + ":embed=" + hashlib.md5(repr(knobs).encode()).hexdigest()[:12]
    )

    stage_sec: dict[str, float] = {}

    def timed(name, fn):
        s = time.time()
        out = fn()
        stage_sec[name] = round(time.time() - s, 2)
        return out

    walks = timed("walks", lambda: run_stage(
        spark, args.output, "walks",
        lambda: random_walks(
            edges, walk_length=args.walk_length,
            walks_per_node=args.walks_per_node, seed=args.seed,
        ),
        input_fingerprint=fp,
    ))

    def _train():
        from pyspark.ml.feature import Word2Vec

        sentences = (
            walks.groupBy("walk_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("step", "node"))
            ).alias("_s"))
            .select(F.expr("transform(_s, x -> x.node)").alias("sentence"))
        )
        w2v = Word2Vec(
            vectorSize=args.dim, windowSize=args.window,
            maxIter=args.iters, minCount=0, seed=args.seed,
            numPartitions=1, inputCol="sentence", outputCol="_v",
        )
        model = w2v.fit(sentences)
        from pyspark.ml.functions import vector_to_array

        return model.getVectors().select(
            F.col("word").alias("node"),
            vector_to_array(F.col("vector"), "float32").alias("vector"),
        )

    vectors = timed("vectors", lambda: run_stage(
        spark, args.output, "vectors", _train, input_fingerprint=fp,
    ))

    emb = vectors.select(
        F.col("node").alias("vec_id"), F.col("vector").alias("embedding")
    )
    timed("neighbors", lambda: run_stage(
        spark, args.output, "neighbors",
        lambda: cosine_topk(
            emb,
            emb.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=args.topk,
        ),
        input_fingerprint=fp,
    ))

    dt = time.time() - t0
    print(json.dumps({
        "n_walks_rows": read_manifest(args.output, "walks")["total_rows"],
        "n_vectors": read_manifest(args.output, "vectors")["total_rows"],
        "n_neighbor_rows": read_manifest(
            args.output, "neighbors")["total_rows"],
        "sec": round(dt, 2),
        "stage_sec": stage_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
