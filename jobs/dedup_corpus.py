"""spark-submit entry point for corpus deduplication.

Training-data-pipeline companion to jobs/kg_build.py, same deployment
form (``spark-submit --py-files``) and same stage contract (resumable
snapshots + per-partition lineage manifests via onto_text_tag_spark.sinks).

Pipeline (every stage corpus-scale-safe):

1. ``exact_edges``    — normalized-content digest groups → duplicate
                        edges to the group's min id (one shuffle).
2. ``signatures``     — MinHash signatures (vectorized numpy byte-shingle
                        path by default), snapshotted for re-banding.
3. ``candidates``     — banded MinHash-LSH candidate pairs (joinless
                        bucket expansion; mega-buckets capped).
4. ``verified``       — exact shingle-Jaccard over candidate documents
                        only (corpus semi-joined first; never a cross
                        product), threshold-filtered.
5. ``clusters``       — connected components over exact ∪ verified
                        edges (edge set is dup-sized, not corpus-sized).
6. ``deduped``        — corpus anti-joined against non-representative
                        members; representative = min id per cluster.

Usage:
    spark-submit --master local[8] --py-files pkg.zip jobs/dedup_corpus.py \
        --input corpus.parquet --output /tmp/dedup_out --threshold 0.8
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="snapshot root dir")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="shingle-Jaccard near-dup threshold")
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--max-bucket-size", type=int, default=200)
    ap.add_argument("--portable-minhash", action="store_true",
                    help="use the md5/DuckDB-reproducible MinHash instead "
                    "of the vectorized numpy byte-shingle path")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.operators.components import connected_components
    from onto_text_tag_spark.operators.dedup import (
        content_digest,
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_signatures_np,
        ngram_jaccard_pairs,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import (
        fingerprint_parquet_inputs,
        read_manifest,
        run_stage,
    )

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        import pandas as _pd  # noqa: F401

        spark.range(0, 10_000, numPartitions=4).toDF("id").mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        spark.read.parquet(args.input).limit(1000).count()

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    id_c, text_c = args.id_col, args.text_col
    fp = fingerprint_parquet_inputs([args.input])

    stage_sec: dict[str, float] = {}

    def timed(name, fn):
        s = time.time()
        out = fn()
        stage_sec[name] = round(time.time() - s, 2)
        return out

    # Stage 1: exact-duplicate edges (member -> min id of digest group).
    # Emitted as edges, not groups, so stage 4's component union handles
    # exact and near dups uniformly.
    def _exact_edges():
        groups = (
            docs.select(
                F.col(id_c), content_digest(text_c).alias("digest")
            )
            .groupBy("digest")
            .agg(F.array_sort(F.collect_list(id_c)).alias("ids"))
            .where(F.size("ids") > 1)
        )
        return groups.select(
            F.element_at("ids", 1).alias("src"),
            F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias("dst"),
        )

    exact_edges = timed("exact_edges", lambda: run_stage(
        spark, args.output, "exact_edges", _exact_edges,
        input_fingerprint=fp,
    ))

    # Stage 2: MinHash signatures — snapshotted so banding (and any
    # re-banding with different band counts) never re-shingles the
    # corpus.  Default is the vectorized numpy byte-shingle path; the
    # md5/DuckDB-reproducible family is behind --portable-minhash.
    sig_fn = (
        minhash_signatures if args.portable_minhash else minhash_signatures_np
    )
    fp_sig = fp + f"|h={args.num_hashes}|k={args.shingle_k}" + (
        "|portable" if args.portable_minhash else "|np"
    )
    signatures = timed("signatures", lambda: run_stage(
        spark, args.output, "signatures",
        lambda: sig_fn(
            docs, id_col=id_c, text_col=text_c,
            num_hashes=args.num_hashes, shingle_k=args.shingle_k,
        ),
        input_fingerprint=fp_sig,
    ))

    # Stage 3: LSH candidates (near-dup recall set).  Fingerprints chain:
    # each stage's fingerprint embeds its upstream's, so changing any
    # knob (hash family, bands, threshold) invalidates exactly the
    # stages downstream of it.
    fp_cand = fp_sig + f"|b={args.bands}|m={args.max_bucket_size}"
    candidates = timed("candidates", lambda: run_stage(
        spark, args.output, "candidates",
        lambda: lsh_candidate_pairs(
            docs, id_col=id_c, text_col=text_c,
            num_hashes=args.num_hashes, bands=args.bands,
            shingle_k=args.shingle_k, max_bucket_size=args.max_bucket_size,
            signatures=signatures,
        ),
        input_fingerprint=fp_cand,
    ))

    # Stage 4: exact Jaccard verification of candidates (precision set).
    fp_verify = fp_cand + f"|t={args.threshold}"
    verified = timed("verified", lambda: run_stage(
        spark, args.output, "verified",
        lambda: ngram_jaccard_pairs(
            docs, candidates, id_col=id_c, text_col=text_c,
            shingle_k=args.shingle_k, threshold=args.threshold,
        ),
        input_fingerprint=fp_verify,
    ))

    # Stage 5: duplicate clusters. The edge set is duplicate-sized —
    # orders of magnitude smaller than the corpus — so the iterative CC
    # runs over a small relation regardless of input scale.
    def _clusters():
        edges = exact_edges.select("src", "dst").unionByName(
            verified.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            )
        )
        return connected_components(edges, "src", "dst")

    clusters = timed("clusters", lambda: run_stage(
        spark, args.output, "clusters", _clusters,
        input_fingerprint=fp_verify,
    ))

    # Stage 6: deduped corpus — drop non-representative cluster members.
    # comp = min id of the component, so the kept member is deterministic.
    def _deduped():
        drop = clusters.where(F.col("node") != F.col("comp")).select(
            F.col("node").alias(id_c)
        )
        return docs.join(drop, id_c, "left_anti")

    timed("deduped", lambda: run_stage(
        spark, args.output, "deduped", _deduped,
        input_fingerprint=fp_verify,
        metrics={
            "n_exact_edges": read_manifest(args.output, "exact_edges")["total_rows"],
            "n_candidates": read_manifest(args.output, "candidates")["total_rows"],
            "n_verified": read_manifest(args.output, "verified")["total_rows"],
        },
    ))

    n_in = docs.count()
    n_out = read_manifest(args.output, "deduped")["total_rows"]
    dt = time.time() - t0
    print(json.dumps({
        "n_docs_in": n_in,
        "n_docs_out": n_out,
        "n_dropped": n_in - n_out,
        "n_exact_edges": read_manifest(args.output, "exact_edges")["total_rows"],
        "n_candidates": read_manifest(args.output, "candidates")["total_rows"],
        "n_verified": read_manifest(args.output, "verified")["total_rows"],
        "n_cluster_rows": read_manifest(args.output, "clusters")["total_rows"],
        "sec": round(dt, 2),
        "docs_per_sec": round(n_in / dt, 1),
        "stage_sec": stage_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
