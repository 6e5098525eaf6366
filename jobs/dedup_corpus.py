"""spark-submit entry point for corpus deduplication.

Training-data-pipeline companion to jobs/kg_build.py, same deployment
form (``spark-submit --py-files``) and same stage contract (resumable
snapshots + per-partition lineage manifests via onto_text_tag_spark.sinks).

Pipeline (every stage corpus-scale-safe):

1. ``signatures``     — per-doc fingerprints: OPH MinHash signature +
                        normalized-content digest in ONE corpus scan
                        (vectorized numpy word-shingle path by default),
                        snapshotted for re-banding.
2. ``exact_edges``    — digest groups → duplicate edges to the group's
                        min id, derived from the fingerprint snapshot
                        (narrow rows, no second corpus read).
3. ``candidates``     — banded MinHash-LSH candidate pairs (joinless
                        bucket expansion; mega-buckets capped).
4. ``verified``       — candidates pruned by the MinHash Jaccard
                        ESTIMATE (signature-slot agreement; boilerplate
                        mid-similarity pairs die here for two narrow
                        joins), then exact shingle-Jaccard over the
                        surviving documents only (corpus semi-joined
                        first; never a cross product), threshold-filtered.
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
    # 64 hashes / 8 bands ⇒ 8 rows per band: same S-curve midpoint as
    # 16/4 would give with r=4 raised to r=8 — collision P at J=0.6
    # drops from 13% to 1.7% per band, which keeps the candidate stage
    # dup-sized on template-heavy corpora (measured: 15.7M candidate
    # pairs per 1M synthetic docs at 16/4).  The vectorized numpy
    # signature path makes 64 permutations as cheap as 16.
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=8)
    # Word shingles, not char: char 5-grams over a shared vocabulary
    # give RANDOM page pairs 0.33-0.47 Jaccard (measured on the
    # synthetic corpus), which degenerates banded LSH toward all-pairs
    # (15.7M-84M candidates per 1M docs).  Word 5-grams keep
    # random-pair Jaccard near 0 — the standard web-dedup shingle unit.
    ap.add_argument("--shingle-mode", choices=("word", "char"),
                    default="word")
    ap.add_argument("--prefilter-margin", type=float, default=0.1,
                    help="verify stage first drops candidates whose "
                    "signature-estimated Jaccard < threshold - margin "
                    "(a few estimator sigmas of slack); negative "
                    "disables the estimate pre-filter")
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--max-bucket-size", type=int, default=200)
    ap.add_argument("--minhash-method", choices=("oph", "dense"),
                    default="oph",
                    help="np signature kernel: one-permutation hashing "
                    "(O(n) per doc, the scale default) or the dense "
                    "universal-hash permutation family")
    ap.add_argument("--portable-minhash", action="store_true",
                    help="use the md5/DuckDB-reproducible MinHash instead "
                    "of the vectorized numpy byte-shingle path")
    ap.add_argument("--store-shingles", action="store_true",
                    help="persist the hashed-shingle arrays alongside the "
                    "signatures (~4 KB/doc): the verify stage — and every "
                    "later jobs/dedup_update.py absorb — then runs off the "
                    "fingerprint store alone, never re-reading the corpus")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    if args.store_shingles and args.portable_minhash:
        ap.error("--store-shingles is the numpy-kernel path; it cannot "
                 "combine with --portable-minhash")

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.operators.components import connected_components
    from onto_text_tag_spark.operators.dedup import (
        content_digest,
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_signatures_np,
        ngram_jaccard_pairs,
        signature_jaccard_filter,
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

    # Stage 1: per-doc fingerprints — MinHash signature AND exact
    # content digest in ONE corpus scan (stage name kept "signatures"
    # for resume continuity; schema is (id, sig, digest)).  Snapshotted
    # so banding (and any re-banding with different band counts) never
    # re-shingles the corpus, and so exact-dup detection never re-reads
    # it: at corpus scale a second full scan for the digest costs more
    # than everything downstream of it combined.  Default is the
    # vectorized numpy path; the md5/DuckDB-reproducible family is
    # behind --portable-minhash.
    sig_fn = (
        minhash_signatures if args.portable_minhash else minhash_signatures_np
    )
    fp_sig = fp + f"|h={args.num_hashes}|k={args.shingle_k}" + (
        "|portable" if args.portable_minhash else
        f"|np|mm={args.minhash_method}"
    ) + f"|sm={args.shingle_mode}|digest" + (
        "|sh" if args.store_shingles else ""
    )
    sig_kwargs = {} if args.portable_minhash else {
        "method": args.minhash_method,
        "with_shingles": args.store_shingles,
    }
    signatures = timed("signatures", lambda: run_stage(
        spark, args.output, "signatures",
        lambda: sig_fn(
            docs, id_col=id_c, text_col=text_c,
            num_hashes=args.num_hashes, shingle_k=args.shingle_k,
            shingle_mode=args.shingle_mode,
            extras={"digest": content_digest(text_c)}, **sig_kwargs,
        ),
        input_fingerprint=fp_sig,
    ))

    # Stage 2: exact-duplicate edges (member -> min id of digest group),
    # derived from the fingerprint snapshot — narrow rows, no corpus
    # read.  Emitted as edges, not groups, so stage 5's component union
    # handles exact and near dups uniformly.
    def _exact_edges():
        groups = (
            signatures.select(F.col(id_c), "digest")
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
        input_fingerprint=fp_sig + "|exact",
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

    # Stage 4: Jaccard verification of candidates (precision set) —
    # signature-estimate pre-filter first (cheap, signature-sized),
    # exact shingle Jaccard over the survivors only.
    verify_impl = "sql" if args.portable_minhash else "np"
    fp_verify = (fp_cand + f"|t={args.threshold}|pm={args.prefilter_margin}"
                 + f"|vi={verify_impl}")

    def _verified():
        cand = candidates
        if args.prefilter_margin >= 0:
            cand = signature_jaccard_filter(
                candidates, signatures, id_col=id_c,
                min_estimate=max(0.0, args.threshold - args.prefilter_margin),
            )
        if args.store_shingles:
            # store-only verify: the stored sh arrays come from the same
            # kernel the "np" impl would run over the text — identical
            # jaccard values, one corpus scan fewer
            from onto_text_tag_spark.operators.dedup import (
                jaccard_from_shingle_arrays,
            )

            return jaccard_from_shingle_arrays(
                cand, signatures.select(id_c, "sh"),
                threshold=args.threshold, id_col=id_c,
            )
        return ngram_jaccard_pairs(
            docs, cand, id_col=id_c, text_col=text_c,
            shingle_k=args.shingle_k, threshold=args.threshold,
            shingle_mode=args.shingle_mode, shingle_impl=verify_impl,
        )

    verified = timed("verified", lambda: run_stage(
        spark, args.output, "verified", _verified,
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
