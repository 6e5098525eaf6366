"""spark-submit entry point for training-data curation.

Training-data-pipeline companion to jobs/kg_build.py and
jobs/dedup_corpus.py — same deployment form (``spark-submit
--py-files``), same stage contract (resumable snapshots + lineage
manifests via onto_text_tag_spark.sinks).

Pipeline:

1. ``flags``   — per-doc audit rows (profile columns + first-failing
                 gate) from ONE corpus scan + one digest-keyed shuffle
                 (operators/curation.py:curation_flags).  Snapshotted:
                 every downstream stage reads narrow audit rows, never
                 the corpus.
2. ``curated`` — the surviving documents, full original rows: corpus
                 semi-joined against kept ids (second and last corpus
                 read).
3. ``stats``   — drop-reason rollup (docs + surviving tokens per gate)
                 from the flags snapshot.
4. ``mix``     — optional stratified mixing sample over the curated
                 stage (--mix "en=0.8,de=0.5", deterministic md5 draws;
                 operators/curation.py:stratified_sample).

Gate parameters are part of each stage's input fingerprint: re-submit
with the same corpus + knobs is a no-op resume; changing a knob
recomputes exactly the stages it shapes.

Usage:
    spark-submit --master local[8] --py-files pkg.zip \
        jobs/curate_corpus.py --input corpus.parquet --output /tmp/cur \
        --lang en --min-ws-tokens 20 --mix "en=0.9"
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="snapshot root dir")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-ws-tokens", type=int, default=20)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.01)
    ap.add_argument("--sample-mod", type=int, default=10)
    ap.add_argument("--sample-keep", type=int, default=10,
                    help="keep sample_keep/sample_mod of survivors "
                    "(default: keep all; the mixing stage is the usual "
                    "place to subsample)")
    ap.add_argument("--mix", default=None,
                    help="per-stratum keep rates over the curated stage, "
                    "e.g. 'en=0.9,de=0.5'; strata column is --mix-col")
    ap.add_argument("--mix-col", default="lang")
    ap.add_argument("--decontam", default=None,
                    help="comma-separated benchmark n-grams; documents "
                    "containing any are gated out with reason "
                    "'contaminated' (before dedup: a contaminated page "
                    "never becomes a duplicate-survivor)")
    ap.add_argument("--decontam-file", default=None,
                    help="file with one benchmark n-gram per line "
                    "(combined with --decontam)")
    ap.add_argument("--decontam-n", type=int, default=2,
                    help="token n-gram size of the benchmark set")
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="add a 'para_deduped' stage: curated docs "
                    "with every paragraph already seen earlier in the "
                    "curated corpus removed (CCNet-style, first "
                    "occurrence survives; operators/dedup.py:"
                    "paragraph_dedup)")
    ap.add_argument("--redact", action="store_true",
                    help="add a 'redacted' stage: curated docs with "
                    "emails/IPs/phone runs replaced by typed "
                    "placeholders + per-pattern audit counts")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.operators.curation import (
        curation_flags,
        stratified_sample,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import (
        fingerprint_parquet_inputs,
        read_manifest,
        run_stage,
    )

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        spark.range(0, 10_000, numPartitions=4).toDF("id").count()
        spark.read.parquet(args.input).limit(1000).count()

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    bench_grams: list[str] = []
    if args.decontam:
        bench_grams += [g.strip() for g in args.decontam.split(",")
                        if g.strip()]
    if args.decontam_file:
        with open(args.decontam_file) as fh:
            bench_grams += [ln.strip() for ln in fh if ln.strip()]
    gate_knobs = (
        args.lang, args.min_ws_tokens, args.min_stopword_ratio,
        args.sample_mod, args.sample_keep, args.id_col, args.text_col,
        tuple(sorted(set(bench_grams))), args.decontam_n,
    )
    fp = (
        fingerprint_parquet_inputs([args.input])
        + ":gates="
        + hashlib.md5(repr(gate_knobs).encode()).hexdigest()[:12]
    )

    stage_sec: dict[str, float] = {}

    def timed(name, fn):
        s = time.time()
        out = fn()
        stage_sec[name] = round(time.time() - s, 2)
        return out

    flags = timed("flags", lambda: run_stage(
        spark, args.output, "flags",
        lambda: curation_flags(
            docs, id_col=args.id_col, text_col=args.text_col,
            lang=args.lang, min_ws_tokens=args.min_ws_tokens,
            min_stopword_ratio=args.min_stopword_ratio,
            sample_mod=args.sample_mod, sample_keep=args.sample_keep,
            benchmark_ngrams=bench_grams or None,
            decontam_n=args.decontam_n,
        ),
        input_fingerprint=fp,
    ))

    kept_ids = flags.where(F.col("reason") == "kept").select(args.id_col)
    timed("curated", lambda: run_stage(
        spark, args.output, "curated",
        lambda: docs.join(kept_ids, args.id_col, "left_semi"),
        input_fingerprint=fp,
    ))

    timed("stats", lambda: run_stage(
        spark, args.output, "stats",
        lambda: flags.groupBy("reason").agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
        ),
        input_fingerprint=fp,
    ))

    report = {
        "n_input": read_manifest(args.output, "flags")["total_rows"],
        "n_curated": read_manifest(args.output, "curated")["total_rows"],
    }

    if args.mix:
        fractions = {}
        for part in args.mix.split(","):
            k, v = part.split("=")
            fractions[k.strip()] = float(v)
        mix_fp = (
            fp + ":mix="
            + hashlib.md5(
                repr((sorted(fractions.items()), args.mix_col)).encode()
            ).hexdigest()[:12]
        )
        from onto_text_tag_spark.sinks import read_stage

        timed("mix", lambda: run_stage(
            spark, args.output, "mix",
            lambda: stratified_sample(
                read_stage(spark, args.output, "curated"),
                fractions, strata_col=args.mix_col, id_col=args.id_col,
            ),
            input_fingerprint=mix_fp,
        ))
        report["n_mix"] = read_manifest(args.output, "mix")["total_rows"]

    if args.paragraph_dedup:
        from onto_text_tag_spark.operators.dedup import paragraph_dedup
        from onto_text_tag_spark.sinks import read_stage as _rs

        pd_fp = fp + ":paradedup=1"

        def _pd():
            cur = _rs(spark, args.output, "curated")
            out = paragraph_dedup(
                cur, id_col=args.id_col, text_col=args.text_col
            )
            return cur.drop(args.text_col).join(out, args.id_col)

        timed("para_deduped", lambda: run_stage(
            spark, args.output, "para_deduped", _pd,
            input_fingerprint=pd_fp,
        ))
        report["n_para_deduped"] = read_manifest(
            args.output, "para_deduped")["total_rows"]
        from onto_text_tag_spark.sinks import read_stage as _rs2
        pstat = _rs2(spark, args.output, "para_deduped").agg(
            F.sum("n_paragraphs").alias("np"),
            F.sum("n_kept").alias("nk"),
        ).collect()[0]
        report["n_paragraphs"] = pstat["np"]
        report["n_paragraphs_kept"] = pstat["nk"]

    if args.redact:
        from onto_text_tag_spark.operators.curation import redact_pii
        from onto_text_tag_spark.sinks import read_stage as _read_stage

        redact_fp = fp + ":redact=1"
        timed("redacted", lambda: run_stage(
            spark, args.output, "redacted",
            lambda: redact_pii(
                _read_stage(spark, args.output, "curated"),
                text_col=args.text_col,
            ).drop(args.text_col),
            input_fingerprint=redact_fp,
        ))
        report["n_redacted"] = read_manifest(
            args.output, "redacted")["total_rows"]

    dt = time.time() - t0
    report.update({
        "sec": round(dt, 2),
        "docs_per_sec": round(report["n_input"] / dt, 1),
        "stage_sec": stage_sec,
    })
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
