"""spark-submit job: generate a deterministic synthetic web-page corpus.

Rows match the input_hint schema (url, warc_ts, html:binary, text, lang)
with ``text`` byte-identical to the extractor output over ``html`` by
construction.  Generation is per-row seeded, so any executor count yields
the same corpus — the same parquet feeds both parallelism levels of the
scaling-efficiency run.

    spark-submit --py-files pkg.zip jobs/gen_corpus.py \
        --n-docs 200000 --output /tmp/corpus.parquet
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--id-start", type=int, default=0,
                    help="first doc id: rows are pure functions of "
                    "(seed, id), so disjoint id ranges slice one "
                    "deterministic corpus (delta batches for the "
                    "incremental-update bench)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--min-sents", type=int, default=40)
    ap.add_argument("--max-sents", type=int, default=120)
    ap.add_argument("--filler", type=float, default=0.95,
                    help="probability a sentence is non-matching filler; "
                    "real web pages mention few ontology terms")
    ap.add_argument("--warc-output", default=None,
                    help="also export the corpus as Common-Crawl-style "
                    ".warc.gz shards (one per partition, executor-side)")
    ap.add_argument("--dup-frac", type=float, default=0.0,
                    help="fraction of rows planted as duplicates of an "
                    "earlier row (~30%% byte-exact mirrors, rest "
                    "perturbed near-dups)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.corpus import distributed_documents_df
    from onto_text_tag_spark.session import apply_engine_conf

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    df = distributed_documents_df(
        spark, args.n_docs, seed=args.seed, partitions=args.partitions,
        min_sents=args.min_sents, max_sents=args.max_sents,
        filler_prob=args.filler, dup_frac=args.dup_frac,
        id_start=args.id_start,
    )
    df.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.n_docs} docs to {args.output}")
    if args.warc_output:
        import shutil

        from onto_text_tag_spark.sources.warc import write_warc_shards

        shutil.rmtree(args.warc_output, ignore_errors=True)
        corpus_back = spark.read.parquet(args.output)
        if args.partitions:
            # parquet read-partitioning is byte-binned (few fat tasks);
            # export the asked-for shard count instead
            corpus_back = corpus_back.repartition(args.partitions)
        shards = write_warc_shards(corpus_back, args.warc_output).collect()
        print(f"exported {sum(s['records'] for s in shards)} records to "
              f"{len(shards)} WARC shards in {args.warc_output}")
    spark.stop()


if __name__ == "__main__":
    main()
