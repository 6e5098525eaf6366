"""spark-submit entry point for the full KG build.

north_rule evidence: ``spark-submit --py-files onto_text_tag_spark.zip
jobs/kg_build.py --input <docs> --ontology <owl...> --output <root>``
runs the whole DAG (extract → dictionary → tag → triples → co-occur →
closure) with per-stage resumable snapshots and lineage manifests.

Usage (local two-level scaling evidence):
    spark-submit --master local[8]  --py-files pkg.zip jobs/kg_build.py ...
    spark-submit --master local[32] --py-files pkg.zip jobs/kg_build.py ...
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--ontology", nargs="*", default=[],
                    help="OWL/OBO files (ordered; later wins collisions)")
    ap.add_argument("--output", required=True, help="snapshot root dir")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-cooccur-weight", type=int, default=1)
    ap.add_argument("--max-doc-freq", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.corpus import mini_ontology
    from onto_text_tag_spark.plans.kg_pipeline import build_kg, closure_triples
    from onto_text_tag_spark.schemas import ONTOLOGY
    from onto_text_tag_spark.sinks import (
        fingerprint_parquet_inputs,
        run_stage,
        write_stage,
    )
    from onto_text_tag_spark.sources.ontology import (
        ontology_df_from_rows,
        parse_obo,
        parse_owl_xml,
    )

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()

    if args.ontology:
        frames = []
        for i, path in enumerate(args.ontology):
            text = open(path).read()
            rows = parse_obo(text) if path.endswith(".obo") else parse_owl_xml(text)
            frames.append(ontology_df_from_rows(spark, rows, ont_order=i))
        onto = frames[0]
        for f in frames[1:]:
            onto = onto.unionByName(f)
    else:  # built-in fixture ontology (demo mode)
        onto = spark.createDataFrame(mini_ontology(), ONTOLOGY)

    docs = spark.read.parquet(args.input)
    fp = fingerprint_parquet_inputs([args.input])

    result = build_kg(
        docs, onto,
        lang_filter=args.lang or None,
        min_cooccur_weight=args.min_cooccur_weight,
        max_doc_freq=args.max_doc_freq,
    )

    mentions = run_stage(
        spark, args.output, "mentions", lambda: result.mentions,
        input_fingerprint=fp,
    )
    n_mentions = mentions.count()
    write_stage(result.triples, args.output, "triples",
                partition_by=["pred"], input_fingerprint=fp,
                metrics={"n_mentions": n_mentions})
    write_stage(closure_triples(result.isa_edges), args.output,
                "isa_closure", input_fingerprint=fp)

    n_triples = spark.read.parquet(f"{args.output}/triples/data").count()
    dt = time.time() - t0
    print(json.dumps({
        "n_mentions": n_mentions,
        "n_triples": n_triples,
        "sec": round(dt, 2),
        "triples_per_sec": round(n_triples / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
