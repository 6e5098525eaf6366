"""spark-submit entry point for KG stage compaction.

File-level append commits (jobs/kg_update.py, the streaming ingest
sink) grow a stage by a few part-files per batch; after many batches
the small-files problem sets in — at web scale, scan task count and
file-listing cost track file count, not data size.  This job rewrites
the requested stages into right-sized files (Iceberg's
``rewrite_data_files`` maintenance action): row content is unchanged,
the stage's input fingerprint is kept (resume semantics survive — a
compaction is not a logical change), and the snapshot log records the
file-count change as an auditable commit.

Usage:
    spark-submit --master local[N] --py-files pkg.zip jobs/kg_compact.py \
        --kg <kg root> [--stages mentions doc_terms triples] \
        [--target-mb 128]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True, help="KG snapshot root")
    ap.add_argument("--stages", nargs="*",
                    default=["mentions", "doc_terms", "triples"],
                    help="stages to compact (append-grown ones)")
    ap.add_argument("--target-mb", type=int, default=128,
                    help="target parquet file size")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.kg_absorb import compact_stage
    from onto_text_tag_spark.session import apply_engine_conf

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    report = {}
    for stage in args.stages:
        sealed = compact_stage(
            spark, args.kg, stage,
            target_bytes_per_file=args.target_mb << 20,
        )
        report[stage] = {
            "rows": sealed["total_rows"],
            **sealed["metrics"]["compaction"],
        }
    print(json.dumps({"status": "compacted", "stages": report}))
    spark.stop()


if __name__ == "__main__":
    main()
