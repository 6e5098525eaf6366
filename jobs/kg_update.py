"""spark-submit entry point for INCREMENTAL KG maintenance: absorb a
new crawl batch into an existing ``jobs/kg_build.py`` snapshot root
without rebuilding it.

north_rule: at 10^12-document scale a crawl delta must never trigger a
full rebuild.  Cost model per batch:

* tagging ∝ |batch| (only never-seen urls are tagged — a distributed
  left-anti join against the live ``doc_terms`` snapshot);
* ``mentions`` / ``doc_terms`` / ``triples/pred=mentions`` grow by
  file-level APPEND — prior batches are not rewritten (Iceberg's append
  commit, emulated as idempotent batch-prefixed part-file copies);
* the co-occurrence edge aggregate is REWRITTEN by a pair-keyed weight
  sum (``merge_cooccurrence_edges``: weights over disjoint doc sets are
  additive) — the LSM-style compaction; the edge set is ≪ corpus-sized;
* ``is_a`` triples and the closure are ontology-derived — untouched.

Equality with a full rebuild over the union corpus is pinned by
tests/test_kg_update_job.py, and the same algebra is DuckDB-oracle-
checked by the ``kg_cooccur_incremental`` driver query.

Commit protocol (single writer per root, crash-safe, idempotent):

1. stage the delta (mentions, doc_terms, mention triples, delta edges,
   merged edges) as ordinary resumable snapshots under
   ``<root>/_staging/<batch_fp>/`` — a re-run after any crash reuses
   them via their input fingerprints;
2. append staged part-files into the live stage dirs under
   deterministic ``batch-<fp>-NNNNN.parquet`` names (a re-run skips
   files that already landed);
3. swap the merged co-occurrence subtree in via rename-old → copy-new →
   drop-old (``_recover_swap`` completes or rolls back a torn swap on
   restart);
4. seal each touched stage with ``sinks.commit_stage``: manifest
   rebuilt from parquet footers, marker re-fingerprinted, and a new
   snapshot appended to the stage's ``_SNAPSHOT_LOG.jsonl`` — the
   Iceberg metadata commit that makes the batch visible;
5. drop the staging dir.

A batch whose fingerprint already appears in the ``triples`` snapshot
log is a committed no-op: re-submitting the same delta reports the live
totals and exits.

Usage:
    spark-submit --master local[N] --py-files pkg.zip jobs/kg_update.py \
        --kg <kg_build output root> --input <delta docs parquet>
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import time


def _append_batch_files(src_data: str, dst_data: str, tag: str) -> int:
    """Idempotent file-level append: copy staged part-files into the live
    stage dir under deterministic batch-prefixed names."""
    os.makedirs(dst_data, exist_ok=True)
    copied = 0
    files = sorted(
        f for f in os.listdir(src_data) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        dst = os.path.join(dst_data, f"batch-{tag}-{i:05d}.parquet")
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(src_data, f), dst)
            copied += 1
    return copied


def _swap_subtree(staged_data: str, live_dir: str) -> None:
    """Replace ``live_dir`` with the staged parquet dir: rename-old →
    copy-new → drop-old.  On an object store this is Iceberg's atomic
    manifest swap; on a filesystem the torn states are recovered by
    ``_recover_swap``."""
    bak = live_dir + ".swap-old"
    if os.path.exists(live_dir):
        os.rename(live_dir, bak)
    shutil.copytree(staged_data, live_dir)
    shutil.rmtree(bak, ignore_errors=True)


def _recover_swap(live_dir: str) -> None:
    bak = live_dir + ".swap-old"
    if not os.path.exists(bak):
        return
    if os.path.exists(live_dir):
        shutil.rmtree(bak)  # copy completed; drop the backup
    else:
        os.rename(bak, live_dir)  # roll the torn swap back


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True,
                    help="existing jobs/kg_build.py snapshot root")
    ap.add_argument("--input", required=True,
                    help="delta documents parquet (new crawl batch)")
    ap.add_argument("--ontology", nargs="*", default=[])
    ap.add_argument("--fixture", choices=["mini", "driver"], default="mini")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the steady-state warmup pass (measured "
                    "time then includes one-time JVM JIT + Python worker "
                    "forks)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import (
        cooccurrence_edges_from_arrays,
        doc_term_arrays,
        merge_cooccurrence_edges,
    )
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.kg_pipeline import (
        extract_texts,
        load_ontology_rows,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import (
        commit_stage,
        fingerprint_parquet_inputs,
        read_manifest,
        read_stage,
        run_stage,
        snapshot_log,
    )

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        # Same steady-state warmup as jobs/kg_build.py: fork the Python
        # workers, JIT the codegen paths, touch the input footers once —
        # amortized on a long-lived cluster, a fixed distortion on a
        # fresh local JVM.
        import pandas as _pd  # noqa: F401

        def _noop(it):
            for b in it:
                yield b

        spark.range(0, 10_000, numPartitions=4).toDF("id").mapInPandas(
            _noop, schema="id long"
        ).count()
        spark.read.parquet(args.input).limit(1000).count()

    t0 = time.time()
    stage_sec: dict[str, float] = {}

    def timed(name, fn):
        s = time.time()
        out = fn()
        stage_sec[name] = round(time.time() - s, 2)
        return out

    batch_fp = fingerprint_parquet_inputs([args.input])
    tag = batch_fp[:12]
    live_triples = os.path.join(args.kg, "triples", "data")
    live_cooccur = os.path.join(live_triples, "pred=co_occurs_with")
    live_mention_triples = os.path.join(live_triples, "pred=mentions")

    # idempotent re-submission: the batch is already committed
    for snap in snapshot_log(args.kg, "triples"):
        if snap.get("metrics", {}).get("batch_fingerprint") == batch_fp:
            print(json.dumps({
                "status": "noop_already_committed",
                "batch_fingerprint": batch_fp,
                "n_mentions_total": read_manifest(
                    args.kg, "mentions")["total_rows"],
                "n_triples_total": snap["total_rows"],
                "sec": round(time.time() - t0, 2),
            }))
            spark.stop()
            return

    _recover_swap(live_cooccur)

    onto_rows = load_ontology_rows(args.ontology, args.fixture)
    dict_rows = build_dictionary_rows(onto_rows)

    docs = extract_texts(spark.read.parquet(args.input))
    if args.lang and "lang" in docs.columns:
        docs = docs.where(F.col("lang") == args.lang)
    id_col = "url" if "url" in docs.columns else "doc_id"

    # only never-seen urls join the KG (url-level idempotence; in-place
    # page updates need retraction, which an aggregate-merge cannot
    # express — rebuild the affected partition instead)
    old_doc_terms = read_stage(spark, args.kg, "doc_terms")
    new_docs = docs.join(
        old_doc_terms.select(F.col("url").alias(id_col)),
        on=id_col, how="left_anti",
    )

    # --- stage the delta as ordinary resumable snapshots ------------------
    staging = os.path.join(args.kg, "_staging", tag)
    delta_mentions = timed("tag_delta", lambda: run_stage(
        spark, staging, "mentions",
        lambda: tag_documents(new_docs, dict_rows, id_col=id_col),
        input_fingerprint=batch_fp,
    ))
    delta_doc_terms = timed("doc_terms_delta", lambda: run_stage(
        spark, staging, "doc_terms",
        lambda: doc_term_arrays(delta_mentions),
        input_fingerprint=batch_fp,
    ))
    timed("mention_triples_delta", lambda: run_stage(
        spark, staging, "mention_triples",
        lambda: delta_doc_terms.select(
            F.col("url").alias("subj"),
            F.explode("_terms").alias("obj"),
            F.lit(None).cast("long").alias("weight"),
        ),
        input_fingerprint=batch_fp,
    ))
    delta_edges = timed("delta_edges", lambda: run_stage(
        spark, staging, "delta_edges",
        lambda: cooccurrence_edges_from_arrays(delta_doc_terms),
        input_fingerprint=batch_fp,
    ))
    old_edges = spark.read.parquet(live_cooccur).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"), "weight"
    )
    timed("merge_edges", lambda: run_stage(
        spark, staging, "merged_cooccur",
        lambda: merge_cooccurrence_edges(old_edges, delta_edges).select(
            F.col("src").alias("subj"),
            F.col("dst").alias("obj"),
            F.col("weight").cast("long").alias("weight"),
        ),
        input_fingerprint=batch_fp,
    ))
    n_new_docs = read_manifest(staging, "doc_terms")["total_rows"]
    n_new_mentions = read_manifest(staging, "mentions")["total_rows"]

    # --- commit: append + swap, then seal manifests + snapshot log --------
    def _commit():
        _append_batch_files(
            os.path.join(staging, "mentions", "data"),
            os.path.join(args.kg, "mentions", "data"), tag)
        _append_batch_files(
            os.path.join(staging, "doc_terms", "data"),
            os.path.join(args.kg, "doc_terms", "data"), tag)
        _append_batch_files(
            os.path.join(staging, "mention_triples", "data"),
            live_mention_triples, tag)
        _swap_subtree(
            os.path.join(staging, "merged_cooccur", "data"), live_cooccur)

        metrics = {
            "batch_fingerprint": batch_fp,
            "batch_docs": n_new_docs,
            "batch_mentions": n_new_mentions,
        }
        for stage in ("mentions", "doc_terms", "triples"):
            prev = read_manifest(args.kg, stage)["input_fingerprint"]
            combined = hashlib.md5(
                f"{prev}+{batch_fp}".encode()).hexdigest()
            commit_stage(args.kg, stage,
                         input_fingerprint=combined, metrics=metrics)
        shutil.rmtree(staging, ignore_errors=True)

    timed("commit", _commit)

    dt = time.time() - t0
    n_triples = read_manifest(args.kg, "triples")["total_rows"]
    print(json.dumps({
        "status": "committed",
        "batch_fingerprint": batch_fp,
        "n_new_docs": n_new_docs,
        "n_new_mentions": n_new_mentions,
        "n_mentions_total": read_manifest(args.kg, "mentions")["total_rows"],
        "n_triples_total": n_triples,
        "snapshots": len(snapshot_log(args.kg, "triples")),
        "sec": round(dt, 2),
        "stage_sec": stage_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
