"""Incremental perceptual image dedup: absorb crawl-batch media into a
dHash store at O(delta) cost, never re-hashing (let alone re-decoding)
the accumulated image corpus.

north_rule framing: the multimodal member of the incremental dedup
family (text twin: ``plans/dedup_absorb.py``).  The mergeable dedup
state is the (media_id, 4-band dHash) relation — a few dozen bytes per
image vs the payload's kilobytes — so a delta batch costs:

* decode + hash ONLY the batch's never-seen media ids (row-local
  Arrow kernel, ``operators/multimodal.py:image_dhash``);
* candidate pairs involving ≥1 delta image via the SAME banded
  machinery the text path uses (``dedup.incremental_lsh_pairs`` over
  the 4×16-bit bands as precomputed signatures): the store ships only
  (id, band, bucket) rows for buckets a delta member touches;
* exact Hamming verify of the candidates against the hash relation;
* surviving pairs + delta hashes APPEND into the live stages.

Equality contract (pinned by tests/test_image_absorb.py):
``absorb(A); absorb(B)`` yields exactly the pair set of
``image_near_duplicates(A ∪ B)`` at the same ``max_dist`` (with the
same bucket-cap setting): base-base pairs are committed history,
every pair with a delta endpoint is found by the delta-vs-store pass.

Commit protocol mirrors ``plans/dedup_absorb.py`` (single writer per
root, crash-safe, idempotent): stage delta snapshots, file-append into
the live stages under deterministic batch-prefixed names, seal with
``image_dups`` LAST — its snapshot log is the commit point.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from onto_text_tag_spark.operators.dedup import incremental_lsh_pairs
from onto_text_tag_spark.operators.multimodal import (
    image_dhash,
    verify_hamming_pairs,
)
from onto_text_tag_spark.plans.kg_absorb import _append_batch_files
from onto_text_tag_spark.sinks import (
    commit_stage,
    read_manifest,
    read_stage,
    require_file_backed_stages,
    run_stage,
    snapshot_log,
    write_stage,
)


def init_image_root(spark: SparkSession, root: str) -> None:
    """Bootstrap an EMPTY image-dedup root (empty hash store + pair
    ledger) so the entire media corpus can arrive as absorb commits."""
    write_stage(
        spark.createDataFrame(
            [], "media_id string, sig array<long>").repartition(1),
        root, "image_sigs", input_fingerprint="init",
    )
    write_stage(
        spark.createDataFrame(
            [], "id_a string, id_b string, hamming long").repartition(1),
        root, "image_dups", input_fingerprint="init",
    )


def image_batch_already_committed(root: str, batch_fp: str) -> bool:
    return any(
        s.get("metrics", {}).get("batch_fingerprint") == batch_fp
        for s in snapshot_log(root, "image_dups")
    )


def read_image_dups(spark: SparkSession, root: str) -> DataFrame:
    """The live near-duplicate pair ledger (append-grown)."""
    return read_stage(spark, root, "image_dups")


def absorb_image_batch(
    spark: SparkSession,
    root: str,
    media: DataFrame,
    batch_fp: str,
    max_dist: int = 10,
    max_bucket_size: int | None = 200,
) -> dict:
    """Commit one media batch into image-dedup root ``root`` (stage →
    append → seal).  Returns batch metrics; an already-committed
    fingerprint returns a no-op marker without touching the store."""
    require_file_backed_stages(spark, "absorb_image_batch")
    t0 = time.time()
    if image_batch_already_committed(root, batch_fp):
        return {
            "status": "noop_already_committed",
            "batch_fingerprint": batch_fp,
            "sec": round(time.time() - t0, 2),
        }

    tag = hashlib.md5(("img:" + batch_fp).encode()).hexdigest()[:12]
    staging = os.path.join(root, "_staging", f"img-{tag}")
    stored = read_stage(spark, root, "image_sigs")

    # decode+hash only never-seen ids; in-batch repeats collapse first
    # (a crawl re-fetch can repeat a media_id within one batch)
    delta_sigs = run_stage(
        spark, staging, "sigs_delta",
        lambda: image_dhash(media)
        .dropDuplicates(["media_id"])
        .join(stored.select("media_id"), "media_id", "left_anti"),
        input_fingerprint=batch_fp,
    )

    def _pairs() -> DataFrame:
        cand = incremental_lsh_pairs(
            stored, delta_sigs, id_col="media_id",
            num_hashes=4, bands=4, max_bucket_size=max_bucket_size,
        )
        all_sigs = stored.unionByName(delta_sigs)
        return verify_hamming_pairs(cand, all_sigs, max_dist)

    run_stage(
        spark, staging, "dups_delta", _pairs,
        input_fingerprint=batch_fp,
    )
    n_new_imgs = read_manifest(staging, "sigs_delta")["total_rows"]
    n_new_pairs = read_manifest(staging, "dups_delta")["total_rows"]

    _append_batch_files(
        os.path.join(staging, "sigs_delta", "data"),
        os.path.join(root, "image_sigs", "data"), tag)
    _append_batch_files(
        os.path.join(staging, "dups_delta", "data"),
        os.path.join(root, "image_dups", "data"), tag)
    metrics = {
        "batch_fingerprint": batch_fp,
        "batch_images": n_new_imgs,
        "batch_pairs": n_new_pairs,
    }
    for stage in ("image_sigs", "image_dups"):  # dups LAST: commit point
        prev = read_manifest(root, stage)["input_fingerprint"]
        combined = hashlib.md5(f"{prev}+{batch_fp}".encode()).hexdigest()
        commit_stage(root, stage, input_fingerprint=combined,
                     metrics=metrics)
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "status": "committed",
        "batch_fingerprint": batch_fp,
        "n_new_images": n_new_imgs,
        "n_new_pairs": n_new_pairs,
        "n_images_total": read_manifest(root, "image_sigs")["total_rows"],
        "n_pairs_total": read_manifest(root, "image_dups")["total_rows"],
        "sec": round(time.time() - t0, 2),
    }
