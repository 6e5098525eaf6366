"""End-to-end test of jobs/media_dedup.py in its deployment form:
submitting two video batches into one root must leave the live pair
ledger EXACTLY equal to the batch operator over the union (cross-batch
planted near-dup included), the first submit must bootstrap the root,
and a re-submitted batch must be a committed no-op."""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit(tmp: str, *script_args: str) -> dict:
    pkg = os.path.join(tmp, "pkg.zip")
    if not os.path.exists(pkg):
        with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as zf:
            pkgdir = os.path.join(REPO, "onto_text_tag_spark")
            for root, _dirs, files in os.walk(pkgdir):
                for f in files:
                    if f.endswith(".py"):
                        p = os.path.join(root, f)
                        zf.write(p, os.path.relpath(p, REPO))
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pkg,
            os.path.join(REPO, "jobs", "media_dedup.py"),
            "--no-warmup", *script_args,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


def _avi(seed: int, scale: int = 100) -> bytes:
    from onto_text_tag_spark.functions import media_codecs as mc

    nf, h, w = 70 + seed % 5, 6, 8
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    frames = np.stack(
        [(xx * 3 + yy * 5 + (ff * ff * (seed % 11 + 2)) % 251 + c * 7)
         % 256 for c in range(3)],
        axis=3,
    )
    frames = (frames * scale // 100).astype(np.uint8)
    return mc.encode_avi(frames, fps=10)


def _rows(ids, near_of=None):
    out = []
    for i in ids:
        if near_of and i in near_of:
            out.append((str(i), "video", "avi",
                        _avi(near_of[i], scale=90)))
        else:
            out.append((str(i), "video", "avi", _avi(i)))
    return out


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, format string, payload binary",
    )


@pytest.fixture(scope="module")
def job_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("mediadedup"))


def test_media_dedup_job_two_batches_equal_batch_operator(
        spark, job_tmp):
    from onto_text_tag_spark.operators.multimodal import (
        video_near_duplicates,
    )
    from onto_text_tag_spark.plans.image_absorb import read_media_dups

    rows_a = _rows(range(10), near_of={7: 3})
    rows_b = _rows(range(10, 20), near_of={15: 3, 19: 11})
    in_a = os.path.join(job_tmp, "batch_a.parquet")
    in_b = os.path.join(job_tmp, "batch_b.parquet")
    _media(spark, rows_a).coalesce(1).write.parquet(in_a)
    _media(spark, rows_b).coalesce(1).write.parquet(in_b)
    root = os.path.join(job_tmp, "store")

    # first submit bootstraps the root
    s1 = _spark_submit(job_tmp, "--root", root, "--input", in_a,
                       "--family", "video")
    assert s1["status"] == "committed" and s1["n_new_items"] == 10
    s2 = _spark_submit(job_tmp, "--root", root, "--input", in_b,
                       "--family", "video")
    assert s2["status"] == "committed"
    assert s2["n_items_total"] == 20

    expected = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_near_duplicates(
            _media(spark, rows_a + rows_b), max_dist=8,
            max_bucket_size=200).collect()
    }
    live = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in read_media_dups(spark, root, "video").collect()
    }
    assert live == expected
    for pair in [("3", "7"), ("15", "3"), ("11", "19")]:
        a, b = sorted(pair)
        assert (a, b) in live, pair

    # re-submitting batch B is a committed no-op
    s3 = _spark_submit(job_tmp, "--root", root, "--input", in_b,
                       "--family", "video")
    assert s3["status"] == "noop_already_committed"
    assert read_media_dups(spark, root, "video").count() == len(expected)
