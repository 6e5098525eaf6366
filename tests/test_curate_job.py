"""End-to-end test of the curation job deployment form
(jobs/curate_corpus.py via spark-submit --py-files): stage content,
resume no-op, knob-change recompute, mixing stage."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(tmp: str, *script_args: str) -> dict:
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
            os.path.join(REPO, "jobs", "curate_corpus.py"),
            "--no-warmup", *script_args,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


@pytest.fixture(scope="module")
def job_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("curjob"))


@pytest.fixture(scope="module")
def corpus(job_tmp, spark):
    from onto_text_tag_spark.corpus import distributed_documents_df

    path = os.path.join(job_tmp, "corpus.parquet")
    distributed_documents_df(
        spark, 300, seed=5, partitions=4, dup_frac=0.1
    ).write.parquet(path)
    return path


def test_curate_job_stages_resume_and_mix(job_tmp, corpus, spark):
    out_dir = os.path.join(job_tmp, "cur_out")
    res = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--mix", "en=1.0",
    )
    assert set(res["stage_sec"]) == {"flags", "curated", "stats", "mix"}
    assert res["n_input"] == 300
    assert 0 < res["n_curated"] < 300

    from onto_text_tag_spark.sinks import read_stage
    from pyspark.sql import functions as F

    flags = read_stage(spark, out_dir, "flags")
    curated = read_stage(spark, out_dir, "curated")
    stats = read_stage(spark, out_dir, "stats")
    # curated == kept flags; planted dups were dropped as duplicates
    kept = {r["url"] for r in
            flags.where(F.col("reason") == "kept").collect()}
    assert {r["url"] for r in curated.select("url").collect()} == kept
    by_reason = {r["reason"]: r["n_docs"] for r in stats.collect()}
    assert by_reason.get("duplicate", 0) > 0
    assert sum(by_reason.values()) == 300
    # mix at rate 1.0 for en keeps exactly the English curated docs
    mix = read_stage(spark, out_dir, "mix")
    en_curated = curated.where(F.col("lang") == "en").count()
    assert mix.count() == en_curated

    # resume: every stage skipped
    res2 = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--mix", "en=1.0",
    )
    assert res2["n_curated"] == res["n_curated"]
    assert all(v < 1.0 for v in res2["stage_sec"].values()), res2

    # knob change recomputes (different gate fingerprint, fewer kept)
    res3 = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--min-ws-tokens", "40", "--mix", "en=1.0",
    )
    assert res3["stage_sec"]["flags"] >= 1.0 or \
        res3["n_curated"] != res["n_curated"]
    assert res3["n_curated"] <= res["n_curated"]
