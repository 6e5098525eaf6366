"""End-to-end test of jobs/dedup_corpus.py in its deployment form
(spark-submit --py-files): planted exact and near duplicates must be
dropped, the lexicographically-min member kept, and a re-run must
resume from snapshots with identical counts."""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

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
            os.path.join(REPO, "jobs", "dedup_corpus.py"),
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
    return str(tmp_path_factory.mktemp("dedupjob"))


@pytest.fixture(scope="module")
def corpus_with_dups(job_tmp, spark):
    from onto_text_tag_spark.corpus import distributed_documents_df

    base = distributed_documents_df(spark, 300, seed=11, partitions=4)
    # 20 exact duplicates: same text, url suffixed (base url sorts first
    # -> base is each cluster's representative and must survive)
    exact = (
        base.orderBy("url").limit(20)
        .withColumn("url", F.concat(F.col("url"), F.lit("?dup")))
    )
    # 15 near duplicates: one appended token -> shingle Jaccard ~ 1
    near = (
        base.orderBy(F.col("url").desc()).limit(15)
        .withColumn("url", F.concat(F.col("url"), F.lit("?near")))
        .withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    )
    path = os.path.join(job_tmp, "corpus.parquet")
    base.unionByName(exact).unionByName(near).write.parquet(path)
    return path


def test_dedup_job_drops_planted_duplicates(job_tmp, corpus_with_dups, spark):
    out_dir = os.path.join(job_tmp, "dedup_out")
    res = _spark_submit(
        job_tmp, "--input", corpus_with_dups, "--output", out_dir,
    )
    assert res["n_docs_in"] == 335
    assert res["n_exact_edges"] >= 20
    assert res["n_verified"] >= 30  # exact pairs verify at J=1.0 too
    assert res["n_dropped"] >= 35  # all planted dups (plus any synthetic)
    assert res["n_docs_out"] == res["n_docs_in"] - res["n_dropped"]

    deduped = spark.read.parquet(os.path.join(out_dir, "deduped", "data"))
    urls = {r.url for r in deduped.select("url").collect()}
    assert not any(u.endswith("?dup") or u.endswith("?near") for u in urls)
    # every planted cluster kept its representative (the base url)
    corpus = spark.read.parquet(corpus_with_dups)
    planted = {
        r.url.split("?")[0]
        for r in corpus.where(F.col("url").contains("?")).collect()
    }
    assert planted <= urls

    # resume: unchanged input -> all stages skipped, identical counts
    again = _spark_submit(
        job_tmp, "--input", corpus_with_dups, "--output", out_dir,
    )
    assert again["n_docs_out"] == res["n_docs_out"]
    assert sum(again["stage_sec"].values()) < sum(res["stage_sec"].values())

    # threshold is part of the verify fingerprint -> changing it re-runs
    # verification and can only drop fewer pairs at a higher bar
    strict = _spark_submit(
        job_tmp, "--input", corpus_with_dups, "--output", out_dir,
        "--threshold", "0.99",
    )
    assert strict["n_verified"] <= res["n_verified"]
