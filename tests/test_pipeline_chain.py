"""End-to-end test of the CHAINED production pipeline in deployment
form: jobs/dedup_corpus.py over a dup-planted corpus, then
jobs/kg_build.py reading the deduped snapshot (``<out>/deduped/data``).

Pins the hand-off contract (the dedup job's corpus rewrite preserves
the input_hint schema so the KG job consumes it unchanged), that
dropped duplicates never reach the triple store, and that the KG
stage resumes idempotently on an unchanged deduped snapshot.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit(tmp: str, script: str, *script_args: str) -> dict:
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
            os.path.join(REPO, "jobs", script),
            "--no-warmup", *script_args,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


@pytest.fixture(scope="module")
def chain_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipechain"))


@pytest.fixture(scope="module")
def corpus_with_dups(chain_tmp, spark):
    from onto_text_tag_spark.corpus import distributed_documents_df

    base = distributed_documents_df(spark, 250, seed=23, partitions=4)
    exact = (
        base.orderBy("url").limit(15)
        .withColumn("url", F.concat(F.col("url"), F.lit("?dup")))
    )
    near = (
        base.orderBy(F.col("url").desc()).limit(10)
        .withColumn("url", F.concat(F.col("url"), F.lit("?near")))
        .withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    )
    path = os.path.join(chain_tmp, "corpus.parquet")
    base.unionByName(exact).unionByName(near).write.parquet(path)
    return path


def test_chain_dedup_then_kg(chain_tmp, corpus_with_dups, spark):
    dedup_out = os.path.join(chain_tmp, "dedup_out")
    kg_out = os.path.join(chain_tmp, "kg_out")

    dedup = _spark_submit(
        chain_tmp, "dedup_corpus.py",
        "--input", corpus_with_dups, "--output", dedup_out,
    )
    assert dedup["n_docs_in"] == 275
    assert dedup["n_dropped"] >= 25  # every planted dup gone

    deduped_path = os.path.join(dedup_out, "deduped", "data")
    kg = _spark_submit(
        chain_tmp, "kg_build.py",
        "--input", deduped_path, "--output", kg_out,
    )
    assert kg["n_mentions"] > 0
    assert kg["n_triples"] > kg["n_mentions"] // 2

    # no dropped duplicate may appear as a triple subject
    triples = spark.read.parquet(os.path.join(kg_out, "triples", "data"))
    mention_subjects = {
        r.subj
        for r in triples.where(F.col("pred") == "mentions")
        .select("subj").distinct().collect()
    }
    assert mention_subjects, "mention triples must exist"
    assert not any(
        u.endswith("?dup") or u.endswith("?near") for u in mention_subjects
    )
    # subjects are exactly the surviving en-language docs with mentions
    survivors = {
        r.url
        for r in spark.read.parquet(deduped_path)
        .where(F.col("lang") == "en").select("url").collect()
    }
    assert mention_subjects <= survivors

    # unchanged deduped snapshot -> KG stages resume (all skipped)
    again = _spark_submit(
        chain_tmp, "kg_build.py",
        "--input", deduped_path, "--output", kg_out,
    )
    assert again["n_triples"] == kg["n_triples"]
    assert sum(again["stage_sec"].values()) < sum(kg["stage_sec"].values())
