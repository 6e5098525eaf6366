"""jobs/kg_analytics.py: graph analytics over a built KG root via
spark-submit --py-files (the north_rule deployment form).

Pins: (1) every analytics stage's values equal a direct operator run
over the stored co-occurrence edges; (2) re-submitting is a no-op
(fingerprint resume); (3) changing a parameter recomputes only the
stages it shapes.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(tmp: str, script: str, *script_args: str) -> dict:
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
            *script_args,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


@pytest.fixture(scope="module")
def job_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kganalytics"))


@pytest.fixture(scope="module")
def built_root(job_tmp, spark):
    from onto_text_tag_spark.corpus import distributed_documents_df

    corpus = os.path.join(job_tmp, "corpus.parquet")
    distributed_documents_df(
        spark, 300, seed=11, partitions=4
    ).write.parquet(corpus)
    root = os.path.join(job_tmp, "kg")
    _submit(job_tmp, "kg_build.py", "--no-warmup",
            "--input", corpus, "--output", root, "--edge-scores")
    return root


def _stage_rows(spark, root, stage, cols):
    from onto_text_tag_spark.sinks import read_stage

    return {
        tuple(r) for r in read_stage(spark, root, stage).select(*cols).collect()
    }


def test_edge_scores_stage_matches_operator(built_root, spark):
    from onto_text_tag_spark.operators.cooccur import (
        association_scores_from_arrays,
    )
    from onto_text_tag_spark.sinks import read_stage

    arrays = read_stage(spark, built_root, "doc_terms")
    want = {
        tuple(r) for r in association_scores_from_arrays(arrays).collect()
    }
    got = _stage_rows(
        spark, built_root, "edge_scores",
        ["src", "dst", "weight", "df_src", "df_dst",
         "jaccard", "lift", "pmi", "npmi"],
    )
    assert got == want and got


def test_analytics_stages_match_operators_and_resume(built_root, job_tmp,
                                                     spark):
    from onto_text_tag_spark.operators.graph_metrics import (
        adamic_adar,
        degree_stats,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from onto_text_tag_spark.sinks import read_stage

    res = _submit(job_tmp, "kg_analytics.py", "--root", built_root,
                  "--pagerank-iters", "5", "--lpa-rounds", "3")
    assert set(res["stage_sec"]) == {
        "degree", "pagerank", "communities", "triangles",
        "link_predictions",
    }

    edges = (
        read_stage(spark, built_root, "triples")
        .where(F.col("pred") == "co_occurs_with")
        .select("subj", "obj", "weight")
        .withColumnRenamed("subj", "src")
        .withColumnRenamed("obj", "dst")
    )

    assert _stage_rows(spark, built_root, "degree", ["node", "degree"]) == {
        tuple(r) for r in degree_stats(edges).collect()
    }
    assert _stage_rows(
        spark, built_root, "communities", ["node", "community"]
    ) == {tuple(r) for r in label_propagation(edges, rounds=3).collect()}
    assert _stage_rows(
        spark, built_root, "triangles", ["node", "triangles"]
    ) == {tuple(r) for r in triangle_counts(edges).collect()}
    assert _stage_rows(
        spark, built_root, "pagerank", ["node", "rank"]
    ) == {
        (r["node"], round(r["rank"], 8))
        for r in pagerank(edges, iterations=5).collect()
    }
    assert _stage_rows(
        spark, built_root, "link_predictions", ["u", "w", "common", "score"]
    ) == {
        (r["u"], r["w"], r["common"], round(r["score"], 8))
        for r in adamic_adar(edges, max_neighbor_degree=64).collect()
    }

    # resume: same params -> every stage is a fingerprint no-op; the
    # snapshot logs must not grow
    from onto_text_tag_spark.sinks import snapshot_log

    log_before = {s: len(snapshot_log(built_root, s))
                  for s in res["stage_sec"]}
    _submit(job_tmp, "kg_analytics.py", "--root", built_root,
            "--pagerank-iters", "5", "--lpa-rounds", "3")
    for s, n in log_before.items():
        assert len(snapshot_log(built_root, s)) == n, s

    # parameter change recomputes only the shaped stage
    _submit(job_tmp, "kg_analytics.py", "--root", built_root,
            "--pagerank-iters", "5", "--lpa-rounds", "2")
    assert len(snapshot_log(built_root, "communities")) == \
        log_before["communities"] + 1
    assert len(snapshot_log(built_root, "pagerank")) == \
        log_before["pagerank"]
    assert _stage_rows(
        spark, built_root, "communities", ["node", "community"]
    ) == {tuple(r) for r in label_propagation(edges, rounds=2).collect()}
