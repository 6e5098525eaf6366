"""Incremental IVF index maintenance (plans/ivf_absorb.py): absorbing
embedding deltas batch-by-batch must leave the stored index EXACTLY
equal to a from-scratch assignment over the union, replays must no-op,
centroid edits must refuse, and the health report's additive stats
must match an exact recompute."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _vec_rows(n, dim=8, seed=3, start=0):
    rng = random.Random(seed)
    rows = []
    for i in range(start, start + n):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    return rows


@pytest.fixture(scope="module")
def centroids():
    return [(cid, v) for cid, v in _vec_rows(4, seed=99, start=0)]


def test_absorb_equals_from_scratch_and_noops(spark, tmp_path, centroids):
    from onto_text_tag_spark.operators.similarity import (
        ivf_cell_assignments,
    )
    from onto_text_tag_spark.plans.ivf_absorb import (
        absorb_embeddings,
        init_ivf_root,
        ivf_index_report,
        load_centroids,
    )
    from onto_text_tag_spark.sinks import read_stage

    root = str(tmp_path / "ivf")
    init_ivf_root(spark, root, centroids)
    assert load_centroids(spark, root) == [
        (c, [float(x) for x in v]) for c, v in centroids
    ]

    all_rows = _vec_rows(60, seed=5)
    b1 = spark.createDataFrame(all_rows[:35], ["vec_id", "embedding"])
    # b2 OVERLAPS b1 (ids 30-34 reappear, as crawl re-fetches do) —
    # the absorb must assign only never-seen ids
    b2 = spark.createDataFrame(all_rows[30:], ["vec_id", "embedding"])

    s1 = absorb_embeddings(spark, root, b1, batch_fp="e1")
    assert s1["status"] == "committed" and s1["n_new_vecs"] == 35
    s2 = absorb_embeddings(spark, root, b2, batch_fp="e2")
    assert s2["status"] == "committed" and s2["n_new_vecs"] == 25
    assert s2["n_vecs_total"] == 60

    stored = read_stage(spark, root, "ivf_cells")
    union = spark.createDataFrame(all_rows, ["vec_id", "embedding"])
    scratch = ivf_cell_assignments(union, centroids)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, scratch.collect())
    )

    # replay: committed no-op, stage untouched
    rep = absorb_embeddings(spark, root, b1, batch_fp="e1")
    assert rep["status"] == "noop_already_committed"
    assert read_stage(spark, root, "ivf_cells").count() == 60

    # additive stats == exact recompute over the union assignment
    stats = {
        r["cell"]: (r["n"], round(r["sum_score"], 6))
        for r in read_stage(spark, root, "ivf_cell_stats").collect()
    }
    exact = {
        r["cell"]: (r["n"], round(r["s"], 6))
        for r in scratch.groupBy("cell")
        .agg(F.count("*").alias("n"), F.sum("cscore").alias("s"))
        .collect()
    }
    assert stats == exact

    rpt = ivf_index_report(spark, root)
    assert rpt["n_vecs"] == 60
    assert rpt["n_centroids"] == 4
    assert rpt["max_cell"] >= rpt["mean_cell"] > 0
    assert rpt["occupancy_skew"] >= 1.0
    assert -1.0 <= rpt["mean_assignment_score"] <= 1.0


def test_centroid_edit_refused(spark, tmp_path, centroids):
    from onto_text_tag_spark.plans.ivf_absorb import (
        absorb_embeddings,
        init_ivf_root,
    )
    from onto_text_tag_spark.sinks import write_stage

    root = str(tmp_path / "ivf")
    init_ivf_root(spark, root, centroids)
    # overwrite the centroid stage with a DIFFERENT set, keeping the
    # old manifest fingerprint claim out of sync
    tampered = [(c, v) for c, v in _vec_rows(4, seed=100, start=0)]
    cents_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in tampered],
        "cell long, centroid array<double>",
    )
    from onto_text_tag_spark.sinks import read_manifest

    old_fp = read_manifest(root, "ivf_centroids")["metrics"][
        "centroid_fingerprint"]
    write_stage(cents_df, root, "ivf_centroids",
                input_fingerprint="tampered",
                metrics={"centroid_fingerprint": old_fp,
                         "n_centroids": 4})
    b = spark.createDataFrame(_vec_rows(5, seed=7), ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="retrain"):
        absorb_embeddings(spark, root, b, batch_fp="e1")


def test_ivf_index_job_e2e(tmp_path, spark):
    """spark-submit e2e: --init trains + assigns the seed corpus, a
    second submit absorbs the delta, --report prints health; resubmit
    of the same delta is a committed no-op."""
    import json
    import os
    import subprocess
    import sys
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = str(tmp_path)
    pkg = os.path.join(tmp, "pkg.zip")
    with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as zf:
        pkgdir = os.path.join(repo, "onto_text_tag_spark")
        for root, _dirs, files in os.walk(pkgdir):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, repo))

    def submit(*script_args):
        env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
        out = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--conf", "spark.ui.enabled=false", "--py-files", pkg,
             os.path.join(repo, "jobs", "ivf_index.py"), *script_args],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        return json.loads(
            [ln for ln in out.stdout.splitlines()
             if ln.startswith("{")][-1]
        )

    seed = os.path.join(tmp, "seed.parquet")
    delta = os.path.join(tmp, "delta.parquet")
    spark.createDataFrame(_vec_rows(40, seed=21),
                          ["vec_id", "embedding"]).write.parquet(seed)
    spark.createDataFrame(_vec_rows(15, seed=22, start=40),
                          ["vec_id", "embedding"]).write.parquet(delta)
    root = os.path.join(tmp, "idx")

    got = submit("--root", root, "--init", "--input", seed,
                 "--num-centroids", "4", "--kmeans-iterations", "2")
    assert got["init"]["status"] == "initialized"
    assert got["absorb"]["status"] == "committed"
    assert got["absorb"]["n_new_vecs"] == 40
    assert got["report"]["n_vecs"] == 40

    got2 = submit("--root", root, "--input", delta)
    assert got2["absorb"]["status"] == "committed"
    assert got2["absorb"]["n_new_vecs"] == 15
    assert got2["report"]["n_vecs"] == 55

    rep = submit("--root", root, "--input", delta)  # replay: no-op
    assert rep["absorb"]["status"] == "noop_already_committed"
    health = submit("--root", root, "--report")
    assert health["n_vecs"] == 55 and health["n_centroids"] == 4


def test_in_batch_duplicate_vec_ids_absorbed_once(spark, tmp_path, centroids):
    """A crawl re-fetch can repeat a vec_id WITHIN one delta batch; the
    absorb must dedupe it or the index gains a doubled row and the
    additive stats double-count (breaking absorb == from-scratch)."""
    from onto_text_tag_spark.operators.similarity import ivf_cell_assignments
    from onto_text_tag_spark.plans.ivf_absorb import (
        absorb_embeddings,
        init_ivf_root,
    )
    from onto_text_tag_spark.sinks import read_stage

    root = str(tmp_path / "ivf_dup")
    init_ivf_root(spark, root, centroids)
    rows = _vec_rows(10, seed=7)
    doubled = spark.createDataFrame(rows + rows[:4], ["vec_id", "embedding"])

    s = absorb_embeddings(spark, root, doubled, batch_fp="dup1")
    assert s["status"] == "committed" and s["n_new_vecs"] == 10

    stored = read_stage(spark, root, "ivf_cells")
    assert stored.count() == 10
    scratch = ivf_cell_assignments(
        spark.createDataFrame(rows, ["vec_id", "embedding"]), centroids
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    stats = {
        r["cell"]: r["n"]
        for r in read_stage(spark, root, "ivf_cell_stats").collect()
    }
    exact = {
        r["cell"]: r["n"]
        for r in scratch.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert stats == exact
