"""Incremental PQ code-store maintenance (plans/pq_absorb.py):
absorbing embedding deltas batch-by-batch must leave the stored codes
EXACTLY equal to a from-scratch encode over the union, replays must
no-op, codebook edits must refuse, and the additive error stats must
match an exact recompute — mirroring test_ivf_absorb.py."""

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
def codebooks():
    # m=2 subspaces of dim 4, ksub=4 centroids each — derived from
    # deterministic vectors, every centroid distinct
    base = _vec_rows(4, seed=77, start=0)
    return [
        [[float(x) for x in v[s * 4:(s + 1) * 4]] for _, v in base]
        for s in range(2)
    ]


def test_absorb_equals_from_scratch_and_noops(spark, tmp_path, codebooks):
    from onto_text_tag_spark.operators.similarity import (
        pq_encode_with_error,
    )
    from onto_text_tag_spark.plans.pq_absorb import (
        absorb_pq_batch,
        init_pq_root,
        load_codebooks,
        pq_store_report,
    )
    from onto_text_tag_spark.sinks import read_stage

    root = str(tmp_path / "pq")
    init_pq_root(spark, root, codebooks)
    assert load_codebooks(spark, root) == codebooks

    all_rows = _vec_rows(60, seed=5)
    b1 = spark.createDataFrame(all_rows[:35], ["vec_id", "embedding"])
    # b2 OVERLAPS b1 (ids 30-34 reappear, as crawl re-fetches do) —
    # the absorb must encode only never-seen ids
    b2 = spark.createDataFrame(all_rows[30:], ["vec_id", "embedding"])

    s1 = absorb_pq_batch(spark, root, b1, batch_fp="e1")
    assert s1["status"] == "committed" and s1["n_new_vecs"] == 35
    s2 = absorb_pq_batch(spark, root, b2, batch_fp="e2")
    assert s2["status"] == "committed" and s2["n_new_vecs"] == 25
    assert s2["n_vecs_total"] == 60

    stored = {
        r["vec_id"]: (list(r["codes"]), round(r["recon_err"], 9))
        for r in read_stage(spark, root, "pq_codes").collect()
    }
    union = spark.createDataFrame(all_rows, ["vec_id", "embedding"])
    scratch = {
        r["vec_id"]: (list(r["codes"]), round(r["recon_err"], 9))
        for r in pq_encode_with_error(union, codebooks).collect()
    }
    assert stored == scratch

    # replay: committed no-op, stage untouched
    rep = absorb_pq_batch(spark, root, b1, batch_fp="e1")
    assert rep["status"] == "noop_already_committed"
    assert read_stage(spark, root, "pq_codes").count() == 60

    # additive error stats == exact recompute over the union encode;
    # per-batch trend rows present
    report = pq_store_report(spark, root)
    assert report["n_vecs"] == 60 and report["m"] == 2
    exact_mean = sum(e for _, e in scratch.values()) / 60
    assert abs(report["mean_recon_err"] - exact_mean) < 1e-6
    assert [b["batch"] for b in report["batches"]] == ["e1", "e2"]
    assert sum(b["n"] for b in report["batches"]) == 60


def test_codebook_edit_refused(spark, tmp_path, codebooks):
    from onto_text_tag_spark.plans.pq_absorb import (
        absorb_pq_batch,
        init_pq_root,
    )
    from onto_text_tag_spark.sinks import read_stage, write_stage

    root = str(tmp_path / "pq")
    init_pq_root(spark, root, codebooks)
    b1 = spark.createDataFrame(_vec_rows(10, seed=5),
                               ["vec_id", "embedding"])
    absorb_pq_batch(spark, root, b1, batch_fp="e1")

    # tamper: nudge every codebook centroid in place while keeping the
    # manifest's pinned fingerprint claim — exactly the hazard
    from onto_text_tag_spark.sinks import read_manifest

    cb = read_stage(spark, root, "pq_codebooks")
    rows = cb.withColumn(
        "centroid",
        F.expr("transform(centroid, x -> x + 0.001)"),
    ).collect()
    old = read_manifest(root, "pq_codebooks")["metrics"]
    write_stage(
        spark.createDataFrame(rows, cb.schema), root, "pq_codebooks",
        input_fingerprint="tampered", metrics=old,
    )

    b2 = spark.createDataFrame(_vec_rows(10, seed=6, start=100),
                               ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="fingerprint"):
        absorb_pq_batch(spark, root, b2, batch_fp="e2")


def test_in_batch_duplicate_vec_ids_absorbed_once(spark, tmp_path,
                                                  codebooks):
    from onto_text_tag_spark.plans.pq_absorb import (
        absorb_pq_batch,
        init_pq_root,
        pq_store_report,
    )
    from onto_text_tag_spark.sinks import read_stage

    root = str(tmp_path / "pq")
    init_pq_root(spark, root, codebooks)
    rows = _vec_rows(10, seed=5)
    doubled = spark.createDataFrame(rows + rows[:4],
                                    ["vec_id", "embedding"])
    s = absorb_pq_batch(spark, root, doubled, batch_fp="dup")
    assert s["n_new_vecs"] == 10
    assert read_stage(spark, root, "pq_codes").count() == 10
    assert pq_store_report(spark, root)["n_vecs"] == 10


def test_encode_with_error_matches_pq_encode_and_numpy(spark, codebooks):
    import numpy as np

    from onto_text_tag_spark.operators.similarity import (
        pq_encode,
        pq_encode_with_error,
    )

    emb = spark.createDataFrame(_vec_rows(20, seed=9),
                                ["vec_id", "embedding"])
    plain = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, codebooks).collect()}
    withe = {r["vec_id"]: (list(r["codes"]), r["recon_err"])
             for r in pq_encode_with_error(emb, codebooks).collect()}
    assert {i: c for i, (c, _) in withe.items()} == plain

    cb = np.asarray(codebooks, dtype=np.float64)
    for i, v in _vec_rows(20, seed=9):
        v = np.asarray(v, dtype=np.float64)
        err = 0.0
        for s in range(2):
            dists = ((cb[s] - v[s * 4:(s + 1) * 4]) ** 2).sum(1)
            err += float(dists.min())
        assert abs(withe[i][1] - err) < 1e-9, i


def test_pq_index_job_e2e(tmp_path, spark):
    """spark-submit e2e: --init trains codebooks + encodes the seed
    corpus, a second submit absorbs the delta, --report prints the
    error trend; resubmit of the same delta is a committed no-op."""
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
             os.path.join(repo, "jobs", "pq_index.py"), *script_args],
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
    root = os.path.join(tmp, "pqidx")

    got = submit("--root", root, "--init", "--input", seed,
                 "--m", "2", "--ksub", "4", "--iterations", "2")
    assert got["init"]["status"] == "initialized"
    assert got["absorb"]["status"] == "committed"
    assert got["absorb"]["n_new_vecs"] == 40
    assert got["report"]["n_vecs"] == 40
    assert got["report"]["mean_recon_err"] > 0

    got2 = submit("--root", root, "--input", delta)
    assert got2["absorb"]["status"] == "committed"
    assert got2["absorb"]["n_new_vecs"] == 15
    assert got2["report"]["n_vecs"] == 55
    assert len(got2["report"]["batches"]) == 2

    rep = submit("--root", root, "--input", delta)  # replay: no-op
    assert rep["absorb"]["status"] == "noop_already_committed"
    health = submit("--root", root, "--report")
    assert health["n_vecs"] == 55 and health["m"] == 2
