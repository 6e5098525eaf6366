"""End-to-end test of the node-embedding job (jobs/kg_embed.py via
spark-submit): walk corpus -> Word2Vec vectors -> cosine neighbors,
resumable stages; embedding geometry reflects graph structure on a
two-cluster graph."""

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
            os.path.join(REPO, "jobs", "kg_embed.py"),
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
    return str(tmp_path_factory.mktemp("embedjob"))


@pytest.fixture(scope="module")
def edges(job_tmp, spark):
    from onto_text_tag_spark.session import local_df

    # two dense 6-cliques joined by ONE bridge edge: embedding geometry
    # should put same-clique nodes closer than cross-clique ones
    rows = []
    for prefix in ("a", "b"):
        names = [f"{prefix}{i}" for i in range(6)]
        for i in range(6):
            for j in range(i + 1, 6):
                rows.append((names[i], names[j]))
    rows.append(("a0", "b0"))
    path = os.path.join(job_tmp, "edges.parquet")
    local_df(spark, rows, "src string, dst string").write.parquet(path)
    return path


def test_embed_job_stages_and_geometry(job_tmp, edges, spark):
    out_dir = os.path.join(job_tmp, "embed_out")
    res = _submit(
        job_tmp, "--edges", edges, "--output", out_dir, "--dim", "16",
        "--walks-per-node", "8", "--walk-length", "10",
    )
    assert set(res["stage_sec"]) == {"walks", "vectors", "neighbors"}
    assert res["n_vectors"] == 12
    assert res["n_neighbor_rows"] == 12 * 3

    from onto_text_tag_spark.sinks import read_stage

    vecs = {r["node"]: r["vector"]
            for r in read_stage(spark, out_dir, "vectors").collect()}
    assert all(len(v) == 16 for v in vecs.values())
    # geometry: mean same-clique cosine exceeds mean cross-clique cosine
    import math

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / (math.sqrt(sum(a * a for a in u))
                    * math.sqrt(sum(b * b for b in v)) + 1e-12)

    same, cross = [], []
    nodes = sorted(vecs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            (same if u[0] == v[0] else cross).append(cos(vecs[u], vecs[v]))
    assert sum(same) / len(same) > sum(cross) / len(cross)

    # resume: stages skip, identical vector count
    res2 = _submit(
        job_tmp, "--edges", edges, "--output", out_dir, "--dim", "16",
        "--walks-per-node", "8", "--walk-length", "10",
    )
    assert res2["n_vectors"] == 12
    assert all(v < 1.0 for v in res2["stage_sec"].values()), res2
