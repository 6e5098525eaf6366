"""End-to-end test of jobs/dedup_update.py in its deployment form:
absorbing a delta into a jobs/dedup_corpus.py root must leave the live
corpus view EXACTLY equal to a full batch rebuild over base ∪ delta —
including the demotion case where a bridging delta doc merges two base
components and revokes a previously-kept representative.  Re-submitting
the same delta must be a committed no-op."""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 64 hashes / 16 bands ⇒ r=4 rows per band: candidate-recall at the
# planted bridge similarity (J≈0.81) is ~1 − (1 − 0.81⁴)¹⁶ ≈ 0.9999,
# so the bridge edges are found deterministically by BOTH the batch
# rebuild and the incremental pass (identical signatures either way).
KNOBS = ["--num-hashes", "64", "--bands", "16", "--threshold", "0.8"]


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
def job_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("dedupupd"))


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def split_corpus(job_tmp, spark):
    """(base_path, delta_path, union_path) with planted structures:

    * docA (base) / docB (base): word-shingle J ≈ 0.73 — SEPARATE base
      clusters (docB = docA + bridge + beta words);
    * docD (delta) = docA + bridge words: J(A,D) ≈ 0.91, J(D,B) ≈ 0.81
      — a BRIDGE that merges {A} and {B}; min id docA wins, so the
      previously-kept docB must be demoted and docD dropped;
    * docX (base) and its delta exact copy docX?exact — cross exact dup;
    * two identical brand-new delta docs — intra-delta exact group;
    * a delta near-dup (appended token) of a base synthetic doc.
    """
    from onto_text_tag_spark.corpus import distributed_documents_df
    from onto_text_tag_spark.session import local_df

    synth = distributed_documents_df(spark, 200, seed=23, partitions=4) \
        .select("url", "text")
    a_text = _words("alpha", 100)
    bridge = _words("bridge", 10)
    beta = _words("beta", 25)
    planted_base = local_df(
        spark,
        [
            ("https://p.example/docA", a_text),
            ("https://p.example/docB", f"{a_text} {bridge} {beta}"),
            ("https://p.example/docX", _words("xray", 60)),
        ],
        "url string, text string",
    )
    base = synth.unionByName(planted_base)

    near_src = synth.orderBy("url").limit(1).collect()[0]
    delta = local_df(
        spark,
        [
            ("https://p.example/docD", f"{a_text} {bridge}"),
            ("https://p.example/docX?exact", _words("xray", 60)),
            ("https://p.example/new1", _words("gamma", 40)),
            ("https://p.example/new2", _words("gamma", 40)),
            (near_src["url"] + "?near", near_src["text"] + " zz"),
        ],
        "url string, text string",
    )

    base_path = os.path.join(job_tmp, "base.parquet")
    delta_path = os.path.join(job_tmp, "delta.parquet")
    union_path = os.path.join(job_tmp, "union.parquet")
    base.write.parquet(base_path)
    delta.write.parquet(delta_path)
    base.unionByName(delta).write.parquet(union_path)
    return base_path, delta_path, union_path


def test_absorb_equals_full_rebuild(job_tmp, split_corpus, spark):
    from onto_text_tag_spark.plans.dedup_absorb import read_deduped
    from onto_text_tag_spark.sinks import read_stage

    base_path, delta_path, union_path = split_corpus
    inc_root = os.path.join(job_tmp, "inc_root")
    full_root = os.path.join(job_tmp, "full_root")

    base_res = _spark_submit(
        job_tmp, "dedup_corpus.py",
        "--input", base_path, "--output", inc_root, *KNOBS)
    # docA and docB both survive the base run (J≈0.73 < 0.8)
    base_live = {
        r["url"] for r in read_stage(spark, inc_root, "deduped")
        .select("url").collect()
    }
    assert {"https://p.example/docA", "https://p.example/docB"} <= base_live

    upd = _spark_submit(
        job_tmp, "dedup_update.py",
        "--dedup", inc_root, "--base-input", base_path,
        "--input", delta_path, *KNOBS)
    assert upd["status"] == "committed"
    assert upd["n_batch_docs"] == 5
    # docD + docX?exact + one of new1/new2 + ?near drop ⇒ 1 survivor
    assert upd["n_batch_survivors"] == 1
    assert upd["n_demoted_base"] == 1  # docB, revoked by the bridge

    full_res = _spark_submit(
        job_tmp, "dedup_corpus.py",
        "--input", union_path, "--output", full_root, *KNOBS)

    inc_live = {
        r["url"] for r in read_deduped(spark, inc_root)
        .select("url").collect()
    }
    full_live = {
        r["url"] for r in read_stage(spark, full_root, "deduped")
        .select("url").collect()
    }
    assert inc_live == full_live
    assert "https://p.example/docA" in inc_live
    assert "https://p.example/docB" not in inc_live  # demoted
    assert "https://p.example/docD" not in inc_live  # bridge doc dropped
    assert "https://p.example/new1" in inc_live
    assert "https://p.example/new2" not in inc_live
    assert "https://p.example/docX?exact" not in inc_live

    # the merged cluster map must equal the rebuild's map exactly
    inc_map = {
        (r["node"], r["comp"])
        for r in read_stage(spark, inc_root, "clusters").collect()
    }
    full_map = {
        (r["node"], r["comp"])
        for r in read_stage(spark, full_root, "clusters").collect()
    }
    assert inc_map == full_map

    # live count bookkeeping agrees with the rebuild's output count
    assert upd["n_docs_live"] == full_res["n_docs_out"]
    assert base_res["n_docs_out"] >= len(base_live)


def test_store_shingles_root_absorbs_without_base_input(
        job_tmp, split_corpus, spark):
    """A --store-shingles base root absorbs the SAME delta with no
    --base-input at all (verification off the fingerprint store), and
    every output — base verified pairs, post-absorb live view, merged
    cluster map — is identical to the text-verify root's (which
    test_absorb_equals_full_rebuild pinned against the full rebuild)."""
    from onto_text_tag_spark.plans.dedup_absorb import read_deduped
    from onto_text_tag_spark.sinks import read_stage

    base_path, delta_path, _union = split_corpus
    inc_root = os.path.join(job_tmp, "inc_root")  # built by the e2e test
    sh_root = os.path.join(job_tmp, "sh_root")

    _spark_submit(
        job_tmp, "dedup_corpus.py",
        "--input", base_path, "--output", sh_root,
        "--store-shingles", *KNOBS)
    assert "sh" in read_stage(spark, sh_root, "signatures").columns
    # the base run's store-only verify reproduces the text-verify
    # pairs exactly (base has no >=0.8 near-dup pairs, so both are
    # empty here; value parity on non-empty pairs is pinned by
    # tests/test_dedup_similarity.py::
    # test_stored_shingle_verify_matches_text_verify)
    sh_ver = {(r["id_a"], r["id_b"], r["jaccard"])
              for r in read_stage(spark, sh_root, "verified").collect()}
    txt_ver = {(r["id_a"], r["id_b"], r["jaccard"])
               for r in read_stage(spark, inc_root, "verified").collect()}
    assert sh_ver == txt_ver

    upd = _spark_submit(
        job_tmp, "dedup_update.py",
        "--dedup", sh_root, "--input", delta_path, *KNOBS)
    assert upd["status"] == "committed"
    assert upd["n_batch_survivors"] == 1
    assert upd["n_demoted_base"] == 1

    sh_live = {r["url"] for r in read_deduped(spark, sh_root)
               .select("url").collect()}
    plain_live = {r["url"] for r in read_deduped(spark, inc_root)
                  .select("url").collect()}
    assert sh_live == plain_live
    sh_map = {(r["node"], r["comp"])
              for r in read_stage(spark, sh_root, "clusters").collect()}
    plain_map = {(r["node"], r["comp"])
                 for r in read_stage(spark, inc_root, "clusters").collect()}
    assert sh_map == plain_map


def test_absorb_resubmit_is_noop(job_tmp, split_corpus, spark):
    base_path, delta_path, _union = split_corpus
    inc_root = os.path.join(job_tmp, "inc_root")
    again = _spark_submit(
        job_tmp, "dedup_update.py",
        "--dedup", inc_root, "--base-input", base_path,
        "--input", delta_path, *KNOBS)
    assert again["status"] == "noop_already_committed"

    from onto_text_tag_spark.plans.dedup_absorb import read_deduped

    assert again["n_docs_live"] == read_deduped(spark, inc_root).count()
