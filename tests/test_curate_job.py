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


def test_curate_job_decontam_and_redact(job_tmp, corpus, spark):
    """--decontam gates out documents containing the benchmark n-grams
    (reason counts exactly equal the operator run) and --redact adds a
    'redacted' stage over the curated corpus; re-submit is a no-op."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.curation import curation_flags
    from onto_text_tag_spark.sinks import read_stage, snapshot_log

    docs = spark.read.parquet(corpus)
    # pick a benchmark bigram that provably exists: first two tokens of
    # a document the default gates keep
    kept_ids = [
        r[0] for r in curation_flags(docs, id_col="url")
        .where(F.col("reason") == "kept").select("url").limit(5).collect()
    ]
    some = docs.where(F.col("url") == kept_ids[0]).select("text").first()[0]
    # same tokenization as the gate (word chars only): "smoking," must
    # become token "smoking" or the planted gram never matches
    import re as _re

    toks = [t for t in _re.split(r"[^a-z0-9_]+", some.lower()) if t]
    gram = f"{toks[0]} {toks[1]}"

    out_dir = os.path.join(job_tmp, "cur_dec")
    res = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--decontam", gram, "--redact",
    )
    assert "redacted" in res["stage_sec"]

    expected = {
        r["reason"]: r["n"]
        for r in curation_flags(docs, id_col="url",
                                sample_mod=10, sample_keep=10,  # job defaults
                                benchmark_ngrams=[gram])
        .groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["reason"]: r["n_docs"]
        for r in read_stage(spark, out_dir, "stats").collect()
    }
    assert got == expected
    assert got.get("contaminated", 0) > 0
    assert res["n_curated"] == expected.get("kept", 0)

    red = read_stage(spark, out_dir, "redacted")
    assert res["n_redacted"] == res["n_curated"] == red.count()
    assert "text" not in red.columns and "text_redacted" in red.columns
    # the synthetic corpus is PII-free: redaction must be a byte no-op
    cur = read_stage(spark, out_dir, "curated").select("url", "text")
    changed = red.join(cur, "url").where(
        F.col("text_redacted") != F.col("text")).count()
    assert changed == 0
    assert red.agg(F.sum("n_email"), F.sum("n_ipv4")).first() == (0, 0)

    logs_before = {
        s: len(snapshot_log(out_dir, s))
        for s in ("flags", "curated", "stats", "redacted")
    }
    res2 = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--decontam", gram, "--redact",
    )
    assert res2["n_curated"] == res["n_curated"]
    logs_after = {
        s: len(snapshot_log(out_dir, s))
        for s in ("flags", "curated", "stats", "redacted")
    }
    assert logs_after == logs_before  # resume: no new snapshots


def test_curate_job_paragraph_dedup_stage(job_tmp, corpus, spark):
    from onto_text_tag_spark.operators.dedup import paragraph_dedup
    from onto_text_tag_spark.sinks import read_stage

    out_dir = os.path.join(job_tmp, "cur_pd_out")
    rep = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--paragraph-dedup",
    )
    assert rep["n_para_deduped"] == rep["n_curated"]
    assert rep["n_paragraphs_kept"] <= rep["n_paragraphs"]

    # stage content == operator applied to the curated stage directly
    cur = read_stage(spark, out_dir, "curated")
    expected = {
        r["url"]: r
        for r in paragraph_dedup(cur, id_col="url").collect()
    }
    got = {
        r["url"]: r
        for r in read_stage(spark, out_dir, "para_deduped").collect()
    }
    assert set(got) == set(expected)
    for url in expected:
        assert got[url]["text"] == expected[url]["text"], url
        assert got[url]["n_kept"] == expected[url]["n_kept"], url
    # ride-along metadata survives
    assert "lang" in read_stage(spark, out_dir, "para_deduped").columns

    # re-submit is a stage-level no-op (fingerprint resume)
    rep2 = _submit(
        job_tmp, "--input", corpus, "--output", out_dir,
        "--paragraph-dedup",
    )
    assert rep2["n_para_deduped"] == rep["n_para_deduped"]
    assert rep2["stage_sec"]["para_deduped"] < rep["stage_sec"]["para_deduped"]
