"""End-to-end test of incremental KG maintenance (jobs/kg_update.py):
build on batch 1, absorb batch 2 as a delta, and require the updated
root to EQUAL a full rebuild over the union corpus — triples identical
per predicate, co-occurrence weights identical (additive merge algebra).
Re-submitting the same batch must be a committed no-op, and the triples
snapshot log must record one snapshot per commit.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest

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
    return str(tmp_path_factory.mktemp("kgupd"))


@pytest.fixture(scope="module")
def corpora(job_tmp, spark):
    """Full corpus + a disjoint 2-way split of it (batch = crawl delta)."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import distributed_documents_df

    full = distributed_documents_df(spark, 400, seed=11, partitions=4)
    paths = {}
    for name, df in [
        ("full", full),
        ("batch1", full.where(F.crc32("url") % 2 == 0)),
        ("batch2", full.where(F.crc32("url") % 2 == 1)),
    ]:
        p = os.path.join(job_tmp, f"{name}.parquet")
        df.write.parquet(p)
        paths[name] = p
    return paths


def _triples(spark, root):
    return (
        spark.read.parquet(os.path.join(root, "triples", "data"))
        .select("pred", "subj", "obj", "weight")
    )


def test_incremental_update_equals_full_rebuild(job_tmp, corpora, spark):
    inc_root = os.path.join(job_tmp, "kg_inc")
    full_root = os.path.join(job_tmp, "kg_full")

    built = _spark_submit(job_tmp, "kg_build.py", "--no-warmup",
                          "--input", corpora["batch1"],
                          "--output", inc_root)
    assert built["n_mentions"] > 0

    upd = _spark_submit(job_tmp, "kg_update.py", "--no-warmup",
                        "--compact-after", "1",
                        "--kg", inc_root, "--input", corpora["batch2"])
    assert upd["status"] == "committed"
    assert upd["n_new_docs"] > 0
    assert upd["snapshots"] == 2  # initial build + this batch
    # --compact-after rewired the append-grown stages inline; the
    # per-predicate equality below then also proves compaction kept
    # every row through the job path
    assert set(upd["compacted"]) == {"mentions", "doc_terms", "triples"}
    for comp in upd["compacted"].values():
        assert comp["files_after"] <= comp["files_before"]

    rebuilt = _spark_submit(job_tmp, "kg_build.py", "--no-warmup",
                            "--input", corpora["full"],
                            "--output", full_root)

    # totals agree between the incremental root and the full rebuild
    assert upd["n_triples_total"] == rebuilt["n_triples"]
    assert upd["n_mentions_total"] == rebuilt["n_mentions"]

    # exact per-predicate triple equality (weights included)
    inc = {tuple(r) for r in _triples(spark, inc_root).collect()}
    ful = {tuple(r) for r in _triples(spark, full_root).collect()}
    assert inc == ful

    # manifests re-sealed: totals from footers match the union
    with open(os.path.join(inc_root, "triples", "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["total_rows"] == rebuilt["n_triples"]
    assert manifest["metrics"]["batch_docs"] == upd["n_new_docs"]

    # re-submitting the SAME batch is a committed no-op
    again = _spark_submit(job_tmp, "kg_update.py", "--no-warmup",
                          "--compact-after", "1",
                          "--kg", inc_root, "--input", corpora["batch2"])
    assert again["status"] == "noop_already_committed"
    assert again["n_triples_total"] == rebuilt["n_triples"]
    assert "compacted" not in again  # no-op absorb skips maintenance too
    from onto_text_tag_spark.sinks import snapshot_log
    # build + absorb + compaction; the no-op re-submit added nothing
    assert len(snapshot_log(inc_root, "triples")) == 3


def test_compaction_preserves_content_and_resume(tmp_path, spark):
    """Stage compaction (plans/kg_absorb.py:compact_stage): after two
    absorb commits grow the stages by appended files, compaction must
    shrink the file count WITHOUT changing row content, keep the input
    fingerprint (resume still sees the stage as current), and append an
    auditable snapshot recording the file-count change."""
    import os

    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        compact_stage,
        init_kg_root,
    )
    from onto_text_tag_spark.sinks import (
        read_manifest,
        snapshot_log,
        stage_is_current,
    )

    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 200, seed=13, partitions=4)
    docs.cache().count()
    for k in (0, 1):
        absorb_batch(
            spark, root, docs.where(F.crc32("url") % 2 == k),
            dict_rows, batch_fp=f"b{k}",
        )

    triples_path = os.path.join(root, "triples", "data")
    before = sorted(
        map(tuple, spark.read.parquet(triples_path).collect())
    )
    for stage in ("mentions", "doc_terms", "triples"):
        man = read_manifest(root, stage)
        n_snaps = len(snapshot_log(root, stage))
        sealed = compact_stage(spark, root, stage,
                               target_bytes_per_file=64 << 20)
        comp = sealed["metrics"]["compaction"]
        assert comp["files_after"] <= comp["files_before"]
        assert sealed["total_rows"] == man["total_rows"]
        # not a logical change: fingerprint kept, resume still current
        assert sealed["input_fingerprint"] == man["input_fingerprint"]
        assert stage_is_current(root, stage, man["input_fingerprint"])
        assert len(snapshot_log(root, stage)) == n_snaps + 1

    after = sorted(
        map(tuple, spark.read.parquet(triples_path).collect())
    )
    assert after == before  # row multiset unchanged, hive layout intact


def test_retract_job_equals_build_without_batch(job_tmp, corpora, spark):
    """jobs/kg_update.py --retract is the exact inverse of an absorb at
    the job surface: build the KG over the FULL corpus, retract batch2's
    urls (with --fold-retractions so the physical stages equal the live
    view), and the root must equal a from-scratch build over batch1
    alone — mention triples as sets, co-occurrence weights exactly."""
    root_full = os.path.join(job_tmp, "kg_retract")
    _spark_submit(job_tmp, "kg_build.py", "--no-warmup",
                  "--input", corpora["full"], "--output", root_full)
    urls = os.path.join(job_tmp, "batch2_urls.parquet")
    if not os.path.exists(urls):
        spark.read.parquet(corpora["batch2"]).select("url") \
            .coalesce(1).write.parquet(urls)
    upd = _spark_submit(job_tmp, "kg_update.py",
                        "--kg", root_full, "--retract", urls,
                        "--fold-retractions")
    assert upd["retract"]["status"] == "committed"
    assert upd["fold"]["status"] == "folded"
    assert upd["fold"]["n_urls_folded"] == upd["retract"]["n_retracted_docs"]

    root_b1 = os.path.join(job_tmp, "kg_b1_only")
    _spark_submit(job_tmp, "kg_build.py", "--no-warmup",
                  "--input", corpora["batch1"], "--output", root_b1)
    got = {tuple(r) for r in _triples(spark, root_full).collect()}
    want = {tuple(r) for r in _triples(spark, root_b1).collect()}
    assert got == want

    # idempotence at the job surface: re-submitting the same retraction
    # (same urls fingerprint) is a committed no-op
    again = _spark_submit(job_tmp, "kg_update.py",
                          "--kg", root_full, "--retract", urls)
    assert again["retract"]["status"] == "noop_already_committed"
    assert {tuple(r) for r in _triples(spark, root_full).collect()} == want


def test_refresh_nodes_tracks_absorbs_and_retractions(spark, tmp_path):
    """plans/kg_absorb.py:refresh_nodes — the nodes-table maintenance
    action: bootstrap on an absorb-built root, equality with a direct
    node_table rebuild over the live doc_terms, no-op idempotence, and
    degree/doc-set correctness after a retraction."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
        read_live_doc_terms,
        refresh_nodes,
        retract_batch,
    )
    from onto_text_tag_spark.plans.kg_pipeline import node_table
    from onto_text_tag_spark.sinks import read_manifest, read_stage

    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 120, seed=29, partitions=4)
    docs.cache().count()
    absorb_batch(spark, root, docs, dict_rows, batch_fp="b0")

    # roots built before the nodes stage existed need the meta bootstrap
    with pytest.raises(ValueError):
        refresh_nodes(spark, root)
    out = refresh_nodes(spark, root, class_meta=dict_rows)
    assert out["status"] == "refreshed"

    def snap():
        return sorted(
            map(tuple, read_stage(spark, root, "nodes")
                .select("id", "label", "ont", "degree", "kind").collect())
        )

    want = sorted(map(tuple, node_table(
        read_live_doc_terms(spark, root), dict_rows).collect()))
    assert snap() == want
    assert read_manifest(root, "nodes")["partition_by"] == ["kind"]

    # unchanged inputs -> committed no-op (fingerprint-keyed)
    assert refresh_nodes(spark, root)["status"] == "noop_already_current"

    # retract a url subset; refresh (meta now reused from the stage)
    gone = docs.select("url").where(F.crc32("url") % 4 == 0)
    retract_batch(spark, root, gone, batch_fp="r0")
    assert refresh_nodes(spark, root)["status"] == "refreshed"
    after = read_stage(spark, root, "nodes")
    live_urls = {
        r["url"] for r in read_live_doc_terms(spark, root)
        .select("url").collect()
    }
    doc_ids = {
        r["id"] for r in after.where(F.col("kind") == "document").collect()
    }
    assert doc_ids == live_urls  # retracted docs left the node set
    want2 = sorted(map(tuple, node_table(
        read_live_doc_terms(spark, root),
        after.where(F.col("kind") == "class")
        .select("id", "label", "ont"),
    ).collect()))
    assert snap() == want2


def test_absorb_links_incremental_equals_batch(spark, tmp_path):
    """Link-graph absorb: two crawl batches == one batch extraction over
    the union; replays and re-delivered urls are no-ops."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.weblinks import (
        extract_links,
        host_graph,
    )
    from onto_text_tag_spark.plans.kg_absorb import absorb_links
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sinks import read_stage

    def page(host, i, targets):
        anchors = "".join(
            f'<a href="https://{t}/x">{t}</a>' for t in targets
        )
        return (f"https://{host}/p/{i}",
                f"<html><body>{anchors}</body></html>".encode())

    schema = "url string, html binary"
    b1 = local_df(spark, [
        page("a.com", 1, ["b.com", "c.com"]),
        page("b.com", 1, ["c.com"]),
    ], schema)
    b2 = local_df(spark, [
        page("a.com", 2, ["b.com"]),
        # re-delivered url from batch 1 with DIFFERENT links: must not
        # double or alter its already-committed edges
        page("a.com", 1, ["zzz.com"]),
    ], schema)
    root = str(tmp_path / "kg_links_root")

    s1 = absorb_links(spark, root, b1, batch_fp="b1")
    assert s1["status"] == "committed" and s1["n_new_links"] == 3
    # replay: committed no-op
    assert absorb_links(spark, root, b1, batch_fp="b1")["status"] == \
        "noop_already_committed"

    s2 = absorb_links(spark, root, b2, batch_fp="b2")
    assert s2["status"] == "committed" and s2["n_new_links"] == 1

    union_new = b1.unionByName(
        b2.where(F.col("url") == "https://a.com/p/2")
    )
    want_links = sorted(map(tuple, extract_links(union_new).collect()))
    got_links = sorted(map(tuple, read_stage(spark, root, "links")
                           .collect()))
    assert got_links == want_links
    want_hosts = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(extract_links(union_new)).collect()
    }
    got_hosts = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in read_stage(spark, root, "host_graph").collect()
    }
    assert got_hosts == want_hosts
    assert got_hosts[("a.com", "b.com")] == 2  # merged across batches


def test_absorb_term_sketch_incremental_equals_batch(spark, tmp_path):
    """sketch_k absorbs maintain the term_sketch stage EXACTLY equal to
    a from-scratch sketch over every absorbed document (the KMV merge
    is lossless); replayed batches no-op; a k mismatch refuses instead
    of silently corrupting the merge."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import term_sketch_partials
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        absorb_term_sketch,
        init_kg_root,
        read_live_mentions,
    )
    from onto_text_tag_spark.sinks import read_stage

    onto = mini_ontology()
    rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 60, seed=9, partitions=2)
    b1 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b2 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    s1 = absorb_batch(spark, root, b1, rows, batch_fp="s1", lang=None,
                      sketch_k=16)
    assert "term_sketch" in s1["stage_sec"]
    absorb_batch(spark, root, b2, rows, batch_fp="s2", lang=None,
                 sketch_k=16)

    stored = read_stage(spark, root, "term_sketch")
    full = term_sketch_partials(read_live_mentions(spark, root), k=16)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, full.collect())
    )

    # replayed batch: committed no-op (the mentions arg is not touched)
    rep = absorb_term_sketch(
        spark, root, read_live_mentions(spark, root), batch_fp="s2", k=16
    )
    assert rep["status"] == "noop_already_committed"
    after = read_stage(spark, root, "term_sketch")
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, stored.collect())
    )

    with pytest.raises(ValueError, match="k=16"):
        absorb_term_sketch(
            spark, root, read_live_mentions(spark, root),
            batch_fp="s3", k=8,
        )


def test_sketch_flag_build_then_update(job_tmp, corpora, spark):
    """kg_build --sketch seeds the term_sketch stage; kg_update --sketch
    merges the crawl delta into it; the result equals a from-scratch
    sketch over the full corpus' live mentions."""
    from onto_text_tag_spark.operators.cooccur import term_sketch_partials
    from onto_text_tag_spark.plans.kg_absorb import read_live_mentions
    from onto_text_tag_spark.sinks import read_manifest, read_stage

    root = os.path.join(job_tmp, "kg_sketch")
    _spark_submit(job_tmp, "kg_build.py", "--no-warmup",
                  "--input", corpora["batch1"], "--output", root,
                  "--no-nodes", "--sketch", "16")
    assert read_manifest(root, "term_sketch")["metrics"]["k"] == 16

    _spark_submit(job_tmp, "kg_update.py", "--no-warmup",
                  "--kg", root, "--input", corpora["batch2"],
                  "--sketch", "16")
    stored = read_stage(spark, root, "term_sketch")
    full = term_sketch_partials(read_live_mentions(spark, root), k=16)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_absorb_trends_incremental_equals_batch(spark, tmp_path):
    """trends_bucket absorbs keep the trends stage equal to the batch
    computation over every absorbed document (counts additive across
    the disjoint batch doc sets, deltas re-derived over the merged
    series); replays no-op; a bucket-granularity mismatch refuses."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import mention_trends
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        absorb_trends,
        init_kg_root,
        read_live_mentions,
    )
    from onto_text_tag_spark.sinks import read_stage, snapshot_log

    onto = mini_ontology()
    rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 60, seed=11, partitions=2)
    b1 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b2 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    s1 = absorb_batch(spark, root, b1, rows, batch_fp="t1", lang=None,
                      trends_bucket="second")
    assert "trends" in s1["stage_sec"]
    absorb_batch(spark, root, b2, rows, batch_fp="t2", lang=None,
                 trends_bucket="second")

    stored = read_stage(spark, root, "trends")
    expected = mention_trends(
        read_live_mentions(spark, root),
        docs.select(F.col("url").cast("string").alias("url"), "warc_ts"),
        bucket="second",
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, expected.collect())
    )
    assert stored.select("bucket").distinct().count() > 1

    n_snaps = len(snapshot_log(root, "trends"))
    rep = absorb_trends(
        spark, root, read_live_mentions(spark, root), docs,
        batch_fp="t2", bucket="second",
    )
    assert rep["status"] == "noop_already_committed"
    assert len(snapshot_log(root, "trends")) == n_snaps

    with pytest.raises(ValueError, match="bucket"):
        absorb_trends(
            spark, root, read_live_mentions(spark, root), docs,
            batch_fp="t3", bucket="hour",
        )


def test_sketch_enabled_mid_life_catches_up(spark, tmp_path):
    """Turning --sketch on AFTER batches were already absorbed must not
    silently undercount: the first sketch absorb detects the coverage
    gap, folds the full stored mentions stage in (exact — KMV merges
    are idempotent under overlap), and records the caught-up batches so
    later absorbs are O(batch) again and replays no-op."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import term_sketch_partials
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
        read_live_mentions,
    )
    from onto_text_tag_spark.sinks import read_stage, snapshot_log

    onto = mini_ontology()
    rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 60, seed=13, partitions=2)
    b1 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b2 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    # batch 1 WITHOUT the sketch flag — the stage does not exist yet
    absorb_batch(spark, root, b1, rows, batch_fp="m1", lang=None)
    # batch 2 WITH it: must catch up over batch 1's mentions too
    absorb_batch(spark, root, b2, rows, batch_fp="m2", lang=None,
                 sketch_k=16)

    stored = read_stage(spark, root, "term_sketch")
    full = term_sketch_partials(read_live_mentions(spark, root), k=16)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, full.collect())
    )
    caught = [
        s["metrics"].get("caught_up_batches")
        for s in snapshot_log(root, "term_sketch")
        if s.get("metrics", {}).get("caught_up_batches")
    ]
    assert caught == [["m1"]]

    # replaying batch 1 with the flag: main no-op, sketch already covers
    # it via the catch-up record — side absorb is a no-op too
    rep = absorb_batch(spark, root, b1, rows, batch_fp="m1", lang=None,
                       sketch_k=16)
    assert rep["status"] == "noop_already_committed"
    assert rep["term_sketch"]["status"] == "noop_already_committed"
    after = read_stage(spark, root, "term_sketch")
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, stored.collect())
    )


def test_trends_enabled_mid_life_warns_then_replay_backfills(
        spark, tmp_path):
    """Trend counts cannot be caught up from stored state (warc_ts is
    not retained), so a mid-life --trends enable must WARN and record
    the uncovered batches — and replaying those batches through
    absorb_batch must back-fill them exactly from the batch-tagged
    mention files while the main commit stays a no-op."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import mention_trends
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
        read_live_mentions,
    )
    from onto_text_tag_spark.sinks import read_stage, snapshot_log

    onto = mini_ontology()
    rows = build_dictionary_rows(onto)
    root = str(tmp_path / "kg")
    init_kg_root(spark, root, onto)
    docs = distributed_documents_df(spark, 60, seed=17, partitions=2)
    b1 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b2 = docs.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    absorb_batch(spark, root, b1, rows, batch_fp="t1", lang=None)
    with pytest.warns(UserWarning, match="UNDERCOUNTS"):
        absorb_batch(spark, root, b2, rows, batch_fp="t2", lang=None,
                     trends_bucket="second")

    missing = [
        s["metrics"].get("missing_batches")
        for s in snapshot_log(root, "trends")
        if s.get("metrics", {}).get("missing_batches")
    ]
    assert missing == [["t1"]]

    # replay batch 1 with the flag: main no-op + exact trends back-fill
    rep = absorb_batch(spark, root, b1, rows, batch_fp="t1", lang=None,
                       trends_bucket="second")
    assert rep["status"] == "noop_already_committed"
    assert rep["trends"]["status"] == "committed"

    stored = read_stage(spark, root, "trends")
    expected = mention_trends(
        read_live_mentions(spark, root),
        docs.select(F.col("url").cast("string").alias("url"), "warc_ts"),
        bucket="second",
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, expected.collect())
    )

    # the gap is healed: a third batch absorbs without a warning
    import warnings as _w

    b3 = distributed_documents_df(spark, 12, seed=19, partitions=1)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        absorb_batch(spark, root, b3, rows, batch_fp="t3", lang=None,
                     trends_bucket="second")
