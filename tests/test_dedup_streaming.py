"""Streaming corpus-dedup ingestion: bootstrap an EMPTY dedup root
(``init_dedup_root``, stored-shingle layout), stream the corpus in two
file batches through the ``foreachBatch`` absorb sink, and require the
live deduped view to equal an in-process batch rebuild over all
documents — including a cross-EPOCH bridge doc that demotes a
previously-committed representative.  The sink never reads any corpus
file besides the incoming batch: verification runs off the stored
shingle arrays alone."""

import os

from pyspark.sql import functions as F

KNOBS = dict(num_hashes=64, bands=16, threshold=0.8, shingle_k=5,
             shingle_mode="word")


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _batch_rebuild_survivors(spark, docs):
    """The jobs/dedup_corpus.py stage composition, in-process, over the
    full corpus — the ground truth the streamed root must reproduce."""
    from onto_text_tag_spark.operators.components import (
        connected_components,
    )
    from onto_text_tag_spark.operators.dedup import (
        content_digest,
        lsh_candidate_pairs,
        minhash_signatures_np,
        ngram_jaccard_pairs,
        signature_jaccard_filter,
    )

    sigs = minhash_signatures_np(
        docs, id_col="url", text_col="text",
        num_hashes=KNOBS["num_hashes"], shingle_k=KNOBS["shingle_k"],
        shingle_mode=KNOBS["shingle_mode"],
        extras={"digest": content_digest("text")},
    ).cache()
    groups = (
        sigs.select("url", "digest").groupBy("digest")
        .agg(F.array_sort(F.collect_list("url")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    exact = groups.select(
        F.element_at("ids", 1).alias("src"),
        F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias("dst"),
    )
    cands = lsh_candidate_pairs(
        docs, id_col="url", text_col="text",
        num_hashes=KNOBS["num_hashes"], bands=KNOBS["bands"],
        shingle_k=KNOBS["shingle_k"], signatures=sigs,
    )
    cands = signature_jaccard_filter(
        cands, sigs, id_col="url",
        min_estimate=KNOBS["threshold"] - 0.1,
    )
    verified = ngram_jaccard_pairs(
        docs, cands, id_col="url", text_col="text",
        shingle_k=KNOBS["shingle_k"], threshold=KNOBS["threshold"],
        shingle_mode=KNOBS["shingle_mode"], shingle_impl="np",
    )
    clusters = connected_components(
        exact.unionByName(
            verified.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst"))
        )
    )
    drop = clusters.where(F.col("node") != F.col("comp")) \
        .select(F.col("node").alias("url"))
    survivors = {r["url"] for r in docs.join(drop, "url", "left_anti")
                 .select("url").collect()}
    cluster_map = {(r["node"], r["comp"]) for r in clusters.collect()}
    sigs.unpersist()
    return survivors, cluster_map


def test_streaming_dedup_sink_equals_batch_rebuild(spark, tmp_path):
    from onto_text_tag_spark.corpus import distributed_documents_df
    from onto_text_tag_spark.plans.dedup_absorb import (
        absorb_dedup_batch,
        init_dedup_root,
        read_deduped,
    )
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sinks import (
        read_manifest,
        read_stage,
        snapshot_log,
    )
    from onto_text_tag_spark.streaming.incremental import (
        start_dedup_update_sink,
    )

    synth = distributed_documents_df(spark, 80, seed=31, partitions=2) \
        .select("url", "text")
    a_text = _words("alpha", 100)
    bridge = _words("bridge", 10)
    # epoch 0: docA / docB near (J≈0.73 — SEPARATE clusters), docX
    b0 = synth.unionByName(local_df(
        spark,
        [
            ("https://s.example/docA", a_text),
            ("https://s.example/docB",
             f"{a_text} {bridge} {_words('beta', 25)}"),
            ("https://s.example/docX", _words("xray", 60)),
        ],
        "url string, text string",
    ))
    # epoch 1: docD bridges A-B (demotes the already-committed docB),
    # an exact cross-epoch dup, an intra-epoch exact pair
    b1 = local_df(
        spark,
        [
            ("https://s.example/docD", f"{a_text} {bridge}"),
            ("https://s.example/docX?exact", _words("xray", 60)),
            ("https://s.example/new1", _words("gamma", 40)),
            ("https://s.example/new2", _words("gamma", 40)),
        ],
        "url string, text string",
    )

    root = str(tmp_path / "duproot")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    init_dedup_root(spark, root, "url string, text string",
                    num_hashes=KNOBS["num_hashes"])
    assert len(snapshot_log(root, "clusters")) == 1  # bootstrap commit

    b0.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("url string, text string").parquet(src)
    )
    q = start_dedup_update_sink(stream, root, ckpt, **KNOBS,
                                compact_every=1)
    try:
        q.processAllAvailable()
        live0 = {r["url"] for r in read_deduped(spark, root)
                 .select("url").collect()}
        assert {"https://s.example/docA", "https://s.example/docB",
                "https://s.example/docX"} <= live0
        b1.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    docs_all = b0.unionByName(b1)
    want_live, want_map = _batch_rebuild_survivors(spark, docs_all)
    got_live = {r["url"] for r in read_deduped(spark, root)
                .select("url").collect()}
    got_map = {(r["node"], r["comp"])
               for r in read_stage(spark, root, "clusters").collect()}
    assert got_live == want_live
    assert got_map == want_map
    assert "https://s.example/docB" not in got_live  # demoted mid-stream
    assert "https://s.example/docD" not in got_live  # bridge doc dropped
    assert "https://s.example/docX?exact" not in got_live
    assert len({"https://s.example/new1", "https://s.example/new2"}
               & got_live) == 1
    demoted = {r["url"] for r in read_stage(spark, root, "demoted")
               .collect()}
    assert "https://s.example/docB" in demoted

    # the store carries the shingle arrays — the sink verified near-dups
    # without any base corpus file to read
    sig_man = read_manifest(root, "signatures")
    assert "sh" in read_stage(spark, root, "signatures").columns
    assert sig_man["total_rows"] == docs_all.count()

    # compact_every folded small-files maintenance into the sink
    assert sig_man["n_files"] == 1
    assert read_manifest(root, "deduped")["n_files"] == 1

    # replaying a committed epoch is a no-op (exactly-once commits
    # under at-least-once foreachBatch delivery)
    n_snaps = len(snapshot_log(root, "clusters"))
    replay = absorb_dedup_batch(
        spark, root, None, b1, batch_fp="stream-epoch-1", **KNOBS)
    assert replay["status"] == "noop_already_committed"
    assert len(snapshot_log(root, "clusters")) == n_snaps
    assert replay["n_docs_live"] == len(got_live)

    # checkpoint-level idempotence: restarting the SAME query over the
    # same source+checkpoint replays nothing new
    stream2 = (
        spark.readStream.schema("url string, text string").parquet(src)
    )
    q2 = start_dedup_update_sink(stream2, root, ckpt, **KNOBS)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert {r["url"] for r in read_deduped(spark, root)
            .select("url").collect()} == want_live


def test_fold_demotions_preserves_live_view(spark, tmp_path):
    """Folding the demoted delete set into the deduped files keeps the
    live view identical, empties the delete set, physically removes the
    demoted ids, and re-running is a no-op; a later absorb that demotes
    another doc appends into the emptied delete set as before."""
    from onto_text_tag_spark.plans.dedup_absorb import (
        absorb_dedup_batch,
        fold_demotions,
        init_dedup_root,
        read_deduped,
    )
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sinks import read_manifest, read_stage

    a_text = _words("alpha", 100)
    bridge = _words("bridge", 10)
    root = str(tmp_path / "foldroot")
    init_dedup_root(spark, root, "url string, text string",
                    num_hashes=KNOBS["num_hashes"])

    def absorb(rows, fp):
        return absorb_dedup_batch(
            spark, root, None,
            local_df(spark, rows, "url string, text string"),
            batch_fp=fp, **KNOBS)

    absorb([
        ("https://f.example/docA", a_text),
        ("https://f.example/docB",
         f"{a_text} {bridge} {_words('beta', 25)}"),
        ("https://f.example/docX", _words("xray", 60)),
    ], "e0")
    # docD bridges A-B -> docB (already committed) is demoted
    r1 = absorb([("https://f.example/docD", f"{a_text} {bridge}")], "e1")
    assert r1["n_demoted_base"] == 1

    live_before = {r["url"] for r in
                   read_deduped(spark, root).select("url").collect()}
    assert "https://f.example/docB" not in live_before

    res = fold_demotions(spark, root)
    assert res["status"] == "folded" and res["n_ids_folded"] == 1
    assert {r["url"] for r in read_deduped(spark, root)
            .select("url").collect()} == live_before
    assert read_manifest(root, "demoted")["total_rows"] == 0
    assert "https://f.example/docB" not in {
        r["url"] for r in read_stage(spark, root, "deduped")
        .select("url").collect()}
    assert fold_demotions(spark, root)["status"] == \
        "noop_nothing_demoted"

    # a later bridge (docY joins A's cluster? no — an EXACT dup of docX
    # with a smaller id demotes docX) appends into the emptied set
    r2 = absorb([("https://f.example/doc0X", _words("xray", 60))], "e2")
    assert r2["n_demoted_base"] == 1
    assert read_manifest(root, "demoted")["total_rows"] == 1
    assert {r["url"] for r in read_deduped(spark, root)
            .select("url").collect()} == (
        live_before - {"https://f.example/docX"}
        | {"https://f.example/doc0X"})
