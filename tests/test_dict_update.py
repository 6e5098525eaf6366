"""Dictionary-delta KG maintenance (plans/kg_dict_update.py).

An ontology release is absorbed into an existing KG root by re-tagging
ONLY the affected docs and merging the signed co-occurrence delta.  The
pin is span-exact equality with a from-scratch build under the new
dictionary, in BOTH directions — including the two cases stored-span
algebra cannot reconstruct under longest-match-wins overlap resolution:

* an added longer surface SHADOWS a stored mention ("acute heart
  attack" displaces "heart attack");
* removing that surface UN-shadows the mention it was hiding (the
  span was never emitted, so only a re-tag can recover it).
"""

import os

from onto_text_tag_spark.corpus import _cls

_OBO = "http://purl.obolibrary.org/obo/"

ONTO_A = [
    _cls(_OBO, "TST:0001", "heart attack", ("myocardial infarction",),
         "An MI.", None),
    _cls(_OBO, "TST:0002", "nicotine", (), "An alkaloid.", None),
    _cls(_OBO, "TST:0003", "craving", (), "A desire.", "TST:0002"),
    _cls(_OBO, "TST:0004", "smoking", (), "Inhaling smoke.", None),
]
# release B: a shadowing bigram class, a brand-new class, a new synonym
# for an existing class, and a new is-a edge
ONTO_B = ONTO_A[1:] + [
    _cls(_OBO, "TST:0001", "heart attack", ("myocardial infarction",),
         "An MI.", None),
    _cls(_OBO, "TST:0010", "acute heart attack", (), "Acute MI.",
         "TST:0001"),
    _cls(_OBO, "TST:0011", "panic", (), "A state.", None),
    _cls(_OBO, "TST:0012", "tobacco plant", ("tobacco",),
         "A plant.", None),
]

DOCS = [
    ("https://t.example/d1",
     "the patient had an acute heart attack while smoking", "en"),
    ("https://t.example/d2",
     "nicotine causes craving and panic in the clinic", "en"),
    ("https://t.example/d3",
     "tobacco use rose sharply this year", "en"),
    ("https://t.example/d4", "the craving subsided after a week", "en"),
    ("https://t.example/d5",
     "smoking and nicotine and craving all appear here", "en"),
    ("https://t.example/d6", "nothing relevant at all", "en"),
    ("https://t.example/nonen", "nicotine craving smoking", "de"),
]


def _rows(onto):
    from onto_text_tag_spark.dictionary import build_dictionary_rows

    return build_dictionary_rows(onto)


def _build_root(spark, path, onto, docs):
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
    )

    init_kg_root(spark, path, onto)
    absorb_batch(spark, path, docs, _rows(onto), batch_fp="b0",
                 lang="en")
    return path


def _content(spark, root):
    from onto_text_tag_spark.sinks import read_stage

    return {
        "mentions": {
            tuple(r) for r in read_stage(spark, root, "mentions")
            .select("url", "begin", "end", "span_text", "curie")
            .collect()
        },
        "doc_terms": {
            (r["url"], tuple(sorted(r["_terms"])))
            for r in read_stage(spark, root, "doc_terms").collect()
        },
        "triples": {
            tuple(r) for r in read_stage(spark, root, "triples")
            .select("pred", "subj", "obj", "weight").collect()
        },
        "closure": {
            tuple(r) for r in read_stage(spark, root, "isa_closure")
            .select("subj", "obj").collect()
        },
    }


def test_dictionary_update_equals_rebuild_both_directions(
    spark, tmp_path
):
    from onto_text_tag_spark.plans.kg_dict_update import (
        update_dictionary,
        update_ontology,
    )
    from onto_text_tag_spark.session import local_df

    docs = local_df(spark, DOCS, "url string, text string, lang string")
    root = _build_root(spark, str(tmp_path / "kgA"), ONTO_A, docs)
    root_b = _build_root(spark, str(tmp_path / "kgB"), ONTO_B, docs)
    want_a = _content(spark, root)
    want_b = _content(spark, root_b)
    assert want_a != want_b

    # the planted shadowing case is actually live in the fixture
    assert ("https://t.example/d1", ("TST:0001", "TST:0004")) \
        in want_a["doc_terms"]
    assert ("https://t.example/d1", ("TST:0004", "TST:0010")) \
        in want_b["doc_terms"]

    # --- A -> B: additions (incl. a shadowing bigram + new synonym) -------
    up = update_dictionary(spark, root, docs, _rows(ONTO_A),
                           _rows(ONTO_B), batch_fp="dict-v2")
    assert up["status"] == "committed"
    # d6 (“nothing relevant”) and the non-en doc must not be re-tagged
    assert up["n_affected_docs"] <= 4
    onto_up = update_ontology(spark, root, ONTO_B, batch_fp="onto-v2")
    assert onto_up["status"] == "committed"
    assert _content(spark, root) == want_b

    # idempotence: same fingerprints are committed no-ops
    assert update_dictionary(
        spark, root, docs, _rows(ONTO_A), _rows(ONTO_B),
        batch_fp="dict-v2",
    )["status"] == "noop_already_committed"
    assert update_ontology(
        spark, root, ONTO_B, batch_fp="onto-v2",
    )["status"] == "noop_already_committed"
    assert _content(spark, root) == want_b

    # --- B -> A: removals (incl. un-shadowing "heart attack" in d1) -------
    down = update_dictionary(spark, root, docs, _rows(ONTO_B),
                             _rows(ONTO_A), batch_fp="dict-v3")
    assert down["status"] == "committed"
    update_ontology(spark, root, ONTO_A, batch_fp="onto-v3")
    assert _content(spark, root) == want_a


def test_dict_update_job_equals_termlist_rebuild(spark, tmp_path):
    """spark-submit surface: build a KG from termlist A, run
    jobs/kg_dict_update.py A→B, and the root must equal a from-scratch
    jobs/kg_build.py --termlist B build (all triple predicates)."""
    import json
    import subprocess
    import sys
    import zipfile

    from onto_text_tag_spark.corpus import (
        distributed_documents_df,
        mini_ontology,
    )
    from onto_text_tag_spark.dictionary import build_dictionary_rows

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = str(tmp_path)

    def submit(script, *args):
        pkg = os.path.join(tmp, "pkg.zip")
        if not os.path.exists(pkg):
            with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as zf:
                pkgdir = os.path.join(repo, "onto_text_tag_spark")
                for root, _dirs, files in os.walk(pkgdir):
                    for f in files:
                        if f.endswith(".py"):
                            p = os.path.join(root, f)
                            zf.write(p, os.path.relpath(p, repo))
        out = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--conf", "spark.ui.enabled=false", "--py-files", pkg,
             os.path.join(repo, "jobs", script), *args],
            capture_output=True, text=True, timeout=420,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert out.returncode == 0, out.stderr[-3000:]
        return json.loads([ln for ln in out.stdout.splitlines()
                           if ln.startswith("{")][-1])

    def write_termlist(path, rows):
        with open(path, "w") as fh:
            for r in rows:
                fh.write("\t".join(
                    ["A", r["ont"], r["id"], r["surface"], r["name"], ""]
                ) + "\n")

    full_rows = build_dictionary_rows(mini_ontology())
    tsv_a = os.path.join(tmp, "terms_a.tsv")
    tsv_b = os.path.join(tmp, "terms_b.tsv")
    write_termlist(
        tsv_a, [r for r in full_rows if not r["id"].startswith("CHEBI")])
    write_termlist(tsv_b, full_rows)
    corpus = os.path.join(tmp, "corpus.parquet")
    distributed_documents_df(spark, 200, seed=13, partitions=2) \
        .write.parquet(corpus)

    root_a = os.path.join(tmp, "kg_a")
    root_b = os.path.join(tmp, "kg_b")
    submit("kg_build.py", "--no-warmup", "--input", corpus,
           "--output", root_a, "--termlist", tsv_a)
    submit("kg_build.py", "--no-warmup", "--input", corpus,
           "--output", root_b, "--termlist", tsv_b)
    upd = submit("kg_dict_update.py", "--kg", root_a,
                 "--input", corpus, "--old-termlist", tsv_a,
                 "--new-termlist", tsv_b)
    assert upd["status"] == "committed"
    assert upd["n_affected_docs"] > 0

    def triples(root):
        return {
            tuple(r) for r in spark.read.parquet(
                os.path.join(root, "triples", "data"))
            .select("pred", "subj", "obj", "weight").collect()
        }

    assert triples(root_a) == triples(root_b)

    # deferred round-trip at the job surface: B -> A merge-on-read,
    # then fold — the PHYSICAL root must equal a from-scratch A build
    down = submit("kg_dict_update.py", "--kg", root_a,
                  "--input", corpus, "--old-termlist", tsv_b,
                  "--new-termlist", tsv_a, "--defer-rewrite",
                  "--fold-overlay")
    assert down["status"] == "committed"
    assert down["fold"]["status"] == "folded"
    assert down["fold"]["n_urls_folded"] == down["n_affected_docs"]
    root_a_fresh = os.path.join(tmp, "kg_a_fresh")
    submit("kg_build.py", "--no-warmup", "--input", corpus,
           "--output", root_a_fresh, "--termlist", tsv_a)
    assert triples(root_a) == triples(root_a_fresh)


def test_dict_update_after_retraction_uses_live_views(spark, tmp_path):
    """Interplay regression: on a root where a doc was RETRACTED
    (crawl-sink demotion), a later dictionary update must compute its
    affected set and signed delta from the LIVE doc_terms view.  The
    retracted doc d2 carries a shrunk-release curie ("panic"), so a
    physical read would pull it into the affected set and subtract its
    pair contributions a second time (they already left the aggregate
    at retraction) — deflating shared edges like nicotine–craving."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.plans.kg_absorb import (
        read_live_mentions,
        read_live_triples,
        retract_batch,
    )
    from onto_text_tag_spark.plans.kg_dict_update import update_dictionary
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sinks import read_stage

    gone_url = "https://t.example/d2"
    docs = local_df(spark, DOCS, "url string, text string, lang string")
    kept = docs.where(F.col("url") != gone_url)

    root = _build_root(spark, str(tmp_path / "kgB"), ONTO_B, docs)
    retract_batch(spark, root,
                  local_df(spark, [(gone_url,)], "url string"),
                  batch_fp="drop-d2")
    # ground truth: a fresh build under the OLD dictionary over the
    # live corpus (kept docs only)
    want_root = _build_root(spark, str(tmp_path / "kgA"), ONTO_A, kept)

    # pass the FULL corpus (including the retracted d2), the harder
    # condition: the defensive anti-join must keep d2 out of the re-tag
    # side just as the live-view read keeps it out of the old side
    upd = update_dictionary(spark, root, docs, _rows(ONTO_B),
                            _rows(ONTO_A), batch_fp="rel-down")
    assert upd["status"] == "committed"

    got_m = {tuple(r) for r in read_live_mentions(spark, root)
             .select("url", "begin", "end", "curie").collect()}
    want_m = {tuple(r) for r in read_stage(spark, want_root, "mentions")
              .select("url", "begin", "end", "curie").collect()}
    assert got_m == want_m
    got_t = {tuple(r) for r in read_live_triples(spark, root)
             .where("pred != 'is_a'")
             .select("pred", "subj", "obj", "weight").collect()}
    want_t = {tuple(r) for r in read_stage(spark, want_root, "triples")
              .where("pred != 'is_a'")
              .select("pred", "subj", "obj", "weight").collect()}
    assert got_t == want_t


def _live_content(spark, root):
    from onto_text_tag_spark.plans.kg_absorb import (
        read_live_doc_terms,
        read_live_mentions,
        read_live_triples,
    )
    from onto_text_tag_spark.sinks import read_stage

    return {
        "mentions": {
            tuple(r) for r in read_live_mentions(spark, root)
            .select("url", "begin", "end", "span_text", "curie")
            .collect()
        },
        "doc_terms": {
            (r["url"], tuple(sorted(r["_terms"])))
            for r in read_live_doc_terms(spark, root).collect()
        },
        "triples": {
            tuple(r) for r in read_live_triples(spark, root)
            .select("pred", "subj", "obj", "weight").collect()
        },
        "closure": {
            tuple(r) for r in read_stage(spark, root, "isa_closure")
            .select("subj", "obj").collect()
        },
    }


def test_deferred_dict_update_equals_rebuild_and_folds(spark, tmp_path):
    """Merge-on-read release absorb: defer_rewrite=True lands the
    affected docs' rows in the overlay pair; the LIVE views must equal
    the rebuild in both directions (sequential overlays included), the
    base stages stay physically untouched until fold_dict_overlay, and
    the fold preserves live content exactly while clearing the
    overlay."""
    from onto_text_tag_spark.plans.kg_absorb import (
        fold_dict_overlay,
        read_dict_overlay,
    )
    from onto_text_tag_spark.plans.kg_dict_update import (
        update_dictionary,
        update_ontology,
    )
    from onto_text_tag_spark.session import local_df

    docs = local_df(spark, DOCS, "url string, text string, lang string")
    root = _build_root(spark, str(tmp_path / "kgA"), ONTO_A, docs)
    root_b = _build_root(spark, str(tmp_path / "kgB"), ONTO_B, docs)
    want_a = _content(spark, root)
    want_b = _content(spark, root_b)

    # --- A -> B deferred -------------------------------------------------
    up = update_dictionary(spark, root, docs, _rows(ONTO_A),
                           _rows(ONTO_B), batch_fp="mor-v2",
                           defer_rewrite=True)
    assert up["status"] == "committed"
    assert "overlay_mentions" in up["stage_sec"]
    update_ontology(spark, root, ONTO_B, batch_fp="mor-onto-v2")
    assert _live_content(spark, root) == want_b
    # base mentions stage is PHYSICALLY untouched (masked at read only)
    assert _content(spark, root)["mentions"] == want_a["mentions"]
    assert read_dict_overlay(spark, root) is not None

    # idempotence
    assert update_dictionary(
        spark, root, docs, _rows(ONTO_A), _rows(ONTO_B),
        batch_fp="mor-v2", defer_rewrite=True,
    )["status"] == "noop_already_committed"
    assert _live_content(spark, root) == want_b

    # --- B -> A deferred on top (second overlay generation) ---------------
    down = update_dictionary(spark, root, docs, _rows(ONTO_B),
                             _rows(ONTO_A), batch_fp="mor-v3",
                             defer_rewrite=True)
    assert down["status"] == "committed"
    update_ontology(spark, root, ONTO_A, batch_fp="mor-onto-v3")
    assert _live_content(spark, root) == want_a

    # --- fold: physical == live, overlay cleared, refold no-op ------------
    fold = fold_dict_overlay(spark, root)
    assert fold["status"] == "folded"
    assert _content(spark, root) == want_a
    assert _live_content(spark, root) == want_a
    assert read_dict_overlay(spark, root) is None
    assert fold_dict_overlay(spark, root)["status"] == "noop_no_overlay"

    # --- eager update on a root with a pending overlay folds first --------
    update_dictionary(spark, root, docs, _rows(ONTO_A), _rows(ONTO_B),
                      batch_fp="mor-v4", defer_rewrite=True)
    eager = update_dictionary(spark, root, docs, _rows(ONTO_B),
                              _rows(ONTO_A), batch_fp="eager-v5")
    assert eager["status"] == "committed"
    update_ontology(spark, root, ONTO_A, batch_fp="onto-v5")
    assert read_dict_overlay(spark, root) is None
    assert _content(spark, root) == want_a


def test_retract_after_deferred_update_uses_overlay_arrays(
    spark, tmp_path
):
    """Interplay regression, the mirror of the live-view fix: a doc
    that was dictionary-updated (its current arrays live in the
    OVERLAY) and is then RETRACTED must have its CURRENT contributions
    subtracted from the co-occurrence aggregate — reading the stale
    base arrays would decrement pairs that are no longer in the
    aggregate (d2's panic pairs left it at the B->A update) and leave
    stale ones in.  Then fold_retractions must scrub the retracted url
    from the overlay pair too."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.plans.kg_absorb import (
        fold_retractions,
        read_dict_overlay,
        retract_batch,
    )
    from onto_text_tag_spark.plans.kg_dict_update import (
        update_dictionary,
        update_ontology,
    )
    from onto_text_tag_spark.session import local_df

    gone_url = "https://t.example/d2"
    docs = local_df(spark, DOCS, "url string, text string, lang string")
    kept = docs.where(F.col("url") != gone_url)

    # A -> B ADDS mentions to d2 (release B's new class "panic" matches
    # it), so the overlay arrays are a strict superset of the stale base
    # arrays: a retract that read the base would UNDER-subtract, leaving
    # ghost nicotine-panic / craving-panic edges in the live aggregate.
    root = _build_root(spark, str(tmp_path / "kgA"), ONTO_A, docs)
    upd = update_dictionary(spark, root, docs, _rows(ONTO_A),
                            _rows(ONTO_B), batch_fp="mor-up",
                            defer_rewrite=True)
    assert upd["status"] == "committed"
    update_ontology(spark, root, ONTO_B, batch_fp="mor-onto-up")
    _ov_m, ov_dt = read_dict_overlay(spark, root)
    d2_terms = {
        t for r in ov_dt.collect() if r["url"] == gone_url
        for t in r["_terms"]
    }
    assert "TST:0011" in d2_terms  # the added-in-overlay mention

    retract_batch(spark, root,
                  local_df(spark, [(gone_url,)], "url string"),
                  batch_fp="drop-d2")

    # ground truth: fresh build under B over the kept docs
    want_root = _build_root(spark, str(tmp_path / "kgB"), ONTO_B, kept)
    want = _content(spark, want_root)
    assert _live_content(spark, root) == want

    # fold the retraction: live unchanged, overlay scrubbed of d2
    fold = fold_retractions(spark, root)
    assert fold["status"] == "folded"
    assert _live_content(spark, root) == want
    ov = read_dict_overlay(spark, root)
    if ov is not None:
        assert gone_url not in {r["url"] for r in ov[1].collect()}
