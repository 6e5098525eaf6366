"""Co-occurrence, closure, and end-to-end KG tests (J2/A2/J5, §2.9)."""

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.corpus import documents_df, ontology_df
from onto_text_tag_spark.operators.closure import (
    descendants_of,
    isa_edges_from_ontology,
    transitive_closure,
)
from onto_text_tag_spark.operators.cooccur import cooccurrence_edges, term_index
from onto_text_tag_spark.plans.kg_pipeline import build_kg


@pytest.fixture(scope="module")
def kg(spark):
    result = build_kg(documents_df(spark, n_docs=120), ontology_df(spark))
    result.mentions.cache().count()
    return result


def test_cooccur_matches_set_intersection_semantics(spark, kg):
    """Edge weight == |docs(a) ∩ docs(b)| — the reference computation
    (hv_generate.py:49-51) done via python sets over the same mentions."""
    rows = kg.mentions.select("url", "curie").distinct().collect()
    docsets: dict[str, set] = {}
    for r in rows:
        docsets.setdefault(r["curie"], set()).add(r["url"])
    expected = {}
    curies = sorted(docsets)
    for i, a in enumerate(curies):
        for b in curies[i + 1 :]:
            w = len(docsets[a] & docsets[b])
            if w:
                expected[(a, b)] = w
    got = {(r["src"], r["dst"]): r["weight"] for r in kg.cooccur_edges.collect()}
    assert got == expected


def test_cooccur_canonical_order_no_self_pairs(kg):
    bad = kg.cooccur_edges.where(F.col("src") >= F.col("dst")).count()
    assert bad == 0


def test_cooccur_frequency_cap(spark, kg):
    capped = cooccurrence_edges(kg.mentions, max_doc_freq=5)
    df_counts = (
        kg.mentions.select("url", "curie").distinct()
        .groupBy("curie").count().collect()
    )
    hot = {r["curie"] for r in df_counts if r["count"] > 5}
    assert hot, "fixture should have at least one hot term"
    remaining = {r["src"] for r in capped.collect()} | {
        r["dst"] for r in capped.collect()
    }
    assert remaining.isdisjoint(hot)


def test_cooccur_weight_plans_agree_and_count_mode_combines(spark, kg):
    """The two weight plans of cooccurrence_edges_from_arrays are
    bit-identical on collect_set-built arrays — including under
    within-doc mention multiplicity, which the collect_set absorbs —
    and only the count(*) plan gets a map-side partial aggregate (the
    countDistinct plan's first phase groups by (src, dst, doc), which
    is all-distinct post-dedup and reduces nothing; see the skew bench
    in BENCH/BASELINE.md for what that costs under head terms)."""
    from onto_text_tag_spark.operators.cooccur import (
        cooccurrence_edges_from_arrays,
        doc_term_arrays,
    )

    # duplicate every mention row: multiplicity must not inflate weights
    m = kg.mentions.unionByName(kg.mentions)
    arrays = doc_term_arrays(m)
    dedup = cooccurrence_edges_from_arrays(arrays, assume_deduped=True)
    exact = cooccurrence_edges_from_arrays(arrays, assume_deduped=False)
    got_d = {(r["src"], r["dst"]): r["weight"] for r in dedup.collect()}
    got_e = {(r["src"], r["dst"]): r["weight"] for r in exact.collect()}
    assert got_d == got_e
    assert got_d  # non-trivial fixture

    plan_d = dedup._jdf.queryExecution().executedPlan().toString()
    plan_e = exact._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan_d and "distinct" not in plan_d
    assert "count(distinct" in plan_e


def test_term_index_dedupes(kg):
    idx = term_index(kg.mentions)
    row = idx.where(F.col("curie") == "CHEBI:0011").first()
    assert row is not None
    assert len(row["docs"]) == len(set(row["docs"])) == row["doc_count"]
    assert row["docs"] == sorted(row["docs"])


def test_term_index_salted_equals_plain(kg):
    """Salted two-stage collect must be value-identical to the plain
    collect_set shape — same schema, same sorted doc arrays, same
    counts — at every bucket width (incl. 1 = degenerate no-salt)."""
    from onto_text_tag_spark.operators.cooccur import term_index_salted

    plain = term_index(kg.mentions)
    base = {r["curie"]: (r["docs"], r["pref_label"], r["doc_count"])
            for r in plain.collect()}
    assert base
    for buckets in (1, 4, 32):
        salted = term_index_salted(kg.mentions, salt_buckets=buckets)
        assert salted.columns == plain.columns
        got = {r["curie"]: (r["docs"], r["pref_label"], r["doc_count"])
               for r in salted.collect()}
        assert got == base, f"salt_buckets={buckets}"
    # two exchanges, neither keyed on the bare hot term alone
    plan = term_index_salted(kg.mentions)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "_salt" in plan


def test_transitive_closure(spark):
    edges = isa_edges_from_ontology(ontology_df(spark))
    closure = transitive_closure(edges)
    pairs = {(r["descendant"], r["ancestor"]) for r in closure.collect()}
    # chain: morphine -> opioid -> chemical entity
    assert ("CHEBI:0031", "CHEBI:0030") in pairs
    assert ("CHEBI:0031", "CHEBI:0001") in pairs
    # chain: tobacco smoking -> smoking behaviour -> addiction
    assert ("ADDICTO:0003", "ADDICTO:0001") in pairs
    # no reflexive pairs
    assert all(d != a for d, a in pairs)


def test_closure_monotone_superset_of_edges(spark):
    edges = isa_edges_from_ontology(ontology_df(spark))
    closure = transitive_closure(edges)
    direct = {(r["child_curie"], r["parent_curie"]) for r in edges.collect()}
    pairs = {(r["descendant"], r["ancestor"]) for r in closure.collect()}
    assert direct <= pairs


def test_descendants_of(spark):
    edges = isa_edges_from_ontology(ontology_df(spark))
    closure = transitive_closure(edges)
    got = {
        r["curie"] for r in descendants_of(closure, ["CHEBI:0030"]).collect()
    }
    assert got == {"CHEBI:0030", "CHEBI:0031", "CHEBI:0032"}


def test_rollup_doc_counts_hand_values(spark):
    """Taxonomy rollup: counts include descendants, distinct docs only,
    unmentioned classes report 0."""
    from onto_text_tag_spark.operators.closure import rollup_doc_counts
    from onto_text_tag_spark.session import local_df

    # A <- B <- C ; A <- D ; E isolated
    edges = local_df(
        spark,
        [("B", "A"), ("C", "B"), ("D", "A")],
        "child_curie string, parent_curie string",
    )
    closure = transitive_closure(edges)
    classes = local_df(
        spark, [("A",), ("B",), ("C",), ("D",), ("E",)], "curie string"
    )
    doc_terms = local_df(
        spark,
        [
            ("d1", "B"), ("d1", "C"), ("d2", "C"), ("d3", "D"),
            ("d4", "A"), ("d4", "A"),  # duplicate mention: counted once
        ],
        "doc_id string, curie string",
    )
    got = {
        r["curie"]: r["doc_count"]
        for r in rollup_doc_counts(doc_terms, closure, classes).collect()
    }
    assert got == {"A": 4, "B": 2, "C": 2, "D": 1, "E": 0}


def test_triples_union_shape(kg):
    preds = {r["pred"] for r in kg.triples.select("pred").distinct().collect()}
    assert preds == {"mentions", "co_occurs_with", "is_a"}
    assert kg.triples.columns == ["subj", "pred", "obj", "weight"]
    # co-occurrence triples carry weights; others are null
    assert (
        kg.triples.where(
            (F.col("pred") == "co_occurs_with") & F.col("weight").isNull()
        ).count()
        == 0
    )


def test_mention_triples_set_semantics(kg):
    m = kg.triples.where(F.col("pred") == "mentions")
    assert m.count() == m.select("subj", "obj").distinct().count()


def test_shared_triples_reuse_one_exchange(spark, kg, tmp_path):
    """The mention-triple and co-occurrence branches of the combined
    triples output must derive from ONE corpus-sized shuffle: after
    execution, the finalized AQE plan contains a ReusedExchange (the
    second branch reads the first branch's shuffle output instead of
    re-scanning + re-aggregating mentions).  Exercised in the production
    shape — mentions materialized to parquet, as jobs/kg_build.py does
    (a cached-DataFrame input defeats reuse: AQE wraps each branch in
    its own TableCacheQueryStage and they don't canonicalize equal).
    Regression pin: count(*) for the edge weight lets column pruning
    diverge the two subplans and reuse silently fails — weight must stay
    countDistinct(doc)."""
    from onto_text_tag_spark.plans.kg_pipeline import (
        shared_mention_and_cooccur_triples,
    )

    path = str(tmp_path / "mentions.parquet")
    kg.mentions.write.parquet(path)
    t = shared_mention_and_cooccur_triples(spark.read.parquet(path))
    t.collect()
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1


def test_merge_cooccurrence_edges_equals_full_rebuild(kg):
    """Incremental-maintenance algebra: co-occurrence edges built per
    disjoint doc batch then merged by pair-keyed weight sum equal the
    edges built over the full corpus (weights are additive across a
    partition of the doc set).  min_weight must apply AFTER the merge."""
    from onto_text_tag_spark.operators.cooccur import (
        merge_cooccurrence_edges,
    )

    m = kg.mentions
    batches = [m.where(F.crc32("url") % 3 == k) for k in range(3)]
    merged = merge_cooccurrence_edges(
        *[cooccurrence_edges(b) for b in batches]
    )
    full = cooccurrence_edges(m)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }

    # thresholding after the merge == thresholding the full build
    merged_w2 = merge_cooccurrence_edges(
        *[cooccurrence_edges(b) for b in batches], min_weight=2
    )
    full_w2 = cooccurrence_edges(m, min_weight=2)
    assert {tuple(r) for r in merged_w2.collect()} == {
        tuple(r) for r in full_w2.collect()
    }


def test_node_table_profile(spark):
    """plans/kg_pipeline.py:node_table — the nodes side of the
    nodes/edges pair: document nodes profiled by distinct-class degree,
    class nodes by distinct-doc degree, never-mentioned classes kept at
    degree 0, kind column last (partitionBy target)."""
    from onto_text_tag_spark.plans.kg_pipeline import node_table
    from onto_text_tag_spark.session import local_df

    arrays = local_df(
        spark,
        [("u1", ["A:1", "A:2"]), ("u2", ["A:1"])],
        "url string, _terms array<string>",
    )
    meta = [
        {"id": "A:1", "name": "alpha", "ont": "A"},
        {"id": "A:2", "name": "beta", "ont": "A"},
        {"id": "B:9", "name": "gamma", "ont": "B"},
        # duplicate surface rows for one curie collapse to one node
        {"id": "A:1", "name": "alpha", "ont": "A"},
    ]
    rows = {
        (r["id"], r["kind"]): r.asDict()
        for r in node_table(arrays, meta).collect()
    }
    assert rows[("u1", "document")]["degree"] == 2
    assert rows[("u2", "document")]["degree"] == 1
    assert rows[("u1", "document")]["label"] is None
    assert rows[("A:1", "class")]["degree"] == 2
    assert rows[("A:2", "class")]["degree"] == 1
    assert rows[("B:9", "class")] == {
        "id": "B:9", "label": "gamma", "ont": "B",
        "degree": 0, "kind": "class",
    }
    assert len(rows) == 5
    assert node_table(arrays, meta).columns[-1] == "kind"


def test_association_scores_hand_values(spark):
    import math

    from onto_text_tag_spark.operators.cooccur import association_scores

    rows = [
        ("d1", "A"), ("d1", "B"),
        ("d2", "A"), ("d2", "B"),
        ("d3", "A"), ("d3", "C"),
        ("d4", "B"),
        ("d1", "A"),  # duplicate mention must not inflate anything
    ]
    m = spark.createDataFrame(rows, "url string, curie string")
    got = {(r.src, r.dst): r for r in association_scores(m).collect()}
    assert set(got) == {("A", "B"), ("A", "C")}

    ab = got[("A", "B")]
    # N=4, df(A)=3, df(B)=3, w=2
    assert (ab.weight, ab.df_src, ab.df_dst) == (2, 3, 3)
    assert ab.jaccard == round(2 / 4, 6)
    assert ab.lift == round(2 * 4 / 9, 6)
    assert ab.pmi == round(math.log(8 / 9), 6)
    assert ab.npmi == round(math.log(8 / 9) / -math.log(2 / 4), 6)

    ac = got[("A", "C")]
    # df(C)=1, w=1
    assert (ac.weight, ac.df_src, ac.df_dst) == (1, 3, 1)
    assert ac.jaccard == round(1 / 3, 6)
    assert ac.lift == round(4 / 3, 6)
    assert ac.pmi == round(math.log(4 / 3), 6)
    assert ac.npmi == round(math.log(4 / 3) / -math.log(1 / 4), 6)


def test_association_scores_full_cooccurrence_npmi_is_one(spark):
    from onto_text_tag_spark.operators.cooccur import association_scores

    rows = [("d1", "A"), ("d1", "B"), ("d2", "A"), ("d2", "B")]
    m = spark.createDataFrame(rows, "url string, curie string")
    [r] = association_scores(m).collect()
    # w == N: perfectly associated -> npmi pinned to 1.0, pmi=ln(1)=0
    assert (r.src, r.dst, r.weight) == ("A", "B", 2)
    assert r.jaccard == 1.0 and r.lift == 1.0
    assert r.pmi == 0.0 and r.npmi == 1.0


def _brute_windowed(rows, w):
    from collections import defaultdict
    bydoc = defaultdict(set)
    for d, t, p in rows:
        bydoc[d].add((t, p))
    docs_per_pair = defaultdict(set)
    for d, occ in bydoc.items():
        occ = sorted(occ, key=lambda x: (x[1], x[0]))
        for i in range(len(occ)):
            for j in range(len(occ)):
                (ta, pa), (tb, pb) = occ[i], occ[j]
                if ta != tb and 0 <= pb - pa <= w:
                    docs_per_pair[(min(ta, tb), max(ta, tb))].add(d)
    return {k: len(v) for k, v in docs_per_pair.items()}


def test_windowed_cooccurrence_matches_brute_force(spark):
    import random

    from onto_text_tag_spark.operators.cooccur import (
        windowed_cooccurrence_edges,
    )
    from onto_text_tag_spark.session import local_df

    rng = random.Random(11)
    rows = [
        (f"d{rng.randrange(6)}", f"T{rng.randrange(8)}", rng.randrange(40))
        for _ in range(150)
    ]
    df = local_df(spark, rows, "url string, curie string, pos bigint")
    for w in (1, 5, 7, 40):
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in windowed_cooccurrence_edges(df, w).collect()
        }
        assert got == _brute_windowed(rows, w), f"window={w}"


def test_windowed_cooccurrence_bucket_boundaries_and_plan(spark):
    from onto_text_tag_spark.operators.cooccur import (
        windowed_cooccurrence_edges,
    )
    from onto_text_tag_spark.session import local_df

    # distance exactly w (kept) and w+1 (dropped), across bucket edges
    rows = [("d", "A", 0), ("d", "B", 5), ("d", "C", 6), ("e", "A", 4),
            ("e", "B", 9)]
    df = local_df(spark, rows, "url string, curie string, pos bigint")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in windowed_cooccurrence_edges(df, 5).collect()
    }
    assert got == {("A", "B"): 2, ("B", "C"): 1}  # A-C at 6 > 5 dropped
    # the range join runs as an EQUI join on (doc, bucket) — never a
    # cartesian/nested-loop fallback
    plan = windowed_cooccurrence_edges(df, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_term_df_sketch_exact_merge_and_accuracy(spark, kg):
    """KMV sketch pins: (1) terms with < k distinct docs report EXACTLY;
    (2) merge invariance — the two-phase salted computation is
    bucket-count independent (the defining sketch property: k smallest
    of a union == k smallest of concatenated per-part k-smallest);
    (3) estimates for terms over k stay within the 3-sigma KMV bound."""
    import math

    from onto_text_tag_spark.operators.cooccur import term_df_sketch

    k = 32
    exact = {
        r["curie"]: r["n"]
        for r in kg.mentions.groupBy("curie")
        .agg(F.countDistinct("url").alias("n")).collect()
    }
    a = term_df_sketch(kg.mentions, k=k, salt_buckets=1).collect()
    b = {
        r["curie"]: (r["df_est"], r["sketch_size"])
        for r in term_df_sketch(kg.mentions, k=k, salt_buckets=8).collect()
    }
    assert len(a) == len(exact)
    three_sigma = 3.0 / math.sqrt(k - 2)
    for r in a:
        assert b[r["curie"]] == (r["df_est"], r["sketch_size"])  # merge inv.
        n = exact[r["curie"]]
        if n < k:
            assert (r["df_est"], r["sketch_size"]) == (n, n)
        else:
            assert r["sketch_size"] == k
            assert abs(r["df_est"] - n) <= max(2, three_sigma * n), (
                r["curie"], r["df_est"], n)


def test_stage_time_travel_reads(spark, tmp_path):
    """Iceberg time-travel analog: every commit records its full data-
    file list, so append-grown stages read AS OF any earlier snapshot;
    overwritten stages expire their history and historical reads raise
    instead of silently returning wrong data."""
    from onto_text_tag_spark import sinks
    from onto_text_tag_spark.session import local_df

    root = str(tmp_path)
    df1 = local_df(spark, [(1, "a"), (2, "b")], "id long, v string")
    sinks.write_stage(df1, root, "s", input_fingerprint="f1")
    # append-grow (the absorb path): new files land beside immutable
    # old ones, then the metadata commit seals the snapshot
    df2 = local_df(spark, [(3, "c")], "id long, v string")
    df2.write.mode("append").parquet(f"{root}/s/data")
    sinks.commit_stage(root, "s", input_fingerprint="f2")

    def ids(df):
        return {r.id for r in df.collect()}

    assert ids(sinks.read_stage(spark, root, "s")) == {1, 2, 3}
    assert ids(sinks.read_stage(spark, root, "s", snapshot_id=1)) == {1, 2}
    assert ids(sinks.read_stage(spark, root, "s", snapshot_id=2)) == {1, 2, 3}
    assert sinks.read_manifest(root, "s", snapshot_id=2)["total_rows"] == 3

    # a plain overwrite commits a new snapshot AND expires the old files
    sinks.write_stage(df2, root, "s", input_fingerprint="f3")
    assert ids(sinks.read_stage(spark, root, "s")) == {3}
    assert ids(sinks.read_stage(spark, root, "s", snapshot_id=3)) == {3}
    with pytest.raises(FileNotFoundError, match="expired"):
        sinks.read_stage(spark, root, "s", snapshot_id=1)
    with pytest.raises(KeyError):
        sinks.read_stage(spark, root, "s", snapshot_id=99)


def test_mention_trends_hand_values(spark):
    """Trend buckets, distinct-doc counting, and previous-bucket deltas
    (first bucket deltas from 0; gaps delta against the last nonempty
    bucket, matching the lag-window semantics)."""
    import datetime as dt

    from onto_text_tag_spark.operators.cooccur import mention_trends
    from onto_text_tag_spark.session import local_df

    day = lambda d: dt.datetime(2024, 3, d)
    docs = local_df(
        spark,
        [("u1", day(1)), ("u2", day(1)), ("u3", day(2)), ("u4", day(4))],
        "url string, warc_ts timestamp",
    )
    mentions = local_df(
        spark,
        [("u1", "A"), ("u1", "A"),  # duplicate mention: one doc
         ("u2", "A"), ("u3", "A"), ("u4", "A"),
         ("u3", "B")],
        "url string, curie string",
    )
    rows = {
        (r.curie, r.bucket.day, r.n_docs, r.delta_prev_bucket)
        for r in mention_trends(mentions, docs).collect()
    }
    assert rows == {
        ("A", 1, 2, 2),   # two distinct docs on day 1 (dup mention folded)
        ("A", 2, 1, -1),
        ("A", 4, 1, 0),   # gap day 3: delta vs day 2's count
        ("B", 2, 1, 1),
    }


def test_term_sketch_merge_is_exact(spark, kg):
    """The KMV mergeability contract: merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B) bit-for-bit, with OVERLAPPING doc sets — the property
    that lets the absorb path maintain the sketch without corpus
    re-reads."""
    from onto_text_tag_spark.operators.cooccur import (
        finalize_term_sketch,
        merge_term_sketches,
        term_df_sketch,
        term_sketch_partials,
    )

    k = 16
    m = kg.mentions
    a = m.where(F.pmod(F.xxhash64("url"), F.lit(3)) != 0)
    b = m.where(F.pmod(F.xxhash64("url"), F.lit(3)) != 1)  # overlap: ==2
    merged = merge_term_sketches(
        term_sketch_partials(a, k=k), term_sketch_partials(b, k=k), k=k
    )
    full = term_sketch_partials(m, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert sorted(map(tuple, finalize_term_sketch(merged, k=k).collect())) \
        == sorted(map(tuple, term_df_sketch(m, k=k).collect()))


def test_stage_incremental_reads(spark, tmp_path):
    """Iceberg incremental-read analog: rows appended between two
    snapshots come from the manifests' file-list difference (O(delta));
    ranges spanning a rewrite refuse instead of answering wrong."""
    from onto_text_tag_spark import sinks
    from onto_text_tag_spark.session import local_df

    root = str(tmp_path)

    def batch(rows):
        return local_df(spark, rows, "id long, v string")

    def ids(df):
        return {r.id for r in df.collect()}

    sinks.write_stage(batch([(1, "a")]), root, "s", input_fingerprint="f1")
    batch([(2, "b"), (3, "c")]).write.mode("append").parquet(f"{root}/s/data")
    sinks.commit_stage(root, "s", input_fingerprint="f2")
    batch([(4, "d")]).write.mode("append").parquet(f"{root}/s/data")
    sinks.commit_stage(root, "s", input_fingerprint="f3")

    assert ids(sinks.read_stage_increment(spark, root, "s", 1, 2)) == {2, 3}
    assert ids(sinks.read_stage_increment(spark, root, "s", 2, 3)) == {4}
    assert ids(sinks.read_stage_increment(spark, root, "s", 1)) == {2, 3, 4}
    empty = sinks.read_stage_increment(spark, root, "s", 3, 3)
    assert empty.count() == 0 and empty.columns == ["id", "v"]

    # an overwrite breaks append-only lineage: the range must refuse
    sinks.write_stage(batch([(9, "z")]), root, "s", input_fingerprint="f4")
    with pytest.raises(ValueError, match="rewritten"):
        sinks.read_stage_increment(spark, root, "s", 1)
    # ranges entirely after the rewrite work again
    batch([(10, "y")]).write.mode("append").parquet(f"{root}/s/data")
    sinks.commit_stage(root, "s", input_fingerprint="f5")
    assert ids(sinks.read_stage_increment(spark, root, "s", 4)) == {10}


def test_cycle_members_flags_only_cycle_classes(spark):
    """Planted 3-cycle + 2-cycle: exactly the on-cycle classes are
    flagged; chains INTO a cycle are not (they reach the cycle but
    never themselves)."""
    from onto_text_tag_spark.operators.closure import cycle_members
    from onto_text_tag_spark.session import local_df

    edges = local_df(spark, [
        ("a", "b"), ("b", "c"), ("c", "a"),       # 3-cycle
        ("x", "y"), ("y", "x"),                   # 2-cycle
        ("in1", "a"), ("in2", "in1"),             # chain into the cycle
        ("t1", "t2"),                             # acyclic tail
    ], "child_curie string, parent_curie string")
    got = {r["curie"] for r in cycle_members(edges).collect()}
    assert got == {"a", "b", "c", "x", "y"}


def test_cycle_members_empty_on_dag(spark):
    from onto_text_tag_spark.operators.closure import cycle_members
    from onto_text_tag_spark.session import local_df

    edges = local_df(spark, [("a", "b"), ("b", "c"), ("a", "c")],
                     "child_curie string, parent_curie string")
    assert cycle_members(edges).count() == 0
