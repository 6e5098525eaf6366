"""Co-occurrence edge construction (J2 + A2) with explicit skew handling.

Reference: ``hv_generate.py:39-58`` — for every ordered term pair,
``len(PMIDs(a) & PMIDs(b))``, skipping self-pairs and inverse duplicates
with an O(n²) scan of the already-emitted list.

Spark-first shape: a self equi-join of the de-duplicated (doc, term)
relation on the doc key, with ``curie_a < curie_b`` replacing the
inverse-duplicate scan exactly (the relation is symmetric; canonical
ordering keeps one representative), then a count aggregate.  The
set-intersection size IS ``countDistinct(doc)`` after the join — same
value, computed distributed.

Scale analysis (the part the reference never had to face):

* A doc mentioning k distinct terms emits k(k-1)/2 pairs.  Head documents
  (huge k) blow up quadratically → ``max_terms_per_doc`` caps fan-out,
  dropping only pathological docs (boilerplate link farms at web scale).
* Head TERMS (ultra-frequent CURIEs, e.g. "smoke") skew the join AND the
  groupBy.  Mitigations layered: (1) the join key is the doc id — high
  cardinality, naturally well-distributed; skew concentrates in the
  groupBy on pairs, where partial (map-side) aggregation absorbs it;
  (2) AQE skew-join splitting is enabled in the session; (3) an optional
  document-frequency cap drops stopword-like terms before the join.
* The (doc, term) projection is deduplicated BEFORE the self-join
  (mention multiplicity within a doc must not inflate weights — reference
  semantics are set-based), shrinking the join input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_term_pairs(mentions: DataFrame, doc_col: str = "url",
                   term_col: str = "curie") -> DataFrame:
    """Distinct (doc, term) relation — the reference's inverted-index
    value sets (load_ontotermentions.py:102-108), kept normalized."""
    return mentions.select(doc_col, term_col).distinct()


def doc_term_arrays(mentions: DataFrame, doc_col: str = "url",
                    term_col: str = "curie") -> DataFrame:
    """One row per doc with its deduped term array: the SHARED exchange
    both mention-triples (explode) and co-occurrence (pair explode)
    derive from.  Using the same subplan in both union branches lets
    Spark plan a ReusedExchange — the corpus-sized shuffle runs once."""
    return (
        mentions.select(doc_col, term_col)
        .groupBy(doc_col)
        .agg(F.collect_set(term_col).alias("_terms"))
    )


def cooccurrence_edges_from_arrays(
    arrays: DataFrame,
    min_weight: int = 1,
    max_terms_per_doc: int | None = None,
    doc_col: str = "url",
    assume_deduped: bool = False,
) -> DataFrame:
    """(src, dst, weight) edges from ``doc_term_arrays`` output.

    Two weight plans, identical results on collect_set-built arrays
    (each (src, dst, doc) occurs at most once — pinned by test_kg):

    ``assume_deduped=False`` (default): ``countDistinct(doc_col)``.
    Unlike ``count(*)`` or ``count(doc)`` (which the optimizer rewrites
    to ``count(1)`` for a non-null column), it keeps ``doc_col``
    referenced through the explode chain.  That matters for the shared
    triples plan: with doc pruned, this branch's collect_set aggregate
    outputs ``(_terms)`` while the mention-triple branch's outputs
    ``(doc, _terms)``, the two union subplans stop canonicalizing
    equal, and ReusedExchange silently fails — tagging + the
    corpus-sized shuffle run TWICE (observed via executedPlan; pinned
    by test_kg plan assertions).

    ``assume_deduped=True``: ``count(*)``.  The caller asserts the
    arrays hold each term once per doc (true for anything built by
    ``doc_term_arrays``/collect_set).  This is the STANDALONE scale
    path: countDistinct plans a two-phase distinct aggregate whose
    first-phase grouping keys are (src, dst, doc) — all-distinct here,
    so the partial aggregate reduces NOTHING and the entire exploded
    pair relation (quadratic in terms-per-doc) crosses the shuffle.
    ``count(*)`` restores map-side partial aggregation: hot head-term
    pairs (boilerplate CURIEs on every page, SURVEY §4.1) collapse to
    one row per pair per partition before the exchange — measured 39.4
    s → 8.8 s on the planted-head-term skew bench (BENCH/BASELINE.md
    'Skew run').  Use it whenever the edges are not a branch of the
    shared-exchange triples plan."""
    if max_terms_per_doc is not None:
        arrays = arrays.where(F.size("_terms") <= max_terms_per_doc)
    pairs = (
        arrays.select(doc_col, F.explode("_terms").alias("src"), "_terms")
        .select(doc_col, "src", F.explode("_terms").alias("dst"))
        .where(F.col("src") < F.col("dst"))  # P11 + canonical order
    )
    weight = (
        F.count("*") if assume_deduped else F.countDistinct(doc_col)
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(weight.alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def cooccurrence_edges(
    mentions: DataFrame,
    doc_col: str = "url",
    term_col: str = "curie",
    min_weight: int = 1,
    max_doc_freq: int | None = None,
    max_terms_per_doc: int | None = None,
) -> DataFrame:
    """(src, dst, weight) co-occurrence edges, ``src < dst`` canonical.

    weight = number of distinct docs mentioning both terms — identical to
    the reference's ``len(set_a & set_b)`` (hv_generate.py:49-51); the
    ``src < dst`` predicate reproduces the inverse-dup elimination
    (hv_generate.py:53-57) declaratively.
    """
    # No eager .distinct(): collect_set below dedupes per doc, so a
    # separate distinct would just add a third shuffle of the same data.
    dt = mentions.select(doc_col, term_col)

    if max_doc_freq is not None:
        # Frequency-capped pair emission (SURVEY.md §4.1): drop head terms
        # whose document frequency exceeds the cap.  The df table is tiny
        # (one row per term) → broadcast the keep-list.
        df_counts = dt.groupBy(term_col).agg(
            F.countDistinct(doc_col).alias("_df")
        )
        keep = df_counts.where(F.col("_df") <= max_doc_freq).select(term_col)
        dt = dt.join(F.broadcast(keep), term_col, "inner")

    # Pair generation WITHOUT a self-join.  The naive shape — dt JOIN dt
    # ON doc — makes Catalyst broadcast the multi-million-row (doc, term)
    # relation (its parquet-compressed size estimate sits under the
    # threshold): the HashedRelation build is single-threaded driver
    # work, and every probe task idle-blocks on the broadcast future —
    # measured on this box as the serial bottleneck that made local[32]
    # SLOWER than local[8].  Instead: collapse each doc's terms into one
    # array (collect_set dedupes — reference set semantics,
    # hv_generate.py:49-51) and emit pairs with a double explode.  Both
    # remaining exchanges (by doc, then by pair) partition evenly; the
    # explode is map-side, whole-stage-codegen JVM work.
    terms = (
        dt.groupBy(doc_col).agg(F.collect_set(term_col).alias("_terms"))
    )
    # assume_deduped is unconditionally safe here: the arrays are built
    # by the collect_set above, and this standalone form is never a
    # branch of the shared-exchange triples plan.
    return cooccurrence_edges_from_arrays(
        terms, min_weight=min_weight, max_terms_per_doc=max_terms_per_doc,
        doc_col=doc_col, assume_deduped=True,
    )


def association_scores(
    mentions: DataFrame,
    doc_col: str = "url",
    term_col: str = "curie",
    min_weight: int = 1,
) -> DataFrame:
    """Normalized association strengths per co-occurrence edge.

    The reference's edge weight is the raw shared-document count
    (hv_generate.py:49-51), which at web scale just ranks by term
    frequency — boilerplate CURIEs dominate every chord.  This operator
    attaches the standard corpus-normalized measures so downstream
    ranking/pruning can separate "frequent together" from "associated":

    * ``jaccard``  = w / (df_a + df_b − w)            (set overlap)
    * ``lift``     = w·N / (df_a·df_b)                (vs independence)
    * ``pmi``      = ln(lift)                          (pointwise MI)
    * ``npmi``     = pmi / −ln(w/N), 1.0 when w = N   (normalized [−1,1])

    with df = per-term distinct-doc frequency and N = distinct docs
    carrying ≥1 mention.  All derived from ONE corpus-sized exchange:
    the ``doc_term_arrays`` groupBy(doc) feeds the pair explosion, the
    df aggregate (single explode + count), and the N count — identical
    subplans, so Catalyst plans the corpus shuffle once (ReusedExchange,
    same device the triples plan pins).  df table and N are
    ontology-bounded (≪ corpus) → broadcast joins onto the edge set; no
    additional corpus-keyed shuffle.  Floats are deterministic: integer
    counts are exact in doubles, division is IEEE-correctly-rounded, and
    the only libm calls (ln) take identical arguments on any engine.
    """
    arrays = doc_term_arrays(mentions, doc_col=doc_col, term_col=term_col)
    return association_scores_from_arrays(
        arrays, doc_col=doc_col, min_weight=min_weight
    )


def association_scores_from_arrays(
    arrays: DataFrame,
    doc_col: str = "url",
    min_weight: int = 1,
) -> DataFrame:
    """``association_scores`` starting from a ``doc_term_arrays``-shaped
    relation — the form the build DAG uses (jobs/kg_build.py
    ``--edge-scores``): the doc_terms SNAPSHOT replaces the corpus
    exchange entirely, so scoring a built KG's edges never re-reads or
    re-tags the corpus."""
    edges = cooccurrence_edges_from_arrays(
        arrays, min_weight=min_weight, doc_col=doc_col, assume_deduped=True
    )
    df_tbl = (
        arrays.select(F.explode("_terms").alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").cast("long").alias("_df"))
    )
    # one-row corpus count; crossing it in stays inside the single plan
    # (ReusedExchange keeps one corpus shuffle) — a collect() here would
    # run the corpus exchange twice.  The broadcast nested loop over a
    # 1-row build side is a constant-time probe per edge row.
    n_docs = arrays.agg(F.count("*").cast("double").alias("_n"))

    scored = (
        edges.join(
            F.broadcast(
                df_tbl.select(
                    F.col("_t").alias("src"), F.col("_df").alias("df_src")
                )
            ),
            "src",
        )
        .join(
            F.broadcast(
                df_tbl.select(
                    F.col("_t").alias("dst"), F.col("_df").alias("df_dst")
                )
            ),
            "dst",
        )
        .crossJoin(F.broadcast(n_docs))
    )
    w = F.col("weight").cast("double")
    da = F.col("df_src").cast("double")
    db = F.col("df_dst").cast("double")
    n = F.col("_n")
    lift = w * n / (da * db)
    pmi = F.log(lift)
    npmi = F.when(w == n, F.lit(1.0)).otherwise(pmi / -F.log(w / n))
    return scored.select(
        "src",
        "dst",
        F.col("weight").cast("long").alias("weight"),
        "df_src",
        "df_dst",
        F.round(w / (da + db - w), 6).alias("jaccard"),
        F.round(lift, 6).alias("lift"),
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )


def merge_cooccurrence_edges(
    *edge_sets: DataFrame, min_weight: int = 1
) -> DataFrame:
    """Merge co-occurrence edge sets built over DISJOINT document sets.

    ``weight = |docs(a) ∩ docs(b)|`` is additive across a partition of
    the corpus: with each doc in exactly one batch, the intersection
    count over the union corpus is the sum of per-batch counts.  This
    algebra is what makes the KG incrementally maintainable at crawl
    scale — absorbing a new crawl batch costs tagging ∝ |batch| plus one
    pair-keyed sum over edge sets (≪ corpus-sized); no full rebuild.
    ``jobs/kg_update.py`` is the deployment form.

    Inputs must be full-fidelity (built with ``min_weight=1``): a
    threshold applied before the merge discards mass that later batches
    could have promoted over the cutoff.  Apply ``min_weight`` HERE,
    after the sum (or downstream).
    """
    import functools

    merged = (
        functools.reduce(lambda a, b: a.unionByName(b), edge_sets)
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )
    if min_weight > 1:
        merged = merged.where(F.col("weight") >= min_weight)
    return merged


def signed_pair_delta(
    old_arrays: DataFrame, new_arrays: DataFrame
) -> DataFrame:
    """Signed co-occurrence delta for docs whose term SETS changed:
    ``pairs(new) − pairs(old)`` as (src, dst, weight) rows with weight
    of either sign.

    Additivity makes this the exact dictionary-update algebra
    (``plans/kg_dict_update.py``): for the affected docs, subtract
    every old pair contribution and add every new one —
    ``merge_cooccurrence_edges(stored_edges, signed_pair_delta(...))``
    (then ``weight > 0``) equals a full rebuild with the new
    dictionary.  Both inputs must be ``doc_term_arrays``-shaped and
    cover the SAME url set (a url absent from one side contributes an
    empty term set there).  Only the affected docs explode — the delta
    costs O(affected), not O(corpus)."""
    neg = cooccurrence_edges_from_arrays(
        old_arrays, assume_deduped=True
    ).withColumn("weight", -F.col("weight"))
    pos = cooccurrence_edges_from_arrays(new_arrays, assume_deduped=True)
    return (
        pos.unionByName(neg)
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("long").alias("weight"))
        .where(F.col("weight") != 0)
    )


def cooccurrence_triples(edges: DataFrame) -> DataFrame:
    """Edges → (subj, co_occurs_with, obj, weight) triple rows."""
    return edges.select(
        F.col("src").alias("subj"),
        F.lit("co_occurs_with").alias("pred"),
        F.col("dst").alias("obj"),
        F.col("weight").cast("long").alias("weight"),
    )


def term_index(mentions: DataFrame, doc_col: str = "url",
               term_col: str = "curie") -> DataFrame:
    """A1 inverted index: curie → sorted distinct doc list + label.

    Matches load_ontotermentions.py:102-113 dedup semantics.  NOTE: at
    web scale a collected array per head term is the skew/OOM hazard
    (SURVEY.md §1.1) — this materialization is for parity/fixtures; the
    scale path keeps the normalized (doc, term) relation.
    """
    return (
        mentions.groupBy(term_col)
        .agg(
            F.array_sort(F.collect_set(doc_col)).alias("docs"),
            F.first("pref_label", ignorenulls=True).alias("pref_label"),
            F.countDistinct(doc_col).alias("doc_count"),
        )
    )


def term_index_salted(mentions: DataFrame, doc_col: str = "url",
                      term_col: str = "curie",
                      salt_buckets: int = 32) -> DataFrame:
    """A1 inverted index via salted repartitioning — the scale form of
    ``term_index`` when the materialized doc array is actually wanted
    (same output schema and values; equality pinned in tests).

    ``term_index``'s single ``collect_set`` funnels every row of a head
    term (df → 100% boilerplate CURIEs, SURVEY.md §4.1) into ONE reducer
    that builds the set row by row — the classic hot-key straggler.
    Salting splits the hot group by ``xxhash64(doc) % salt_buckets``
    BEFORE the exchange:

    * stage 1 groups on ``(term, salt)`` — the head term's rows spread
      over ``salt_buckets`` reducers, each collecting a partial set;
    * stage 2 regroups the ≤ ``salt_buckets`` partial arrays per term
      and concatenates — per-row aggregate work is gone, the final
      reducer appends a handful of pre-deduped blobs and sorts once.

    Because the salt is a pure function of the doc key, a doc lands in
    exactly one bucket per term: the flattened concatenation is already
    distinct, so ``doc_count = size(docs)`` without a second distinct
    pass.  Choose ``salt_buckets`` ≈ the cluster's reducer slots; tail
    terms pay one extra tiny exchange, which is the usual salting rent.
    """
    partial = (
        mentions.select(
            term_col, doc_col,
            F.col("pref_label") if "pref_label" in mentions.columns
            else F.lit(None).cast("string").alias("pref_label"))
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(doc_col)), F.lit(salt_buckets)))
        .groupBy(term_col, "_salt")
        .agg(
            F.collect_set(doc_col).alias("_docs_part"),
            F.first("pref_label", ignorenulls=True).alias("_label_part"),
        )
    )
    return (
        partial.groupBy(term_col)
        .agg(
            F.array_sort(F.flatten(F.collect_list("_docs_part")))
            .alias("docs"),
            F.first("_label_part", ignorenulls=True).alias("pref_label"),
        )
        .withColumn("doc_count", F.size("docs").cast("long"))
    )


def term_df_sketch(mentions: DataFrame, doc_col: str = "url",
                   term_col: str = "curie", k: int = 64,
                   salt_buckets: int = 32) -> DataFrame:
    """Approximate per-term document frequency via a KMV (k-minimum-
    values) distinct sketch — the mergeable-sketch scale path for term
    statistics at 10^12 docs, where exact ``countDistinct`` per head
    term funnels every occurrence through one reducer.

    Why KMV and not HyperLogLog: Spark's ``approx_count_distinct`` HLL
    is engine-private — no other system reproduces its estimates, so the
    value would be untestable against an independent oracle.  KMV over
    the engine's portable ``md5_long`` hash is *bit-reproducible in
    ANSI SQL*: the estimate is ``(k-1) * 2^60 / kth_smallest_hash``
    (hash space is 60-bit), i.e. a pure function of the k smallest
    hashes.  Standard error ≈ 1/√(k−2).

    Merge shape (the property that makes it a sketch): the k smallest
    of a union = the k smallest of the concatenated per-part k-smallest
    lists.  Stage 1 computes bounded partials per ``(term, hash-salt)``
    group — the head term's rows spread over ``salt_buckets`` reducers —
    stage 2 merges ≤ ``salt_buckets`` arrays of ≤ k values per term.
    Salt is a pure function of the doc hash, so the union is already
    distinct.  Terms with fewer than k distinct docs report exactly.

    Output: ``(term, df_est, sketch_size)`` — ``df_est`` exact when
    ``sketch_size < k``.
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    return finalize_term_sketch(
        term_sketch_partials(mentions, doc_col=doc_col, term_col=term_col,
                             k=k, salt_buckets=salt_buckets),
        k=k, term_col=term_col,
    )


def term_sketch_partials(mentions: DataFrame, doc_col: str = "url",
                         term_col: str = "curie", k: int = 64,
                         salt_buckets: int = 32) -> DataFrame:
    """The raw KMV sketch state: ``(term, ks)`` where ``ks`` is the k
    smallest distinct doc hashes — the MERGEABLE form a maintained
    sketch stage stores (``merge_term_sketches``); ``term_df_sketch``
    is ``finalize_term_sketch`` over this."""
    from onto_text_tag_spark.functions.hashing import md5_long

    hashed = mentions.select(
        F.col(term_col),
        md5_long(F.col(doc_col).cast("string")).alias("_h"),
    )
    partial = (
        hashed
        .withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_buckets)))
        .groupBy(term_col, "_salt")
        .agg(F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_ks"))
    )
    return partial.groupBy(term_col).agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("_ks"))), 1, k)
        .alias("ks")
    )


def merge_term_sketches(a: DataFrame, b: DataFrame, k: int,
                        term_col: str = "curie") -> DataFrame:
    """KMV merge: per term, the k smallest of the union of both hash
    sets.  EXACT — ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)``
    bit-for-bit, overlapping doc sets included (hash SETS union;
    ``array_distinct`` collapses docs present in both sides) — which is
    what makes the sketch maintainable under incremental absorbs
    without ever re-reading the corpus."""
    return (
        a.unionByName(b)
        .groupBy(term_col)
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(
                    F.collect_list("ks")))),
                1, k,
            ).alias("ks")
        )
    )


def finalize_term_sketch(sketches: DataFrame, k: int,
                         term_col: str = "curie") -> DataFrame:
    """(term, ks) → (term, df_est, sketch_size)."""
    kth = F.element_at("ks", k).cast("double")
    est = F.when(
        F.size("ks") < k, F.size("ks").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(2 ** 60)) / kth)
    return sketches.select(
        F.col(term_col),
        F.floor(est).cast("long").alias("df_est"),
        F.size("ks").cast("long").alias("sketch_size"),
    )


def windowed_cooccurrence_edges(
    positions: DataFrame,
    window: int,
    doc_col: str = "url",
    term_col: str = "curie",
    pos_col: str = "pos",
) -> DataFrame:
    """(src, dst, weight) for term pairs co-occurring within ``window``
    positions of each other — proximity-scoped co-occurrence, the
    refinement of the reference's whole-document intersection
    (hv_generate.py:49-51) that separates "mentioned in the same page"
    from "mentioned in the same breath".  ``weight`` counts DISTINCT
    documents containing at least one close pair; ``src < dst``
    canonical, self-pairs excluded — the same contract as
    ``cooccurrence_edges``.

    This is a RANGE join (|pos_a − pos_b| ≤ w), which Spark would
    otherwise execute as a per-document cartesian with a post-filter.
    The banded form makes it an EQUI join: each occurrence registers in
    bucket ⌊pos/w⌋ on the build side; the probe side expands to its own
    and its preceding bucket (every position-ordered pair within w spans
    at most one bucket boundary, so exactly one of the two probes hits —
    no dedup pass needed).  Shuffle keys are (doc, bucket): partitions
    stay corpus-sized and skew-free even when a document is long, since
    long documents split across their position buckets.
    """
    base = positions.select(
        F.col(doc_col).alias("_doc"),
        F.col(term_col).alias("_term"),
        F.col(pos_col).cast("long").alias("_pos"),
    ).distinct()
    w = int(window)
    build = base.select(
        "_doc", F.col("_term").alias("_term_l"), F.col("_pos").alias("_pos_l"),
        (F.col("_pos") / w).cast("long").alias("_bucket"),
    )
    probe = base.select(
        "_doc", F.col("_term").alias("_term_r"), F.col("_pos").alias("_pos_r"),
        F.explode(
            F.array((F.col("_pos") / w).cast("long") - 1,
                    (F.col("_pos") / w).cast("long"))
        ).alias("_bucket"),
    )
    close = (
        build.join(probe, ["_doc", "_bucket"])
        .where(
            (F.col("_pos_r") - F.col("_pos_l")).between(0, w)
            & (
                (F.col("_pos_l") < F.col("_pos_r"))
                | (F.col("_term_l") < F.col("_term_r"))
            )
            & (F.col("_term_l") != F.col("_term_r"))
        )
    )
    return (
        close.select(
            "_doc",
            F.least("_term_l", "_term_r").alias("src"),
            F.greatest("_term_l", "_term_r").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.countDistinct("_doc").alias("weight"))
    )


def mention_trends(mentions: DataFrame, documents: DataFrame,
                   doc_col: str = "url", term_col: str = "curie",
                   ts_col: str = "warc_ts",
                   bucket: str = "day") -> DataFrame:
    """Per-class crawl-time trend: distinct-doc mention counts per
    (class, time bucket) with previous-bucket delta — how a concept's
    web presence moves across crawls (emerging topics, seasonal terms,
    spam bursts).  The reference's association graph is timeless; the
    ``input_hint`` corpus carries ``warc_ts`` per capture, so the trend
    dimension belongs in the engine.

    Scale shape: the mention stream first collapses to distinct
    ``(doc, term)`` (map-side combined), joins the corpus only for the
    two columns ``(doc, bucket)`` (column pruning keeps html/text
    unread), and aggregates to the tiny (term, bucket) series; the
    delta window then sorts series-sized data, not mention-sized —
    the events_rolling plan shape applied to the KG fact stream.
    """
    from pyspark.sql import Window

    buckets = documents.select(
        F.col(doc_col),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
    )
    per_bucket = (
        mentions.select(doc_col, term_col).distinct()
        .join(buckets, doc_col)
        .groupBy(term_col, "bucket")
        .agg(F.countDistinct(doc_col).alias("n_docs"))
    )
    w = Window.partitionBy(term_col).orderBy("bucket")
    return per_bucket.select(
        term_col,
        "bucket",
        "n_docs",
        (
            F.col("n_docs")
            - F.coalesce(F.lag("n_docs").over(w), F.lit(0))
        ).alias("delta_prev_bucket"),
    )
