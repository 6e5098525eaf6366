"""Transitive is-a closure (J5) via iterative self-join to fixpoint.

Reference: ``pyhornedowl`` descendant expansion — recursive walk of
SubClassOf axioms (app.py:116-151).  Spark shape: the ontology DAG is an
edge DataFrame; closure = iterative path-doubling self-join until no new
pairs appear.

Scale notes:

* Path doubling (closure ⋈ closure) converges in O(log depth) rounds vs
  O(depth) for naive edge-extension — ontologies are shallow (≤ ~20
  levels) so either is fine, but doubling keeps round count tiny even
  for deep graphs.
* Each round materializes via ``localCheckpoint`` to cut the growing
  lineage chain — the classic iterative-algorithm trap on Spark
  (SURVEY.md §4.3).
* Ontology closures are small (≤ millions of pairs) → the closure table
  is broadcast-joined downstream (descendant expansion J5 becomes a
  broadcast semi-join against selected roots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def isa_edges_from_ontology(ontology: DataFrame) -> DataFrame:
    """(child_curie, parent_curie) edge list from ontology class rows."""
    return ontology.where(F.col("parent_curie").isNotNull()).select(
        F.col("curie").alias("child_curie"),
        F.col("parent_curie").alias("parent_curie"),
    )


def transitive_closure(edges: DataFrame, max_iterations: int = 30) -> DataFrame:
    """All (descendant, ancestor) pairs reachable via is-a edges.

    Path-doubling: closure_{k+1} = closure_k ∪ (closure_k ⋈ closure_k),
    fixpoint when the pair count stops growing.  Matches the reference's
    ``get_descendants`` transitive semantics (app.py:124,136) for every
    root simultaneously.
    """
    closure = edges.select(
        F.col("child_curie").alias("descendant"),
        F.col("parent_curie").alias("ancestor"),
    ).distinct().localCheckpoint(eager=True)
    count = closure.count()

    for _ in range(max_iterations):
        hop = (
            closure.alias("l")
            .join(
                closure.alias("r"),
                F.col("l.ancestor") == F.col("r.descendant"),
            )
            .select(
                F.col("l.descendant").alias("descendant"),
                F.col("r.ancestor").alias("ancestor"),
            )
        )
        new_closure = closure.unionByName(hop).distinct().localCheckpoint(eager=True)
        new_count = new_closure.count()
        closure = new_closure
        if new_count == count:
            break
        count = new_count
    return closure


def transitive_closure_rows(
    edges: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Pure-Python twin of ``transitive_closure`` for driver-side
    ontologies (every real ontology parses on the driver; paying ~20
    Spark stages of iterative-join overhead for a few thousand edges is
    the wrong physics — the distributed version stays for edge sets that
    do not fit the driver)."""
    children: dict[str, set[str]] = {}
    for child, parent in edges:
        children.setdefault(child, set()).add(parent)
    out: set[tuple[str, str]] = set()
    for start in children:
        seen: set[str] = set()
        stack = list(children[start])
        while stack:
            node = stack.pop()
            if node in seen:
                continue
            seen.add(node)
            out.add((start, node))
            stack.extend(children.get(node, ()))
    return sorted(out)


def descendants_of(closure: DataFrame, roots: DataFrame | list[str]) -> DataFrame:
    """J5 descendant expansion: all descendants of the given root CURIEs,
    roots included (reference returns the selection ∪ its descendants,
    app.py:143-150 union + dedupe)."""
    spark = closure.sparkSession
    if isinstance(roots, list):
        from onto_text_tag_spark.session import local_df

        roots = local_df(spark, [(r,) for r in roots], "curie string")
    expanded = (
        closure.join(
            F.broadcast(roots.withColumnRenamed("curie", "ancestor")), "ancestor"
        )
        .select(F.col("descendant").alias("curie"))
    )
    return expanded.unionByName(roots.select("curie")).distinct()


def rollup_doc_counts(
    doc_terms: DataFrame,
    closure: DataFrame,
    classes: DataFrame,
    doc_col: str = "doc_id",
    term_col: str = "curie",
) -> DataFrame:
    """(curie, doc_count) with doc_count = distinct documents mentioning
    the class OR ANY OF ITS DESCENDANTS — the taxonomy rollup.

    This is the composition the reference performs one root at a time:
    descendant expansion (app.py:116-151) feeding the per-term PMID-set
    probe (hv_generate.py:28-36) — "how big is the literature under X,
    subclasses included".  Here every class rolls up simultaneously in
    one job.

    Shape at scale: the reflexive closure (ontology-sized, ≤ millions of
    rows) broadcasts onto the corpus-sized distinct (doc, term) relation,
    fanning each mention out to its ancestor chain — bounded by hierarchy
    depth, not corpus size, so the blow-up is ~depth×.  The count-distinct
    then runs as Spark's two-phase rewrite: partial dedupe on the
    fine-grained (ancestor, doc) pair before the per-ancestor count, so
    root classes (which every document rolls into — the df=100% hot key)
    never concentrate raw mention rows on one reducer.  Classes nobody
    mentions (directly or below) report 0, same contract as the nodes
    table.
    """
    refl = closure.select("descendant", "ancestor").unionByName(
        classes.select(
            F.col(term_col).alias("descendant"),
            F.col(term_col).alias("ancestor"),
        )
    )
    dt = doc_terms.select(doc_col, term_col).distinct()
    rolled = (
        dt.join(F.broadcast(refl), dt[term_col] == refl["descendant"])
        .groupBy("ancestor")
        .agg(F.countDistinct(doc_col).alias("doc_count"))
    )
    return (
        classes.select(term_col)
        .join(rolled, classes[term_col] == rolled["ancestor"], "left")
        .select(
            term_col,
            F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias(
                "doc_count"
            ),
        )
    )


def isa_triples(edges: DataFrame) -> DataFrame:
    """Direct is-a edges → (child, is_a, parent) triples (SURVEY.md §2.9)."""
    return edges.select(
        F.col("child_curie").alias("subj"),
        F.lit("is_a").alias("pred"),
        F.col("parent_curie").alias("obj"),
        F.lit(None).cast("long").alias("weight"),
    )


def cycle_members(edges: DataFrame, max_iterations: int = 30) -> DataFrame:
    """Classes on an is-a CYCLE — the ontology-QA gate closure-based
    reasoning needs before it runs.

    The reference walks SubClassOf axioms recursively with no visited
    set (app.py:116-151) — a cyclic release (two classes declared
    subclasses of each other, a real failure mode of merged ontology
    imports) recurses forever there.  ``transitive_closure`` is safe
    (pair-set fixpoint saturates), and on a cyclic input the closure
    contains (c, c) exactly for the classes on a cycle: c reaches
    itself via ≥1 edge.  This operator surfaces those classes so a
    build can fail loudly / quarantine the cycle instead of silently
    producing a reflexive "descendant of itself" hierarchy.

    Scale shape: inherits path-doubling closure (O(log depth) self-join
    rounds); the self-pair filter is a narrow predicate on the closure.
    """
    return (
        transitive_closure(edges, max_iterations=max_iterations)
        .where(F.col("descendant") == F.col("ancestor"))
        .select(F.col("descendant").alias("curie"))
        .distinct()
    )
