"""Context-scored candidate entity linking (mention disambiguation).

The reference links every detected surface form to exactly ONE ontology
class at dictionary-BUILD time: colliding surfaces are resolved by
dict-key overwrite in iteration order (reference ontotagtext.py:90-104 /
app.py:100-114, re-derived as ``dictionary.resolve_collisions`` —
SURVEY.md §2 A5), so whichever class wins owns the surface corpus-wide.  That is
fine for one curated domain dictionary, but wrong the moment two
ontologies legitimately share a surface ("vector" the embedding vs.
"vector" the disease carrier): a single global winner mis-links every
document from the other domain.

``disambiguate`` instead keeps ALL candidate classes per surface and
resolves each (document, surface) occurrence by document context — the
north_star's "candidate entity linking" step as a first-class operator:

* context profile: for every document, the distinct unambiguously-linked
  classes it mentions, counted per ontology prefix (the ont is the
  domain signal: a page mentioning ``sort``/``filter``/``hash join``
  is an OP-domain page);
* score: a candidate's score for an occurrence is the document's
  unambiguous-class support for the candidate's ontology;
* winner: highest score, ties broken by CURIE ascending — fully
  deterministic, and with zero context the tie-break degrades to the
  reference-style static choice.

Scale shape: the candidate table is dictionary-sized → broadcast to
both the ambiguity split and the scoring join (no corpus-keyed shuffle
is introduced by candidates).  The context profile is one map-side
combinable groupBy over the mention stream keyed (doc, ont); scoring
left-joins occurrence×candidate rows against it on the same key — all
shuffles are corpus-keyed and bounded by the mention count, never
corpus × candidates.  The winner pick is a single ``row_number`` window
per (doc, surface), whose partitions are candidate-set-sized (tiny) and
co-partitioned with the scoring join's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def disambiguate(
    mentions: DataFrame,
    candidates: DataFrame,
    doc_col: str = "url",
    surface_col: str = "surface",
    curie_col: str = "curie",
) -> DataFrame:
    """Resolve ambiguous mention surfaces by document context.

    ``mentions``: the tagger's output (one row per detected occurrence)
    carrying ``doc_col``, ``surface_col`` and the dictionary's statically
    linked ``curie_col`` (used only for the unambiguous context rows).
    ``candidates``: the full (surface, curie) candidate relation —
    surfaces with >1 row are the ambiguous ones to resolve.  Ontology
    prefixes are derived from the CURIEs (``split(curie, ':')[0]``) on
    both sides, so context and candidates can never disagree on the
    domain key.

    Returns one row per distinct ambiguous (doc, surface) occurrence:
    (doc_col, surface_col, curie, ont, score) — the winning candidate,
    its ontology prefix, and its context support (0 when the document
    carries no signal; the CURIE tie-break makes that case
    deterministic too).
    """
    cand = candidates.select(
        F.col(surface_col).alias("surface"),
        F.col(curie_col).alias("curie"),
    ).withColumn("ont", F.split("curie", ":").getItem(0))
    amb = (
        cand.groupBy("surface")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > 1)
        .select("surface")
    )

    m = mentions.select(
        F.col(doc_col).alias("doc"),
        F.col(surface_col).alias("surface"),
        F.col(curie_col).alias("curie"),
    )
    ctx = (
        m.join(F.broadcast(amb), "surface", "left_anti")
        .withColumn("ont", F.split("curie", ":").getItem(0))
        .groupBy("doc", "ont")
        .agg(F.countDistinct("curie").cast("long").alias("_support"))
    )
    occ = (
        m.join(F.broadcast(amb), "surface", "left_semi")
        .select("doc", "surface")
        .distinct()
    )
    scored = (
        occ.join(F.broadcast(cand), "surface")
        .join(ctx, ["doc", "ont"], "left")
        .withColumn(
            "score", F.coalesce(F.col("_support"), F.lit(0)).cast("long")
        )
    )
    w = Window.partitionBy("doc", "surface").orderBy(
        F.col("score").desc(), F.col("curie").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("doc").alias(doc_col),
            F.col("surface").alias(surface_col),
            "curie",
            "ont",
            "score",
        )
    )


def entity_salience(
    mentions: DataFrame,
    doc_col: str = "url",
    term_col: str = "curie",
) -> DataFrame:
    """Per-(document, class) salience: tf·idf over the mention stream,
    ranked within each document.

    The reference renders every tag with equal prominence
    (app.py:702-708); at web scale a page mentions dozens of classes
    and downstream consumers (node profiles, training-data filtering,
    per-page topic assignment) need to know which ones the page is
    ABOUT.  Classic tf·idf does that with two aggregates:

    * tf  = mention count of the class in the document (repetition =
      emphasis, the signal the set-semantics pipeline deliberately
      discards for co-occurrence);
    * idf = ln(N / df) with df = documents mentioning the class and N =
      documents with ≥1 mention — boilerplate classes on every page get
      idf → 0 and stop dominating;
    * salience = tf · idf, rank = per-document ``row_number`` by
      (salience desc, curie asc) — deterministic.

    Scale shape: one (doc, term)-keyed aggregate for tf (map-side
    combinable), one term-keyed df aggregate whose output is
    ontology-bounded → broadcast back onto the tf relation (no second
    corpus shuffle), N crossed in as a 1-row broadcast.  The rank
    window partitions by document — corpus-keyed, co-partitioned with
    tf's exchange.  Floats deterministic: exact long counts, IEEE
    division, one ln.
    """
    tf = (
        mentions.select(doc_col, term_col)
        .groupBy(doc_col, term_col)
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_tbl = (
        tf.groupBy(term_col)
        .agg(F.countDistinct(doc_col).cast("long").alias("df"))
    )
    n_docs = tf.agg(
        F.countDistinct(doc_col).cast("double").alias("_n")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), term_col)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "salience",
            F.col("tf").cast("double")
            * F.log(F.col("_n") / F.col("df").cast("double")),
        )
    )
    win = Window.partitionBy(doc_col).orderBy(
        F.col("salience").desc(), F.col(term_col).asc()
    )
    return scored.select(
        doc_col,
        term_col,
        "tf",
        "df",
        F.round("salience", 6).alias("salience"),
        F.row_number().over(win).cast("long").alias("rank"),
    )


def mention_contexts(
    documents: DataFrame,
    positions: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    pos_col: str = "pos",
    term_col: str = "curie",
) -> DataFrame:
    """(id, curie, pos, context) — the ±``window``-token snippet around
    each mention occurrence: the (surface, context) pair every learned
    entity-linking / disambiguation model trains on, and the KWIC view
    an annotation UI shows.

    ``positions`` carries 1-based token positions (as emitted by the
    position-aware tagging path).  The context slice is pure JVM list
    algebra on the re-tokenized document — one equi-join of positions
    back to the corpus (both sides doc-keyed, no skew beyond document
    length), then ``slice`` bounded at both ends.  At 100 TB the join is
    mention-stream × corpus on the id key — co-partitioned for free when
    mentions were derived from the same scan, bucketed tables otherwise.
    """
    toks = documents.select(
        F.col(id_col), F.expr(
            f"filter(split({text_col}, '\\\\s+'), t -> t != '')"
        ).alias("_l"),
    )
    p = positions.select(
        F.col(id_col), F.col(term_col).alias("curie"),
        F.col(pos_col).cast("long").alias("pos"),
    )
    start = F.greatest(F.col("pos") - window, F.lit(1))
    length = (
        F.least(F.col("pos") + F.lit(window), F.size("_l").cast("long"))
        - start + 1
    )
    return (
        p.join(toks, id_col)
        .select(
            id_col, "curie", "pos",
            F.array_join(
                F.slice("_l", start, length), " "
            ).alias("context"),
        )
    )
