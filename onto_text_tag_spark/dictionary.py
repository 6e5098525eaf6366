"""Dictionary build: ontology class rows → surface-form dictionary table.

Re-derivation of the reference dictionary builder (app.py:603-679 /
ontotagtext.py:73-107): for every ontology class emit one row per surface
form — label, plural(label), each synonym, plural(synonym) — stopword-
filtered, with the hard-coded exclusion and a pinned cross-ontology
collision policy.  Output matches the reference's 6-column TSV shape
(``a ont id alt_name name definition``, app.py:626-637,674) plus a
``surface`` column (the lowercase match key the PhraseMatcher actually
uses, ontotagtext.py:110).

Spark shape: the ontology table is small (thousands of classes), so the
whole stage is a handful of narrow projections + one ``unionByName`` —
U1/P2-P5/A5/F3 of SURVEY.md §2 — and the result is broadcast downstream.
Everything except pluralization is JVM-side builtins; pluralization has
no Spark builtin (P4) and runs in one Arrow-batched pandas UDF over the
small table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from onto_text_tag_spark.functions.pluralize import plural

# spaCy EN stopword list is not importable here; the reference removes
# surface forms that are stopwords (ontotagtext.py:50-53,89,98 — spaCy
# STOP_WORDS plus {"ands","ends","ci"}).  We pin the subset that can
# plausibly collide with ontology labels; membership is checked on the
# lowercased surface.  app.py:605-609 duplicates the same policy.
STOPWORDS = frozenset(
    """a about above after again against all also am an and any are as at be
    because been before being below between both but by can could did do does
    doing down during each few for from further had has have having he her
    here hers herself him himself his how i if in into is it its itself just
    me more most my myself no nor not now of off on once only or other our
    ours ourselves out over own same she should so some such than that the
    their theirs them themselves then there these they this those through to
    too under until up very was we were what when where which while who whom
    why will with you your yours yourself yourselves""".split()
) | {"ands", "ends", "ci"}

# Hard-coded single-term exclusion (reference app.py:623-624,771-772).
EXCLUDED_CURIES = ("BCIO:010055",)


@pandas_udf(StringType())
def plural_udf(surface: pd.Series) -> pd.Series:
    """P4/F3: deterministic pluralizer (reference inflect usage,
    ontotagtext.py:92-94)."""
    return surface.map(lambda s: plural(s) if s else s)


def _surface_rows(ontology: DataFrame, source_col: str, form: str) -> DataFrame:
    """One projection of the ontology table to candidate dictionary rows."""
    base = ontology.select(
        F.col("curie").alias("id"),
        F.col(source_col).alias("raw_surface"),
        F.col("label").alias("name"),
        F.coalesce(F.col("definition"), F.lit("")).alias("definition"),
        F.col("ont_order"),
    ).where(F.col("raw_surface").isNotNull() & (F.trim(F.col("raw_surface")) != ""))
    if form.endswith("plural"):
        base = base.withColumn("raw_surface", plural_udf(F.col("raw_surface")))
    return base.withColumn("form", F.lit(form))


def build_dictionary(ontology: DataFrame) -> DataFrame:
    """Ontology rows → dictionary rows (reference TSV columns + surface).

    Input needs columns (curie, label, synonyms:array<string>, definition)
    plus optionally ``ont_order`` (position of the source ontology in load
    order — collision policy A5: the dict insert at ontotagtext.py:90-104
    is last-write-wins across ontologies iterated in ontoDict order,
    app.py:100-114; larger ont_order wins here).
    """
    if "ont_order" not in ontology.columns:
        ontology = ontology.withColumn("ont_order", F.lit(0))

    # Stopword gating happens on the BASE form (reference ontotagtext.py:89,98:
    # a stopword label contributes neither itself nor its plural).
    def _not_stopword(df: DataFrame, col: str) -> DataFrame:
        return df.where(~F.lower(F.trim(F.col(col))).isin(*sorted(STOPWORDS)))

    onto_ok = _not_stopword(ontology, "label")
    syn = _not_stopword(
        ontology.withColumn("syn", F.explode_outer("synonyms")).where(
            F.col("syn").isNotNull()
        ),
        "syn",
    )
    labels = _surface_rows(onto_ok, "label", "label")
    label_plurals = _surface_rows(onto_ok, "label", "label_plural")
    syns = _surface_rows(syn, "syn", "synonym")
    syn_plurals = _surface_rows(syn, "syn", "synonym_plural")

    rows = (
        labels.unionByName(label_plurals)
        .unionByName(syns)
        .unionByName(syn_plurals)
        .withColumn("surface", F.lower(F.trim(F.col("raw_surface"))))  # P2
        .withColumn("alt_name", F.trim(F.col("raw_surface")))
        .drop("raw_surface")
        # P3 stopword filter — small static list → literal isin
        .where(~F.col("surface").isin(*sorted(STOPWORDS)))
        # P5 hard exclusion
        .where(~F.col("id").isin(*EXCLUDED_CURIES))
        # P7 namespace from CURIE prefix
        .withColumn("ont", F.substring_index(F.col("id"), ":", 1))
        .withColumn("a", F.lit(""))
    )

    # Exact-duplicate surface rows within one concept (e.g. invariant
    # plural "tobacco" == "tobacco") collapse to one row, keeping the
    # earliest form (label < label_plural < synonym < synonym_plural order
    # mirrors reference emission order app.py:627-670).
    form_rank = F.when(F.col("form") == "label", 0).when(
        F.col("form") == "label_plural", 1
    ).when(F.col("form") == "synonym", 2).otherwise(3)
    w = Window.partitionBy("id", "surface").orderBy(form_rank.asc())
    deduped = (
        rows.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    return deduped.select(
        "a", "ont", "id", "alt_name", "name", "definition", "surface", "form",
        "ont_order",
    )


def resolve_collisions(dictionary: DataFrame) -> DataFrame:
    """A5: one winning concept per lowercase surface.

    Reference semantics: ``self.terms[surface] = entry`` overwrites — the
    last ontology loaded wins (ontotagtext.py:90-104; load order
    app.py:100-114).  Pinned here as: highest ``ont_order`` wins, ties
    broken by CURIE descending (later insert within one ontology ==
    later class id in iteration order).
    """
    w = Window.partitionBy("surface").orderBy(
        F.col("ont_order").desc(), F.col("id").desc()
    )
    return (
        dictionary.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def build_dictionary_rows(ontology_rows: list[dict]) -> list[dict]:
    """Pure-Python twin of ``resolve_collisions(build_dictionary(df))``
    restricted to the tagging columns (surface, id, name, ont).

    The ontology is driver-side small data in every deployment (it is
    parsed on the driver before it ever becomes a DataFrame), so the
    tagging hot path should not pay Spark jobs to build + collect the
    dictionary.  Parity with the Spark builder is pinned by
    tests/test_dictionary.py::test_rows_twin_matches_spark_builder.
    """
    by_surface: dict[str, tuple] = {}
    for row in ontology_rows:
        curie = row["curie"]
        if curie in EXCLUDED_CURIES:
            continue
        label = row.get("label")
        ont_order = row.get("ont_order", 0)
        ont = curie.split(":", 1)[0]
        bases = []
        if label is not None and label.strip():
            bases.append(label)
        for syn in row.get("synonyms") or []:
            if syn is not None and syn.strip():
                bases.append(syn)
        for base in bases:
            # stopword gating on the BASE form: a stopword label
            # contributes neither itself nor its plural
            if base.strip().lower() in STOPWORDS:
                continue
            for raw in (base, plural(base)):
                if raw is None or not raw.strip():
                    continue
                surface = raw.strip().lower()
                if surface in STOPWORDS:
                    continue
                prev = by_surface.get(surface)
                # A5 collision policy: highest ont_order wins, ties by
                # CURIE descending (resolve_collisions ordering)
                if prev is None or (ont_order, curie) > (prev[0], prev[1]):
                    by_surface[surface] = (ont_order, curie, label, ont)
    return [
        {"surface": s, "id": c, "name": n, "ont": o}
        for s, (_, c, n, o) in sorted(by_surface.items())
    ]


def dictionary_tsv_rows(dictionary: DataFrame) -> DataFrame:
    """Reference TSV projection (6 columns, headerless — app.py:674)."""
    return dictionary.select("a", "ont", "id", "alt_name", "name", "definition")


def write_dictionary_tsv(dictionary: DataFrame, path: str) -> None:
    """S5 sink: tab-separated, no header — fixture parity with
    static/test_terms.tsv."""
    (
        dictionary_tsv_rows(dictionary)
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "false")
        .csv(path)
    )
