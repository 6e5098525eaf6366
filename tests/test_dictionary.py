"""Dictionary build tests (U1, P2-P5, A5, F3) — SURVEY.md §5 case list."""

from pyspark.sql import functions as F

from onto_text_tag_spark.corpus import ontology_df
from onto_text_tag_spark.dictionary import (
    build_dictionary,
    dictionary_tsv_rows,
    resolve_collisions,
)


def _dict(spark):
    return build_dictionary(ontology_df(spark))


def test_label_and_plural_rows(spark):
    d = _dict(spark)
    nic = {r["surface"] for r in d.where(F.col("id") == "CHEBI:0011").collect()}
    assert "nicotine" in nic and "nicotines" in nic
    # synonym + synonym plural
    assert "3-(1-methylpyrrolidin-2-yl)pyridine" in nic


def test_irregular_plural(spark):
    d = _dict(spark)
    forms = {r["surface"] for r in d.where(F.col("id") == "ADDICTO:0010").collect()}
    assert "diagnostic criterion" in forms
    assert "diagnostic criteria" in forms  # inflect-style irregular head noun


def test_stopword_label_dropped(spark):
    d = _dict(spark)
    assert d.where(F.col("id") == "ADDICTO:0009").count() == 0


def test_hard_exclusion(spark):
    # reference app.py:623-624: BCIO:010055 never enters the dictionary
    d = _dict(spark)
    assert d.where(F.col("id") == "BCIO:010055").count() == 0


def test_namespace_extraction(spark):
    d = _dict(spark)
    onts = {r["ont"] for r in d.select("ont").distinct().collect()}
    assert onts == {"CHEBI", "ADDICTO", "BCIO", "ENVO"}


def test_collision_last_ontology_wins(spark):
    # "craving" defined by ADDICTO:0007 (ont_order 0) and BCIO:0006 — with
    # explicit ont_order, the later-loaded ontology wins (A5 pin).
    onto = ontology_df(spark).withColumn(
        "ont_order",
        F.when(F.col("curie").startswith("BCIO"), F.lit(1)).otherwise(F.lit(0)),
    )
    resolved = resolve_collisions(build_dictionary(onto))
    rows = resolved.where(F.col("surface") == "craving").collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "BCIO:0006"


def test_resolved_surface_unique(spark):
    resolved = resolve_collisions(_dict(spark))
    total = resolved.count()
    distinct = resolved.select("surface").distinct().count()
    assert total == distinct


def test_tsv_projection_shape(spark):
    tsv = dictionary_tsv_rows(_dict(spark))
    assert tsv.columns == ["a", "ont", "id", "alt_name", "name", "definition"]
    row = tsv.where(F.col("id") == "CHEBI:0012").orderBy("alt_name").first()
    assert row["a"] == "" and row["name"] == "caffeine"
