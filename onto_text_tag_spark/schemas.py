"""Explicit StructType schemas for every table in the pipeline.

The reference keeps schemas positional-by-convention (SURVEY.md §1.3,
app.py:674); here every table is explicit so writers enforce them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Corpus input — BASELINE.json input_hint, verbatim.
DOCUMENTS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Ontology class rows (FIXTURES.md §2) — what pyhornedowl exposes
# (reference ontotagtext.py:77-107).
ONTOLOGY = StructType(
    [
        StructField("iri", StringType(), False),
        StructField("curie", StringType(), False),
        StructField("label", StringType(), True),
        StructField("synonyms", ArrayType(StringType()), True),
        StructField("definition", StringType(), True),
        StructField("parent_curie", StringType(), True),
    ]
)

# Term dictionary — reference 6-column TSV (app.py:626,674), plus the
# lowercase surface key the matcher actually uses (ontotagtext.py:110).
DICTIONARY = StructType(
    [
        StructField("a", StringType(), True),  # always '' (app.py:627)
        StructField("ont", StringType(), True),
        StructField("id", StringType(), False),
        StructField("alt_name", StringType(), False),
        StructField("name", StringType(), True),
        StructField("definition", StringType(), True),
    ]
)

# Mention fact table (FIXTURES.md §4; reference tag_results app.py:702-708).
MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("begin", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("span_text", StringType(), False),
        StructField("curie", StringType(), False),
        StructField("pref_label", StringType(), True),
        StructField("ont", StringType(), True),
    ]
)

# KG triples (FIXTURES.md §5).
TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("weight", LongType(), True),
    ]
)

ISA_EDGES = StructType(
    [
        StructField("child_curie", StringType(), False),
        StructField("parent_curie", StringType(), False),
    ]
)
