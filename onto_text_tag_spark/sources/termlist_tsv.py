"""Termlist TSV source — the reference tagger's dictionary interchange.

The reference's runtime tagger is OGER loaded from a termlist file:
``Router(termlist_path='static/test_terms.tsv')`` (app.py:57-60), the
same 6-column headerless TSV its build stage writes (app.py:674:
``a ont id alt_name name definition``; our sink twin is
dictionary.write_dictionary_tsv, S5).  This module is the SOURCE side:
read a termlist TSV back into dictionary rows so a tagging job can run
from a published dictionary artifact instead of re-deriving it from
ontologies — exactly how the reference deploys (the TSV + pickle ship
with the app, README.MD:22).

Collision policy on load: the in-memory OGER/PhraseMatcher termlist keys
on the lowercased surface with last-write-wins (A5, ontotagtext.py:
90-104), so later TSV rows overwrite earlier ones for the same surface.

Scale note: termlists are broadcast-sized by construction (thousands of
rows).  The driver-side reader is the hot path twin used by jobs; the
Spark reader exists for pipelines that keep the dictionary as a table.
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

# Positional schema of app.py:674 (no header in the file).
TERMLIST_TSV = StructType(
    [
        StructField("a", StringType()),           # always empty
        StructField("ont", StringType()),         # namespace prefix
        StructField("id", StringType()),          # CURIE
        StructField("alt_name", StringType()),    # surface form
        StructField("name", StringType()),        # preferred label
        StructField("definition", StringType()),  # IAO:0000115 text
    ]
)


def read_termlist_rows(path: str) -> list[dict]:
    """Driver-side termlist load → collision-resolved dictionary rows.

    Returns the same row shape as dictionary.build_dictionary_rows
    (surface, id, name, ont) — ready for tagger.compile_dictionary.
    Surfaces are matched lowercased (PhraseMatcher attr='LOWER',
    ontotagtext.py:110); later rows win surface collisions (A5).
    """
    by_surface: dict[str, dict] = {}
    with open(path, newline="") as fh:
        for row in csv.reader(fh, delimiter="\t"):
            if len(row) != 6:
                continue  # tolerate ragged rows like the reference loader
            _a, ont, curie, alt_name, name, _definition = row
            surface = (alt_name or "").strip().lower()
            if not surface or not curie:
                continue
            by_surface[surface] = {
                "surface": surface,
                "id": curie,
                "name": name,
                "ont": ont,
            }
    return sorted(by_surface.values(), key=lambda r: r["surface"])


def read_termlist(spark: SparkSession, path: str) -> DataFrame:
    """Spark scan of a termlist TSV with the explicit positional schema
    (never inferSchema).  Quote processing stays ON (the '"' default,
    matching csv.reader above): the reference WRITES the file with
    csv.DictWriter QUOTE_MINIMAL (app.py:676-678), so de-quoting on read
    is what round-trips the original field values."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "false")
        .option("quote", '"')
        .schema(TERMLIST_TSV)
        .csv(path)
    )
