"""S4: positional CSV scan of the mention fact table.

The reference's offline ETL reads ``ontotermmentions.csv`` — a
headerless 4-column positional CSV ``(number, ID/IRI, surface, pmID)``
(load_ontotermentions.py:68-74) — and normalizes the IRI column to a
CURIE with ``rsplit('/',1)[1]`` + '_'→':' (load_ontotermentions.py:75-80).

Spark-first form: ``spark.read.csv`` with an EXPLICIT schema (never
inferSchema — a second pass over 100 TB), column meaning pinned by
position exactly like the reference consumer, CURIE normalization as a
JVM column expression (P6).  The scan is splittable (uncompressed CSV
splits on byte ranges), so partitioning follows file size / cluster
cores with no extra work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from onto_text_tag_spark.functions.scalars import curie_from_iri_col

# Positional schema of load_ontotermentions.py:74:
#   number, ID (IRI or CURIE), surface text, pmID
MENTIONS_CSV = StructType(
    [
        StructField("number", StringType()),   # row counter, string in file
        StructField("id", StringType()),       # IRI or CURIE
        StructField("surface", StringType()),  # matched span text
        StructField("pmid", StringType()),     # document id
    ]
)


def read_mentions_csv(spark: SparkSession, path: str) -> DataFrame:
    """Scan the 4-col positional mention CSV with an explicit schema."""
    return spark.read.csv(path, schema=MENTIONS_CSV, header=False, sep=",")


def normalized_mentions(raw: DataFrame) -> DataFrame:
    """raw CSV rows → (doc_id, curie, surface) fact rows.

    IRI→CURIE normalization matches the reference exactly: values that
    already look like CURIEs (no '/') pass through; IRIs take the last
    path segment with the first '_' replaced by ':'
    (load_ontotermentions.py:75-80).
    """
    curie = F.when(
        F.col("id").contains("/"), curie_from_iri_col(F.col("id"))
    ).otherwise(F.col("id"))
    return raw.select(
        F.col("pmid").alias("doc_id"),
        curie.alias("curie"),
        F.col("surface"),
    )
