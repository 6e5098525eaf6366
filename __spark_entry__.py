"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2 + training-data
extensions); ``oracle_sql()`` gives the DuckDB twin for each.
Implementation lives in onto_text_tag_spark/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tag sf0.001 documents with the driver ontology dictionary,
    emit co-occurrence edges ordered by weight (the reference's association
    graph, hv_generate.py:39-58, as one declarative DAG)."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.driver_queries import q_kg_cooccur

    edges = q_kg_cooccur(spark, "/root/testdata/sf0.001")
    return edges.orderBy(F.col("weight").desc(), "src", "dst")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from onto_text_tag_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from onto_text_tag_spark.driver_queries import ORACLES

    return dict(ORACLES)
