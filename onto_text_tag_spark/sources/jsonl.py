"""Newline-delimited JSON document interchange (WET/CDX-style sidecar
format: crawls and annotation vendors exchange documents as JSONL at
least as often as parquet).

Contract mirrors the parquet corpus (schemas.DOCUMENTS) with two JSON
adaptations, both pinned by tests:

* ``html: binary`` travels base64-encoded (JSON has no bytes type);
  round-trip is bit-exact.
* reads are schema-ENFORCED, never inferred — ``inferSchema`` over
  10^12 rows is a full extra pass, and drifting vendor fields must not
  silently widen the table.  Malformed lines land in a
  ``_corrupt_record`` column (PERMISSIVE, the audit-friendly default)
  or drop (``mode="DROPMALFORMED"``) — never kill the job mid-crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

JSONL_FIELDS = [
    StructField("url", StringType(), False),
    StructField("warc_ts", StringType(), True),   # ISO-8601 in transit
    StructField("html_b64", StringType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
]


def write_document_jsonl(docs: DataFrame, path: str) -> None:
    """documents (schemas.DOCUMENTS) → JSONL shards at ``path``."""
    (
        docs.select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias(
                "warc_ts"
            ),
            F.base64("html").alias("html_b64"),
            "text",
            "lang",
        )
        .write.mode("overwrite")
        .json(path)
    )


def read_document_jsonl(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """JSONL shards → documents DataFrame (schemas.DOCUMENTS layout).

    ``mode="PERMISSIVE"`` adds a ``_corrupt_record`` column holding any
    unparseable line (select it for the crawl-health audit);
    ``mode="DROPMALFORMED"`` silently drops bad lines.

    Spark restriction: a query touching ONLY ``_corrupt_record`` is
    disallowed straight off raw JSON — cache or snapshot the parsed
    frame first (the corrupt-line audit naturally runs alongside the
    ingest count, which materializes it anyway).
    """
    fields = list(JSONL_FIELDS)
    if mode == "PERMISSIVE":
        fields = fields + [StructField("_corrupt_record", StringType(), True)]
    raw = (
        spark.read.schema(StructType(fields))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    out = raw.select(
        "url",
        F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
        *(["_corrupt_record"] if mode == "PERMISSIVE" else []),
    )
    return out
