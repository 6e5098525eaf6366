"""Incremental (streaming) KG construction surface.

The reference is strictly request/response + offline rebuild
(SURVEY.md §1.4) — streaming is an additive capability: the same
tagging logic applied to a document stream via Structured Streaming,
with watermarked windowed aggregation of mention counts.

The tagging stage reuses the exact batch automaton (broadcast once;
``mapInPandas`` works identically on streaming DataFrames), so batch
and streaming tagging can never diverge.  The sink contract is
checkpointed exactly-once-per-epoch parquet — the streaming analog of
sinks.write_stage.

Scale notes: the stateful ops here (windowed counts) keep bounded state
via watermarks; the co-occurrence self-join is NOT offered in streaming
mode (stream-stream self-join state would be unbounded over a corpus) —
co-occurrence stays a batch/rollup stage over the mention table, which
is the correct architecture at 10^12 docs anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from onto_text_tag_spark.operators.tagger import tag_documents
from onto_text_tag_spark.schemas import DOCUMENTS


def read_document_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source document stream (new parquet files under ``path``).

    ``maxFilesPerTrigger`` bounds per-epoch work — backpressure for
    bursty crawls."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tag_stream(documents: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Streaming mention extraction — same operator as batch tagging.

    ``tag_documents`` only uses narrow ops (select + mapInPandas), all
    streaming-compatible; the dictionary is a batch DataFrame collected
    and broadcast once at query start."""
    return tag_documents(documents, dictionary)


def windowed_mention_counts(
    mentions: DataFrame,
    events_ts_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per CURIE (late data dropped
    after the watermark; state bounded)."""
    return (
        mentions.withWatermark(events_ts_col, watermark)
        .groupBy(
            F.window(F.col(events_ts_col), window).alias("w"),
            F.col("curie"),
        )
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "curie",
            "n_mentions",
        )
    )


def start_mentions_sink(
    mentions: DataFrame,
    out_path: str,
    checkpoint_path: str,
):
    """Checkpointed append sink: the streaming analog of write_stage —
    resumable exactly-once file output."""
    return (
        mentions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
