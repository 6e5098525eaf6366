"""Bucketed fact-table materialization — shuffle elimination at rest.

At 100 TB the dominant shuffles are the corpus-keyed exchanges: every
``groupBy(url)`` (the doc_terms build), every url equi-join (mention ↔
document-metadata J6, the incremental anti-join of new crawl urls in
``jobs/kg_update.py``, retraction masks in ``plans/kg_absorb.py``), and
the J2-style mentions self-join all re-hash a corpus-sized relation
across the cluster.  Spark bucketing pays that hash exchange ONCE, at
write time: the table is stored pre-clustered by
``Murmur3(key) pmod buckets`` (and sorted within each bucket), every
later scan reports ``HashPartitioning(key, buckets)``, and Catalyst
drops the Exchange from any join or aggregate keyed on the bucket
column — verified by the plan pins in tests/test_bucketed.py.

Reference tie-in: the reference's only physical device is precomputed
key-organized storage probed by key (the shelve KV stores,
app.py:85-91; SURVEY.md §4 "KV point lookups instead of scans").
Bucketing is that device translated to Spark: organize the bytes by key
once so reads never re-shuffle.

Write-side shape: a naive bucketed write emits up to
``tasks × buckets`` files (every task opens a writer per bucket it
sees).  Pre-repartitioning by the bucket key with
``numPartitions == buckets`` uses the SAME hash function as bucket
assignment (both are ``Pmod(Murmur3Hash(key), n)``), so each task holds
exactly one bucket → exactly one file per bucket, and the within-bucket
``sortBy`` order is preserved per file (a requirement for Spark to
trust the sort metadata and elide downstream Sorts).

Catalog note: the bucket spec lives in the table catalog, so writes go
through ``saveAsTable`` as path-based external tables.  The sandbox's
in-memory catalog is session-scoped; a production deployment persists
the spec in a Hive metastore, or uses Iceberg's ``bucket(N, url)``
partition transform where the same exchange elimination is
storage-partitioned join (SPARK-37375).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def bucketed_path(name: str) -> str:
    """Default external-table location for a bucketed materialization."""
    return os.path.join(tempfile.gettempdir(), "otts_bucketed", name)


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "url",
    buckets: int = 32,
    path: str | None = None,
) -> DataFrame:
    """Materialize ``df`` as a bucketed, bucket-sorted external parquet
    table and return the catalog-backed scan of it.

    ``buckets`` is the rest-state parallelism contract: pick it once per
    fact table at roughly (table bytes / target partition size) — e.g.
    a 100 TB mentions table at 256 MB partitions wants ~400k buckets —
    and share it across every table joined on the same key so joins are
    co-located.  Idempotent: re-running replaces the table in place.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path or bucketed_path(name))
        .saveAsTable(name)
    )
    return spark.table(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog scan of a bucketed table.  The bucket spec rides along
    from the catalog — ``spark.read.parquet(path)`` on the same files
    would NOT know the clustering and would re-shuffle downstream."""
    return spark.table(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    key: str = "url",
    buckets: int = 32,
) -> DataFrame:
    """Re-attach a bucketed table written by ``write_bucketed`` in a
    PREVIOUS session.

    The sandbox's in-memory catalog forgets tables at session end, but
    the bucket layout is durable — it lives in the file names (the
    ``_0000N`` suffix is the bucket id).  ``CREATE TABLE … CLUSTERED
    BY`` DDL over the existing location restores the spec, and every
    url-keyed join/aggregate is exchange-free again (pinned by
    tests/test_bucketed.py::test_reregistered_table_keeps_clustering).
    This is what lets a maintenance job (kg_update anti-joins,
    retractions, dict-delta re-tags) reuse the clustering a build job
    paid for.  ``schema_ddl``/``key``/``buckets`` must match the write
    — Spark trusts the DDL and will mis-bucket reads if they disagree,
    so callers should persist them alongside the data (the stage
    manifest is the natural place).

    On a production deployment the metastore (HMS/Unity/Iceberg) makes
    this re-attach unnecessary; the helper exists so path-based stage
    roots get the same physics.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(name)


# Filter-only scans (point lookups) keep bucket PRUNING — read 1 bucket
# of N for an equality predicate on the bucket key, the reference's
# shelve point-lookup (app.py:391-399) at rest — only while the bucketed
# scan itself is enabled; Spark's auto-bucketed-scan heuristic turns the
# scan off for plans with no bucketing-benefiting join/agg, trading
# pruning for finer split granularity.  Flip this conf off around pure
# point-lookup workloads.
AUTO_BUCKETED_SCAN = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
