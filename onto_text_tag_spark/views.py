"""SQL query surface over built KG / dedup roots.

The reference serves its built index through Flask query endpoints —
``/visualise_associations`` + ``/chordout`` probe the shelve term index
(app.py:329-358), ``/pubmed`` re-reads stored abstracts (app.py:373).
The Spark-native twin is a set of registered temp views over a root's
LIVE merge-on-read state, so any consumer interrogates the graph with
plain ``spark.sql``: dictionary-update overlays and retraction
delete-sets are applied exactly as the live readers apply them, and —
because temp views are lazy logical plans — nothing is materialized
until a query actually runs, at which point Catalyst pushes the
query's own filters/projections down through the view into the parquet
scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onto_text_tag_spark.sinks import (
    _stage_paths,
    read_stage,
    stage_is_table_backed,
)


def _stage_exists(root: str, stage: str) -> bool:
    """A committed stage has a success marker plus EITHER a local
    data/ dir or a table-backed manifest (Iceberg catalog routing) —
    checking only the data dir would silently skip registering views
    over table-backed stages."""
    data_path, _m, success = _stage_paths(root, stage)
    if not os.path.exists(success):
        return False
    return os.path.exists(data_path) or stage_is_table_backed(root, stage)


def register_kg_views(
    spark: SparkSession, kg_root: str, prefix: str = "kg_"
) -> dict[str, str]:
    """Register temp views over ``kg_root``'s live state and return
    ``{logical name: view name}`` for what was registered.

    Always registered (every root has these stages from ``kg_build`` or
    ``init_kg_root``): ``mentions``, ``doc_terms``, ``triples`` — the
    live merge-on-read views — plus ``edges``, the co-occurrence
    projection of the live triples as ``(src, dst, weight)``.
    Registered when the stage exists: ``isa_closure``, ``nodes``
    (absorb-bootstrapped roots gain ``nodes`` after the first
    ``refresh_nodes``; re-run this function to pick it up), and the
    link-graph pair ``links`` / ``host_graph`` (written by
    ``kg_build --links`` or ``absorb_links``), and ``trends``
    (``kg_build --trends``).

    Views are session-scoped and cheap to (re-)register; call again
    after maintenance commits to rebind to the current snapshots.
    """
    from onto_text_tag_spark.plans.kg_absorb import (
        read_live_doc_terms,
        read_live_mentions,
        read_live_triples,
    )

    registered: dict[str, DataFrame] = {
        "mentions": read_live_mentions(spark, kg_root),
        "doc_terms": read_live_doc_terms(spark, kg_root),
        "triples": read_live_triples(spark, kg_root),
    }
    registered["edges"] = (
        registered["triples"]
        .where(F.col("pred") == "co_occurs_with")
        .select(
            F.col("subj").alias("src"),
            F.col("obj").alias("dst"),
            "weight",
        )
    )
    for stage in ("isa_closure", "nodes", "links", "host_graph",
                  "trends"):
        if _stage_exists(kg_root, stage):
            registered[stage] = read_stage(spark, kg_root, stage)

    out: dict[str, str] = {}
    for name, df in registered.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        out[name] = view
    return out


def register_dedup_views(
    spark: SparkSession, dedup_root: str, prefix: str = "dedup_"
) -> dict[str, str]:
    """Register temp views over a dedup root: ``deduped`` (the live
    survivor corpus, demotion delete-set applied) and — when present —
    ``clusters`` (doc → duplicate-component id)."""
    from onto_text_tag_spark.plans.dedup_absorb import read_deduped

    registered: dict[str, DataFrame] = {
        "deduped": read_deduped(spark, dedup_root)
    }
    if _stage_exists(dedup_root, "clusters"):
        registered["clusters"] = read_stage(spark, dedup_root, "clusters")

    out: dict[str, str] = {}
    for name, df in registered.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        out[name] = view
    return out


def register_ivf_views(
    spark: SparkSession, ivf_root: str, prefix: str = "ivf_"
) -> dict[str, str]:
    """Register temp views over an incrementally maintained IVF index
    root (plans/ivf_absorb.py): ``centroids``, ``cells`` (the stored
    vector→cell assignment) and ``cell_stats`` (additive occupancy +
    assignment-score sums, the index-health source)."""
    registered: dict[str, DataFrame] = {}
    for stage, name in (("ivf_centroids", "centroids"),
                        ("ivf_cells", "cells"),
                        ("ivf_cell_stats", "cell_stats")):
        if _stage_exists(ivf_root, stage):
            registered[name] = read_stage(spark, ivf_root, stage)

    out: dict[str, str] = {}
    for name, df in registered.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        out[name] = view
    return out


def register_pq_views(
    spark: SparkSession, pq_root: str, prefix: str = "pq_"
) -> dict[str, str]:
    """Register temp views over an incrementally maintained PQ code
    store root (plans/pq_absorb.py): ``codebooks``, ``codes`` (the
    stored compressed vectors + reconstruction error) and
    ``err_stats`` (per-batch additive error sums, the
    codebook-staleness trend source)."""
    registered: dict[str, DataFrame] = {}
    for stage, name in (("pq_codebooks", "codebooks"),
                        ("pq_codes", "codes"),
                        ("pq_err_stats", "err_stats")):
        if _stage_exists(pq_root, stage):
            registered[name] = read_stage(spark, pq_root, stage)

    out: dict[str, str] = {}
    for name, df in registered.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        out[name] = view
    return out
