"""spark-submit entry point: graph analytics over a BUILT KG root.

The build job (jobs/kg_build.py) materializes the graph; this job runs
the structural-analytics pass over the stored ``triples`` stage's
co-occurrence branch — degree profile, PageRank centrality,
label-propagation communities, triangle counts, Adamic–Adar link
predictions — and writes each as its own resumable stage snapshot under
the same root.  The corpus is never touched: every input here is the
edge relation (ontology-pair-sized, ≪ corpus), which is what makes a
nightly analytics refresh cheap even when the KG was built from 10^12
documents.

Resumability follows the build job's contract: each analytics stage is
fingerprinted on the triples stage's input fingerprint plus the
parameters that shape the result, so re-submitting is a no-op until
either the KG or the requested parameters change.

Usage:
    spark-submit --py-files pkg.zip jobs/kg_analytics.py \
        --root /path/to/kg_root [--pagerank-iters 10] [--lpa-rounds 4] \
        [--aa-cap 64] [--skip triangles,link_predictions]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time

STAGES = ("degree", "pagerank", "communities", "triangles",
          "link_predictions")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="KG root written by jobs/kg_build.py")
    ap.add_argument("--pagerank-iters", type=int, default=10)
    ap.add_argument("--lpa-rounds", type=int, default=4)
    ap.add_argument("--aa-cap", type=int, default=64,
                    help="Adamic-Adar hub-bridge degree cap (the Σdeg² "
                    "wedge defuse; 0 disables capping)")
    ap.add_argument("--weighted", action="store_true",
                    help="PageRank flows and LPA votes proportional to the "
                    "co-occurrence edge weight instead of uniform")
    ap.add_argument("--skip", default="",
                    help=f"comma-separated stages to skip, from {STAGES}")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    unknown = skip - set(STAGES)
    if unknown:
        ap.error(f"--skip names unknown stages: {sorted(unknown)}")

    from pyspark.sql import SparkSession, functions as F

    from onto_text_tag_spark.operators.graph_metrics import (
        adamic_adar,
        degree_stats,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sinks import read_manifest, read_stage, run_stage

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()
    t0 = time.time()

    triples_manifest = read_manifest(args.root, "triples")
    # analytics are a pure function of (KG content, parameters): bind
    # each stage's fingerprint to both so resume is exact
    def fp(*params) -> str:
        key = json.dumps(
            [triples_manifest.get("input_fingerprint", ""),
             triples_manifest.get("total_rows"), *params]
        )
        return hashlib.md5(key.encode()).hexdigest()

    edges = (
        read_stage(spark, args.root, "triples")
        .where(F.col("pred") == "co_occurs_with")
        .select(
            F.col("subj").alias("src"),
            F.col("obj").alias("dst"),
            F.col("weight").cast("long").alias("weight"),
        )
        # edge-relation-sized (pairs of ontology classes): one local
        # checkpoint here feeds every iterative consumer below without
        # re-reading the stage per round
        .localCheckpoint(eager=True)
    )

    stage_sec: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, compute, *params):
        if name in skip:
            return
        t = time.perf_counter()
        df = run_stage(
            spark, args.root, name, compute, input_fingerprint=fp(*params)
        )
        stage_sec[name] = round(time.perf_counter() - t, 2)
        rows[name] = read_manifest(args.root, name)["total_rows"]

    wcol = "weight" if args.weighted else None
    timed("degree", lambda: degree_stats(edges))
    timed(
        "pagerank",
        lambda: pagerank(
            edges, iterations=args.pagerank_iters, weight_col=wcol
        ).select("node", F.round("rank", 8).alias("rank")),
        args.pagerank_iters, wcol,
    )
    timed(
        "communities",
        lambda: label_propagation(
            edges, rounds=args.lpa_rounds, weight_col=wcol
        ),
        args.lpa_rounds, wcol,
    )
    timed("triangles", lambda: triangle_counts(edges))
    cap = args.aa_cap if args.aa_cap > 0 else None
    timed(
        "link_predictions",
        lambda: adamic_adar(edges, max_neighbor_degree=cap).select(
            "u", "w", "common", F.round("score", 8).alias("score")
        ),
        cap,
    )

    print(json.dumps({
        "root": args.root,
        "edges": edges.count(),
        "stage_sec": stage_sec,
        "rows": rows,
        "sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
