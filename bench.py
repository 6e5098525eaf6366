"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` additionally runs the flagship KG job at two parallelism
levels (local[N] and local[4N profile, default 8 vs 32]) on the same
input and reports throughput at both plus scaling efficiency — the
sandbox evidence for the north_rule's N→4N executor criterion
(BASELINE.md).  Results are appended to BENCH/BASELINE.md.

Each query is forced with a full-column hash reduction so Catalyst
cannot prune away the work being measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
# Default parallelism is sized to the sf0.1 workload, not the host:
# measured totals on this box are ~24 s at local[8] vs ~60-75 s at
# local[32] for the identical queries — the 32 hypervisor-oversubscribed
# vCPUs add scheduling overhead and stalls that dwarf the tiny per-task
# work at this scale.  $SPARK_GRAFT_CPUS still overrides.
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", min(8, os.cpu_count() or 8)))

BENCH_QUERIES = [
    "kg_mentions",
    "kg_cooccur",
    "curation_select",
    "web_links",
    "text_profile",
    "corpus_rollup",
    "dedup_exact",
    "dedup_lsh_pairs",
    "dedup_word_jaccard",
    "dedup_simhash",
    "sim_topk",
    "sim_ivf_topk",
    "events_tumbling",
    "events_sessionize",
    "pricing_summary",
    "top_orders",
    "nation_revenue",
    "part_pairs",
]


def _force(df) -> int:
    """Evaluate every column: hash-reduce so nothing is pruned."""
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.select(
        F.count("*").alias("n"),
        # bit_xor never overflows (ANSI mode), unlike sum of 64-bit hashes
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return row["n"]


def _session(cores: int):
    from onto_text_tag_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 8),
    )


def run_bench(cores: int = CPUS) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from onto_text_tag_spark.driver_queries import QUERIES

    spark = _session(cores)
    # Warm-up: spin up JVM stages and Python workers once so the first
    # measured query isn't charged for session startup.
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()
    import pandas as pd  # noqa: F401

    def _noop(it):
        yield from it

    spark.range(10_000).toDF("id").mapInPandas(
        _noop, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_total = time.perf_counter()
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        rows[name] = _force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_total, 3)
    spark.stop()
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": SF_DIR,
        "cores": cores,
    }


SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"))
SCALING_DIR = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/spark_graft_scaling")
# Best-of-N per parallelism level: this sandbox is a microVM whose vCPUs
# intermittently stall for seconds at a time (observed: tasks with ~9 s
# wall, ~70 ms CPU, zero input; jcmd attach timing out mid-run).  A
# single measurement can absorb a multi-second host freeze; the minimum
# over repeats measures the engine, not the hypervisor.
SCALING_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))


def _spark_submit(master: str, script: str, *script_args: str) -> str:
    """Run a jobs/ script via spark-submit --py-files (the north_rule's
    deployment form) and return its stdout."""
    import shutil
    import subprocess
    import zipfile

    repo = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(SCALING_DIR, exist_ok=True)
    pkg = os.path.join(SCALING_DIR, "pkg.zip")
    # always rebuild — a stale zip silently benches old code
    with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "onto_text_tag_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, repo))
    cmd = [
        shutil.which("spark-submit") or "spark-submit",
        "--master", master,
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "24g"),
        "--py-files", pkg,
        "--conf", "spark.sql.shuffle.partitions=64",
        os.path.join(repo, script), *script_args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=repo)
    return out.stdout


def _host_capacity(max_procs: int = 32) -> dict:
    """Measure what the host ACTUALLY delivers per added CPU with a pure
    multiprocessing busy-loop (no Spark, no JVM).  This sandbox's 32
    vCPUs are hypervisor-oversubscribed: measured throughput tops out at
    ~12.5x single-core, so no engine can show 0.8 efficiency from 8→32
    threads here.  The scaling criterion is therefore evidenced on a
    core range the host scales honestly (2 → 8), with this measurement
    recorded alongside as the ceiling justification."""
    import multiprocessing as mp
    import time as _t

    out = {}
    for procs in (1, 2, 4, 8, 16, max_procs):
        t0 = _t.perf_counter()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [2_000_000] * 64)
        out[procs] = round(64 / (_t.perf_counter() - t0), 1)
    return out


def _burn(n: int) -> int:  # module-level: Pool.map pickles by reference
    s = 0
    for i in range(n):
        s += i * i
    return s


def run_scaling(low: int = 2, high: int = 8, from_html: bool = False) -> dict:
    """The full KG build job (extract → tag → triples → co-occur → closure
    → snapshot writes), submitted via ``spark-submit --py-files`` at two
    parallelism levels over the SAME pre-generated parquet corpus;
    efficiency = (T_low / T_high) / (high / low).  Sandbox evidence for
    the north_rule's N → 4N executor criterion.

    ``from_html=True`` measures the production raw-HTML path: the job
    ignores the corpus's materialized text column and runs P1 extraction
    fused into the tagging batch (kg_build --from-html); output triples
    are identical by the extractor's byte-identity contract."""
    import shutil

    corpus = os.path.join(SCALING_DIR, f"corpus_{SCALING_DOCS}.parquet")
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(SCALING_DOCS), "--output", corpus,
            "--partitions", str(high * 4),
        )

    # Interleave the two levels (low, high, low, high, ...) instead of
    # running all repeats of one level as a block: this host's capacity
    # drifts minute-to-minute, and a block design lets that drift bias
    # the low/high ratio directly.  Interleaved repeats sample the same
    # host windows at both levels; min-per-level then drops stall-hit
    # runs symmetrically.
    best: dict[int, dict] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):
            out_dir = os.path.join(SCALING_DIR, f"out_c{cores}")
            shutil.rmtree(out_dir, ignore_errors=True)
            stdout = _spark_submit(
                f"local[{cores}]", "jobs/kg_build.py",
                "--input", corpus, "--output", out_dir,
                *(["--from-html"] if from_html else []),
            )
            job = json.loads(
                [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
            )
            if cores not in best or job["sec"] < best[cores]["sec"]:
                best[cores] = job
    results = {}
    for cores in (low, high):
        b = best[cores]
        results[cores] = {
            "sec": b["sec"],
            "mentions": b["n_mentions"],
            "triples": b["n_triples"],
            "triples_per_sec": b["triples_per_sec"],
            "stage_sec": b.get("stage_sec"),
            "repeats": SCALING_REPEATS,
        }
    speedup = results[low]["sec"] / results[high]["sec"]
    efficiency = round(speedup / (high / low), 3)
    return {
        "job": "jobs/kg_build.py via spark-submit --py-files"
        + (" --from-html (raw-HTML production path)" if from_html else ""),
        "corpus_docs": SCALING_DOCS,
        "low_cores": low,
        "high_cores": high,
        "results": {str(k): v for k, v in results.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": efficiency,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_scaling_weak() -> dict:
    """Weak-scaling (Gustafson) evidence: grow the DATA with the cores —
    (250k docs, 1 core), (500k, 2), (1M, 4) — and check wall-clock stays
    flat.  Strong scaling (run_scaling) shows a fixed input splits across
    cores; THIS shows per-core throughput holds as the corpus grows,
    which is the axis that matters for "same job, 100x the crawl":
    weak efficiency at point i = T(point 0) / T(point i), ideal 1.0.

    Repeats are interleaved across points (p0, p1, p2, p0, p1, p2) so
    minute-scale host drift cannot bias later points; min per point."""
    import shutil

    points = [(250_000, 1), (500_000, 2), (1_000_000, 4)]
    for docs, _cores in points:
        corpus = os.path.join(SCALING_DIR, f"corpus_{docs}.parquet")
        if not os.path.exists(corpus):
            _spark_submit(
                "local[8]", "jobs/gen_corpus.py",
                "--n-docs", str(docs), "--output", corpus,
                "--partitions", "32",
            )
    best: dict[int, dict] = {}
    for _rep in range(max(2, SCALING_REPEATS - 1)):
        for docs, cores in points:
            corpus = os.path.join(SCALING_DIR, f"corpus_{docs}.parquet")
            out_dir = os.path.join(SCALING_DIR, f"weak_out_c{cores}")
            shutil.rmtree(out_dir, ignore_errors=True)
            stdout = _spark_submit(
                f"local[{cores}]", "jobs/kg_build.py",
                "--input", corpus, "--output", out_dir,
            )
            job = json.loads(
                [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
            )
            if docs not in best or job["sec"] < best[docs]["sec"]:
                best[docs] = job
    base_sec = best[points[0][0]]["sec"]
    results = {}
    for docs, cores in points:
        b = best[docs]
        results[str(docs)] = {
            "cores": cores,
            "sec": b["sec"],
            "mentions": b["n_mentions"],
            "triples": b["n_triples"],
            "triples_per_sec": b["triples_per_sec"],
            "docs_per_sec_per_core": round(docs / b["sec"] / cores, 1),
            "weak_efficiency": round(base_sec / b["sec"], 3),
            "stage_sec": b.get("stage_sec"),
        }
    return {
        "job": "jobs/kg_build.py via spark-submit --py-files, "
        "data grown with cores (weak scaling)",
        "points": results,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


DEDUP_SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP_DOCS", "500000"))
DEDUP_DUP_FRAC = os.environ.get("SPARK_GRAFT_DEDUP_FRAC", "0.1")


def run_scaling_dedup(low: int = 2, high: int = 8) -> dict:
    """The corpus near-dup job (exact → MinHash signatures → banded LSH
    → estimate-prefiltered Jaccard verify → components → anti-join),
    submitted via ``spark-submit --py-files`` at two parallelism levels
    over the SAME dup-planted corpus (gen_corpus --dup-frac).

    ``SPARK_GRAFT_DEDUP_SHINGLE_MODE=word`` switches the shingle
    kernel; planted-dup recall is computed from the generator's
    pure-function dup membership (corpus._is_planted_dup)."""
    import shutil

    shingle_mode = os.environ.get("SPARK_GRAFT_DEDUP_SHINGLE_MODE", "")
    corpus = os.path.join(
        SCALING_DIR,
        f"corpus_{DEDUP_SCALING_DOCS}_dup{DEDUP_DUP_FRAC}.parquet",
    )
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(DEDUP_SCALING_DOCS), "--output", corpus,
            "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(high * 4),
        )

    from onto_text_tag_spark.corpus import _is_planted_dup

    n_planted = sum(
        1 for i in range(DEDUP_SCALING_DOCS)
        if _is_planted_dup(i, 42, float(DEDUP_DUP_FRAC))
    )

    best: dict[int, dict] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved: see run_scaling
            out_dir = os.path.join(SCALING_DIR, f"dedup_out_c{cores}")
            shutil.rmtree(out_dir, ignore_errors=True)
            stdout = _spark_submit(
                f"local[{cores}]", "jobs/dedup_corpus.py",
                "--input", corpus, "--output", out_dir,
                *(["--shingle-mode", shingle_mode] if shingle_mode
                  else []),
            )
            job = json.loads(
                [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
            )
            if cores not in best or job["sec"] < best[cores]["sec"]:
                best[cores] = job
    results = {
        str(cores): {
            "sec": b["sec"],
            "docs_in": b["n_docs_in"],
            "docs_out": b["n_docs_out"],
            "candidates": b["n_candidates"],
            "verified": b["n_verified"],
            "docs_per_sec": b["docs_per_sec"],
            "stage_sec": b.get("stage_sec"),
            "repeats": SCALING_REPEATS,
        }
        for cores, b in best.items()
    }
    speedup = results[str(low)]["sec"] / results[str(high)]["sec"]
    any_res = results[str(high)]
    dropped = any_res["docs_in"] - any_res["docs_out"]
    return {
        "job": "jobs/dedup_corpus.py via spark-submit --py-files",
        "corpus_docs": DEDUP_SCALING_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "shingle_mode": shingle_mode or "char (job default)",
        "low_cores": low,
        "high_cores": high,
        "results": results,
        "planted_dups": n_planted,
        "dropped_docs": dropped,
        # planted membership is a pure function of (seed, id); a planted
        # near-dup can legitimately fall below the Jaccard threshold, so
        # this is the end-to-end detection rate, not a tautology
        "planted_dup_recall": round(dropped / n_planted, 4)
        if n_planted else None,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (high / low), 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_substring_bench(low: int = 2, high: int = 8) -> dict:
    """Paragraph-level dedup + repeated-substring span detection
    (operators/dedup.py:paragraph_dedup / duplicate_ngram_spans) at two
    parallelism levels over the SAME dup-planted synthetic crawl — the
    north_rule two-cluster-size evidence for the two newest curation
    operators.

    The extractor's byte-identity contract flattens paragraph breaks,
    so the paragraph stream is derived by sentence-splitting the
    extracted text (deterministic regexp, same relation at every
    level); the span op runs on the raw text with w=20 tokens —
    boilerplate sentences shared across the template corpus give both
    operators real duplication to find.  Interleaved repeats,
    min-of-N per level (see run_scaling for why)."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.dedup import (
        duplicate_ngram_spans,
        paragraph_dedup,
    )

    corpus = os.path.join(
        SCALING_DIR,
        f"corpus_{DEDUP_SCALING_DOCS}_dup{DEDUP_DUP_FRAC}.parquet",
    )
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(DEDUP_SCALING_DOCS), "--output", corpus,
            "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(high * 4),
        )

    span_w = int(os.environ.get("SPARK_GRAFT_SPAN_W", "20"))
    best: dict[int, dict] = {}
    content: dict = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved: see run_scaling
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            pages = spark.read.parquet(corpus).select("url", "text")
            lines = pages.select(
                "url",
                F.regexp_replace("text", "\\.\\s+", ".\n").alias("text"),
            )
            t0 = time.perf_counter()
            n_para = _force(paragraph_dedup(lines, id_col="url"))
            para_sec = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_span = _force(
                duplicate_ngram_spans(pages, w=span_w, id_col="url")
            )
            span_sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            rec = {
                "para_sec": para_sec,
                "span_sec": span_sec,
                "para_docs_per_sec": round(
                    DEDUP_SCALING_DOCS / para_sec, 1),
                "span_docs_per_sec": round(
                    DEDUP_SCALING_DOCS / span_sec, 1),
                "rows": {"paragraph_dedup": n_para,
                         "ngram_spans": n_span},
            }
            if cores not in best or (
                rec["para_sec"] + rec["span_sec"]
                < best[cores]["para_sec"] + best[cores]["span_sec"]
            ):
                best[cores] = rec
    # content stats once, OUTSIDE the timed loop (they re-run both
    # operators and would otherwise double the first measured level)
    spark = _session(high)
    pages = spark.read.parquet(corpus).select("url", "text")
    lines = pages.select(
        "url",
        F.regexp_replace("text", "\\.\\s+", ".\n").alias("text"),
    )
    para_stats = paragraph_dedup(lines, id_col="url").agg(
        F.sum("n_paragraphs").alias("n_paragraphs"),
        F.sum("n_kept").alias("n_kept"),
    ).collect()[0]
    span_stats = duplicate_ngram_spans(
        pages, w=span_w, id_col="url"
    ).agg(
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("dup_tokens").alias("dup_tokens"),
    ).collect()[0]
    content = {
        "n_paragraphs": para_stats["n_paragraphs"],
        "paragraphs_kept": para_stats["n_kept"],
        "paragraph_drop_frac": round(
            1 - para_stats["n_kept"] / para_stats["n_paragraphs"], 4),
        "n_tokens": span_stats["n_tokens"],
        "dup_tokens": span_stats["dup_tokens"],
        "dup_token_frac": round(
            span_stats["dup_tokens"] / span_stats["n_tokens"], 4),
    }
    spark.stop()
    para_speedup = best[low]["para_sec"] / best[high]["para_sec"]
    span_speedup = best[low]["span_sec"] / best[high]["span_sec"]
    return {
        "job": "paragraph_dedup + duplicate_ngram_spans (in-process)",
        "corpus_docs": DEDUP_SCALING_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "span_w": span_w,
        "low_cores": low,
        "high_cores": high,
        "results": {str(c): b for c, b in best.items()},
        "content": content,
        "para_speedup": round(para_speedup, 3),
        "para_scaling_efficiency": round(para_speedup / (high / low), 3),
        "span_speedup": round(span_speedup, 3),
        "span_scaling_efficiency": round(span_speedup / (high / low), 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_scaling_pipeline(low: int = 1, high: int = 4) -> dict:
    """The CHAINED production pipeline — dedup the raw dup-planted
    corpus (jobs/dedup_corpus.py), then build the KG over the deduped
    output (jobs/kg_build.py reading ``<dedup_out>/deduped/data``) —
    submitted via ``spark-submit --py-files`` at two parallelism levels.
    This is the realistic end-to-end composition (raw web pages →
    near-dup removal → triples) and its scaling number covers both
    jobs' stages plus the hand-off through the snapshot sink."""
    import shutil

    corpus = os.path.join(
        SCALING_DIR,
        f"corpus_{DEDUP_SCALING_DOCS}_dup{DEDUP_DUP_FRAC}.parquet",
    )
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(DEDUP_SCALING_DOCS), "--output", corpus,
            "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(high * 4),
        )

    best: dict[int, dict] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved: see run_scaling
            dedup_out = os.path.join(SCALING_DIR, f"pipe_dedup_c{cores}")
            kg_out = os.path.join(SCALING_DIR, f"pipe_kg_c{cores}")
            shutil.rmtree(dedup_out, ignore_errors=True)
            shutil.rmtree(kg_out, ignore_errors=True)
            d_out = _spark_submit(
                f"local[{cores}]", "jobs/dedup_corpus.py",
                "--input", corpus, "--output", dedup_out,
            )
            dedup = json.loads(
                [ln for ln in d_out.splitlines() if ln.startswith("{")][-1]
            )
            k_out = _spark_submit(
                f"local[{cores}]", "jobs/kg_build.py",
                "--input", os.path.join(dedup_out, "deduped", "data"),
                "--output", kg_out,
            )
            kg = json.loads(
                [ln for ln in k_out.splitlines() if ln.startswith("{")][-1]
            )
            total = round(dedup["sec"] + kg["sec"], 2)
            job = {
                "sec": total,
                "dedup_sec": dedup["sec"],
                "kg_sec": kg["sec"],
                "docs_in": dedup["n_docs_in"],
                "docs_out": dedup["n_docs_out"],
                "mentions": kg["n_mentions"],
                "triples": kg["n_triples"],
                "triples_per_sec": round(kg["n_triples"] / total, 1),
                "dedup_stage_sec": dedup.get("stage_sec"),
                "kg_stage_sec": kg.get("stage_sec"),
            }
            if cores not in best or job["sec"] < best[cores]["sec"]:
                best[cores] = job
    speedup = best[low]["sec"] / best[high]["sec"]
    return {
        "job": "jobs/dedup_corpus.py → jobs/kg_build.py (chained) via "
               "spark-submit --py-files",
        "corpus_docs": DEDUP_SCALING_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "low_cores": low,
        "high_cores": high,
        "results": {str(k): v for k, v in best.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (high / low), 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


UPDATE_DELTA_DOCS = int(os.environ.get("SPARK_GRAFT_UPDATE_DELTA_DOCS",
                                       "50000"))


def run_scaling_update(low: int = 1, high: int = 4) -> dict:
    """Incremental crawl-batch absorb (jobs/kg_update.py) at two
    parallelism levels: the scaling number for the delta job itself,
    plus the absorb-cost ratio vs a full kg_build rebuild over the
    union corpus at the same cores — the claim that a 10% crawl delta
    costs ~10% of a rebuild, not 100%.  Corpus rows are pure functions
    of (seed, id), so base ∪ delta (disjoint id ranges) equals the
    union corpus byte-for-byte; the run asserts the incremental root's
    triple total equals the rebuild's."""
    import shutil

    def _gen(path: str, n: int, id_start: int = 0) -> None:
        if os.path.exists(path):
            return
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(n), "--id-start", str(id_start),
            "--output", path, "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(high * 4),
        )

    sfx = f"dup{DEDUP_DUP_FRAC}"
    base = os.path.join(SCALING_DIR,
                        f"corpus_{DEDUP_SCALING_DOCS}_{sfx}.parquet")
    delta = os.path.join(
        SCALING_DIR, f"corpus_delta_{UPDATE_DELTA_DOCS}_{sfx}.parquet")
    union = os.path.join(
        SCALING_DIR,
        f"corpus_union_{DEDUP_SCALING_DOCS + UPDATE_DELTA_DOCS}_{sfx}"
        ".parquet")
    _gen(base, DEDUP_SCALING_DOCS)
    _gen(delta, UPDATE_DELTA_DOCS, id_start=DEDUP_SCALING_DOCS)
    _gen(union, DEDUP_SCALING_DOCS + UPDATE_DELTA_DOCS)

    def _last_json(out: str) -> dict:
        return json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        )

    best: dict[int, dict] = {}
    fixed: dict[int, dict] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved: see run_scaling
            if cores not in fixed:
                base_root = os.path.join(SCALING_DIR, f"upd_base_c{cores}")
                shutil.rmtree(base_root, ignore_errors=True)
                b = _last_json(_spark_submit(
                    f"local[{cores}]", "jobs/kg_build.py",
                    "--input", base, "--output", base_root))
                full_root = os.path.join(SCALING_DIR, f"upd_full_c{cores}")
                shutil.rmtree(full_root, ignore_errors=True)
                fr = _last_json(_spark_submit(
                    f"local[{cores}]", "jobs/kg_build.py",
                    "--input", union, "--output", full_root))
                shutil.rmtree(full_root, ignore_errors=True)
                fixed[cores] = {
                    "base_root": base_root,
                    "base_build_sec": b["sec"],
                    "rebuild_sec": fr["sec"],
                    "rebuild_triples": fr["n_triples"],
                }
            fx = fixed[cores]
            work = os.path.join(SCALING_DIR, f"upd_work_c{cores}")
            shutil.rmtree(work, ignore_errors=True)
            shutil.copytree(fx["base_root"], work)
            upd = _last_json(_spark_submit(
                f"local[{cores}]", "jobs/kg_update.py",
                "--kg", work, "--input", delta))
            shutil.rmtree(work, ignore_errors=True)
            assert upd["n_triples_total"] == fx["rebuild_triples"], (
                f"incremental absorb diverged from full rebuild: "
                f"{upd['n_triples_total']} != {fx['rebuild_triples']}")
            job = {
                "sec": upd["sec"],
                "stage_sec": upd.get("stage_sec"),
                "new_docs": upd["n_new_docs"],
                "docs_per_sec": round(upd["n_new_docs"] / upd["sec"], 1),
                "triples_total": upd["n_triples_total"],
                "base_build_sec": fx["base_build_sec"],
                "rebuild_sec": fx["rebuild_sec"],
                "absorb_ratio": round(upd["sec"] / fx["rebuild_sec"], 3),
            }
            if cores not in best or job["sec"] < best[cores]["sec"]:
                best[cores] = job
    speedup = best[low]["sec"] / best[high]["sec"]
    return {
        "job": "jobs/kg_update.py (incremental crawl-batch absorb) via "
               "spark-submit --py-files",
        "base_docs": DEDUP_SCALING_DOCS,
        "delta_docs": UPDATE_DELTA_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "low_cores": low,
        "high_cores": high,
        "results": {str(k): v for k, v in best.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (high / low), 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def _dedup_live_sig(root: str) -> tuple[int, int]:
    """(count, xor-hash) of a dedup root's LIVE id set — the ``deduped``
    stage minus the merge-on-read ``demoted`` delete set — computed with
    DuckDB straight off the stage parquet: the bench's equality assert
    is independent of the engine under test."""
    import duckdb

    con = duckdb.connect()
    ded = os.path.join(root, "deduped", "data", "**", "*.parquet")
    q = f"SELECT url FROM read_parquet('{ded}')"
    dem_dir = os.path.join(root, "demoted", "data")
    has_dem = os.path.isdir(dem_dir) and any(
        f.endswith(".parquet")
        for _d, _s, fs in os.walk(dem_dir) for f in fs
    )
    if has_dem:
        dem = os.path.join(dem_dir, "**", "*.parquet")
        q += f" WHERE url NOT IN (SELECT url FROM read_parquet('{dem}'))"
    row = con.execute(
        f"SELECT count(*), coalesce(bit_xor(hash(url)), 0) FROM ({q})"
    ).fetchone()
    return int(row[0]), int(row[1])


def run_scaling_dedup_update(low: int = 1, high: int = 4) -> dict:
    """Incremental corpus-dedup absorb (jobs/dedup_update.py) at two
    parallelism levels: the delta job's own scaling number plus the
    absorb-cost ratio vs a full dedup_corpus rebuild over the union at
    the same cores.  The incremental root's LIVE id set (deduped ∖
    demoted) is asserted hash-identical to the rebuild's output —
    DuckDB reads the stage parquet directly, so the check is
    engine-independent."""
    import shutil

    def _gen(path: str, n: int, id_start: int = 0) -> None:
        if os.path.exists(path):
            return
        _spark_submit(
            f"local[{high}]", "jobs/gen_corpus.py",
            "--n-docs", str(n), "--id-start", str(id_start),
            "--output", path, "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(high * 4),
        )

    sfx = f"dup{DEDUP_DUP_FRAC}"
    base = os.path.join(SCALING_DIR,
                        f"corpus_{DEDUP_SCALING_DOCS}_{sfx}.parquet")
    delta = os.path.join(
        SCALING_DIR, f"corpus_delta_{UPDATE_DELTA_DOCS}_{sfx}.parquet")
    union = os.path.join(
        SCALING_DIR,
        f"corpus_union_{DEDUP_SCALING_DOCS + UPDATE_DELTA_DOCS}_{sfx}"
        ".parquet")
    _gen(base, DEDUP_SCALING_DOCS)
    _gen(delta, UPDATE_DELTA_DOCS, id_start=DEDUP_SCALING_DOCS)
    _gen(union, DEDUP_SCALING_DOCS + UPDATE_DELTA_DOCS)

    def _last_json(out: str) -> dict:
        return json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        )

    best: dict[int, dict] = {}
    fixed: dict[int, dict] = {}
    for _rep in range(max(2, SCALING_REPEATS - 1)):
        for cores in (low, high):  # interleaved: see run_scaling
            if cores not in fixed:
                base_root = os.path.join(SCALING_DIR, f"dupd_base_c{cores}")
                shutil.rmtree(base_root, ignore_errors=True)
                b = _last_json(_spark_submit(
                    f"local[{cores}]", "jobs/dedup_corpus.py",
                    "--input", base, "--output", base_root))
                full_root = os.path.join(SCALING_DIR, f"dupd_full_c{cores}")
                shutil.rmtree(full_root, ignore_errors=True)
                fr = _last_json(_spark_submit(
                    f"local[{cores}]", "jobs/dedup_corpus.py",
                    "--input", union, "--output", full_root))
                full_sig = _dedup_live_sig(full_root)
                shutil.rmtree(full_root, ignore_errors=True)
                fixed[cores] = {
                    "base_root": base_root,
                    "base_dedup_sec": b["sec"],
                    "rebuild_sec": fr["sec"],
                    "rebuild_docs_out": fr["n_docs_out"],
                    "rebuild_sig": full_sig,
                }
            fx = fixed[cores]
            work = os.path.join(SCALING_DIR, f"dupd_work_c{cores}")
            shutil.rmtree(work, ignore_errors=True)
            shutil.copytree(fx["base_root"], work)
            upd = _last_json(_spark_submit(
                f"local[{cores}]", "jobs/dedup_update.py",
                "--dedup", work, "--base-input", base, "--input", delta))
            live_sig = _dedup_live_sig(work)
            shutil.rmtree(work, ignore_errors=True)
            assert live_sig == fx["rebuild_sig"], (
                f"incremental dedup diverged from full rebuild: "
                f"{live_sig} != {fx['rebuild_sig']}")
            job = {
                "sec": upd["sec"],
                "stage_sec": upd.get("stage_sec"),
                "new_docs": upd["n_batch_docs"],
                "docs_per_sec": round(upd["n_batch_docs"] / upd["sec"], 1),
                "survivors": upd["n_batch_survivors"],
                "demoted_base": upd["n_demoted_base"],
                "docs_live": upd["n_docs_live"],
                "base_dedup_sec": fx["base_dedup_sec"],
                "rebuild_sec": fx["rebuild_sec"],
                "absorb_ratio": round(upd["sec"] / fx["rebuild_sec"], 3),
            }
            if cores not in best or job["sec"] < best[cores]["sec"]:
                best[cores] = job
    for cores in best:
        shutil.rmtree(
            os.path.join(SCALING_DIR, f"dupd_base_c{cores}"),
            ignore_errors=True)
    speedup = best[low]["sec"] / best[high]["sec"]
    return {
        "job": "jobs/dedup_update.py (incremental corpus-dedup absorb) "
               "via spark-submit --py-files",
        "base_docs": DEDUP_SCALING_DOCS,
        "delta_docs": UPDATE_DELTA_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "low_cores": low,
        "high_cores": high,
        "results": {str(k): v for k, v in best.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (high / low), 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_store_shingles_bench(cores: int = 4) -> dict:
    """--store-shingles cost/benefit at production shape: build the
    SAME base corpus root twice — text-verify layout vs stored-shingle
    layout — then absorb the same delta into each, the stored-shingle
    root with NO --base-input at all.  Reports base-build cost, the
    fingerprint-store size delta (the ~4 KB/doc the sh column buys),
    and per-stage absorb cost; the two roots' live id sets are asserted
    hash-identical (DuckDB over the stage parquet).

    The claim under test: storing the hashed-shingle arrays moves
    near-dup VERIFICATION off the corpus entirely, so the absorb's
    verify stage stops scaling with base-corpus text size — at 100 TB
    the base-input semi-join scan is the dominant absorb cost, and the
    store (a few % of corpus bytes) replaces it with a dup-sized read."""
    import shutil

    def _gen(path: str, n: int, id_start: int = 0) -> None:
        if os.path.exists(path):
            return
        _spark_submit(
            f"local[{cores}]", "jobs/gen_corpus.py",
            "--n-docs", str(n), "--id-start", str(id_start),
            "--output", path, "--dup-frac", DEDUP_DUP_FRAC,
            "--partitions", str(cores * 4),
        )

    def _last_json(out: str) -> dict:
        return json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        )

    def _du(path: str) -> int:
        total = 0
        for d, _s, fs in os.walk(path):
            total += sum(os.path.getsize(os.path.join(d, f)) for f in fs)
        return total

    sfx = f"dup{DEDUP_DUP_FRAC}"
    base = os.path.join(SCALING_DIR,
                        f"corpus_{DEDUP_SCALING_DOCS}_{sfx}.parquet")
    delta = os.path.join(
        SCALING_DIR, f"corpus_delta_{UPDATE_DELTA_DOCS}_{sfx}.parquet")
    _gen(base, DEDUP_SCALING_DOCS)
    _gen(delta, UPDATE_DELTA_DOCS, id_start=DEDUP_SCALING_DOCS)

    results: dict[str, dict] = {}
    live_sigs: dict[str, tuple] = {}
    for variant, flags, upd_args in (
        ("text_verify", [], ["--base-input", base]),
        ("stored_shingles", ["--store-shingles"], []),
    ):
        root = os.path.join(SCALING_DIR, f"shbench_{variant}")
        shutil.rmtree(root, ignore_errors=True)
        b = _last_json(_spark_submit(
            f"local[{cores}]", "jobs/dedup_corpus.py",
            "--input", base, "--output", root, *flags))
        sig_bytes = _du(os.path.join(root, "signatures", "data"))
        best_upd: dict | None = None
        for _rep in range(max(2, SCALING_REPEATS - 1)):
            work = os.path.join(SCALING_DIR, f"shbench_{variant}_work")
            shutil.rmtree(work, ignore_errors=True)
            shutil.copytree(root, work)
            u = _last_json(_spark_submit(
                f"local[{cores}]", "jobs/dedup_update.py",
                "--dedup", work, "--input", delta, *upd_args))
            if best_upd is None or u["sec"] < best_upd["sec"]:
                best_upd = u
                live_sigs[variant] = _dedup_live_sig(work)
            shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        results[variant] = {
            "base_sec": b["sec"],
            "base_stage_sec": b["stage_sec"],
            "sig_store_bytes": sig_bytes,
            "sig_store_mb_per_100k_docs": round(
                sig_bytes / (1 << 20) / (DEDUP_SCALING_DOCS / 100_000), 1),
            "absorb_sec": best_upd["sec"],
            "absorb_stage_sec": best_upd["stage_sec"],
            "survivors": best_upd["n_batch_survivors"],
            "docs_live": best_upd["n_docs_live"],
        }
    assert live_sigs["text_verify"] == live_sigs["stored_shingles"], (
        f"store-shingles absorb diverged from text-verify absorb: "
        f"{live_sigs}")
    corpus_bytes = _du(base)
    return {
        "job": "jobs/dedup_corpus.py --store-shingles vs text-verify "
               "absorb (jobs/dedup_update.py) via spark-submit --py-files",
        "base_docs": DEDUP_SCALING_DOCS,
        "delta_docs": UPDATE_DELTA_DOCS,
        "dup_frac": float(DEDUP_DUP_FRAC),
        "cores": cores,
        "base_corpus_bytes": corpus_bytes,
        "results": results,
        "absorb_speedup": round(
            results["text_verify"]["absorb_sec"]
            / results["stored_shingles"]["absorb_sec"], 3),
        "sig_store_overhead_x": round(
            results["stored_shingles"]["sig_store_bytes"]
            / max(1, results["text_verify"]["sig_store_bytes"]), 2),
        "sig_store_frac_of_corpus": round(
            results["stored_shingles"]["sig_store_bytes"] / corpus_bytes, 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


COMPACT_DOCS = int(os.environ.get("SPARK_GRAFT_COMPACT_DOCS", "120000"))
COMPACT_BATCHES = int(os.environ.get("SPARK_GRAFT_COMPACT_BATCHES", "48"))


def run_warc_bench(cores: int = 8) -> dict:
    """kg_build from raw Common-Crawl-style WARC archives vs the same
    bytes in a parquet container (--from-html): isolates what the
    archive container costs — member-streamed gzip inflate +
    Content-Length record framing, on top of the shared P1-extraction
    + tagging batch.  Both runs must emit identical mention/triple
    counts (extractor byte-identity extends to the archive path)."""
    import shutil

    docs = int(os.environ.get("SPARK_GRAFT_WARC_DOCS", "200000"))
    corpus = os.path.join(SCALING_DIR, f"warc_corpus_{docs}.parquet")
    warc_dir = os.path.join(SCALING_DIR, f"warc_corpus_{docs}.warc")
    if not (os.path.exists(corpus) and os.path.isdir(warc_dir)):
        _spark_submit(
            f"local[{cores}]", "jobs/gen_corpus.py",
            "--n-docs", str(docs), "--output", corpus,
            "--partitions", str(cores * 4), "--warc-output", warc_dir,
        )

    def _du(path):
        total = 0
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    # --lang "" on BOTH: the parquet corpus carries a lang column (WARC
    # records don't), and the default en-filter would shrink only the
    # parquet run's population — compare the container, not the filter.
    modes = {
        "warc": ["--warc", "--input", warc_dir, "--lang", ""],
        "from_html": ["--from-html", "--input", corpus, "--lang", ""],
    }
    best: dict[str, dict] = {}
    for _rep in range(2):  # interleaved, min per mode (host drift)
        for mode, mode_args in modes.items():
            out_dir = os.path.join(SCALING_DIR, f"warc_out_{mode}")
            shutil.rmtree(out_dir, ignore_errors=True)
            stdout = _spark_submit(
                f"local[{cores}]", "jobs/kg_build.py",
                *mode_args, "--output", out_dir,
            )
            job = json.loads(
                [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
            )
            if mode not in best or job["sec"] < best[mode]["sec"]:
                best[mode] = job
    assert best["warc"]["n_mentions"] == best["from_html"]["n_mentions"]
    assert best["warc"]["n_triples"] == best["from_html"]["n_triples"]
    results = {
        mode: {
            "sec": b["sec"],
            "docs_per_sec": round(docs / b["sec"], 1),
            "stage_sec": b.get("stage_sec"),
        }
        for mode, b in best.items()
    }
    return {
        "job": "jobs/kg_build.py --warc (raw crawl archives) vs "
               "--from-html (parquet container), same bytes",
        "docs": docs,
        "cores": cores,
        "mentions": best["warc"]["n_mentions"],
        "triples": best["warc"]["n_triples"],
        "warc_gz_mb": round(_du(warc_dir) / 2**20, 1),
        "parquet_mb": round(_du(corpus) / 2**20, 1),
        "results": results,
        "container_overhead": round(
            results["warc"]["sec"] / results["from_html"]["sec"], 3),
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_crawl_sink_bench(cores: int = 4) -> dict:
    """Continuous crawl-to-graph ingestion: one Structured Streaming
    sink (``start_crawl_sink``) consumes crawl drops and maintains BOTH
    stores — dedup-absorb each page batch, KG-absorb only the epoch's
    dedup survivors, retract base pages the epoch demoted.  Measures
    sustained per-epoch latency as the accumulated fingerprint/KG
    stores grow, the dedup gate's survivor rate, and the retraction
    rate; then ASSERTS the final live KG equals an in-process batch
    build over the live deduped corpus (count + full-column hash on
    both triple predicates) — the exactness claim, verified at bench
    scale, not just test scale."""
    import shutil

    from pyspark.sql import functions as F

    docs = int(os.environ.get("SPARK_GRAFT_CRAWL_DOCS", "200000"))
    epochs = int(os.environ.get("SPARK_GRAFT_CRAWL_EPOCHS", "4"))
    dup = os.environ.get("SPARK_GRAFT_CRAWL_DUP_FRAC", "0.1")
    per = docs // epochs
    slices = []
    for i in range(epochs):
        p = os.path.join(
            SCALING_DIR, f"crawl_slice_{docs}_{dup}_{i}.parquet")
        if not os.path.exists(p):
            _spark_submit(
                f"local[{cores}]", "jobs/gen_corpus.py",
                "--n-docs", str(per), "--id-start", str(i * per),
                "--dup-frac", dup, "--output", p,
                "--partitions", str(cores * 2),
            )
        slices.append(p)

    from onto_text_tag_spark.corpus import mini_ontology
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.operators.cooccur import cooccurrence_edges
    from onto_text_tag_spark.operators.tagger import tag_documents
    from onto_text_tag_spark.plans.dedup_absorb import read_deduped
    from onto_text_tag_spark.plans.kg_absorb import read_live_triples
    from onto_text_tag_spark.plans.kg_pipeline import mention_triples
    from onto_text_tag_spark.sinks import read_manifest, snapshot_log
    from onto_text_tag_spark.streaming.incremental import (
        init_crawl_root,
        start_crawl_sink,
    )

    root = os.path.join(SCALING_DIR, f"crawl_root_{docs}")
    incoming = os.path.join(SCALING_DIR, f"crawl_incoming_{docs}")
    ckpt = os.path.join(SCALING_DIR, f"crawl_ckpt_{docs}")
    for p in (root, incoming, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(incoming)

    spark = _session(cores)
    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    doc_schema = spark.read.parquet(slices[0]).schema
    init_crawl_root(spark, root, onto, doc_schema)
    dedup_root = os.path.join(root, "dedup")
    kg_root = os.path.join(root, "kg")

    stream = spark.readStream.schema(doc_schema).parquet(incoming)
    q = start_crawl_sink(stream, root, dict_rows, ckpt, lang="en")
    epoch_rows = []
    t_all = time.time()
    try:
        for i, sl in enumerate(slices):
            files = sorted(
                f for f in os.listdir(sl) if f.endswith(".parquet"))
            for j, f in enumerate(files):
                shutil.copy(
                    os.path.join(sl, f),
                    os.path.join(incoming, f"ep{i}-{j:04d}.parquet"))
            t0 = time.time()
            q.processAllAvailable()
            epoch_rows.append(
                {"epoch": i, "docs": per,
                 "sec": round(time.time() - t0, 2),
                 "docs_per_sec": round(per / (time.time() - t0), 1)})
    finally:
        q.stop()
    total_sec = round(time.time() - t_all, 2)

    # per-epoch absorb metrics from the stores' own snapshot logs
    ded = [s["metrics"] for s in snapshot_log(dedup_root, "clusters")
           if str(s.get("metrics", {}).get("batch_fingerprint", ""))
           .startswith("crawl-epoch")]
    survivors = sum(m["batch_survivors"] for m in ded)
    demoted = sum(m["batch_demoted_base"] for m in ded)
    retracted = sum(
        s["metrics"].get("retracted_docs", 0)
        for s in snapshot_log(kg_root, "triples")
        if str(s.get("metrics", {}).get("batch_fingerprint", ""))
        .endswith(":retract"))

    # exactness: live KG == batch build over the live deduped corpus
    def _nh(df) -> tuple:
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    t0 = time.time()
    live = read_deduped(spark, dedup_root).where(F.col("lang") == "en")
    m = tag_documents(live, dict_rows)
    want_edges = _nh(cooccurrence_edges(m).select(
        F.col("src").alias("subj"), F.col("dst").alias("obj"),
        F.col("weight").cast("long").alias("weight")))
    want_mentions = _nh(mention_triples(m).select("subj", "obj"))
    got = read_live_triples(spark, kg_root)
    got_edges = _nh(got.where("pred = 'co_occurs_with'")
                    .select("subj", "obj", "weight"))
    got_mentions = _nh(got.where("pred = 'mentions'")
                       .select("subj", "obj"))
    verify_sec = round(time.time() - t0, 2)
    assert got_edges == want_edges, (got_edges, want_edges)
    assert got_mentions == want_mentions, (got_mentions, want_mentions)

    n_live = read_manifest(dedup_root, "deduped")["total_rows"] - \
        read_manifest(dedup_root, "demoted")["total_rows"]
    report = {
        "job": "streaming/incremental.py:start_crawl_sink "
               "(dedup-gated KG construction + exact retraction)",
        "docs": docs,
        "epochs": epochs,
        "dup_frac": float(dup),
        "cores": cores,
        "epoch_rows": epoch_rows,
        "total_sec": total_sec,
        "docs_per_sec": round(docs / total_sec, 1),
        "survivors": survivors,
        "demoted_base": demoted,
        "kg_retracted": retracted,
        "docs_live": n_live,
        "kg_edges": got_edges[0],
        "kg_mention_triples": got_mentions[0],
        "rebuild_equality": "verified (count + xxhash on both predicates)",
        "verify_sec": verify_sec,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }
    for p in (root, incoming, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    return report


def run_dict_update_bench(cores: int = 4) -> dict:
    """Ontology-release maintenance cost: absorb a dictionary delta
    into a built KG (jobs/kg_dict_update.py) vs rebuilding it
    (jobs/kg_build.py --termlist), on the REAL 3.6k-surface reference
    termlist.  The delta is the realistic release shape — new classes
    naming rare corpus strings (sample doc frequency 0.2-2%) — in
    BOTH directions: OLD→NEW exercises the additions path (one corpus
    scan with the delta-sized automaton + re-tag of affected docs),
    NEW→OLD the removals path (NO corpus scan: affected docs are looked
    up in the stored doc_terms arrays).  Equality of the updated root
    with the from-scratch rebuild is asserted via full-column hash."""
    import shutil

    docs = int(os.environ.get("SPARK_GRAFT_DICT_DOCS", "200000"))
    ref_tsv = "/root/reference/static/test_terms.tsv"

    corpus = os.path.join(SCALING_DIR, f"corpus_dictupd_{docs}.parquet")
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{cores}]", "jobs/gen_corpus.py",
            "--n-docs", str(docs), "--output", corpus,
            "--partitions", str(cores * 4),
        )

    # the delta is the realistic release shape: NEW classes naming
    # rare corpus strings that are not yet dictionary surfaces —
    # picked empirically from a 1000-doc sample (tokens with doc
    # frequency 0.2-2% of the sample; deterministic given the corpus).
    # OLD = the real termlist, NEW = OLD + these classes.
    from onto_text_tag_spark.sources.termlist_tsv import read_termlist_rows

    old_rows = read_termlist_rows(ref_tsv)
    surfaces = {r["surface"] for r in old_rows}
    spark = _session(cores)
    from pyspark.sql import functions as F

    sample = spark.read.parquet(corpus).limit(1000)
    tok_df = (
        sample.select(
            "url",
            F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("t"))
        .where(F.length("t") >= 4).distinct()
        .groupBy("t").agg(F.countDistinct("url").alias("df"))
        .collect()
    )
    spark.stop()
    cand = sorted(
        (r["df"], r["t"]) for r in tok_df
        if 2 <= r["df"] <= 20 and r["t"] not in surfaces
    )
    delta_rows, cum = [], 0
    for df_n, t in cand:
        if len(delta_rows) >= 30 or cum + df_n > 100:
            break
        cum += df_n
        delta_rows.append({
            "surface": t, "id": f"NEWC:{len(delta_rows):04d}",
            "name": t, "ont": "NEWC",
        })
    assert delta_rows, "no rare non-surface tokens in the sample"
    full_rows = old_rows + delta_rows
    delta_curies = {r["id"] for r in delta_rows}

    def _write_tsv(path, rows):
        with open(path, "w") as fh:
            for r in rows:
                fh.write("\t".join(
                    ["A", r["ont"], r["id"], r["surface"], r["name"], ""]
                ) + "\n")

    tsv_old = os.path.join(SCALING_DIR, "dictupd_old.tsv")
    tsv_new = os.path.join(SCALING_DIR, "dictupd_new.tsv")
    _write_tsv(tsv_old, old_rows)
    _write_tsv(tsv_new, full_rows)

    def _job(script, *args):
        out = _spark_submit(f"local[{cores}]", f"jobs/{script}", *args)
        return json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1])

    root_old = os.path.join(SCALING_DIR, "dictupd_root_old")
    root_new = os.path.join(SCALING_DIR, "dictupd_root_new")
    for p in (root_old, root_new):
        shutil.rmtree(p, ignore_errors=True)
    build_old = _job("kg_build.py", "--no-warmup", "--input", corpus,
                     "--output", root_old, "--termlist", tsv_old)
    build_new = _job("kg_build.py", "--no-warmup", "--input", corpus,
                     "--output", root_new, "--termlist", tsv_new)

    up = _job("kg_dict_update.py", "--kg", root_old, "--input", corpus,
              "--old-termlist", tsv_old, "--new-termlist", tsv_new)
    down_root = os.path.join(SCALING_DIR, "dictupd_root_down")
    shutil.rmtree(down_root, ignore_errors=True)
    shutil.copytree(root_new, down_root)
    down = _job("kg_dict_update.py", "--kg", down_root, "--input", corpus,
                "--old-termlist", tsv_new, "--new-termlist", tsv_old)

    # exactness: updated roots equal the from-scratch builds
    spark = _session(cores)

    def _nh(root):
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(root, "triples", "data")) \
            .select("pred", "subj", "obj", "weight")
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.select(F.count("*").alias("n"),
                      F.bit_xor(F.xxhash64(*cols)).alias("h")).collect()[0]
        return (r["n"], r["h"])

    assert _nh(root_old) == _nh(root_new), "OLD->NEW update != rebuild"
    # rebuild the OLD root for the reverse-direction equality check
    root_old2 = os.path.join(SCALING_DIR, "dictupd_root_old2")
    shutil.rmtree(root_old2, ignore_errors=True)
    _job("kg_build.py", "--no-warmup", "--input", corpus,
         "--output", root_old2, "--termlist", tsv_old)
    assert _nh(down_root) == _nh(root_old2), "NEW->OLD update != rebuild"
    spark.stop()

    # --- merge-on-read commits (defer_rewrite): the O(affected) path ------
    # same deltas, fresh root copies; the fold (MoR -> CoW maintenance
    # rewrite) runs in the same job so equality can be asserted on the
    # PHYSICAL stages, but is timed separately (stats["fold"]["sec"]).
    defer_up_root = os.path.join(SCALING_DIR, "dictupd_root_defup")
    defer_down_root = os.path.join(SCALING_DIR, "dictupd_root_defdown")
    shutil.rmtree(defer_up_root, ignore_errors=True)
    shutil.rmtree(defer_down_root, ignore_errors=True)
    shutil.copytree(root_old2, defer_up_root)
    shutil.copytree(root_new, defer_down_root)
    defer_up = _job("kg_dict_update.py", "--kg", defer_up_root,
                    "--input", corpus, "--old-termlist", tsv_old,
                    "--new-termlist", tsv_new, "--defer-rewrite",
                    "--fold-overlay")
    defer_down = _job("kg_dict_update.py", "--kg", defer_down_root,
                      "--input", corpus, "--old-termlist", tsv_new,
                      "--new-termlist", tsv_old, "--defer-rewrite",
                      "--fold-overlay")
    spark = _session(cores)
    assert _nh(defer_up_root) == _nh(root_new), \
        "deferred OLD->NEW + fold != rebuild"
    assert _nh(defer_down_root) == _nh(root_old2), \
        "deferred NEW->OLD + fold != rebuild"
    spark.stop()
    for p in (root_old, root_new, down_root, root_old2,
              defer_up_root, defer_down_root):
        shutil.rmtree(p, ignore_errors=True)

    return {
        "job": "jobs/kg_dict_update.py (ontology-release absorb) vs "
               "jobs/kg_build.py --termlist rebuild",
        "docs": docs,
        "cores": cores,
        "termlist_surfaces": len(full_rows),
        "delta_curies": len(delta_curies),
        "delta_surfaces": len(full_rows) - len(old_rows),
        "rebuild_old_sec": build_old["sec"],
        "rebuild_new_sec": build_new["sec"],
        "update_add": {
            "sec": up["sec"], "affected_docs": up["n_affected_docs"],
            "stage_sec": up.get("stage_sec"),
            "ratio_vs_rebuild": round(up["sec"] / build_new["sec"], 3),
        },
        "update_remove": {
            "sec": down["sec"], "affected_docs": down["n_affected_docs"],
            "stage_sec": down.get("stage_sec"),
            "ratio_vs_rebuild": round(down["sec"] / build_old["sec"], 3),
        },
        "update_add_deferred": {
            "sec": defer_up["sec"],
            "stage_sec": defer_up.get("stage_sec"),
            "ratio_vs_rebuild": round(
                defer_up["sec"] / build_new["sec"], 3),
            "fold_sec": defer_up["fold"]["sec"],
        },
        "update_remove_deferred": {
            "sec": defer_down["sec"],
            "stage_sec": defer_down.get("stage_sec"),
            "ratio_vs_rebuild": round(
                defer_down["sec"] / build_old["sec"], 3),
            "fold_sec": defer_down["fold"]["sec"],
        },
        "equality": "verified (triples count + xxhash, both directions, "
                    "eager AND deferred+fold)",
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_compaction_bench(cores: int = 4) -> dict:
    """Quantify the small-files problem that file-level append commits
    accumulate, and what ``compact_stage`` buys back.  One corpus is
    absorbed as COMPACT_BATCHES crawl deltas (the streaming-ingest
    shape), then every stage is full-scanned (hash-reduced so nothing
    prunes) before and after compaction.  Content identity is asserted
    via the scan hash, not just row counts.  Also records the absorb
    drag: later batches pay more for the same work because each commit
    re-reads an ever-more-fragmented doc_terms/co-occur snapshot."""
    import shutil

    from pyspark.sql import functions as F

    corpus = os.path.join(SCALING_DIR, f"corpus_compact_{COMPACT_DOCS}.parquet")
    if not os.path.exists(corpus):
        _spark_submit(
            f"local[{cores}]", "jobs/gen_corpus.py",
            "--n-docs", str(COMPACT_DOCS),
            "--output", corpus, "--partitions", str(cores * 4),
        )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from onto_text_tag_spark.corpus import mini_ontology
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        compact_stage,
        init_kg_root,
    )
    from onto_text_tag_spark.sinks import read_manifest, read_stage

    onto = mini_ontology()
    dict_rows = build_dictionary_rows(onto)
    root = os.path.join(SCALING_DIR, f"compact_root_c{cores}")
    shutil.rmtree(root, ignore_errors=True)

    spark = _session(cores)
    # warm up JVM stages + Python workers so batch 0 isn't charged for
    # session startup (same rationale as run_bench)
    spark.range(1_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()

    def _noop(it):
        yield from it

    spark.range(10_000).toDF("id").mapInPandas(
        _noop, schema="id long").count()

    init_kg_root(spark, root, onto)
    docs = spark.read.parquet(corpus).cache()
    docs.count()

    batch_sec: list[float] = []
    for k in range(COMPACT_BATCHES):
        r = absorb_batch(
            spark, root,
            docs.where(F.crc32("url") % COMPACT_BATCHES == k),
            dict_rows, batch_fp=f"compactbench-{k}",
        )
        batch_sec.append(r["sec"])
    docs.unpersist()

    stages = ("mentions", "doc_terms", "triples")

    def _scan_all() -> tuple[float, dict]:
        """min-of-3 full scan of every stage; returns (sec, {stage: (n, h)})."""
        best = None
        sig = {}
        for _ in range(3):
            t0 = time.perf_counter()
            for st in stages:
                df = read_stage(spark, root, st)
                cols = [F.col(c).cast("string") for c in df.columns]
                row = df.select(
                    F.count("*").alias("n"),
                    F.bit_xor(F.xxhash64(*cols)).alias("h"),
                ).collect()[0]
                sig[st] = (row["n"], row["h"])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), sig

    scan_before, sig_before = _scan_all()
    manifests = {st: read_manifest(root, st) for st in stages}
    files_before = {st: manifests[st]["n_files"] for st in stages}
    bytes_before = {st: manifests[st]["size_bytes"] for st in stages}

    t0 = time.perf_counter()
    files_after = {}
    for st in stages:
        # right-sized for THIS deployment: keep one file per core so the
        # rewrite doesn't trade file-count for scan parallelism (on a
        # cluster the 128 MB jobs/kg_compact.py default plays this role)
        sealed = compact_stage(
            spark, root, st,
            target_bytes_per_file=max(
                1, manifests[st]["size_bytes"] // cores),
        )
        files_after[st] = sealed["metrics"]["compaction"]["files_after"]
    compact_sec = round(time.perf_counter() - t0, 3)
    bytes_after = {
        st: read_manifest(root, st)["size_bytes"] for st in stages
    }

    scan_after, sig_after = _scan_all()
    assert sig_after == sig_before, (
        f"compaction changed stage content: {sig_before} != {sig_after}")
    for st in stages:
        assert files_after[st] <= files_before[st]
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)

    k = min(4, len(batch_sec) // 2)
    return {
        "job": "absorb x N then plans/kg_absorb.py:compact_stage "
               "(small-files maintenance)",
        "docs": COMPACT_DOCS,
        "batches": COMPACT_BATCHES,
        "cores": cores,
        "rows": {st: sig_before[st][0] for st in stages},
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "full_scan_sec_before": scan_before,
        "full_scan_sec_after": scan_after,
        "scan_speedup": round(scan_before / scan_after, 2),
        "compact_sec": compact_sec,
        "absorb_sec_first_batches": batch_sec[:k],
        "absorb_sec_last_batches": batch_sec[-k:],
        "absorb_sec_total": round(sum(batch_sec), 2),
        "content_hash_identical": True,
    }


BUCKETED_URLS = int(os.environ.get("SPARK_GRAFT_BUCKETED_URLS", "2000000"))
BUCKETED_TPD = int(os.environ.get("SPARK_GRAFT_BUCKETED_TPD", "8"))


def run_bucketed_bench(cores: int = 8) -> dict:
    """Bucketed fact table vs plain parquet (sources/bucketed.py).

    Measures what paying the corpus-keyed hash exchange ONCE at write
    buys every downstream url-keyed operation — the rest-state twin of
    the reference's key-organized shelve stores (SURVEY.md §4).  One
    (url, curie) relation is written both ways from the same DataFrame;
    then two downstream shapes run against each copy (min of 3):

    * co-occurrence edge build (groupBy url → pair explode → pair agg):
      plain pays TWO exchanges (corpus-keyed + edge-keyed); bucketed
      pays only the edge-keyed one — asserted from the executed plans;
    * per-url distinct-term count (pure url-keyed aggregate): plain
      pays the corpus exchange; bucketed pays none.

    Results are asserted hash-identical across storage layouts.  The
    honest cost side is also recorded: the bucketed write includes the
    shuffle the plain write skips — the break-even is one downstream
    url-keyed op, and every op after that is pure savings (at 100 TB
    the fact table is written once and re-read by every maintenance
    job: kg_update anti-joins, retraction masks, dict-delta re-tags).
    """
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.cooccur import cooccurrence_edges
    from onto_text_tag_spark.sources.bucketed import write_bucketed

    spark = _session(cores)
    spark.range(1_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()

    n_rows = BUCKETED_URLS * BUCKETED_TPD
    buckets = max(2 * cores, 16)
    rel = spark.range(0, n_rows, 1, cores * 4).select(
        F.concat(F.lit("u"), (F.col("id") % BUCKETED_URLS)).alias("url"),
        # ~400-term vocabulary, mildly skewed (squared hash bucket)
        F.concat(
            F.lit("C:"),
            (F.pmod(F.xxhash64("id"), F.lit(400)) ** 2 / 400).cast("int"),
        ).alias("curie"),
    )

    plain_path = os.path.join(SCALING_DIR, "bucketed_bench_plain.parquet")
    bkt_path = os.path.join(SCALING_DIR, "bucketed_bench_bkt")

    t0 = time.perf_counter()
    rel.write.mode("overwrite").parquet(plain_path)
    write_plain_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    bkt = write_bucketed(
        rel, "bucketed_bench_rel", key="url", buckets=buckets,
        path=bkt_path,
    )
    write_bucketed_sec = round(time.perf_counter() - t0, 2)

    plain = spark.read.parquet(plain_path)

    def _timed(make_df) -> tuple[float, tuple, str]:
        best, sig, plan = None, None, ""
        for _ in range(3):
            df = make_df()
            t0 = time.perf_counter()
            cols = [F.col(c).cast("string") for c in df.columns]
            row = df.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(*cols)).alias("h"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
            sig = (row["n"], row["h"])
            plan = (
                df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
        return round(best, 2), sig, plan

    cooccur_plain_sec, sig_cp, plan_cp = _timed(
        lambda: cooccurrence_edges(plain))
    cooccur_bkt_sec, sig_cb, plan_cb = _timed(
        lambda: cooccurrence_edges(bkt))
    assert sig_cp == sig_cb, (sig_cp, sig_cb)
    # the hash-reduce collapses the edge output before any exchange
    # counting ambiguity; count exchanges in the edge subplan only
    ex_plain = plan_cp.count("Exchange hashpartitioning")
    ex_bkt = plan_cb.count("Exchange hashpartitioning")
    assert ex_bkt < ex_plain, (ex_bkt, ex_plain)

    agg_plain_sec, sig_ap, _ = _timed(
        lambda: plain.groupBy("url").agg(
            F.countDistinct("curie").alias("n_terms")))
    agg_bkt_sec, sig_ab, plan_ab = _timed(
        lambda: bkt.groupBy("url").agg(
            F.countDistinct("curie").alias("n_terms")))
    assert sig_ap == sig_ab, (sig_ap, sig_ab)

    return {
        "job": "sources/bucketed.py write_bucketed vs plain parquet",
        "cores": cores,
        "rows": n_rows,
        "urls": BUCKETED_URLS,
        "buckets": buckets,
        "write_plain_sec": write_plain_sec,
        "write_bucketed_sec": write_bucketed_sec,
        "cooccur_plain_sec": cooccur_plain_sec,
        "cooccur_bucketed_sec": cooccur_bkt_sec,
        "cooccur_speedup": round(cooccur_plain_sec / cooccur_bkt_sec, 2),
        "url_agg_plain_sec": agg_plain_sec,
        "url_agg_bucketed_sec": agg_bkt_sec,
        "url_agg_speedup": round(agg_plain_sec / agg_bkt_sec, 2),
        "exchanges_cooccur_plain": ex_plain,
        "exchanges_cooccur_bucketed": ex_bkt,
        "results_hash_identical": True,
        "edges": sig_cp[0],
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_graph_bench(cores: int = 8) -> dict:
    """Graph-metrics scale run (operators/graph_metrics.py, operators/
    components.py) on a deterministic SKEWED synthetic graph — the
    regime the ontology-bounded driver graph cannot exercise.

    Edge endpoints are drawn by inverse-CDF from a u² density
    (xxhash64-seeded, fully deterministic), which concentrates mass on
    low node ids: the head node's degree is ~1000× the median, the
    co-occurrence-hub shape the north_star names.  The headline
    comparison is triangle counting's orientation strategy:

    * (degree, id) orientation bounds every oriented out-degree by
      O(√m), so wedge generation is O(m^1.5) regardless of hubs;
    * plain id orientation makes the low-id HUBS the wedge apexes —
      Σ C(outdeg, 2) explodes quadratically in the hub degree.

    Both are timed on the same stored edge relation, their per-node
    results asserted hash-identical, and the actual wedge counts
    (Σ C(outdeg, 2) under each orientation) reported — the measured
    gap is the operator-design evidence, not just the wall clock.
    degree_stats, connected_components (above its driver short-circuit
    threshold → the distributed contraction path), and a 5-round
    pagerank round out the table: every graph operator at million-edge
    scale in one place.
    """
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.components import connected_components
    from onto_text_tag_spark.operators.graph_metrics import (
        degree_stats,
        pagerank,
        triangle_counts,
    )

    n_nodes, n_edges = 200_000, 2_000_000
    spark = _session(cores)
    spark.range(1_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()

    def _endpoint(seed: int):
        u = F.pmod(
            F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)
        ) / 1_000_000.0
        return F.concat(
            F.lit("n"),
            F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(2.0)))
            .cast("long"),
        )

    path = os.path.join(SCALING_DIR, f"graph_bench_{n_edges}.parquet")
    if not os.path.exists(path):
        (
            spark.range(0, n_edges, 1, cores * 4)
            .select(_endpoint(1).alias("src"), _endpoint(2).alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .write.mode("overwrite").parquet(path)
        )
    e = spark.read.parquet(path)

    def _force_sig(df) -> tuple:
        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _timed(make_df, repeats: int = 2) -> tuple[float, tuple]:
        best, sig = None, None
        for _ in range(repeats):
            t0 = time.perf_counter()
            s = _force_sig(make_df())
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
            assert sig is None or sig == s
            sig = s
        return round(best, 2), sig

    # degree profile of the generated graph (also the skew evidence)
    deg = degree_stats(e).persist()
    deg_sec, deg_sig = _timed(lambda: degree_stats(e))
    prof = deg.agg(
        F.max("degree").alias("max"),
        F.expr("percentile_approx(degree, 0.5)").alias("p50"),
        F.expr("percentile_approx(degree, 0.99)").alias("p99"),
    ).collect()[0]

    # wedge counts under each orientation: Σ C(outdeg, 2)
    pairs = (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    dd = deg.withColumnRenamed("node", "a").withColumnRenamed(
        "degree", "_da"
    )
    db = deg.withColumnRenamed("node", "b").withColumnRenamed(
        "degree", "_db"
    )
    both = pairs.join(dd, "a").join(db, "b")
    ka = F.struct(F.col("_da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("_db").alias("d"), F.col("b").alias("n"))
    apex_deg = both.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u")
    ).groupBy("u").count()
    apex_id = pairs.groupBy("a").count()

    def _wedges(apex) -> int:
        return int(
            apex.agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2)
            ).collect()[0][0]
        )

    wedges_deg = _wedges(apex_deg)
    wedges_id = _wedges(apex_id)

    tri_deg_sec, tri_deg_sig = _timed(
        lambda: triangle_counts(e, orient_by_degree=True)
    )
    tri_id_sec, tri_id_sig = _timed(
        lambda: triangle_counts(e, orient_by_degree=False)
    )
    assert tri_deg_sig == tri_id_sig, (tri_deg_sig, tri_id_sig)

    cc_sec, cc_sig = _timed(
        lambda: connected_components(e), repeats=1
    )
    pr_sec, pr_sig = _timed(
        lambda: pagerank(e, iterations=5).select(
            "node", F.round("rank", 8).alias("rank")
        ),
        repeats=1,
    )

    from onto_text_tag_spark.operators.graph_metrics import (
        adamic_adar,
        label_propagation,
    )

    lpa_sec, lpa_sig = _timed(
        lambda: label_propagation(e, rounds=4), repeats=1
    )
    # Adamic-Adar needs BOTH wedge arms per shared neighbor — Σ C(deg,2)
    # with no orientation escape — so the hub cap is not optional on a
    # skewed graph: bridges above deg 64 contribute ≤ 1/ln(64) ≈ 0.24
    # per pair while generating the quadratic bulk.  The capped run is
    # the production form; its candidate volume is reported alongside.
    aa_cap = 64
    aa_sec, aa_sig = _timed(
        lambda: adamic_adar(e, max_neighbor_degree=aa_cap).select(
            "u", "w", "common", F.round("score", 8).alias("score")
        ),
        repeats=1,
    )

    # k-core peel at k = p50+ (real peel depth on the u² tail) and a
    # 6-round HITS on the raw directed rows: the two newest metrics at
    # the same million-edge scale as the rest of the table.
    from onto_text_tag_spark.operators.graph_metrics import hits, k_core

    kc_k = 8
    kc_sec, kc_sig = _timed(lambda: k_core(e, k=kc_k), repeats=1)
    hits_sec, hits_sig = _timed(
        lambda: hits(e, iterations=6).select(
            "node", F.round("hub", 8).alias("hub"),
            F.round("auth", 8).alias("auth"),
        ),
        repeats=1,
    )

    n_pairs = pairs.count()
    deg.unpersist()
    pairs.unpersist()
    rep = {
        "job": "bench.run_graph_bench",
        "cores": cores,
        "nodes_drawn_from": n_nodes,
        "edge_rows": n_edges,
        "distinct_edges": n_pairs,
        "degree_max": int(prof["max"]),
        "degree_p50": int(prof["p50"]),
        "degree_p99": int(prof["p99"]),
        "wedges_degree_oriented": wedges_deg,
        "wedges_id_oriented": wedges_id,
        "timings_sec": {
            "degree_stats": deg_sec,
            "triangles_degree_oriented": tri_deg_sec,
            "triangles_id_oriented": tri_id_sec,
            "connected_components": cc_sec,
            "pagerank_5_rounds": pr_sec,
            "label_propagation_4_rounds": lpa_sec,
            f"adamic_adar_cap{aa_cap}": aa_sec,
            f"k_core_k{kc_k}": kc_sec,
            "hits_6_rounds": hits_sec,
        },
        "k_core_k": kc_k,
        "k_core_nodes": kc_sig[0],
        "hits_nodes": hits_sig[0],
        "triangle_nodes": tri_deg_sig[0],
        "components_sig": cc_sig[0],
        "pagerank_nodes": pr_sig[0],
        "lpa_nodes": lpa_sig[0],
        "adamic_adar_candidates": aa_sig[0],
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }
    spark.stop()
    return rep


def run_dict_size_bench() -> dict:
    """Matcher cost vs dictionary size — evidence that the broadcast-
    automaton tagging path survives million-surface dictionaries (the
    aho_corasick.py scale claim, and the gap between the reference's
    3,818-surface fixture and a real OBO-foundry-wide dictionary).

    Driver-side microbench by design: the matcher object is built once
    on the driver, shipped via broadcast, and runs IDENTICALLY inside
    every executor's mapInPandas batch — so per-doc match cost, build
    cost, pickle size, and per-worker unpickle cost are exactly the
    quantities that scale (or don't) with dictionary size.  Corpus and
    surface sets are seeded-deterministic; surfaces mix unigrams and
    bigrams (multi-word ontology labels) over the same vocabulary the
    documents draw from, so hit rates stay realistic as size grows.
    """
    import pickle
    import random

    from onto_text_tag_spark.operators.tagger import compile_dictionary

    vocab = 200_000
    rng = random.Random(42)
    docs = [
        " ".join(
            f"w{int(rng.random() ** 2 * vocab)}" for _ in range(300)
        )
        for _ in range(500)
    ]

    sizes = [1_000, 10_000, 100_000, 1_000_000]
    per_size: dict[str, dict] = {}
    for n in sizes:
        rloc = random.Random(7)
        seen: set[str] = set()
        rows = []
        while len(rows) < n:
            if rloc.random() < 0.35:
                s = (
                    f"w{rloc.randrange(vocab)} w{rloc.randrange(vocab)}"
                )
            else:
                s = f"w{rloc.randrange(vocab)}"
            if s in seen:
                continue
            seen.add(s)
            rows.append(
                {"surface": s, "id": f"T:{len(rows)}", "name": s,
                 "ont": "T"}
            )

        t0 = time.perf_counter()
        matcher = compile_dictionary(rows)
        matcher.find("w0 warmup")  # forces the lazy regex compile
        build_sec = round(time.perf_counter() - t0, 2)

        blob = pickle.dumps(matcher)
        t0 = time.perf_counter()
        m2 = pickle.loads(blob)
        m2.find("w0 warmup")
        unpickle_sec = round(time.perf_counter() - t0, 2)

        best = None
        matches = 0
        for _ in range(3):
            t0 = time.perf_counter()
            matches = sum(len(m2.find(t)) for t in docs)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        per_size[str(n)] = {
            "build_sec": build_sec,
            "pickle_mb": round(len(blob) / 1e6, 2),
            "unpickle_sec": unpickle_sec,
            "us_per_doc": round(best / len(docs) * 1e6, 1),
            "matches": matches,
        }

    return {
        "job": "operators/tagger.py compile_dictionary + "
               "TokenIndexMatcher.find vs dictionary size",
        "docs": len(docs),
        "tokens_per_doc": 300,
        "vocab": vocab,
        "per_size": per_size,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_joined_tagging_bench(cores: int = 8) -> dict:
    """Broadcast automaton vs shuffle-join tagging at a large dictionary
    (operators/tagger.py:tag_documents_joined) — the J1 strategy
    crossover evidence.

    Corpus and dictionary are generated DISTRIBUTED and deterministic
    (xxhash64 of (id, position) — physical-only randomness), sharing one
    token space so hit rates are realistic.  Both paths compute the
    (url, curie) mention-count relation; outputs are asserted
    hash-identical before any timing is reported.  The joined path is
    measured with the pure-JVM 'contain' resolver and with the exact
    'greedy' resolver (applyInPandas over candidates only).
    """
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.tagger import (
        tag_documents,
        tag_documents_joined,
    )

    n_docs = int(os.environ.get("SPARK_GRAFT_JOINED_DOCS", "100000"))
    dict_n = int(os.environ.get("SPARK_GRAFT_JOINED_DICT", "1000000"))
    vocab, toks = 200_000, 150

    spark = _session(cores)
    try:
        docs = spark.range(n_docs).select(
            F.col("id").cast("string").alias("url"),
            F.expr(
                f"array_join(transform(sequence(1, {toks}),"
                f" i -> concat('w', pmod(xxhash64(id, i), {vocab}))), ' ')"
            ).alias("text"),
        )
        docs.write.mode("overwrite").parquet("/tmp/bench_joined_docs")
        docs = spark.read.parquet("/tmp/bench_joined_docs")

        dict_df = (
            spark.range(dict_n)
            .select(
                F.when(
                    F.pmod(F.xxhash64("id"), F.lit(100)) < 65,
                    F.concat(F.lit("w"),
                             F.pmod(F.xxhash64("id", F.lit(1)),
                                    F.lit(vocab))),
                )
                .otherwise(
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(vocab)),
                        F.lit(" w"),
                        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(vocab)),
                    )
                )
                .alias("surface"),
                F.concat(F.lit("T:"), F.col("id")).alias("id"),
                F.lit("t").alias("name"),
                F.lit("T").alias("ont"),
            )
            .dropDuplicates(["surface"])
        )
        dict_df.write.mode("overwrite").parquet("/tmp/bench_joined_dict")
        dict_df = spark.read.parquet("/tmp/bench_joined_dict")
        n_surfaces = dict_df.count()

        def counts_hash(df):
            agg = df.groupBy("url", "curie").count()
            row = agg.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("url", "curie", "count")).alias("h"),
            ).collect()[0]
            return row["n"], row["h"]

        t0 = time.perf_counter()
        rows = [r.asDict() for r in
                dict_df.select("surface", "id", "name", "ont").collect()]
        collect_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        bc_n, bc_h = counts_hash(tag_documents(docs, rows))
        broadcast_sec = round(time.perf_counter() - t0, 2)

        timings = {}
        t0 = time.perf_counter()
        gn, gh = counts_hash(
            tag_documents_joined(docs, dict_df, resolve="greedy"))
        timings["greedy"] = round(time.perf_counter() - t0, 2)
        # the greedy resolver implements the automaton's exact W1
        # policy — bit-equality is the correctness gate of this bench
        assert (gn, gh) == (bc_n, bc_h), (
            f"joined[greedy] != broadcast: {(gn, gh)} vs {(bc_n, bc_h)}")

        t0 = time.perf_counter()
        cn, ch = counts_hash(
            tag_documents_joined(docs, dict_df, resolve="contain"))
        timings["contain"] = round(time.perf_counter() - t0, 2)
        # 'contain' equals greedy only when every overlap is a
        # containment; at ~1M random surfaces partial-overlap chains
        # exist, so report its (tiny) divergence instead of asserting
        contain_matches = bool((cn, ch) == (bc_n, bc_h))

        return {
            "job": "tag_documents (broadcast automaton) vs "
                   "tag_documents_joined (shuffle join) at a "
                   "beyond-broadcast dictionary",
            "cores": cores,
            "docs": n_docs,
            "tokens_per_doc": toks,
            "dict_surfaces": n_surfaces,
            "mention_groups": bc_n,
            "dict_collect_sec": collect_sec,
            "broadcast_sec": broadcast_sec,
            "joined_contain_sec": timings["contain"],
            "joined_greedy_sec": timings["greedy"],
            "greedy_hash_equal": True,
            "contain_hash_equal": contain_matches,
            "contain_groups": cn,
            "host_capacity_units_per_sec": {
                str(k): v for k, v in _host_capacity().items()
            },
        }
    finally:
        spark.stop()


def run_sketch_bench(cores: int = 8) -> dict:
    """Maintained KMV term-df sketch vs exact recompute — the sketch's
    operational claim measured: absorbing a crawl delta into the stored
    sketch state must cost a fraction of recomputing exact per-term
    ``countDistinct`` over the full corpus, at bounded accuracy loss.

    Post-tagging (url, curie) relation synthesized directly (like the
    skew bench): tail terms uniform over SKETCH_VOCAB plus hot head
    terms (the df skew that makes exact countDistinct funnel).  The
    'stored state' is written to parquet first, so the absorb path
    reads sketch-sized state + delta-sized mentions — never the base.
    """
    import math

    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.cooccur import (
        finalize_term_sketch,
        merge_term_sketches,
        term_sketch_partials,
    )

    rows_n = int(os.environ.get("SPARK_GRAFT_SKETCH_ROWS", "20000000"))
    vocab = int(os.environ.get("SPARK_GRAFT_SKETCH_VOCAB", "20000"))
    k = int(os.environ.get("SPARK_GRAFT_SKETCH_K", "64"))
    delta_frac = 10  # 1/10th of docs form the crawl delta

    spark = _session(cores)
    try:
        rel = spark.range(rows_n).select(
            F.concat(F.lit("u"), (F.col("id") / 12).cast("long"))
            .alias("url"),
            F.when(
                F.pmod(F.xxhash64("id", F.lit(7)), F.lit(25)) == 0,
                F.concat(F.lit("head"),
                         F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5))),
            )
            .otherwise(
                F.concat(F.lit("t"),
                         F.pmod(F.xxhash64("id"), F.lit(vocab)))
            )
            .alias("curie"),
        )
        rel.write.mode("overwrite").parquet("/tmp/bench_sketch_rel")
        rel = spark.read.parquet("/tmp/bench_sketch_rel")
        is_delta = F.pmod(F.xxhash64("url"), F.lit(delta_frac)) == 0
        base, delta = rel.where(~is_delta), rel.where(is_delta)

        # stored state: sketch over the base corpus (paid once at build)
        t0 = time.perf_counter()
        term_sketch_partials(base, k=k).write.mode("overwrite").parquet(
            "/tmp/bench_sketch_state")
        seed_sec = round(time.perf_counter() - t0, 2)
        stored = spark.read.parquet("/tmp/bench_sketch_state")

        # absorb: merge delta sketch into stored state (delta + state only)
        t0 = time.perf_counter()
        merged = merge_term_sketches(
            stored, term_sketch_partials(delta, k=k), k=k)
        merged.write.mode("overwrite").parquet("/tmp/bench_sketch_merged")
        absorb_sec = round(time.perf_counter() - t0, 2)

        # the maintenance alternative: exact countDistinct over EVERYTHING
        t0 = time.perf_counter()
        exact = rel.groupBy("curie").agg(
            F.countDistinct("url").alias("df"))
        exact.write.mode("overwrite").parquet("/tmp/bench_sketch_exact")
        exact_sec = round(time.perf_counter() - t0, 2)

        est = finalize_term_sketch(
            spark.read.parquet("/tmp/bench_sketch_merged"), k=k)
        joined = est.join(
            spark.read.parquet("/tmp/bench_sketch_exact"), "curie")
        err = joined.where(F.col("sketch_size") >= k).select(
            F.avg(F.abs(F.col("df_est") - F.col("df")) / F.col("df"))
            .alias("mare"),
            F.max(F.abs(F.col("df_est") - F.col("df")) / F.col("df"))
            .alias("max_rel_err"),
            F.count("*").alias("n_estimated"),
        ).collect()[0]
        n_exact_terms = joined.where(F.col("sketch_size") < k).count()

        return {
            "job": "KMV sketch absorb (merge stored state + delta) vs "
                   "exact per-term countDistinct recompute",
            "cores": cores,
            "mention_rows": rows_n,
            "vocab": vocab,
            "k": k,
            "theory_stderr": round(1.0 / math.sqrt(k - 2), 4),
            "seed_sketch_sec": seed_sec,
            "sketch_absorb_sec": absorb_sec,
            "exact_recompute_sec": exact_sec,
            "absorb_vs_recompute": round(absorb_sec / exact_sec, 3),
            "mean_abs_rel_err": round(err["mare"], 4),
            "max_rel_err": round(err["max_rel_err"], 4),
            "n_estimated_terms": err["n_estimated"],
            "n_exact_terms": n_exact_terms,
            "host_capacity_units_per_sec": {
                str(kk): v for kk, v in _host_capacity().items()
            },
        }
    finally:
        spark.stop()


SKEW_DOCS = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "200000"))
SKEW_VOCAB = int(os.environ.get("SPARK_GRAFT_SKEW_VOCAB", "10000"))
SKEW_TERMS_PER_DOC = int(os.environ.get("SPARK_GRAFT_SKEW_TPD", "12"))
SKEW_HEAD_TERMS = int(os.environ.get("SPARK_GRAFT_SKEW_HEAD", "10"))
SKEW_INDEX_DOCS = int(os.environ.get("SPARK_GRAFT_SKEW_INDEX_DOCS",
                                     "2000000"))


def run_skew_bench(cores: int = 8) -> dict:
    """Measure head-term skew handling (north_rule: 'partitioning /
    shuffle / skew handled explicitly'; SURVEY.md §4.1).

    The fixture ontology is ~24 surface forms — far too small to
    exhibit the skew web-scale tagging produces — so this bench
    synthesizes the POST-tagging ``(url, curie)`` relation directly at
    web-like shape: SKEW_VOCAB distinct CURIEs drawn uniformly
    (tail document-frequency ≈ docs·tpd/vocab) plus SKEW_HEAD_TERMS
    planted boilerplate terms present in EVERY document (df = 100% —
    the nav-bar / 'smoke'-class head terms SURVEY §4.1 names; real
    page chrome repeats a dozen such classes on every page, so the
    per-doc pair fan-out blows up quadratically: (tpd+head choose 2)
    vs (tpd choose 2)).  Everything is deterministic (xxhash64 of
    (url, slot)); the operators measured are the exact ones the
    pipeline runs (operators/cooccur.py).

    Four co-occurrence physical shapes over the same relation:
      * engine (joinless collect_set→pair-explode) on the skewed rel;
      * engine on the clean rel (fan-out cost of the boilerplate);
      * engine + max_doc_freq cap (mitigation 3: drop stopword-like
        terms before pairing) — asserted equal to the clean result;
      * textbook self-join on doc id (SURVEY J2's literal shape) —
        asserted hash-equal to the engine result.
    Plus the A1 inverted-index skew trap on its own SKEW_INDEX_DOCS-url
    relation (one df=100% term + one uniform tail term per url):
    ``term_index`` (collect_set parity shape — the head term funnels
    every url into ONE reducer that materializes and sorts the whole
    array) vs ``term_index_salted`` (salted repartitioning: stage 1
    groups on (term, xxhash64(url) % 4·cores) spreading the hot key,
    stage 2 concatenates the pre-deduped partial arrays — same output,
    asserted) vs the normalized countDistinct profile (two-phase
    distinct agg spreads the hot key by (term, url) before counting).
    """
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.cooccur import (
        cooccurrence_edges,
        cooccurrence_edges_from_arrays,
        doc_term_arrays,
        term_index,
        term_index_salted,
    )

    spark = _session(cores)
    spark.range(1_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()

    docs = spark.range(SKEW_DOCS).select(
        F.concat(F.lit("https://example.org/doc/"), F.col("id"))
        .alias("url"))
    rel_clean = (
        docs.select(
            "url",
            F.explode(F.sequence(F.lit(0), F.lit(SKEW_TERMS_PER_DOC - 1)))
            .alias("_slot"))
        .select(
            "url",
            F.concat(
                F.lit("T:"),
                F.lpad(F.pmod(F.xxhash64("url", "_slot"),
                              F.lit(SKEW_VOCAB)).cast("string"), 5, "0"),
            ).alias("curie"))
    ).cache()
    n_clean = rel_clean.count()
    boiler = docs.select(
        "url",
        F.explode(F.sequence(F.lit(1), F.lit(SKEW_HEAD_TERMS)))
        .alias("_b")).select(
        "url",
        F.concat(F.lit("BOILER:"),
                 F.lpad(F.col("_b").cast("string"), 4, "0")).alias("curie"))
    rel_skew = rel_clean.unionByName(boiler).cache()
    n_skew = rel_skew.count()

    def _sig(df) -> tuple[int, int]:
        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _timed(fn) -> tuple[float, tuple[int, int]]:
        best, out = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), out

    def _naive_selfjoin(rel):
        # SURVEY.md §2.3 J2's literal Spark mapping: dedup, self equi-join
        # on the doc key, canonical-order filter, countDistinct.
        dt = rel.distinct()
        a = dt.select(F.col("url"), F.col("curie").alias("src"))
        b = dt.select(F.col("url"), F.col("curie").alias("dst"))
        return (
            a.join(b, "url")
            .where(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.countDistinct("url").alias("weight"))
        )

    timings: dict[str, float] = {}
    sigs: dict[str, tuple[int, int]] = {}

    timings["cooccur_engine_skewed"], sigs["cooccur_engine_skewed"] = \
        _timed(lambda: _sig(cooccurrence_edges(rel_skew)))
    # the shared-exchange triples plan's weight form (countDistinct —
    # no map-side combine; see cooccurrence_edges_from_arrays docstring)
    timings["cooccur_countdistinct_skewed"], \
        sigs["cooccur_countdistinct_skewed"] = _timed(
        lambda: _sig(cooccurrence_edges_from_arrays(
            doc_term_arrays(rel_skew), assume_deduped=False)))
    timings["cooccur_engine_clean"], sigs["cooccur_engine_clean"] = \
        _timed(lambda: _sig(cooccurrence_edges(rel_clean)))
    timings["cooccur_engine_dfcap"], sigs["cooccur_engine_dfcap"] = \
        _timed(lambda: _sig(cooccurrence_edges(
            rel_skew, max_doc_freq=SKEW_DOCS // 2)))
    timings["cooccur_naive_selfjoin"], sigs["cooccur_naive_selfjoin"] = \
        _timed(lambda: _sig(_naive_selfjoin(rel_skew)))

    # the df cap must drop EXACTLY the planted boilerplate term,
    # recovering the clean result; the textbook join must agree with the
    # engine shape bit-for-bit
    assert sigs["cooccur_engine_dfcap"] == sigs["cooccur_engine_clean"], (
        sigs)
    assert sigs["cooccur_naive_selfjoin"] == sigs["cooccur_engine_skewed"], (
        sigs)
    assert (sigs["cooccur_countdistinct_skewed"]
            == sigs["cooccur_engine_skewed"]), sigs

    # A1 inverted-index trap: its own relation, sized so the head
    # term's collected array is reducer-straggler material (one task
    # materializes + sorts SKEW_INDEX_DOCS urls while tail groups hold
    # a few hundred)
    idx_docs = spark.range(SKEW_INDEX_DOCS).select(
        F.concat(F.lit("https://example.org/doc/"), F.col("id"))
        .alias("url"))
    idx_rel = idx_docs.select(
        "url", F.lit("BOILER:0001").alias("curie")
    ).unionByName(idx_docs.select(
        "url",
        F.concat(
            F.lit("T:"),
            F.lpad(F.pmod(F.xxhash64("url"), F.lit(SKEW_VOCAB))
                   .cast("string"), 5, "0")).alias("curie"))
    ).withColumn("pref_label", F.lit(None).cast("string")).cache()
    n_idx = idx_rel.count()
    timings["index_collect_set"], sigs["index_collect_set"] = _timed(
        lambda: _sig(term_index(idx_rel).select(
            "curie", F.size("docs").alias("n_docs"))))
    # salted repartitioning (north_star's named mitigation): stage 1
    # groups on (term, xxhash64(url) % B) so the df=100% term spreads
    # over B reducers; stage 2 concatenates B pre-deduped partial arrays
    timings["index_salted"], sigs["index_salted"] = _timed(
        lambda: _sig(term_index_salted(idx_rel, salt_buckets=cores * 4)
                     .select("curie", F.size("docs").alias("n_docs"))))
    timings["index_normalized"], sigs["index_normalized"] = _timed(
        lambda: _sig(idx_rel.groupBy("curie").agg(
            F.countDistinct("url").alias("n_docs"))))
    assert sigs["index_collect_set"] == sigs["index_normalized"], sigs
    assert sigs["index_salted"] == sigs["index_collect_set"], sigs

    rel_clean.unpersist()
    rel_skew.unpersist()
    idx_rel.unpersist()
    spark.stop()
    return {
        "job": "operators/cooccur.py under planted df=100% head terms",
        "docs": SKEW_DOCS,
        "vocab": SKEW_VOCAB,
        "terms_per_doc": SKEW_TERMS_PER_DOC,
        "head_terms": SKEW_HEAD_TERMS,
        "index_docs": SKEW_INDEX_DOCS,
        "index_rel_rows": n_idx,
        "cores": cores,
        "rel_rows_clean": n_clean,
        "rel_rows_skewed": n_skew,
        "edges_skewed": sigs["cooccur_engine_skewed"][0],
        "edges_clean": sigs["cooccur_engine_clean"][0],
        "timings_sec": timings,
        "naive_equals_engine": True,
        "dfcap_equals_clean": True,
    }


PR_DOCS = int(os.environ.get("SPARK_GRAFT_PR_DOCS", "2000"))


def run_pr_eval(n_docs: int = PR_DOCS, cores: int = 8) -> dict:
    """Measured triple P/R vs the independent reference matcher —
    BASELINE.json metric: 'triple P/R >= 0.95 vs reference tags'.

    Reuses the matcher defined in tests/test_precision_recall.py (regex
    candidate scan + greedy longest-earliest overlap resolution — the
    OGER / PhraseMatcher(attr='LOWER') + filter_spans spec,
    re-implemented independently of the engine's Aho-Corasick path) so
    there is exactly ONE reference implementation, shared between the
    pytest gate and this recorded measurement."""
    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "pr_harness", os.path.join(here, "tests",
                                   "test_precision_recall.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from onto_text_tag_spark.corpus import documents_df, ontology_df
    from onto_text_tag_spark.dictionary import (
        build_dictionary,
        resolve_collisions,
    )
    from onto_text_tag_spark.operators.tagger import tag_documents

    spark = _session(cores)
    docs = documents_df(spark, n_docs=n_docs)
    dictionary = resolve_collisions(build_dictionary(ontology_df(spark)))

    t0 = time.perf_counter()
    mentions = tag_documents(docs, dictionary)
    got = {
        (r["url"], r["begin"], r["end"], r["curie"])
        for r in mentions.collect()
    }
    engine_sec = round(time.perf_counter() - t0, 3)
    want = mod._reference_tags(
        docs.select("url", "text").collect(),
        dictionary.select("surface", "id").collect(),
    )
    spark.stop()
    hits = len(got & want)
    return {
        "job": "operators/tagger.py vs independent reference matcher "
               "(tests/test_precision_recall.py spec)",
        "docs": n_docs,
        "cores": cores,
        "engine_mentions": len(got),
        "reference_mentions": len(want),
        "precision": round(hits / len(got), 6),
        "recall": round(hits / len(want), 6),
        "exact_agreement": got == want,
        "engine_tag_sec": engine_sec,
    }


def run_paragraph_skew_bench(cores: int = 8) -> dict:
    """Mega-banner skew evidence for the de-skewed ``paragraph_dedup``
    (round-4 rewrite: digest-partitioned ``row_number`` window →
    ``groupBy(digest).agg(min(struct(id, pos)))`` + equi-join).

    The operator exists BECAUSE some paragraphs (cookie banners,
    footers) occur in a huge fraction of the corpus — and that hot
    digest is exactly what the window shape cannot survive: every
    occurrence lands in ONE window partition, one task sorts them all,
    and AQE skew-splitting does not apply to window partitions.  The
    aggregate's map-side partials reduce the hot key to one row per
    map task, and the join back on digest IS AQE-skew-splittable.

    Corpus: SKEWPARA_DOCS synthetic docs, 5 unique paragraphs each
    (md5-derived, deterministic) plus ONE shared banner paragraph
    planted in 30% of docs — the planted mega-banner the round-3
    verdict asked for.  A/B on the SAME input, interleaved min-of-N:
    the shipped agg+join operator vs an inline replica of the removed
    window shape (kept here only as the measurement foil).  Output
    equality is asserted via full-column hash.
    """
    from pyspark.sql import Window, functions as F

    from onto_text_tag_spark.functions.hashing import md5_long
    from onto_text_tag_spark.operators.dedup import (
        content_digest,
        paragraph_dedup,
    )

    n_docs = int(os.environ.get("SPARK_GRAFT_SKEWPARA_DOCS", "200000"))
    banner_frac = 0.3

    def _window_paragraph_dedup(documents) -> "object":
        # the pre-round-4 shape (operators/dedup.py history): ONE
        # digest-keyed window — hot-digest-fragile; bench foil only
        paras = (
            documents.select(
                "doc_id",
                F.expr(
                    "filter(transform(split(text, '\\n'), "
                    "x -> trim(x)), x -> x != '')"
                ).alias("_paras"),
            )
            .select("doc_id",
                    F.posexplode_outer("_paras").alias("pos", "para"))
        )
        w = Window.partitionBy("digest").orderBy(
            F.col("doc_id").asc(), F.col("pos").asc())
        ranked = paras.withColumn(
            "digest",
            F.when(F.col("para").isNotNull(), content_digest("para"))
            .otherwise(md5_long(F.concat(F.lit("empty:"),
                                         F.col("doc_id").cast("string")))),
        ).withColumn("_rk", F.row_number().over(w))
        return (
            ranked.groupBy("doc_id")
            .agg(
                F.count("para").cast("long").alias("n_paragraphs"),
                F.sum(F.when((F.col("_rk") == 1)
                             & F.col("para").isNotNull(), 1)
                      .otherwise(0)).cast("long").alias("n_kept"),
                F.concat_ws(
                    "\n",
                    F.expr(
                        "transform(array_sort(collect_list(CASE WHEN "
                        "_rk = 1 AND para IS NOT NULL THEN "
                        "struct(pos, para) END)), x -> x.para)"
                    ),
                ).alias("text"),
            )
            .select("doc_id", "text", "n_paragraphs", "n_kept")
        )

    def _sig(df) -> tuple[int, int]:
        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    corpus = os.path.join(SCALING_DIR, f"skewpara_{n_docs}.parquet")
    if not os.path.exists(corpus):
        spark = _session(cores)
        banner = ("ACCEPT COOKIES this site uses cookies to "
                  "improve your browsing experience and our services")
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.when(
                    F.pmod(F.xxhash64("id"), F.lit(10))
                    < int(banner_frac * 10),
                    F.lit(banner),
                ).otherwise(
                    F.concat(F.lit("intro "), F.md5(
                        F.concat(F.lit("i:"), F.col("id"))))
                ),
                *[
                    F.concat(F.lit(f"para{s} "), F.md5(F.concat(
                        F.lit(f"{s}:"), F.col("id"))))
                    for s in range(5)
                ],
            ).alias("text"),
        ).repartition(cores * 4).write.parquet(corpus)
        spark.stop()

    best: dict[str, float] = {}
    sigs: dict[str, tuple[int, int]] = {}
    for _rep in range(SCALING_REPEATS):
        for shape in ("agg_nojoin", "window"):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            docs = spark.read.parquet(corpus)
            fn = (paragraph_dedup if shape == "agg_nojoin"
                  else _window_paragraph_dedup)
            # one untimed same-shape run first: at bench scale a cold
            # plan's codegen/AQE-replan overhead (~1 s/stage on this
            # host) would otherwise swamp the data work being compared
            fn(docs).count()
            t0 = time.perf_counter()
            sig = _sig(fn(docs))
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sigs.setdefault(shape, sig)
            assert sigs[shape] == sig, (shape, sigs[shape], sig)
            if shape not in best or sec < best[shape]:
                best[shape] = sec
    assert sigs["agg_nojoin"] == sigs["window"], sigs

    # scale-invariant skew evidence (wall-clock alone can't show a
    # 10^9-row straggler at bench size): rows landing in the hottest
    # digest shuffle partition for the window shape (every banner
    # occurrence in ONE partition, and AQE cannot split a window
    # partition) vs rows surviving map-side partial aggregation for
    # the agg shape (<= one row per digest per map task) — the
    # window's hot-partition share grows linearly with corpus size,
    # the agg's partial output per reduce bucket does not
    spark = _session(cores)
    docs = spark.read.parquet(corpus)
    nparts = max(2 * cores, 8)
    from onto_text_tag_spark.operators.dedup import content_digest

    paras = (
        docs.select(
            "doc_id",
            F.expr("filter(transform(split(text, '\\n'), "
                   "x -> trim(x)), x -> x != '')").alias("_p"))
        .select("doc_id", F.posexplode("_p").alias("pos", "para"))
        .select("doc_id", "pos",
                content_digest("para").alias("digest"),
                F.spark_partition_id().alias("_map"))
    )
    win_parts = [
        r["n"] for r in paras
        .groupBy(F.pmod(F.hash("digest"), F.lit(nparts)).alias("b"))
        .agg(F.count("*").alias("n")).collect()
    ]
    agg_parts = [
        r["n"] for r in paras
        .select("digest", "_map").distinct()
        .groupBy(F.pmod(F.hash("digest"), F.lit(nparts)).alias("b"))
        .agg(F.count("*").alias("n")).collect()
    ]
    spark.stop()

    def _skew(parts: list) -> float:
        parts = sorted(parts)
        med = parts[len(parts) // 2]
        return round(max(parts) / max(med, 1), 2)

    return {
        "job": "paragraph_dedup mega-banner skew A/B "
               "(min-struct aggregate operator vs removed window shape)",
        "cores": cores,
        "corpus_docs": n_docs,
        "banner_frac": banner_frac,
        "banner_occurrences": int(n_docs * banner_frac),
        "agg_sec": best["agg_nojoin"],
        "window_sec": best["window"],
        "window_over_agg_ratio": round(
            best["window"] / best["agg_nojoin"], 3),
        "docs_per_sec": round(n_docs / best["agg_nojoin"], 1),
        "window_shuffle_max_over_median": _skew(win_parts),
        "window_hot_partition_rows": max(win_parts),
        "agg_partial_max_over_median": _skew(agg_parts),
        "agg_hot_partition_rows": max(agg_parts),
        "outputs_identical": True,
        "rows": sigs["agg_nojoin"][0],
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_image_dedup_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of the perceptual image-dedup pipeline
    (operators/multimodal.py:image_dhash → Hamming-banded candidates →
    exact verify) over the SAME dup-planted synthetic image corpus —
    the north_rule two-cluster-size evidence for the multimodal dedup
    family.  Corpus: IMGDEDUP_DOCS real PNG payloads (deterministic
    gradients, encoded by the engine's own codec), 10% of which are
    one-pixel-perturbed copies of an earlier image (planted near-dups
    the pipeline must find).  Interleaved repeats min-of-N; outputs
    asserted identical across levels."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.multimodal import (
        image_near_duplicates,
    )

    n_imgs = int(os.environ.get("SPARK_GRAFT_IMGDEDUP_DOCS", "100000"))
    corpus = os.path.join(SCALING_DIR, f"imgcorpus_{n_imgs}.parquet")
    if not os.path.exists(corpus):
        from onto_text_tag_spark.functions import media_codecs as mc

        spark = _session(high)
        src = spark.range(n_imgs).select(F.col("id"))

        def gen(it):
            for batch in it:
                rows = []
                for i in batch["id"]:
                    i = int(i)
                    if i % 10 == 9:
                        # near-dup of image i-1: same gradient, one
                        # pixel nudged — must land within max_dist
                        base_seed, nudge = i - 1, True
                    else:
                        base_seed, nudge = i, False
                    h, w = 16 + base_seed % 8, 24 + base_seed % 8
                    yy, xx = np.mgrid[0:h, 0:w]
                    # pseudo-random per-image pixels via a QUADRATIC
                    # coordinate mix: anything linear in x keeps the
                    # horizontal-delta sign pattern nearly identical
                    # across seeds (only phase-shifted), so thousands
                    # of images share a dHash and the pair set
                    # quadratically explodes past the planted dups
                    # (measured: 120k pairs for 2k planted); the x·seed
                    # cross term of base² makes the gradient direction
                    # seed-dependent — 0 accidental full-hash dups in
                    # 5k images, candidates at birthday level only
                    chans = []
                    for c in range(3):
                        base = (
                            xx.astype(np.uint64) * np.uint64(0x9E3779B1)
                            + yy.astype(np.uint64) * np.uint64(0x85EBCA77)
                            + np.uint64((base_seed * 0xC2B2AE3D
                                         + c * 0x27D4EB2F) & 0xFFFFFFFF)
                        ) & np.uint64(0xFFFFFFFF)
                        v = (base * base + base) & np.uint64(0xFFFFFFFF)
                        chans.append(
                            ((v >> np.uint64(13)) % 256).astype(np.uint8))
                    px = np.stack(chans, axis=2)
                    if nudge:
                        px[2, 3] = (px[2, 3] + 5) % 256
                    rows.append((str(i), "image", "png",
                                 mc.encode_png(px)))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "kind", "format", "payload"])

        src.repartition(high * 4).mapInPandas(
            gen,
            schema="media_id string, kind string, format string, "
                   "payload binary",
        ).write.parquet(corpus)
        spark.stop()

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    n_planted = n_imgs // 10
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            media = spark.read.parquet(corpus)
            # untimed same-shape warmup on a slice: cold codegen/AQE
            # overhead across this pipeline's ~6 stages would
            # otherwise floor the high-core wall time (the
            # paragraph-skew bench lesson)
            image_near_duplicates(
                media.limit(2000), max_dist=10).count()
            dups = image_near_duplicates(media, max_dist=10)
            t0 = time.perf_counter()
            row = dups.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("id_a", "id_b", "hamming"))
                .alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "image_near_duplicates (dHash + Hamming-banded LSH + "
               "exact verify) over real PNG payloads",
        "corpus_images": n_imgs,
        "planted_near_dups": n_planted,
        "pairs_found": sigs[low][0],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_imgs_per_sec": round(n_imgs / best[low], 1),
        "high_imgs_per_sec": round(n_imgs / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_video_dedup_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of the perceptual video-dedup pipeline
    (operators/multimodal.py:video_dhash → Hamming-banded candidates →
    exact verify) over the SAME dup-planted synthetic AVI corpus — the
    north_rule two-cluster-size evidence for the video member of the
    multimodal dedup family.  Corpus: VIDDEDUP_DOCS real AVI payloads
    (uncompressed-DIB movi chunks, encoded by the engine's own codec;
    56-63 frames each, every frame a constant color so the TEMPORAL
    envelope carries the signal — enough frames that non-planted
    envelopes sit ~28 bits apart and accidental pairs stay at noise
    level), 10% of which are brightness-scaled
    (95%) copies of an earlier video — the envelope's frame-order is
    preserved up to rounding ties, so they land within max_dist.
    Interleaved repeats min-of-N; outputs asserted identical across
    levels."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.multimodal import (
        video_near_duplicates,
    )

    n_vids = int(os.environ.get("SPARK_GRAFT_VIDDEDUP_DOCS", "100000"))
    corpus = os.path.join(SCALING_DIR, f"vidcorpus_{n_vids}.parquet")
    if not os.path.exists(corpus):
        from onto_text_tag_spark.functions import media_codecs as mc

        spark = _session(high)
        src = spark.range(n_vids).select(F.col("id"))

        def gen(it):
            for batch in it:
                rows = []
                for i in batch["id"]:
                    i = int(i)
                    if i % 10 == 9:
                        base_seed, scale = i - 1, 95
                    else:
                        base_seed, scale = i, 100
                    nf = 56 + base_seed % 8
                    # per-frame constant color from a fully
                    # avalanched (seed, f) mix: the envelope sequence
                    # is pseudo-random per seed, so non-planted
                    # videos do not collide (0 accidental pairs
                    # measured at 3k; planted recall 300/300)
                    m32 = np.uint64(0xFFFFFFFF)
                    f_idx = np.arange(nf, dtype=np.uint64)
                    v = (
                        f_idx * np.uint64(0x9E3779B1)
                        + np.uint64((base_seed * 0xC2B2AE3D)
                                    & 0xFFFFFFFF)
                    ) & m32
                    # murmur3 finalizer: the plain quadratic mix the
                    # image corpus uses leaves cross-seed envelope
                    # correlations (~1.1k accidental pairs per 3k
                    # videos measured); full avalanche leaves ZERO
                    v ^= v >> np.uint64(16)
                    v = (v * np.uint64(0x85EBCA6B)) & m32
                    v ^= v >> np.uint64(13)
                    v = (v * np.uint64(0xC2B2AE35)) & m32
                    v ^= v >> np.uint64(16)
                    vals = (v % 256).astype(np.int64)
                    vals = (vals * scale // 100).astype(np.uint8)
                    # w=12 rows are 36 bytes — a multiple of 4, so the
                    # DIB encoder takes its no-padding fast path
                    frames = np.broadcast_to(
                        vals[:, None, None, None], (nf, 8, 12, 3)
                    )
                    rows.append((str(i), "video", "avi",
                                 mc.encode_avi(frames, fps=10)))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "kind", "format", "payload"])

        src.repartition(high * 4).mapInPandas(
            gen,
            schema="media_id string, kind string, format string, "
                   "payload binary",
        ).write.parquet(corpus)
        spark.stop()

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    n_planted = n_vids // 10
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            media = spark.read.parquet(corpus)
            # untimed same-shape warmup on a slice (cold codegen/AQE
            # would otherwise floor the high-core wall time)
            video_near_duplicates(
                media.limit(2000), max_dist=8).count()
            dups = video_near_duplicates(media, max_dist=8)
            t0 = time.perf_counter()
            row = dups.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("id_a", "id_b", "hamming"))
                .alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "video_near_duplicates (temporal luma-envelope dHash + "
               "Hamming-banded LSH + exact verify) over real AVI "
               "payloads",
        "corpus_videos": n_vids,
        "planted_near_dups": n_planted,
        "pairs_found": sigs[low][0],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_vids_per_sec": round(n_vids / best[low], 1),
        "high_vids_per_sec": round(n_vids / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_frame_dedup_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of the FRAME-granular video dedup
    pipeline (operators/multimodal.py:video_shared_frames — per-frame
    spatial dHash → Hamming-banded candidates over the frame store →
    exact verify → video-pair aggregation) over the SAME clip-planted
    footage corpus — the north_rule two-cluster-size evidence for the
    shared-footage operator.  Corpus: FRMDEDUP_DOCS real AVI payloads
    from the engine's own footage synthesizer (avalanche-noise frames;
    every 5th video re-embeds a 3-frame clip of an earlier one), so
    the expected pair set is exactly the planted n/5 clips.
    Interleaved repeats min-of-N; outputs asserted identical across
    levels."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.multimodal import (
        synthesize_footage_media,
        video_shared_frames,
    )

    n_vids = int(os.environ.get("SPARK_GRAFT_FRMDEDUP_DOCS", "50000"))
    corpus = os.path.join(SCALING_DIR, f"frmcorpus_{n_vids}.parquet")
    if not os.path.exists(corpus):
        spark = _session(high)
        docs = spark.range(n_vids).select(
            F.col("id").alias("doc_id"))
        synthesize_footage_media(
            docs.repartition(high * 4)
        ).write.parquet(corpus)
        spark.stop()

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    n_planted = n_vids // 5
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            media = spark.read.parquet(corpus)
            # untimed same-shape warmup on a slice
            video_shared_frames(
                media.limit(2000), max_dist=4, min_frames=2).count()
            dups = video_shared_frames(media, max_dist=4, min_frames=2)
            t0 = time.perf_counter()
            row = dups.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(
                    "id_a", "id_b", "n_shared_frames", "min_hamming"))
                .alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "video_shared_frames (per-frame dHash + Hamming-banded "
               "LSH over the frame store + exact verify + video-pair "
               "aggregation) over real AVI payloads",
        "corpus_videos": n_vids,
        "planted_clip_pairs": n_planted,
        "pairs_found": sigs[low][0],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_vids_per_sec": round(n_vids / best[low], 1),
        "high_vids_per_sec": round(n_vids / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_segment_dedup_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of the SEGMENT-granular audio dedup
    pipeline (operators/multimodal.py:audio_shared_segments —
    per-segment block-energy dHash → Hamming-banded candidates over
    the segment store → exact verify → audio-pair aggregation) over
    the SAME excerpt-planted WAV corpus — the north_rule
    two-cluster-size evidence for the shared-segment operator.
    Corpus: SEGDEDUP_DOCS real PCM WAV payloads of 4000
    murmur-avalanched samples each (5 × 800-sample segments;
    unrelated segments sit ~32 hash bits apart), 20% of which
    re-broadcast the first two segments of an earlier clip verbatim
    with a different tail — so the expected pair set is exactly the
    planted n/5 excerpts at n_shared_segments=2.  Interleaved repeats
    min-of-N; outputs asserted identical across levels."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.multimodal import (
        audio_shared_segments,
    )

    n_auds = int(os.environ.get("SPARK_GRAFT_SEGDEDUP_DOCS", "100000"))
    corpus = os.path.join(SCALING_DIR, f"segcorpus_{n_auds}.parquet")
    if not os.path.exists(corpus):
        from onto_text_tag_spark.functions import media_codecs as mc

        spark = _session(high)
        src = spark.range(n_auds).select(F.col("id"))
        m32 = np.uint64(0xFFFFFFFF)

        def mix(seed: int, n: int) -> "np.ndarray":
            v = (np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B1)
                 + np.uint64((seed * 0xC2B2AE3D) & 0xFFFFFFFF)) & m32
            v ^= v >> np.uint64(16)
            v = (v * np.uint64(0x85EBCA6B)) & m32
            v ^= v >> np.uint64(13)
            v = (v * np.uint64(0xC2B2AE35)) & m32
            v ^= v >> np.uint64(16)
            return (v % np.uint64(2003)).astype(np.int64) - 1001

        def gen(it):
            for batch in it:
                rows = []
                for i in batch["id"]:
                    i = int(i)
                    samples = mix(i, 4000)
                    if i % 5 == 4:
                        # re-broadcast: first two segments of clip
                        # i-2 verbatim, own tail
                        samples[:1600] = mix(i - 2, 4000)[:1600]
                    rows.append((str(i), "audio", "wav",
                                 mc.encode_wav(
                                     samples.astype(np.int16), 8000)))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "kind", "format", "payload"])

        src.repartition(high * 4).mapInPandas(
            gen,
            schema="media_id string, kind string, format string, "
                   "payload binary",
        ).write.parquet(corpus)
        spark.stop()

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    n_planted = n_auds // 5
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            media = spark.read.parquet(corpus)
            audio_shared_segments(
                media.limit(2000), max_dist=4, min_segments=2).count()
            dups = audio_shared_segments(
                media, max_dist=4, min_segments=2)
            t0 = time.perf_counter()
            row = dups.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(
                    "id_a", "id_b", "n_shared_segments",
                    "min_hamming")).alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "audio_shared_segments (per-segment block-energy dHash "
               "+ Hamming-banded LSH over the segment store + exact "
               "verify + audio-pair aggregation) over real WAV "
               "payloads",
        "corpus_audios": n_auds,
        "planted_excerpt_pairs": n_planted,
        "pairs_found": sigs[low][0],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_auds_per_sec": round(n_auds / best[low], 1),
        "high_auds_per_sec": round(n_auds / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_redirect_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of pointer-doubling redirect
    resolution (operators/weblinks.py:resolve_redirects) over the SAME
    synthetic crawl redirect map — the north_rule two-cluster-size
    evidence for the iterative-self-join operator family.

    Corpus: REDIRECT_DOCS urls in blocks of 1024 — an 8-url redirect
    loop, a 504-url chain feeding it, a 511-url chain to a terminal,
    one isolated terminal per block — synthesized as pure column
    expressions over ``spark.range`` (deterministic, no data files).
    Chains this long are why doubling matters: naive one-hop-per-round
    resolution needs 504 shuffle rounds; doubling needs
    ⌈log2(1024)⌉ = 10 (``max_doubling=11`` caps the operator's
    corpus-size-derived round count, the documented chain-bound knob).
    Interleaved repeats min-of-N; outputs asserted identical across
    levels via full-result count + hash."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.weblinks import resolve_redirects

    n_urls = int(os.environ.get("SPARK_GRAFT_REDIRECT_DOCS", "1000000"))

    def corpus(spark, cores):
        i = F.col("id")
        k = i % 1024
        g = i - k

        def url_of(idx):
            return F.concat(
                F.lit("https://h"), (idx % 97).cast("string"),
                F.lit(".example.com/r/"), idx.cast("string"),
            )

        dst_id = (
            F.when(k <= 7, g + (k + 1) % 8)
            .when((k >= 8) & (k <= 511), i - 1)
            .when(k >= 513, i - 1)
        )
        ids = spark.range(n_urls).repartition(cores * 4)
        edges = ids.where(dst_id.isNotNull()).select(
            url_of(i).alias("src_url"), url_of(dst_id).alias("dst_url")
        )
        nodes = ids.select(url_of(i).alias("url"))
        return edges, nodes

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            # untimed same-shape warmup on a slice: the ~12 join
            # rounds each trigger codegen/AQE planning whose cold
            # cost would otherwise floor the high-core wall time
            we, wn = corpus(spark, cores)
            resolve_redirects(
                we.limit(4000), nodes=wn.limit(4000), max_doubling=11
            ).count()
            edges, nodes = corpus(spark, cores)
            t0 = time.perf_counter()
            out = resolve_redirects(edges, nodes=nodes, max_doubling=11)
            row = out.select(
                F.count("*").alias("n"),
                F.sum(F.col("is_loop").cast("long")).alias("loops"),
                F.bit_xor(
                    F.xxhash64("url", "resolved_url", "is_loop")
                ).alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["loops"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "resolve_redirects (pointer-doubling chain resolution "
               "+ loop detection, 504-hop chains in 11 join rounds)",
        "corpus_urls": n_urls,
        "loop_urls": sigs[low][1],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_urls_per_sec": round(n_urls / best[low], 1),
        "high_urls_per_sec": round(n_urls / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def _session_cluster(execs: int, mem_mb: int = 3072):
    """A ``local-cluster[execs, 1, mem]`` session: real executor JVM
    PROCESSES, one core each — the honest stand-in for an N-executor
    cluster.  Needed because this microVM serializes java.util.regex
    across JVM THREADS: a literal-space ``split`` scales 3.4x from
    local[2] to local[8], the identical pipeline with the tokenizer
    regex ``[^a-z0-9']+`` ANTI-scales (25.7 s -> 27.5 s), and the
    same regex pipeline under 2 vs 8 executor processes scales 2.3x
    (measured, this host).  Cluster executors are processes, so
    thread-level regex benching under-measures regex-heavy operators
    here."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder
        .master(f"local-cluster[{execs},1,{mem_mb}]")
        .appName(f"bench-lc{execs}")
        .config("spark.sql.shuffle.partitions", str(max(2 * execs, 8)))
        .config("spark.executor.memory", f"{mem_mb}m")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def run_ccnet_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-CLUSTER-SIZE run of CCNet perplexity-tier bucketing
    (operators/textstats.py:perplexity_buckets, ``discrete`` mode) —
    the north_rule N-vs-4N-executors evidence for the corpus-quality
    partitioning family, on the DETERMINISTIC scale path: the exact
    rank path would sort each language inside one window partition
    (a language IS the corpus at web scale), while the discrete path's
    only window runs over the bounded (lang, rounded-score) count
    relation, so outputs can be asserted bit-identical across levels.

    Runs under ``local-cluster`` executor PROCESSES (N=low vs 4N=high
    single-core executors), not local[N] threads — see
    ``_session_cluster`` for the measured thread-regex pathology that
    makes thread-mode numbers dishonest for tokenizer-regex-bound
    operators on this host.

    Corpus: CCNET_DOCS 20-word docs over 4 languages, 70% of word
    draws from a 50-word common pool and 30% from a 5000-word tail
    (pure column expressions over ``spark.range`` — deterministic,
    no data files), so per-doc mean log-loss genuinely spreads."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    n_docs = int(os.environ.get("SPARK_GRAFT_CCNET_DOCS", "2000000"))

    def corpus(spark, cores):
        word = (
            "transform(sequence(0, 19), i -> concat('w', CAST("
            "CASE WHEN pmod(xxhash64(id * 20 + i), 10) < 7 "
            "THEN pmod(xxhash64(id * 20 + i + 1000000007), 50) "
            "ELSE 500 + pmod(xxhash64(id * 20 + i + 2000000011), 5000) "
            "END AS STRING)))"
        )
        return (
            spark.range(n_docs).repartition(cores * 4)
            .select(
                F.col("id").alias("doc_id"),
                F.element_at(
                    F.array(F.lit("en"), F.lit("de"),
                            F.lit("fr"), F.lit("es")),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("lang"),
                F.array_join(F.expr(word), " ").alias("text"),
            )
        )

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session_cluster(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            perplexity_buckets(
                corpus(spark, cores).limit(4000), method="discrete"
            ).count()  # untimed same-shape warmup
            docs = corpus(spark, cores)
            t0 = time.perf_counter()
            out = perplexity_buckets(docs, method="discrete")
            row = out.select(
                F.count("*").alias("n"),
                F.sum(
                    F.when(F.col("ppl_bucket") == "head", 1).otherwise(0)
                ).alias("heads"),
                F.bit_xor(
                    F.xxhash64("doc_id", "lang", "ppl_bucket",
                               "mean_logloss")
                ).alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["heads"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "perplexity_buckets discrete (CCNet tier partitioning, "
               "deterministic value-threshold scale path)",
        "corpus_docs": n_docs,
        "head_docs": sigs[low][1],
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_docs_per_sec": round(n_docs / best[low], 1),
        "high_docs_per_sec": round(n_docs / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "host_capacity_units_per_sec": {
            str(k): v for k, v in _host_capacity().items()
        },
    }


def run_ivfpq_scaling(low: int = 2, high: int = 8) -> dict:
    """Two-parallelism-level run of the composed IVFPQ serving operator
    over the SAME 200k clustered ANN corpus — the north_rule
    two-cluster-size evidence for the ANN serving path.  Codebooks and
    coarse centroids are trained ONCE (driver-side artifacts, identical
    at both levels — an index is trained once and served many times);
    the measured work is the serving plan: one store scan computing
    cell+codes, ADC in probed cells, shortlist, exact re-rank.
    Interleaved repeats min-of-N; outputs asserted identical."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.similarity import (
        ivfpq_topk,
        kmeans_centroids,
        pq_trained_codebooks,
    )

    n_vecs, dim, n_planted, noise = 200_000, 32, 96, 0.9
    n_queries, k, n_centroids = 50, 10, 64
    path = os.path.join(
        SCALING_DIR,
        f"ann_bench_{n_vecs}x{dim}_c{n_planted}_n{noise}.parquet",
    )
    if not os.path.exists(path):
        raise SystemExit("run --bench-pq first to build the ANN corpus")

    spark = _session(high)
    emb = spark.read.parquet(path)
    cbs = pq_trained_codebooks(emb, m=16, ksub=16, iterations=5)
    cents = kmeans_centroids(emb, k=n_centroids, iterations=5)
    spark.stop()

    best: dict[int, float] = {}
    sigs: dict[int, tuple] = {}
    for _rep in range(SCALING_REPEATS):
        for cores in (low, high):  # interleaved
            spark = _session(cores)
            spark.range(1_000_000).select(
                F.bit_xor(F.xxhash64("id"))).collect()
            emb = spark.read.parquet(path)
            queries = emb.where(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"), "embedding")
            # untimed same-shape warmup on a slice: the m=16 x ksub=16
            # encode fold is a large codegen unit whose compile cost
            # would otherwise floor the high-core wall time
            ivfpq_topk(
                emb.limit(5000), queries, cbs, k=k,
                num_centroids=n_centroids, nprobe=4,
                shortlist=10 * k, centroids=cents).count()
            res = ivfpq_topk(
                emb, queries, cbs, k=k, num_centroids=n_centroids,
                nprobe=4, shortlist=10 * k, centroids=cents)
            t0 = time.perf_counter()
            row = res.select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(
                    "query_id", "cand_id", "rank")).alias("h"),
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            spark.stop()
            sig = (row["n"], row["h"])
            sigs.setdefault(cores, sig)
            assert sigs[cores] == sig, (cores, sigs[cores], sig)
            if cores not in best or sec < best[cores]:
                best[cores] = sec
    assert sigs[low] == sigs[high], sigs
    eff = (best[low] / best[high]) / (high / low)
    return {
        "job": "ivfpq_topk serving plan (trained coarse centroids + "
               "codebooks, nprobe=4, 10k shortlist, exact re-rank)",
        "n_vecs": n_vecs,
        "n_queries": n_queries,
        "k": k,
        "low_cores": low,
        "high_cores": high,
        "low_sec": best[low],
        "high_sec": best[high],
        "low_vecs_per_sec": round(n_vecs / best[low], 1),
        "high_vecs_per_sec": round(n_vecs / best[high], 1),
        "speedup": round(best[low] / best[high], 2),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "result_rows": sigs[low][0],
        "host_capacity_units_per_sec": {
            str(k2): v for k2, v in _host_capacity().items()
        },
    }


def run_ann_bench(
    cores: int = 8,
    n_vecs: int = 200_000,
    dim: int = 32,
    n_planted: int = 96,
    n_centroids: int = 64,
    n_queries: int = 50,
    k: int = 10,
    noise: float = 0.9,
) -> dict:
    """ANN quality/latency curve: recall@k and wall time of the IVF
    index (trained spherical-k-means centroids) vs exact brute force,
    across nprobe settings — the acceptance evidence an approximate
    index needs before it replaces the exact path at scale.

    Corpus: deterministic CLUSTERED embeddings (n_planted centers +
    per-vector noise, xxhash64-seeded, L2-normalized) — a uniform
    random corpus would make every nprobe look equally bad; planted
    structure is the regime IVF exists for.  ``noise`` comparable to
    the signal plus MORE planted clusters than trained centroids keeps
    cell boundaries honest: with clean well-separated clusters and a
    matching centroid count, nprobe=1 already hits recall 1.0 and the
    curve says nothing (measured — that easy configuration is exactly
    what this bench must NOT be).
    """
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    spark = _session(cores)
    path = os.path.join(
        SCALING_DIR,
        f"ann_bench_{n_vecs}x{dim}_c{n_planted}_n{noise}.parquet",
    )
    if not os.path.exists(path):
        raw = spark.range(0, n_vecs, 1, cores * 4).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_planted).alias("_cl"),
        ).select(
            "vec_id",
            F.expr(
                f"transform(sequence(0, {dim - 1}), p -> "
                "  (pmod(xxhash64(_cl, p), 1000) / 1000.0 - 0.5)"
                f"  + {noise} * (pmod(xxhash64(vec_id, p, 7), 1000)"
                "            / 1000.0 - 0.5))"
            ).alias("_raw"),
        )
        (
            raw.select(
                "vec_id",
                F.expr(
                    "transform(_raw, x -> cast(x / sqrt(aggregate(_raw, "
                    "0.0d, (a, v) -> a + v * v)) AS float))"
                ).alias("embedding"),
            )
            .write.mode("overwrite").parquet(path)
        )
    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.perf_counter()
    exact = cosine_topk(emb, queries, k=k).select(
        "query_id", "cand_id").persist()
    n_exact = exact.count()
    exact_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cents = kmeans_centroids(emb, k=n_centroids, iterations=5)
    train_sec = round(time.perf_counter() - t0, 2)

    curve = []
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        approx = ivf_topk(
            emb, queries, k=k, num_centroids=n_centroids, nprobe=nprobe,
            centroids=cents,
        ).select("query_id", "cand_id", F.lit(1).alias("hit"))
        recall = (
            exact.join(approx, ["query_id", "cand_id"], "left")
            .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  / F.count("*")).alias("r"))
            .collect()[0]["r"]
        )
        curve.append({
            "nprobe": nprobe,
            "recall_at_k": round(float(recall), 4),
            "sec": round(time.perf_counter() - t0, 2),
        })
    return {
        "job": "bench.run_ann_bench (operators/similarity.py ivf_topk "
               "vs cosine_topk)",
        "cores": cores,
        "n_vecs": n_vecs,
        "dim": dim,
        "n_planted": n_planted,
        "n_centroids": n_centroids,
        "noise": noise,
        "n_queries": n_queries,
        "k": k,
        "exact_rows": n_exact,
        "exact_sec": exact_sec,
        "train_sec": train_sec,
        "curve": curve,
    }


def run_pq_bench(
    cores: int = 8,
    n_vecs: int = 200_000,
    dim: int = 32,
    n_planted: int = 96,
    n_queries: int = 50,
    k: int = 10,
    noise: float = 0.9,
    ksub: int = 16,
) -> dict:
    """Product-quantization quality/latency: recall@k and wall time of
    ADC top-k over PQ codes vs exact cosine brute force, across
    subspace counts m — the compression/recall trade curve an ANN store
    publishes before swapping raw vectors for codes.  Same deterministic
    clustered corpus as run_ann_bench (L2-normalized, so PQ's L2
    ranking and the exact cosine ranking are comparable); codebooks are
    the deterministic first-``ksub``-vectors default, so the whole run
    is seed-free and rerun-identical.  PQ's self-match is excluded from
    the approx set before recall (the exact baseline excludes self)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from onto_text_tag_spark.operators.similarity import (
        cosine_topk,
        pq_default_codebooks,
        pq_encode,
        pq_topk,
        pq_trained_codebooks,
    )

    spark = _session(cores)
    path = os.path.join(
        SCALING_DIR,
        f"ann_bench_{n_vecs}x{dim}_c{n_planted}_n{noise}.parquet",
    )
    if not os.path.exists(path):
        raw = spark.range(0, n_vecs, 1, cores * 4).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_planted).alias("_cl"),
        ).select(
            "vec_id",
            F.expr(
                f"transform(sequence(0, {dim - 1}), p -> "
                "  (pmod(xxhash64(_cl, p), 1000) / 1000.0 - 0.5)"
                f"  + {noise} * (pmod(xxhash64(vec_id, p, 7), 1000)"
                "            / 1000.0 - 0.5))"
            ).alias("_raw"),
        )
        (
            raw.select(
                "vec_id",
                F.expr(
                    "transform(_raw, x -> cast(x / sqrt(aggregate(_raw, "
                    "0.0d, (a, v) -> a + v * v)) AS float))"
                ).alias("embedding"),
            )
            .write.mode("overwrite").parquet(path)
        )
    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.perf_counter()
    exact = cosine_topk(emb, queries, k=k).select(
        "query_id", "cand_id").persist()
    n_exact = exact.count()
    exact_sec = round(time.perf_counter() - t0, 2)

    curve = []
    for mode, m in (("default", 4), ("default", 8), ("default", 16),
                    ("trained", 8), ("trained", 16)):
        t0 = time.perf_counter()
        if mode == "trained":
            cbs = pq_trained_codebooks(emb, m=m, ksub=ksub, iterations=5)
        else:
            cbs = pq_default_codebooks(emb, m=m, ksub=ksub)
        train_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        _force(pq_encode(emb, cbs))
        encode_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        approx = (
            pq_topk(emb, queries, cbs, k=k + 1)
            .where(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "_rk2",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy("rank")
                ),
            )
            .where(F.col("_rk2") <= k)
            .select(
                "query_id",
                F.col("vec_id").alias("cand_id"),
                F.lit(1).alias("hit"),
            )
        )
        recall = (
            exact.join(approx, ["query_id", "cand_id"], "left")
            .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  / F.count("*")).alias("r"))
            .collect()[0]["r"]
        )
        curve.append({
            "m": m,
            "mode": mode,
            "train_sec": train_sec,
            "compression": f"{dim * 4}B->{m}B",
            "encode_sec": encode_sec,
            "adc_sec": round(time.perf_counter() - t0, 2),
            "recall_at_k": round(float(recall), 4),
        })
    # production pattern: ADC generates a 10x-k candidate shortlist
    # from the compressed store, exact cosine re-ranks the shortlist —
    # recall of the final top-k is what a deployment ships
    from onto_text_tag_spark.operators.similarity import (
        cosine_similarity_col,
        pq_trained_codebooks,
    )

    t0 = time.perf_counter()
    cbs16 = pq_trained_codebooks(emb, m=16, ksub=ksub, iterations=5)
    shortlist = (
        pq_topk(emb, queries, cbs16, k=10 * k + 1)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    rer = (
        shortlist
        .join(emb.select(F.col("vec_id"),
                         F.col("embedding").alias("_cv")), "vec_id")
        .join(F.broadcast(queries.select(
            "query_id", F.col("embedding").alias("_qv"))), "query_id")
        .withColumn("score", cosine_similarity_col("_qv", "_cv"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            ),
        )
        .where(F.col("_rk") <= k)
        .select("query_id", F.col("vec_id").alias("cand_id"),
                F.lit(1).alias("hit"))
    )
    rerank_recall = (
        exact.join(rer, ["query_id", "cand_id"], "left")
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
              / F.count("*")).alias("r"))
        .collect()[0]["r"]
    )
    rerank = {
        "m": 16,
        "mode": "trained+rerank",
        "shortlist": 10 * k,
        "sec": round(time.perf_counter() - t0, 2),
        "recall_at_k": round(float(rerank_recall), 4),
    }
    spark.stop()
    return {
        "job": "bench.run_pq_bench (operators/similarity.py pq_topk "
               "ADC vs cosine_topk)",
        "rerank": rerank,
        "cores": cores,
        "n_vecs": n_vecs,
        "dim": dim,
        "n_planted": n_planted,
        "noise": noise,
        "n_queries": n_queries,
        "k": k,
        "ksub": ksub,
        "exact_rows": n_exact,
        "exact_sec": exact_sec,
        "curve": curve,
    }


def run_ivfpq_bench(
    cores: int = 8,
    n_vecs: int = 200_000,
    dim: int = 32,
    n_planted: int = 96,
    n_queries: int = 50,
    k: int = 10,
    noise: float = 0.9,
    ksub: int = 16,
    n_centroids: int = 64,
) -> dict:
    """IVFPQ deployment measurement (operators/similarity.py:
    ivfpq_topk): IVF-probe routing → ADC within probed cells → exact
    re-rank, vs the round-3 full-store ADC-shortlist→re-rank baseline
    (recall 0.924 published in BENCH/BASELINE.md) on the SAME 200k
    adversarial clustered corpus.  The composition must reach at least
    the baseline recall at lower cost than scanning every code —
    routing prunes the scored store by ~n_centroids/nprobe.

    Trained everything: spherical-k-means coarse centroids, per-
    subspace Lloyd's codebooks — the production configuration.
    Interleaved per-nprobe timings in one session (plans warmed by
    the baseline run), min-of-N not needed since all variants share
    the session and relative cost is the measurement."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from onto_text_tag_spark.operators.similarity import (
        cosine_similarity_col,
        cosine_topk,
        ivfpq_topk,
        kmeans_centroids,
        pq_topk,
        pq_trained_codebooks,
    )

    spark = _session(cores)
    path = os.path.join(
        SCALING_DIR,
        f"ann_bench_{n_vecs}x{dim}_c{n_planted}_n{noise}.parquet",
    )
    if not os.path.exists(path):
        raise SystemExit("run --bench-pq first to build the ANN corpus")
    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.perf_counter()
    exact = cosine_topk(emb, queries, k=k).select(
        "query_id", "cand_id").persist()
    n_exact = exact.count()
    exact_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cbs = pq_trained_codebooks(emb, m=16, ksub=ksub, iterations=5)
    train_pq_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    cents = kmeans_centroids(emb, k=n_centroids, iterations=5)
    train_ivf_sec = round(time.perf_counter() - t0, 2)

    def _recall(approx) -> float:
        r = (
            exact.join(approx, ["query_id", "cand_id"], "left")
            .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  / F.count("*")).alias("r"))
            .collect()[0]["r"]
        )
        return round(float(r), 4)

    # baseline: full-store ADC shortlist (10k) -> exact re-rank (the
    # round-3 deployment measurement, re-run here for an in-session
    # interleaved comparison)
    t0 = time.perf_counter()
    shortlist = (
        pq_topk(emb, queries, cbs, k=10 * k + 1)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    rer = (
        shortlist
        .join(emb.select(F.col("vec_id"),
                         F.col("embedding").alias("_cv")), "vec_id")
        .join(F.broadcast(queries.select(
            "query_id", F.col("embedding").alias("_qv"))), "query_id")
        .withColumn("score", cosine_similarity_col("_qv", "_cv"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            ),
        )
        .where(F.col("_rk") <= k)
        .select("query_id", F.col("vec_id").alias("cand_id"),
                F.lit(1).alias("hit"))
    )
    base_recall = _recall(rer)
    base_sec = round(time.perf_counter() - t0, 2)

    curve = []
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        approx = ivfpq_topk(
            emb, queries, cbs, k=k, num_centroids=n_centroids,
            nprobe=nprobe, shortlist=10 * k, centroids=cents,
        ).select("query_id", "cand_id", F.lit(1).alias("hit"))
        rec = _recall(approx)
        curve.append({
            "nprobe": nprobe,
            "store_frac_scored": round(nprobe / n_centroids, 4),
            "sec": round(time.perf_counter() - t0, 2),
            "recall_at_k": rec,
        })
    spark.stop()
    return {
        "job": "bench.run_ivfpq_bench (operators/similarity.py "
               "ivfpq_topk vs full-store ADC+rerank)",
        "cores": cores,
        "n_vecs": n_vecs,
        "dim": dim,
        "n_planted": n_planted,
        "noise": noise,
        "n_queries": n_queries,
        "k": k,
        "ksub": ksub,
        "n_centroids": n_centroids,
        "exact_rows": n_exact,
        "exact_sec": exact_sec,
        "train_pq_sec": train_pq_sec,
        "train_ivf_sec": train_ivf_sec,
        "fullstore_adc_rerank": {
            "sec": base_sec, "recall_at_k": base_recall},
        "ivfpq_curve": curve,
    }


def main() -> None:
    if "--pr" in sys.argv:
        rep = run_pr_eval()
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Triple P/R vs reference tags — {rep['job']}, "
                f"{rep['docs']} docs, local[{rep['cores']}]\n\n"
                f"precision {rep['precision']}, recall {rep['recall']} "
                f"(bar: >= 0.95); engine emitted {rep['engine_mentions']} "
                f"mentions, reference {rep['reference_mentions']}; exact "
                f"agreement: {rep['exact_agreement']}.  The same harness "
                f"gates every test run "
                f"(tests/test_precision_recall.py).\n"
            )
        print(json.dumps(rep))
        return
    if "--ann" in sys.argv:
        rep = run_ann_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## ANN quality curve — {rep['job']}, {rep['n_vecs']} "
                f"vectors × {rep['dim']} dims ({rep['n_planted']} "
                f"planted clusters, noise {rep['noise']}, "
                f"{rep['n_centroids']} trained centroids), "
                f"{rep['n_queries']} queries, "
                f"k={rep['k']}, local[{rep['cores']}]\n\n"
                f"| nprobe | recall@{rep['k']} | sec |\n|---|---|---|\n"
                + "".join(
                    f"| {c['nprobe']} | {c['recall_at_k']} "
                    f"| {c['sec']} |\n"
                    for c in rep["curve"]
                )
                + f"\nExact brute force: {rep['exact_sec']} s; k-means "
                f"training ({rep['n_centroids']} centroids, 5 Lloyd "
                f"iterations): {rep['train_sec']} s.\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-pq" in sys.argv:
        rep = run_pq_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## PQ quality curve — {rep['job']}, {rep['n_vecs']} "
                f"vectors × {rep['dim']} dims ({rep['n_planted']} "
                f"planted clusters, noise {rep['noise']}), "
                f"{rep['n_queries']} queries, k={rep['k']}, "
                f"ksub={rep['ksub']}, local[{rep['cores']}]\n\n"
                f"| m | codebooks | train sec | compression | "
                f"encode sec | ADC top-k sec | recall@{rep['k']} |\n"
                f"|---|---|---|---|---|---|---|\n"
                + "".join(
                    f"| {c['m']} | {c['mode']} | {c['train_sec']} | "
                    f"{c['compression']} | "
                    f"{c['encode_sec']} | {c['adc_sec']} | "
                    f"{c['recall_at_k']} |\n"
                    for c in rep["curve"]
                )
                + f"\nExact brute force: {rep['exact_sec']} s.  "
                "Deterministic first-ksub-vector codebooks (the "
                "SQL-replayable default); per-subspace k-means lifts "
                "recall further at identical ADC cost.\n"
                + (
                    f"\nDeployment form (ADC shortlist -> exact "
                    f"re-rank): m=16 trained codes generate a "
                    f"{rep['rerank']['shortlist']}-candidate shortlist, "
                    f"exact cosine re-ranks it — recall@{rep['k']} "
                    f"{rep['rerank']['recall_at_k']} in "
                    f"{rep['rerank']['sec']} s end-to-end (train + "
                    f"encode + ADC + re-rank), vs "
                    f"{rep['exact_sec']} s exact brute force over raw "
                    f"vectors.\n"
                )
            )
        print(json.dumps(rep))
        return
    if "--scaling-image-dedup" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_image_dedup_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_images']} images "
                f"({rep['planted_near_dups']} planted near-dups, "
                f"{rep['pairs_found']} pairs found)\n\n"
                f"| cores | sec | imgs/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_imgs_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_imgs_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (pair-set hash), interleaved "
                "min-of-N.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-ccnet" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_ccnet_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_docs']} docs across 4 languages "
                f"({rep['head_docs']} land in 'head')\n\n"
                f"| executors | sec | docs/sec |\n|---|---|---|\n"
                f"| local-cluster[{rep['low_cores']},1] | "
                f"{rep['low_sec']} | {rep['low_docs_per_sec']} |\n"
                f"| local-cluster[{rep['high_cores']},1] | "
                f"{rep['high_sec']} | {rep['high_docs_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']} "
                f"executors: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (full-assignment hash incl. scores), "
                "interleaved min-of-N — the determinism the sketch "
                "path cannot promise across cluster sizes, at exact "
                "thresholds.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-redirects" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_redirect_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_urls']} urls "
                f"({rep['loop_urls']} resolve into loops)\n\n"
                f"| cores | sec | urls/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_urls_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_urls_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (full-result hash incl. loop flags), "
                "interleaved min-of-N.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-video-dedup" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_video_dedup_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_videos']} videos "
                f"({rep['planted_near_dups']} planted near-dups, "
                f"{rep['pairs_found']} pairs found)\n\n"
                f"| cores | sec | vids/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_vids_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_vids_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (pair-set hash), interleaved "
                "min-of-N.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-frame-dedup" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_frame_dedup_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_videos']} videos "
                f"({rep['planted_clip_pairs']} planted clip pairs, "
                f"{rep['pairs_found']} pairs found)\n\n"
                f"| cores | sec | vids/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_vids_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_vids_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (video-pair-set hash incl. counts), "
                "interleaved min-of-N.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-segment-dedup" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_segment_dedup_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, "
                f"{rep['corpus_audios']} audios "
                f"({rep['planted_excerpt_pairs']} planted excerpt "
                f"pairs, {rep['pairs_found']} pairs found)\n\n"
                f"| cores | sec | auds/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_auds_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_auds_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (audio-pair-set hash incl. counts), "
                "interleaved min-of-N.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-ivfpq" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_ivfpq_scaling(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {rep['job']}, {rep['n_vecs']} "
                f"vectors, {rep['n_queries']} queries, k={rep['k']}\n\n"
                f"| cores | sec | store vecs/sec |\n|---|---|---|\n"
                f"| local[{rep['low_cores']}] | {rep['low_sec']} | "
                f"{rep['low_vecs_per_sec']} |\n"
                f"| local[{rep['high_cores']}] | {rep['high_sec']} | "
                f"{rep['high_vecs_per_sec']} |\n"
                f"\nspeedup {rep['low_cores']}->{rep['high_cores']}: "
                f"{rep['speedup']}x, efficiency "
                f"{rep['scaling_efficiency']}.  Outputs bit-identical "
                "at both levels (ranking hash), interleaved min-of-N; "
                "index artifacts (codebooks + coarse centroids) "
                "trained once and shared, as a served index is.\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-ivfpq" in sys.argv:
        rep = run_ivfpq_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            base = rep["fullstore_adc_rerank"]
            fh.write(
                f"\n## IVFPQ deployment curve — {rep['job']}, "
                f"{rep['n_vecs']} vectors × {rep['dim']} dims "
                f"({rep['n_planted']} planted clusters, noise "
                f"{rep['noise']}), {rep['n_queries']} queries, "
                f"k={rep['k']}, {rep['n_centroids']} trained coarse "
                f"centroids, m=16/ksub={rep['ksub']} trained "
                f"codebooks, local[{rep['cores']}]\n\n"
                f"| nprobe | store frac scored | sec | "
                f"recall@{rep['k']} |\n|---|---|---|---|\n"
                + "".join(
                    f"| {c['nprobe']} | {c['store_frac_scored']} | "
                    f"{c['sec']} | {c['recall_at_k']} |\n"
                    for c in rep["ivfpq_curve"]
                )
                + f"\nBaselines (same session, interleaved): exact "
                f"brute force {rep['exact_sec']} s; full-store "
                f"ADC-shortlist→re-rank {base['sec']} s at recall "
                f"{base['recall_at_k']}.  Training: PQ codebooks "
                f"{rep['train_pq_sec']} s, coarse k-means "
                f"{rep['train_ivf_sec']} s (both one-off index "
                "builds).  The operator is sim_ivfpq_topk "
                "(operators/similarity.py:ivfpq_topk), driver-oracled "
                "end-to-end.\n"
            )
        print(json.dumps(rep))
        return
    if "--skew" in sys.argv:
        rep = run_skew_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            t = rep["timings_sec"]
            fh.write(
                f"\n## Skew run — {rep['job']}, {rep['docs']} docs × "
                f"{rep['terms_per_doc']} terms from a {rep['vocab']}-term "
                f"vocabulary + {rep['head_terms']} boilerplate terms "
                f"planted in every doc, local[{rep['cores']}] "
                f"(min of 2 per shape)\n\n"
                f"| shape | sec |\n|---|---|\n"
                f"| co-occur, engine (joinless pair-explode, count(*) "
                f"map-side combine), skewed rel "
                f"| {t['cooccur_engine_skewed']} |\n"
                f"| co-occur, countDistinct weight plan (shared-exchange "
                f"triples form — no map-side combine), skewed rel "
                f"| {t['cooccur_countdistinct_skewed']} |\n"
                f"| co-occur, engine, clean rel (no boilerplate terms) "
                f"| {t['cooccur_engine_clean']} |\n"
                f"| co-occur, engine + max_doc_freq cap, skewed rel "
                f"| {t['cooccur_engine_dfcap']} |\n"
                f"| co-occur, textbook self-join on doc id, skewed rel "
                f"| {t['cooccur_naive_selfjoin']} |\n"
                f"| A1 index, collect_set parity shape, "
                f"{rep['index_rel_rows']}-row head relation "
                f"| {t['index_collect_set']} |\n"
                f"| A1 index, salted two-stage collect "
                f"(xxhash64(url) % {rep['cores'] * 4}), same relation "
                f"| {t['index_salted']} |\n"
                f"| A1 index, normalized countDistinct, same relation "
                f"| {t['index_normalized']} |\n"
                f"\nRelation {rep['rel_rows_skewed']} rows skewed / "
                f"{rep['rel_rows_clean']} clean; edges "
                f"{rep['edges_skewed']} skewed / {rep['edges_clean']} "
                f"clean.  Asserted: textbook self-join == engine shape "
                f"bit-for-bit; max_doc_freq cap drops exactly the planted "
                f"boilerplate terms (result == clean rel result); "
                f"collect_set, salted, and normalized index agree on doc "
                f"counts "
                f"(index relation: one df=100% term over "
                f"{rep['index_docs']} urls + one uniform tail term "
                f"per url).\n"
            )
        print(json.dumps(rep))
        return
    if "--compaction" in sys.argv:
        rep = run_compaction_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "4")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Compaction run — {rep['job']}, {rep['docs']} docs "
                f"absorbed as {rep['batches']} crawl batches, "
                f"local[{rep['cores']}]\n\n"
                f"| stage | rows | files before | files after | MB before | MB after |\n"
                f"|---|---|---|---|---|---|\n"
            )
            for st in rep["rows"]:
                fh.write(
                    f"| {st} | {rep['rows'][st]} | {rep['files_before'][st]} "
                    f"| {rep['files_after'][st]} | "
                    f"{rep['bytes_before'][st] / 1e6:.2f} | "
                    f"{rep['bytes_after'][st] / 1e6:.2f} |\n"
                )
            fh.write(
                f"\nFull-scan (hash-reduced, min of 3): "
                f"{rep['full_scan_sec_before']} s before -> "
                f"{rep['full_scan_sec_after']} s after compaction "
                f"({rep['scan_speedup']}x); compaction itself cost "
                f"{rep['compact_sec']} s.  Scan content hash identical "
                f"before/after (asserted).  Absorb drag as snapshots "
                f"fragment: first batches "
                f"{rep['absorb_sec_first_batches']} s vs last batches "
                f"{rep['absorb_sec_last_batches']} s.\n"
            )
        print(json.dumps(rep))
        return
    if "--bucketed" in sys.argv:
        rep = run_bucketed_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Bucketed run — {rep['job']}, {rep['rows']} rows over "
                f"{rep['urls']} urls, {rep['buckets']} buckets, "
                f"local[{rep['cores']}] (min of 3 per shape)\n\n"
                f"| shape | plain parquet | bucketed | speedup |\n"
                f"|---|---|---|---|\n"
                f"| write (once) | {rep['write_plain_sec']} s "
                f"| {rep['write_bucketed_sec']} s | — |\n"
                f"| co-occurrence edge build | {rep['cooccur_plain_sec']} s "
                f"| {rep['cooccur_bucketed_sec']} s "
                f"| {rep['cooccur_speedup']}x |\n"
                f"| per-url distinct-term agg | {rep['url_agg_plain_sec']} s "
                f"| {rep['url_agg_bucketed_sec']} s "
                f"| {rep['url_agg_speedup']}x |\n"
                f"\nExchanges in the co-occur plan: "
                f"{rep['exchanges_cooccur_plain']} plain vs "
                f"{rep['exchanges_cooccur_bucketed']} bucketed (the "
                f"corpus-keyed groupBy(url) exchange is eliminated by the "
                f"bucketed scan; asserted from executed plans).  All "
                f"results hash-identical across layouts ({rep['edges']} "
                f"edge rows).  The bucketed write pays the corpus shuffle "
                f"the plain write skips — break-even after one url-keyed "
                f"downstream op; every re-read after that (incremental "
                f"anti-joins, retraction masks, dict-delta re-tags) is "
                f"pure savings.\n\n"
                f"Host capacity probe: "
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-graph" in sys.argv:
        rep = run_graph_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            t = rep["timings_sec"]
            fh.write(
                f"\n## Graph-metrics run — {rep['job']}, "
                f"{rep['distinct_edges']} distinct edges over ≤"
                f"{rep['nodes_drawn_from']} nodes (u² skew: degree max "
                f"{rep['degree_max']} / p99 {rep['degree_p99']} / p50 "
                f"{rep['degree_p50']}), local[{rep['cores']}] "
                f"(min of 2 for the triangle shapes)\n\n"
                f"| operator | sec |\n|---|---|\n"
                f"| degree_stats | {t['degree_stats']} |\n"
                f"| triangle_counts, (degree, id) orientation "
                f"| {t['triangles_degree_oriented']} |\n"
                f"| triangle_counts, id orientation "
                f"| {t['triangles_id_oriented']} |\n"
                f"| connected_components (distributed contraction path) "
                f"| {t['connected_components']} |\n"
                f"| pagerank, 5 rounds | {t['pagerank_5_rounds']} |\n"
                f"| label_propagation, 4 rounds "
                f"({rep['lpa_nodes']} nodes) "
                f"| {t['label_propagation_4_rounds']} |\n"
                f"| adamic_adar, bridge cap 64 "
                f"({rep['adamic_adar_candidates']} candidate pairs) "
                f"| {t['adamic_adar_cap64']} |\n"
                f"| k_core, k={rep['k_core_k']} "
                f"({rep['k_core_nodes']} core nodes) "
                f"| {t['k_core_k' + str(rep['k_core_k'])]} |\n"
                f"| hits, 6 rounds ({rep['hits_nodes']} nodes) "
                f"| {t['hits_6_rounds']} |\n"
                f"\nWedge candidates Σ C(outdeg, 2): "
                f"{rep['wedges_id_oriented']} id-oriented vs "
                f"{rep['wedges_degree_oriented']} degree-oriented "
                f"({rep['wedges_id_oriented'] / max(rep['wedges_degree_oriented'], 1):.1f}x "
                f"reduction — the O(m^1.5) bound at work); per-node "
                f"triangle results asserted hash-identical across "
                f"orientations ({rep['triangle_nodes']} nodes in ≥1 "
                f"triangle).\n\n"
                f"Host capacity probe: "
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-dict-size" in sys.argv:
        rep = run_dict_size_bench()
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Dictionary-size run — {rep['job']}, "
                f"{rep['docs']} docs × {rep['tokens_per_doc']} tokens, "
                f"{rep['vocab']}-word vocabulary (driver microbench: the "
                f"matcher runs identically inside every executor's "
                f"mapInPandas batch)\n\n"
                f"| surfaces | build s | pickle MB | unpickle s "
                f"| µs/doc | matches |\n|---|---|---|---|---|---|\n"
            )
            for n, r in rep["per_size"].items():
                fh.write(
                    f"| {n} | {r['build_sec']} | {r['pickle_mb']} "
                    f"| {r['unpickle_sec']} | {r['us_per_doc']} "
                    f"| {r['matches']} |\n"
                )
            fh.write(
                f"\nHost capacity probe: "
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-sketch" in sys.argv:
        rep = run_sketch_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Sketch-maintenance run — {rep['job']}, "
                f"{rep['mention_rows']} mention rows, {rep['vocab']}-term "
                f"vocabulary + 5 head terms, k={rep['k']}, "
                f"local[{rep['cores']}]\n\n"
                f"| path | sec |\n|---|---|\n"
                f"| seed sketch over base (paid once) "
                f"| {rep['seed_sketch_sec']} |\n"
                f"| sketch absorb of 10% delta (state + delta only) "
                f"| {rep['sketch_absorb_sec']} |\n"
                f"| exact countDistinct recompute (full relation) "
                f"| {rep['exact_recompute_sec']} |\n"
                f"\nAbsorb costs {rep['absorb_vs_recompute']}x the exact "
                f"recompute.  Estimate quality on the "
                f"{rep['n_estimated_terms']} terms with ≥k distinct docs: "
                f"mean |rel err| {rep['mean_abs_rel_err']}, max "
                f"{rep['max_rel_err']} (KMV theoretical std err "
                f"{rep['theory_stderr']}); {rep['n_exact_terms']} "
                f"below-k terms are exact by construction.\n\n"
                f"Host capacity probe: "
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-joined-tagging" in sys.argv:
        rep = run_joined_tagging_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Joined-tagging run — {rep['job']}, "
                f"{rep['docs']} docs × {rep['tokens_per_doc']} tokens, "
                f"{rep['dict_surfaces']}-surface dictionary, "
                f"local[{rep['cores']}]\n\n"
                f"| path | sec |\n|---|---|\n"
                f"| broadcast automaton (collect {rep['dict_collect_sec']} s"
                f" + tag) | {rep['broadcast_sec']} |\n"
                f"| shuffle join, contain resolver (pure JVM) "
                f"| {rep['joined_contain_sec']} |\n"
                f"| shuffle join, greedy resolver (exact W1) "
                f"| {rep['joined_greedy_sec']} |\n"
                f"\n{rep['mention_groups']} (url, curie) groups; greedy "
                f"output asserted hash-identical to the automaton before "
                f"timing was reported; contain "
                f"{'matches too' if rep['contain_hash_equal'] else 'diverges (keeps both sides of partial-overlap chains, ' + str(rep['contain_groups']) + ' groups)'}.\n\n"
                f"Host capacity probe: "
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-dict-update" in sys.argv:
        rep = run_dict_update_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "4")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            ua, ur = rep["update_add"], rep["update_remove"]
            fh.write(
                f"\n## Dictionary-update run — {rep['job']}, "
                f"{rep['docs']} docs, real {rep['termlist_surfaces']}"
                f"-surface termlist, delta {rep['delta_curies']} "
                f"new classes naming rare corpus strings "
                f"({rep['delta_surfaces']} surfaces, sample df 0.2-2%), "
                f"local[{rep['cores']}]\n\n"
                f"| direction | sec | affected docs | rebuild sec | "
                f"update/rebuild | stage_sec |\n|---|---|---|---|---|---|\n"
                f"| OLD→NEW (additions) | {ua['sec']} | "
                f"{ua['affected_docs']} | {rep['rebuild_new_sec']} | "
                f"{ua['ratio_vs_rebuild']} | "
                f"{json.dumps(ua['stage_sec'])} |\n"
                f"| NEW→OLD (removals) | {ur['sec']} | "
                f"{ur['affected_docs']} | {rep['rebuild_old_sec']} | "
                f"{ur['ratio_vs_rebuild']} | "
                f"{json.dumps(ur['stage_sec'])} |\n"
                f"\nEquality with the from-scratch rebuild: "
                f"{rep['equality']}.\n"
                f"\nHost capacity check (pure-Python busy-loop, units/sec "
                f"by process count):\n\n"
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-crawl-sink" in sys.argv:
        rep = run_crawl_sink_bench(
            cores=int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "4")))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Crawl-sink run — {rep['job']}, {rep['docs']} docs "
                f"in {rep['epochs']} drops, dup_frac={rep['dup_frac']}, "
                f"local[{rep['cores']}]\n\n"
                f"| epoch | docs in | sec | docs/sec |\n|---|---|---|---|\n"
            )
            for r in rep["epoch_rows"]:
                fh.write(f"| {r['epoch']} | {r['docs']} | {r['sec']} | "
                         f"{r['docs_per_sec']} |\n")
            fh.write(
                f"\ntotal {rep['total_sec']} s ({rep['docs_per_sec']} "
                f"docs/sec sustained); dedup gate admitted "
                f"{rep['survivors']} survivors, demoted "
                f"{rep['demoted_base']} base docs → {rep['kg_retracted']} "
                f"KG retractions; live corpus {rep['docs_live']} docs; "
                f"final KG: {rep['kg_mention_triples']} mention triples, "
                f"{rep['kg_edges']} co-occurrence edges.  Equality vs an "
                f"in-process batch rebuild over the live deduped corpus: "
                f"{rep['rebuild_equality']} in {rep['verify_sec']} s.\n"
                f"\nHost capacity check (pure-Python busy-loop, units/sec "
                f"by process count):\n\n"
                f"{json.dumps(rep['host_capacity_units_per_sec'])}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-pipeline" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "1"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        scaling = run_scaling_pipeline(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {scaling['job']}, "
                f"{scaling['corpus_docs']} docs, dup_frac="
                f"{scaling['dup_frac']}\n\n"
                f"| cores | sec | dedup sec | kg sec | docs in→out | "
                f"mentions | triples | triples/sec |\n"
                f"|---|---|---|---|---|---|---|---|\n"
            )
            for cores, r in scaling["results"].items():
                fh.write(
                    f"| local[{cores}] | {r['sec']} | {r['dedup_sec']} | "
                    f"{r['kg_sec']} | {r['docs_in']}→{r['docs_out']} | "
                    f"{r['mentions']} | {r['triples']} | "
                    f"{r['triples_per_sec']} |\n"
                )
            fh.write(
                f"\nspeedup {scaling['low_cores']}->{scaling['high_cores']} "
                f"cores: {scaling['speedup']}x; scaling efficiency: "
                f"{scaling['scaling_efficiency']}\n"
            )
            for cores, r in scaling["results"].items():
                fh.write(
                    f"\nlocal[{cores}] stage_sec — dedup: "
                    f"{json.dumps(r['dedup_stage_sec'])}; kg: "
                    f"{json.dumps(r['kg_stage_sec'])}\n"
                )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    if "--scaling-update" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "1"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        scaling = run_scaling_update(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {scaling['job']}, base "
                f"{scaling['base_docs']} docs + delta "
                f"{scaling['delta_docs']} docs, dup_frac="
                f"{scaling['dup_frac']}\n\n"
                f"| cores | update sec | new docs | docs/sec | "
                f"rebuild sec | absorb ratio | stage_sec |\n"
                f"|---|---|---|---|---|---|---|\n"
            )
            for cores, r in scaling["results"].items():
                st = ", ".join(
                    f"{k} {v}" for k, v in (r.get("stage_sec") or {}).items()
                )
                fh.write(
                    f"| local[{cores}] | {r['sec']} | {r['new_docs']} | "
                    f"{r['docs_per_sec']} | {r['rebuild_sec']} | "
                    f"{r['absorb_ratio']} | {st} |\n"
                )
            fh.write(
                f"\nspeedup {scaling['low_cores']}->{scaling['high_cores']} "
                f"cores: {scaling['speedup']}x; scaling efficiency: "
                f"{scaling['scaling_efficiency']}\n"
                f"\nabsorb ratio = incremental update sec / full-rebuild "
                f"sec over the union corpus at the same cores (outputs "
                f"asserted identical: triple totals match the rebuild).\n"
            )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    if "--bench-warc" in sys.argv:
        cores = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "8"))
        res = run_warc_bench(cores=cores)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## WARC-source bench — {res['job']}, {res['docs']} "
                f"docs, local[{res['cores']}] (min of 2, interleaved)\n\n"
                f"| input | sec | docs/sec | stage_sec |\n|---|---|---|---|\n"
            )
            for mode, r in res["results"].items():
                st = ", ".join(
                    f"{k} {v}" for k, v in (r["stage_sec"] or {}).items())
                fh.write(
                    f"| {mode} | {r['sec']} | {r['docs_per_sec']} | {st} |\n")
            fh.write(
                f"\ncontainer overhead (warc sec / from_html sec): "
                f"{res['container_overhead']}x; archive {res['warc_gz_mb']}"
                f" MB .warc.gz vs {res['parquet_mb']} MB parquet.  Both "
                f"runs asserted identical mentions ({res['mentions']}) and "
                f"triples ({res['triples']}) — the extractor byte-identity "
                f"contract holds from the raw crawl archive.\n"
            )
            cap = res["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(res))
        return
    if "--bench-store-shingles" in sys.argv:
        cores = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "4"))
        res = run_store_shingles_bench(cores=cores)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Store-shingles bench — {res['job']}, base "
                f"{res['base_docs']} docs + delta {res['delta_docs']} "
                f"docs, dup_frac={res['dup_frac']}, local[{res['cores']}]"
                f"\n\n"
                f"| verify path | base sec | sig store MB | absorb sec "
                f"| absorb stage_sec |\n|---|---|---|---|---|\n"
            )
            for variant, r in res["results"].items():
                st = ", ".join(
                    f"{k} {v}" for k, v in r["absorb_stage_sec"].items())
                fh.write(
                    f"| {variant} | {r['base_sec']} | "
                    f"{round(r['sig_store_bytes'] / (1 << 20), 1)} | "
                    f"{r['absorb_sec']} | {st} |\n"
                )
            fh.write(
                f"\nabsorb speedup (stored/text): {res['absorb_speedup']}x"
                f"; fingerprint-store size overhead: "
                f"{res['sig_store_overhead_x']}x "
                f"({res['sig_store_frac_of_corpus']} of corpus bytes).  "
                f"Stored-shingle absorbs pass NO --base-input: the base "
                f"corpus parquet is never re-read.  Live id sets of the "
                f"two absorb paths asserted hash-identical (DuckDB over "
                f"the stage parquet).\n"
            )
            cap = res["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(res))
        return
    if "--scaling-dedup-update" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "1"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        scaling = run_scaling_dedup_update(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {scaling['job']}, base "
                f"{scaling['base_docs']} docs + delta "
                f"{scaling['delta_docs']} docs, dup_frac="
                f"{scaling['dup_frac']}\n\n"
                f"| cores | update sec | new docs | docs/sec | survivors "
                f"| demoted base | rebuild sec | absorb ratio | "
                f"stage_sec |\n"
                f"|---|---|---|---|---|---|---|---|---|\n"
            )
            for cores, r in scaling["results"].items():
                st = ", ".join(
                    f"{k} {v}" for k, v in (r.get("stage_sec") or {}).items()
                )
                fh.write(
                    f"| local[{cores}] | {r['sec']} | {r['new_docs']} | "
                    f"{r['docs_per_sec']} | {r['survivors']} | "
                    f"{r['demoted_base']} | {r['rebuild_sec']} | "
                    f"{r['absorb_ratio']} | {st} |\n"
                )
            fh.write(
                f"\nspeedup {scaling['low_cores']}->{scaling['high_cores']} "
                f"cores: {scaling['speedup']}x; scaling efficiency: "
                f"{scaling['scaling_efficiency']}\n"
                f"\nabsorb ratio = incremental dedup-update sec / full "
                f"dedup_corpus rebuild sec over the union corpus at the "
                f"same cores.  The incremental root's live id set "
                f"(deduped ∖ demoted) is asserted HASH-identical to the "
                f"rebuild's output, via DuckDB over the stage parquet.\n"
            )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    if "--bench-substring" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        rep = run_substring_bench(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            c = rep["content"]
            fh.write(
                f"\n## Substring-dedup run — {rep['job']}, "
                f"{rep['corpus_docs']} docs, dup_frac={rep['dup_frac']}, "
                f"span w={rep['span_w']} tokens\n\n"
                f"| cores | paragraph_dedup sec | docs/sec | "
                f"ngram_spans sec | docs/sec |\n|---|---|---|---|---|\n"
            )
            for cores, r in rep["results"].items():
                fh.write(
                    f"| local[{cores}] | {r['para_sec']} | "
                    f"{r['para_docs_per_sec']} | {r['span_sec']} | "
                    f"{r['span_docs_per_sec']} |\n"
                )
            fh.write(
                f"\nparagraph_dedup speedup {rep['low_cores']}->"
                f"{rep['high_cores']}: {rep['para_speedup']}x, "
                f"efficiency {rep['para_scaling_efficiency']}; "
                f"ngram_spans speedup: {rep['span_speedup']}x, "
                f"efficiency {rep['span_scaling_efficiency']}\n"
                f"\nContent: {c['n_paragraphs']} paragraphs, "
                f"{c['paragraphs_kept']} kept (drop frac "
                f"{c['paragraph_drop_frac']}); {c['n_tokens']} tokens, "
                f"{c['dup_tokens']} inside cross-doc duplicated "
                f"{rep['span_w']}-token spans (frac "
                f"{c['dup_token_frac']}).  Outputs bit-identical at "
                f"both levels (row hashes via _force).\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--bench-paragraph-skew" in sys.argv:
        cores = int(os.environ.get("SPARK_GRAFT_SKEWPARA_CORES", "8"))
        rep = run_paragraph_skew_bench(cores=cores)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Paragraph-dedup mega-banner skew A/B — "
                f"{rep['corpus_docs']} docs, banner in "
                f"{int(rep['banner_frac'] * 100)}% "
                f"({rep['banner_occurrences']} occurrences of one "
                f"digest), local[{rep['cores']}]\n\n"
                f"| shape | sec | docs/sec |\n|---|---|---|\n"
                f"| min-struct agg (shipped operator) | {rep['agg_sec']} "
                f"| {rep['docs_per_sec']} |\n"
                f"| digest window (removed round-4) | {rep['window_sec']} "
                f"| {round(rep['corpus_docs'] / rep['window_sec'], 1)} "
                f"|\n\nwindow/agg ratio {rep['window_over_agg_ratio']}x; "
                "outputs bit-identical (full-column xxhash64), "
                "interleaved min-of-N, same-shape warm-up run per "
                "session (cold codegen/AQE overhead otherwise swamps "
                "the toy-scale data work).\n\n"
                "Scale-invariant skew evidence (rows per digest "
                "shuffle partition, max/median): window shape "
                f"{rep['window_shuffle_max_over_median']}x (hot "
                f"partition {rep['window_hot_partition_rows']} rows — "
                "every banner occurrence lands in ONE window "
                "partition, AQE cannot split it, and the hot share "
                "grows linearly with corpus size) vs min_by aggregate "
                f"{rep['agg_partial_max_over_median']}x after map-side "
                f"partials (hot partition "
                f"{rep['agg_hot_partition_rows']} rows — bounded at "
                "one row per digest per map task regardless of how "
                "often the banner repeats).\n"
            )
            cap = rep["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, "
                f"units/sec by process count):\n\n{json.dumps(cap)}\n"
            )
        print(json.dumps(rep))
        return
    if "--scaling-dedup" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        scaling = run_scaling_dedup(low=low, high=high)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {scaling['job']}, "
                f"{scaling['corpus_docs']} docs, dup_frac="
                f"{scaling['dup_frac']}, shingles: "
                f"{scaling['shingle_mode']}\n\n"
                f"| cores | sec | candidates | verified | docs out | docs/sec | stage_sec |\n"
                f"|---|---|---|---|---|---|---|\n"
            )
            for cores, r in scaling["results"].items():
                st = ", ".join(
                    f"{k} {v}" for k, v in (r.get("stage_sec") or {}).items()
                )
                fh.write(
                    f"| local[{cores}] | {r['sec']} | {r['candidates']} | "
                    f"{r['verified']} | {r['docs_out']} | {r['docs_per_sec']} | {st} |\n"
                )
            fh.write(
                f"\nspeedup {scaling['low_cores']}->{scaling['high_cores']} cores: "
                f"{scaling['speedup']}x; scaling efficiency: "
                f"{scaling['scaling_efficiency']}\n"
                f"\nPlanted-dup recall: dropped {scaling['dropped_docs']} "
                f"of {scaling['planted_dups']} planted duplicates = "
                f"{scaling['planted_dup_recall']} (planted membership is "
                f"a pure function of (seed, id) — corpus._is_planted_dup)"
                f".\n"
            )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    if "--scaling-weak" in sys.argv:
        scaling = run_scaling_weak()
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Weak-scaling run — {scaling['job']}\n\n"
                "| docs | cores | sec | triples | triples/sec | "
                "docs/sec/core | weak eff |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for docs, r in scaling["points"].items():
                fh.write(
                    f"| {docs} | local[{r['cores']}] | {r['sec']} | "
                    f"{r['triples']} | {r['triples_per_sec']} | "
                    f"{r['docs_per_sec_per_core']} | "
                    f"{r['weak_efficiency']} |\n"
                )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nWeak efficiency = T(250k@1) / T(point): wall-clock "
                "flatness as data grows with cores (ideal 1.0).  Host "
                "capacity probe alongside:\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    if "--scaling" in sys.argv or "--scaling-extract" in sys.argv:
        low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", str(low * 4)))
        scaling = run_scaling(
            low=low, high=high,
            from_html="--scaling-extract" in sys.argv,
        )
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as fh:
            fh.write(
                f"\n## Scaling run — {scaling['job']}, "
                f"{scaling['corpus_docs']} docs\n\n"
                f"| cores | sec | mentions | triples | triples/sec |\n"
                f"|---|---|---|---|---|\n"
            )
            for cores, r in scaling["results"].items():
                fh.write(
                    f"| local[{cores}] | {r['sec']} | {r['mentions']} | "
                    f"{r['triples']} | {r['triples_per_sec']} |\n"
                )
            fh.write(
                f"\nspeedup {scaling['low_cores']}->{scaling['high_cores']} cores: "
                f"{scaling['speedup']}x; scaling efficiency: "
                f"{scaling['scaling_efficiency']}\n"
            )
            cap = scaling["host_capacity_units_per_sec"]
            fh.write(
                "\nHost capacity check (pure-Python busy-loop, units/sec "
                "by process count — justifies the chosen core range; this "
                "sandbox's 32 vCPUs are hypervisor-oversubscribed and top "
                "out near 12x single-core):\n\n"
                f"{json.dumps(cap)}\n"
            )
        print(json.dumps(scaling))
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
