"""Plan lint over the ENTIRE driver-contract surface.

Every `queries()` entry is planned against sf0.001 and its optimized
physical plan is checked for scale antipatterns:

* ``BatchEvalPython`` — a row-at-a-time Python UDF.  The input_hint
  mandates vectorized pandas/Arrow UDFs throughout ("no per-row
  Python"); any Python eval must appear as ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas.
* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` without an
  explicit opt-in — an unkeyed join that explodes at scale.  The
  brute-force similarity queries (sim_topk, emb_neardup, …) DO
  intentionally cross a small probe set against the corpus via a
  broadcast nested loop; those are allow-listed and must stay
  broadcast-side (never a shuffled cartesian).

This is the regression net behind PLANS.md: the audit documents the
plans, this test fails the build if a future change re-routes one
through an antipattern.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata absent: {SF_DIR}"
)

# Queries whose SEMANTICS are an all-pairs cross of a small (driver/
# broadcast-sized) side against the table — BroadcastNestedLoopJoin is
# the intended physical form for them.
BNLJ_ALLOWED = {
    "sim_topk",        # brute-force cosine baseline: 5 probes x corpus
    "sim_lsh_topk",    # LSH bucket join falls back to BNLJ on tiny probes
    "sim_ivf_topk",    # IVF probe x assigned cells
    "sim_ivf_trained", # same, trained centroids
    "emb_neardup",     # all-pairs near-dup on the small embeddings table
    "dedup_jaccard",   # pair verify over LSH candidates (tiny at sf0.001)
    "dedup_word_jaccard",
    "kg_assoc",        # 1-ROW broadcast scalar (corpus doc count) crossed
                       # onto the edge set: constant-time probe per row,
                       # kept in-plan so ReusedExchange shares the corpus
                       # shuffle (a collect would run it twice)
    "kg_salience",     # same 1-row broadcast-scalar shape (N for idf)
    "kg_class_neighbors",  # all-pairs cosine over the ontology-bounded
                           # class-centroid table (both sides tiny)
    "kg_graph_stats",  # 1-ROW broadcast scalar (graph-level totals)
                       # crossed onto the one-row summary assembly —
                       # the kg_assoc shape at even smaller scale
    "sim_topk_quantized",  # brute-force cosine baseline over the
                           # quantized store: tiny probe set x corpus,
                           # same intent as sim_topk
    "sim_ivf_recall",  # composes the sim_topk brute-force baseline
                       # (the exact side of the recall measurement)
    "curation_dsir",   # 1-ROW broadcast scalar (corpus gram totals)
                       # crossed onto the num_buckets-sized ratio table
                       # — the kg_assoc shape; both sides bounded by
                       # num_buckets regardless of corpus size
    "text_unigram_ll", # 1-ROW broadcast scalar (vocab total + distinct)
                       # crossed onto the vocabulary relation — same
                       # kg_assoc constant-probe shape
    "text_bigram_ll",  # same 1-ROW broadcast scalar (unigram total +
                       # vocab size for the Laplace interpolation term)
                       # crossed onto the bigram-TYPE relation; the
                       # corpus-sized work is keyed (bigram-count
                       # shuffle + (a,b) equi-join), only the constant
                       # scalar rides the BNLJ
    "curation_resample",  # composes curation_dsir (the 1-row gram-total
                          # broadcast scalar above); the resample itself
                          # adds only a scan + TakeOrderedAndProject
    "sim_pq_topk",     # PQ ADC: tiny probe-LUT set x compressed
                       # store — the sim_topk brute-force shape over
                       # codes instead of raw vectors
    "text_ccnet_buckets",  # inherits text_unigram_ll's 1-ROW broadcast
                           # scalar (vocab total + distinct for the
                           # Laplace LM) crossed onto the vocabulary
                           # relation; the tier assignment itself adds
                           # only windows / a percentile sketch
    "curation_nbquality",  # 1-ROW broadcast scalar (class priors /
                           # token totals) crossed onto the per-doc
                           # score relation — the kg_assoc
                           # constant-probe shape; the corpus-sized
                           # work is the broadcast equi-join on bucket
}


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as e

    out = {}
    for name, fn in e.queries().items():
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, (
        f"row-at-a-time Python UDF planned in: {offenders}; the "
        "input_hint requires Arrow-vectorized Python only"
    )


def test_no_unkeyed_cross_joins(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "CartesianProduct" in p
        or ("BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED)
    ]
    assert not offenders, (
        f"unkeyed cross join planned in: {offenders}; either key the "
        "join or allow-list it with a scale justification"
    )


def test_allowed_bnlj_stay_broadcast(plans):
    """The intentional all-pairs queries must cross via BROADCAST nested
    loop (small side shipped), never a shuffled CartesianProduct."""
    for name in BNLJ_ALLOWED:
        assert "CartesianProduct" not in plans[name], name
