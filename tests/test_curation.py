"""Training-data curation (operators/curation.py): gate order,
survivor-only dedup, deterministic sampling, audit rollup."""

from pyspark.sql import functions as F

from onto_text_tag_spark.operators.curation import (
    curate_corpus,
    curation_flags,
    curation_stats,
)
from onto_text_tag_spark.session import local_df

_EN_LONG = (
    "the cat and the dog sat on a mat with the bird and the fish "
    "near the tree by the house now"
)  # 22 ws tokens, plenty of en stopwords


def _docs(spark, rows):
    return local_df(spark, rows, "doc_id bigint, text string")


def test_gate_order_first_failure_wins(spark):
    low_q = "the " + " ".join(f"zqx{i}" for i in range(149))  # 150 toks, 1 stop
    docs = _docs(spark, [
        (1, "el la de que y en los del las por el la de que y en los del "
            "las por"),                       # spanish profile -> lang
        (2, "the cat sat on the mat"),        # 6 tokens -> too_short
        (3, low_q),                           # ratio 1/150 -> low_quality
        (4, _EN_LONG),                        # kept
        (5, _EN_LONG),                        # duplicate of 4
    ])
    got = {
        r["doc_id"]: r["reason"]
        for r in curation_flags(docs, sample_mod=1, sample_keep=1).collect()
    }
    assert got == {1: "lang", 2: "too_short", 3: "low_quality",
                   4: "kept", 5: "duplicate"}


def test_duplicate_keeps_min_id_and_sample_applies_after_dedup(spark):
    docs = _docs(spark, [(7, _EN_LONG), (3, _EN_LONG), (5, _EN_LONG)])
    got = {
        r["doc_id"]: r["reason"]
        for r in curation_flags(docs, sample_mod=1, sample_keep=1).collect()
    }
    assert got == {3: "kept", 7: "duplicate", 5: "duplicate"}
    # sample_keep=0: every survivor samples out, duplicates stay duplicates
    got0 = {
        r["doc_id"]: r["reason"]
        for r in curation_flags(docs, sample_mod=1, sample_keep=0).collect()
    }
    assert got0 == {3: "sampled_out", 7: "duplicate", 5: "duplicate"}


def test_normalized_digest_dedups_whitespace_case_variants(spark):
    docs = _docs(spark, [
        (1, _EN_LONG),
        (2, "  " + _EN_LONG.upper() + "  "),  # same normalized content
    ])
    got = {
        r["doc_id"]: r["reason"]
        for r in curation_flags(docs, sample_mod=1, sample_keep=1).collect()
    }
    assert got == {1: "kept", 2: "duplicate"}


def test_curate_corpus_and_stats_consistency(spark):
    docs = _docs(spark, [
        (1, _EN_LONG),
        (2, _EN_LONG),
        (3, "the cat sat"),
    ])
    kept = curate_corpus(docs, sample_mod=1, sample_keep=1)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert "reason" not in kept.columns and "digest" not in kept.columns
    stats = {
        r["reason"]: (r["n_docs"], r["ws_tokens"])
        for r in curation_stats(docs, sample_mod=1, sample_keep=1).collect()
    }
    assert stats["kept"] == (1, 22)
    assert stats["duplicate"] == (1, 22)
    assert stats["too_short"] == (1, 3)


def test_sampling_is_content_deterministic(spark):
    rows = [(i, f"the number {i} and the word of it is that for with was "
                "more filler tokens to cross twenty easily right here")
            for i in range(40)]
    docs = _docs(spark, rows)
    a = {r["doc_id"]: r["reason"] for r in curation_flags(docs).collect()}
    b = {r["doc_id"]: r["reason"] for r in curation_flags(docs).collect()}
    assert a == b
    sampled = [d for d, r in a.items() if r == "sampled_out"]
    keptn = [d for d, r in a.items() if r == "kept"]
    assert sampled and keptn  # default 8/10 split hits both sides


def test_flags_plan_single_scan_jvm_side(spark):
    docs = _docs(spark, [(1, _EN_LONG)])
    plan = curation_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
