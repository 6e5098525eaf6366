"""BPE trainer + apply (operators/bpe.py): hand-derived merge
sequences, train/apply consistency, determinism, and the Spark
word-frequency + token-count stages."""

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_token_counts,
    train_bpe,
    word_frequencies,
)


def test_train_bpe_hand_derived():
    # corpus: "aaab" x5 — pair counts round 1: (a,a)=10, (a,b)=5,
    # (b,EOW)=5 → merge (a,a); round 2 symbols (aa,a,b,EOW):
    # (aa,a)=5, (a,b)=5, (b,EOW)=5 → tie, lexicographically greatest
    # pair wins → (b,EOW)
    merges = train_bpe([("aaab", 5)], n_merges=2)
    assert merges == [("a", "a"), ("b", EOW)]

    # min_pair_freq stops training on a singleton corpus
    assert train_bpe([("xy", 1)], n_merges=10, min_pair_freq=2) == []


def test_train_bpe_shared_subwords():
    # "low" and "lowest" share the "low" stem; with enough merges the
    # stem fuses into one symbol used by both words
    merges = train_bpe([("low", 50), ("lowest", 30)], n_merges=3)
    seg_low = bpe_segment("low", merges)
    seg_lowest = bpe_segment("lowest", merges)
    assert "".join(seg_low) == "low" + EOW
    assert "".join(seg_lowest) == "lowest" + EOW
    # the learned stem symbol drives both segmentations: "low" fuses
    # to a single (EOW-terminated) token, and "lowest" starts with the
    # fused stem
    assert seg_low == ["low" + EOW]
    assert seg_lowest[0] == "low"


def test_segment_roundtrip_and_rank_order():
    merges = train_bpe(
        [("banana", 10), ("bandana", 8), ("band", 6)], n_merges=8
    )
    for w in ("banana", "bandana", "band", "ban", "zzz", ""):
        seg = bpe_segment(w, merges)
        assert "".join(seg) == w + EOW
    # determinism: same input → same merges
    assert merges == train_bpe(
        [("banana", 10), ("bandana", 8), ("band", 6)], n_merges=8
    )


def test_word_frequencies_and_token_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "the lowest low, the low!"),
            (2, "LOWEST lows"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    wf = {r["word"]: r["n"] for r in word_frequencies(docs).collect()}
    assert wf == {"the": 2, "lowest": 2, "low": 2, "lows": 1}

    merges = train_bpe(sorted(wf.items()), n_merges=6)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_token_counts(docs, merges).collect()}
    # exact per-doc expectation from the pure-python segmenter
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    def expect(text):
        words = [w for w in re.split(r"[^a-z0-9']+", text.lower()) if w]
        return sum(len(bpe_segment(w, merges, ranks)) for w in words)

    assert got == {1: expect("the lowest low, the low!"),
                   2: expect("LOWEST lows"), 3: 0}
    # with zero merges every token is characters + EOW
    got0 = {r["doc_id"]: r["bpe_tokens"]
            for r in bpe_token_counts(docs, []).collect()}
    assert got0[2] == len("lowest") + 1 + len("lows") + 1


def test_word_frequencies_caps(spark):
    """min_count / top_n bound the relation before any driver collect —
    top_n is deterministic (n desc, word asc) and compiles to a
    distributed partial top-n, not a global sort."""
    from onto_text_tag_spark.operators.bpe import word_frequencies

    docs = spark.createDataFrame(
        [(1, "aa bb aa cc aa bb dd"), (2, "bb cc aa")],
        ["doc_id", "text"],
    )
    full = {r["word"]: r["n"] for r in word_frequencies(docs).collect()}
    assert full == {"aa": 4, "bb": 3, "cc": 2, "dd": 1}

    floored = {
        r["word"]: r["n"]
        for r in word_frequencies(docs, min_count=2).collect()
    }
    assert floored == {"aa": 4, "bb": 3, "cc": 2}

    top = [
        (r["word"], r["n"])
        for r in word_frequencies(docs, top_n=2).collect()
    ]
    assert sorted(top) == [("aa", 4), ("bb", 3)]

    plan = word_frequencies(docs, top_n=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_driver_corpus_learns_no_self_pairs(spark):
    """Exactness precondition of sql_text_bpe_tokens' chained-replace
    replay: no learned merge may be a self-pair (a == b) — odd chains
    of a self-pair make left-to-right pairing ambiguous for
    non-overlapping string replace.  Property of the driver corpus,
    pinned here at both driver scales."""
    import os

    from onto_text_tag_spark.operators.bpe import train_bpe, word_frequencies

    for sf in ("0.001", "0.01"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        docs = spark.read.parquet(path)
        wf = sorted(
            (r["word"], r["n"]) for r in word_frequencies(docs).collect()
        )
        merges = train_bpe(wf, n_merges=64)
        assert len(merges) == 64
        assert all(a != b for a, b in merges), sf


def test_packing_on_bpe_counts_pins_bin_boundaries(spark):
    """Integration: pack_sequences over bpe_token_counts — bin
    boundaries verified against hand-derived subword counts.  With
    merges [('l','o'), ('lo','w')]: 'low' -> [low, </w>] = 2 tokens,
    'lower' -> [low, e, r, </w>] = 4, 'xy' -> [x, y, </w>] = 3."""
    from onto_text_tag_spark.operators.bpe import bpe_token_counts
    from onto_text_tag_spark.operators.curation import pack_sequences

    merges = [("l", "o"), ("lo", "w")]
    rows = [
        (0, "s", "low low low"),          # 3*2 = 6 tokens
        (1, "s", "lower lower"),          # 2*4 = 8
        (2, "s", "xy"),                   # 3
        (3, "s", "low lower xy"),         # 2+4+3 = 9
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    counts = bpe_token_counts(docs, merges, keep_cols=("source",))
    got = {r["doc_id"]: r["bpe_tokens"] for r in counts.collect()}
    assert got == {0: 6, 1: 8, 2: 3, 3: 9}

    packed = {
        r["doc_id"]: (r["bin"], r["n_tokens"], r["bin_fill"])
        for r in pack_sequences(
            counts, budget=10, group_col="source",
            order_cols=("doc_id",), tokens_col="bpe_tokens",
        ).collect()
    }
    # next-fit, budget 10, order doc_id: cum = 6, 14, 17, 26
    # bin = (cum - tokens) // 10 -> 0, 0, 1, 1; fill = cum - bin*10
    assert packed == {0: (0, 6, 6), 1: (0, 8, 14 - 0),
                      2: (1, 3, 17 - 10), 3: (1, 9, 26 - 10)}


# ---------------------------------------------------------------------------
# WordPiece runtime apply — greedy longest-match, '##' continuations, [UNK]
# ---------------------------------------------------------------------------

def test_wordpiece_segment_count_semantics():
    from onto_text_tag_spark.operators.bpe import wordpiece_segment_count

    vf = {"un", "sort", "so", "run", "r"}
    vc = {"able", "ning", "t"}
    # greedy longest FIRST piece: 'sort' beats 'so' ('so' + '##rt'
    # would fail -> any shortest-first implementation returns UNK here)
    assert wordpiece_segment_count("sort", vf, vc) == (1, 0)
    # multi-piece with continuations: un + ##able
    assert wordpiece_segment_count("unable", vf, vc) == (2, 0)
    # run + ##ning
    assert wordpiece_segment_count("running", vf, vc) == (2, 0)
    # greedy does NOT backtrack: 'runt' -> 'run' leaves 't' which IS a
    # continuation -> (2, 0); but 'rust' -> 'r' + 'ust' has no
    # continuation for 'us...' -> whole word UNK even though no other
    # split exists either
    assert wordpiece_segment_count("runt", vf, vc) == (2, 0)
    assert wordpiece_segment_count("rust", vf, vc) == (1, 1)
    # unknown word -> single [UNK]
    assert wordpiece_segment_count("xyz", vf, vc) == (1, 1)
    # over max_chars -> [UNK] without scanning
    assert wordpiece_segment_count("a" * 33, {"a"}, {"a"}) == (1, 1)
    assert wordpiece_segment_count("a" * 32, {"a"}, {"a"}) == (32, 0)


def test_wordpiece_token_counts_on_spark(spark):
    from onto_text_tag_spark.operators.bpe import wordpiece_token_counts

    vocab = ["win", "##dow", "sort", "so", "w", "the"]
    docs = spark.createDataFrame(
        [
            (0, "window sort the"),   # 2 + 1 + 1 tokens, 0 unk
            (1, "window dup window"), # 2 + 1(UNK) + 2, 1 unk
            (2, ""),                  # empty -> 0 / 0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["wp_tokens"], r["unk_words"])
        for r in wordpiece_token_counts(docs, vocab).collect()
    }
    assert got == {0: (4, 0), 1: (5, 1), 2: (0, 0)}


def test_wordpiece_plan_single_python_stage(spark):
    from onto_text_tag_spark.operators.bpe import wordpiece_token_counts

    docs = spark.createDataFrame(
        [(0, "window sort")], "doc_id long, text string")
    plan = wordpiece_token_counts(docs, ["win", "##dow", "sort"])._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan  # one scan, no shuffle, no join


def test_wordpiece_keep_cols_and_word_counts(spark):
    from onto_text_tag_spark.operators.bpe import wordpiece_token_counts

    docs = spark.createDataFrame(
        [(0, "s1", "window sort"), (1, "s2", "dup")],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["source"], r["n_words"], r["wp_tokens"],
                      r["unk_words"])
        for r in wordpiece_token_counts(
            docs, ["win", "##dow", "sort"],
            keep_cols=("source",), with_word_counts=True,
        ).collect()
    }
    assert got == {0: ("s1", 2, 3, 0), 1: ("s2", 1, 1, 1)}
