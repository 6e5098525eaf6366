"""Training-data curation (operators/curation.py): gate order,
survivor-only dedup, deterministic sampling, audit rollup."""

import pytest
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


def test_stratified_sample_exact_and_deterministic(spark):
    from onto_text_tag_spark.operators.curation import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    docs = local_df(spark, rows, "doc_id bigint, lang string")
    # full / zero strata are exact
    kept = stratified_sample(docs, {"a": 1.0, "b": 0.0}).collect()
    assert sorted(r["doc_id"] for r in kept) == [i for i in range(200)
                                                 if i % 2 == 0]
    # half-rate: deterministic across runs, roughly half, monotone in frac
    h1 = {r["doc_id"] for r in
          stratified_sample(docs, {"a": 0.5, "b": 0.5}).collect()}
    h2 = {r["doc_id"] for r in
          stratified_sample(docs, {"a": 0.5, "b": 0.5}).collect()}
    assert h1 == h2
    assert 60 <= len(h1) <= 140
    h3 = {r["doc_id"] for r in
          stratified_sample(docs, {"a": 0.8, "b": 0.8}).collect()}
    assert h1 <= h3  # raising the rate only adds docs
    # unknown stratum falls to default_frac
    extra = local_df(spark, [(999, "zz")], "doc_id bigint, lang string")
    assert stratified_sample(extra, {"a": 1.0}).count() == 0
    assert stratified_sample(extra, {"a": 1.0}, default_frac=1.0).count() == 1


def test_boilerplate_ngrams_hand_values(spark):
    from onto_text_tag_spark.operators.textstats import boilerplate_ngrams

    docs = local_df(spark, [
        (1, "h1", "cookie banner text about cats"),
        (2, "h1", "cookie banner text about dogs"),
        (3, "h1", "an article про birds"),
        (4, "h2", "cookie banner text here"),
    ], "doc_id bigint, source string, text string")
    got = {
        (r["source"], r["gram"]): (r["doc_count"], r["df_frac"])
        for r in boilerplate_ngrams(
            docs, k=2, min_frac=0.6, group_col="source"
        ).collect()
    }
    # "cookie banner"/"banner text" in 2/3 h1 docs = 0.6667 >= 0.6;
    # h2 is its own group (1/1); "text about" also 2/3 in h1
    assert got[("h1", "cookie banner")] == (2, 0.6667)
    assert got[("h1", "banner text")] == (2, 0.6667)
    assert got[("h1", "text about")] == (2, 0.6667)
    assert ("h1", "about cats") not in got   # 1/3 below threshold
    assert got[("h2", "cookie banner")] == (1, 1.0)


def test_pack_sequences_streaming_bins(spark):
    from onto_text_tag_spark.operators.curation import pack_sequences

    rows = [
        ("g", 1, 0, 40), ("g", 1, 1, 40), ("g", 2, 0, 30),
        ("g", 3, 0, 100), ("h", 9, 0, 10),
    ]
    chunks = local_df(
        spark, rows,
        "source string, doc_id bigint, chunk_id bigint, n_tokens bigint",
    )
    got = {
        (r["source"], r["doc_id"], r["chunk_id"]): (r["bin"], r["bin_fill"])
        for r in pack_sequences(chunks, budget=100).collect()
    }
    # g cumsums: 40, 80, 110, 210 -> bins floor((c-t)/100): 0,0,0,1
    assert got[("g", 1, 0)] == (0, 40)
    assert got[("g", 1, 1)] == (0, 80)
    assert got[("g", 2, 0)] == (0, 110)   # straddles: fill 110 = budget+10
    assert got[("g", 3, 0)] == (1, 110)
    assert got[("h", 9, 0)] == (0, 10)
    # deterministic rerun
    again = {
        (r["source"], r["doc_id"], r["chunk_id"]): (r["bin"], r["bin_fill"])
        for r in pack_sequences(chunks, budget=100).collect()
    }
    assert got == again


def test_decontaminate_hand_values(spark):
    from onto_text_tag_spark.operators.curation import decontaminate
    from onto_text_tag_spark.session import local_df

    docs = local_df(
        spark,
        [
            ("d1", "the quick hash join runs a table scan now"),
            ("d2", "hash and join appear apart table then scan"),
            ("d3", "HASH JOIN uppercase, with punctuation!"),
            ("d4", ""),
        ],
        "doc_id string, text string",
    )
    out = {
        r.doc_id: (r.contaminated, r.n_contaminated_grams)
        for r in decontaminate(
            docs, ["hash join", "table scan", "never here"]
        ).collect()
    }
    assert out == {
        "d1": (True, 2),   # both grams present
        "d2": (False, 0),  # tokens present but never adjacent
        "d3": (True, 1),   # case/punctuation-insensitive tokenization
        "d4": (False, 0),
    }
    plan = decontaminate(docs, ["hash join"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "InPandas" not in plan


def test_redact_pii_hand_values(spark):
    from onto_text_tag_spark.operators.curation import redact_pii
    from onto_text_tag_spark.session import local_df

    docs = local_df(
        spark,
        [
            ("d1", "mail bob.smith+x@corp.example.co.uk or call "
                   "+44 20 7946 0958 host 192.168.0.1 done"),
            ("d2", "clean text with numbers 42 and 7 only"),
        ],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    d1 = rows["d1"]
    assert (d1.n_email, d1.n_ipv4, d1.n_phone) == (1, 1, 1)
    assert d1.text_redacted == (
        "mail <EMAIL> or call <PHONE> host <IP> done"
    )
    d2 = rows["d2"]
    assert (d2.n_email, d2.n_ipv4, d2.n_phone) == (0, 0, 0)
    assert d2.text_redacted == d2.text
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "InPandas" not in plan


def test_contaminated_gate_order_and_survivor_pool(spark):
    """The decontamination gate inside curation_flags: fires after
    quality gates (first-failure reporting pinned), and contaminated
    docs never occupy a dedup-survivor slot — identical contaminated
    mirrors BOTH report 'contaminated', neither is a 'duplicate' of the
    other."""
    from onto_text_tag_spark.operators.curation import curation_flags
    from onto_text_tag_spark.session import local_df

    base = ("the quick brown fox and the lazy dog walked over and "
            "around the big hill with a friend of a friend")
    docs = local_df(
        spark,
        [
            ("d1", base + " hash join inside"),   # contaminated
            ("d2", base + " hash join inside"),   # identical mirror
            ("d3", base + " nothing planted"),    # clean keeper
            ("d4", "of the hash join"),           # contaminated AND short
        ],
        "doc_id string, text string",
    )
    flags = {
        r.doc_id: r.reason
        for r in curation_flags(
            docs, min_ws_tokens=5, min_stopword_ratio=0.0,
            sample_mod=1, sample_keep=1,
            benchmark_ngrams=["hash join"],
        ).collect()
    }
    assert flags["d1"] == "contaminated"
    assert flags["d2"] == "contaminated"  # not 'duplicate'
    assert flags["d3"] == "kept"
    assert flags["d4"] == "too_short"  # first failing gate wins

    # without the benchmark set, nothing is contaminated and the mirror
    # pair resolves by dedup as before
    plain = {
        r.doc_id: r.reason
        for r in curation_flags(
            docs, min_ws_tokens=5, min_stopword_ratio=0.0,
            sample_mod=1, sample_keep=1,
        ).collect()
    }
    assert plain["d1"] == "kept" and plain["d2"] == "duplicate"


def test_assign_splits_exact_counts_and_determinism(spark):
    from onto_text_tag_spark.operators.curation import assign_splits
    from onto_text_tag_spark.session import local_df

    docs = local_df(
        spark,
        [(f"d{i}", "en" if i < 40 else "de") for i in range(46)],
        "doc_id string, lang string",
    )
    out = assign_splits(docs, strata_col="lang", test_n=5, valid_n=10)
    rows = [(r.doc_id, r.lang, r.split) for r in out.collect()]
    counts = {}
    for _d, lang, split in rows:
        counts[(lang, split)] = counts.get((lang, split), 0) + 1
    assert counts[("en", "test")] == 5
    assert counts[("en", "valid")] == 10
    assert counts[("en", "train")] == 25
    # a stratum smaller than test_n+valid_n: everything lands in
    # test/valid by rank, nothing in train
    assert counts[("de", "test")] == 5
    assert counts.get(("de", "train"), 0) == 0

    again = [
        (r.doc_id, r.lang, r.split)
        for r in assign_splits(
            docs, strata_col="lang", test_n=5, valid_n=10
        ).collect()
    ]
    assert sorted(rows) == sorted(again)  # rerun-identical

    # no strata: one global ranking
    g = assign_splits(docs, test_n=3, valid_n=0)
    assert [r.split for r in g.collect()].count("test") == 3


def test_dsir_importance_separates_target_domain(spark):
    """Hand-checkable DSIR math on a two-domain corpus: docs made of
    target-domain vocabulary must outscore off-domain docs, weights
    replay the Laplace-smoothed log-ratio exactly, and gram-less docs
    score 0.0."""
    import math

    from onto_text_tag_spark.operators.curation import dsir_importance

    rows = [
        (1, "alpha beta alpha beta", "t"),
        (2, "alpha beta", "t"),
        (3, "gamma delta gamma delta", "r"),
        (4, "alpha beta alpha", "r"),   # target-like raw doc
        (5, "", "r"),                   # gram-less
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    target = docs.where("source = 't'")
    k = 64
    out = {
        r["doc_id"]: r
        for r in dsir_importance(docs, target, num_buckets=k).collect()
    }
    assert len(out) == 5
    # n_grams = unigrams + bigrams
    assert out[1]["n_grams"] == 7 and out[5]["n_grams"] == 0
    assert out[5]["log_weight"] == 0.0
    # target-vocab docs above off-domain docs (absolute sign is not
    # meaningful at toy scale: Laplace smoothing with t_tot << r_tot
    # shifts every weight by a corpus-level constant)
    assert out[4]["log_weight"] > out[3]["log_weight"]
    assert out[1]["log_weight"] > out[3]["log_weight"]
    assert out[2]["log_weight"] > out[3]["log_weight"]

    # exact replay for doc 3 (all grams off-target): every gram bucket
    # has t_n = 0; raw counts per gram of doc 3 are its own occurrences
    # (no collisions assumed across this tiny vocab is NOT safe, so
    # recompute from first principles with the same hash)
    from onto_text_tag_spark.functions.hashing import md5_long

    gram_rows = (
        docs.selectExpr(
            "doc_id",
            "explode(concat("
            " filter(split(lower(text), '[^a-z0-9\\']+'), t -> t != ''),"
            " CASE WHEN size(filter(split(lower(text), '[^a-z0-9\\']+'),"
            "      t -> t != '')) >= 2 THEN transform(sequence(1,"
            "      size(filter(split(lower(text), '[^a-z0-9\\']+'),"
            "      t -> t != '')) - 1), i -> concat("
            "      element_at(filter(split(lower(text),"
            "      '[^a-z0-9\\']+'), t -> t != ''), i), ' ',"
            "      element_at(filter(split(lower(text),"
            "      '[^a-z0-9\\']+'), t -> t != ''), i + 1)))"
            " ELSE array() END)) AS g",
        )
        .select("doc_id", F.pmod(md5_long(F.col("g")), F.lit(k))
                .alias("bucket"))
        .collect()
    )
    t_ids = {1, 2}
    t_counts: dict = {}
    r_counts: dict = {}
    doc3 = []
    for r in gram_rows:
        r_counts[r["bucket"]] = r_counts.get(r["bucket"], 0) + 1
        if r["doc_id"] in t_ids:
            t_counts[r["bucket"]] = t_counts.get(r["bucket"], 0) + 1
        if r["doc_id"] == 3:
            doc3.append(r["bucket"])
    t_tot, r_tot = sum(t_counts.values()), sum(r_counts.values())
    expect = sum(
        math.log((t_counts.get(b, 0) + 1) / (t_tot + k))
        - math.log((r_counts[b] + 1) / (r_tot + k))
        for b in doc3
    )
    assert abs(out[3]["log_weight"] - round(expect, 4)) <= 1e-9


def test_nb_quality_score_first_principles(spark):
    from onto_text_tag_spark.operators.curation import nb_quality_score

    rows = [
        (1, "wiki", "encyclopedic prose citations structure"),
        (2, "wiki", "encyclopedic article citations neutral"),
        (3, "crawl", "buy now free free winner"),
        (4, "crawl", "click buy winner offer"),
        (5, "crawl", "encyclopedic citations neutral"),
        (6, "crawl", ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    k = 64
    out = {
        r["doc_id"]: r
        for r in nb_quality_score(
            docs, F.col("source") == "wiki", num_buckets=k
        ).collect()
    }

    # pure-python replay of the closed form (same md5 bucketing)
    import hashlib
    import math
    import re

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % k

    t_counts, o_counts = {}, {}
    docs_toks = {}
    for doc_id, source, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        docs_toks[doc_id] = (source, toks)
        tgt = t_counts if source == "wiki" else o_counts
        for t in toks:
            tgt[bucket(t)] = tgt.get(bucket(t), 0) + 1
    t_tot, o_tot = sum(t_counts.values()), sum(o_counts.values())
    prior = math.log(2 / 4)
    for doc_id, (source, toks) in docs_toks.items():
        expected = prior + sum(
            math.log((t_counts.get(bucket(t), 0) + 1) / (t_tot + k))
            - math.log((o_counts.get(bucket(t), 0) + 1) / (o_tot + k))
            for t in toks
        )
        assert out[doc_id]["nb_logodds"] == pytest.approx(
            round(expected, 4), abs=1e-4
        ), doc_id
        assert out[doc_id]["pred_target"] == (expected > 0)
        assert out[doc_id]["n_tokens"] == len(toks)

    # the classifier separates the domains and recognizes the
    # wiki-looking crawl page; the empty doc scores exactly the prior
    assert out[1]["pred_target"] and out[2]["pred_target"]
    assert not out[3]["pred_target"] and not out[4]["pred_target"]
    assert out[5]["pred_target"]
    assert out[6]["nb_logodds"] == pytest.approx(round(prior, 4))


def test_importance_resample_gumbel_replay_and_determinism(spark):
    from onto_text_tag_spark.operators.curation import importance_resample

    rows = [(i, float(w)) for i, w in
            [(1, 2.0), (2, -1.0), (3, 0.5), (4, -3.0), (5, 1.5),
             (6, 0.0), (7, -0.5), (8, 3.0)]]
    docs = spark.createDataFrame(rows, ["doc_id", "log_weight"])
    got = importance_resample(docs, n=3).collect()
    assert len(got) == 3

    # pure-python replay of the Gumbel-top-k draw (same seeded md5)
    import hashlib
    import math

    def key(doc_id, w, seed=7):
        h = int(hashlib.md5(f"{seed}:{doc_id}".encode())
                .hexdigest()[:15], 16)
        u = (h + 1) / float((1 << 60) + 1)
        return round(w - math.log(-math.log(u)), 6)

    expected = sorted(
        ((key(i, w), i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert [(r["doc_id"], r["sample_key"]) for r in got] == [
        (i, k) for k, i, _ in expected
    ]

    # rerun-deterministic; n >= corpus selects everything
    again = importance_resample(docs, n=3).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]
    assert importance_resample(docs, n=100).count() == len(rows)
    # a different seed draws different noise (and so may select a
    # different subset) but stays internally deterministic
    alt = importance_resample(docs, n=3, seed=11).collect()
    assert [r["doc_id"] for r in alt] == [
        r["doc_id"]
        for r in importance_resample(docs, n=3, seed=11).collect()
    ]


def test_importance_resample_weight_proportionality(spark):
    from onto_text_tag_spark.operators.curation import importance_resample

    # 200 low-weight docs + 5 overwhelming-weight docs: Gumbel noise has
    # stdev ~1.28, so a +30 log-weight gap makes the heavy docs all but
    # certain to win every seed — check a handful of seeds
    rows = [(i, 0.0) for i in range(200)] + [
        (900 + i, 30.0) for i in range(5)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "log_weight"])
    for seed in (1, 2, 3):
        picked = {
            r["doc_id"]
            for r in importance_resample(docs, n=5, seed=seed).collect()
        }
        assert picked == {900, 901, 902, 903, 904}, seed


def test_bloom_decontaminate_matches_exact_and_python_twin(spark):
    from onto_text_tag_spark.operators.curation import (
        bloom_bits,
        bloom_decontaminate,
        decontaminate,
    )

    rows = [
        (1, "the hash join beats the table scan on big inputs"),
        (2, "nothing remotely benchmark shaped here at all"),
        (3, "stream batch pipelines and vector spark together"),
        (4, ""),
        (5, "hash Join with case variation and table SCAN again"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = ["hash join", "table scan", "stream batch", "vector spark"]

    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench).collect()
    }
    exact = {
        r["doc_id"]: r for r in decontaminate(docs, bench).collect()
    }
    # Bloom has no false negatives; at 2^15 bits / 4 grams it has no
    # false positives on this corpus either — the two gates agree
    for d in bloom:
        assert bloom[d]["n_bloom_hits"] == \
            exact[d]["n_contaminated_grams"], d
        assert bloom[d]["bloom_contaminated"] == \
            exact[d]["contaminated"], d

    # python twin of the bitset: every benchmark gram's k probes are set
    import hashlib

    m, k = 1 << 15, 3
    words = bloom_bits(bench, m_bits=m, k=k)
    for g in bench:
        for s in range(k):
            h = int(hashlib.md5(f"{s}:{g}".encode())
                    .hexdigest()[:15], 16) % m
            assert (words[h // 32] >> (h % 32)) & 1 == 1, (g, s)
    # all words fit 32 bits (the signed-shift-safety packing contract)
    assert all(0 <= w < (1 << 32) for w in words)
    # occupancy sanity: k probes per gram, at most k*len(bench) bits set
    set_bits = sum(bin(w).count("1") for w in words)
    assert 0 < set_bits <= k * len(bench)


def test_bloom_decontaminate_no_eval_python_in_plan(spark):
    from onto_text_tag_spark.operators.curation import bloom_decontaminate

    docs = spark.createDataFrame(
        [(1, "hash join here")], ["doc_id", "text"]
    )
    plan = bloom_decontaminate(docs, ["hash join"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_bloom_decontaminate_non_canonical_grams(spark):
    """ADVICE r3 (high): grams like 'hash  join' / 'hash-join' pass the
    n-token validation but were hashed UNNORMALIZED into the bitset
    while the doc side probes canonical 'hash join' — a silent false
    negative.  The bitset must be built from the normalized grams."""
    from onto_text_tag_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )

    rows = [
        (1, "the hash join beats everything"),
        (2, "no benchmark material whatsoever"),
        (3, "a table scan walks the heap"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # double space + hyphen: both normalize to canonical 2-token grams
    bench = ["hash  join", "table-scan"]

    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench).collect()
    }
    exact = {
        r["doc_id"]: r for r in decontaminate(docs, bench).collect()
    }
    assert bloom[1]["bloom_contaminated"] and exact[1]["contaminated"]
    assert bloom[3]["bloom_contaminated"] and exact[3]["contaminated"]
    assert not bloom[2]["bloom_contaminated"]
    for d in bloom:
        assert bloom[d]["n_bloom_hits"] == \
            exact[d]["n_contaminated_grams"], d


def test_bloom_decontaminate_saturated_filter_raises(spark):
    """An explicit m_bits implying fp > 1% is a misconfigured gate
    (it fires on noise) — fail loud instead of flagging everything."""
    import pytest

    from onto_text_tag_spark.operators.curation import bloom_decontaminate

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    grams = [f"gram number{i}" for i in range(200)]
    with pytest.raises(ValueError, match="fp_rate"):
        bloom_decontaminate(docs, grams, m_bits=512)


def test_bloom_decontaminate_auto_sizes_m_bits():
    """m_bits=None derives ~16 bits/gram rounded to a power of two,
    floored at 2^15 — a fixed default saturates on a real eval suite."""
    from onto_text_tag_spark.operators.curation import bloom_bits

    # pure sizing arithmetic twin of the operator's derivation
    for n_grams, expected in [(10, 1 << 15), (4096, 1 << 16),
                              (100_000, 1 << 21)]:
        m = max(1 << 15, 1 << (16 * max(n_grams, 1) - 1).bit_length())
        assert m >= 16 * n_grams and m == expected, n_grams
        # and the packing contract holds at any derived size
        words = bloom_bits(["alpha beta"], m_bits=m)
        assert len(words) == m // 32


def test_nb_quality_score_degenerate_class_raises(spark):
    """ADVICE r3 (medium): with zero docs in either class the prior
    ln(t/o) silently NULLed every score; now it raises."""
    import pytest

    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.curation import nb_quality_score

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="degenerate"):
        nb_quality_score(docs, F.lit(True))
    with pytest.raises(ValueError, match="degenerate"):
        nb_quality_score(docs, F.lit(False))


def test_bigram_logloss_first_principles(spark):
    """Interpolated bigram LM against hand-computed probabilities, and
    the discriminative property the unigram model lacks: shuffled
    words score worse than fluent order with the SAME bag of words."""
    import math

    from onto_text_tag_spark.operators.textstats import (
        bigram_logloss,
        unigram_logloss,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "mat the on sat cat the"),   # same bag, shuffled order
        (4, "zzz"),                       # single word: no bigrams
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_logloss(docs).collect()}

    # hand model over the corpus: unigram counts and bigram counts
    toks = {1: "the cat sat on the mat".split(),
            2: "the cat sat on the mat".split(),
            3: "mat the on sat cat the".split(),
            4: ["zzz"], 5: []}
    uc: dict = {}
    bc: dict = {}
    for ws in toks.values():
        for w in ws:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    tot, v = sum(uc.values()), len(uc)
    lam = 0.7

    def ll(ws):
        vals = [
            -math.log(lam * bc[(a, b)] / uc[a]
                      + (1.0 - lam) * (uc[b] + 1) / (tot + v))
            for a, b in zip(ws, ws[1:])
        ]
        return round(sum(vals) / len(vals), 4)

    for d in (1, 2, 3):
        assert got[d]["n_bigrams"] == 5
        assert abs(got[d]["mean_logloss"] - ll(toks[d])) <= 1e-4, d
    assert got[4]["n_bigrams"] == 0 and got[4]["mean_logloss"] == 0.0
    assert got[5]["n_bigrams"] == 0 and got[5]["mean_logloss"] == 0.0

    # the discriminative property: the shuffled doc's transitions are
    # rarer, so its bigram loss is strictly higher...
    assert got[3]["mean_logloss"] > got[1]["mean_logloss"]
    # ...while the unigram model cannot tell them apart at all
    ug = {r["doc_id"]: r["mean_logloss"]
          for r in unigram_logloss(docs).collect()}
    assert ug[1] == ug[3]
