"""Planted-duplicate corpus generation (gen_corpus --dup-frac).

Pure-Python (no Spark): synth_row is the per-row kernel that
distributed_documents_df maps over the id space, so pinning it pins the
distributed corpus.  Reference scope: the reference has no corpus
generator — this synthesizes the dup-planted Common-Crawl-style input
the dedup job (jobs/dedup_corpus.py) is benchmarked on.
"""

import hashlib
import random

from onto_text_tag_spark.corpus import _is_planted_dup, synth_row

SEED = 42
GEN = dict(seed=SEED, min_sents=40, max_sents=120, filler_prob=0.95)


def _word_jaccard(a: str, b: str, k: int = 5) -> float:
    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i:i + k]) for i in range(max(1, len(w) - k + 1))}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_dup_frac_zero_is_unchanged():
    """dup_frac=0 must consume the RNG stream identically to the
    pre-option generator: pinned scaling corpora (BENCH/BASELINE.md
    mention/triple counts) depend on it."""
    for i in (0, 1, 7, 999, 54321):
        assert synth_row(i, **GEN) == synth_row(i, **GEN, dup_frac=0.0)


def test_dup_rate_and_similarity():
    n = 2000
    rows = [synth_row(i, **GEN, dup_frac=0.1) for i in range(n)]
    planted = [i for i in range(n) if _is_planted_dup(i, SEED, 0.1)]
    # ~10% planted (binomial, wide tolerance)
    assert 0.07 * n <= len(planted) <= 0.13 * n

    exact = 0
    seen: dict[str, int] = {}
    for i, r in enumerate(rows):
        h = hashlib.md5(r["html"]).hexdigest()
        if h in seen:
            exact += 1
        else:
            seen[h] = i
    assert exact > 0.01 * n  # ~30% of planted are byte-exact mirrors

    # every planted near-dup stays above the 0.8 word-Jaccard threshold
    checked = 0
    for i in planted[:50]:
        rng = random.Random(f"{SEED}:dup:{i}")
        while True:
            j = rng.randrange(i)
            if not _is_planted_dup(j, SEED, 0.1):
                break
        jac = _word_jaccard(rows[i]["text"], rows[j]["text"])
        assert jac >= 0.8, (i, j, jac)
        checked += 1
    assert checked > 0


def test_dup_determinism_any_order():
    """Row content is a pure function of (seed, i) — the property that
    makes generation executor-count-invariant."""
    a = [synth_row(i, **GEN, dup_frac=0.2) for i in range(100)]
    b = [synth_row(i, **GEN, dup_frac=0.2) for i in reversed(range(100))]
    assert a == list(reversed(b))


def test_urls_unique_even_for_exact_dups():
    rows = [synth_row(i, **GEN, dup_frac=0.3) for i in range(500)]
    urls = {r["url"] for r in rows}
    assert len(urls) == 500


def test_ngram_spans_null_text_zero_tokens(spark):
    """ADVICE r3 (low): a NULL text used to emit n_tokens = size(NULL)
    = -1 (and NULL in the DuckDB oracle) — both sides now report 0."""
    from onto_text_tag_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, None),
         (3, "")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in duplicate_ngram_spans(docs, w=8).collect()
    }
    assert rows[2]["n_tokens"] == 0 and rows[2]["dup_frac"] == 0.0
    assert rows[3]["n_tokens"] == 0
    assert rows[1]["n_tokens"] == 9
