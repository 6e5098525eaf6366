"""Distributed BPE (byte-pair encoding) vocabulary training + apply —
the subword tokenizer a training-data pipeline fits on its own corpus.

Scale shape (the part that matters at 100 TB): the ONLY corpus-sized
operation is ``word_frequencies`` — one scan, one map-side-combined
shuffle down to the word-frequency relation, which is VOCAB-sized
(10^6-10^7 rows for web text, millions of times smaller than the
corpus).  The classic merge loop (count adjacent symbol pairs weighted
by word frequency, merge the argmax, repeat) then runs DRIVER-SIDE
over that vocab-sized state — this is how production BPE trainers
(the original Sennrich et al. 2016 reference implementation,
HuggingFace tokenizers) are structured too: they train on word counts,
never on the raw corpus.  Applying the trained merges back to the
corpus is a row-local Arrow kernel with the merge table broadcast in
the closure and a per-batch word cache (Zipf makes the cache hit rate
enormous), so encode throughput scales with executors like every other
``mapInPandas`` stage.

Determinism: the merge loop breaks count ties lexicographically, so
the same word-frequency relation always yields the same merge table —
the reproducibility the curation pipeline's resume contract expects.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# end-of-word sentinel (Sennrich-style): keeps "low" in "lowest" from
# merging across word boundaries
EOW = "</w>"


def word_frequencies(
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """``(word, n)`` — the corpus word-frequency relation BPE trains
    on.  Tokenization matches the engine's text-analysis family (lower
    + split on non-[a-z0-9'] runs).  One scan + one map-side-combined
    shuffle; output is vocab-sized."""
    words = documents.select(
        F.explode(
            F.expr(
                f"filter(split(lower({text_col}), \"[^a-z0-9']+\"), "
                "t -> t != '')"
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").cast("long").alias("n"))


def train_bpe(
    word_freqs: list[tuple[str, int]],
    n_merges: int = 100,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency list —
    driver-side over vocab-sized state (see module docstring for why
    that is the correct distribution boundary).

    Classic algorithm: words start as character sequences + ``EOW``;
    each round counts adjacent symbol pairs (weighted by word
    frequency), merges the most frequent pair everywhere, and records
    it.  Ties break lexicographically; training stops early when no
    pair reaches ``min_pair_freq``.  Returns the ordered merge list —
    order IS the vocabulary (apply must replay it in sequence)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in word_freqs:
        if word:
            key = tuple(word) + (EOW,)
            vocab[key] = vocab.get(key, 0) + int(n)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0][0],
                                                        kv[0][1]))
        # lexicographic tie-break: among max-count pairs keep the
        # lexicographically GREATEST (max over (count, pair) tuples) —
        # any fixed rule works; this one needs no second pass
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if (i < len(symbols) - 1 and symbols[i] == a
                        and symbols[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append((a, b))
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str]],
                ranks: dict[tuple[str, str], int] | None = None
                ) -> list[str]:
    """Segment one word with a trained merge list: repeatedly apply
    the lowest-rank (earliest-learned) applicable merge — the standard
    encode rule, guaranteeing train(apply) == train-time segmentation
    for in-vocabulary words."""
    if ranks is None:
        ranks = {pair: i for i, pair in enumerate(merges)}
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i]
                                      + symbols[best_i + 1]]
    return symbols


def bpe_token_counts(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, bpe_tokens)`` — per-document subword token counts
    under a trained merge table: the sequence-length accounting a
    packing/curation pipeline runs before training.

    Row-local Arrow kernel: the merge ranks ride in the closure
    (vocab-sized), each batch keeps a word→token-count cache (Zipf:
    the same words recur), no shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    src = documents.select(
        F.col(id_col),
        F.expr(
            f"filter(split(lower({text_col}), \"[^a-z0-9']+\"), "
            "t -> t != '')"
        ).alias("_words"),
    )

    @F.pandas_udf("long")
    def _count(words: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def doc_count(ws) -> int:
            total = 0
            for w in ws:
                c = cache.get(w)
                if c is None:
                    c = len(bpe_segment(w, [], ranks))
                    cache[w] = c
                total += c
            return total

        return words.map(doc_count)

    return src.select(id_col, _count(F.col("_words")).alias("bpe_tokens"))
