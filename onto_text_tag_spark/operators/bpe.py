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
    min_count: int | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """``(word, n)`` — the corpus word-frequency relation BPE trains
    on.  Tokenization matches the engine's text-analysis family (lower
    + split on non-[a-z0-9'] runs).  One scan + one map-side-combined
    shuffle; output is vocab-sized.

    ``min_count`` / ``top_n`` bound the relation BEFORE any driver
    collect — the production guard for web-scale corpora, where the raw
    vocabulary has a hapax-legomena long tail (typos, ids, urls) that
    is 10-100× the useful head and carries no merge signal.  ``top_n``
    compiles to TakeOrderedAndProject (distributed partial top-n,
    deterministic ``(n desc, word asc)`` order), never a global sort."""
    words = documents.select(
        F.explode(
            F.expr(
                f"filter(split(lower({text_col}), \"[^a-z0-9']+\"), "
                "t -> t != '')"
            )
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count("*").cast("long").alias("n"))
    if min_count is not None and min_count > 1:
        wf = wf.where(F.col("n") >= min_count)
    if top_n is not None:
        wf = wf.orderBy(F.col("n").desc(), F.col("word").asc()).limit(top_n)
    return wf


def train_bpe(
    word_freqs: list[tuple[str, int]],
    n_merges: int = 100,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency list —
    driver-side over vocab-sized state (see module docstring for why
    that is the correct distribution boundary).

    Classic algorithm: words start as character sequences + ``EOW``;
    each round the most frequent adjacent symbol pair (weighted by word
    frequency) merges everywhere it occurs and is recorded.  Ties break
    lexicographically (among max-count pairs, the lexicographically
    GREATEST — the original full-recount implementation's
    ``max((count, a, b))`` rule, preserved exactly); training stops
    early when no pair reaches ``min_pair_freq``.  Returns the ordered
    merge list — order IS the vocabulary (apply must replay it in
    sequence).

    Production shape (what makes a 32k-merge fit over a 10^6-word web
    vocabulary tractable — a naive full pair recount per round is
    O(n_merges × total_symbols) and runs for hours):

    * **Incremental pair counts**: only the words that CONTAIN the
      merged pair change, so each round subtracts those words' old
      adjacent-pair contributions and adds their new ones — O(affected
      words × their length), with a ``pair → word-ids`` inverted index
      locating them (the Sennrich et al. 2016 reference trainer and
      HuggingFace tokenizers maintain the same structure).
    * **Lazy max-heap argmax**: every count change pushes a fresh heap
      entry; pops discard entries whose count no longer matches the
      live table.  The heap key inverts lexicographic string order
      (negated code points + a high sentinel) so the heap's min IS
      ``max((count, a, b))`` — bit-identical merge choice to the
      recount implementation, pinned by tests/test_bpe.py.
    """
    import heapq

    agg: dict[tuple[str, ...], int] = {}
    for word, n in word_freqs:
        if word:
            key = tuple(word) + (EOW,)
            agg[key] = agg.get(key, 0) + int(n)
    # mutable working set: [symbols list, weight] per distinct word
    words: list[list] = [[list(k), n] for k, n in agg.items()]

    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + n
            where.setdefault(p, set()).add(idx)

    def _inv(s: str) -> tuple:
        # inverts lexicographic order: x > y  <=>  _inv(x) < _inv(y)
        # (negated code points; the trailing sentinel 1 outranks any
        # -ord, so a longer string with the same prefix — lex GREATER —
        # sorts FIRST)
        return tuple(-ord(c) for c in s) + (1,)

    heap = [(-c, _inv(p[0]), _inv(p[1]), p) for p, c in stats.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair = None
        while heap:
            negc, _ka, _kb, p = heap[0]
            cur = stats.get(p, 0)
            if cur <= 0 or cur != -negc:
                heapq.heappop(heap)  # stale: a fresh entry exists
                continue
            pair, count = p, cur
            break
        if pair is None or count < min_pair_freq:
            break
        a, b = pair
        merged = a + b
        touched: set[tuple[str, str]] = set()
        # pop the affected-word set up front: the update loop below
        # mutates where-sets (old_pairs includes the merged pair itself)
        # and must not mutate the set being iterated
        affected = where.pop(pair, set())
        for idx in affected:
            syms, n = words[idx]
            old_pairs = set()
            for i in range(len(syms) - 1):
                q = (syms[i], syms[i + 1])
                stats[q] -= n
                old_pairs.add(q)
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx][0] = out
            new_pairs = set()
            for i in range(len(out) - 1):
                q = (out[i], out[i + 1])
                stats[q] = stats.get(q, 0) + n
                new_pairs.add(q)
            for q in old_pairs - new_pairs:
                w = where.get(q)
                if w is not None:
                    w.discard(idx)
            for q in new_pairs - old_pairs:
                where.setdefault(q, set()).add(idx)
            touched |= old_pairs | new_pairs
        # the merged pair is fully consumed (greedy left-to-right leaves
        # no adjacent (a, b)); drop its bookkeeping
        touched.discard(pair)
        stats.pop(pair, None)
        where.pop(pair, None)
        for q in touched:
            c = stats.get(q, 0)
            if c > 0:
                heapq.heappush(heap, (-c, _inv(q[0]), _inv(q[1]), q))
            else:
                stats.pop(q, None)
                where.pop(q, None)
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
    keep_cols: tuple = (),
    with_word_counts: bool = False,
) -> DataFrame:
    """``(doc_id, bpe_tokens)`` — per-document subword token counts
    under a trained merge table: the sequence-length accounting a
    packing/curation pipeline runs before training.

    Row-local Arrow kernel: the merge ranks ride in the closure
    (vocab-sized), each batch keeps a word→token-count cache (Zipf:
    the same words recur), no shuffle.

    ``keep_cols`` passes source columns through (same single scan — no
    join back to the corpus); ``with_word_counts=True`` adds
    ``n_words`` (the pre-subword token count from the same
    tokenization), which is what fertility diagnostics divide by."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    src = documents.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
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

    extra = (
        [F.size("_words").cast("long").alias("n_words")]
        if with_word_counts else []
    )
    return src.select(
        id_col,
        *[F.col(c) for c in keep_cols],
        *extra,
        _count(F.col("_words")).alias("bpe_tokens"),
    )


def wordpiece_segment_count(
    word: str,
    vocab_first: set,
    vocab_cont: set,
    max_chars: int = 32,
) -> tuple:
    """(piece_count, unk) for one word under BERT's runtime WordPiece
    semantics (Devlin et al. 2019 / the original `tokenization.py`
    WordpieceTokenizer): greedy LONGEST-match-first left to right,
    pieces after the first drawn from the '##'-continuation vocab,
    and on ANY failure — no matching prefix, or the word exceeding
    ``max_chars`` — the WHOLE word collapses to a single [UNK] token
    (greedy does not backtrack; partial segmentations are discarded).

    ``vocab_first``: pieces usable at word start (no '##');
    ``vocab_cont``: continuation pieces with the '##' already
    stripped."""
    if len(word) > max_chars:
        return (1, 1)
    n = 0
    start = 0
    while start < len(word):
        table = vocab_first if start == 0 else vocab_cont
        end = len(word)
        match = 0
        while end > start:
            if word[start:end] in table:
                match = end
                break
            end -= 1
        if match == 0:
            return (1, 1)
        n += 1
        start = match
    return (n, 0)


def wordpiece_token_counts(
    documents: DataFrame,
    vocab: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 32,
    keep_cols: tuple = (),
    with_word_counts: bool = False,
) -> DataFrame:
    """``(doc_id, wp_tokens, unk_words)`` — per-document WordPiece
    token counts + unknown-word counts under a FIXED vocabulary: the
    runtime-tokenizer twin of ``bpe_token_counts`` for the
    vocab-driven (BERT-style) tokenizer family, where deployment ships
    a vocab file rather than a merge table.  The sequence-length and
    OOV accounting curation runs when the training tokenizer is a
    published one, not corpus-fit.

    Same scale shape as the BPE apply: ONE corpus scan, the vocab
    rides in the closure (vocab files are 30k-200k entries), a
    per-batch word→counts cache exploits the Zipf distribution, no
    shuffle, no join.

    ``keep_cols`` passes source columns through on the same scan;
    ``with_word_counts=True`` adds ``n_words`` (pre-subword token
    count), the denominator fertility / OOV-rate diagnostics divide
    by — mirroring ``bpe_token_counts``.
    """
    vocab_first = {p for p in vocab if not p.startswith("##")}
    vocab_cont = {p[2:] for p in vocab if p.startswith("##")}
    src = documents.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.expr(
            f"filter(split(lower({text_col}), \"[^a-z0-9']+\"), "
            "t -> t != '')"
        ).alias("_words"),
    )

    @F.pandas_udf("wp_tokens long, unk_words long")
    def _count(words: pd.Series) -> pd.DataFrame:
        cache: dict = {}

        def doc_count(ws):
            toks = 0
            unks = 0
            for w in ws:
                c = cache.get(w)
                if c is None:
                    c = wordpiece_segment_count(
                        w, vocab_first, vocab_cont, max_chars
                    )
                    cache[w] = c
                toks += c[0]
                unks += c[1]
            return (toks, unks)

        out = [doc_count(ws) for ws in words]
        return pd.DataFrame(out, columns=["wp_tokens", "unk_words"])

    extra = (
        [F.size("_words").cast("long").alias("n_words")]
        if with_word_counts else []
    )
    return src.select(
        id_col,
        *[F.col(c) for c in keep_cols],
        *extra,
        _count(F.col("_words")).alias("_c"),
    ).select(
        id_col,
        *[F.col(c) for c in keep_cols],
        *([F.col("n_words")] if with_word_counts else []),
        F.col("_c.wp_tokens").alias("wp_tokens"),
        F.col("_c.unk_words").alias("unk_words"),
    )
