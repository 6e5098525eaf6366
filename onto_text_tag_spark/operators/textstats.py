"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's tagging surface, a 100 TB corpus pipeline needs
per-document text statistics: language identification, quality scoring,
token counting, and fingerprinting.  Everything here is pure JVM-side
column expressions (whole-stage codegen; no Python boundary) and every
operator has an exact ANSI-SQL twin for the DuckDB oracle — see
``__spark_entry__.py``.

Scale notes: all four are narrow per-row maps — no shuffle, pipelined
with the scan, trivially linear in corpus size.  The only care point is
expression width (language profiles are capped, SimHash bits bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from onto_text_tag_spark.functions.hashing import (
    md5_long,
    word_tokens,
)

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately small and frozen — they are part of the operator's
# semantics (the SQL oracle embeds the same lists).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}

# BPE-ish tokenizer regex: letter runs, digit runs, or single punctuation.
# Canonical form uses a single backslash (DuckDB standard strings); the
# Spark ``expr`` embedding doubles it because Spark SQL string literals
# process backslash escapes.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_TOKEN_REGEX_SPARK = TOKEN_REGEX.replace("\\", "\\\\")


def token_count_cols(text_col: str = "text",
                     tokens_col: str | None = None) -> list[Column]:
    """Whitespace token count + regex (BPE-ish) token count + char count.

    ``tokens_col`` names a pre-projected token array (see
    ``text_profile``) so the regex tokenization runs once per row instead
    of once per consuming expression.
    """
    toks = F.col(tokens_col) if tokens_col else word_tokens(text_col)
    return [
        F.size(toks).cast("long").alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{_TOKEN_REGEX_SPARK}', 0)"))
        .cast("long")
        .alias("re_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    ]


def quality_cols(text_col: str = "text",
                 tokens_col: str | None = None) -> list[Column]:
    """Heuristic quality signals: mean word length, stopword ratio,
    punctuation ratio, all rounded for cross-engine comparability."""
    toks_sql = tokens_col if tokens_col else _tokens_sql_spark(text_col)
    tokens = F.expr(toks_sql)
    n_tokens = F.size(tokens)
    en_stop = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    stop_hits = F.size(
        F.expr(f"filter({toks_sql}, t -> t in ({en_stop}))")
    )
    punct = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[^A-Za-z0-9\\\\s]', 0)")
    )
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    mean_word_len = F.round(
        (F.length(F.regexp_replace(F.col(text_col), "\\s+", ""))).cast("double")
        / safe_tokens,
        4,
    )
    return [
        mean_word_len.alias("mean_word_len"),
        F.round(stop_hits.cast("double") / safe_tokens, 4).alias("stopword_ratio"),
        F.round(
            punct.cast("double") / F.greatest(F.length(text_col), F.lit(1)), 4
        ).alias("punct_ratio"),
    ]


def _tokens_sql_spark(text_col: str) -> str:
    return f"filter(split(lower({text_col}), '\\\\s+'), t -> t != '')"


def lang_id_col(text_col: str = "text",
                distinct_tokens_col: str | None = None) -> Column:
    """Stopword-profile language ID: language with the most distinct
    profile-word hits among the document's tokens; ties break by language
    code ascending; zero hits everywhere → 'und'."""
    dtoks = (
        distinct_tokens_col
        if distinct_tokens_col
        else f"array_distinct({_tokens_sql_spark(text_col)})"
    )
    scores = []
    for lang in sorted(LANG_PROFILES):
        profile = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        hits = F.size(F.expr(f"filter({dtoks}, t -> t in ({profile}))"))
        scores.append((lang, hits))
    # argmax with deterministic tie-break: greatest() over structs compares
    # fieldwise (score, then rank); rank is inverted lexicographic position
    # so ties resolve to the alphabetically-first language code.
    langs_sorted = sorted(LANG_PROFILES)
    rank = {lang: len(langs_sorted) - i for i, lang in enumerate(langs_sorted)}
    best = F.greatest(
        *[
            F.struct(hits.alias("s"), F.lit(rank[lang]).alias("r"),
                     F.lit(lang).alias("l"))
            for lang, hits in scores
        ]
    )
    return F.when(best["s"] == 0, F.lit("und")).otherwise(best["l"])


def fingerprint_col(text_col: str = "text") -> Column:
    """64-bit-ish rolling document fingerprint: md5_long of the
    whitespace-normalized lowercase text — stable under reflow."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return md5_long(normalized)


def text_profile(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One row per document with all text statistics.

    The token array is projected ONCE (``_toks``/``_dtoks``) and every
    statistic derives from it — inlining the tokenizer into each of the
    ~7 consuming sibling expressions re-ran the regex split per sibling
    (Catalyst does not CSE across siblings; measured ~3× slower).
    CollapseProject keeps the staging Project because a non-cheap
    expression referenced more than once is not collapsed.
    """
    staged = documents.select(
        F.col(id_col),
        F.col(text_col),
        word_tokens(text_col).alias("_toks"),
    ).withColumn("_dtoks", F.array_distinct("_toks"))
    return staged.select(
        F.col(id_col),
        *token_count_cols(text_col, tokens_col="_toks"),
        *quality_cols(text_col, tokens_col="_toks"),
        lang_id_col(text_col, distinct_tokens_col="_dtoks").alias("lang_pred"),
        fingerprint_col(text_col).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle) — kept adjacent so semantics stay in lockstep.
# ---------------------------------------------------------------------------

def lang_id_sql(text_expr: str) -> str:
    toks = (
        f"list_distinct(list_filter("
        f"string_split_regex(lower({text_expr}), '\\s+'), t -> t != ''))"
    )
    score = {
        lang: (
            f"len(list_filter({toks}, t -> list_contains("
            f"[{', '.join(chr(39) + w + chr(39) for w in LANG_PROFILES[lang])}],"
            f" t)))"
        )
        for lang in sorted(LANG_PROFILES)
    }
    langs_sorted = sorted(LANG_PROFILES)
    rank = {lang: len(langs_sorted) - i for i, lang in enumerate(langs_sorted)}
    structs = ", ".join(
        f"{{'s': {score[lang]}, 'r': {rank[lang]}, 'l': '{lang}'}}"
        for lang in langs_sorted
    )
    return (
        f"(CASE WHEN (list_max([{structs}])).s = 0 THEN 'und' "
        f"ELSE (list_max([{structs}])).l END)"
    )


def text_profile_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    t = text_col
    toks = f"list_filter(string_split_regex(lower({t}), '\\s+'), x -> x != '')"
    en_stop = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
SELECT {id_col},
  len({toks})::BIGINT AS ws_tokens,
  len(regexp_extract_all({t}, '{TOKEN_REGEX}'))::BIGINT AS re_tokens,
  length({t})::BIGINT AS n_chars,
  round(length(regexp_replace({t}, '\\s+', '', 'g'))::DOUBLE
        / greatest(len({toks}), 1), 4) AS mean_word_len,
  round(len(list_filter({toks}, x -> list_contains([{en_stop}], x)))::DOUBLE
        / greatest(len({toks}), 1), 4) AS stopword_ratio,
  round(len(regexp_extract_all({t}, '[^A-Za-z0-9\\s]'))::DOUBLE
        / greatest(length({t}), 1), 4) AS punct_ratio,
  {lang_id_sql(t)} AS lang_pred,
  ('0x' || substr(md5(regexp_replace(trim(lower({t})), '\\s+', ' ', 'g')),
   1, 15))::BIGINT AS fingerprint
FROM {table}
"""


def boilerplate_ngrams(documents: DataFrame, group_col: str = "source",
                       id_col: str = "doc_id", text_col: str = "text",
                       k: int = 1, min_frac: float = 0.5) -> DataFrame:
    """(group, gram, doc_count, df_frac): word k-grams appearing in at
    least ``min_frac`` of a group's documents — corpus-level boilerplate
    detection (nav text, cookie banners, footer templates repeat across
    a host/source's pages; no single-document heuristic can see that).

    The per-doc shingle set is already distinct (``word_shingles``), so
    the doc-frequency aggregate is a plain count — no distinct-agg
    state.  Two shuffles: (group, gram) counts with map-side combine,
    and the group-sized totals broadcast back onto them.  The explode is
    the big intermediate (docs × grams) but never materializes past the
    partial aggregate.
    """
    from onto_text_tag_spark.functions.hashing import word_shingles

    grams = documents.select(
        F.col(group_col), F.col(id_col),
        F.explode(word_shingles(text_col, k)).alias("gram"),
    )
    gram_df = grams.groupBy(group_col, "gram").agg(
        F.count("*").cast("long").alias("doc_count")
    )
    totals = documents.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        gram_df.join(F.broadcast(totals), group_col)
        .withColumn(
            "df_frac",
            F.round(F.col("doc_count") / F.col("n_docs"), 4),
        )
        .where(F.col("doc_count") >= F.lit(min_frac) * F.col("n_docs"))
        .select(group_col, "gram", "doc_count", "df_frac")
    )


def chunk_documents(documents: DataFrame, chunk_tokens: int = 50,
                    overlap: int = 10, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_id, start_tok, n_tokens, chunk) sliding token windows —
    the passage unit embedding/retrieval pipelines index, and the
    training-sample unit context-length packing starts from.

    Chunks start every ``chunk_tokens - overlap`` tokens (1-based
    ``start_tok``), each spanning ``chunk_tokens`` tokens (the final
    chunk may be shorter; every token lands in ≥1 chunk).  Entirely
    JVM-side: one ``sequence`` + ``transform`` + ``posexplode`` over the
    token array — no UDF, no shuffle; the operator is embarrassingly
    row-parallel and scales with the scan.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    l = f"filter(split({text_col}, '\\\\s+'), t -> t != '')"
    chunks = (
        f"transform(sequence(1, greatest(size({l}), 1), {step}), "
        f"s -> struct(s AS start_tok, "
        f"array_join(slice({l}, s, {chunk_tokens}), ' ') AS chunk, "
        f"size(slice({l}, s, {chunk_tokens})) AS n_tokens))"
    )
    return (
        documents.select(
            F.col(id_col),
            F.posexplode(F.expr(chunks)).alias("chunk_id", "c"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start_tok").cast("long").alias("start_tok"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
            F.col("c.chunk").alias("chunk"),
        )
    )


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                    approx: bool = False) -> DataFrame:
    """Per-group value quantiles — the drift monitor a curation pipeline
    publishes per crawl/source (is this host suddenly sending shorter
    pages?).

    ``approx=False`` uses exact interpolated ``percentile`` (sorts each
    group — fine for group-sized data, and the form the SQL oracle can
    replay exactly).  ``approx=True`` switches to ``percentile_approx``
    (t-digest sketch, single pass, mergeable map-side) — the 100 TB
    form; same schema, values within sketch error.
    """
    fn = "percentile_approx" if approx else "percentile"
    arr = ", ".join(str(q) for q in qs)
    agg = F.expr(f"{fn}({value_col}, array({arr}))")
    out = df.groupBy(group_col).agg(agg.alias("_qs"))
    cols = [F.col(group_col)] + [
        F.round(F.col("_qs")[i], 4).alias(f"q{int(q * 100)}")
        for i, q in enumerate(qs)
    ]
    return out.select(*cols)


def repetition_signals(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document repetition quality gates — the Gopher-style filter
    family (Rae et al. 2021, Table A1) a web-corpus curation pipeline
    runs before training: machine-generated and boilerplate pages give
    themselves away by repeating lines and n-grams.

    Columns (all fractions rounded to 4, 0.0 on empty inputs):

    * ``n_lines`` — non-empty lines.
    * ``dup_line_frac`` — fraction of lines that are repeat occurrences
      (1 - distinct/total).
    * ``dup_line_char_frac`` — fraction of line characters contained in
      repeat occurrences beyond each line's first.
    * ``top_bigram_char_frac`` / ``top_trigram_char_frac`` — fraction
      of word characters covered by occurrences of the single most
      frequent word 2-gram / 3-gram (ties break to the
      lexicographically smallest gram).

    Scale shape: pure per-row JVM column expressions (the top-gram scan
    is a LINEAR fold over the sorted gram array — no per-doc quadratic
    distinct×occurrence loop), whole-stage codegen, no shuffle; the
    operator pipelines with the corpus scan like ``text_profile``.
    n-gram counting follows [[spark-graft-pitfalls]]' sequence guard:
    ``sequence(1, size-n+1)`` DESCENDS when size < n, so every gram
    builder branches on size first.
    """
    lines = (
        f"filter(transform(split({text_col}, '\\n'), x -> trim(x)), "
        f"x -> x != '')"
    )
    words = (
        f"filter(split(lower({text_col}), '[^a-z0-9\\']+'), t -> t != '')"
    )

    def grams(n: int) -> str:
        joins = ", ' ', ".join(f"element_at(w, i + {k})" for k in range(n))
        return (
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(1, size(w) - {n - 1}), "
            f"i -> concat({joins})) ELSE array() END"
        )

    def top_gram_frac(n: int) -> str:
        # linear fold over the SORTED gram array: track the current run
        # and the best run; strict > keeps the FIRST maximal run, which
        # on a sorted array IS the lexicographically smallest tie-winner
        return (
            f"CASE WHEN size(w) >= {n} AND total_wchars > 0 THEN round("
            f"aggregate(array_sort({grams(n)}), "
            f"struct(cast('' as string) AS prev, cast(0 as bigint) AS run, "
            f"cast(0 as bigint) AS best, cast('' as string) AS bestg), "
            f"(acc, g) -> CASE WHEN g = acc.prev THEN "
            f"  CASE WHEN acc.run + 1 > acc.best "
            f"       THEN struct(g AS prev, acc.run + 1 AS run, "
            f"                   acc.run + 1 AS best, g AS bestg) "
            f"       ELSE struct(g AS prev, acc.run + 1 AS run, "
            f"                   acc.best AS best, acc.bestg AS bestg) END "
            f" ELSE CASE WHEN cast(1 as bigint) > acc.best "
            f"       THEN struct(g AS prev, cast(1 as bigint) AS run, "
            f"                   cast(1 as bigint) AS best, g AS bestg) "
            f"       ELSE struct(g AS prev, cast(1 as bigint) AS run, "
            f"                   acc.best AS best, acc.bestg AS bestg) END "
            f"END, "
            f"acc -> acc.best * (length(acc.bestg) - {n - 1})) "
            f"/ cast(total_wchars as double), 4) ELSE 0.0 END"
        )

    base = documents.select(
        F.col(id_col),
        F.expr(lines).alias("l"),
        F.expr(words).alias("w"),
    ).select(
        id_col, "l", "w",
        F.expr(
            "aggregate(w, cast(0 as bigint), (a, x) -> a + length(x))"
        ).alias("total_wchars"),
    )
    return base.select(
        id_col,
        F.size("l").cast("long").alias("n_lines"),
        F.round(
            F.when(
                F.size("l") > 0,
                1.0 - F.size(F.array_distinct("l"))
                / F.size("l").cast("double"),
            ).otherwise(0.0),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                F.expr(
                    "aggregate(l, cast(0 as bigint), (a, x) -> a + length(x))"
                ) > 0,
                (
                    F.expr("aggregate(l, cast(0 as bigint), "
                           "(a, x) -> a + length(x))")
                    - F.expr("aggregate(array_distinct(l), "
                             "cast(0 as bigint), (a, x) -> a + length(x))")
                ).cast("double")
                / F.expr("aggregate(l, cast(0 as bigint), "
                         "(a, x) -> a + length(x))"),
            ).otherwise(0.0),
            4,
        ).alias("dup_line_char_frac"),
        F.expr(top_gram_frac(2)).alias("top_bigram_char_frac"),
        F.expr(top_gram_frac(3)).alias("top_trigram_char_frac"),
    )


def unigram_logloss(documents: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    keep_cols: tuple = ()) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own
    unigram LM — the CCNet-style perplexity quality signal (Wenzek et
    al. 2020 rank pages by LM perplexity; the unigram LM is the
    honest in-container proxy for KenLM).  Low mean log-loss = made of
    common words (fluent boilerplate risk), high = rare-word soup
    (OCR noise, spam, wrong-language fragments) — curation gates cut both
    tails.

    ``p(word) = (count + 1) / (total + n_distinct)`` (Laplace), and
    ``mean_logloss`` = mean over the document's words of ``-ln p``,
    rounded to 4 (0.0 for word-less docs).

    Scale shape: one word-count shuffle down to the vocabulary relation
    (map-side combined), one shuffle join of the exploded corpus
    against it keyed on the word (NOT broadcast — a web vocabulary is
    not broadcast-scale), one doc-keyed aggregate.

    ``keep_cols`` passes document columns through on the SAME final
    doc-keyed projection — the consumer never joins back to the
    corpus to re-attach them (a corpus-sized equi-join that a stats
    misestimate can turn into a corpus-sized broadcast; observed: a
    3.7 GiB HashedRelation at 2M docs before perplexity_buckets
    switched to this passthrough).
    """
    w = f"filter(split(lower({text_col}), '[^a-z0-9\\']+'), t -> t != '')"
    words = documents.select(
        F.col(id_col), F.explode(F.expr(w)).alias("word")
    )
    counts = words.groupBy("word").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("tot"),
        F.count("*").alias("n_distinct"),
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "word",
        (-F.log((F.col("n") + 1)
                / (F.col("tot") + F.col("n_distinct")).cast("double"))
         ).alias("ll"),
    )
    scored = (
        words.join(lm, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(F.avg("ll"), 4).alias("mean_logloss"),
        )
    )
    return (
        documents.select(id_col, *[F.col(c) for c in keep_cols])
        .join(scored, id_col, "left")
        .select(
            id_col,
            *[F.col(c) for c in keep_cols],
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("mean_logloss", F.lit(0.0)).alias("mean_logloss"),
        )
    )


def bigram_logloss(documents: DataFrame, lam: float = 0.7,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document interpolated-bigram cross-entropy against the
    corpus's own LM — one order above ``unigram_logloss`` on the
    KenLM ladder (CCNet ranks pages with a 5-gram model; the
    interpolated bigram is the largest order whose training AND
    scoring stay exactly SQL-replayable):

        p(b | a) = λ·c(ab)/c(a) + (1−λ)·(c(b)+1)/(total+V)

    (MLE bigram interpolated with the Laplace unigram, so unseen-in-
    context words never zero out).  ``mean_logloss`` = mean over the
    document's bigrams of −ln p, rounded to 4; documents with < 2
    words report 0.0.  Low = predictable word sequences (fluent
    boilerplate risk), high = incoherent word salad — gates cut both
    tails, and the BIGRAM loss separates shuffled-word spam from
    fluent text where the unigram model cannot (same bag of words,
    different transitions).

    Scale shape mirrors ``unigram_logloss`` one order up: one bigram-
    count shuffle down to the bigram-type relation (map-side
    combined), two vocabulary-keyed joins to attach c(a)/c(b) (the
    bigram-type relation is vocab²-bounded but corpus-sparse — NOT
    broadcast-scale), a 1-row scalar broadcast for the totals, one
    (a, b)-keyed shuffle join of the exploded corpus, one doc-keyed
    aggregate.  The interpolation weight 1−λ is computed by
    SUBTRACTION on both engines (a 0.3 literal is not the double
    1−0.7 — a real cross-engine hash-parity trap).
    """
    w = f"filter(split(lower({text_col}), '[^a-z0-9\\']+'), t -> t != '')"
    docsw = documents.select(
        F.col(id_col), F.expr(w).alias("_w")
    )
    words = docsw.select(id_col, F.explode("_w").alias("word"))
    uc = words.groupBy("word").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = uc.agg(
        F.sum("n").alias("tot"), F.count("*").alias("v")
    )
    big = docsw.where(F.size("_w") >= 2).select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_w) - 1), "
                "i -> struct(element_at(_w, i) AS a, "
                "element_at(_w, i + 1) AS b))"
            )
        ).alias("_g"),
    ).select(id_col, F.col("_g.a").alias("a"), F.col("_g.b").alias("b"))
    bc = big.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("nab")
    )
    lm = (
        bc.join(uc.select(F.col("word").alias("a"),
                          F.col("n").alias("ca")), "a")
        .join(uc.select(F.col("word").alias("b"),
                        F.col("n").alias("cb")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a", "b",
            (-F.log(
                F.lit(lam) * F.col("nab") / F.col("ca")
                + (F.lit(1.0) - F.lit(lam)) * (F.col("cb") + 1)
                / (F.col("tot") + F.col("v")).cast("double")
            )).alias("ll"),
        )
    )
    scored = (
        big.join(lm, ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("ll"), 4).alias("mean_logloss"),
        )
    )
    return (
        documents.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce("mean_logloss", F.lit(0.0)).alias("mean_logloss"),
        )
    )


def perplexity_buckets(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", lang_col: str = "lang",
                       buckets: int = 3,
                       method: str = "exact") -> DataFrame:
    """CCNet head/middle/tail corpus partitioning: split each
    language's documents into ``buckets`` equal-count tiers by LM
    perplexity (Wenzek et al. 2020 §4.3 — the public pipeline cuts
    each language shard into head/middle/tail thirds by KenLM
    perplexity; downstream training mixes sample the tiers at
    different rates).  The LM is ``unigram_logloss``'s corpus-own
    Laplace model; bucket 'head' = lowest mean log-loss (most fluent).

    ``method='exact'``: rank-based — ``bucket = ⌊(rank−1)·B / n⌋``
    over ``(mean_logloss, id)`` within each language.  All-integer
    arithmetic on a 4-decimal-rounded score, so the tier boundary is
    bit-identical on any engine (the DuckDB oracle replays it).

    ``method='sketch'``: the 100-TB path.  The exact path sorts every
    language shard inside one window partition — the same single-task
    hot-partition hazard the paragraph-dedup de-skew removed; at web
    scale a language IS the corpus (English ≈ half of Common Crawl).
    CCNet itself does not rank globally either — it derives fixed
    perplexity THRESHOLDS from a sample and assigns tiers by
    comparison.  Here: per-language ``percentile_approx`` quantiles
    (a map-side-combinable sketch aggregate, one tiny shuffle), a
    languages-sized broadcast join, and a pure comparison per row —
    no global sort, no window, skew-immune.  Tier populations are
    approximate at the boundaries (sketch accuracy 1e-4 relative
    rank), which is exactly the CCNet trade.

    ``method='discrete'``: the 100-TB path when determinism matters
    (resume contracts, cross-cluster-size reproducibility — the
    sketch's partial merge order is partition-dependent).  The score
    is ROUNDED to 4 decimals, so its domain is bounded (~10^5
    distinct values) regardless of corpus size: one map-side-combined
    count per (lang, score), EXACT cumulative thresholds over that
    domain-sized relation (the window here sorts ≤ domain rows per
    language, corpus-size-independent), then a broadcast join assigns
    every doc the tier of its score group's first member in the exact
    ranking.  Identical to ``exact`` whenever no score group spans a
    tier boundary; when one does, the whole group takes the earlier
    tier (value-threshold semantics — CCNet's own).  Bit-identical at
    any parallelism.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    # lang rides the scorer's own doc-keyed projection (keep_cols) —
    # re-attaching it with a corpus self-join here measured as a
    # 3.7 GiB mis-broadcast at 2M docs
    scored = unigram_logloss(
        documents, id_col=id_col, text_col=text_col,
        keep_cols=(lang_col,),
    ).select(id_col, lang_col, "mean_logloss")
    names = (
        F.when(F.col("_b") == 0, F.lit("head"))
        .when(F.col("_b") == buckets - 1, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    if method == "exact":
        from pyspark.sql import Window

        win = Window.partitionBy(lang_col).orderBy("mean_logloss", id_col)
        ranked = scored.select(
            id_col, lang_col, "mean_logloss",
            F.row_number().over(win).alias("_rn"),
            F.count("*").over(Window.partitionBy(lang_col)).alias("_n"),
        )
        return ranked.select(
            id_col, lang_col, "mean_logloss",
            ((F.col("_rn") - 1) * buckets / F.col("_n"))
            .cast("long").alias("_b"),
        ).select(
            id_col, lang_col, "mean_logloss",
            names.alias("ppl_bucket"),
        )
    if method == "sketch":
        qs = [i / buckets for i in range(1, buckets)]
        cuts = scored.groupBy(lang_col).agg(
            F.percentile_approx(
                "mean_logloss", qs, 10_000
            ).alias("_cuts")
        )
        cuts = cuts.select(
            F.col(lang_col).alias("_lang2"), "_cuts"
        )
        # null-safe join key: docs whose lang-ID failed (NULL lang)
        # form their own tier group instead of silently vanishing
        assigned = scored.join(
            F.broadcast(cuts),
            scored[lang_col].eqNullSafe(cuts["_lang2"]),
        ).select(
            id_col, lang_col, "mean_logloss",
            F.aggregate(
                "_cuts", F.lit(0).cast("long"),
                lambda acc, c: acc + F.when(
                    F.col("mean_logloss") > c, F.lit(1).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ).alias("_b"),
        )
        return assigned.select(
            id_col, lang_col, "mean_logloss", names.alias("ppl_bucket")
        )
    if method == "discrete":
        from pyspark.sql import Window

        counts = scored.groupBy(lang_col, "mean_logloss").agg(
            F.count("*").alias("_c")
        )
        wlang = Window.partitionBy(lang_col)
        worder = wlang.orderBy("mean_logloss")
        # tier of the score GROUP = tier its first member holds in the
        # exact ranking: floor(cum_before * B / n), all-integer
        assign = counts.select(
            F.col(lang_col).alias("_lang2"),
            F.col("mean_logloss").alias("_mll2"),
            (
                (F.sum("_c").over(worder) - F.col("_c")) * buckets
                / F.sum("_c").over(wlang)
            ).cast("long").alias("_b"),
        )
        # null-safe keys: a NULL-lang group buckets like any other
        # (the exact path already keeps it — methods must agree)
        return scored.join(
            F.broadcast(assign),
            scored[lang_col].eqNullSafe(assign["_lang2"])
            & scored["mean_logloss"].eqNullSafe(assign["_mll2"]),
        ).select(
            id_col, lang_col, "mean_logloss", names.alias("ppl_bucket")
        )
    raise ValueError(f"unknown method {method!r}")
