"""Training-data curation: one-pass filter → dedup → sample selection.

The composition a large-scale training-data pipeline runs over every
crawl: language gate, quality gates (textstats heuristics), exact dedup
(min-id representative per content digest), deterministic hash sampling
to a target fraction — each document labeled with the FIRST gate that
dropped it, so the same plan yields both the curated corpus and the
drop-reason audit the pipeline's dashboards need.

Shape at scale: everything is one corpus scan (tokens projected once and
shared by every gate expression — all JVM-side builtins) plus exactly
one shuffle, the digest-keyed window for duplicate ranking.  The
drop-reason rollup is a map-side-combinable count over ~6 keys.  The
sample gate hashes content (md5-derived, engine-portable) rather than
using ``rand()`` — reruns and resumes select the identical subset, the
determinism the resumability contract requires.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from onto_text_tag_spark.operators.dedup import content_digest
from onto_text_tag_spark.operators.textstats import (
    lang_id_col,
    quality_cols,
    token_count_cols,
)

REASONS = ("lang", "too_short", "low_quality", "contaminated",
           "duplicate", "sampled_out", "kept")


def _normalize_grams(grams: list[str], n: int) -> list[str]:
    """Push every benchmark gram through the SAME tokenizer the document
    side uses (lower + split on ``[^a-z0-9_]+``).  A gram that does not
    normalize to exactly ``n`` tokens can never match the document
    n-gram stream — raising beats a decontamination gate that silently
    fails open (and normalization makes the grams safe to embed as SQL
    literals: no quotes, backslashes, or newlines survive it)."""
    import re

    norm: set[str] = set()
    bad: list[tuple[str, int]] = []
    for g in grams:
        toks = [t for t in re.split(r"[^a-z0-9_]+", str(g).lower()) if t]
        if len(toks) != n:
            bad.append((str(g), len(toks)))
        else:
            norm.add(" ".join(toks))
    if bad:
        raise ValueError(
            f"decontamination grams must normalize to exactly {n} "
            f"[a-z0-9_] tokens (doc-side tokenizer); offending grams "
            f"(gram, n_tokens): {bad[:5]}"
            + (f" ... and {len(bad) - 5} more" if len(bad) > 5 else "")
        )
    return sorted(norm)


def _contamination_count(text_col: str, grams: list[str], n: int):
    """Column: how many of ``grams`` (distinct word n-grams, all size n)
    occur in ``text_col`` — one nested JVM expression, shareable by any
    single-scan gate stack.  ``grams`` are normalized (and validated)
    through ``_normalize_grams`` first, so the generated literals are
    token-safe by construction."""
    gram_list = ", ".join(
        "'" + g + "'" for g in _normalize_grams(grams, n)
    )
    toks = f"filter(split(lower({text_col}), '[^a-z0-9_]+'), t -> t != '')"
    # if-guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch, not a clamped bound
    doc_grams = (
        f"if(size({toks}) >= {n},"
        f" array_distinct(transform("
        f"  sequence(1, size({toks}) - {n - 1}),"
        f"  i -> concat_ws(' ', slice({toks}, i, {n})))),"
        f" array())"
    )
    return F.expr(
        f"size(array_intersect({doc_grams}, array({gram_list})))"
    ).cast("long")


def curation_flags(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_ws_tokens: int = 20,
    min_stopword_ratio: float = 0.01,
    sample_mod: int = 10,
    sample_keep: int = 8,
    benchmark_ngrams: list[str] | None = None,
    decontam_n: int = 2,
) -> DataFrame:
    """Per-document audit row: profile columns + ``reason`` ∈ REASONS.

    Gate order (pinned; each doc reports its FIRST failure):
    1. ``lang`` — predicted language ≠ ``lang``;
    2. ``too_short`` — fewer than ``min_ws_tokens`` whitespace tokens;
    3. ``low_quality`` — stopword ratio below ``min_stopword_ratio``;
    4. ``contaminated`` — contains a benchmark ``decontam_n``-gram (only
       when ``benchmark_ngrams`` is given; same single-scan expression
       as ``decontaminate``);
    5. ``duplicate`` — same content digest as a smaller-id doc that also
       passed gates 1-4 (dedup ranks only among survivors: a duplicate
       of a dropped doc is NOT dropped as a duplicate, and a
       contaminated document never occupies a survivor slot);
    6. ``sampled_out`` — digest mod ``sample_mod`` ≥ ``sample_keep``
       (keeps sample_keep/sample_mod of survivors, content-deterministic);
    else ``kept``.
    """
    cols = [
        F.col(id_col),
        *token_count_cols(text_col),
        *quality_cols(text_col),
        lang_id_col(text_col).alias("lang_pred"),
        content_digest(text_col).alias("digest"),
    ]
    if benchmark_ngrams:
        grams = sorted(
            {g.strip().lower() for g in benchmark_ngrams if g.strip()}
        )
        cols.append(
            (_contamination_count(text_col, grams, decontam_n) > 0)
            .alias("contaminated")
        )
    else:
        cols.append(F.lit(False).alias("contaminated"))
    prof = documents.select(*cols)
    passed = (
        (F.col("lang_pred") == lang)
        & (F.col("ws_tokens") >= min_ws_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & ~F.col("contaminated")
    )
    # among gate-survivors sharing a digest, the min-id row ranks 1;
    # failed rows sort after every survivor so they never steal rank 1
    w = Window.partitionBy("digest").orderBy(
        F.col("_passed").desc(), F.col(id_col).asc()
    )
    flagged = (
        prof.withColumn("_passed", passed)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "reason",
            F.when(F.col("lang_pred") != lang, F.lit("lang"))
            .when(F.col("ws_tokens") < min_ws_tokens, F.lit("too_short"))
            .when(
                F.col("stopword_ratio") < min_stopword_ratio,
                F.lit("low_quality"),
            )
            .when(F.col("contaminated"), F.lit("contaminated"))
            .when(F.col("_rk") > 1, F.lit("duplicate"))
            .when(
                F.pmod(F.col("digest"), F.lit(sample_mod)) >= sample_keep,
                F.lit("sampled_out"),
            )
            .otherwise(F.lit("kept")),
        )
        .drop("_passed", "_rk")
    )
    return flagged


def curate_corpus(documents: DataFrame, **kwargs) -> DataFrame:
    """The curated corpus: ids + profile of every ``kept`` document."""
    return (
        curation_flags(documents, **kwargs)
        .where(F.col("reason") == "kept")
        .drop("reason", "digest", "contaminated")
    )


def curation_stats(documents: DataFrame, **kwargs) -> DataFrame:
    """(reason, n_docs, ws_tokens) rollup — the audit the pipeline
    publishes per crawl batch: how much was dropped, why, and how many
    tokens survived."""
    return (
        curation_flags(documents, **kwargs)
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
        )
    )


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_frac: float = 0.0,
    mod: int = 10000,
) -> DataFrame:
    """Deterministic per-stratum subsampling — the data-mixing knob
    (keep 100% of curated English, 30% of lower-resource strata, 5% of
    code, ...).  A doc is kept iff
    ``md5_long(stratum ':' id) mod 10000 < frac * 10000``: pure function
    of (stratum, id), so reruns/resumes/two clusters select the same
    subset (``rand()`` cannot), strata decorrelate (the id's hash draw
    differs per stratum), and membership is monotone in ``frac`` — a
    raised rate keeps every previously-kept doc, so mixing-weight bumps
    are incremental, not a reshuffle.  No shuffle at all: the gate is a
    scan-local filter.
    """
    pairs = [p for kv in fractions.items() for p in kv]
    frac_map = F.create_map(*[F.lit(x) for x in pairs])
    frac = F.coalesce(
        frac_map[F.col(strata_col)], F.lit(float(default_frac))
    )
    from onto_text_tag_spark.functions.hashing import md5_long

    draw = F.pmod(
        md5_long(
            F.concat(
                F.col(strata_col).cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ),
        F.lit(mod),
    )
    return documents.where(draw < frac * mod)


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    order_cols: tuple = ("doc_id", "chunk_id"),
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(group, bin, *order_cols, n_tokens, bin_fill) — streaming
    sequence packing: assign chunks to fixed-token-budget training bins
    in deterministic order, the context-length packing step between
    chunking and batch assembly.

    Streaming (next-fit) packing, not first-fit: a chunk goes to the
    current bin until the budget would overflow, then opens the next —
    expressible as ONE window per group (running token sum ordered by
    ``order_cols``; bin = ⌊(cumsum − tokens) / budget⌋), where true
    first-fit is inherently sequential.  Waste vs first-fit is bounded
    by one chunk per bin and the order is content-deterministic, so
    reruns pack identically.  ``bin_fill`` is the bin's running fill
    after this chunk (audit: fill ≤ budget + max_chunk − 1).  Groups
    partition the window — no global sort, scales with the group count.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    b = F.floor((cum - F.col(tokens_col)) / budget).cast("long")
    out_cols = [F.col(group_col), b.alias("bin")]
    out_cols += [F.col(c) for c in order_cols]
    out_cols += [
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (cum - b * budget).cast("long").alias("bin_fill"),
    ]
    return chunks.select(*out_cols)


def decontaminate(
    documents: DataFrame,
    benchmark_ngrams: list[str],
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag documents whose token stream
    contains any n-gram from an evaluation set — the contamination gate
    every training-data pipeline must run before a model ships (eval
    examples leaking into pretraining data invalidate the benchmark).

    Shape at scale: the benchmark n-gram set is SMALL (a few 10^5 grams
    for a full eval suite) and the corpus is not — so the set ships as
    a broadcast literal / broadcast join and detection is one corpus
    scan with a JVM set-overlap per row (``arrays_overlap`` against the
    doc's distinct n-gram array), no shuffle, no Python.  Output adds
    ``contaminated`` (bool) and ``n_contaminated_grams`` (how many
    distinct benchmark grams the doc contains — triage signal:
    1 gram ≈ idiom collision, 20 grams ≈ verbatim eval copy).

    ``benchmark_ngrams``: token n-grams, all the same ``n`` (mixed
    sizes: call once per size and OR the flags).  Each gram is
    normalized through the document-side tokenizer; a gram that does
    not yield exactly ``n`` tokens raises (it could never match, and a
    silently-open contamination gate is worse than an error).
    """
    grams = sorted({g.strip().lower() for g in benchmark_ngrams if g.strip()})
    return (
        documents
        .withColumn(
            "n_contaminated_grams",
            _contamination_count(text_col, grams, n),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )


# PII redaction patterns — shared verbatim by the Spark path and the SQL
# twin (Java regex and RE2 agree on this subset: no backrefs, no
# lookaround).  Order matters: emails first so the phone pattern cannot
# eat digits out of an address' local part.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(
    documents: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """PII scrubbing: replace emails / IPv4 addresses / phone-shaped
    digit runs with typed placeholder tokens — the redaction pass a
    web-corpus training pipeline runs before anything persists to the
    training store.

    One corpus scan, a chain of JVM ``regexp_replace`` expressions
    inside whole-stage codegen — no UDF, no shuffle; per-pattern hit
    counts (pre-replacement) come from the same scan so the audit and
    the redaction share one pass.  The pattern list is deliberately
    conservative/deterministic (regex, not ML NER) so the SQL twin can
    reproduce the output byte-for-byte; a learned NER redactor would
    slot in as a mapInPandas stage like the tagger.
    """
    redacted = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        # function form with lit patterns — the SQL-literal parser must
        # not reinterpret backslashes (\b, \d) in the regex
        counts.append(
            F.coalesce(
                F.size(F.regexp_extract_all(
                    F.col(text_col), F.lit(pat), F.lit(0))),
                F.lit(0),
            ).cast("long").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, F.lit(pat), F.lit(repl))
    return documents.select(
        "*", *counts
    ).withColumn(out_col, redacted)


def assign_splits(
    documents: DataFrame,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    test_n: int = 0,
    valid_n: int = 0,
    seed: str = "split",
) -> DataFrame:
    """Exact-size train/valid/test assignment: per stratum, the
    ``test_n`` smallest seeded-hash ranks become ``test``, the next
    ``valid_n`` become ``valid``, the rest ``train``.

    Deterministic (md5 of ``seed:id`` — no rand(): reruns, resumes and
    different cluster sizes assign identically) and exact-COUNT, which
    is what held-out evaluation sets need; the rate-based
    ``stratified_sample`` stays the shuffle-free path when proportions,
    not counts, are the contract.  Adding documents later never moves an
    existing doc OUT of test/valid into train's direction arbitrarily —
    membership changes only when a new doc hashes below the current
    boundary, the standard rank-gate property.

    Scale shape: one hash-ranked window per stratum.  Ranking is the
    honest cost of exactness — but only ranks ≤ test_n+valid_n matter,
    so at extreme scale pre-filter with a generous hash threshold first
    and rank the survivors; the assignment is identical.
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    h = md5_long(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    strata = F.col(strata_col) if strata_col else F.lit("all")
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(id_col).asc())
    rk = F.row_number().over(w)
    return documents.withColumn(
        "split",
        F.when(rk <= test_n, F.lit("test"))
        .when(rk <= test_n + valid_n, F.lit("valid"))
        .otherwise(F.lit("train")),
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    num_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw-corpus document by how target-domain-like its hashed
    n-gram profile is.  ``log_weight`` = Σ over the document's grams of
    ``log p_target(bucket) − log p_raw(bucket)`` — resample the raw
    corpus ∝ exp(weight) to skew a web crawl toward a quality target
    (the Pile/Wikipedia in the paper; any curated slice here).

    Mechanics (all deterministic, fully SQL-replayable):

    * grams = word unigrams + bigrams (the engine's standard
      ``[a-z0-9']`` tokenization), hashed into ``num_buckets`` buckets
      via the portable md5 hash — the fixed feature space that makes
      two corpus distributions comparable without a vocabulary.
    * bucket distributions are Laplace-smoothed:
      ``(count + 1) / (total + num_buckets)`` — zero-count buckets
      stay finite on both sides.
    * documents with no grams score 0.0.

    Scale shape: one gram-explode + bucket count per corpus (map-side
    combined, output is ``num_buckets`` rows), the per-bucket
    log-ratio table broadcasts back, and the per-doc sum is one hash
    aggregate keyed on the document id.  The raw corpus is touched
    twice (counts + scoring), the target once — no joins above
    broadcast scale.
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    def grams(df: DataFrame) -> DataFrame:
        w = f"filter(split(lower({text_col}), '[^a-z0-9\\']+'), t -> t != '')"
        bi = (
            f"CASE WHEN size(w) >= 2 THEN transform(sequence(1, "
            f"size(w) - 1), i -> concat(element_at(w, i), ' ', "
            f"element_at(w, i + 1))) ELSE array() END"
        )
        return (
            df.select(F.col(id_col), F.expr(w).alias("w"))
            .select(
                id_col,
                F.explode(F.expr(f"concat(w, {bi})")).alias("g"),
            )
            .select(
                id_col,
                F.pmod(md5_long(F.col("g")), F.lit(num_buckets))
                .alias("bucket"),
            )
        )

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        return grams(df).groupBy("bucket").agg(
            F.count("*").cast("long").alias(name)
        )

    t_counts = bucket_counts(target, "t_n")
    r_counts = bucket_counts(raw, "r_n")
    ratios = (
        t_counts.join(r_counts, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_n", F.lit(0)).alias("t_n"),
            F.coalesce("r_n", F.lit(0)).alias("r_n"),
        )
        .crossJoin(
            F.broadcast(
                t_counts.agg(F.sum("t_n").alias("t_tot"))
                .crossJoin(r_counts.agg(F.sum("r_n").alias("r_tot")))
            )
        )
        .select(
            "bucket",
            (
                F.log((F.col("t_n") + 1)
                      / (F.col("t_tot") + num_buckets).cast("double"))
                - F.log((F.col("r_n") + 1)
                        / (F.col("r_tot") + num_buckets).cast("double"))
            ).alias("log_ratio"),
        )
    )
    scored = (
        grams(raw)
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(F.sum("log_ratio"), 4).alias("log_weight"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def nb_quality_score(
    documents: DataFrame,
    is_target: Column,
    num_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Closed-form Naive-Bayes quality classifier — the
    "high-quality-document classifier" gate of GPT-3-era curation
    (Brown et al. 2020 filtered Common Crawl with a classifier trained
    positive = curated corpora, negative = raw crawl; fastText linear
    classifiers fill the same role in CCNet/RedPajama).  SGD-trained
    classifiers are not replayable in SQL, so this uses the multinomial
    Naive-Bayes closed form — pure count arithmetic, deterministic,
    bit-reproducible by the DuckDB oracle — over the same hashed
    word-bucket feature space as `dsir_importance`.

    ``is_target`` labels the positive (curated) slice; everything else
    is the negative class.  Per document:

        nb_logodds = ln(P(target)/P(other))              [doc-count prior]
                   + Σ_tokens ln(P(bucket|target)/P(bucket|other))

    with Laplace-smoothed per-class bucket likelihoods
    ``(count + 1) / (class_total + num_buckets)``.  ``pred_target``
    is the MAP decision (logodds > 0) — the keep/drop gate.  Token-less
    documents score exactly the prior.

    Where DSIR answers "how should I RESAMPLE the crawl toward the
    target distribution" (importance ratio, no prior, no decision),
    this answers "is this page high-quality, yes or no" (posterior
    odds + MAP label) — the two gates curation stacks use together.

    Scale shape: one token-explode + per-class bucket count (map-side
    combined to ≤ 2·num_buckets rows), the log-likelihood-ratio table
    and the scalar priors broadcast back, one doc-keyed aggregate.
    No join above broadcast scale; the corpus is scanned twice
    (counting, scoring).
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    toks = (
        f"filter(split(lower({text_col}), '[^a-z0-9\\']+'), "
        "t -> t != '')"
    )
    labeled = documents.select(
        F.col(id_col), is_target.alias("_t"), F.expr(toks).alias("_w")
    )
    # fail loud on a degenerate training slice: with zero docs in
    # either class the prior ln(t_docs/o_docs) is NULL and every row's
    # nb_logodds / pred_target silently nulls out — a misconfigured
    # is_target would otherwise pass unnoticed through the gate
    # (same convention as _normalize_grams; the check scans only the
    # label column, so column pruning keeps it cheap)
    _cls = labeled.agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t"),
        F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("o"),
    ).collect()[0]
    if not _cls["t"] or not _cls["o"]:
        raise ValueError(
            f"nb_quality_score: both classes need at least one "
            f"document (target={_cls['t'] or 0}, "
            f"other={_cls['o'] or 0}) — is_target labels a "
            "degenerate training slice"
        )
    buckets = labeled.select(
        id_col,
        "_t",
        F.explode("_w").alias("tok"),
    ).select(
        id_col, "_t", F.pmod(md5_long(F.col("tok")), F.lit(num_buckets)).alias("bucket")
    )
    counts = (
        buckets.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_n"),
            F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("o_n"),
        )
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("t_n").alias("t_tot"), F.sum("o_n").alias("o_tot")
        ).crossJoin(
            labeled.agg(
                F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_docs"),
                F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("o_docs"),
            )
        )
    )
    llr = counts.crossJoin(totals).select(
        "bucket",
        (
            F.log((F.col("t_n") + 1)
                  / (F.col("t_tot") + num_buckets).cast("double"))
            - F.log((F.col("o_n") + 1)
                    / (F.col("o_tot") + num_buckets).cast("double"))
        ).alias("llr"),
    )
    prior = F.log(F.col("t_docs") / F.col("o_docs").cast("double"))
    scored = (
        buckets.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("llr").alias("_sum_llr"),
        )
    )
    return (
        labeled.select(id_col)
        .join(scored, id_col, "left")
        .crossJoin(totals.select("t_docs", "o_docs"))
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.round(
                F.coalesce("_sum_llr", F.lit(0.0)) + prior, 4
            ).alias("nb_logodds"),
            (F.coalesce("_sum_llr", F.lit(0.0)) + prior > 0)
            .alias("pred_target"),
        )
    )


def importance_resample(
    documents: DataFrame,
    n: int,
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic importance resampling — step 2 of DSIR (Xie et al.
    2023 resample the raw corpus ∝ exp(log_weight); the same Gumbel
    trick implements Efraimidis–Spirakis weighted reservoir sampling):
    draw n documents WITHOUT replacement with probability proportional
    to their importance weight, using the Gumbel-top-k identity

        key = log_weight − ln(−ln(u)),   u = portable-md5 uniform(0,1)

    — the n largest keys are exactly a weighted sample.  All noise
    comes from the seeded md5 hash of the document id, so reruns and
    any cluster size select the IDENTICAL subset (no ``rand()``), and
    the DuckDB oracle replays the draw bit-for-bit.  The key is rounded
    to 6 decimals before ranking (deterministic id tie-break), so an
    ulp-level libm divergence between engines cannot flip the selected
    set except on a ~1e-16-wide rounding boundary.

    Scale shape: one scan computing the key, then a global top-n —
    Catalyst executes ``orderBy().limit(n)`` as TakeOrderedAndProject
    (per-partition heaps + driver merge of n rows), never a full sort.
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    denom = float((1 << 60) + 1)
    u = (
        md5_long(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        )
        + 1
    ) / F.lit(denom)
    key = F.round(F.col(weight_col) - F.log(-F.log(u)), 6)
    return (
        documents.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def bloom_bits(grams: list[str], m_bits: int = 1 << 15,
               k: int = 3) -> list[int]:
    """Driver-side Bloom bitset over a benchmark n-gram set: ``k``
    seeded portable-md5 probes per gram, packed 32 bits per BIGINT word
    (all words < 2^32, so ``>>`` agrees between the JVM and every SQL
    engine — no signed-shift divergence at bit 63).  Pure function of
    the gram set, so tests and the DuckDB oracle rebuild it exactly."""
    import hashlib

    words = [0] * (m_bits // 32)
    for g in sorted({x.strip().lower() for x in grams if x.strip()}):
        for s in range(k):
            h = int(
                hashlib.md5(f"{s}:{g}".encode()).hexdigest()[:15], 16
            ) % m_bits
            words[h // 32] |= 1 << (h % 32)
    return words


def bloom_decontaminate(
    documents: DataFrame,
    benchmark_ngrams: list[str],
    text_col: str = "text",
    n: int = 2,
    m_bits: int | None = None,
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the 100 TB
    form of ``decontaminate``: a full eval-suite gram set (10^6-10^7
    grams) is too big to ship as an ``array_intersect`` literal or to
    broadcast-join per doc-gram, but its Bloom bitset is a few MB of
    longs that constant-folds into the scan.  Detection stays one
    corpus scan with a per-row JVM fold — no shuffle, no Python, no
    join — at a documented false-positive cost:

        fp_rate ≈ (1 − e^(−k·|grams| / m_bits))^k

    (≈0.1% for 10^5 grams at m=2^21, k=3).  Bloom NEVER misses a real
    contaminated gram (no false negatives), so the gate is safe in the
    drop direction; flagged docs can be re-checked against the exact
    set off the hot path when the FP cost matters.

    Same tokenization and gram normalization as ``decontaminate``;
    output adds ``n_bloom_hits`` (distinct doc grams hitting the
    filter) and ``bloom_contaminated``.

    ``m_bits=None`` (the default) sizes the filter from the gram set:
    ~16 bits per gram rounded up to a power of two (fp ≈ 0.4% at k=3),
    floored at 2^15 — a fixed small default silently saturates on a
    real 10^6-gram eval suite and flags every document.  An explicit
    ``m_bits`` that implies fp > 1% raises: a decontamination gate
    that mostly fires on noise is a misconfiguration, not a setting.
    """
    # the bitset MUST be built from the NORMALIZED grams (the exact
    # strings the doc side probes with) — hashing raw 'hash-join' while
    # probing 'hash join' is a silent false negative, violating the
    # no-false-negative safety claim above
    norm = _normalize_grams(
        sorted({g.strip().lower() for g in benchmark_ngrams
                if g.strip()}), n
    )
    if m_bits is None:
        m_bits = max(1 << 15, 1 << (16 * max(len(norm), 1) - 1).bit_length())
    fp_rate = (1.0 - math.exp(-k * len(norm) / m_bits)) ** k
    if fp_rate > 0.01:
        raise ValueError(
            f"bloom_decontaminate: m_bits={m_bits} with {len(norm)} "
            f"grams at k={k} implies fp_rate≈{fp_rate:.3f} (> 1%); "
            "the filter is saturated — raise m_bits (or leave it None "
            "to auto-size at ~16 bits/gram)"
        )
    words = bloom_bits(norm, m_bits=m_bits, k=k)
    bits = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    toks = f"filter(split(lower({text_col}), '[^a-z0-9_]+'), t -> t != '')"
    doc_grams = (
        f"if(size({toks}) >= {n},"
        f" array_distinct(transform("
        f"  sequence(1, size({toks}) - {n - 1}),"
        f"  i -> concat_ws(' ', slice({toks}, i, {n})))),"
        f" array())"
    )

    def probe(seed: int) -> str:
        h = (
            f"pmod(cast(conv(substring(md5(cast(concat('{seed}:', g) "
            f"as binary)), 1, 15), 16, 10) as bigint), {m_bits})"
        )
        return (
            f"(shiftright(element_at({bits}, "
            f"cast({h} div 32 as int) + 1), "
            f"cast({h} % 32 as int)) & 1) = 1"
        )

    member = " AND ".join(probe(s) for s in range(k))
    return (
        documents.withColumn(
            "n_bloom_hits",
            F.expr(
                f"size(filter({doc_grams}, g -> {member}))"
            ).cast("long"),
        )
        .withColumn("bloom_contaminated", F.col("n_bloom_hits") > 0)
    )
