"""Deduplication operators for web-scale corpora.

Five strategies, each correct at 100 TB because none ever pairs all
documents against all documents:

* exact          — hash-groupBy on a normalized-content digest (1 shuffle)
* minhash_lsh    — shingles → MinHash signature → banded LSH buckets →
                   candidate pairs only within buckets (shuffle on band
                   key, quadratic only within a bucket)
* simhash        — 16-bit SimHash over tokens; near-dups collide on the
                   exact SimHash value (or Hamming-adjacent probes)
* ngram_jaccard  — exact Jaccard verification of LSH candidates (the
                   verify stage of the classic LSH→verify pipeline)
* embedding near-dup — cosine over an embedding column (see similarity.py)

Everything is deterministic md5-based hashing (functions/hashing.py) so
the DuckDB oracle reproduces identical values — no Spark-internal
``hash()`` in any semantically-visible output.

Skew note: a boilerplate-heavy web corpus has mega-buckets (the empty
page, the default Apache page...).  ``max_bucket_size`` caps candidate
generation per bucket; the dropped buckets are exact-duplicate groups
anyway, which the exact pass already collapses cheaply.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from onto_text_tag_spark.functions.hashing import (
    char_shingles,
    md5_long,
    minhash_signature,
    seeded_hash,
    word_shingles,
)


def content_digest(text_col: str = "text") -> Column:
    """Normalized content hash: whitespace-collapsed lowercase text."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return md5_long(normalized)


def exact_duplicates(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of exact (normalized) duplicates: digest → ids + count.

    One shuffle on the digest; map-side partial agg absorbs hot digests.
    """
    return (
        documents.select(
            F.col(id_col), content_digest(text_col).alias("digest")
        )
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list(id_col)).alias("ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per digest group."""
    w = Window.partitionBy("digest").orderBy(F.col(id_col).asc())
    return (
        documents.withColumn("digest", content_digest(text_col))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "digest")
    )


def minhash_signatures(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       shingle_k: int = 5,
                       shingle_mode: str = "char",
                       extras: dict | None = None) -> DataFrame:
    """(id, sig: array<long>, *extras) MinHash signatures.

    ``extras``: {name: Column} computed in the SAME scan — the dedup job
    rides the content digest along so exact-dup detection never re-reads
    the corpus (one full-corpus scan instead of two)."""
    return _with_shingles(documents, text_col, shingle_k, shingle_mode).select(
        F.col(id_col),
        minhash_signature("_shingles", num_hashes).alias("sig"),
        *[c.alias(n) for n, c in (extras or {}).items()],
    )


def _with_shingles(documents: DataFrame, text_col: str, k: int,
                   mode: str = "char") -> DataFrame:
    """``mode``: "char" (k-char grams — fine for distinct-vocabulary
    fixtures and the oracle-checked queries) or "word" (k-word grams —
    the web-scale default; see ``word_shingles`` for why char grams
    degenerate on shared-vocabulary corpora)."""
    fn = {"char": char_shingles, "word": word_shingles}[mode]
    return documents.withColumn("_shingles", fn(text_col, k))


def minhash_signatures_np(documents: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", num_hashes: int = 16,
                          shingle_k: int = 5,
                          shingle_mode: str = "word",
                          method: str = "oph",
                          extras: dict | None = None,
                          with_shingles: bool = False) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures — the vectorized scale
    path used by jobs/dedup_corpus.py.

    ``minhash_signature`` (md5 + aggregate/zip_with) is bit-reproducible
    in DuckDB, which the oracle-checked queries need — but Spark
    evaluates higher-order-function lambdas interpreted, per element:
    at ~600 shingles × 16 permutations per web page that path measured
    minutes-per-million-docs-per-core.  Here the whole signature is
    numpy inside an Arrow-batched pandas UDF, permuted with the SAME
    universal-hash family (a·u+b mod 2³¹−1, functions/hashing.py
    minhash_coeffs) broadcast across a (num_hashes, n_shingles) matrix.

    ``shingle_mode="word"`` (default — the web-dedup unit, see
    ``word_shingles``): tokens hash once each via crc32 (memoized per
    Arrow batch), then every k-token window folds polynomially mod
    2³¹−1 over a stride view — no per-window string building.
    ``shingle_mode="char"``: byte k-grams packed into uint64 via a
    stride view (k ≤ 8 bytes — no string hash at all), deduped with
    np.unique.  Shingle values differ from ``char_shingles`` /
    ``word_shingles`` (no md5 fold), so signatures are NOT comparable
    across the np and portable paths — banding, bucketing, and Jaccard
    verification downstream are agnostic to which produced the
    signature.

    ``method="oph"`` (default): one-permutation hashing — one hash per
    shingle, min per hash-space bin, rotation densification
    (functions/hashing.py oph_signature_np).  O(n) per doc and measured
    43× faster than the O(num_hashes·n) permute matrix at equal
    signature width.  ``method="dense"`` keeps the classic
    universal-hash permutation family (one min per permutation).
    Signatures from the two methods are NOT comparable with each other.

    ``with_shingles=True`` also emits the deduped hashed-shingle array
    itself as an ``sh`` column — the SAME values ``shingle_hashes_np``
    produces, from the same single kernel pass over the text.  Storing
    ~4 KB of shingle hashes per doc alongside the signature makes exact
    near-dup VERIFICATION a fingerprint-store-only operation
    (``jaccard_from_shingle_arrays``): incremental absorbs and
    streaming ingest then never re-read document text.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from onto_text_tag_spark.functions.hashing import (
        MOD_PRIME,
        minhash_coeffs,
        oph_signature_np,
    )

    if method not in ("oph", "dense"):
        raise ValueError(f"method must be oph|dense, got {method}")

    coeffs = minhash_coeffs(num_hashes)
    a = np.array([c[0] for c in coeffs], dtype=np.uint64)[:, None]
    b = np.array([c[1] for c in coeffs], dtype=np.uint64)[:, None]
    p = np.uint64(MOD_PRIME)
    empty_sig = [MOD_PRIME] * num_hashes  # aggregate identity (no shingles)
    make_vals = _hashed_shingle_kernel(shingle_k, shingle_mode)

    def _sig(u) -> "list | np.ndarray":
        if u is None:
            return empty_sig
        if method == "oph":
            return oph_signature_np(u, num_hashes).astype(np.int64)
        # a,u,b < 2^31 -> a*u+b < 2^62: exact in uint64
        return ((a * u + b) % p).min(axis=1).astype(np.int64)

    if with_shingles:

        @pandas_udf("sig array<long>, sh array<long>")
        def sig_sh_udf(texts: pd.Series) -> pd.DataFrame:
            vals = make_vals()
            sigs, shs = [], []
            for t in texts:
                if t is None:
                    sigs.append(None)
                    shs.append(None)
                    continue
                u = vals(t)
                sigs.append(_sig(u))
                shs.append(
                    np.array([], dtype=np.int64) if u is None
                    else u.astype(np.int64)
                )
            return pd.DataFrame({"sig": sigs, "sh": shs})

        packed = documents.select(
            F.col(id_col), sig_sh_udf(F.col(text_col)).alias("_ss"),
            *[c.alias(n) for n, c in (extras or {}).items()],
        )
        return packed.select(
            id_col,
            F.col("_ss.sig").alias("sig"),
            F.col("_ss.sh").alias("sh"),
            *(extras or {}),
        )

    @pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        vals = make_vals()
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            out.append(_sig(vals(t)))
        return pd.Series(out)

    return documents.select(
        F.col(id_col), sig_udf(F.col(text_col)).alias("sig"),
        *[c.alias(n) for n, c in (extras or {}).items()],
    )


def _hashed_shingle_kernel(shingle_k: int, shingle_mode: str):
    """Factory of per-batch kernels: text → uint64 array of DEDUPED
    hashed shingles (< MOD_PRIME), or None when the text has no content.

    One kernel feeds both the MinHash signature UDF and the exact
    hashed-Jaccard verify UDF (``shingle_hashes_np``), so "the shingle
    universe the signatures sketch" and "the shingle universe the exact
    stage intersects" are the same set by construction.

    Word mode: tokens hash once each via crc32 (memoized per batch —
    call the factory's result per batch so the memo can't grow without
    bound across a long-lived executor), then every k-token window
    folds polynomially mod 2³¹−1 over a stride view — no per-window
    string building.  Char mode: byte k-grams packed into uint64 via a
    stride view (k ≤ 8 bytes — no string hash at all).
    """
    import numpy as np

    from onto_text_tag_spark.functions.hashing import MOD_PRIME

    if shingle_mode not in ("char", "word"):
        raise ValueError(f"shingle_mode must be char|word, got {shingle_mode}")
    if shingle_mode == "char":
        assert shingle_k <= 8, "byte shingles are packed into one uint64"

    p = np.uint64(MOD_PRIME)
    pow_chr = (256 ** np.arange(shingle_k - 1, -1, -1)).astype(np.uint64)
    # polynomial fold B^j mod p for word windows (token ids < p)
    TOK_B = 1_000_003
    pow_wrd = np.array(
        [pow(TOK_B, j, MOD_PRIME) for j in range(shingle_k - 1, -1, -1)],
        dtype=np.uint64,
    )

    def make() -> "callable":
        import zlib

        tok_cache: dict[str, int] = {}  # per-batch: vocab << token count

        def tok_id(w: str) -> int:
            h = tok_cache.get(w)
            if h is None:
                h = tok_cache[w] = zlib.crc32(w.encode("utf-8")) % MOD_PRIME
            return h

        def word_vals(t: str) -> "np.ndarray | None":
            toks = t.lower().split()
            if not toks:
                return None
            ids = np.fromiter(
                (tok_id(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            if len(ids) < shingle_k:  # short doc: one whole-text window
                ids = np.pad(ids, (0, shingle_k - len(ids)))
            win = np.lib.stride_tricks.sliding_window_view(ids, shingle_k)
            # ids,pow < 2^31 -> products < 2^62; % p before the sum
            return np.unique((win * pow_wrd % p).sum(axis=1) % p)

        def char_vals(t: str) -> "np.ndarray | None":
            raw = t.lower().encode("utf-8")
            if len(raw) < shingle_k:  # short doc: one zero-padded shingle
                raw = raw.ljust(shingle_k, b"\x00")
            if not raw.strip(b"\x00"):
                return None
            bts = np.frombuffer(raw, dtype=np.uint8)
            win = np.lib.stride_tricks.sliding_window_view(bts, shingle_k)
            # bytes < 256, pow < 256^7 -> products < 2^63: exact in uint64
            return np.unique((win.astype(np.uint64) * pow_chr).sum(axis=1)) % p

        return word_vals if shingle_mode == "word" else char_vals

    return make


def shingle_hashes_np(documents: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle_k: int = 5,
                      shingle_mode: str = "word") -> DataFrame:
    """(id, sh: array<long>) deduped hashed shingles — the vectorized
    input to exact hashed-Jaccard verification at corpus scale.

    The portable ``word_shingles``/``char_shingles`` expressions build
    every shingle as a STRING through interpreted higher-order-function
    lambdas — measured minutes for ~70k web pages (~800 words each) in
    the verify stage of jobs/dedup_corpus.py.  This pandas-UDF path
    reuses the signature stage's numpy kernel and emits 64-bit hashes,
    so the downstream ``array_intersect`` compares longs, not ~30-byte
    strings.  Empty/whitespace-only docs yield an empty array (their
    pairs get null jaccard and are dropped by the threshold filter;
    byte-identical empties are the exact-dedup stage's job).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    make_vals = _hashed_shingle_kernel(shingle_k, shingle_mode)

    @pandas_udf("array<long>")
    def sh_udf(texts: pd.Series) -> pd.Series:
        vals = make_vals()
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            u = vals(t)
            out.append(np.array([], dtype=np.int64) if u is None
                       else u.astype(np.int64))
        return pd.Series(out)

    return documents.select(
        F.col(id_col).alias("id"), sh_udf(F.col(text_col)).alias("sh")
    )


def _band_rows(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) band-key rows from an (id, sig) frame — the
    banding step of MinHash-LSH, shared by the batch candidate pass and
    the incremental delta-vs-base pass (identical keys by construction,
    which is what makes incremental banding rebuild-equivalent)."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_long(
                            F.expr(
                                f"array_join(transform(slice(sig, "
                                f"{b * rows_per_band + 1}, {rows_per_band}), "
                                f"x -> cast(x as string)), ',')"
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int = 200,
    signatures: DataFrame | None = None,
    shingle_mode: str = "char",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    num_hashes/bands rows per band; a pair is a candidate iff it agrees
    on ALL rows of at least one band.  Shuffle key = (band, band-hash) —
    high cardinality, well distributed except boilerplate mega-buckets,
    which ``max_bucket_size`` drops (they are exact-dup territory).
    Output: (id_a, id_b) with id_a < id_b, distinct.

    ``signatures``: optional precomputed (id_col, sig array<long>) frame
    — e.g. ``minhash_signatures_np`` (the vectorized scale path) or a
    prior stage snapshot; by default signatures are derived here with
    the oracle-reproducible md5 family.
    """
    if signatures is not None:
        sigs = signatures.select(F.col(id_col).alias("id"), "sig")
    else:
        sigs = _with_shingles(
            documents, text_col, shingle_k, shingle_mode
        ).select(
            F.col(id_col).alias("id"),
            minhash_signature("_shingles", num_hashes).alias("sig"),
        )
    band_rows = _band_rows(sigs, num_hashes, bands)

    # Joinless bucket expansion (same shape as cooccur.py): a self-join
    # on (band, bucket) would evaluate the expensive signature subplan
    # TWICE (Spark broadcasts one side — no ReusedExchange) and shuffle
    # both.  Instead: ONE shuffle to group ids per bucket, then generate
    # the intra-bucket pairs locally with array transforms.  Quadratic
    # work stays bounded per bucket (max_bucket_size at web scale).
    buckets = band_rows.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    buckets = buckets.where(F.size("ids") > 1)
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def incremental_lsh_pairs(
    base_signatures: DataFrame,
    delta_signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 200,
    broadcast_delta_buckets: bool = True,
) -> DataFrame:
    """LSH candidate pairs INVOLVING at least one delta doc, against an
    already-fingerprinted base corpus — the recall stage of incremental
    dedup (a crawl delta must never re-band, let alone re-shingle, the
    base corpus).

    Rebuild-equivalence: band keys are pure functions of the signature
    (``_band_rows``), so the union of base and delta band rows is
    exactly what a full rebuild over base ∪ delta would bucket.  This
    pass groups that union per bucket — with the SAME size cap a
    rebuild would apply to the union bucket — and emits only the pairs
    a rebuild would add: those with ≥ 1 delta endpoint (base-base pairs
    are committed history in the base root).

    Scale shape: the base side never ships its corpus — only (id, band,
    bucket) rows, and only for buckets that contain a delta member: the
    delta's distinct bucket-key set (delta-sized × bands) is broadcast
    and semi-joins the base band rows before the one grouping shuffle.
    Set ``broadcast_delta_buckets=False`` for deltas too large to
    broadcast (the semi-join then shuffles both sides on the bucket
    key — still narrow rows).
    """
    d_bands = _band_rows(
        delta_signatures.select(F.col(id_col).alias("id"), "sig"),
        num_hashes, bands,
    )
    b_bands = _band_rows(
        base_signatures.select(F.col(id_col).alias("id"), "sig"),
        num_hashes, bands,
    )
    delta_buckets = d_bands.select("band", "bucket").distinct()
    if broadcast_delta_buckets:
        delta_buckets = F.broadcast(delta_buckets)
    b_touched = b_bands.join(delta_buckets, ["band", "bucket"], "left_semi")
    union = b_touched.withColumn("_new", F.lit(False)).unionByName(
        d_bands.withColumn("_new", F.lit(True))
    )
    buckets = union.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list(F.struct("id", "_new"))).alias("ids")
    )
    buckets = buckets.where(F.size("ids") > 1)
    if max_bucket_size is not None:
        # the cap a rebuild would apply to the UNION bucket; kept buckets
        # carry every base member (the semi-join keeps whole buckets), so
        # the size is the true union size
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "filter(transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> struct(x.id AS id_a, y.id AS id_b, "
                "(x._new OR y._new) AS keep)), p -> p.keep)))"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def incremental_exact_edges(
    base_fingerprints: DataFrame,
    delta_fingerprints: DataFrame,
    id_col: str = "doc_id",
    digest_col: str = "digest",
) -> DataFrame:
    """Exact-duplicate edges introduced by a delta: (src, dst) where a
    delta doc's content digest matches the base corpus (src = the
    digest group's min base id — one edge suffices: the rest of the
    group is already connected in the base cluster state) plus the
    within-delta digest groups (min delta id → others, the batch
    stage's exact shape).

    The base side is pruned to digests the delta actually carries
    before its per-digest min — the only base rows that shuffle are
    matches, so the pass is delta-sized, not corpus-sized."""
    d = delta_fingerprints.select(
        F.col(id_col).alias("_did"), F.col(digest_col).alias("digest")
    )
    delta_digests = d.select("digest").distinct()
    base_match = (
        base_fingerprints.select(
            F.col(id_col).alias("_bid"), F.col(digest_col).alias("digest")
        )
        .join(delta_digests, "digest", "left_semi")
        .groupBy("digest")
        .agg(F.min("_bid").alias("_bid"))
    )
    cross = d.join(base_match, "digest").select(
        F.col("_bid").alias("src"), F.col("_did").alias("dst")
    )
    intra = (
        d.groupBy("digest")
        .agg(F.array_sort(F.collect_list("_did")).alias("ids"))
        .where(F.size("ids") > 1)
        .select(
            F.element_at("ids", 1).alias("src"),
            F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias("dst"),
        )
    )
    return cross.unionByName(intra)


def signature_jaccard_filter(
    candidates: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    min_estimate: float = 0.7,
) -> DataFrame:
    """Prune (id_a, id_b) candidate pairs by the MinHash Jaccard
    ESTIMATE — the fraction of agreeing signature slots — before the
    exact shingle-Jaccard verification stage.

    Banded LSH is intentionally loose (recall stage), and on a
    template-heavy web corpus the candidate set is dominated by
    mid-similarity boilerplate pairs far below the dedup threshold:
    measured on the synthetic 1M-doc corpus, candidate agreement peaks
    at J≈0.6 while the threshold is 0.8.  Estimating J from signatures
    costs two narrow equi-joins against the (id, num_hashes·long)
    signature relation plus a JVM-side ``zip_with``/``filter`` over
    num_hashes-element arrays — orders of magnitude cheaper than
    shingle-exploding the candidate documents (hundreds of shingles
    each), so the exact stage's input becomes dup-sized, not
    candidate-sized.

    ``min_estimate`` should sit a few estimator standard deviations
    (σ = sqrt(J·(1−J)/num_hashes); 0.05 at J=0.8, 64 hashes) below the
    exact threshold so boundary pairs still reach exact verification.
    """
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("_sig_a")
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("_sig_b")
    )
    agree = F.size(
        F.filter(
            F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        candidates.join(sig_a, "id_a").join(sig_b, "id_b")
        .where(agree >= F.lit(min_estimate) * F.size("_sig_a"))
        .select("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    shingle_mode: str = "char",
    shingle_impl: str = "sql",
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs.

    Only documents that appear in ``candidates`` are shingled: the
    corpus is semi-joined against the candidate id set first, so the
    expensive shingling is duplicate-sized, not corpus-sized — at web
    scale the candidate set is orders of magnitude smaller than the
    corpus.

    |A∩B| is computed per candidate pair as ``size(array_intersect)``
    over the two docs' distinct-shingle arrays, brought together by two
    dup-sized equi-joins — never a cross product, and never an exploded
    per-shingle shuffle.  The earlier explode+join-on-shingle shape
    shuffles every (pair, shingle) row AND replicates each doc's
    exploded stream once per pair it appears in; shipping the array
    once per pair moves strictly fewer bytes (bucket caps bound the
    per-doc pair fan-out), and the intersect runs JVM-side inside one
    codegen stage.  Measured on the sf0.1 doubled corpus the verify
    stage dropped 8.0 s → 2.5 s; four shuffle stages collapse to two
    joins that AQE broadcasts when the candidate side is small.

    ``shingle_impl``: "sql" shingles with the portable HOF expressions
    (string shingles — bit-reproducible in the DuckDB oracle twins);
    "np" shingles with the numpy hashed kernel shared with the MinHash
    signature stage (``shingle_hashes_np`` — the corpus-scale path:
    interpreted-HOF string shingling measured minutes per ~70k pages).
    Jaccard values are identical across the two (64-bit hashing is
    injective on real shingle sets up to a ~2⁻⁶⁰ collision).
    """
    cand_ids = (
        candidates.select(F.col("id_a").alias("_cid"))
        .unionByName(candidates.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    docs = documents.join(
        cand_ids, documents[id_col] == cand_ids["_cid"], "left_semi"
    )
    if shingle_impl == "np":
        sh = shingle_hashes_np(
            docs, id_col=id_col, text_col=text_col,
            shingle_k=shingle_k, shingle_mode=shingle_mode,
        )
    elif shingle_impl == "sql":
        sh = _with_shingles(docs, text_col, shingle_k, shingle_mode).select(
            F.col(id_col).alias("id"),
            F.col("_shingles").alias("sh"),
        )
    else:
        raise ValueError(f"shingle_impl must be sql|np, got {shingle_impl}")
    return jaccard_from_shingle_arrays(
        candidates, sh, threshold=threshold, id_col="id"
    )


def jaccard_from_shingle_arrays(
    candidates: DataFrame,
    shingles: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    shingle_col: str = "sh",
) -> DataFrame:
    """Exact shingle-Jaccard over candidate pairs from PRECOMPUTED
    shingle arrays — the verify tail of ``ngram_jaccard_pairs``,
    decoupled from any corpus scan.

    With ``minhash_signatures_np(with_shingles=True)`` the fingerprint
    store carries the shingle arrays alongside the signatures, and
    near-dup verification becomes a store-only operation: incremental
    absorbs (``plans/dedup_absorb.py``) and streaming ingest never
    re-read document text.  The store is pruned to the candidate id set
    before the pair joins, so only duplicate-sized shingle rows move.
    """
    sh = shingles.select(
        F.col(id_col).alias("id"), F.col(shingle_col).alias("sh")
    )
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = sh.join(cand_ids, "id", "left_semi")
    n_inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    n_union = F.size("_sh_a") + F.size("_sh_b") - n_inter
    return (
        candidates.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("_sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("_sh_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(n_inter.cast("double") / n_union, 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


SIMHASH_BITS = 16


def simhash_col(text_col: str = "text") -> Column:
    """16-bit SimHash over whitespace tokens, as a LongType value.

    Bit i is set iff sum over tokens of ±1 (sign = bit i of the token's
    md5_long) is positive.  16 bits keeps the expression tree compact
    while still separating non-near documents; near-dups collide exactly.

    Single ``aggregate`` pass: each token is md5-hashed ONCE and all 16
    signed bit-counters advance via ``zip_with`` — one aggregate per bit
    would re-run the md5 hot loop 16× (no CSE across siblings).
    """
    th = (
        "transform(filter(split(lower({col}), '\\\\s+'), t -> t != ''), "
        "t -> cast(conv(substring(md5(cast(t as binary)), 1, 15), 16, 10)"
        " as bigint))"
    ).format(col=text_col)
    bits = ", ".join(f"{1 << i}L" for i in range(SIMHASH_BITS))
    sums = (
        f"aggregate({th}, transform(array({bits}), p -> 0L), "
        f"(acc, h) -> zip_with(acc, array({bits}), "
        f"(s, p) -> s + (case when (h div p) % 2 = 1 then 1 else -1 end)))"
    )
    return F.expr(
        f"aggregate(zip_with({sums}, array({bits}), "
        f"(s, p) -> case when s > 0 then p else 0L end), "
        f"0L, (acc, v) -> acc + v)"
    ).cast("long")


def simhash_duplicates(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of documents sharing an identical SimHash (near-dup
    clusters at this bit width): simhash → ids + count."""
    return (
        documents.select(F.col(id_col), simhash_col(text_col).alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list(id_col)).alias("ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def paragraph_dedup(documents: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """CCNet-style paragraph-level exact dedup (Wenzek et al. 2020):
    drop every paragraph whose normalized content already appeared
    earlier in the corpus, keeping the FIRST occurrence in
    (``id_col``, position) order.  Web boilerplate — cookie banners,
    nav blocks, license footers — repeats across pages that are NOT
    document-level duplicates, so doc-level dedup never touches it;
    paragraph-level dedup removes it corpus-wide in one pass.

    Paragraphs are newline-split, trimmed, empty lines dropped (the
    engine's standard line convention, `repetition_signals`); the dedup
    key is the whitespace-collapsed lowercase paragraph hashed with the
    portable md5 (`content_digest` normalization), so case/indent
    variants of the same banner collapse together and the DuckDB
    oracle reproduces identical survivor sets.

    Output: one row per input document — ``text`` rebuilt from the
    surviving paragraphs (newline-joined, original order),
    ``n_paragraphs`` (pre-dedup), ``n_kept``.  Documents whose every
    paragraph was seen before collapse to ``text = ''``.

    Scale shape (round-4 de-skew rewrite): the first occurrence per
    digest is found with ``groupBy(digest).agg(min(struct(id, pos,
    para)))`` — NOT a digest-partitioned ``row_number`` window.  The
    operator's whole reason to exist is that some paragraphs (cookie
    banners, footers) occur in a huge fraction of the corpus, and a
    window puts EVERY occurrence of one digest into ONE sorting task
    (AQE cannot skew-split window partitions); the aggregate's
    map-side partials absorb the hot key to one row per map task
    before the exchange.  Carrying ``para`` INSIDE the min-struct
    (it never affects the ordering — (id, pos) is unique per row)
    makes the aggregate output the survivor relation itself, so no
    join back to the paragraph stream is ever needed; only the
    SURVIVORS shuffle to the doc-keyed reassembly, and the pre-dedup
    per-doc paragraph counts come from a second input scan that
    partial-counts map-side into a doc-keyed exchange of scalar
    partials.  Final assembly is a doc-keyed equi-join of two
    already-co-partitioned doc-keyed aggregates (doc ids are unique —
    no skew).  Null-paragraph rows (empty docs, via posexplode_outer)
    get a per-document digest so empty docs can never pile into one
    hot NULL partition, and NO join back to the corpus is needed for
    them either — an earlier revision left-joined the rebuilt relation
    onto the document ids and Catalyst broadcast the full rebuilt
    corpus at 100k docs, overflowing spark.driver.maxResultSize.
    """
    paras = (
        documents.select(
            F.col(id_col),
            F.expr(
                f"filter(transform(split({text_col}, '\\n'), "
                "x -> trim(x)), x -> x != '')"
            ).alias("_paras"),
        )
        .select(
            id_col, F.posexplode_outer("_paras").alias("pos", "para")
        )
        .withColumn(
            "digest",
            F.when(
                F.col("para").isNotNull(), content_digest("para")
            ).otherwise(md5_long(F.concat(F.lit("empty:"),
                                          F.col(id_col).cast("string")))),
        )
    )
    # min_by (not min-of-struct): both compute the lexicographic-first
    # (id, pos) occurrence — the ordering key is unique within a digest
    # group, so min(id) IS the first occurrence's id and min_by picks
    # its (pos, para) deterministically — but min_by aggregates in
    # ObjectHashAggregate while min(struct) falls back to
    # SortAggregate, measured 7x slower on the same stream
    survivors = (
        paras.groupBy("digest")
        .agg(
            F.min(F.col(id_col)).alias("_id"),
            F.min_by(
                F.struct(F.col("pos").alias("pos"),
                         F.col("para").alias("para")),
                F.struct(F.col(id_col), F.col("pos")),
            ).alias("_vp"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_vp.pos").alias("pos"),
            F.col("_vp.para").alias("para"),
        )
    )
    kept = survivors.groupBy(id_col).agg(
        F.count("para").cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN para IS "
                "NOT NULL THEN struct(pos, para) END)), x -> x.para)"
            ),
        ).alias("text"),
    )
    counts = paras.groupBy(id_col).agg(
        F.count("para").cast("long").alias("n_paragraphs")
    )
    return (
        counts.join(kept, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
            "n_paragraphs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def duplicate_ngram_spans(documents: DataFrame, w: int = 8,
                          min_docs: int = 2, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Cross-document repeated-substring detection at token-n-gram
    granularity — the scalable approximation of suffix-array
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", which removes 50-token runs
    shared between documents).  A token position is *duplicated* when
    some ``w``-token window covering it also occurs in at least
    ``min_docs`` distinct documents; the per-document duplicated-token
    fraction is the gate score (and the covered spans are exactly what
    a removal pass would excise).

    Mechanics (deterministic, fully SQL-replayable):

    * tokens = the engine's standard ``[a-z0-9']`` word stream; each
      token is md5-hashed ONCE, and a w-token window's key is a pair of
      independent polynomial hashes folded over the token hashes mod
      two 31-bit primes, packed into one 62-bit long.  No w-token gram
      STRING is ever materialized — the naive ``concat_ws`` form blows
      the token stream up w× through the shuffle (at w=20 that is a
      ~150-byte string plus an md5 per window; the fold is ~2w integer
      ops on already-hashed tokens).  A 62-bit key makes an accidental
      window collision (a false duplicated-window mark) a
      ~n²/2^63 event — negligible at any shard size, and identical in
      the oracle, so parity is exact.
    * a window key is duplicated iff it appears in ≥ ``min_docs``
      distinct documents (count-distinct over ONE key-keyed shuffle).
    * covered tokens per doc = union length of the [start, start+w)
      intervals of its duplicated windows — computed as a single JVM
      ``aggregate`` fold over the sorted start list, NOT by exploding
      w positions per window (the fold is O(windows), the explode
      would be w× the stream; the oracle uses the explode form since
      both compute the same interval-union cardinality).

    Scale shape: one key-keyed shuffle of (id, start, 62-bit key) rows
    for the distinct-doc counts (map-side partial agg absorbs
    boilerplate mega-windows), one key equi-join of that stream against
    the duplicated-key set (AQE broadcasts it when small), one
    doc-keyed aggregate.  Never any pairwise document comparison.
    """
    p1, m1 = 2147483647, 131
    p2, m2 = 2147483629, 137
    # coalesce to array(): a NULL text would otherwise flow size(NULL)
    # = -1 into n_tokens (and NULL in the DuckDB oracle — a parity
    # divergence); a null/missing document has zero tokens
    toks = (
        f"coalesce(filter(split(lower({text_col}), '[^a-z0-9\\']+'), "
        "t -> t != ''), array())"
    )
    th = (
        "transform(_toks, t -> cast(conv(substring(md5("
        "cast(t as binary)), 1, 15), 16, 10) as bigint))"
    )

    def poly(p: int, m: int) -> str:
        return (
            f"aggregate(slice(_th, i, {w}), 0L, "
            f"(acc, h) -> pmod(acc * {m} + pmod(h, {p}), {p}))"
        )

    base = documents.select(
        F.col(id_col), F.expr(toks).alias("_toks")
    ).select(
        id_col, F.col("_toks"), F.size("_toks").alias("n_tokens")
    )
    grams = base.select(
        id_col,
        "n_tokens",
        F.expr(th).alias("_th"),
    ).select(
        id_col,
        "n_tokens",
        F.posexplode_outer(
            F.expr(
                f"CASE WHEN size(_th) >= {w} THEN "
                f"transform(sequence(1, size(_th) - {w} + 1), "
                f"i -> {poly(p1, m1)} * 2147483648L + {poly(p2, m2)}) "
                "ELSE array() END"
            )
        ).alias("start", "gh"),
    )
    dup_hashes = (
        grams.where(F.col("gh").isNotNull())
        .groupBy("gh")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gh")
    )
    # LEFT-join the dup flag onto the gram stream and aggregate once per
    # doc: every document keeps at least one gram row (posexplode_outer
    # emits a null-key row for sub-w docs), so no join back to the
    # corpus relation is ever needed — the earlier two-relation doc-id
    # join invited Catalyst to broadcast a corpus-sized side (the
    # paragraph_dedup driver-overflow failure mode).
    flagged = grams.join(
        dup_hashes.withColumn("_dup", F.lit(1)), "gh", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.max("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_dup") == 1, 1).otherwise(0))
            .cast("long").alias("n_dup_grams"),
            F.array_sort(
                F.collect_list(F.when(F.col("_dup") == 1, F.col("start")))
            ).alias("_starts"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_dup_grams",
            F.expr(
                f"aggregate(_starts, struct(0L AS last_end, 0L AS cov), "
                f"(acc, s) -> struct(greatest(acc.last_end, s + {w}L), "
                f"acc.cov + greatest(0L, s + {w}L "
                f"- greatest(acc.last_end, cast(s AS BIGINT)))), "
                "acc -> acc.cov)"
            ).alias("dup_tokens"),
            F.round(
                F.expr(
                    f"aggregate(_starts, struct(0L AS last_end, 0L AS cov), "
                    f"(acc, s) -> struct(greatest(acc.last_end, s + {w}L), "
                    f"acc.cov + greatest(0L, s + {w}L "
                    f"- greatest(acc.last_end, cast(s AS BIGINT)))), "
                    "acc -> acc.cov)"
                )
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )
