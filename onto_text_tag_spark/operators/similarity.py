"""Similarity search over an embedding column (array<float/double>).

Two strategies:

* ``cosine_topk``     — brute-force top-k: every (query, candidate) pair
                        scored with a JVM-side fold (no Python UDF), then
                        a window top-k.  Correctness baseline; O(Q·N) —
                        fine when Q is small or N is a broadcastable
                        probe set, NOT the 100 TB path.
* ``lsh_topk``        — random-hyperplane LSH: H deterministic
                        pseudo-hyperplanes (md5-seeded Rademacher ±1
                        components, no stored model), documents bucketed
                        by sign signature; candidates only within the
                        query's bucket (optionally multi-probe).  Shuffle
                        key = signature — this is the 100 TB path: cost
                        O(N·H) hashing + per-bucket brute force.

All arithmetic is Spark higher-order functions (zip_with/aggregate) —
JVM codegen, no Python boundary.  Scores are rounded to 4 decimals so
the DuckDB oracle (list_dot_product-based) hash-matches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double), (acc, v) -> acc + v * v)"
        )
    )


def cosine_similarity_col(a: str, b: str) -> Column:
    """Rounded cosine similarity between two array columns."""
    return F.round(
        _dot(a, b) / (_norm(a) * _norm(b)), 4
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: for each query row, the k most similar
    candidate rows (excluding itself when ids collide).

    The query side is broadcast (probe sets are small by construction);
    the candidate scan stays partition-parallel with no shuffle until
    the final per-query top-k window.
    """
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        cand.join(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("score", cosine_similarity_col("q_vec", "cand_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )


def _hyperplane_component(h: int, d: int) -> int:
    """Deterministic ±1 Rademacher component for hyperplane h, dim d.

    md5-derived so any engine can reproduce it; materialized as literals
    in the plan (tiny: H×D ints), so there is no model object to ship.
    """
    import hashlib

    digest = hashlib.md5(f"hp:{h}:{d}".encode()).hexdigest()
    return 1 if int(digest[:8], 16) % 2 == 0 else -1


def hyperplane_matrix(num_planes: int, dim: int) -> list[list[int]]:
    return [
        [_hyperplane_component(h, d) for d in range(dim)]
        for h in range(num_planes)
    ]


def signature_col(vec_col: str, planes: list[list[int]]) -> Column:
    """LSH signature: bit h = sign(plane_h · vec), packed into a long."""
    bits = []
    for h, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{c}.0D" for c in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(F.when(dot > 0, F.lit(1 << h)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1 by design (grade with recall-vs-brute-force in tests);
    at scale the bucket join replaces the full cross product — the
    signature groupBy is the only shuffle over the big table.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplane_matrix(num_planes, dim)
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        signature_col(vec_col, planes).alias("sig"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        signature_col(vec_col, planes).alias("sig"),
    )
    scored = (
        cand.join(F.broadcast(q), "sig")
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("score", cosine_similarity_col("q_vec", "cand_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )


def _centroid_literal(cent_rows: list[tuple[int, list[float]]]) -> str:
    """SQL literal array<struct<cid,cvec>> for the centroid set.

    Only the raw vector components are inlined — norms are computed
    in-expression so both engines derive every float from the same
    stored values (floating-point parity with the SQL oracle)."""
    structs = []
    for cid, vec in cent_rows:
        arr = "array(" + ", ".join(f"cast({c!r} as double)" for c in vec) + ")"
        structs.append(f"struct({cid}L AS cid, {arr} AS cvec)")
    return "array(" + ", ".join(structs) + ")"


def _guarded_cos_sql(vec_col: str) -> str:
    """Round-4 cosine of ``vec_col`` vs ``ct.cvec`` with an explicit
    zero-norm guard: a zero vector (or zero centroid) scores an
    unattainable sentinel below the fold seed instead of dividing by
    zero — under Spark 4's default ANSI mode an unguarded division
    would abort the whole job on one corrupt embedding."""
    dot = (
        f"aggregate(zip_with({vec_col}, ct.cvec, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nv = (
        f"sqrt(aggregate({vec_col}, cast(0.0 as double), "
        f"(acc, v) -> acc + v * v))"
    )
    nc = (
        "sqrt(aggregate(ct.cvec, cast(0.0 as double), "
        "(acc, v) -> acc + v * v))"
    )
    return (
        f"CASE WHEN {nv} * {nc} = 0.0 THEN cast(-1e19 as double) "
        f"ELSE round({dot} / ({nv} * {nc}), 4) END"
    )


def ivf_cell_expr(vec_col: str, cents_lit: str) -> Column:
    """IVF cell assignment as a PURE MAP expression: argmax over the
    centroid literal of rounded cosine similarity, ties to the smallest
    centroid id (fold iterates cids ascending, strict > keeps the
    first maximum).  No shuffle, no window — at 10^12 rows assignment
    pipelines with the scan.  Zero-norm vectors are unassignable: the
    guarded score never beats the seed, so they yield cell ``-1``
    (matching ``ivf_cell_numpy``'s explicit mask)."""
    score = _guarded_cos_sql(vec_col)
    return F.expr(
        f"aggregate({cents_lit}, "
        f"struct(cast(-1e18 as double) AS s, cast(-1 as bigint) AS c), "
        f"(best, ct) -> CASE WHEN {score} > best.s "
        f"THEN struct({score} AS s, ct.cid AS c) "
        f"ELSE best END).c"
    )


def ivf_cell_numpy(centroids: list[tuple[int, list[float]]]):
    """Vectorized twin of ``ivf_cell_expr``: same round-4 half-up
    cosine, same first-max tie-break over the centroid list order —
    but one numpy matmul per Arrow batch instead of an
    expression-tree argmax per row.

    Parity caveat: BLAS sums the dot product in a different order than
    the JVM's sequential fold, so a cosine landing within ~1 ulp of a
    x.xxxx5 rounding boundary can round to a different 4-digit score
    and flip the argmax — the two paths agree everywhere except that
    measure-zero boundary set (they have matched on every tested
    corpus, but it is an empirical match, not a guarantee).  Zero-norm
    vectors are explicitly unassignable: both kernels yield cell
    ``-1`` for them (the expr path's NaN scores never beat the fold's
    seed; this kernel masks them), and downstream inner joins on
    ``cell`` drop such rows.

    The JVM expression interprets ``O(n_cents * dim)`` fold steps per
    row, which dominates wall time once the centroid set is big (64
    centroids x 32 dims measured ~15 min for 5 k-means iterations over
    200k vectors; this path cuts assignment to Arrow transfer +
    BLAS).  Used automatically by ``kmeans_centroids``/``ivf_topk``
    above ``_NUMPY_ASSIGN_THRESHOLD``; the expression path remains the
    float-parity surface for the SQL-oracled small configurations."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cids = np.asarray([c for c, _ in centroids], dtype=np.int64)
    mat = np.asarray([v for _, v in centroids], dtype=np.float64)
    mat_norms = np.sqrt((mat * mat).sum(axis=1))

    @pandas_udf("long")
    def _assign(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        if v.size == 0:
            return pd.Series([], dtype="int64")
        norms = np.sqrt((v * v).sum(axis=1, keepdims=True))
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = (v @ mat.T) / (norms * mat_norms)
        # Spark round() is half-away-from-zero; np.round is banker's
        scores = np.sign(scores) * np.floor(
            np.abs(scores) * 1e4 + 0.5) / 1e4
        # np.argmax keeps the FIRST maximum == the expr's strict-> fold
        # over the same centroid order
        out = cids[np.argmax(scores, axis=1)]
        # zero-norm rows score NaN against every centroid; the expr
        # fold leaves its seed cid -1 there — mask to match
        out = np.where(norms[:, 0] == 0.0, -1, out)
        return pd.Series(out)

    return _assign


# JVM-expression argmax costs O(n_cents * dim) interpreted fold steps
# per row; above this product the Arrow round-trip is the cheaper path.
_NUMPY_ASSIGN_THRESHOLD = 1024


def _cell_col(vec_col: str, centroids, assignment: str) -> Column:
    if assignment not in ("auto", "expr", "numpy"):
        raise ValueError(f"unknown assignment mode {assignment!r}")
    use_numpy = assignment == "numpy" or (
        assignment == "auto"
        and centroids
        and len(centroids) * len(centroids[0][1]) >= _NUMPY_ASSIGN_THRESHOLD
    )
    if use_numpy:
        return ivf_cell_numpy(centroids)(F.col(vec_col))
    return ivf_cell_expr(vec_col, _centroid_literal(centroids))


def ivf_cell_assignments(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignment: str = "auto",
) -> DataFrame:
    """``(vec_id, cell, cscore)`` — every vector's IVF cell plus its
    rounded cosine to the assigned centroid.  This is the STORED form
    an incrementally maintained index keeps (plans/ivf_absorb.py): the
    cell feeds probe-time candidate pruning, the score is the
    centroid-staleness signal (a falling mean assignment score says the
    trained centroids no longer describe the corpus — retrain).

    Scale shape: assignment is the shuffle-free ``_cell_col`` map
    (expression fold or Arrow/numpy kernel); the score join touches
    only the tiny broadcast centroid table.  One corpus scan total.
    """
    spark = embeddings.sparkSession
    cents_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell long, _cvec array<double>",
    )
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        _cell_col(vec_col, centroids, assignment).alias("cell"),
    )
    return assigned.join(F.broadcast(cents_df), "cell").select(
        "vec_id", "cell",
        cosine_similarity_col("_v", "_cvec").alias("cscore"),
    )


def ivf_probe_cells_expr(vec_col: str, cents_lit: str, nprobe: int) -> Column:
    """Top-``nprobe`` cells for a query vector, as an array<bigint> —
    array_sort on (-score, cid) structs gives score-desc, cid-asc.
    Uses the same zero-norm-guarded cosine as ``ivf_cell_expr`` (a
    zero query vector probes arbitrary-but-deterministic cells instead
    of aborting the job under ANSI mode)."""
    return F.expr(
        f"transform(slice(array_sort(transform({cents_lit}, ct -> "
        f"struct(-({_guarded_cos_sql(vec_col)}) AS ns, ct.cid AS cid))), "
        f"1, {nprobe}), p -> p.cid)"
    )


def _round_half_away(x: float, digits: int) -> float:
    """Half-away-from-zero decimal rounding — matches Spark/DuckDB
    ``round()``; Python's builtin ``round`` is banker's and would
    diverge at exact .5 boundaries."""
    import math

    scale = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignment: str = "auto",
    component_round: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd's) over the embedding column
    — the trained-centroid scale path for ``ivf_topk``.

    Everything stays in DataFrame built-ins:

    * **Assignment** is the same pure-map argmax IVF uses — the
      ``ivf_cell_expr`` literal fold, auto-switching to the
      ``ivf_cell_numpy`` Arrow kernel for large centroid sets
      (same cell ids up to rounding-boundary ulps; see
      ``ivf_cell_numpy``'s parity caveat) — pipelined with
      the scan, NO shuffle of the corpus.
    * **Update** shuffles only ``(cell, component_position)`` partial
      sums: ``posexplode`` the vector, ``groupBy(cell, pos)`` with
      map-side partial aggregation — k·dim result rows per iteration,
      driver-sized regardless of corpus size.
    * Means are L2-normalized (spherical variant — assignment is by
      cosine, so centroids live on the unit sphere); a cell that loses
      all members keeps its previous centroid.

    Deterministic: init = the ``k`` vectors with the smallest ids, and
    every reduction is order-insensitive (sum/count).  Returns
    ``[(cid, vector), ...]`` ready for ``ivf_topk(centroids=...)``.

    ``component_round`` pins each normalized centroid component to that
    many decimal digits (half-away-from-zero, the Spark/DuckDB
    ``round()`` rule) after every update — the cross-engine replay
    contract: float summation order differs between engines at the ulp
    level, so an external SQL oracle can only reproduce the training
    trajectory bit-for-bit when each iteration's centroids are snapped
    to a decimal grid (same device as ``quantize_embeddings``'s rounded
    scale).  ``None`` (default) keeps full double precision.
    """
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    ]
    for _it in range(iterations):
        # assignment FIRST, explode second: computing the argmax in the
        # same projection as posexplode lets Catalyst collapse the two
        # and re-evaluate the k-centroid fold once per EXPLODED row —
        # dim× the work.  The two-step select (and, above the numpy
        # threshold, the Arrow kernel) keeps it once per vector.
        assigned = embeddings.select(
            _cell_col(vec_col, cents, assignment).alias("cell"),
            F.col(vec_col).alias("_v"),
        )
        stats = (
            assigned.select(
                "cell", F.posexplode("_v").alias("pos", "comp")
            )
            .groupBy("cell", "pos")
            .agg(F.sum("comp").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = (
                float(r["s"]) / int(r["n"])
            )
        new_cents = []
        for cid, old in cents:
            mean = by_cell.get(cid)
            if not mean:
                new_cents.append((cid, old))  # empty cell: keep centroid
                continue
            vec = [mean[i] for i in range(len(old))]
            nrm = sum(x * x for x in vec) ** 0.5
            if not nrm:
                new_cents.append((cid, old))
                continue
            unit = [x / nrm for x in vec]
            if component_round is not None:
                unit = [_round_half_away(x, component_round) for x in unit]
            new_cents.append((cid, unit))
        if new_cents == cents:
            break  # converged
        cents = new_cents
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
    assignment: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantization
    alternative to ``lsh_topk``.

    ``nprobe`` default: the BENCH/BASELINE.md ANN quality curve (200k
    clustered vectors, trained centroids) reaches its recall plateau by
    nprobe=2 while nprobe=1 loses the neighbors that straddle a cell
    boundary — 2 buys the boundary insurance for ~the cost of one extra
    cell scan, so it is the default; raise it when the embedding space
    is less clustered than the coarse quantizer assumes.

    Deterministic "training": the ``num_centroids`` vectors with the
    smallest ids are the centroids (a stand-in for k-means that any SQL
    engine reproduces), unless ``centroids`` supplies a trained set —
    ``kmeans_centroids`` produces one distributedly.
    Every vector's cell = argmax cosine vs the centroid literal — a pure
    map pipelined with the scan (NO shuffle over the corpus for
    assignment).  Queries probe their ``nprobe`` best cells; candidates
    are only the vectors in probed cells — the classic IVF recall/cost
    dial.  Only shuffles: the cell equi-join and the final per-query
    top-k window (query side is small by construction).
    """
    cent_rows = centroids if centroids is not None else [
        (int(r[0]), list(r[1]))
        for r in embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .collect()
    ]
    cents_lit = _centroid_literal(cent_rows)
    # corpus-side assignment auto-switches to the numpy kernel for
    # large centroid sets (_cell_col); the query-side probe stays an
    # expression — queries are small by construction
    cells = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        _cell_col(vec_col, cent_rows, assignment).alias("cell"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            ivf_probe_cells_expr(vec_col, cents_lit, nprobe)
        ).alias("cell"),
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("score", cosine_similarity_col("q_vec", "cand_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.98,
    num_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-bucketing:
    (id_a < id_b, score ≥ threshold).  Never all-pairs: the self-join is
    restricted to equal signatures."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplane_matrix(num_planes, dim)
    sigs = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        signature_col(vec_col, planes).alias("sig"),
    )
    # Joinless bucket expansion (same shape as dedup.lsh_candidate_pairs):
    # a self-join on sig evaluates the signature subplan twice and
    # shuffles both sides; grouping ids+vecs per bucket computes the
    # signatures ONCE, shuffles once, and generates the intra-bucket
    # pairs locally.  array_sort on (id, vec) structs orders by id, so
    # pairs come out canonical (id_a < id_b) for free.
    buckets = (
        sigs.groupBy("sig")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("vec")))
            ).alias("items")
        )
        .where(F.size("items") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items) - i - 1), "
                "y -> struct(x.id AS id_a, y.id AS id_b, "
                "x.vec AS vec_a, y.vec AS vec_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.vec_a", "p.vec_b")
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine_similarity_col("vec_a", "vec_b").alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def class_centroids(
    mentions: DataFrame,
    embeddings: DataFrame,
    doc_col: str = "url",
    term_col: str = "curie",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(term, n_docs, centroid)`` — each ontology class's centroid in
    embedding space: the mean document embedding over the documents
    that mention it (set semantics — a doc counts once however often it
    repeats the class, matching the co-occurrence pipeline's reading).

    This is the bridge between the symbolic KG and the vector space:
    class centroids feed synonym/canonicalization candidate discovery
    (near-identical centroids ≈ same concept — the embedding twin of
    the MinHash surface-form blocking), ANN routing by concept, and
    class-conditioned training-data selection.

    Scale shape: the mention stream collapses to one row per doc
    (``collect_set`` — map-side combinable, and it IS the dedupe, so no
    separate distinct pass), partitioned by the doc key; the doc-keyed
    equi-join to embeddings then reuses that exchange, so each
    corpus-scale side is shuffled exactly once (zero times if both are
    bucketed by the doc key, `sources/bucketed.py`).  Terms explode
    only AFTER the join, then ``posexplode`` to (term, dim, value)
    rows: the explode multiplies rows by dim, but the (term, dim)
    average is map-side combinable, so only |classes|·dim partial rows
    cross the final shuffle; array re-assembly groups the
    ontology-bounded result.  No Python row path anywhere.

    ``mentions[doc_col]`` must be join-compatible with
    ``embeddings[id_col]`` (cast upstream if the corpus keys docs by
    string url and the vector store by numeric id).
    """
    doc_terms = mentions.groupBy(doc_col).agg(
        F.collect_set(term_col).alias("_terms")
    )
    emb = embeddings.select(
        F.col(id_col).alias("_doc"), F.col(vec_col).alias("_vec")
    )
    per_dim = (
        doc_terms.join(emb, doc_terms[doc_col] == emb["_doc"])
        .select(F.explode("_terms").alias(term_col), "_vec")
        .select(term_col, F.posexplode("_vec").alias("dim", "comp"))
        .groupBy(term_col, "dim")
        .agg(
            F.avg(F.col("comp").cast("double")).alias("_m"),
            F.count("*").cast("long").alias("_n"),
        )
    )
    return per_dim.groupBy(term_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, _m))), "
            "s -> s._m)"
        ).alias("centroid"),
        F.max("_n").alias("n_docs"),
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, scale, qvec) — symmetric per-vector int8 quantization:
    ``scale = round(max|x| / 127, 6)``, ``q_i = round(x_i / scale)`` ∈
    [-127, 127].  At 100 TB the embedding column IS the table (a 64-dim
    float32 vector is 256 B/row); int8 cuts it 4× with ~0.5% cosine
    error, which is why serving/ANN stores quantize at rest.  The
    rounded scale is part of the contract (the SQL twin reproduces the
    arrays bit-for-bit); all-zero vectors quantize to zeros with scale
    0.  Pure JVM ``transform`` — row-parallel, no UDF, no shuffle.
    """
    x = F.col(vec_col)
    maxabs = F.array_max(F.expr(
        f"transform({vec_col}, v -> abs(cast(v as double)))"
    ))
    scale = F.round(maxabs / 127.0, 6)
    qvec = F.when(maxabs == 0.0, F.expr(
        f"transform({vec_col}, v -> cast(0 as int))"
    )).otherwise(
        F.expr(
            f"transform({vec_col}, "
            f"v -> cast(round(cast(v as double) / _scale) as int))"
        )
    )
    return (
        embeddings.withColumn("_scale", scale)
        .select(
            F.col(id_col),
            F.col("_scale").alias("scale"),
            qvec.alias("qvec"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    assignment: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): coarse
    k-means cells block the pair space, within-cell cosine >= threshold
    defines duplicate edges, connected components group transitive
    duplicates, and each group keeps the member FARTHEST from its cell
    centroid (the paper's keep rule — low-centroid-similarity examples
    carry the most information; ties break to the smallest id).

    Output ``(vec_id, cell, rep_id, keep)`` — one row per input vector;
    ``keep`` marks the retained representative (singletons keep
    themselves).

    Scale shape: the only quadratic object is per-cell (the SemDeDup
    blocking argument: O(Σ cell²) « O(n²) when the quantizer spreads
    the corpus), generated by a cell equi-join with the same round-4
    score contract as ``ivf_topk``; components run on the (sparse)
    duplicate edge set only; every other step is a narrow map or a
    broadcast-scale join.  Centroids default to the deterministic
    first-``num_centroids`` vectors (SQL-replayable), or pass a
    ``kmeans_centroids(...)`` set for the trained path.
    """
    from onto_text_tag_spark.operators.components import (
        connected_components,
    )

    cent_rows = centroids if centroids is not None else [
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .collect()
    ]
    cells = ivf_cell_assignments(
        embeddings, cent_rows, id_col=id_col, vec_col=vec_col,
        assignment=assignment,
    ).localCheckpoint(eager=True)
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )
    sided = cells.select("vec_id", "cell").join(vecs, "vec_id")
    a = sided.select(
        F.col("vec_id").alias("id_a"), "cell", F.col("_v").alias("_va")
    )
    b = sided.select(
        F.col("vec_id").alias("id_b"), "cell", F.col("_v").alias("_vb")
    )
    edges = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine_similarity_col("_va", "_vb"))
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges, src="id_a", dst="id_b")
    labeled = (
        cells.select("vec_id", "cell", "cscore")
        .join(comps.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .withColumn("comp", F.coalesce(F.col("comp"), F.col("vec_id")))
    )
    w = (
        Window.partitionBy("comp")
        .orderBy(F.col("cscore").asc(), F.col("vec_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return labeled.withColumn("rep_id", F.first("vec_id").over(w)).select(
        "vec_id", "cell", "rep_id",
        (F.col("vec_id") == F.col("rep_id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): split the vector into m subspaces, quantize
# each against its own k_sub-centroid codebook.  An encoded vector is m
# small codes (m bytes at k_sub<=256) instead of dim floats — the memory
# form billion-scale ANN stores (FAISS IVFPQ) keep in RAM — and
# asymmetric distance (ADC) scores a query against codes through m
# lookup tables without ever reconstructing the vectors.
# ---------------------------------------------------------------------------


def pq_default_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic untrained codebooks: subspace s's centroids are the
    s-th subvectors of the first ``ksub`` vectors in id order — the same
    SQL-replayable device as ``semantic_dedup``'s default centroids (a
    k-means-trained set can be substituted per subspace exactly like
    ``sim_ivf_trained``; the ENCODE/ADC algebra is codebook-agnostic).
    Returns ``codebooks[s][c] = list of dim/m floats``."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        # an empty table would raise an opaque IndexError below, and a
        # short one would silently train ksub' < ksub centroids that
        # downstream pq_encode/pq_topk treat as the effective ksub
        raise ValueError(
            f"pq_default_codebooks: embeddings table has {len(rows)} "
            f"rows but ksub={ksub} centroids per subspace are needed "
            "— lower ksub or provide trained codebooks"
        )
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        [[float(x) for x in r[1][s * d:(s + 1) * d]] for r in rows]
        for s in range(m)
    ]


def _pq_dist_expr(sub_expr: str, centroid: list[float]) -> str:
    """Squared L2 distance of a sub-vector expression to a literal
    centroid — zip_with + left-to-right aggregate, bit-stable across
    engines (float inputs widen to double exactly; fixed fold order)."""
    cent = "array(" + ", ".join(f"cast({c!r} as double)" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({sub_expr}, {cent}, "
        f"(a, b) -> (cast(a as double) - b) * (cast(a as double) - b)), "
        f"cast(0 as double), (s, v) -> s + v)"
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — per-subspace nearest-centroid codes, entirely JVM
    expressions (no UDF, no shuffle, row-parallel).  Ties break to the
    smallest code index (strict ``<`` in the running-min fold), so the
    encoding is deterministic and the SQL twin reproduces it exactly.

    At 100 TB this is the at-rest compression pass: dim×4 bytes → m
    codes per row, one scan, pipelined with whatever wrote the
    embeddings.  The expression tree is m×k_sub small folds; for very
    large m·k_sub a numpy ``mapInPandas`` kernel is the drop-in
    (``ivf_cell_numpy`` pattern) — at the default 8×16 codegen wins.
    """
    return embeddings.select(
        F.col(id_col),
        _pq_codes_expr(vec_col, codebooks).alias("codes"),
    )


def _pq_codes_expr(vec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace nearest-centroid codes — the encode
    kernel of ``pq_encode``, exposed as a column so composite operators
    (``ivfpq_topk``) can compute codes in the same scan that assigns
    IVF cells."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    d = len(codebooks[0][0])
    codes = []
    for s in range(m):
        sub = f"slice({vec_col}, {s * d + 1}, {d})"
        cands = ", ".join(
            f"named_struct('c', {c}, 'd', {_pq_dist_expr(sub, codebooks[s][c])})"
            for c in range(ksub)
        )
        argmin = (
            f"aggregate(array({cands}), "
            f"named_struct('c', -1, 'd', cast('Infinity' as double)), "
            f"(acc, x) -> if(x.d < acc.d, x, acc)).c"
        )
        codes.append(argmin)
    return F.expr("array(" + ", ".join(codes) + ")")


def _pq_lut_expr(vec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """m×k_sub query lookup table (array<array<double>>) of subspace
    distances — the ADC query-side expansion shared by ``pq_topk`` and
    ``ivfpq_topk``."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    d = len(codebooks[0][0])
    luts = []
    for s in range(m):
        sub = f"slice({vec_col}, {s * d + 1}, {d})"
        entries = ", ".join(
            _pq_dist_expr(sub, codebooks[s][c]) for c in range(ksub)
        )
        luts.append(f"array({entries})")
    return F.expr("array(" + ", ".join(luts) + ")")


def _pq_adist_col(m: int) -> Column:
    """Approximate distance: m LUT lookups + adds over ``_lut`` and
    ``codes`` columns, rounded to the engine's 4-decimal contract."""
    return F.round(
        sum(
            F.expr(f"element_at(element_at(_lut, {s + 1}), "
                   f"element_at(codes, {s + 1}) + 1)")
            for s in range(m)
        ),
        4,
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query is expanded
    ONCE into its m×k_sub lookup table of subspace distances (a
    query-side map — k_sub folds per subspace over the raw query
    vector), and scoring a stored code is m array lookups + adds.
    Approximate distance is rounded to 4 decimals (the engine's score
    contract) with id tie-break, so ranking is engine-stable.

    Scale shape: codes table × broadcast query LUTs — one scan of the
    compressed store, no shuffle besides the per-query top-k
    (TakeOrderedAndProject per query via window over the tiny query
    partition count).  This is the FAISS ADC loop as a Spark plan.

    Returns (query_id, vec_id, adist, rank) for the k nearest (smallest
    approximate distance) per query.
    """
    from pyspark.sql.window import Window

    m = len(codebooks)
    codes = pq_encode(embeddings, codebooks, id_col=id_col,
                      vec_col=vec_col)
    q = queries.select(
        F.col(query_id_col),
        _pq_lut_expr(vec_col, codebooks).alias("_lut"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .withColumn("adist", _pq_adist_col(m))
        .select(query_id_col, id_col, "adist")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    num_centroids: int = 8,
    nprobe: int = 2,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
    assignment: str = "auto",
) -> DataFrame:
    """IVFPQ — the billion-scale ANN serving composition (Jégou et al.
    2011 §V; the FAISS ``IVFx,PQy`` index): IVF coarse routing prunes
    the store to the probed cells, PQ asymmetric distance scores only
    those cells' compressed codes, and an exact cosine re-rank of the
    per-query ``shortlist`` ADC survivors restores ranking fidelity.
    The three stages exist separately in this engine (``ivf_topk``,
    ``pq_topk``) — this operator is the deployment path the
    BENCH/BASELINE.md PQ measurement prescribed: IVF-probe → ADC
    within probed cells → exact re-rank.

    Scale shape: ONE store scan computes the cell assignment and the
    PQ codes together (both are at-rest columns of a maintained index;
    inline here so the operator is self-contained), the query side
    broadcasts (probe cells × ADC LUT × raw query vector — queries are
    small by construction), and the only wide operations are the two
    per-query top-N windows (shortlist, then final k), both of which
    Spark executes with a partial WindowGroupLimit below the exchange
    so only N rows per partition shuffle.  The exact re-rank touches
    ``shortlist`` rows per query — the raw vectors ride the candidate
    rows from the same single scan, so no second store lookup join is
    needed.

    Output: (query_id, cand_id, adist, score, rank) — ``adist`` the
    surviving ADC distance (audit trail for recall analysis), ``score``
    the exact cosine the final ranking uses, ties broken by cand_id.
    """
    cent_rows = centroids if centroids is not None else [
        (int(r[0]), list(r[1]))
        for r in embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .collect()
    ]
    cents_lit = _centroid_literal(cent_rows)
    m = len(codebooks)
    store = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        _cell_col(vec_col, cent_rows, assignment).alias("cell"),
        _pq_codes_expr(vec_col, codebooks).alias("codes"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _pq_lut_expr(vec_col, codebooks).alias("_lut"),
        F.explode(
            ivf_probe_cells_expr(vec_col, cents_lit, nprobe)
        ).alias("cell"),
    )
    cand = (
        store.join(F.broadcast(probes), "cell")
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("adist", _pq_adist_col(m))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("cand_id").asc()
    )
    short = (
        cand.withColumn("_srk", F.row_number().over(w_short))
        .where(F.col("_srk") <= shortlist)
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        short.withColumn(
            "score", cosine_similarity_col("q_vec", "cand_vec")
        )
        .withColumn("rank", F.row_number().over(w_k).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", "score", "rank")
    )


def pq_trained_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks — the trained PQ path (FAISS
    trains exactly this: plain Lloyd's on each subspace independently;
    NOT the spherical variant `kmeans_centroids` uses for IVF, because
    ADC ranks by subspace L2 distance, not cosine).

    All m subspaces train in the SAME distributed pass per iteration:
    one scan computes every subspace's argmin code (the `pq_encode`
    fold), explodes to (subspace, code, component) partial sums —
    m·k_sub·(dim/m) = k_sub·dim driver-sized result rows — and the
    driver updates the means.  Deterministic: init = the
    `pq_default_codebooks` subvectors, empty cells keep their
    centroid, fixed iteration count (no data-dependent stopping beyond
    exact convergence).
    """
    cbs = pq_default_codebooks(
        embeddings, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    d = len(cbs[0][0])
    for _it in range(iterations):
        subs = ", ".join(
            f"slice({vec_col}, {s * d + 1}, {d})" for s in range(m)
        )
        argmins = []
        for s in range(m):
            sub = f"slice({vec_col}, {s * d + 1}, {d})"
            cands = ", ".join(
                f"named_struct('c', {c}, 'd', "
                f"{_pq_dist_expr(sub, cbs[s][c])})"
                for c in range(ksub)
            )
            argmins.append(
                f"aggregate(array({cands}), "
                f"named_struct('c', -1, 'd', cast('Infinity' as double)), "
                f"(acc, x) -> if(x.d < acc.d, x, acc)).c"
            )
        assigned = embeddings.select(
            F.expr("array(" + ", ".join(argmins) + ")").alias("_codes"),
            F.expr(f"array({subs})").alias("_subs"),
        ).select(
            F.posexplode(F.expr("arrays_zip(_codes, _subs)"))
            .alias("s", "z")
        ).select(
            "s",
            F.col("z._codes").alias("code"),
            F.posexplode(F.col("z._subs")).alias("pos", "comp"),
        )
        stats = (
            assigned.groupBy("s", "code", "pos")
            .agg(F.sum("comp").alias("sum"), F.count("*").alias("n"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in stats:
            means.setdefault((int(r["s"]), int(r["code"])), {})[
                int(r["pos"])
            ] = float(r["sum"]) / int(r["n"])
        new_cbs = []
        for s in range(m):
            row = []
            for c in range(ksub):
                mean = means.get((s, c))
                row.append(
                    [mean[i] for i in range(d)] if mean else cbs[s][c]
                )
            new_cbs.append(row)
        if new_cbs == cbs:
            break
        cbs = new_cbs
    return cbs


def pq_encode_with_error(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes, recon_err)`` — ``pq_encode`` plus the exact
    reconstruction error (sum over subspaces of the squared L2 to the
    chosen centroid).  The error is the PQ analog of IVF's assignment
    score: a maintained code store tracks its running mean as the
    codebook-staleness signal (plans/pq_absorb.py) — as the corpus
    drifts away from the distribution the codebooks were trained on,
    new vectors quantize worse and the mean rises.  Same pure-JVM
    fold as ``pq_encode``, one scan, no shuffle."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    d = len(codebooks[0][0])
    picks = []
    for s in range(m):
        sub = f"slice({vec_col}, {s * d + 1}, {d})"
        cands = ", ".join(
            f"named_struct('c', {c}, 'd', {_pq_dist_expr(sub, codebooks[s][c])})"
            for c in range(ksub)
        )
        picks.append(
            f"aggregate(array({cands}), "
            f"named_struct('c', -1, 'd', cast('Infinity' as double)), "
            f"(acc, x) -> if(x.d < acc.d, x, acc))"
        )
    best = "array(" + ", ".join(picks) + ")"
    return embeddings.select(
        F.col(id_col),
        F.expr(best).alias("_best"),
    ).select(
        F.col(id_col),
        F.expr("transform(_best, x -> x.c)").alias("codes"),
        F.expr(
            "aggregate(_best, cast(0.0 as double), (acc, x) -> acc + x.d)"
        ).alias("recon_err"),
    )
