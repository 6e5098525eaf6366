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
