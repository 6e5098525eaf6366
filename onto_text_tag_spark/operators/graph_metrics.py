"""Graph analytics over the materialized KG edge set.

The reference stops at emitting the graph (hv_generate.py writes the
co-occurrence pairs and is-a edges and serves them); a web-scale KG
pipeline additionally needs cheap structural metrics over the
materialized edges — degree profiles for skew diagnosis (which CURIEs
are hubs and will skew every downstream join) and a centrality score
for entity ranking.  Both operate on the (src, dst[, weight]) edge
relation the triple sink produces, never on the corpus.

Scale notes:

* ``degree_stats`` is one explode + one groupBy — a single shuffle on
  the node id, partial-aggregated map-side.  At 10^12 docs the edge set
  is the small relation (pairs of ontology CURIEs: bounded by the
  ontology, not the corpus), so this is trivially cheap; the same code
  also profiles document-level graphs (mention bipartite) where the
  map-side combine carries the load.
* ``pagerank`` is the standard power iteration expressed as DataFrame
  joins: contributions = ranks ⋈ out-edges (shuffle on src), new ranks
  = groupBy(dst) (shuffle on dst).  Both shuffles hash-partition on
  node ids; hub skew is absorbed by partial aggregation of the
  contribution sum.  Each iteration ``localCheckpoint``s the rank
  frame, truncating the lineage so the plan stays O(1) deep (the
  classic iterative-algorithm pitfall: un-truncated plans grow one
  join per round and overwhelm the optimizer).  Dangling nodes (no
  out-edges) redistribute uniformly via the standard correction term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node degree over an undirected edge relation.

    Returns (node, degree) — the number of distinct neighbors.  Edges
    are treated as undirected (each row contributes to both endpoints)
    and multi-edges collapse (distinct neighbor count, matching the
    canonical ``src < dst`` storage where each pair appears once).
    """
    half = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    other = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    return (
        half.unionByName(other)
        .groupBy("node")
        .agg(F.countDistinct("nbr").alias("degree"))
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame | list[str],
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 20,
    undirected: bool = True,
) -> DataFrame:
    """(node, dist) — minimum hop count from any source node, by
    frontier-expanding BFS.  Nodes unreachable within ``max_hops`` are
    absent from the result.  Deterministic (set semantics per level).

    The reference's only traversal is the is-a descendant walk
    (app.py:116-151, a driver-side recursion into pyhornedowl); this is
    the distributed generalization: multi-source shortest hop counts
    over any KG edge relation (is-a depth, co-occurrence neighborhood
    radius).  Scale shape: each round joins only the FRONTIER against
    the edge set — frontier-sized shuffles, not graph-sized; the
    visited set grows monotonically and the anti-join prunes
    re-expansion, so total work is O(edges within the reached
    component), each edge touched at most once per direction.  Every
    round ``localCheckpoint``s, truncating lineage exactly like
    ``pagerank``/``transitive_closure`` (plans stay O(1) deep).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=True)

    if isinstance(sources, list):
        spark = edges.sparkSession
        from onto_text_tag_spark.session import local_df

        srcs = local_df(
            spark, [(s,) for s in sources], "node string"
        )
    else:
        cols = sources.columns
        srcs = sources.select(F.col(cols[0]).alias("node"))
    visited = (
        srcs.distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        if not nxt.head(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    orient_by_degree: bool = True,
) -> DataFrame:
    """(node, triangles) — number of triangles each node participates
    in, over an undirected simple graph.  Nodes in no triangle are
    absent (join the node table with ``coalesce(triangles, 0)`` for a
    dense profile).  Deterministic; multi-edges and self-loops collapse.

    Scale shape (the classic oriented wedge-closure counting): edges
    are ORIENTED low→high endpoint, wedges are generated per oriented
    out-neighborhood and closed against the oriented edge set — every
    triangle is enumerated exactly once, as its unique oriented form.
    With ``orient_by_degree`` the order is (degree, node) instead of
    node id, which bounds each out-degree by O(√m) on any graph, so
    wedge generation is O(m^1.5) worst-case instead of Σdeg² — the
    difference between feasible and not on a co-occurrence graph whose
    hubs (ultra-frequent ontology classes) would otherwise generate
    |hub-degree|² wedge candidates.  Three shuffles total: the degree
    aggregate, the wedge self-join on the apex, and the closure join on
    the (lo, hi) pair; per-node counts are orientation-invariant, so
    either orientation returns identical values (pinned by test).
    """
    a, b = F.col(src), F.col(dst)
    pairs = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .distinct()
    )
    if orient_by_degree:
        deg = degree_stats(pairs, "a", "b")
        with_deg = (
            pairs.join(deg.withColumnRenamed("node", "a"), "a")
            .withColumnRenamed("degree", "_da")
            .join(deg.withColumnRenamed("node", "b"), "b")
            .withColumnRenamed("degree", "_db")
        )
        ka = F.struct(F.col("_da").alias("d"), F.col("a").alias("n"))
        kb = F.struct(F.col("_db").alias("d"), F.col("b").alias("n"))
        out = with_deg.select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(ka < kb, kb).otherwise(ka).alias("kv"),
        )
    else:
        out = pairs.select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            F.struct(F.lit(0).alias("d"), F.col("b").alias("n")).alias("kv"),
        )
    o1 = out.alias("o1")
    o2 = out.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.kv") < F.col("o2.kv")),
    ).select(
        F.col("o1.u").alias("apex"),
        F.col("o1.v").alias("x"),
        F.col("o2.v").alias("y"),
    )
    closer = out.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closer, ["x", "y"])
    return (
        tri.select(
            F.explode(F.array("apex", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected simple graph:
    for every NON-adjacent node pair (u, w) sharing at least one
    neighbor, ``score = Σ_{v ∈ N(u)∩N(w)} 1/ln(deg(v))`` plus the raw
    common-neighbor count.  Output ``(u, w, common, score)`` with
    ``u < w`` canonical; adjacent pairs are excluded (they need no
    prediction).  Deterministic; multi-edges/self-loops collapse.

    This is the KG-completion primitive the reference's association
    view motivates but never computes: which ontology-class pairs are
    NOT yet co-mentioned in any document but sit in densely shared
    co-occurrence neighborhoods (candidate missing edges for curation).

    Scale shape: wedge generation through each shared neighbor v costs
    deg(v)² pairs — the Σdeg² hazard.  Unlike triangle counting there
    is no orientation trick (both wedge arms must be enumerated), so
    the standard mitigation is ``max_neighbor_degree``: drop hub
    BRIDGES above the cap before pair generation.  A hub contributes
    only 1/ln(deg) ≈ 0 per pair while generating quadratically many of
    them, so capping removes almost no score mass — the exact trade
    every production link-prediction system makes.

    Wedges are generated JOINLESSLY (the ``kg_cooccur`` device): ONE
    shuffle collects each bridge's neighbor list (whose size IS
    deg(v) — no separate degree aggregate, no degree join, and the
    hub cap is a post-aggregate ``size()`` filter), pair explosion is
    then partition-local JVM work, and the following (u, w) hash
    aggregate absorbs it map-side before its exchange.  The
    adjacency exclusion is FOLDED INTO the same aggregate: the edge
    relation streams into the (u, w) groupBy tagged ``_adj = 1`` and
    ``max(_adj) = 0`` filters adjacent pairs — no separate anti-join,
    so the quadratic candidate relation is never sorted or joined.
    Total: exactly 2 shuffles end to end (was 4 shuffles + an
    anti-join on the quadratic stream).  A common neighbor has
    deg ≥ 2 by construction, so ln(deg) is never 0.
    """
    a, b = F.col(src), F.col(dst)
    pairs = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = pairs.select(F.col("a").alias("node"), F.col("b").alias("v")) \
        .unionByName(
            pairs.select(F.col("b").alias("node"), F.col("a").alias("v"))
        )
    # deg-1 nodes can never bridge a wedge (one arm only) — and ln(1)=0
    # would divide by zero under ANSI semantics, so they exit here.
    by_v = (
        adj.groupBy("v")
        .agg(F.sort_array(F.collect_set("node")).alias("_ns"))
        .where(F.size("_ns") >= 2)
    )
    if max_neighbor_degree is not None:
        by_v = by_v.where(F.size("_ns") <= max_neighbor_degree)
    # ordered pairs stream directly off the sorted list: the second
    # explode slices PAST the first element's position, so only u < w
    # rows are ever generated — half the row volume of
    # explode×explode + filter, with no per-row pair array materialized
    cand = (
        by_v.select(
            (1.0 / F.log(F.size("_ns").cast("double"))).alias("_w"),
            F.posexplode("_ns").alias("_i", "u"),
            "_ns",
        )
        .select(
            "_w", "u",
            F.explode(
                F.slice(
                    "_ns", F.col("_i") + 2,
                    F.size("_ns") - F.col("_i") - 1,
                )
            ).alias("w"),
            F.lit(0).alias("_adj"),
        )
    )
    existing = pairs.select(
        F.col("a").alias("u"), F.col("b").alias("w"),
        F.lit(0.0).alias("_w"), F.lit(1).alias("_adj"),
    )
    return (
        cand.unionByName(existing)
        .groupBy("u", "w")
        .agg(
            # count(*) == wedge-row count for every SURVIVING group: a
            # group that contains any edge row fails the filter below,
            # so the edge rows never inflate an emitted `common`
            F.count("*").cast("long").alias("common"),
            F.sum("_w").alias("score"),
            F.max("_adj").alias("_any_adj"),
        )
        .where(F.col("_any_adj") == 0)
        .drop("_any_adj")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation, made fully
    deterministic: every node starts labeled with its own id; each
    round every node adopts the most frequent label among its
    neighbors, ties broken by MIN label.  Fixed ``rounds`` (no
    convergence test — synchronous LPA can oscillate on bipartite
    structures, and a fixed round count is what makes the result
    reproducible AND SQL-replayable).  Output ``(node, community)``
    over all nodes incident to an edge.

    Scale shape per round: one join of the edge relation against the
    label frame (shuffle keyed on node id), one (node, label) count
    aggregate with map-side partials, one per-node window for the
    argmax — all hash-partitioned on high-cardinality node ids; hub
    label multiplicity collapses in the partial aggregate.  Each round
    ``localCheckpoint``s, so the plan stays O(1) deep exactly like
    ``pagerank``/``bfs_distances``.  Cost is O(rounds · |E|): LPA is
    the cheap community pass run over the materialized co-occurrence
    edge table (CURIE-pair-sized, ≪ corpus) to group ontology classes
    into mention-cluster themes.

    ``weight_col`` makes each neighbor's vote proportional to the edge
    weight (shared-doc count on the co-occurrence graph) instead of 1 —
    the natural reading when a 10,000-doc edge should pull harder than
    a 1-doc edge.  Ties still break to MIN label; determinism holds
    because weights are exact longs summed per (node, label).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                w.alias("_w"))
    )
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "_w")
        )
        .groupBy("src", "dst")
        .agg(F.max("_w").alias("_w"))  # multi-edges collapse, like before
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    win = Window.partitionBy("node").orderBy(
        F.col("_n").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        labels = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label", "_w")
            .groupBy("node", "label")
            .agg(F.sum("_w").alias("_n"))
            .withColumn("_rk", F.row_number().over(win))
            .where(F.col("_rk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    undirected: bool = True,
    weight_col: str | None = None,
    seeds: list | None = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of power iteration.

    Ranks are a probability distribution (sum to 1).  ``undirected``
    mirrors every edge, the right reading for the co-occurrence graph;
    pass False for directed edge sets (e.g. is-a).  Deterministic: no
    randomness, fixed iteration count.

    ``weight_col``: rank flows along each out-edge proportionally to
    its weight (w / Σ_out w) instead of uniformly (1 / out-degree) —
    the weighted-PageRank reading where a heavily co-mentioned pair
    conducts more centrality than an incidental one.

    ``seeds``: PERSONALIZED PageRank — teleport mass (and dangling
    mass) returns uniformly to the seed node set instead of the whole
    graph, so ranks measure proximity to the seeds: "classes related
    to X" as a random walk with restart, the distributed
    generalization of the reference's one-hop association probe
    (app.py:329-358).  Seeds are a query-sized driver-side list (ids
    absent from the edge set are ignored); the per-node teleport term
    becomes a literal IN — no extra join or shuffle versus the global
    walk.  Raises ``ValueError`` if no seed is in the graph.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("_w")
    )
    if undirected:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("src"), F.col(src).alias("dst"),
                w.alias("_w"),
            )
        )
    e = (
        e.groupBy("src", "dst").agg(F.max("_w").alias("_w"))
        .localCheckpoint(eager=True)
    )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.sum("_w").alias("_deg"))
    # (src, dst, _deg) — static per iteration, checkpoint once
    contrib_edges = e.join(out_deg, "src").localCheckpoint(eager=True)

    # The dangling node SET is static (only its rank mass moves): find
    # it once.  Undirected graphs never have one (mirroring gives every
    # node an out-edge), so the per-iteration mass job is skipped
    # entirely there — one scalar collect per round only when a real
    # sink exists.
    dangling_nodes = (
        nodes.join(out_deg, nodes["node"] == out_deg["src"], "left_anti")
        .localCheckpoint(eager=True)
    )
    has_dangling = not undirected and bool(dangling_nodes.head(1))

    if seeds is not None:
        in_graph = sorted(
            r["node"]
            for r in nodes.where(
                F.col("node").isin(list(set(seeds)))
            ).collect()
        )
        if not in_graph:
            raise ValueError("no seed node appears in the edge set")
        ns = float(len(in_graph))
        is_seed = F.col("node").isin(in_graph)
        ranks = nodes.withColumn(
            "rank", F.when(is_seed, F.lit(1.0 / ns)).otherwise(F.lit(0.0))
        )
    else:
        is_seed = None
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("_w") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sum"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # uniformly (keeps the distribution summing to 1)
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        ) if has_dangling else 0.0
        if is_seed is not None:
            # teleport + dangling mass restart AT THE SEEDS only
            teleport = (1.0 - damping) / ns + damping * dangling / ns
            base_col = F.when(is_seed, F.lit(teleport)).otherwise(
                F.lit(0.0)
            )
        else:
            base_col = F.lit(
                (1.0 - damping) / n + damping * dangling / n
            )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.lit(damping) * F.coalesce(F.col("_sum"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def k_core(
    edges: DataFrame,
    k: int,
    max_iterations: int = 50,
) -> DataFrame:
    """(node, deg) of the k-core: the maximal subgraph where every node
    keeps degree ≥ k — the standard "dense nucleus" extractor (spam
    neighborhoods, topical cores) the raw degree profile can't give,
    because degree counts neighbors that themselves get peeled.

    Iterative peel to fixpoint: drop nodes with degree < k, restrict
    edges to survivors, repeat.  Each round is one degree aggregate
    (map-side combined) plus two survivor semi-joins, all keyed on node
    ids; the surviving-edge frame ``localCheckpoint``s per round to
    truncate lineage.  Rounds are bounded by the peel depth (real graphs:
    a handful), not the node count.  Input treated as undirected;
    self-loops dropped.
    """
    e = edges.select(F.col("src"), F.col("dst")).where(F.col("src") != F.col("dst"))
    e = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iterations):
        if n_edges == 0:
            break
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= k).select(F.col("src").alias("node"))
        pruned = (
            e.join(keep, e["src"] == keep["node"], "left_semi")
            .join(keep, F.col("dst") == keep["node"], "left_semi")
            .localCheckpoint(eager=True)
        )
        n_new = pruned.count()
        e = pruned
        if n_new == n_edges:
            break
        n_edges = n_new
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )


def hits(
    edges: DataFrame,
    iterations: int = 6,
) -> DataFrame:
    """(node, hub, auth) after ``iterations`` rounds of HITS power
    iteration over the DIRECTED edge set — the link-graph dual of
    PageRank: a good hub points at good authorities, a good authority is
    pointed at by good hubs.  On a host graph this separates directories/
    aggregators (high hub) from reference targets (high auth), which one
    centrality score conflates.

    L1-normalized per half-step (keeps the oracle algebra exact in SQL;
    the classic L2 variant only rescales, rankings are identical).  Same
    physics as ``pagerank``: each half-step is one edge-keyed join + one
    map-side-combined sum, ``localCheckpoint`` truncates lineage per
    round; hub skew lands in partial aggregation, never one reducer.
    Nodes with no in-edges get auth 0 (resp. hub 0 for no out-edges).

    Cost shape: one edge join per half-step, materialized ONCE.  The
    normalization divisor is summed from the (node-sized) checkpointed
    aggregate and carried as a scalar into the NEXT half-step
    (``sum(x)/T == sum(x/T)``), so no half-step re-runs its edge join
    for the total, and the zero-fill join with the node list happens
    once at the end instead of every round — ~2x fewer edge-sized jobs
    per iteration than the eager-normalize formulation.
    """
    e = (
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    hubs = nodes.withColumn("hub", F.lit(1.0 / n))
    h_scale = 1.0

    def _half(scores, score_col, scale, key_in, key_out, out_name):
        # normalize the INPUT lazily: dividing the summed contributions
        # by the carried scale equals normalizing scores first (linear),
        # without materializing a normalized frame per half-step
        raw = (
            e.join(scores, e[key_in] == scores["node"])
            .groupBy(F.col(key_out).alias("node"))
            .agg((F.sum(score_col) / F.lit(scale)).alias(out_name))
            .localCheckpoint(eager=True)
        )
        total = raw.agg(
            F.coalesce(F.sum(out_name), F.lit(1.0))
        ).collect()[0][0]
        return raw, (total if total else 1.0)

    auths, a_scale = None, 1.0
    for _ in range(iterations):
        auths, a_scale = _half(hubs, "hub", h_scale, "src", "dst", "auth")
        hubs, h_scale = _half(auths, "auth", a_scale, "dst", "src", "hub")
    return (
        nodes
        .join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            (F.coalesce(F.col("hub"), F.lit(0.0)) / F.lit(h_scale))
            .alias("hub"),
            (F.coalesce(F.col("auth"), F.lit(0.0)) / F.lit(a_scale))
            .alias("auth"),
        )
    )


def _dense_ranks(nodes: DataFrame) -> DataFrame:
    """(node, i): dense 0-based lexicographic ranks WITHOUT a global
    single-partition window.  Range-repartition on the key (global order
    preserved across partitions), rank within each partition, then add
    the partition's cumulative offset — offsets come from one
    partition-count-sized aggregate, broadcast back.  Exactly equal to
    ``row_number() OVER (ORDER BY node) - 1`` at any parallelism."""
    parts = max(nodes.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = nodes.repartitionByRange(parts, F.col("node")).select(
        "node", F.spark_partition_id().alias("_pid")
    )
    local = ranged.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy("node")
        ),
    )
    counts = (
        local.groupBy("_pid").agg(F.count("*").alias("_c")).collect()
    )
    offset = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offset[row["_pid"]] = acc
        acc += row["_c"]
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offset.items() for x in pid_off]
    )
    return local.select(
        "node",
        (F.col("_r") - 1 + off_map[F.col("_pid")]).cast("long").alias("i"),
    )


def negative_edges(
    edges: DataFrame,
    k: int = 3,
    seed: int = 13,
) -> DataFrame:
    """(src, dst) NON-edges: ≤ k deterministic negative samples per node
    — the training counterpart of the positive triple set (KG-embedding
    objectives like TransE/DistMult train one negative per positive;
    link-prediction evaluation needs a fixed negative pool).

    Draws must be (a) uniform-ish, (b) reproducible across reruns and
    cluster sizes, (c) cheap.  ``rand()`` fails (b); driver-side
    sampling fails (c).  Here nodes get dense lexicographic ranks —
    computed as a RANGE-partitioned sort plus per-partition offsets
    (partition row counts are partition-count-sized, collected once),
    never a global single-partition window, so the rank step scales
    with the sort and is identical at every parallelism.  Node i then
    proposes partners at index ``(i·1103515245 + j·12345 + seed) mod n``
    for j = 1..k — an LCG step, fully deterministic, no extra shuffle
    beyond the rank and the index equi-join back to node ids.
    Canonicalized ``src < dst``, de-duplicated, and anti-joined against
    the real edge set (mirror-insensitive).  Output ≤ n·k rows.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        und.select(F.col("src").alias("node"))
        .unionByName(und.select(F.col("dst").alias("node")))
        .distinct()
    )
    idx = _dense_ranks(nodes).localCheckpoint(eager=True)
    n = idx.count()
    cand = (
        idx.select(
            F.col("node").alias("a"),
            F.col("i"),
            F.explode(F.expr(f"sequence(1, {int(k)})")).alias("j"),
        )
        .withColumn(
            "p",
            F.pmod(
                F.col("i").cast("long") * F.lit(1103515245).cast("long")
                + F.col("j").cast("long") * F.lit(12345).cast("long")
                + F.lit(int(seed)).cast("long"),
                F.lit(n).cast("long"),
            ),
        )
        .where(F.col("p") != F.col("i"))
    )
    partner = idx.select(F.col("node").alias("b"), F.col("i").alias("p"))
    pairs = (
        cand.join(partner, "p")
        .select(
            F.least("a", "b").alias("src"),
            F.greatest("a", "b").alias("dst"),
        )
        .distinct()
    )
    return pairs.join(und, ["src", "dst"], "left_anti")


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 2,
    seed: int = 7,
) -> DataFrame:
    """(walk_id, step, node) — fixed-length random walks from every
    node, the training corpus DeepWalk/node2vec-style graph embeddings
    consume (each walk is a "sentence" over node tokens).

    Determinism contract (same draws at any parallelism, rerun, or
    cluster size — ``rand()`` gives none of this): the step-t draw is
    ``md5(walk_id ':' t) mod degree(cur)``, an engine-portable hash the
    SQL oracle replays bit-for-bit.  Neighbors get per-source dense
    ranks once (window partitioned by src — partitioned, so hub fan-out
    spreads across tasks); each step is then one (cur) → (cur, idx)
    equi-join pair, lineage-truncated.  Undirected mirroring guarantees
    every node has ≥1 neighbor, so walks never strand.
    """
    from onto_text_tag_spark.functions.hashing import md5_long

    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst"))
    e = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nb = e.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("src").orderBy("dst")
        ) - 1,
    ).localCheckpoint(eager=True)
    deg = nb.groupBy("src").agg(F.count("*").alias("deg"))

    starts = (
        deg.select("src")
        .select(
            F.col("src").alias("node"),
            F.explode(
                F.expr(f"sequence(0, {int(walks_per_node) - 1})")
            ).alias("w"),
        )
        .select(
            F.concat(F.col("node"), F.lit("#"), F.col("w").cast("string"),
                     F.lit("@"), F.lit(str(int(seed)))).alias("walk_id"),
            F.col("node"),
        )
    )
    out = starts.select("walk_id", F.lit(0).alias("step"), "node")
    cur = starts
    for t in range(1, int(walk_length) + 1):
        draw = F.pmod(
            md5_long(F.concat(F.col("walk_id"), F.lit(f":{t}"))),
            F.col("deg"),
        )
        nxt = (
            cur.join(deg, cur["node"] == deg["src"])
            .select("walk_id", F.col("node").alias("_cur"),
                    draw.alias("_idx"))
            .join(
                nb,
                (F.col("_cur") == nb["src"]) & (F.col("_idx") == nb["r"]),
            )
            .select("walk_id", F.col("dst").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select("walk_id", F.lit(t).alias("step"), "node")
        )
        cur = nxt
    return out
