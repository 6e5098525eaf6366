"""Graph-metrics operators: degree profile + PageRank power iteration.

PageRank is pinned numerically against an independent numpy twin with
identical semantics (undirected mirroring, dangling-mass uniform
redistribution, damping 0.85) — the driver check for ``kg_pagerank``
is rows-only (iterative, no SQL oracle), so this is its value gate.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.operators.graph_metrics import degree_stats, pagerank


@pytest.fixture(scope="module")
def edges(spark):
    # path a-b-c plus triangle c-d-e(-c), and an isolated pair f-g
    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "e"),
        ("f", "g"),
        ("a", "b"),  # multi-edge: must collapse
    ]
    return spark.createDataFrame(rows, "src string, dst string")


def test_degree_stats(edges):
    got = {r.node: r.degree for r in degree_stats(edges).collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 2, "e": 2, "f": 1, "g": 1}


def _numpy_pagerank(pairs, iterations=10, damping=0.85, undirected=True):
    es = set()
    for s, d in pairs:
        es.add((s, d))
        if undirected:
            es.add((d, s))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _d in es:
        out_deg[idx[s]] += 1
    ranks = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in es:
            contrib[idx[d]] += ranks[idx[s]] / out_deg[idx[s]]
        dangling = ranks[out_deg == 0].sum()
        ranks = (1 - damping) / n + damping * dangling / n + damping * contrib
    return dict(zip(nodes, ranks))


def test_pagerank_matches_numpy_twin(edges):
    pairs = [(r.src, r.dst) for r in edges.collect()]
    want = _numpy_pagerank(pairs)
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # hub c must outrank every leaf
    assert got["c"] == max(got.values())


def test_pagerank_directed_with_dangling(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "src string, dst string"
    )
    want = _numpy_pagerank([("a", "b"), ("c", "b")], undirected=False)
    got = {
        r.node: r.rank
        for r in pagerank(e, undirected=False).collect()
    }
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] == max(got.values())  # sink collects the mass


def test_bfs_distances_undirected(spark, edges):
    from onto_text_tag_spark.operators.graph_metrics import bfs_distances

    got = {
        r.node: r.dist
        for r in bfs_distances(edges, ["a"]).collect()
    }
    # path a-b-c then the triangle; f/g unreachable -> absent
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 3}


def test_bfs_distances_multi_source_directed(spark, edges):
    from onto_text_tag_spark.operators.graph_metrics import bfs_distances

    srcs = spark.createDataFrame([("a",), ("f",)], "node string")
    got = {
        r.node: r.dist
        for r in bfs_distances(edges, srcs, undirected=False).collect()
    }
    assert got == {"a": 0, "f": 0, "b": 1, "g": 1, "c": 2, "d": 3, "e": 3}


def test_bfs_distances_max_hops_bounds_reach(spark, edges):
    from onto_text_tag_spark.operators.graph_metrics import bfs_distances

    got = {
        r.node: r.dist
        for r in bfs_distances(edges, ["a"], max_hops=1).collect()
    }
    assert got == {"a": 0, "b": 1}


def test_bfs_distances_cycle_terminates(spark):
    from onto_text_tag_spark.operators.graph_metrics import bfs_distances

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {
        r.node: r.dist
        for r in bfs_distances(e, ["a"], undirected=False).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


def test_triangle_counts_k4(spark):
    from onto_text_tag_spark.operators.graph_metrics import triangle_counts

    # K4: every node sits in C(3,2) = 3 triangles
    nodes = ["a", "b", "c", "d"]
    e = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y],
        "src string, dst string",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_path_has_none(spark):
    from onto_text_tag_spark.operators.graph_metrics import triangle_counts

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    assert triangle_counts(e).count() == 0


def test_triangle_counts_orientation_invariant(spark):
    from onto_text_tag_spark.operators.graph_metrics import triangle_counts

    # bowtie (two triangles sharing node c) + noise edges, rows stored in
    # MIXED direction with duplicates and a self-loop — the operator must
    # canonicalize; per-node counts must not depend on the orientation.
    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"), ("e", "c"),
        ("b", "a"), ("a", "c"),          # reversed duplicates
        ("e", "e"),                      # self-loop
        ("d", "f"),                      # dangling edge
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    by_deg = {r["node"]: r["triangles"]
              for r in triangle_counts(e, orient_by_degree=True).collect()}
    by_id = {r["node"]: r["triangles"]
             for r in triangle_counts(e, orient_by_degree=False).collect()}
    assert by_deg == by_id == {"a": 1, "b": 1, "c": 2, "d": 1, "e": 1}


def test_adamic_adar_scores(spark, edges):
    import math

    from onto_text_tag_spark.operators.graph_metrics import adamic_adar

    got = {
        (r.u, r.w): (r.common, r.score)
        for r in adamic_adar(edges).collect()
    }
    # adjacency: a-b, b-c, c-d, d-e, c-e, f-g (dup a-b collapses)
    # non-adjacent pairs with common neighbors:
    #   (a,c) via b (deg 2); (b,d) via c (deg 3); (b,e) via c (deg 3)
    want = {
        ("a", "c"): (1, 1 / math.log(2)),
        ("b", "d"): (1, 1 / math.log(3)),
        ("b", "e"): (1, 1 / math.log(3)),
    }
    assert set(got) == set(want)
    for k, (common, score) in want.items():
        assert got[k][0] == common
        assert got[k][1] == pytest.approx(score, abs=1e-12)


def test_adamic_adar_hub_cap_drops_bridges(spark, edges):
    from onto_text_tag_spark.operators.graph_metrics import adamic_adar

    # cap 2 removes c (deg 3) as a bridge: only the (a,c)-via-b pair stays
    got = {(r.u, r.w) for r in
           adamic_adar(edges, max_neighbor_degree=2).collect()}
    assert got == {("a", "c")}


def _py_lpa(pairs, rounds=4):
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in pairs:
        if s == d:
            continue
        adj[s].add(d)
        adj[d].add(s)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            new[v] = min(
                cnt, key=lambda lab: (-cnt[lab], lab)
            )
        labels = new
    return labels


def test_label_propagation_matches_python_twin(spark, edges):
    from onto_text_tag_spark.operators.graph_metrics import label_propagation

    pairs = [(r.src, r.dst) for r in edges.collect()]
    for rounds in (1, 2, 4):
        want = _py_lpa(pairs, rounds=rounds)
        got = {
            r.node: r.community
            for r in label_propagation(edges, rounds=rounds).collect()
        }
        assert got == want, f"rounds={rounds}"


def test_label_propagation_two_triangles(spark):
    from onto_text_tag_spark.operators.graph_metrics import label_propagation

    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = {r.node: r.community for r in label_propagation(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x"}


def _numpy_weighted_pagerank(triples, iterations=10, damping=0.85):
    # undirected, weighted: flow proportional to w / sum_out(w)
    es = {}
    for s, d, w in triples:
        es[(s, d)] = max(es.get((s, d), 0.0), float(w))
        es[(d, s)] = max(es.get((d, s), 0.0), float(w))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for (s, _d), w in es.items():
        out_w[idx[s]] += w
    ranks = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for (s, d), w in es.items():
            contrib[idx[d]] += ranks[idx[s]] * w / out_w[idx[s]]
        ranks = (1 - damping) / n + damping * contrib
    return dict(zip(nodes, ranks))


def test_pagerank_weighted_matches_numpy_twin(spark):
    triples = [
        ("a", "b", 10), ("b", "c", 1), ("a", "c", 1), ("c", "d", 5),
    ]
    e = spark.createDataFrame(
        triples, "src string, dst string, weight long"
    )
    want = _numpy_weighted_pagerank(triples)
    got = {
        r.node: r.rank
        for r in pagerank(e, weight_col="weight").collect()
    }
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # weighting must actually change the result vs the unweighted run
    unweighted = {r.node: r.rank for r in pagerank(e).collect()}
    assert any(
        abs(unweighted[n] - got[n]) > 1e-6 for n in got
    )


def test_label_propagation_weighted_overrides_majority(spark):
    from onto_text_tag_spark.operators.graph_metrics import label_propagation

    # x has two light neighbors in community p/q and ONE heavy neighbor h:
    # unweighted LPA (round 1) gives x the min of {p,q,h}=h? counts all 1,
    # tie -> min label; weighted makes h's label win outright.
    rows = [
        ("p", "x", 1), ("q", "x", 1), ("h", "x", 5),
    ]
    e = spark.createDataFrame(rows, "src string, dst string, weight long")
    got_w = {
        r.node: r.community
        for r in label_propagation(e, rounds=1, weight_col="weight").collect()
    }
    assert got_w["x"] == "h"
    got_u = {
        r.node: r.community
        for r in label_propagation(e, rounds=1).collect()
    }
    assert got_u["x"] == "h"  # tie-break min("h","p","q") = "h" here
    # make the tie-break differ from the weighted winner: rename h -> z
    rows2 = [("p", "x", 1), ("q", "x", 1), ("z", "x", 5)]
    e2 = spark.createDataFrame(rows2, "src string, dst string, weight long")
    got_w2 = {
        r.node: r.community
        for r in label_propagation(e2, rounds=1, weight_col="weight").collect()
    }
    got_u2 = {
        r.node: r.community
        for r in label_propagation(e2, rounds=1).collect()
    }
    assert got_w2["x"] == "z"   # weight wins
    assert got_u2["x"] == "p"   # unweighted tie-break: min label


def _numpy_ppr(pairs, seeds, iterations=10, damping=0.85):
    """Personalized twin: teleport (and dangling) mass restarts at the
    seeds only; init = uniform over seeds.  Undirected mirroring."""
    es = set()
    for s, d in pairs:
        es.add((s, d))
        es.add((d, s))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _d in es:
        out_deg[idx[s]] += 1
    seed_ix = [idx[s] for s in seeds if s in idx]
    ns = len(seed_ix)
    ranks = np.zeros(n)
    ranks[seed_ix] = 1.0 / ns
    reset = np.zeros(n)
    reset[seed_ix] = 1.0 / ns
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in es:
            contrib[idx[d]] += ranks[idx[s]] / out_deg[idx[s]]
        dangling = ranks[out_deg == 0].sum()
        ranks = (1 - damping + damping * dangling) * reset + damping * contrib
    return dict(zip(nodes, ranks))


def test_personalized_pagerank_matches_numpy_twin(edges):
    pairs = [(r.src, r.dst) for r in edges.collect()]
    want = _numpy_ppr(pairs, ["a"])
    got = {
        r.node: r.rank for r in pagerank(edges, seeds=["a"]).collect()
    }
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # proximity, not global centrality: the seed's component holds ALL
    # the mass, the disconnected pair f-g none
    assert got["f"] == 0.0 and got["g"] == 0.0
    # and the seed itself outranks the far side of its own component
    assert got["a"] > got["e"]


def test_personalized_pagerank_multi_seed_and_missing_seed(edges):
    pairs = [(r.src, r.dst) for r in edges.collect()]
    # one real seed + one absent from the graph: absent id ignored
    want = _numpy_ppr(pairs, ["c", "f"])
    got = {
        r.node: r.rank
        for r in pagerank(edges, seeds=["c", "f", "zzz"]).collect()
    }
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError):
        pagerank(edges, seeds=["zzz"])


def _python_kcore(pairs, k):
    from collections import defaultdict
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_k_core_triangle_with_tail(spark):
    from onto_text_tag_spark.operators.graph_metrics import k_core
    from onto_text_tag_spark.session import local_df

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    e = local_df(spark, pairs, "src string, dst string")
    got2 = {r["node"]: r["deg"] for r in k_core(e, 2).collect()}
    # tail d-e peels (e has deg 1, then d); triangle survives
    assert got2 == {"a": 2, "b": 2, "c": 2}
    got1 = {r["node"]: r["deg"] for r in k_core(e, 1).collect()}
    assert got1 == _python_kcore(pairs, 1)
    # k above max degree: empty core
    assert k_core(e, 5).count() == 0


def test_k_core_matches_python_twin_random(spark):
    import random

    from onto_text_tag_spark.operators.graph_metrics import k_core
    from onto_text_tag_spark.session import local_df

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    pairs = list({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)
    })
    e = local_df(spark, pairs, "src string, dst string")
    for k in (2, 3, 4):
        got = {r["node"]: r["deg"] for r in k_core(e, k).collect()}
        assert got == _python_kcore(pairs, k), f"k={k}"


def _numpy_hits(pairs, iterations=6):
    es = sorted(set(pairs))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = np.zeros(n)
        for s, d in es:
            a[idx[d]] += h[idx[s]]
        a /= a.sum() if a.sum() else 1.0
        h = np.zeros(n)
        for s, d in es:
            h[idx[s]] += a[idx[d]]
        h /= h.sum() if h.sum() else 1.0
    return ({v: h[i] for v, i in idx.items()},
            {v: a[i] for v, i in idx.items()})


def test_hits_matches_numpy_twin(spark):
    from onto_text_tag_spark.operators.graph_metrics import hits
    from onto_text_tag_spark.session import local_df

    # hub x points at 3 authorities; y points at 2 of them; b->c chain
    pairs = [("x", "p"), ("x", "q"), ("x", "r"), ("y", "p"), ("y", "q"),
             ("b", "c"), ("x", "p")]  # duplicate edge collapses
    e = local_df(spark, pairs, "src string, dst string")
    want_h, want_a = _numpy_hits(pairs)
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert set(got) == set(want_h)
    for v in want_h:
        assert got[v][0] == pytest.approx(want_h[v], abs=1e-9)
        assert got[v][1] == pytest.approx(want_a[v], abs=1e-9)
    # pure sinks have hub 0; pure sources have auth 0
    assert got["p"][0] == 0.0 and got["x"][1] == 0.0
    # x out-links a superset of y's targets -> at least y's hub score
    assert got["x"][0] > got["y"][0]


def test_negative_edges_are_nonedges_and_deterministic(spark):
    from onto_text_tag_spark.operators.graph_metrics import negative_edges
    from onto_text_tag_spark.session import local_df

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "a")]
    e = local_df(spark, pairs, "src string, dst string")
    neg1 = {(r["src"], r["dst"]) for r in negative_edges(e, k=4).collect()}
    neg2 = {(r["src"], r["dst"]) for r in negative_edges(e, k=4).collect()}
    assert neg1 == neg2 and neg1  # deterministic, non-empty
    real = {tuple(sorted(p)) for p in pairs}
    for s, d in neg1:
        assert s < d
        assert (s, d) not in real
    # different seed -> (possibly) different pool, still disjoint from real
    neg3 = {(r["src"], r["dst"])
            for r in negative_edges(e, k=4, seed=99).collect()}
    for s, d in neg3:
        assert (s, d) not in real
    # k=1 pool is a subset-sized draw: at most one per node
    n1 = negative_edges(e, k=1).count()
    assert 0 < n1 <= 5


def test_dense_ranks_equal_global_sort(spark):
    import random

    from onto_text_tag_spark.operators.graph_metrics import _dense_ranks
    from onto_text_tag_spark.session import local_df

    rng = random.Random(3)
    names = [f"n{rng.randrange(10_000)}" for _ in range(500)]
    uniq = sorted(set(names))
    nodes = local_df(spark, [(x,) for x in set(names)], "node string")
    got = {r["node"]: r["i"] for r in _dense_ranks(nodes).collect()}
    assert got == {x: i for i, x in enumerate(uniq)}
    # plan has no partition-less window (the single-partition funnel)
    plan = _dense_ranks(nodes)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan


def test_random_walks_deterministic_and_edge_respecting(spark):
    from onto_text_tag_spark.operators.graph_metrics import random_walks
    from onto_text_tag_spark.session import local_df

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "a")]
    e = local_df(spark, pairs, "src string, dst string")
    w1 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(e, walk_length=4, walks_per_node=2).collect()
    )
    w2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(e, walk_length=4, walks_per_node=2).collect()
    )
    assert w1 == w2 and w1
    # every walk: 5 steps (0..4), starts at its node, consecutive steps
    # are graph edges
    adj = set()
    for s, d in pairs:
        adj.add((s, d))
        adj.add((d, s))
    bywalk = {}
    for wid, step, node in w1:
        bywalk.setdefault(wid, {})[step] = node
    assert len(bywalk) == 10  # 5 nodes × 2 walks
    for wid, steps in bywalk.items():
        assert sorted(steps) == [0, 1, 2, 3, 4]
        assert steps[0] == wid.split("#")[0]
        for t in range(4):
            assert (steps[t], steps[t + 1]) in adj, (wid, t)
    # a different seed changes at least one walk
    w3 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(e, walk_length=4, walks_per_node=2,
                              seed=99).collect()
    )
    assert [x[2] for x in w3] != [x[2] for x in w1] or w3 != w1
