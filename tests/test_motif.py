"""Motif (basic-graph-pattern) matching: operators/motif.py.

Semantics pinned against hand-enumerated bindings on small graphs,
including edge-struct exposure, anonymous vertices, negated terms, and
the error surface (disjoint components, malformed terms).
"""

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.operators.motif import find


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("a", "b", "knows", 1),
        ("b", "c", "knows", 2),
        ("a", "c", "knows", 3),
        ("c", "d", "likes", 4),
    ]
    return spark.createDataFrame(
        rows, "src string, dst string, pred string, weight long"
    )


def test_single_term_binds_all_edges(g):
    got = {(r.x, r.y) for r in find(g, "(x)-[]->(y)").collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")}


def test_edge_variable_exposes_attributes(g):
    rows = find(g, "(x)-[e]->(y)").where(F.col("e.pred") == "likes").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.x, r.y) == ("c", "d")
    assert (r.e.src, r.e.dst, r.e.pred, r.e.weight) == ("c", "d", "likes", 4)


def test_two_hop_chain(g):
    got = {
        (r.x, r.y, r.z)
        for r in find(g, "(x)-[]->(y); (y)-[]->(z)").collect()
    }
    assert got == {
        ("a", "b", "c"),
        ("b", "c", "d"),
        ("a", "c", "d"),
    }


def test_anonymous_vertex_not_in_output(g):
    df = find(g, "(x)-[]->(); ()-[]->(x)")
    assert df.columns == ["x"]
    # x must have an out-edge and an in-edge: b and c qualify
    assert {r.x for r in df.collect()} == {"b", "c"}


def test_negated_term_prunes_closed_wedges(g):
    # open wedges: x->y->z with NO x->z edge
    got = {
        (r.x, r.y, r.z)
        for r in find(g, "(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)").collect()
    }
    # a->b->c is closed by a->c; the two wedges ending at d stay open
    assert got == {("b", "c", "d"), ("a", "c", "d")}


def test_self_loop_pattern(spark):
    e = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string"
    )
    got = [r.v for r in find(e, "(v)-[]->(v)").collect()]
    assert got == ["a"]


def test_duplicate_edges_duplicate_bindings(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b")], "src string, dst string"
    )
    assert find(e, "(x)-[]->(y)").count() == 2
    assert find(e.distinct(), "(x)-[]->(y)").count() == 1


def test_errors(g):
    with pytest.raises(ValueError, match="unparseable"):
        find(g, "(x)->[e]-(y)")
    with pytest.raises(ValueError, match="cartesian"):
        find(g, "(x)-[]->(y); (p)-[]->(q)")
    with pytest.raises(ValueError, match="cannot name its edge"):
        find(g, "(x)-[]->(y); !(x)-[e]->(y)")
    with pytest.raises(ValueError, match="unbound"):
        find(g, "(x)-[]->(y); !(x)-[]->(q)")
    with pytest.raises(ValueError, match="empty"):
        find(g, " ; ")


# ---------------------------------------------------------------------------
# Property: find() == brute-force enumeration on random graphs/patterns
# ---------------------------------------------------------------------------

def _brute_force(edge_rows, pattern):
    """Reference enumerator: try every assignment of pattern variables to
    graph nodes, keeping those where all positive terms have a matching
    edge (with multiplicity = product of edge multiplicities) and no
    negated term does."""
    import itertools
    import re as _re

    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        m = _re.match(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$", raw)
        neg, s, _e, d = m.groups()
        terms.append((bool(neg), s, d))
    nodes = sorted({x for e in edge_rows for x in e})
    variables = sorted({v for _n, s, d in terms for v in (s, d) if v})
    from collections import Counter

    mult = Counter(edge_rows)
    out = Counter()
    for combo in itertools.product(nodes, repeat=len(variables)):
        bind = dict(zip(variables, combo))
        ok, weight = True, 1
        for neg, s, d in terms:
            if not (s and d):
                # anonymous endpoints: positive term needs ANY matching
                # edge; only used in the fixed patterns below with both
                # ends named, so skip
                continue
            cnt = mult.get((bind[s], bind[d]), 0)
            if neg:
                if cnt:
                    ok = False
                    break
            else:
                if not cnt:
                    ok = False
                    break
                weight *= cnt
        if ok:
            out[tuple(bind[v] for v in variables)] += weight
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("pattern,vars_", [
    ("(a)-[]->(b); (b)-[]->(c)", ["a", "b", "c"]),
    ("(a)-[]->(b); (b)-[]->(a)", ["a", "b"]),
    ("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)", ["a", "b", "c"]),
    ("(a)-[]->(b); (a)-[]->(c); !(b)-[]->(c)", ["a", "b", "c"]),
])
def test_motif_matches_brute_force(spark, seed, pattern, vars_):
    import random
    from collections import Counter

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(6)]
    rows = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(12)
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = Counter(
        tuple(r[v] for v in vars_)
        for r in find(e, pattern).collect()
    )
    want = _brute_force(rows, pattern)
    assert got == want
