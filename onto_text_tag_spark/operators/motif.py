"""Motif (basic-graph-pattern) matching over a KG edge relation.

The north_star frames the canonicalization edge set "GraphFrames"-style;
GraphFrames' flagship query API is ``find("(a)-[e]->(b); (b)-[f]->(c)")``
— declarative subgraph pattern matching.  GraphFrames itself is a JVM
package not present here, so this module re-derives the operator on
plain DataFrames: each positive pattern term becomes one aliased scan of
the edge relation, shared vertex variables become equi-join keys, and
negated terms become left-anti joins.  The triple store this engine
materializes (subj, pred, obj[, weight] — plans/kg_pipeline.py) IS an
edge relation, so motif queries like "documents mentioning a descendant
of X" are one ``find`` call.

Reference tie-in: the reference's only graph query is the is-a
descendant walk + association probe (app.py:116-151, hv_generate.py:
25-60) — both are single-term motifs.  This operator generalizes them
to arbitrary conjunctive patterns, the way a KG consumer actually
queries.

Scale shape: the plan is a chain of equi-joins on vertex ids — exactly
what Catalyst optimizes (join reordering, broadcast selection for
filtered/small terms, AQE skew splitting on hub vertices).  No driver
recursion, no UDFs; every term is JVM-side.  Anti-join terms prune
with the same hash exchanges.  Disjoint pattern components would be a
cartesian product — rejected, same as GraphFrames.

Pattern grammar (GraphFrames-compatible subset):

    term      := ['!'] '(' [name] ')' '-' '[' [name] ']' '->' '(' [name] ')'
    pattern   := term (';' term)*

* vertex names bind across terms; anonymous ``()`` vertices match
  anything and bind nothing;
* a named edge ``[e]`` exposes the full edge row as a struct column
  ``e`` (src/dst plus every attribute column, e.g. pred/weight);
* ``!(a)-[]->(b)`` asserts NO edge a→b exists; negated terms cannot
  name their edge and must reuse at least one bound vertex variable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TERM_RE = re.compile(
    r"^(!?)\s*\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w*)\s*\)$"
)


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        neg, src, edge, dst = m.groups()
        if neg and edge:
            raise ValueError(
                f"negated term cannot name its edge: {raw!r}"
            )
        terms.append((bool(neg), src, edge, dst))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(
    edges: DataFrame,
    pattern: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Match ``pattern`` against the (src, dst, *attrs) edge relation.

    Returns one row per binding: a string column per named vertex
    variable and a struct column per named edge variable (the full edge
    row).  Duplicate edge rows in the input yield duplicate bindings —
    pass a distinct relation for set semantics, exactly as GraphFrames
    does.
    """
    terms = _parse(pattern)
    anon = 0

    def fresh() -> str:
        nonlocal anon
        anon += 1
        return f"__anon{anon}"

    attr_cols = [c for c in edges.columns if c not in (src, dst)]

    def term_df(sv: str, ev: str, dv: str) -> DataFrame:
        cols = [F.col(src).alias(sv), F.col(dst).alias(dv)]
        if ev:
            cols.append(
                F.struct(
                    F.col(src).alias("src"),
                    F.col(dst).alias("dst"),
                    *[F.col(c) for c in attr_cols],
                ).alias(ev)
            )
        return edges.select(*cols)

    out: DataFrame | None = None
    bound: set[str] = set()
    negatives: list[tuple[str, str]] = []
    for neg, sv, ev, dv in terms:
        if neg:
            if not (sv and dv):
                raise ValueError("negated term needs named vertices")
            negatives.append((sv, dv))
            continue
        sv = sv or fresh()
        dv = dv or fresh()
        if sv == dv:
            t = term_df(sv + "__l", ev, dv).where(
                F.col(sv + "__l") == F.col(dv)
            ).drop(sv + "__l")
        else:
            t = term_df(sv, ev, dv)
        if out is None:
            out = t
        else:
            keys = [v for v in (sv, dv) if v in bound]
            if not keys:
                raise ValueError(
                    f"pattern term ({sv})-[{ev}]->({dv}) shares no "
                    "vertex with earlier terms — disjoint components "
                    "would be a cartesian product; reorder or split "
                    "the pattern"
                )
            out = out.join(t, keys)
        bound.update({sv, dv})
    if out is None:
        raise ValueError("pattern has no positive terms")
    for sv, dv in negatives:
        missing = {sv, dv} - bound
        if missing:
            raise ValueError(
                f"negated term references unbound vertices: {missing}"
            )
        neg_edges = edges.select(
            F.col(src).alias(sv), F.col(dst).alias(dv)
        )
        out = out.join(neg_edges, [sv, dv], "left_anti")
    drop = [c for c in out.columns if c.startswith("__anon")]
    return out.drop(*drop)
