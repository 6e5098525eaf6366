"""Scalar column functions from the reference's string surface (§2.6).

All JVM builtins — no UDFs.  Each mirrors a concrete reference behavior
with the citation in the docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def curie_from_iri_col(iri: Column | str) -> Column:
    """P6: IRI → CURIE, generic rule ``rsplit('/',1)[1]`` + first '_'→':'
    (load_ontotermentions.py:75-80)."""
    c = F.col(iri) if isinstance(iri, str) else iri
    local = F.element_at(F.split(c, "/"), -1)
    return F.regexp_replace(local, "_", ":")


def namespace_col(curie: Column | str) -> Column:
    """P7: CURIE prefix before ':' (app.py:617,650-654)."""
    c = F.col(curie) if isinstance(curie, str) else curie
    return F.substring_index(c, ":", 1)


def vocab_link_col(curie: Column | str) -> Column:
    """P8: CURIE → vocabulary URL — BCIO terms link to bciovocab.org,
    everything else to addictovocab.org (app.py:694-698,839-843)."""
    c = F.col(curie) if isinstance(curie, str) else curie
    return F.when(
        c.contains("BCIO"),
        F.concat(F.lit("http://bciovocab.org/"), c),
    ).otherwise(F.concat(F.lit("http://addictovocab.org/"), c))


def lower_trim(col: Column | str) -> Column:
    """P2 normalization (ontotagtext.py:90-91,98-100)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def entry_by_curie(dictionary, curie: str):
    """J3 reverse lookup id→entry: the reference linear-scans
    ``terms.values()`` (ontotagtext.py:147-153); declaratively it is an
    equi-filter the optimizer can push down."""
    return dictionary.where(F.col("id") == curie)


def entry_by_label(dictionary, label: str):
    """J4 reverse lookup label→entry (ontotagtext.py:155-161)."""
    return dictionary.where(F.lower(F.col("name")) == label.lower())


def nodes_from_edges(edges, src: str = "src", dst: str = "dst"):
    """A3 distinct node set of an edge list (hv_generate.py:65-66)."""
    return (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )


def slash_date_col(day: Column | str, month: Column | str,
                   year: Column | str) -> Column:
    """P10 date string assembly: the reference joins day/month/year with
    '/' into "d/m/y" strings — no real date types anywhere
    (app.py:195-196,428)."""
    d = F.col(day) if isinstance(day, str) else day
    m = F.col(month) if isinstance(month, str) else month
    y = F.col(year) if isinstance(year, str) else year
    return F.concat_ws("/", d.cast("string"), m.cast("string"),
                       y.cast("string"))


def author_list_col(last_names: Column | str) -> Column:
    """P10 author string assembly: concatenate author last names with
    ", " (app.py:173-214,419-460 builds the display string the same
    way)."""
    c = F.col(last_names) if isinstance(last_names, str) else last_names
    return F.array_join(c, ", ")
