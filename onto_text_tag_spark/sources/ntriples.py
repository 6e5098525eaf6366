"""N-Triples export / import for the materialized triple stage.

The reference serves its graph as app-internal JSON for the holoviews
chord page (hv_generate.py) and never emits a standard RDF interchange
form; a KG-construction pipeline feeding downstream consumers needs
one.  This sink serializes the engine's (subj, pred, obj[, weight])
triple relation as W3C N-Triples 1.1 — the line-oriented RDF syntax
that is the natural distributed-text format (one independent statement
per line: splittable, no document envelope, cat-able across shards) —
and the source parses it back losslessly.

Mapping (both directions, bijective over the engine's value space):

* CURIE ``PREFIX:LOCAL`` → ``<http://purl.obolibrary.org/obo/PREFIX_LOCAL>``
  (the OBO purl convention the ontology source already speaks,
  sources/ontology.py); the prefix base is configurable.
* document urls: absolute IRIs (``scheme://...``) pass through; any
  other subject is wrapped as ``urn:graft:doc:<id>``.  The handful of
  characters N-Triples forbids inside IRIs are percent-encoded.
* predicates → ``<VOCAB_BASE><pred>``.
* ``weight`` (nullable long) → an RDF-star annotation line
  ``<< s p o >> <VOCAB_BASE>weight "N"^^xsd:long .`` following the
  quoted-triple N-Triples-star syntax, so the base graph stays plain
  N-Triples 1.1 and weight-agnostic consumers can simply drop ``<<``
  lines.

Everything is Spark builtins (concat / regexp_replace / regexp_extract
— whole-stage codegen, no Python in the row path); the writer is
``df.write.text`` — one shard per partition, executor-side, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OBO_BASE = "http://purl.obolibrary.org/obo/"
VOCAB_BASE = "http://example.org/onto-text-tag/vocab#"

# Characters N-Triples forbids un-escaped inside an IRIREF (<...>):
# the delimiters themselves plus space/quote/braces/pipe/caret/backtick
# and backslash.  Percent-encode them (RFC 3987 escape).  "%" itself is
# escaped FIRST and unescaped LAST so the mapping is bijective even for
# ids that already contain percent sequences.
_IRI_BAD = {
    "%": "%25", " ": "%20", "<": "%3C", ">": "%3E", '"': "%22",
    "{": "%7B", "}": "%7D", "|": "%7C", "^": "%5E", "`": "%60",
    "\\": "%5C",
}


def _iri_escape(col):
    out = col
    for ch, rep in _IRI_BAD.items():
        out = F.replace(out, F.lit(ch), F.lit(rep))
    return out


def _resource_iri(col, obo_base: str):
    """CURIE → purl; absolute IRI → itself; anything else → urn:graft:doc:."""
    is_curie = col.rlike("^[A-Za-z][A-Za-z0-9_.]*:[A-Za-z0-9_.-]+$")
    is_iri = col.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    curie_iri = F.concat(
        F.lit(obo_base), F.replace(col, F.lit(":"), F.lit("_"))
    )
    other = F.concat(F.lit("urn:graft:doc:"), col)
    return _iri_escape(
        F.when(is_iri, col).when(is_curie, curie_iri).otherwise(other)
    )


def triples_to_ntriples(
    triples: DataFrame,
    obo_base: str = OBO_BASE,
    vocab_base: str = VOCAB_BASE,
) -> DataFrame:
    """(subj, pred, obj[, weight]) → one-column ``value`` DataFrame of
    N-Triples lines (plus one RDF-star weight annotation line per
    non-null weight).  Pure column expressions; the line count is
    ``rows + rows_with_weight``."""
    s = F.concat(F.lit("<"), _resource_iri(F.col("subj"), obo_base), F.lit(">"))
    p = F.concat(F.lit("<"), F.lit(vocab_base), _iri_escape(F.col("pred")), F.lit(">"))
    o = F.concat(F.lit("<"), _resource_iri(F.col("obj"), obo_base), F.lit(">"))
    spo = F.concat(s, F.lit(" "), p, F.lit(" "), o)
    base_line = F.concat(spo, F.lit(" ."))
    cols = [base_line.alias("value")]
    out = triples.select(*cols)
    if "weight" in triples.columns:
        weight_line = F.concat(
            F.lit("<< "), spo, F.lit(" >> <"), F.lit(vocab_base),
            F.lit("weight> \""), F.col("weight").cast("string"),
            F.lit("\"^^<http://www.w3.org/2001/XMLSchema#long> ."),
        )
        lines = F.array_compact(
            F.array(
                base_line,
                F.when(F.col("weight").isNotNull(), weight_line),
            )
        )
        out = triples.select(F.explode(lines).alias("value"))
    return out


def write_ntriples(
    triples: DataFrame,
    path: str,
    obo_base: str = OBO_BASE,
    vocab_base: str = VOCAB_BASE,
    sort: bool = True,
) -> None:
    """Distributed N-Triples export: one ``part-*.txt`` shard per
    partition.  ``sort`` orders lines within each partition so repeated
    exports of the same partitioning are byte-stable."""
    lines = triples_to_ntriples(triples, obo_base, vocab_base)
    if sort:
        lines = lines.sortWithinPartitions("value")
    lines.write.mode("overwrite").text(path)


_TRIPLE_RE = r"^<([^>]*)> <([^>]*)> <([^>]*)> \.$"
_WEIGHT_RE = (
    r'^<< <([^>]*)> <([^>]*)> <([^>]*)> >> <[^>]*weight> "(-?[0-9]+)"'
    r"\^\^<http://www\.w3\.org/2001/XMLSchema#long> \.$"
)


def _iri_unescape(col):
    out = col
    for ch, rep in reversed(list(_IRI_BAD.items())):
        out = F.replace(out, F.lit(rep), F.lit(ch))
    return out


def _resource_from_iri(col, obo_base: str):
    col = _iri_unescape(col)
    from_purl = F.replace(
        F.substring(col, len(obo_base) + 1, 2_000_000),
        F.lit("_"), F.lit(":"),
    )
    from_urn = F.substring(col, len("urn:graft:doc:") + 1, 2_000_000)
    return (
        F.when(col.startswith("urn:graft:doc:"), from_urn)
        .when(col.startswith(obo_base), from_purl)
        .otherwise(col)
    )


def read_ntriples(
    spark,
    path: str,
    obo_base: str = OBO_BASE,
    vocab_base: str = VOCAB_BASE,
) -> DataFrame:
    """Parse an N-Triples export back to (subj, pred, obj, weight).

    Inverse of ``write_ntriples`` over the engine's value space: purl
    IRIs fold back to CURIEs, ``urn:graft:doc:`` wrappers unwrap, other
    IRIs (document urls) pass through; RDF-star weight annotations
    rejoin their base triple (left join on the triple key — weightless
    triples keep a null).  Splittable text scan; two regex projections
    and one key-partitioned join, no Python row path."""
    raw = spark.read.text(path)
    base = raw.where(F.col("value").rlike(_TRIPLE_RE)).select(
        _resource_from_iri(
            F.regexp_extract("value", _TRIPLE_RE, 1), obo_base
        ).alias("subj"),
        _iri_unescape(
            F.replace(
                F.regexp_extract("value", _TRIPLE_RE, 2),
                F.lit(vocab_base), F.lit(""),
            )
        ).alias("pred"),
        _resource_from_iri(
            F.regexp_extract("value", _TRIPLE_RE, 3), obo_base
        ).alias("obj"),
    )
    weights = raw.where(F.col("value").rlike(_WEIGHT_RE)).select(
        _resource_from_iri(
            F.regexp_extract("value", _WEIGHT_RE, 1), obo_base
        ).alias("subj"),
        _iri_unescape(
            F.replace(
                F.regexp_extract("value", _WEIGHT_RE, 2),
                F.lit(vocab_base), F.lit(""),
            )
        ).alias("pred"),
        _resource_from_iri(
            F.regexp_extract("value", _WEIGHT_RE, 3), obo_base
        ).alias("obj"),
        F.regexp_extract("value", _WEIGHT_RE, 4).cast("long").alias("weight"),
    )
    return base.join(weights, ["subj", "pred", "obj"], "left")
