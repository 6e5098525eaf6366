"""Regenerate the vendored AddictO/BCIO OWL snapshot from the
reference termlist fixture (reference static/test_terms.tsv, the
3,818-line TSV its runtime tagger loads, app.py:57-60).

The reference ships no .owl file, so the snapshot is RECONSTRUCTED:
each termlist row carries (surface, id, name, ont); grouping by id and
inverting the pluralizer closure in file order recovers each concept's
label + synonym set (the plural rows are exactly the forms
``dictionary.build_dictionary`` re-derives).  Reconstruction is exact
for every surface in the TSV; a handful of cross-concept collision
surfaces (the reference's in-memory dict iteration order is lost) are
reproduced through the engine's real multi-ontology mechanism: the
snapshot is split into TWO files and concepts that must win their
collisions go in the second file — later files win (A5,
plans/kg_pipeline.py:load_ontology_rows).

Run:  python tests/fixtures/gen_addicto_owl.py
Writes addicto_snapshot_0.owl / addicto_snapshot_1.owl next to itself
and verifies the rebuilt dictionary reproduces the TSV surface→id map
exactly before writing anything.
"""

import os
import sys
from collections import OrderedDict
from xml.sax.saxutils import escape

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from onto_text_tag_spark.dictionary import build_dictionary_rows  # noqa: E402
from onto_text_tag_spark.functions.pluralize import plural  # noqa: E402
from onto_text_tag_spark.sources.ontology import PREFIXES  # noqa: E402
from onto_text_tag_spark.sources.termlist_tsv import (  # noqa: E402
    read_termlist_rows,
)

REFERENCE_TSV = "/root/reference/static/test_terms.tsv"
OUT_DIR = os.path.dirname(os.path.abspath(__file__))

_PREFIX_TO_NS = {v: k for k, v in PREFIXES.items()}


def iri_for(concept_id: str) -> str:
    """Inverse of sources.ontology.termlist_id_for_iri: CURIEs expand
    through the prefix registry; raw-IRI ids (the reference termlist
    keeps unregistered ontologies' IRIs verbatim, e.g. OAE) pass
    through unchanged."""
    from onto_text_tag_spark.sources.ontology import termlist_id_for_iri

    if concept_id.startswith("http://") or concept_id.startswith("https://"):
        iri = concept_id
    else:
        prefix, local = concept_id.split(":", 1)
        ns = _PREFIX_TO_NS.get(
            prefix, f"http://purl.obolibrary.org/obo/{prefix}_")
        iri = ns + local
    assert termlist_id_for_iri(iri) == concept_id, (iri, concept_id)
    return iri


def reconstruct_concepts(rows: list[dict]) -> "OrderedDict[str, dict]":
    """TSV rows → {curie: {label, synonyms}} by inverting the plural
    closure in file order: a row whose surface is already explained by
    (label | plural(label) | accepted synonym | its plural) is a
    derived form; anything else is a base synonym."""
    by_id: "OrderedDict[str, list]" = OrderedDict()
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    concepts = OrderedDict()
    for cid, rs in by_id.items():
        label = rs[0]["name"]
        expected = set()
        if label:
            expected.add(label.strip().lower())
            expected.add(plural(label).strip().lower())
        syns = []
        for r in rs:
            s = r["surface"]
            if s in expected:
                continue
            syns.append(s)
            expected.add(s)
            expected.add(plural(s).strip().lower())
        concepts[cid] = {"label": label, "synonyms": syns}
    return concepts


def rebuild_map(concepts, layers) -> dict[str, str]:
    onto_rows = []
    for order, layer in enumerate(layers):
        for cid in layer:
            onto_rows.append({
                "curie": cid,
                "label": concepts[cid]["label"],
                "synonyms": concepts[cid]["synonyms"],
                "definition": "",
                "parent_curie": None,
                "ont_order": order,
            })
    return {r["surface"]: r["id"] for r in build_dictionary_rows(onto_rows)}


def write_owl(path: str, concepts, cids) -> None:
    lines = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
        '         xmlns:obo="http://purl.obolibrary.org/obo/">',
    ]
    for cid in cids:
        c = concepts[cid]
        lines.append(f'  <owl:Class rdf:about="{escape(iri_for(cid))}">')
        if c["label"]:
            lines.append(
                f'    <rdfs:label>{escape(c["label"])}</rdfs:label>')
        for syn in c["synonyms"]:
            lines.append(
                f'    <obo:IAO_0000118>{escape(syn)}</obo:IAO_0000118>')
        lines.append('  </owl:Class>')
    lines.append('</rdf:RDF>')
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def claim_map(concepts) -> dict[str, set]:
    """surface → set of concepts whose label/synonym closure claims it
    (the same surface algebra as build_dictionary_rows)."""
    from collections import defaultdict

    from onto_text_tag_spark.dictionary import STOPWORDS

    claims: dict[str, set] = defaultdict(set)
    for cid, c in concepts.items():
        for b in [c["label"]] + c["synonyms"]:
            if not b or b.strip().lower() in STOPWORDS:
                continue
            for raw in (b, plural(b)):
                s = raw.strip().lower()
                if s and s not in STOPWORDS:
                    claims[s].add(cid)
    return claims


def main() -> None:
    import json

    rows = read_termlist_rows(REFERENCE_TSV)
    tsv_map = {r["surface"]: r["id"] for r in rows}
    concepts = reconstruct_concepts(rows)

    # Collision constraints: for every TSV surface claimed by several
    # concepts, the TSV's winner must out-order the others (A5: later
    # file wins).  Mutual pairs — the reference's TSV assigns the base
    # and plural of ONE synonym to DIFFERENT concepts, which no builder
    # input can reproduce (the plural closure always pairs them) — are
    # recorded as documented deviations instead.
    claims = claim_map(concepts)
    contested = {s: cs for s, cs in claims.items()
                 if len(cs) > 1 and s in tsv_map}
    edges = set()
    for s, cs in contested.items():
        winner = tsv_map[s]
        assert winner in cs, f"reconstruction lost claimant for {s!r}"
        edges.update((winner, loser) for loser in cs - {winner})
    mutual = {frozenset(e) for e in edges if (e[1], e[0]) in edges}
    dag = {e for e in edges if frozenset(e) not in mutual}

    # layer = longest winner-chain depth (losers below their winners)
    depth: dict[str, int] = {}

    def _depth(cid, seen=()):
        if cid in depth:
            return depth[cid]
        assert cid not in seen, f"constraint cycle at {cid}"
        d = max(
            (_depth(loser, (*seen, cid)) + 1
             for w, loser in dag if w == cid),
            default=0,
        )
        depth[cid] = d
        return d

    for cid in concepts:
        _depth(cid)
    n_layers = max(depth.values()) + 1
    layers = [[c for c in concepts if depth[c] == d]
              for d in range(n_layers)]

    rebuilt = rebuild_map(concepts, layers)
    mismatch = {s for s in tsv_map if rebuilt.get(s) != tsv_map[s]}
    mutual_concepts = {c for pair in mutual for c in pair}
    deviations = {}
    for s in sorted(mismatch):
        involved = contested.get(s, set())
        assert involved & mutual_concepts, (
            f"unexplained rebuild mismatch on {s!r}: "
            f"{tsv_map[s]} vs {rebuilt.get(s)}"
        )
        deviations[s] = {"tsv": tsv_map[s], "engine": rebuilt[s]}
    extras = set(rebuilt) - set(tsv_map)

    for d, layer in enumerate(layers):
        write_owl(os.path.join(OUT_DIR, f"addicto_snapshot_{d}.owl"),
                  concepts, layer)
    with open(os.path.join(OUT_DIR, "addicto_snapshot_deviations.json"),
              "w") as fh:
        json.dump(deviations, fh, indent=2, sort_keys=True)
    print(f"concepts={len(concepts)} layers={[len(x) for x in layers]} "
          f"tsv_surfaces={len(tsv_map)} exact={len(tsv_map)-len(mismatch)} "
          f"deviations={len(deviations)} "
          f"double_plural_extras={len(extras)}")


if __name__ == "__main__":
    main()
