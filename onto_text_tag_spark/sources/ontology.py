"""Ontology sources: OWL/XML and OBO parsers → ontology DataFrame rows.

Reference behavior (S1, SURVEY.md §2.1): fetch two .owl files and expose
per-class label (rdfs:label), synonyms (IAO_0000118), definition
(IAO_0000115), and SubClassOf parents via pyhornedowl (app.py:75-81,
ontotagtext.py:77-107).  pyhornedowl is not available here; ontologies
are small driver-side data, so this is a stdlib ``xml.etree`` parser of
OWL/XML (the format those files use) plus a minimal OBO flat-file
parser — both produce the same row shape consumed by
dictionary.build_dictionary.

CURIE prefix registry mirrors ontotagtext.py:14-38 (24 mappings).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# Reference prefix table (ontotagtext.py:14-38): IRI namespace → CURIE prefix.
PREFIXES: dict[str, str] = {
    "http://purl.obolibrary.org/obo/ADDICTO_": "ADDICTO",
    "http://purl.obolibrary.org/obo/BFO_": "BFO",
    "http://purl.obolibrary.org/obo/CHEBI_": "CHEBI",
    "http://purl.obolibrary.org/obo/CHMO_": "CHMO",
    "http://purl.obolibrary.org/obo/CL_": "CL",
    "http://purl.obolibrary.org/obo/CLO_": "CLO",
    "http://purl.obolibrary.org/obo/COB_": "COB",
    "http://purl.obolibrary.org/obo/DOID_": "DOID",
    "http://purl.obolibrary.org/obo/DRON_": "DRON",
    "http://purl.obolibrary.org/obo/ENVO_": "ENVO",
    "http://purl.obolibrary.org/obo/GO_": "GO",
    "http://purl.obolibrary.org/obo/IAO_": "IAO",
    "http://purl.obolibrary.org/obo/MF_": "MF",
    "http://purl.obolibrary.org/obo/MFOEM_": "MFOEM",
    "http://purl.obolibrary.org/obo/NCBITaxon_": "NCBITaxon",
    "http://purl.obolibrary.org/obo/NCIT_": "NCIT",
    "http://purl.obolibrary.org/obo/OBI_": "OBI",
    "http://purl.obolibrary.org/obo/OGMS_": "OGMS",
    "http://purl.obolibrary.org/obo/PATO_": "PATO",
    "http://purl.obolibrary.org/obo/PO_": "PO",
    "http://purl.obolibrary.org/obo/RO_": "RO",
    "http://purl.obolibrary.org/obo/UBERON_": "UBERON",
    "http://purl.obolibrary.org/obo/UO_": "UO",
    "http://humanbehaviourchange.org/ontology/BCIO_": "BCIO",
    # remaining entries of the reference table (ontotagtext.py:14-38):
    # multi-underscore prefixes like APOLLO_SV break the generic
    # underscore rule, so they MUST be registered to round-trip
    "http://addictovocab.org/ADDICTO_": "ADDICTO",
    "http://purl.obolibrary.org/obo/SEPIO_": "SEPIO",
    "http://purl.obolibrary.org/obo/OMRSE_": "OMRSE",
    "http://purl.obolibrary.org/obo/OBCS_": "OBCS",
    "http://purl.obolibrary.org/obo/ERO_": "ERO",
    "http://purl.obolibrary.org/obo/APOLLO_SV_": "APOLLO_SV",
    "http://purl.obolibrary.org/obo/PDRO_": "PDRO",
    "http://purl.obolibrary.org/obo/GAZ_": "GAZ",
    "http://purl.obolibrary.org/obo/GSSO_": "GSSO",
}

_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
_OWL = "{http://www.w3.org/2002/07/owl#}"
_OBO = "{http://purl.obolibrary.org/obo/}"

SYNONYM_IRI_LOCAL = "IAO_0000118"   # alternative term (ontotagtext.py:12)
DEFINITION_IRI_LOCAL = "IAO_0000115"  # definition (ontotagtext.py:13)


def curie_from_iri(iri: str) -> str | None:
    """P6 CURIE normalization: registered-prefix mapping first, else the
    reference's generic rule ``rsplit('/',1)[1].replace('_',':')``
    (load_ontotermentions.py:75-80)."""
    for ns, prefix in PREFIXES.items():
        if iri.startswith(ns):
            return f"{prefix}:{iri[len(ns):]}"
    if "/" in iri:
        local = iri.rsplit("/", 1)[1]
        if "_" in local:
            return local.replace("_", ":", 1)
    return None


def termlist_id_for_iri(iri: str) -> str:
    """The TERMLIST-BUILDER id semantics (reference app.py:649 via
    pyhornedowl ``get_id_for_iri``): a registered prefix shortens to a
    CURIE; an unregistered IRI stays the RAW IRI — the reference's real
    termlist contains both (``APOLLO_SV:00000298`` and full
    ``http://.../OAE_0001000`` ids), so the OWL parse must too, or an
    OWL-built dictionary can never equal a termlist-built one."""
    for ns, prefix in PREFIXES.items():
        if iri.startswith(ns):
            return f"{prefix}:{iri[len(ns):]}"
    return iri


def parse_owl_xml(text: str) -> list[dict]:
    """OWL/XML (RDF/XML serialization) → ontology rows.  Class ids use
    ``termlist_id_for_iri`` (the reference builder's semantics);
    ``curie_from_iri``'s generic underscore rule remains the P6 scalar
    surface for id-normalization queries."""
    root = ET.fromstring(text)
    rows = []
    for cls in root.iter(f"{_OWL}Class"):
        iri = cls.get(f"{_RDF}about")
        if not iri:
            continue
        curie = termlist_id_for_iri(iri)
        label = None
        synonyms: list[str] = []
        definition = None
        parent = None
        i18n: list[dict] = []
        for child in cls:
            tag = child.tag
            lang = child.get(_XML_LANG)
            if tag == f"{_RDFS}label" and child.text:
                if lang and lang != "en":
                    i18n.append({"lang": lang, "kind": "label",
                                 "text": child.text.strip()})
                else:
                    label = child.text.strip()
            elif tag == f"{_OBO}{SYNONYM_IRI_LOCAL}" and child.text:
                if lang and lang != "en":
                    i18n.append({"lang": lang, "kind": "synonym",
                                 "text": child.text.strip()})
                else:
                    synonyms.append(child.text.strip())
            elif tag == f"{_OBO}{DEFINITION_IRI_LOCAL}" and child.text:
                definition = child.text.strip()
            elif tag == f"{_RDFS}subClassOf":
                p_iri = child.get(f"{_RDF}resource")
                if p_iri:
                    parent = termlist_id_for_iri(p_iri)
        row = {
            "iri": iri,
            "curie": curie,
            "label": label,
            "synonyms": synonyms,
            "definition": definition,
            "parent_curie": parent,
        }
        if i18n:
            row["i18n"] = i18n
        rows.append(row)
    return rows


def dictionaries_by_lang(
    ontology_rows: list[dict], default_lang: str = "en"
) -> dict[str, list[dict]]:
    """Ontology rows (with optional ``i18n`` language-tagged label sets
    from ``parse_owl_xml``) → per-language dictionary rows for
    ``operators.tagger.tag_documents_by_lang``.

    OLS-style multilingual ontologies carry ``xml:lang``-tagged
    ``rdfs:label``/synonym literals; each language's dictionary is built
    by the SAME surface algebra as the default dictionary
    (``build_dictionary_rows``: stopword gate, pluralizer, A5 collision
    policy) over that language's label set.  Classes with no labels in a
    language are absent from its dictionary — an untranslated class must
    not silently match its English surface in German text.

    Honest limitation: the pluralizer is English; for other languages it
    adds English-suffixed plural surfaces (harmless extras, never
    removals).  A per-language pluralizer would slot into
    ``build_dictionary_rows`` behind the same interface.
    """
    from onto_text_tag_spark.dictionary import build_dictionary_rows

    langs = {default_lang}
    for r in ontology_rows:
        langs.update(e["lang"] for e in r.get("i18n", []))
    out: dict[str, list[dict]] = {}
    for lang in sorted(langs):
        lang_rows = []
        for r in ontology_rows:
            if lang == default_lang:
                lang_rows.append(r)
                continue
            ents = [e for e in r.get("i18n", []) if e["lang"] == lang]
            if not ents:
                continue
            labels = [e["text"] for e in ents if e["kind"] == "label"]
            syns = [e["text"] for e in ents if e["kind"] == "synonym"]
            lang_rows.append(
                {
                    **r,
                    "label": labels[0] if labels else None,
                    "synonyms": syns + labels[1:],
                }
            )
        out[lang] = build_dictionary_rows(lang_rows)
    return out


_OBO_STANZA = re.compile(r"^\[Term\]\s*$", re.M)


def parse_obo(text: str) -> list[dict]:
    """Minimal OBO 1.2 flat-file parser (id/name/synonym/def/is_a)."""
    rows = []
    for stanza in _OBO_STANZA.split(text)[1:]:
        fields: dict[str, list[str]] = {}
        for line in stanza.splitlines():
            line = line.strip()
            if line.startswith("["):  # next stanza header
                break
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            fields.setdefault(key.strip(), []).append(value.strip())
        if "id" not in fields:
            continue
        curie = fields["id"][0]
        syns = []
        for s in fields.get("synonym", []):
            m = re.match(r'"(.*?)"', s)
            if m:
                syns.append(m.group(1))
        definition = None
        if fields.get("def"):
            m = re.match(r'"(.*?)"', fields["def"][0])
            definition = m.group(1) if m else None
        parent = None
        if fields.get("is_a"):
            parent = fields["is_a"][0].split("!")[0].strip()
        prefix = curie.split(":", 1)[0] if ":" in curie else ""
        ns = next(
            (n for n, p in PREFIXES.items() if p == prefix),
            "http://purl.obolibrary.org/obo/",
        )
        rows.append(
            {
                "iri": ns + curie.replace(":", "_")
                if ns.endswith("/")
                else ns + curie.split(":", 1)[1],
                "curie": curie,
                "label": fields.get("name", [None])[0],
                "synonyms": syns,
                "definition": definition,
                "parent_curie": parent,
            }
        )
    return rows


def ontology_df_from_rows(spark, rows: list[dict], ont_order: int = 0):
    from pyspark.sql import functions as F

    from onto_text_tag_spark.schemas import ONTOLOGY

    from onto_text_tag_spark.session import local_df

    return local_df(spark, rows, ONTOLOGY).withColumn(
        "ont_order", F.lit(ont_order)
    )
