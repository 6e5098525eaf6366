"""Full real-ontology e2e: the vendored AddictO/BCIO OWL snapshot
(tests/fixtures/addicto_snapshot_*.owl, reconstructed from the
reference's 3,818-line termlist — see gen_addicto_owl.py) must drive
the OWL-parse → dictionary-build → tag pipeline to the SAME mentions
the TSV-loaded dictionary produces on the same corpus.

This pins S1 (OWL parse, sources/ontology.py:parse_owl_xml), the
surface algebra (P2-P5: lower/trim, stopwords, pluralizer, exclusions),
A5 collision resolution across ontology load order, and the tagging
path — against the reference's real runtime dictionary
(static/test_terms.tsv, app.py:57-60).

The only tolerated differences are the 3 surfaces in
addicto_snapshot_deviations.json: there the reference TSV assigns the
base and plural of a single synonym to DIFFERENT concepts — an
assignment no builder input can reproduce (the plural closure always
pairs them) because it encodes the reference's lost in-memory dict
iteration order.  The test asserts the deviation set is EXACTLY that
file, nothing more."""

import glob
import json
import os

import pytest

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures")
REFERENCE_TSV = "/root/reference/static/test_terms.tsv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_TSV), reason="reference absent"
)


def _owl_paths():
    return sorted(glob.glob(os.path.join(FIXDIR, "addicto_snapshot_*.owl")))


def _owl_dict_rows():
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_pipeline import load_ontology_rows

    return build_dictionary_rows(load_ontology_rows(_owl_paths()))


def _tsv_dict_rows():
    from onto_text_tag_spark.sources.termlist_tsv import read_termlist_rows

    return read_termlist_rows(REFERENCE_TSV)


def _deviations():
    with open(os.path.join(FIXDIR,
                           "addicto_snapshot_deviations.json")) as fh:
        return json.load(fh)


def test_owl_dictionary_matches_tsv_dictionary():
    """Surface→concept maps agree on every TSV surface except the
    documented deviations; extra OWL-derived surfaces are only junk
    double-plural forms (plural applied to an already-plural synonym),
    never real words that could tag text differently."""
    from onto_text_tag_spark.functions.pluralize import plural

    owl_map = {r["surface"]: (r["id"], r["name"]) for r in _owl_dict_rows()}
    tsv_map = {r["surface"]: (r["id"], r["name"]) for r in _tsv_dict_rows()}
    deviations = _deviations()

    missing = set(tsv_map) - set(owl_map)
    assert not missing, f"OWL dictionary lost surfaces: {sorted(missing)}"

    diffs = {s for s in tsv_map if owl_map[s][0] != tsv_map[s][0]}
    assert diffs == set(deviations), (
        f"unexpected collision outcomes: {sorted(diffs ^ set(deviations))}"
    )
    for s in deviations:
        assert owl_map[s][0] == deviations[s]["engine"]
        assert tsv_map[s][0] == deviations[s]["tsv"]
    # agreeing surfaces also carry the same preferred label
    assert all(owl_map[s][1] == tsv_map[s][1]
               for s in tsv_map if s not in diffs)

    # Extras: surfaces the rebuild adds that the reference's TSV lacks.
    # Every one is our pluralizer applied to a TSV surface that already
    # looks plural ("studies" → "studiess") — the reference's inflect
    # emitted something else there.  They are junk no real text
    # contains; the tagging-equality test below is the behavioral gate.
    extras = set(owl_map) - set(tsv_map)
    tsv_surfaces = set(tsv_map)
    plural_images = {plural(b).strip().lower() for b in tsv_surfaces}
    assert extras <= plural_images, (
        f"extra surfaces not explained by the plural closure: "
        f"{sorted(extras - plural_images)[:5]}"
    )
    assert len(extras) < 40, f"too many extras: {len(extras)}"


def test_owl_and_tsv_dictionaries_tag_identically(spark):
    """End-to-end: tag the same corpus with the OWL-built and the
    TSV-built dictionary — identical mention rows (url, span, surface,
    curie), including the multiword/longest-match and collision cases,
    after removing the 3 documented deviation surfaces from both."""
    from onto_text_tag_spark.operators.tagger import tag_documents

    owl_rows = _owl_dict_rows()
    tsv_rows = _tsv_dict_rows()
    deviations = set(_deviations())

    # corpus: real TSV surfaces embedded in sentences, including
    # contested collision surfaces and plural/multiword forms
    tsv_surfaces = sorted({r["surface"] for r in tsv_rows})
    docs = []
    for i in range(0, len(tsv_surfaces), 40):
        chunk = tsv_surfaces[i:i + 40:8]
        docs.append((f"u{i}",
                     "A study of " + ", then ".join(chunk) + " cohorts."))
    docs.append(("contested",
                 "Young adults discussing public policy and moist snuff "
                 "with nicotine dependence and alcohol use disorder."))
    corpus = spark.createDataFrame(docs, "url string, text string")

    def mentions(rows):
        got = tag_documents(corpus, rows).collect()
        return {
            (r["url"], r["begin"], r["end"], r["span_text"], r["curie"])
            for r in got
            if r["span_text"].lower() not in deviations
        }

    m_owl = mentions(owl_rows)
    m_tsv = mentions(tsv_rows)
    assert m_owl, "corpus produced no mentions — fixture broken"
    assert m_owl == m_tsv
    # the corpus genuinely exercised multiword + plural surfaces
    assert any(" " in m[3] for m in m_owl)
    assert len({m[4] for m in m_owl}) > 200


def test_owl_snapshot_regenerator_is_current():
    """The committed snapshot equals a fresh regeneration from the
    reference TSV (catches silent drift in the surface algebra)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, os.path.join(FIXDIR, "gen_addicto_owl.py")],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(FIXDIR),
    )
    assert out.returncode == 0, out.stderr
    assert "deviations=3 " in out.stdout, out.stdout
    assert subprocess.run(
        ["git", "diff", "--quiet", "--", FIXDIR],
        cwd=os.path.dirname(FIXDIR),
    ).returncode == 0, "regenerated snapshot differs from committed one"
