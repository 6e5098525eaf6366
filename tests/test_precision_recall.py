"""Triple P/R harness vs an independent reference matcher (BASELINE.md).

BASELINE.json metric: triple P/R ≥ 0.95 vs reference tags.  The
reference's runtime tagger is an exact dictionary matcher with
case-insensitive token-boundary matching and longest-span overlap
resolution (OGER termlist / PhraseMatcher attr='LOWER' + filter_spans).
Here that behavior is RE-implemented independently (regex scan, not
Aho-Corasick) and the engine's emitted mention triples are scored
against it on the synthetic corpus.  Differential: two implementations,
one spec."""

import re

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.corpus import documents_df, ontology_df
from onto_text_tag_spark.dictionary import build_dictionary, resolve_collisions


def _reference_tags(docs_rows, dict_rows):
    """Independent matcher: regex candidates + greedy longest-wins."""
    surf2curie = {r["surface"]: r["id"] for r in dict_rows}
    patterns = {
        s: re.compile(r"(?<![0-9A-Za-z_])" + re.escape(s) + r"(?![0-9A-Za-z_])",
                      re.IGNORECASE)
        for s in surf2curie
    }
    expected = set()
    for row in docs_rows:
        text = row["text"]
        candidates = []
        for s, pat in patterns.items():
            for m in pat.finditer(text):
                candidates.append((m.start(), m.end(), surf2curie[s]))
        candidates.sort(key=lambda c: (-(c[1] - c[0]), c[0]))
        taken = []
        for b, e, curie in candidates:
            if all(e <= tb or b >= te for tb, te in taken):
                taken.append((b, e))
                expected.add((row["url"], b, e, curie))
    return expected


@pytest.fixture(scope="module")
def scored(spark):
    from onto_text_tag_spark.operators.tagger import tag_documents

    docs = documents_df(spark, n_docs=150)
    dictionary = resolve_collisions(build_dictionary(ontology_df(spark)))
    mentions = tag_documents(docs, dictionary)
    got = {
        (r["url"], r["begin"], r["end"], r["curie"])
        for r in mentions.collect()
    }
    want = _reference_tags(
        docs.select("url", "text").collect(),
        dictionary.select("surface", "id").collect(),
    )
    return got, want


def test_precision_at_least_095(scored):
    got, want = scored
    assert got, "engine emitted no mentions"
    precision = len(got & want) / len(got)
    assert precision >= 0.95, f"precision {precision:.4f}"


def test_recall_at_least_095(scored):
    got, want = scored
    assert want, "reference produced no tags"
    recall = len(got & want) / len(want)
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_exact_agreement(scored):
    """Stronger than the 0.95 bar: the two matchers agree exactly on the
    synthetic corpus (any diff is a semantics drift to investigate)."""
    got, want = scored
    assert got == want
