"""Dictionary build tests (U1, P2-P5, A5, F3) — SURVEY.md §5 case list."""

import os

import pytest
from pyspark.sql import functions as F

from onto_text_tag_spark.corpus import ontology_df
from onto_text_tag_spark.dictionary import (
    build_dictionary,
    dictionary_tsv_rows,
    resolve_collisions,
)


def _dict(spark):
    return build_dictionary(ontology_df(spark))


def test_label_and_plural_rows(spark):
    d = _dict(spark)
    nic = {r["surface"] for r in d.where(F.col("id") == "CHEBI:0011").collect()}
    assert "nicotine" in nic and "nicotines" in nic
    # synonym + synonym plural
    assert "3-(1-methylpyrrolidin-2-yl)pyridine" in nic


def test_irregular_plural(spark):
    d = _dict(spark)
    forms = {r["surface"] for r in d.where(F.col("id") == "ADDICTO:0010").collect()}
    assert "diagnostic criterion" in forms
    assert "diagnostic criteria" in forms  # inflect-style irregular head noun


def test_stopword_label_dropped(spark):
    d = _dict(spark)
    assert d.where(F.col("id") == "ADDICTO:0009").count() == 0


def test_hard_exclusion(spark):
    # reference app.py:623-624: BCIO:010055 never enters the dictionary
    d = _dict(spark)
    assert d.where(F.col("id") == "BCIO:010055").count() == 0


def test_namespace_extraction(spark):
    d = _dict(spark)
    onts = {r["ont"] for r in d.select("ont").distinct().collect()}
    assert onts == {"CHEBI", "ADDICTO", "BCIO", "ENVO"}


def test_collision_last_ontology_wins(spark):
    # "craving" defined by ADDICTO:0007 (ont_order 0) and BCIO:0006 — with
    # explicit ont_order, the later-loaded ontology wins (A5 pin).
    onto = ontology_df(spark).withColumn(
        "ont_order",
        F.when(F.col("curie").startswith("BCIO"), F.lit(1)).otherwise(F.lit(0)),
    )
    resolved = resolve_collisions(build_dictionary(onto))
    rows = resolved.where(F.col("surface") == "craving").collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "BCIO:0006"


def test_resolved_surface_unique(spark):
    resolved = resolve_collisions(_dict(spark))
    total = resolved.count()
    distinct = resolved.select("surface").distinct().count()
    assert total == distinct


def test_tsv_projection_shape(spark):
    tsv = dictionary_tsv_rows(_dict(spark))
    assert tsv.columns == ["a", "ont", "id", "alt_name", "name", "definition"]
    row = tsv.where(F.col("id") == "CHEBI:0012").orderBy("alt_name").first()
    assert row["a"] == "" and row["name"] == "caffeine"


REFERENCE_TSV = "/root/reference/static/test_terms.tsv"
_VENDORED_INFLECT = (
    "/usr/lib/google-cloud-sdk/platform/bundledpythonunix/lib/python3.12/"
    "site-packages/setuptools/_vendor"
)


def _reference_plural_pairs():
    """(base, plural) row pairs from the reference's shipped dictionary.

    The build loop (app.py:626-637,663-670) appends each surface form
    immediately followed by its inflect plural, so within every
    consecutive same-CURIE run rows pair up (0,1), (2,3), ...  Bases are
    stripped because the reference pluralizes ``s.strip()`` while writing
    the raw synonym into its own row.
    """
    import csv
    import itertools

    rows = [
        r
        for r in csv.reader(open(REFERENCE_TSV), delimiter="\t")
        if len(r) == 6
    ]
    pairs = []
    for _curie, grp in itertools.groupby(rows, key=lambda r: r[2]):
        g = list(grp)
        for i in range(0, len(g) - 1, 2):
            pairs.append((g[i][3].strip(), g[i + 1][3]))
    return pairs


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TSV), reason="reference absent"
)
def test_pluralizer_matches_reference_tsv_exactly():
    """EVERY (base, plural) pair of the reference's real 3,818-row
    dictionary fixture must reproduce byte-for-byte — 1,909 real
    AddictO/BCIO/ENVO/... labels through the inflect re-derivation
    (prep compounds, dual compounds, denominators, classical names,
    verb readings, case restore)."""
    from onto_text_tag_spark.functions.pluralize import plural

    pairs = _reference_plural_pairs()
    assert len(pairs) > 1800
    mismatches = [
        (a, expected, plural(a)) for a, expected in pairs
        if plural(a) != expected
    ]
    assert mismatches == [], mismatches[:20]


@pytest.mark.skipif(
    not os.path.isdir(_VENDORED_INFLECT), reason="no vendored inflect"
)
def test_pluralizer_fuzz_vs_real_inflect():
    """Differential fuzz of the pure port against the actual inflect
    7.3.1 (vendored inside this sandbox's gcloud SDK) on composed
    label-like phrases — catches port drift beyond the fixture."""
    import random
    import subprocess
    import sys
    import json

    from onto_text_tag_spark.functions.pluralize import plural

    rng = random.Random(17)
    nouns = ["study", "facility", "mode", "process", "tobacco", "man",
             "woman", "analysis", "fish", "index", "leaf", "quid",
             "delivery", "Society", "snus", "FEV1", "drug", "drugs",
             "benzenes", "photo", "hero", "branch", "box", "quiz",
             "thief", "corpus", "octopus", "cow", "hoof", "genie",
             "atlas", "brother", "money", "formula",
             "life", "foot", "mouse", "person", "criterion", "datum"]
    glue = ["of", "per", "a", "with", "on", "to", "and", "general",
            "evaluation", "human", "-", "degree"]
    phrases = set()
    while len(phrases) < 400:
        k = rng.randint(1, 5)
        parts = []
        for i in range(k):
            parts.append(rng.choice(nouns if i % 2 == 0 else glue))
        p = " ".join(parts).replace(" - ", "-")
        if rng.random() < 0.3:
            p = p.capitalize()
        phrases.add(p)
    phrases = sorted(phrases)
    script = (
        "import sys, json; sys.path.insert(0, %r); import inflect; "
        "e = inflect.engine()\n"
        "out = []\n"
        "for p in json.load(sys.stdin):\n"
        "    try: out.append(e.plural(p))\n"
        "    except Exception: out.append(None)\n"
        "print(json.dumps(out))" % _VENDORED_INFLECT
    )
    out = subprocess.run(
        [sys.executable, "-c", script], input=json.dumps(phrases),
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    expected = json.loads(out.stdout)
    # None = real inflect RAISED on that phrase; the reference wraps
    # plural() in try/except and just drops the plural row (app.py:
    # 630-637), so any non-crashing output from the port is acceptable
    mismatches = [
        (p, e, plural(p)) for p, e in zip(phrases, expected)
        if e is not None and plural(p) != e
    ]
    assert mismatches == [], mismatches[:20]


def test_pluralizer_resolves_classical_alternatives():
    """Irregular-table entries carry 'modern|classical' alternatives;
    with classical('all') off (inflect's default) the modern form wins —
    the raw alternatives string must never leak into a surface form.
    Expected values verified against real inflect 7.3.1."""
    from onto_text_tag_spark.functions.pluralize import plural

    cases = {
        "thief": "thiefs", "corpus": "corpuses", "octopus": "octopuses",
        "cow": "cows", "hoof": "hoofs", "genie": "genies",
        "atlas": "atlases", "prima donna": "prima donnas",
        "brother": "brothers", "child of a thief": "children of thiefs",
        "data corpus": "data corpuses", "Thief": "Thiefs",
        "money": "monies", "quid": "quid", "formula": "formulas",
    }
    got = {k: plural(k) for k in cases}
    assert got == cases
    assert not any("|" in v for v in got.values())
