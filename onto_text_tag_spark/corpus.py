"""Deterministic synthetic fixtures: mini-ontology + web-page corpus.

FIXTURES.md §1-2: seeded (seed=42), pure — no network, no wall clock.
The corpus generator emits ``documents`` rows matching the input_hint
schema where ``text`` is *by construction* the byte-identical output of
the extractor over ``html`` (we generate html, then derive text with the
verified ``strip_tags``). Dictionary surface forms are planted in known
sentences so expected mentions are derivable by hand in tests.
"""

from __future__ import annotations

import datetime as _dt
import random

from onto_text_tag_spark.functions.html_extract import strip_tags

# ---------------------------------------------------------------------------
# Mini-ontology (FIXTURES.md §2): ≥3 namespaces; includes a stopword label,
# an irregular plural, a cross-ontology surface collision, and the
# BCIO:010055-style hard exclusion (reference app.py:623-624).
# ---------------------------------------------------------------------------

_OBO = "http://purl.obolibrary.org/obo/"
_ADDICTO = "http://addictovocab.org/"
_BCIO = "http://humanbehaviourchange.org/ontology/"


def _cls(prefix_iri, curie, label, synonyms=(), definition=None, parent=None):
    local = curie.replace(":", "_")
    return {
        "iri": prefix_iri + local,
        "curie": curie,
        "label": label,
        "synonyms": list(synonyms),
        "definition": definition,
        "parent_curie": parent,
    }


def mini_ontology() -> list[dict]:
    """~30 classes across ADDICTO / BCIO / CHEBI / ENVO with an is-a tree."""
    rows = [
        # CHEBI chemical hierarchy (closure tests walk this chain)
        _cls(_OBO, "CHEBI:0001", "chemical entity", definition="Any chemical."),
        _cls(_OBO, "CHEBI:0010", "alkaloid", parent="CHEBI:0001",
             definition="Nitrogenous organic compound."),
        _cls(_OBO, "CHEBI:0011", "nicotine", ("3-(1-methylpyrrolidin-2-yl)pyridine",),
             "Alkaloid found in tobacco.", "CHEBI:0010"),
        _cls(_OBO, "CHEBI:0012", "caffeine", ("1,3,7-trimethylxanthine",),
             "Purine alkaloid.", "CHEBI:0010"),
        _cls(_OBO, "CHEBI:0020", "ethanol", ("ethyl alcohol", "drinking alcohol"),
             "Primary alcohol.", "CHEBI:0001"),
        _cls(_OBO, "CHEBI:0030", "opioid", parent="CHEBI:0001",
             definition="Opium-like compound."),
        _cls(_OBO, "CHEBI:0031", "morphine", parent="CHEBI:0030",
             definition="Opiate analgesic."),
        _cls(_OBO, "CHEBI:0032", "heroin", ("diamorphine",), "Opioid drug.",
             "CHEBI:0030"),
        # ADDICTO behaviours
        _cls(_ADDICTO, "ADDICTO:0001", "addiction", definition="A disorder."),
        _cls(_ADDICTO, "ADDICTO:0002", "smoking behaviour", ("smoking",),
             "Inhaling smoke.", "ADDICTO:0001"),
        _cls(_ADDICTO, "ADDICTO:0003", "tobacco smoking", (), "Smoking tobacco.",
             "ADDICTO:0002"),
        _cls(_ADDICTO, "ADDICTO:0004", "cigarette", ("cig",), "Rolled tobacco."),
        _cls(_ADDICTO, "ADDICTO:0005", "alcohol dependence", ("alcoholism",),
             "Dependence on alcohol.", "ADDICTO:0001"),
        _cls(_ADDICTO, "ADDICTO:0006", "withdrawal symptom", (),
             "Symptom on cessation.", None),
        _cls(_ADDICTO, "ADDICTO:0007", "craving", (), "Intense desire.",
             "ADDICTO:0006"),
        _cls(_ADDICTO, "ADDICTO:0008", "relapse", (), "Return to use.", None),
        # a label that is a stopword → dropped from the dictionary
        # (reference ontotagtext.py:89: stopword labels never match)
        _cls(_ADDICTO, "ADDICTO:0009", "further", (), "Stopword label."),
        # irregular plural (criterion → criteria)
        _cls(_ADDICTO, "ADDICTO:0010", "diagnostic criterion", (),
             "A criterion.", None),
        # BCIO interventions
        _cls(_BCIO, "BCIO:0001", "behaviour change technique", ("BCT",),
             "Active intervention component."),
        _cls(_BCIO, "BCIO:0002", "goal setting", (), "Setting goals.",
             "BCIO:0001"),
        _cls(_BCIO, "BCIO:0003", "self monitoring", ("self-monitoring",),
             "Monitoring own behaviour.", "BCIO:0001"),
        _cls(_BCIO, "BCIO:0004", "intervention", (), "An intervention."),
        _cls(_BCIO, "BCIO:0005", "smoking cessation", ("quitting smoking",),
             "Stopping smoking.", "BCIO:0004"),
        # cross-ontology surface collision: BCIO also defines "craving";
        # collision policy A5 (SURVEY.md §2.4) decides the winner.
        _cls(_BCIO, "BCIO:0006", "craving", (), "BCIO sense of craving."),
        # hard-excluded id (reference app.py:623-624 excludes BCIO:010055)
        _cls(_BCIO, "BCIO:010055", "excluded term", (), "Never tagged."),
        # ENVO environments
        _cls(_OBO, "ENVO:0001", "smoke", (), "Airborne particulates."),
        _cls(_OBO, "ENVO:0002", "urban environment", ("city environment",),
             "Built-up area."),
        _cls(_OBO, "ENVO:0003", "transport feature", (),
             "Construction enabling movement."),
    ]
    return rows


# ---------------------------------------------------------------------------
# Synthetic corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

# Sentence templates planting dictionary forms: singular, plural, synonym,
# multi-word, case-varied, overlapping ("tobacco smoking" ⊃ "smoking"),
# token-boundary trap ("smoker" must not match "smoke").
_SENTENCES = [
    "Nicotine is the primary alkaloid in tobacco products.",
    "Participants reported cravings during withdrawal.",
    "Tobacco smoking remains the leading preventable cause of death.",
    "The smoker cohort was compared with non-smokers.",  # boundary trap
    "Goal setting and self monitoring are behaviour change techniques.",
    "Ethyl alcohol, also known as ethanol, was administered.",
    "CAFFEINE improves alertness in moderate doses.",  # case-varied
    "Diagnostic criteria for alcohol dependence were applied.",
    "Smoking cessation programmes reduce relapse rates.",
    "Heroin and morphine are opioids with high dependence potential.",
    "Exposure to smoke in urban environments was measured.",
    "Quitting smoking lowers cardiovascular risk substantially.",
    "No ontology terms appear in this control sentence.",
    "The intervention targeted cigarettes and alcohol use.",
    "Cravings for nicotine peaked after twelve hours.",
]

# Non-matching filler vocabulary for the SCALING corpus generator
# (synth_row): real Common-Crawl pages are mostly text that matches no
# ontology term, so benchmark documents mix ~70% filler — keeping the
# tagger scan-bound like production, not verification-bound.
# synth_documents (the small fixture generator) is deliberately left
# term-dense so unit tests exercise matches.
_FILLER_WORDS = (
    "market report quarterly growth revenue product launch customer "
    "service platform update release notes community forum travel "
    "guide recipe kitchen garden weather forecast football season "
    "concert ticket museum exhibit library archive council meeting "
    "budget proposal highway construction schedule delay announcement"
).split()


def _filler_sentence(rng: random.Random) -> str:
    k = rng.randint(6, 14)
    words = [rng.choice(_FILLER_WORDS) for _ in range(k)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


_BOILERPLATE_HEAD = (
    '<!DOCTYPE html><html><head><meta charset="utf-8">'
    "<title>{title}</title><style>.nav{{display:none}}</style>"
    '<script>var page_id="{pid}";</script></head><body>'
    '<div class="nav"><a href="/home">Home</a> | <a href="/about">About</a></div>'
)
_BOILERPLATE_TAIL = '<div class="footer">&copy; 2025 Example Corp</div></body></html>'


def synth_documents(n_docs: int = 200, seed: int = 42) -> list[dict]:
    """Deterministic documents rows per input_hint schema.

    ``text`` is derived from ``html`` with the byte-identical extractor, so
    the per-row invariant holds by construction and downstream stages can
    also be tested against re-extraction.
    """
    rng = random.Random(seed)
    epoch = _dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    for i in range(n_docs):
        k = rng.randint(2, 6)
        body_sents = [rng.choice(_SENTENCES) for _ in range(k)]
        paragraphs = []
        for s in body_sents:
            # vary markup: entity-encode an ampersand-bearing variant,
            # sprinkle inline tags, occasionally a literal escape artifact
            if rng.random() < 0.2:
                s = s.replace(" and ", " &amp; ")
            if rng.random() < 0.3:
                words = s.split(" ")
                j = rng.randrange(len(words))
                words[j] = f"<b>{words[j]}</b>"
                s = " ".join(words)
            if rng.random() < 0.15:
                s += " \\x1f"  # literal escape artifact, stripped by extractor
            paragraphs.append(f"<p>{s}</p>")
        html = (
            _BOILERPLATE_HEAD.format(title=f"Document {i}", pid=i)
            + "".join(paragraphs)
            + _BOILERPLATE_TAIL
        )
        text = strip_tags(html)
        lang = "en" if rng.random() > 0.05 else rng.choice(["de", "fr", "es"])
        rows.append(
            {
                "url": f"https://example.org/p/{i}",
                "warc_ts": epoch + _dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
    return rows


def documents_df(spark, n_docs: int = 200, seed: int = 42):
    from onto_text_tag_spark.schemas import DOCUMENTS
    from onto_text_tag_spark.session import local_df

    return local_df(spark, synth_documents(n_docs, seed), DOCUMENTS)


def _paragraph_block(rng: random.Random, min_sents: int, max_sents: int,
                     filler_prob: float) -> list[str]:
    """The seeded paragraph stream of one document.  Extracted so a
    planted duplicate can regenerate its BASE document's body from the
    base's row id alone — no shuffle, no cross-row state."""
    k = rng.randint(min_sents, max_sents)
    paragraphs = []
    for _ in range(k):
        if rng.random() < filler_prob:
            s = _filler_sentence(rng)
        else:
            s = rng.choice(_SENTENCES)
        if rng.random() < 0.2:
            s = s.replace(" and ", " &amp; ")
        if rng.random() < 0.3:
            words = s.split(" ")
            j = rng.randrange(len(words))
            words[j] = f"<b>{words[j]}</b>"
            s = " ".join(words)
        if rng.random() < 0.15:
            s += " \\x1f"
        paragraphs.append(f"<p>{s}</p>")
    return paragraphs


def _is_planted_dup(i: int, seed: int, dup_frac: float) -> bool:
    return i > 0 and random.Random(f"{seed}:dup?:{i}").random() < dup_frac


_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)


def _row(i: int, html: str, lang: str) -> dict:
    return {
        "url": f"https://example.org/p/{i}",
        "warc_ts": _EPOCH + _dt.timedelta(seconds=i % 86_400_000),
        "html": html.encode("utf-8"),
        "text": strip_tags(html),
        "lang": lang,
    }


def synth_row(i: int, seed: int = 42, min_sents: int = 2,
              max_sents: int = 6, filler_prob: float = 0.7,
              dup_frac: float = 0.0) -> dict:
    """One document row, seeded per row id — embarrassingly parallel, so
    executors can generate disjoint id ranges with no driver round-trip
    and no cross-partition RNG state (unlike ``synth_documents``'s
    sequential stream).

    ``min_sents``/``max_sents`` size the body: benchmark corpora use
    ~40-120 sentences (≈3-8 KB of text) to match real Common-Crawl pages
    — tiny documents make per-row overhead dominate and understate the
    tagging stage that dominates at web scale.

    ``dup_frac`` plants duplicates: that fraction of rows copy an
    earlier non-duplicate row's body — ~30% byte-exact (same html, new
    url/warc_ts: mirror pages), the rest perturbed (a paragraph dropped
    and/or one filler paragraph swapped in: template near-dups).
    Dup-ness and base choice are pure functions of (seed, i), so any
    executor count yields the same corpus; ``dup_frac=0`` consumes the
    RNG stream identically to before the option existed (pinned corpora
    are unchanged)."""
    if dup_frac > 0 and _is_planted_dup(i, seed, dup_frac):
        rng = random.Random(f"{seed}:dup:{i}")
        while True:  # resample until the base is itself a non-dup
            j = rng.randrange(i)
            if not _is_planted_dup(j, seed, dup_frac):
                break
        paras = _paragraph_block(
            random.Random(f"{seed}:{j}"), min_sents, max_sents, filler_prob
        )
        if rng.random() < 0.3:  # byte-exact mirror (same title/pid too)
            html = (
                _BOILERPLATE_HEAD.format(title=f"Document {j}", pid=j)
                + "".join(paras) + _BOILERPLATE_TAIL
            )
        else:  # near-dup: drop a paragraph and/or swap in one filler
            if len(paras) > 1 and rng.random() < 0.7:
                paras.pop(rng.randrange(len(paras)))
            if rng.random() < 0.7:
                paras[rng.randrange(len(paras))] = (
                    f"<p>{_filler_sentence(rng)}</p>"
                )
            html = (
                _BOILERPLATE_HEAD.format(title=f"Document {i}", pid=i)
                + "".join(paras) + _BOILERPLATE_TAIL
            )
        return _row(i, html, "en" if rng.random() > 0.05
                    else rng.choice(["de", "fr", "es"]))

    rng = random.Random(f"{seed}:{i}")
    paragraphs = _paragraph_block(rng, min_sents, max_sents, filler_prob)
    html = (
        _BOILERPLATE_HEAD.format(title=f"Document {i}", pid=i)
        + "".join(paragraphs)
        + _BOILERPLATE_TAIL
    )
    return _row(i, html, "en" if rng.random() > 0.05
                else rng.choice(["de", "fr", "es"]))


def distributed_documents_df(spark, n_docs: int, seed: int = 42,
                             partitions: int | None = None,
                             min_sents: int = 2, max_sents: int = 6,
                             filler_prob: float = 0.7,
                             dup_frac: float = 0.0,
                             id_start: int = 0):
    """Corpus generator that scales: ``spark.range`` id space →
    ``mapInPandas`` row synthesis per partition (no driver materialize).

    Rows are pure functions of (seed, id), so ``id_start`` slices one
    deterministic corpus: gen(n=550k) ≡ gen(n=500k) ∪ gen(n=50k,
    id_start=500k) byte-for-byte — the property the incremental-update
    scaling bench relies on (delta batch ∪ base == full corpus)."""
    import pandas as pd

    from onto_text_tag_spark.schemas import DOCUMENTS

    cols = [f.name for f in DOCUMENTS.fields]
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for b in batches:
            rows = [synth_row(int(i), seed, min_sents, max_sents,
                              filler_prob, dup_frac)
                    for i in b["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(
        id_start, id_start + n_docs, numPartitions=parts
    ).mapInPandas(gen, schema=DOCUMENTS)


def ontology_df(spark):
    from onto_text_tag_spark.schemas import ONTOLOGY
    from onto_text_tag_spark.session import local_df

    return local_df(spark, mini_ontology(), ONTOLOGY)
