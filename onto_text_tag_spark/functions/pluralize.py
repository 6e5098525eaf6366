"""Deterministic English pluralizer for dictionary surface-form expansion.

The reference expands every label and synonym with ``inflect.engine()
.plural(...)`` (ontotagtext.py:70,92-94,101-107; app.py:630-637,663-670).
``inflect`` is not available in this environment, so this is a pure,
deterministic rule engine covering the noun-phrase shapes that occur in
ontology dictionaries (reference fixture static/test_terms.tsv: "transport
feature(s)", "hospice facility/-ies", multi-word phrases pluralized on the
final token). If ``inflect`` is importable we defer to it for maximum
reference parity.

Pure function of its input — safe to use driver-side or inside a pandas UDF.
"""

from __future__ import annotations

try:  # optional, for exact inflect parity when available
    import inflect as _inflect

    _ENGINE = _inflect.engine()
except ImportError:  # pragma: no cover - environment-dependent
    _ENGINE = None

_IRREGULAR = {
    "man": "men",
    "woman": "women",
    "person": "people",
    "child": "children",
    "foot": "feet",
    "tooth": "teeth",
    "goose": "geese",
    "mouse": "mice",
    "louse": "lice",
    "ox": "oxen",
    "die": "dice",
    "criterion": "criteria",
    "phenomenon": "phenomena",
    "datum": "data",
    "medium": "media",
    "bacterium": "bacteria",
    "curriculum": "curricula",
    "stimulus": "stimuli",
    "fungus": "fungi",
    "nucleus": "nuclei",
    "radius": "radii",
    "analysis": "analyses",
    "axis": "axes",
    "basis": "bases",
    "crisis": "crises",
    "diagnosis": "diagnoses",
    "hypothesis": "hypotheses",
    "thesis": "theses",
    "index": "indices",
    "matrix": "matrices",
    "vertex": "vertices",
    "appendix": "appendices",
    "alumnus": "alumni",
    "syllabus": "syllabi",
    "larva": "larvae",
    "vertebra": "vertebrae",
    "life": "lives",
    "knife": "knives",
    "wife": "wives",
    "leaf": "leaves",
    "loaf": "loaves",
    "half": "halves",
    "shelf": "shelves",
    "wolf": "wolves",
    "calf": "calves",
    "self": "selves",
    "thief": "thieves",
}

# invariant plurals (uncountable / same-form)
_UNCHANGED = {
    "sheep",
    "deer",
    "fish",
    "species",
    "series",
    "means",
    "offspring",
    "aircraft",
    "news",
    "information",
    "equipment",
    "cannabis",
    "tobacco",
    "alcohol",
}

_VOWELS = set("aeiou")


def _match_case(template: str, word: str) -> str:
    """Apply the casing pattern of ``template``'s first letter to ``word``."""
    if template[:1].isupper():
        return word[:1].upper() + word[1:]
    return word


def _plural_word(word: str) -> str:
    lower = word.lower()
    if not word:
        return word
    if lower in _UNCHANGED:
        return word
    if lower in _IRREGULAR:
        return _match_case(word, _IRREGULAR[lower])
    if len(lower) >= 2 and lower.endswith("y") and lower[-2] not in _VOWELS:
        return word[:-1] + "ies"
    if lower.endswith(("s", "x", "z", "ch", "sh")):
        return word + "es"
    if len(lower) >= 2 and lower.endswith("o") and lower[-2] not in _VOWELS:
        return word + "es"
    return word + "s"


def plural(phrase: str) -> str:
    """Pluralize an English noun phrase on its final word.

    Multi-word dictionary entries ("transport feature" → "transport
    features") pluralize the head noun, matching how inflect treats the
    phrase labels in the reference fixture.
    """
    if _ENGINE is not None:
        result = _ENGINE.plural(phrase)
        if result:
            return result
    stripped = phrase.rstrip()
    trailing = phrase[len(stripped) :]
    if not stripped:
        return phrase
    head, sep, last = stripped.rpartition(" ")
    return head + sep + _plural_word(last) + trailing
