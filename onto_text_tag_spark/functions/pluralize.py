"""Deterministic English pluralizer for dictionary surface-form expansion.

The reference expands every label and synonym with ``inflect.engine()
.plural(...)`` (ontotagtext.py:70,92-94,101-107; app.py:630-637,663-670).
``inflect`` is not installable in this environment, so this module
re-derives the ``plural()`` code path of inflect 7.3.1 (public PyPI, MIT)
as pure functions over the rule tables in ``_plural_data.py`` —
differentially validated against ALL 1,909 (base, plural) row pairs of
the reference's shipped ``static/test_terms.tsv`` (real AddictO/BCIO/
ENVO/... labels with their actual inflect outputs; exact-match test in
tests/test_dictionary.py).  The behaviors a naive last-word pluralizer
misses, all evidenced in that fixture:

* **prepositional compounds**: in a ≥3-word phrase the word before the
  first interior preposition pluralizes — "mode of delivery" → "modes of
  delivery", "betel quid with tobacco" → unchanged (uninflected "quid").
* **dual prep compounds**: "<x> <prep> a <y>" pluralizes BOTH sides and
  drops the article — "accessibility of a product" → "accessibilities of
  products", "acute effect of using a product on a person" → "acute
  effects of using a product on people".
* **denominators**: "<x> per <y>" / "<x> a <y>" pluralize the numerator —
  "price per cigarette" → "prices per cigarette", "not a current smoker"
  → "nots a current smoker".
* **classical names** (inflect's DEFAULT): a word whose phrase starts
  uppercase and ends consonant+y takes "+s" — "Irish Cancer Society" →
  "Irish Cancer Societys", while "hospice facility" → "hospice
  facilities".
* **verb readings of single words**: whitespace-free tokens ending in s
  parse as 3rd-person verbs and LOSE the s ("strips" → "strip",
  "benzenes" → "benzene") unless a noun blocker matches ("process" →
  "processes", "snus" → "snuses").
* **word-wise case restore**: "FEV1" → "FEV1S" (all-caps input uppercases
  the suffix), postfix adjectives ("28-item General Health Questionnaire"
  → "28-items General …").

If the real ``inflect`` is importable we defer to it outright.

Pure function of its input — safe to use driver-side or inside a pandas UDF.
"""

from __future__ import annotations

import re

from onto_text_tag_spark.functions import _plural_data as D

try:  # optional, for exact inflect parity when available
    import inflect as _inflect

    _ENGINE = _inflect.engine()
except ImportError:  # pragma: no cover - environment-dependent
    _ENGINE = None

_PARTITION_WORD = re.compile(D.PARTITION_WORD_RE)
_DUAL_COMPOUND = re.compile(D.DUAL_COMPOUND_RE)
_DENOMINATOR = re.compile(D.DENOMINATOR_RE)
_POSTFIX_ADJ_STEMS = re.compile(D.POSTFIX_ADJ_STEMS_RE, re.IGNORECASE)
_VERB_SPECIAL_S = re.compile(D.VERB_SPECIAL_S_RE)
_ADJ_SPECIAL_KEYS = re.compile(D.ADJ_SPECIAL_KEYS_RE, re.IGNORECASE)
_ADJ_POSS_KEYS = re.compile(D.ADJ_POSS_KEYS_RE, re.IGNORECASE)
_ENDS_WITH_APOSTROPHE_S = re.compile(D.ENDS_WITH_APOSTROPHE_S_RE)
_ENDS_WITH_S = re.compile(r"^(.*[^s])s$", re.IGNORECASE)
_WHITESPACE = re.compile(r"\s")

_PREPS = frozenset(D.PREP_LIST)


def _postprocess(orig: str, inflected: str) -> str:
    """inflect.postprocess: resolve modern|classical alternatives and
    restore per-word capitalization patterns."""
    if "|" in inflected:
        # irregular-table values carry "modern|classical" alternatives;
        # classical('all') is OFF by default → pick the modern form
        # (index 0), exactly like inflect.postprocess
        word_options = inflected.split("|")
        if len(word_options[0].split(" ")) == len(word_options[1].split(" ")):
            result = word_options[0].split(" ")
        else:
            result = inflected.split(" ")
            for index, word in enumerate(result):
                if "|" in word:
                    result[index] = word.split("|")[0]
    else:
        result = inflected.split(" ")
    for index, word in enumerate(orig.split(" ")):
        if word == "I" or index >= len(result):
            continue
        if word.capitalize() == word:
            result[index] = result[index].capitalize()
        if word == word.upper():
            result[index] = result[index].upper()
    return " ".join(result)


def _bysize_match(lowered: str, bysize: dict) -> bool:
    return any(lowered[-k:] in v for k, v in bysize.items())


def _handle_long_compounds(split_: list[str]) -> str | None:
    """First (candidate, preposition) window: pluralize the candidate."""
    for i in range(len(split_) - 1):
        if split_[i + 1] in _PREPS:
            return " ".join(
                split_[:i] + [_plnoun(split_[i]), split_[i + 1]] + split_[i + 2 :]
            )
    return None


def _handle_hyphen_prepositional(lowered: str) -> str | None:
    """mother-in-law → mothers-in-law (operates on the lowered phrase,
    postprocess restores case — mirrors inflect's lowered-input call)."""
    parts = lowered.split("-")
    if len(parts) < 3:
        return None
    for pivot in range(1, len(parts) - 1):
        if parts[pivot] in _PREPS:
            transformed = _plnoun(parts[pivot - 1]) or parts[pivot - 1]
            return " ".join(
                parts[: pivot - 1] + ["-".join([transformed, parts[pivot], ""])]
            ) + " ".join(parts[pivot + 1 :])
    return None


def _plnoun(word: str) -> str:  # noqa: C901 - mirrors inflect's branch order
    if word == "":
        return word

    lowered = word.lower()
    split_ = word.split()
    first = split_[0] if split_ else word
    last = split_[-1] if split_ else word
    lowered_last = last.lower()

    # UNINFLECTED PLURALS
    if lowered_last in D.SB_UNINFLECTED_COMPLETE:
        if len(split_) >= 3:
            handled = _handle_long_compounds(split_)
            if handled is not None:
                return handled
        return word
    if word in D.SB_UNINFLECTED_CAPS:
        return word
    if _bysize_match(lowered, D.SB_UNINFLECTED_BYSIZE):
        return word

    # COMPOUNDS ("Governor General", "court martial", dual preps, units)
    mo = _POSTFIX_ADJ_STEMS.search(word)
    if mo and mo.group(2) != "":
        return f"{_plnoun(mo.group(1))}{mo.group(2)}"

    if " a " in lowered or "-a-" in lowered:
        mo = _DUAL_COMPOUND.search(word)
        if mo and mo.group(2) != "" and mo.group(3) != "":
            return f"{_plnoun(mo.group(1))}{mo.group(2)}{_plnoun(mo.group(3))}"

    if len(split_) >= 3:
        handled = _handle_long_compounds(split_)
        if handled is not None:
            return handled

    mo = _DENOMINATOR.search(lowered)
    if mo:
        index = len(mo.group("denominator"))
        return f"{_plnoun(word[:index])}{word[index:]}"

    if len(split_) >= 2 and split_[-2] == "degree":
        return " ".join([_plnoun(first)] + split_[1:])

    hyph = _handle_hyphen_prepositional(lowered)
    if hyph is not None:
        return hyph

    # PRONOUNS
    for k, v in D.PRON_ACC_KEYS_BYSIZE.items():
        if lowered[-k:] in v:
            for pk, pv in D.PREP_BYSIZE.items():
                if lowered[:pk] in pv and lowered.split() == [
                    lowered[:pk],
                    lowered[-k:],
                ]:
                    return lowered[:-k] + D.PRON_ACC[lowered[-k:]]
    if lowered in D.PRON_NOM:
        return D.PRON_NOM[lowered]
    if lowered in D.PRON_ACC:
        return D.PRON_ACC[lowered]

    # ISOLATED IRREGULAR PLURALS
    if last in D.SB_IRREGULAR_CAPS:
        return f"{word[: -len(last)]}{D.SB_IRREGULAR_CAPS[last]}"
    if lowered_last in D.SB_IRREGULAR:
        return f"{word[: -len(lowered_last)]}{D.SB_IRREGULAR[lowered_last]}"
    dash_split = lowered.split("-")
    last_two = " ".join(dash_split[-2:])
    if last_two in D.SB_IRREGULAR_COMPOUND:
        return f"{word[: -len(last_two)]}{D.SB_IRREGULAR_COMPOUND[last_two]}"
    if lowered[-3:] == "quy":
        return f"{word[:-1]}ies"
    if lowered[-6:] == "person":
        return f"{word[:-4]}ople"  # classical "persons" is off by default

    # FAMILIES OF IRREGULAR PLURALS
    if lowered[-3:] == "man":
        if _bysize_match(lowered, D.SB_U_MAN_MANS_BYSIZE):
            return f"{word}s"
        if any(word[-k:] in v for k, v in D.SB_U_MAN_MANS_CAPS_BYSIZE.items()):
            return f"{word}s"
        return f"{word[:-3]}men"
    if lowered[-5:] == "mouse":
        return f"{word[:-5]}mice"
    if lowered[-5:] == "louse":
        v = D.SB_U_LOUSE_LICE_BYSIZE.get(len(word))
        if v and lowered in v:
            return f"{word[:-5]}lice"
        return f"{word}s"
    if lowered[-5:] == "goose":
        return f"{word[:-5]}geese"
    if lowered[-5:] == "tooth":
        return f"{word[:-5]}teeth"
    if lowered[-4:] == "foot":
        return f"{word[:-4]}feet"
    if lowered[-4:] == "taco":
        return f"{word[:-5]}tacos"
    if lowered == "die":
        return "dice"

    # UNASSIMILATED IMPORTS
    if lowered[-4:] == "ceps":
        return word
    if lowered[-4:] == "zoon":
        return f"{word[:-2]}a"
    if lowered[-3:] in ("cis", "sis", "xis"):
        return f"{word[:-2]}es"
    for lastlet, table, numend, post in (
        ("h", D.SB_U_CH_CHS_BYSIZE, None, "s"),
        ("x", D.SB_U_EX_ICES_BYSIZE, -2, "ices"),
        ("x", D.SB_U_IX_ICES_BYSIZE, -2, "ices"),
        ("m", D.SB_U_UM_A_BYSIZE, -2, "a"),
        ("s", D.SB_U_US_I_BYSIZE, -2, "i"),
        ("n", D.SB_U_ON_A_BYSIZE, -2, "a"),
        ("a", D.SB_U_A_AE_BYSIZE, None, "e"),
    ):
        if lowered[-1] == lastlet and _bysize_match(lowered, table):
            return word[:numend] + post
    # (classical "ancient" import families are off by default)

    # SINGULAR NOUNS ENDING IN ...s OR OTHER SIBILANTS
    if lowered_last in D.SB_SINGULAR_S_COMPLETE:
        return f"{word}es"
    if _bysize_match(lowered, D.SB_SINGULAR_S_BYSIZE):
        return f"{word}es"
    if lowered[-2:] == "es" and word[0] == word[0].upper():
        return f"{word}es"
    if lowered[-1] == "z":
        if _bysize_match(lowered, D.SB_Z_ZES_BYSIZE):
            return f"{word}es"
        if lowered[-2:-1] != "z":
            return f"{word}zes"
    if lowered[-2:] == "ze" and _bysize_match(lowered, D.SB_ZE_ZES_BYSIZE):
        return f"{word}s"
    if lowered[-2:] in ("ch", "sh", "zz", "ss") or lowered[-1] == "x":
        return f"{word}es"

    # ...f → ...ves
    if lowered[-3:] in ("elf", "alf", "olf"):
        return f"{word[:-1]}ves"
    if lowered[-3:] == "eaf" and lowered[-4:-3] != "d":
        return f"{word[:-1]}ves"
    if lowered[-4:] in ("nife", "life", "wife"):
        return f"{word[:-2]}ves"
    if lowered[-3:] == "arf":
        return f"{word[:-1]}ves"

    # ...y
    if lowered[-1] == "y":
        if lowered[-2:-1] in "aeiou" or len(word) == 1:
            return f"{word}s"
        if word[0] == word[0].upper():  # classical "names" is ON by default
            return f"{word}s"
        return f"{word[:-1]}ies"

    # ...o
    if lowered_last in D.SB_U_O_OS_COMPLETE:
        return f"{word}s"
    if _bysize_match(lowered, D.SB_U_O_OS_BYSIZE):
        return f"{word}s"
    if lowered[-2:] in ("ao", "eo", "io", "oo", "uo"):
        return f"{word}s"
    if lowered[-1] == "o":
        return f"{word}es"

    return f"{word}s"


def _pl_special_verb(word: str) -> str | None:
    """3rd-person-singular verb reading of ``word`` (inflect order)."""
    if not word:
        return None
    lowered = word.lower()
    split_ = word.split()
    first = split_[0] if split_ else word
    last = split_[-1] if split_ else word

    if first in D.VERB_IRREGULAR_PRES:
        return f"{D.VERB_IRREGULAR_PRES[first]}{word[len(first):]}"
    if first in D.VERB_IRREGULAR_NON_PRES:
        return word
    if first.endswith("n't") and first[:-3] in D.VERB_IRREGULAR_PRES:
        return f"{D.VERB_IRREGULAR_PRES[first[:-3]]}n't{word[len(first):]}"
    if first.endswith("n't"):
        return word
    if _VERB_SPECIAL_S.search(word):
        return None
    if _WHITESPACE.search(word):
        return None
    if lowered == "quizzes":
        return "quiz"
    if lowered[-4:] in ("ches", "shes", "zzes", "sses") or lowered[-3:] == "xes":
        return word[:-2]
    if lowered[-3:] == "ies" and len(word) > 3:
        return lowered[:-3] + "y"
    if (
        last.lower() in D.V_OES_OE
        or lowered[-4:] in D.V_OES_OE_ENDINGS_SIZE4
        or lowered[-5:] in D.V_OES_OE_ENDINGS_SIZE5
    ):
        return word[:-1]
    if lowered.endswith("oes") and len(word) > 3:
        return lowered[:-2]
    mo = _ENDS_WITH_S.search(word)
    if mo:
        return mo.group(1)
    return None


def _pl_special_adjective(word: str) -> str | None:
    mo = _ADJ_SPECIAL_KEYS.search(word)
    if mo:
        return D.ADJ_SPECIAL[mo.group(1).lower()]
    mo = _ADJ_POSS_KEYS.search(word)
    if mo:
        return D.ADJ_POSS[mo.group(1).lower()]
    mo = _ENDS_WITH_APOSTROPHE_S.search(word)
    if mo:
        pl = _plnoun(mo.group(1))
        trailing_s = "" if pl[-1] == "s" else "s"
        return f"{pl}'{trailing_s}"
    return None


def plural(phrase: str) -> str:
    """inflect 7.3.1 ``engine().plural(phrase)``, re-derived.

    Leading/trailing whitespace is preserved (inflect partitions it out
    before inflecting, exactly as the reference's ``.strip()``-then-
    pluralize call sites rely on).
    """
    if _ENGINE is not None:
        result = _ENGINE.plural(phrase)
        if result:
            return result
    mo = _PARTITION_WORD.search(phrase)
    if not mo or not mo.group(2):
        return phrase
    pre, word, post = mo.group(1), mo.group(2), mo.group(3)
    inflected = (
        _pl_special_adjective(word)
        or _pl_special_verb(word)
        or _plnoun(word)
    )
    return f"{pre}{_postprocess(word, inflected)}{post}"
