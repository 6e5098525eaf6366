"""Property test: update_dictionary == rebuild for RANDOM releases.

The fixture test (test_dict_update.py) pins hand-planted shadow /
un-shadow cases; this one drives the same equality over randomized
dictionary pairs built from a deliberately nested phrase pool
("heart", "heart attack", "acute heart attack", ...) and randomized
corpora, so collision re-resolution, plural surfaces, multi-class
remaps, and overlap chains all get exercised.  Each example builds a
root under dictionary A, absorbs the A→B release, and requires
span-exact equality with a from-scratch build under B.
"""

import os
import random

from hypothesis import HealthCheck, given, settings, strategies as st

from onto_text_tag_spark.corpus import _cls

_OBO = "http://purl.obolibrary.org/obo/"

# nested + partially-overlapping phrases: the stress case for
# longest-match-wins overlap resolution
_PHRASES = [
    "heart", "heart attack", "acute heart attack", "attack rate",
    "nicotine", "nicotine patch", "patch test", "gamma", "gamma rays",
    "craving", "intense craving", "withdrawal",
]
_FILLER = ["the", "a", "with", "during", "study", "clinic", "patient",
           "results", "show", "that"]


def _ontology(rng: random.Random) -> list[dict]:
    n = rng.randint(2, 6)
    phrases = rng.sample(_PHRASES, n)
    rows = []
    for i, label in enumerate(phrases):
        syns = ()
        if rng.random() < 0.3:
            cand = [p for p in _PHRASES if p not in phrases]
            if cand:
                syns = (rng.choice(cand),)
        rows.append(_cls(_OBO, f"TST:{i:04d}", label, syns, "x", None))
    return rows


def _corpus(rng: random.Random) -> list[tuple]:
    docs = []
    for d in range(rng.randint(6, 10)):
        words = []
        for _ in range(rng.randint(5, 25)):
            pick = rng.random()
            words.append(
                rng.choice(_PHRASES) if pick < 0.55
                else rng.choice(_FILLER))
        docs.append((f"https://p.example/{d}", " ".join(words), "en"))
    return docs


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.integers(0, 10**9))
def test_random_release_update_equals_rebuild(spark, tmp_path_factory,
                                              seed):
    from onto_text_tag_spark.dictionary import build_dictionary_rows
    from onto_text_tag_spark.plans.kg_absorb import (
        absorb_batch,
        init_kg_root,
    )
    from onto_text_tag_spark.plans.kg_dict_update import update_dictionary
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sinks import read_stage

    rng = random.Random(seed)
    onto_a, onto_b = _ontology(rng), _ontology(rng)
    docs = local_df(spark, _corpus(rng),
                    "url string, text string, lang string")
    tmp = str(tmp_path_factory.mktemp(f"prop{seed}"))

    def build(path, onto):
        init_kg_root(spark, path, onto)
        absorb_batch(spark, path, docs, build_dictionary_rows(onto),
                     batch_fp="b0", lang="en")
        return path

    def content(root):
        return (
            {tuple(r) for r in read_stage(spark, root, "mentions")
             .select("url", "begin", "end", "curie").collect()},
            {tuple(r) for r in read_stage(spark, root, "triples")
             .where("pred != 'is_a'")
             .select("pred", "subj", "obj", "weight").collect()},
        )

    root = build(os.path.join(tmp, "a"), onto_a)
    want = content(build(os.path.join(tmp, "b"), onto_b))
    update_dictionary(
        spark, root, docs,
        build_dictionary_rows(onto_a), build_dictionary_rows(onto_b),
        batch_fp=f"rel-{seed}",
    )
    assert content(root) == want
