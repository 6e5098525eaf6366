"""Context-scored candidate entity linking (operators/linker.py)."""

from onto_text_tag_spark.operators.linker import disambiguate
from onto_text_tag_spark.session import local_df

CAND_SCHEMA = "surface string, curie string"

CANDS = [
    # ambiguous: "vector" is claimed by ML and BIO
    ("vector", "ML:0001"),
    ("vector", "BIO:0009"),
    # unambiguous context surfaces
    ("embedding", "ML:0001"),
    ("spark", "ENG:0001"),
    ("mosquito", "BIO:0002"),
    ("parasite", "BIO:0003"),
]

MENTION_SCHEMA = "url string, surface string, curie string"


def _mention_rows():
    return [
        # d1: ML-context page — "vector" alongside "embedding"
        ("d1", "embedding", "ML:0001"),
        ("d1", "vector", "ML:0001"),
        ("d1", "spark", "ENG:0001"),
        # d2: BIO-context page — two distinct BIO classes beat one ML
        ("d2", "mosquito", "BIO:0002"),
        ("d2", "parasite", "BIO:0003"),
        ("d2", "embedding", "ML:0001"),
        ("d2", "vector", "ML:0001"),  # tagger's static link is wrong here
        ("d2", "vector", "ML:0001"),  # repeated occurrence — one output row
        # d3: no context at all — CURIE tie-break
        ("d3", "vector", "ML:0001"),
    ]


def test_disambiguate_context_and_tiebreak(spark):
    mentions = local_df(spark, _mention_rows(), MENTION_SCHEMA)
    cands = local_df(spark, CANDS, CAND_SCHEMA)
    out = disambiguate(mentions, cands)
    rows = {(r["url"], r["surface"]): (r["curie"], r["ont"], r["score"])
            for r in out.collect()}
    assert rows == {
        # d1: ML support 1 (embedding) vs BIO 0
        ("d1", "vector"): ("ML:0001", "ML", 1),
        # d2: BIO support 2 (mosquito, parasite) beats ML 1 (embedding) —
        # the context OVERRIDES the tagger's static link
        ("d2", "vector"): ("BIO:0009", "BIO", 2),
        # d3: zero context both sides — min CURIE wins deterministically
        ("d3", "vector"): ("BIO:0009", "BIO", 0),
    }
    # exactly one row per ambiguous (doc, surface), repeats collapsed
    assert out.count() == 3


def test_disambiguate_unambiguous_mentions_produce_no_rows(spark):
    mentions = local_df(
        spark, [("d1", "spark", "ENG:0001")], MENTION_SCHEMA
    )
    cands = local_df(spark, CANDS, CAND_SCHEMA)
    assert disambiguate(mentions, cands).count() == 0


def test_disambiguate_context_counts_distinct_classes_not_occurrences(spark):
    # five repeats of ONE ML surface must not outvote two distinct BIO
    # classes: support is countDistinct(curie), not mention frequency
    rows = [("d9", "embedding", "ML:0001")] * 5 + [
        ("d9", "mosquito", "BIO:0002"),
        ("d9", "parasite", "BIO:0003"),
        ("d9", "vector", "ML:0001"),
    ]
    mentions = local_df(spark, rows, MENTION_SCHEMA)
    cands = local_df(spark, CANDS, CAND_SCHEMA)
    [r] = disambiguate(mentions, cands).collect()
    assert (r["curie"], r["score"]) == ("BIO:0009", 2)


def test_entity_salience_hand_values(spark):
    import math

    rows = [
        # d1: A×3, B×1 ; d2: A×1 ; d3: B×2, C×1
        ("d1", "A"), ("d1", "A"), ("d1", "A"), ("d1", "B"),
        ("d2", "A"),
        ("d3", "B"), ("d3", "B"), ("d3", "C"),
    ]
    m = spark.createDataFrame(rows, "url string, curie string")
    from onto_text_tag_spark.operators.linker import entity_salience

    got = {
        (r.url, r.curie): (r.tf, r.df, r.salience, r.rank)
        for r in entity_salience(m).collect()
    }
    # N=3; df: A=2, B=2, C=1
    idf_a = math.log(3 / 2)
    idf_c = math.log(3 / 1)
    assert got[("d1", "A")] == (3, 2, round(3 * idf_a, 6), 1)
    assert got[("d1", "B")] == (1, 2, round(1 * idf_a, 6), 2)
    assert got[("d2", "A")] == (1, 2, round(idf_a, 6), 1)
    # d3: B tf2·idf(2/3)≈0.811 vs C tf1·idf(3)≈1.099 -> C ranks first
    assert got[("d3", "C")][3] == 1
    assert got[("d3", "B")][3] == 2


def test_mention_contexts_window_bounds(spark):
    from onto_text_tag_spark.operators.linker import mention_contexts
    from onto_text_tag_spark.session import local_df

    docs = local_df(
        spark,
        [(1, "a b c d e f g h i j"), (2, "x y")],
        "doc_id bigint, text string",
    )
    pos = local_df(
        spark,
        [(1, "T1", 1), (1, "T2", 5), (1, "T3", 10), (2, "T4", 2)],
        "doc_id bigint, curie string, pos bigint",
    )
    got = {
        (r["doc_id"], r["curie"]): r["context"]
        for r in mention_contexts(docs, pos, window=2).collect()
    }
    assert got == {
        (1, "T1"): "a b c",          # left-clamped
        (1, "T2"): "c d e f g",      # full ±2
        (1, "T3"): "h i j",          # right-clamped
        (2, "T4"): "x y",            # both-clamped
    }
