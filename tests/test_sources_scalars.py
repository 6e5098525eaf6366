"""Ontology source parsers (S1) + scalar functions (P6-P8, J3-J4, A3)."""

from onto_text_tag_spark.sources.ontology import (
    curie_from_iri,
    parse_obo,
    parse_owl_xml,
)

OWL_SAMPLE = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/CHEBI_0011">
    <rdfs:label>nicotine</rdfs:label>
    <obo:IAO_0000118>3-(1-methylpyrrolidin-2-yl)pyridine</obo:IAO_0000118>
    <obo:IAO_0000115>Alkaloid found in tobacco.</obo:IAO_0000115>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/CHEBI_0010"/>
  </owl:Class>
  <owl:Class rdf:about="http://humanbehaviourchange.org/ontology/BCIO_0002">
    <rdfs:label>goal setting</rdfs:label>
  </owl:Class>
</rdf:RDF>
"""

OBO_SAMPLE = """format-version: 1.2

[Term]
id: ADDICTO:0007
name: craving
def: "Intense desire." [src]
synonym: "urge" EXACT []
is_a: ADDICTO:0006 ! withdrawal symptom

[Term]
id: ADDICTO:0006
name: withdrawal symptom
"""


def test_parse_owl_xml():
    rows = {r["curie"]: r for r in parse_owl_xml(OWL_SAMPLE)}
    nic = rows["CHEBI:0011"]
    assert nic["label"] == "nicotine"
    assert nic["synonyms"] == ["3-(1-methylpyrrolidin-2-yl)pyridine"]
    assert nic["definition"] == "Alkaloid found in tobacco."
    assert nic["parent_curie"] == "CHEBI:0010"
    assert rows["BCIO:0002"]["label"] == "goal setting"


def test_parse_obo():
    rows = {r["curie"]: r for r in parse_obo(OBO_SAMPLE)}
    c = rows["ADDICTO:0007"]
    assert c["label"] == "craving"
    assert c["synonyms"] == ["urge"]
    assert c["definition"] == "Intense desire."
    assert c["parent_curie"] == "ADDICTO:0006"


def test_curie_from_iri():
    assert curie_from_iri("http://purl.obolibrary.org/obo/CHEBI_16236") == "CHEBI:16236"
    assert (
        curie_from_iri("http://humanbehaviourchange.org/ontology/BCIO_0001")
        == "BCIO:0001"
    )
    assert curie_from_iri("http://example.org/FOO_1") == "FOO:1"
    assert curie_from_iri("no-slash") is None


def test_owl_to_dictionary_end_to_end(spark):
    from pyspark.sql import functions as F

    from onto_text_tag_spark.dictionary import build_dictionary
    from onto_text_tag_spark.sources.ontology import ontology_df_from_rows

    onto = ontology_df_from_rows(spark, parse_owl_xml(OWL_SAMPLE))
    d = build_dictionary(onto)
    surfaces = {r["surface"] for r in d.collect()}
    assert "nicotine" in surfaces and "nicotines" in surfaces
    assert "goal setting" in surfaces and "goal settings" in surfaces
    assert d.where(F.col("ont") == "CHEBI").count() >= 2


def test_scalar_functions(spark):
    from pyspark.sql import functions as F

    from onto_text_tag_spark.functions.scalars import (
        curie_from_iri_col,
        namespace_col,
        nodes_from_edges,
        vocab_link_col,
    )

    df = spark.createDataFrame(
        [("http://purl.obolibrary.org/obo/CHEBI_16236",),
         ("http://humanbehaviourchange.org/ontology/BCIO_0001",)],
        ["iri"],
    ).select(
        curie_from_iri_col("iri").alias("curie"),
    ).select(
        "curie",
        namespace_col("curie").alias("ns"),
        vocab_link_col("curie").alias("link"),
    )
    rows = {r["curie"]: r for r in df.collect()}
    assert rows["CHEBI:16236"]["ns"] == "CHEBI"
    assert rows["CHEBI:16236"]["link"] == "http://addictovocab.org/CHEBI:16236"
    assert rows["BCIO:0001"]["link"] == "http://bciovocab.org/BCIO:0001"

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    assert nodes_from_edges(edges).count() == 3


def test_reverse_lookups(spark):
    from onto_text_tag_spark.corpus import ontology_df
    from onto_text_tag_spark.dictionary import build_dictionary
    from onto_text_tag_spark.functions.scalars import entry_by_curie, entry_by_label

    d = build_dictionary(ontology_df(spark))
    assert entry_by_curie(d, "CHEBI:0012").count() >= 2  # label + plural
    got = entry_by_label(d, "CAFFEINE").select("id").distinct().collect()
    assert [r["id"] for r in got] == ["CHEBI:0012"]


def test_mentions_csv_scan(spark, tmp_path):
    """S4: positional 4-col CSV scan + P6 CURIE normalization
    (load_ontotermentions.py:68-80)."""
    from onto_text_tag_spark.sources.mentions_csv import (
        normalized_mentions,
        read_mentions_csv,
    )

    csv = tmp_path / "ontotermmentions.csv"
    csv.write_text(
        "1,http://purl.obolibrary.org/obo/ADDICTO_0007,craving,100001\n"
        "2,ADDICTO:0006,withdrawal symptom,100001\n"
        "3,http://humanbehaviourchange.org/ontology/BCIO_0002,goal setting,100002\n"
    )
    raw = read_mentions_csv(spark, str(csv))
    assert raw.columns == ["number", "id", "surface", "pmid"]
    rows = {
        (r["doc_id"], r["curie"]): r["surface"]
        for r in normalized_mentions(raw).collect()
    }
    assert rows[("100001", "ADDICTO:0007")] == "craving"
    assert rows[("100001", "ADDICTO:0006")] == "withdrawal symptom"
    assert rows[("100002", "BCIO:0002")] == "goal setting"


def test_p10_string_assembly(spark):
    """P10: slash-date + author-list string assembly
    (app.py:195-196,428 and app.py:173-214)."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.functions.scalars import (
        author_list_col,
        slash_date_col,
    )
    from onto_text_tag_spark.session import local_df

    df = local_df(
        spark,
        [(12, 4, 2021, ["West", "Brown", "Michie"])],
        "d int, m int, y int, authors array<string>",
    )
    row = df.select(
        slash_date_col("d", "m", "y").alias("date"),
        author_list_col("authors").alias("authors"),
    ).first()
    assert row["date"] == "12/4/2021"
    assert row["authors"] == "West, Brown, Michie"


def test_chunk_documents_windows(spark):
    from onto_text_tag_spark.operators.textstats import chunk_documents
    from onto_text_tag_spark.session import local_df

    text = " ".join(f"t{i}" for i in range(1, 13))  # 12 tokens
    docs = local_df(spark, [(1, text), (2, "a b")],
                    "doc_id bigint, text string")
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"],
         r["chunk"])
        for r in chunk_documents(docs, chunk_tokens=5, overlap=2).collect()
    )
    # doc 1: starts 1,4,7,10 (step 3); last chunk short
    assert rows == [
        (1, 0, 1, 5, "t1 t2 t3 t4 t5"),
        (1, 1, 4, 5, "t4 t5 t6 t7 t8"),
        (1, 2, 7, 5, "t7 t8 t9 t10 t11"),
        (1, 3, 10, 3, "t10 t11 t12"),
        (2, 0, 1, 2, "a b"),
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap=5)


def test_group_quantiles_exact_and_approx_schema(spark):
    from onto_text_tag_spark.operators.textstats import group_quantiles
    from onto_text_tag_spark.session import local_df

    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [("b", 10.0)]
    df = local_df(spark, rows, "g string, x double")
    got = {r["g"]: (r["q25"], r["q50"], r["q90"])
           for r in group_quantiles(df, "g", "x").collect()}
    assert got["a"] == (1.75, 2.5, 3.7)
    assert got["b"] == (10.0, 10.0, 10.0)
    ap = group_quantiles(df, "g", "x", approx=True)
    assert ap.columns == ["g", "q25", "q50", "q90"]
    assert ap.count() == 2


def test_jsonl_roundtrip_and_corrupt_records(spark, tmp_path):
    from pyspark.sql import functions as F

    from onto_text_tag_spark.corpus import documents_df
    from onto_text_tag_spark.sources.jsonl import (
        read_document_jsonl,
        write_document_jsonl,
    )

    docs = documents_df(spark, n_docs=30)
    path = str(tmp_path / "docs_jsonl")
    write_document_jsonl(docs, path)
    # Spark disallows corrupt-only queries straight off raw JSON —
    # cache the parsed result first (the documented pattern)
    back = read_document_jsonl(spark, path).cache()
    back.count()
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    a = {r["url"]: (bytes(r["html"]), r["text"], r["lang"],
                    str(r["warc_ts"]))
         for r in docs.collect()}
    b = {r["url"]: (bytes(r["html"]), r["text"], r["lang"],
                    str(r["warc_ts"]))
         for r in back.collect()}
    assert a == b  # html bytes + metadata round-trip exactly

    # plant a corrupt vendor shard: PERMISSIVE surfaces the line,
    # DROPMALFORMED drops it (a fresh file — appending in place would
    # trip the Hadoop CRC sidecar, which is its own kind of audit)
    with open(f"{path}/vendor-extra.json", "w") as fh:
        fh.write('{"url": "https://bad", "html_b64": NOT_JSON}\n')
    back.unpersist()  # same-plan cache would otherwise serve stale rows
    perm = read_document_jsonl(spark, path).cache()
    perm.count()
    assert perm.where(F.col("_corrupt_record").isNotNull()).count() == 1
    assert perm.count() == 31
    dropped = read_document_jsonl(spark, path, mode="DROPMALFORMED")
    assert dropped.count() == 30
    assert "_corrupt_record" not in dropped.columns


def test_owl_multilingual_labels_route_tagging(spark):
    """xml:lang-tagged rdfs:label/synonym literals become per-language
    dictionaries (sources/ontology.py:dictionaries_by_lang), and
    tag_documents_by_lang routes each document to its language's label
    set; untranslated classes are ABSENT from other languages (no
    silent English matching in German text)."""
    from onto_text_tag_spark.operators.tagger import tag_documents_by_lang
    from onto_text_tag_spark.session import local_df
    from onto_text_tag_spark.sources.ontology import (
        dictionaries_by_lang,
        parse_owl_xml,
    )

    owl = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/ADDICTO_900001">
    <rdfs:label>craving</rdfs:label>
    <rdfs:label xml:lang="de">verlangen</rdfs:label>
    <obo:IAO_0000118 xml:lang="de">begierde</obo:IAO_0000118>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/ADDICTO_900002">
    <rdfs:label xml:lang="en">relapse</rdfs:label>
  </owl:Class>
</rdf:RDF>"""
    rows = parse_owl_xml(owl)
    assert rows[0]["label"] == "craving"  # untagged default stays primary
    assert {e["text"] for e in rows[0]["i18n"]} == {"verlangen", "begierde"}
    assert rows[1]["label"] == "relapse"  # xml:lang="en" == default
    assert "i18n" not in rows[1]

    dicts = dictionaries_by_lang(rows)
    assert set(dicts) == {"en", "de"}
    en = {r["surface"]: r["id"] for r in dicts["en"]}
    de = {r["surface"]: r["id"] for r in dicts["de"]}
    assert en["craving"] == "ADDICTO:900001" and "relapse" in en
    assert de["verlangen"] == "ADDICTO:900001"
    assert de["begierde"] == "ADDICTO:900001"
    assert "relapse" not in de  # untranslated class absent from de
    assert "craving" not in de

    docs = local_df(
        spark,
        [("u1", "en", "craving and relapse"),
         ("u2", "de", "verlangen und begierde and craving relapse")],
        "url string, lang string, text string",
    )
    got = {
        (r.url, r.curie, r.span_text)
        for r in tag_documents_by_lang(docs, dicts).collect()
    }
    assert got == {
        ("u1", "ADDICTO:900001", "craving"),
        ("u1", "ADDICTO:900002", "relapse"),
        ("u2", "ADDICTO:900001", "verlangen"),
        ("u2", "ADDICTO:900001", "begierde"),
    }


def test_repetition_signals_hand_computed(spark):
    """Gopher-style repetition gates against hand-derived values.

    Doc 1: lines [a b, a b, c d] -> dup_line 1-2/3; chars 3/9.  Words
    a b a b c d (6 chars): top bigram 'a b' x2 covers 2 chars each ->
    4/6; top trigram count-1 tie breaks to smallest 'a b a' -> 3/6.
    Doc 2: 'the cat' x2 and 'cat the' x2 tie on count, each covering
    12 of 18 word chars; trigram 'the cat the' x2 covers all 18.
    Doc 5: 'one two' x3 -> 18/32; 'one two three' x2 -> 22/32."""
    from onto_text_tag_spark.operators.textstats import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),
            (2, "the cat the cat the dog"),
            (3, ""),
            (4, "x"),
            (5, "one two three one two three one two four"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(docs).collect()
    }
    assert got[1] == {
        "doc_id": 1, "n_lines": 3, "dup_line_frac": 0.3333,
        "dup_line_char_frac": 0.3333, "top_bigram_char_frac": 0.6667,
        "top_trigram_char_frac": 0.5,
    }
    assert got[2]["top_bigram_char_frac"] == 0.6667
    assert got[2]["top_trigram_char_frac"] == 1.0
    assert got[3] == {
        "doc_id": 3, "n_lines": 0, "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0, "top_bigram_char_frac": 0.0,
        "top_trigram_char_frac": 0.0,
    }
    assert got[4]["top_bigram_char_frac"] == 0.0
    assert got[5]["top_bigram_char_frac"] == 0.5625
    assert got[5]["top_trigram_char_frac"] == 0.6875

    # no Python stages: the whole operator must stay in codegen
    plan = repetition_signals(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_unigram_logloss_hand_computed(spark):
    """Laplace-smoothed unigram cross-entropy replayed from first
    principles: corpus 'a a b' + 'a c' -> counts a:3 b:1 c:1, tot 5,
    distinct 3; p(a)=4/8, p(b)=p(c)=2/8."""
    import math

    from onto_text_tag_spark.operators.textstats import unigram_logloss

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r for r in unigram_logloss(docs).collect()
    }
    pa, pb = -math.log(4 / 8), -math.log(2 / 8)
    assert out[1]["n_words"] == 3
    assert out[1]["mean_logloss"] == round((2 * pa + pb) / 3, 4)
    assert out[2]["mean_logloss"] == round((pa + pb) / 2, 4)
    assert out[3].asDict() == {"doc_id": 3, "n_words": 0,
                               "mean_logloss": 0.0}
    # rare-word docs must score above common-word docs
    assert out[2]["mean_logloss"] > out[1]["mean_logloss"]


def test_perplexity_buckets_exact_thirds(spark):
    """Rank arithmetic: 6 docs in one lang split 2/2/2 by mean
    logloss; repeated rare words push docs up the perplexity order
    deterministically."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    # 'a' dominates the corpus; docs with more distinct rare words
    # score higher mean logloss
    docs = spark.createDataFrame(
        [
            (1, "a a a a", "en"), (2, "a a a b", "en"),
            (3, "a a b c", "en"), (4, "a b c d", "en"),
            (5, "b c d e", "en"), (6, "c d e f", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(docs).collect()}
    assert out == {1: "head", 2: "head", 3: "middle",
                   4: "middle", 5: "tail", 6: "tail"}


def test_perplexity_buckets_per_language_and_sketch_agreement(spark):
    """Tiers are computed WITHIN each language; the percentile-sketch
    scale path assigns the same tiers as the exact sort on
    well-separated scores."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    rows = []
    for lang, shift in (("en", 0), ("de", 100)):
        for i in range(9):
            # 3 clearly-separated score groups per language
            word = ["common common common", "common rare1 rare2",
                    "rare3 rare4 rare5"][i // 3]
            rows.append((shift + i, word, lang))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    exact = {(r["doc_id"], r["lang"]): r["ppl_bucket"]
             for r in perplexity_buckets(docs, method="exact").collect()}
    sketch = {(r["doc_id"], r["lang"]): r["ppl_bucket"]
              for r in perplexity_buckets(docs, method="sketch").collect()}
    assert exact == sketch
    for lang in ("en", "de"):
        tiers = [v for (d, lg), v in exact.items() if lg == lang]
        assert sorted(tiers) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_perplexity_buckets_rejects_bad_args(spark):
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    docs = spark.createDataFrame([(1, "a", "en")],
                                 ["doc_id", "text", "lang"])
    import pytest

    with pytest.raises(ValueError):
        perplexity_buckets(docs, buckets=1)
    with pytest.raises(ValueError):
        perplexity_buckets(docs, method="nope")


def test_perplexity_buckets_sketch_plan_is_windowless(spark):
    """The sketch path is the 100-TB twin BECAUSE it has no
    per-language window sort: pin the executed plan — no Window
    operator, no Python stage; thresholds come from a (partial-
    aggregable) percentile sketch + a broadcast join."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i * 3) % 11} common", "en") for i in range(40)],
        ["doc_id", "text", "lang"],
    )
    plan = perplexity_buckets(docs, method="sketch")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "percentile_approx" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # and the exact path DOES rank inside a per-language window — the
    # contrast this pin documents
    plan_exact = perplexity_buckets(docs, method="exact")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" in plan_exact


def test_perplexity_buckets_discrete_matches_exact_when_tie_free(spark):
    """The deterministic discrete (value-threshold) path equals the
    exact rank path whenever no score group spans a tier boundary."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    docs = spark.createDataFrame(
        [
            (1, "a a a a", "en"), (2, "a a a b", "en"),
            (3, "a a b c", "en"), (4, "a b c d", "en"),
            (5, "b c d e", "en"), (6, "c d e f", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    exact = {r["doc_id"]: r["ppl_bucket"]
             for r in perplexity_buckets(docs, method="exact").collect()}
    disc = {r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_buckets(docs, method="discrete").collect()}
    assert disc == exact


def test_perplexity_buckets_discrete_keeps_tied_group_together(spark):
    """A score group spanning a tier boundary takes ONE tier (that of
    its first member in the exact ranking) — value-threshold
    semantics; the exact path would split it by doc_id."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    # 6 identical docs -> one score group covering all three tiers
    docs = spark.createDataFrame(
        [(i, "a b c", "en") for i in range(6)],
        ["doc_id", "text", "lang"],
    )
    disc = {r["ppl_bucket"]
            for r in perplexity_buckets(docs, method="discrete").collect()}
    assert disc == {"head"}  # cum_before = 0 -> tier 0 for the group
    exact = sorted(
        r["ppl_bucket"]
        for r in perplexity_buckets(docs, method="exact").collect()
    )
    assert exact == ["head", "head", "middle", "middle", "tail", "tail"]


def test_perplexity_buckets_discrete_plan_domain_sized_window(spark):
    """The discrete path's window runs over the (lang, score) COUNT
    relation (domain-sized), never the corpus: pin that the plan's
    Window sits above a HashAggregate and the doc-level assignment is
    a broadcast join with no Python stage."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i * 7) % 11}", "en") for i in range(60)],
        ["doc_id", "text", "lang"],
    )
    plan = perplexity_buckets(docs, method="discrete")._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    # window input is the aggregated (lang, score, count) relation
    win_idx = plan.index("Window")
    assert "HashAggregate" in plan[win_idx:]


def test_perplexity_buckets_null_lang_kept_by_all_methods(spark):
    """Docs whose lang-ID failed (lang=NULL) must bucket — not vanish —
    under every method (the sketch/discrete joins are null-safe)."""
    from onto_text_tag_spark.operators.textstats import perplexity_buckets

    from pyspark.sql import functions as F

    rows = [(i, ["a a a", "a a b", "b c d"][i % 3],
             None if i < 6 else "en") for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    for method in ("exact", "sketch", "discrete"):
        out = perplexity_buckets(docs, method=method)
        assert out.count() == 12, method
        assert out.where(F.col("lang").isNull()).count() == 6, method
