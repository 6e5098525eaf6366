"""Termlist TSV source (the reference's dictionary interchange,
app.py:57-60): S5-sink → source roundtrip and the real fixture load."""

import os

import pytest

from onto_text_tag_spark.sources.termlist_tsv import (
    read_termlist,
    read_termlist_rows,
)

REFERENCE_TSV = "/root/reference/static/test_terms.tsv"


def test_sink_source_roundtrip(spark, tmp_path):
    """write_dictionary_tsv (S5) then read_termlist_rows must reproduce
    the tagging dictionary: same surface → (curie, name, ont) map the
    in-ontology build produces."""
    import glob
    import shutil

    from onto_text_tag_spark.corpus import ontology_df
    from onto_text_tag_spark.dictionary import (
        build_dictionary,
        build_dictionary_rows,
        resolve_collisions,
        write_dictionary_tsv,
    )

    d = resolve_collisions(build_dictionary(ontology_df(spark)))
    out = str(tmp_path / "terms_tsv")
    write_dictionary_tsv(d, out)
    part = glob.glob(os.path.join(out, "part-*.csv"))[0]
    tsv = str(tmp_path / "test_terms.tsv")
    shutil.copy(part, tsv)

    loaded = read_termlist_rows(tsv)
    from onto_text_tag_spark.plans.kg_pipeline import load_ontology_rows

    direct = build_dictionary_rows(load_ontology_rows(None, None))
    as_map = {r["surface"]: (r["id"], r["ont"]) for r in loaded}
    expected = {r["surface"]: (r["id"], r["ont"]) for r in direct}
    assert as_map == expected

    # Spark reader sees the same rows with the positional schema
    df = read_termlist(spark, tsv)
    assert df.columns == ["a", "ont", "id", "alt_name", "name", "definition"]
    assert df.count() == d.count()


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TSV), reason="reference absent"
)
def test_load_real_reference_termlist(spark):
    """The shipped 3,818-row fixture loads, collision-resolves to one
    concept per surface, and compiles into the tagger."""
    from onto_text_tag_spark.operators.tagger import compile_dictionary

    rows = read_termlist_rows(REFERENCE_TSV)
    assert len(rows) > 3000
    assert all(set(r) == {"surface", "id", "name", "ont"} for r in rows[:5])
    surfaces = [r["surface"] for r in rows]
    assert len(surfaces) == len(set(surfaces))  # A5: one row per surface
    tm = compile_dictionary(rows)
    hits = tm.find("nicotine dependence and alcohol use disorder")
    found = {h[2] for h in hits}
    # longest multiword surface wins candidates alongside its prefixes
    assert {"alcohol use disorder", "alcohol use", "alcohol",
            "nicotine"} <= found
