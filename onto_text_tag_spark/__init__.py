"""onto_text_tag_spark — a PySpark-native knowledge-graph construction engine.

Re-derives the capabilities of ontology-tools/onto-text-tag (reference at
/root/reference) as an idiomatic Spark DataFrame pipeline:

    documents (url, warc_ts, html, text, lang)
      → extract_text (byte-identical HTML strip, reference app.py:259-277)
      → dictionary tagging (Aho-Corasick over broadcast ontology dictionary,
        reference ontotagtext.py:110-141 / OGER app.py:57-60,681-708)
      → entity linking (broadcast join, reference ontotagtext.py:130-132)
      → triple emission: (url, mentions, curie),
        (curie_a, co_occurs_with, curie_b) [hv_generate.py:39-58],
        (child, is_a, parent) [app.py:116-151]
      → canonicalization (MinHash-LSH + connected components)
      → materialized nodes/edges snapshot tables with lineage + resume.

Everything is DataFrame/SQL-first; Python appears only inside Arrow-batched
pandas UDFs (HTML extraction, automaton matching).
"""

__version__ = "0.1.0"
