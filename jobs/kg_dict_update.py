"""spark-submit entry point for DICTIONARY-DELTA KG maintenance:
absorb an ontology release into an existing ``jobs/kg_build.py``
snapshot root without rebuilding it.

north_rule: at 10^12-document scale the ontology is the volatile axis —
OBO/OLS releases land monthly while the corpus only grows.  This job
makes a release cost O(affected docs): removed/remapped surfaces find
their affected docs in the STORED doc_terms arrays (no corpus scan),
added surfaces cost one corpus scan with the delta-sized automaton, and
only the affected docs are re-tagged with the new dictionary (exact
under longest-match-wins overlap resolution — see
``plans/kg_dict_update.py``).  The co-occurrence aggregate absorbs the
change via the signed pair delta; equality with a from-scratch rebuild
is pinned by tests/test_dict_update.py and the algebra is
DuckDB-oracle-checked by the ``kg_cooccur_dict_delta`` driver query.

Dictionary releases travel as the reference's 6-column termlist TSV
artifacts (``sources/termlist_tsv.py`` — the Router deployment
interchange), so the old and new dictionary are both named on the
command line as files.

Usage:
    spark-submit --master local[N] --py-files pkg.zip \
        jobs/kg_dict_update.py --kg <root> --input <corpus parquet> \
        --old-termlist old.tsv --new-termlist new.tsv [--lang en]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg", required=True,
                    help="existing jobs/kg_build.py snapshot root")
    ap.add_argument("--input", required=True,
                    help="the corpus the KG was built over (only "
                    "affected urls' texts are read)")
    ap.add_argument("--old-termlist", required=True,
                    help="6-col termlist TSV of the CURRENT dictionary")
    ap.add_argument("--new-termlist", required=True,
                    help="6-col termlist TSV of the NEW release")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the steady-state warmup pass")
    ap.add_argument("--defer-rewrite", action="store_true",
                    help="merge-on-read commit: land the affected docs' "
                    "re-tagged rows in the overlay pair instead of "
                    "rewriting the corpus-sized url-keyed stages — "
                    "O(affected) write cost; pair with --fold-overlay "
                    "maintenance runs")
    ap.add_argument("--fold-overlay", action="store_true",
                    help="after the update (or alone, with identical "
                    "old/new termlists), fold the merge-on-read overlay "
                    "into the base data files and clear it")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from onto_text_tag_spark.plans.kg_absorb import fold_dict_overlay
    from onto_text_tag_spark.plans.kg_dict_update import update_dictionary
    from onto_text_tag_spark.session import apply_engine_conf
    from onto_text_tag_spark.sources.termlist_tsv import read_termlist_rows

    spark = apply_engine_conf(SparkSession.builder).getOrCreate()

    if not args.no_warmup:
        # same steady-state warmup as jobs/kg_update.py: fork the Python
        # workers, JIT the codegen paths, touch the input footers once
        import pandas as _pd  # noqa: F401

        def _noop(it):
            yield from it

        spark.range(0, 10_000, numPartitions=4).toDF("id").mapInPandas(
            _noop, schema="id long"
        ).count()
        spark.read.parquet(args.input).limit(1000).count()

    import hashlib

    def _fp(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as fh:
            h.update(fh.read())
        return h.hexdigest()

    old_rows = read_termlist_rows(args.old_termlist)
    new_rows = read_termlist_rows(args.new_termlist)
    if old_rows == new_rows and args.fold_overlay:
        # fold-only maintenance run (identical termlists = no release)
        stats = {"status": "fold_only"}
    else:
        stats = update_dictionary(
            spark, args.kg, spark.read.parquet(args.input),
            old_rows, new_rows,
            batch_fp=(
                f"dict:{_fp(args.old_termlist)}>{_fp(args.new_termlist)}"
            ),
            lang=args.lang or None,
            defer_rewrite=args.defer_rewrite,
        )
    if args.fold_overlay:
        stats["fold"] = fold_dict_overlay(spark, args.kg)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
