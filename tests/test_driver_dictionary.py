"""Pin the pure-Python driver dictionary to the Spark builder's output."""

from onto_text_tag_spark.driver_queries import (
    driver_dictionary,
    driver_dictionary_rows,
)


def test_driver_dictionary_rows_parity(spark):
    spark_rows = {
        (r["surface"], r["id"], r["name"], r["ont"])
        for r in driver_dictionary(spark)
        .select("surface", "id", "name", "ont")
        .collect()
    }
    py_rows = {
        (r["surface"], r["id"], r["name"], r["ont"])
        for r in driver_dictionary_rows()
    }
    assert py_rows == spark_rows
