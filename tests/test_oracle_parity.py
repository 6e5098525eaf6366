"""Local replica of the driver's DuckDB cross-check.

Runs every ``queries()`` entry on Spark at sf0.001 and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row counts, column names, and order-insensitive values.  This is the
gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json) — catching
mismatches here keeps the round green.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

# default sf0.001 for speed; set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01
# to replicate the driver's gate at its actual scale
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(rows, columns):
    """Sort columns by name and rows by value for order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
                if math.isnan(v):
                    v = "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in order], out


QUERY_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # Non-SQL-expressible (iterative/stateful) — the driver records a
        # rows-only check for these; replicate that weaker gate here.
        sdf = q(spark, SF_DIR)
        assert sdf.count() >= 0
        pytest.skip(f"{name}: no oracle by design (rows-only check)")

    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_cols, s_vals = _normalize(spark_rows, spark_cols)
    d_cols, d_vals = _normalize(duck_rows, duck_cols)
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:5]}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["src", "dst", "weight"]
