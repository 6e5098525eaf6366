"""Regression gate for the DuckDB-HUGEINT / complex-column failure class.

The external driver compares Spark results to the DuckDB oracles through
a *pandas* fetch.  Two oracle-shape bugs survive the raw-value parity
check in ``test_oracle_parity`` but break the driver:

1. DuckDB ``sum()`` / ``//``-on-sum return HUGEINT, which ``fetchdf()``
   downcasts to **float64** — the stringified hash then reads
   ``149174.0`` vs Spark's ``149174`` (round-2 ``corpus_rollup`` /
   ``text_packing`` failures).  Every integer-semantics oracle column
   must reach pandas as an integer dtype, i.e. carry an explicit
   ``::BIGINT`` cast on aggregate arithmetic.
2. Top-level ``array``/``map``/``struct`` Spark columns make the
   driver's ``sort_values`` canonicalizer die on unhashable cells
   (round-2 ``emb_quantize``) — oracled queries must emit only atomic
   columns (flatten or ``array_join`` list payloads).

This test runs every oracle through ``fetchdf()`` at sf0.001 and checks
its dtypes against the Spark query's (lazy) schema.
"""

import math
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_COMPLEX = (T.ArrayType, T.MapType, T.StructType)

ORACLED = sorted(
    k for k, v in entrymod.oracle_sql().items() if v is not None
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_dtypes_match_spark_schema(spark, duck, name):
    schema = entrymod.queries()[name](spark, SF_DIR).schema

    complex_cols = [
        f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not complex_cols, (
        f"{name}: top-level complex columns {complex_cols} break the "
        f"driver's pandas canonicalizer — flatten or array_join them"
    )

    odf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    spark_types = {f.name: f.dataType for f in schema.fields}
    assert sorted(odf.columns) == sorted(spark_types), (
        f"{name}: column mismatch {sorted(odf.columns)} vs "
        f"{sorted(spark_types)}"
    )

    bad = []
    for col in odf.columns:
        if not isinstance(spark_types[col], _INTEGRAL):
            continue
        dtype = odf[col].dtype
        if pd.api.types.is_integer_dtype(dtype):
            continue
        # A nullable-int column with actual NULLs legitimately arrives as
        # float64 on BOTH sides; only flag all-integral float columns,
        # which is the HUGEINT-leak signature.
        vals = odf[col].tolist()
        has_nan = any(isinstance(v, float) and math.isnan(v) for v in vals)
        if has_nan:
            continue
        bad.append((col, str(dtype)))
    assert not bad, (
        f"{name}: integer-semantics oracle columns reach pandas as "
        f"non-integer dtypes {bad} — add ::BIGINT casts in the oracle SQL"
    )
