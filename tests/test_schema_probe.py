"""Loud guard against silent testdata drift.

Round 2 died because ``events.parquet`` switched physical timestamp type
(TIMESTAMP(NANOS) → TIMESTAMP_MICROS) between driver runs and the loader
assumed one generation. This probe loads every table at the smoke SF and
asserts each load-bearing column comes back as an accepted dtype — so the
next drift fails here first, with a named assertion, instead of surfacing
as a DATATYPE_MISMATCH five frames deep in an unrelated query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from actuarial_reserve_modelling_spark.catalog import STAR_TABLES, load_table

from .conftest import SF_SMOKE

# table -> {column: accepted dtypes}. Only load-bearing columns are pinned;
# extra columns appearing in future testdata generations are fine.
EXPECTED = {
    "region": {"r_regionkey": (T.LongType, T.IntegerType)},
    "nation": {"n_nationkey": (T.LongType, T.IntegerType)},
    "customer": {
        "c_custkey": (T.LongType, T.IntegerType),
        "c_acctbal": (T.DoubleType, T.DecimalType),
    },
    "supplier": {"s_suppkey": (T.LongType, T.IntegerType)},
    "part": {"p_partkey": (T.LongType, T.IntegerType)},
    # Date columns have shipped as DATE in some generations and
    # TIMESTAMP_MICROS (→ TIMESTAMP_NTZ) in others; both compare fine
    # against DuckDB (which reads the identical parquet), so both are
    # accepted. Anything else (string, int64 epoch) is drift.
    "orders": {
        "o_orderkey": (T.LongType, T.IntegerType),
        "o_orderdate": (T.DateType, T.TimestampNTZType, T.TimestampType),
        "o_totalprice": (T.DoubleType, T.DecimalType),
    },
    "lineitem": {
        "l_orderkey": (T.LongType, T.IntegerType),
        "l_quantity": (T.DoubleType, T.DecimalType),
        "l_shipdate": (T.DateType, T.TimestampNTZType, T.TimestampType),
    },
    # After load_table's normalization the ts column must be a session-TZ
    # timestamp regardless of the parquet physical type it shipped as.
    "events": {
        "ts": (T.TimestampType,),
        "user_id": (T.LongType, T.IntegerType),
        "value": (T.DoubleType,),
    },
    "documents": {"doc_id": (T.LongType, T.IntegerType), "text": (T.StringType,)},
    "embeddings": {"vec_id": (T.LongType, T.IntegerType), "embedding": (T.ArrayType,)},
}


@pytest.mark.parametrize("table", STAR_TABLES)
def test_table_loads_with_expected_dtypes(spark, table):
    df = load_table(spark, SF_SMOKE, table)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, accepted in EXPECTED[table].items():
        assert col in fields, (
            f"testdata drift: {table}.{col} missing; columns now {sorted(fields)}"
        )
        assert isinstance(fields[col], accepted), (
            f"testdata drift: {table}.{col} loaded as {fields[col]}, "
            f"accepted: {[t.__name__ for t in accepted]}"
        )
    assert df.limit(1).count() >= 0  # table is actually readable


def test_embeddings_element_type(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    el = emb.schema["embedding"].dataType.elementType
    assert isinstance(el, (T.FloatType, T.DoubleType)), (
        f"testdata drift: embedding element type is {el}"
    )
