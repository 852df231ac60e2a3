"""U2-U4 — the deterministic UDF surface (SURVEY §2.4).

All vectorized: scalar functions as Arrow ``pandas_udf``, grouped-map as
``applyInPandas``, table functions as built-in ``explode`` over generated
arrays (JVM-side — no Python at all for U4's common case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def expected_reserve_udf(term: pd.Series) -> pd.Series:
    """U2: closed-form E[reserve] = 100/(exp(365/term)-1) as an Arrow
    scalar pandas_udf (vectorized numpy, one Arrow batch per call).

    The built-in-expression twin is
    :func:`...functions.reserves.expected_reserve_column`, which is the
    preferred (JVM/codegen) form; this exists to exercise + test the
    registered-UDF path the reference's kernel (main.rs:62-76) would
    occupy if it weren't expressible in closed form.
    """
    t = term.to_numpy(dtype="float64")
    return pd.Series(100.0 / (np.exp(365.0 / t) - 1.0))


GROUP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean_bal", T.DoubleType()),
        T.StructField("spread", T.DoubleType()),
    ]
)


def group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """U3: grouped-map kernel — arbitrary per-group pandas logic.

    Deliberately computes things Spark *could* do natively (count, mean,
    max-min) so the DuckDB oracle can verify the applyInPandas plumbing
    bit-for-bit; real use cases put non-SQL per-group model fitting here.
    """
    bal = pdf["c_acctbal"].to_numpy(dtype="float64")
    return pd.DataFrame(
        {
            "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
            "n": [len(pdf)],
            "mean_bal": [round(float(bal.mean()), 6)],
            "spread": [round(float(bal.max() - bal.min()), 6)],
        }
    )


def register_udfs(spark: SparkSession) -> None:
    """Register the SQL-callable UDF surface (spark.udf.register)."""
    spark.udf.register("expected_reserve", expected_reserve_udf)


@pandas_udf(T.DoubleType())
def trimmed_mean_udf(v: pd.Series) -> float:
    """U2 grouped-aggregate form: 10%-trimmed mean as a GROUPED_AGG
    pandas_udf (Series → scalar) — the vectorized custom-aggregate
    escape hatch (robust statistics, sketches, model-eval metrics that
    SQL aggregates can't express). Usable in groupBy().agg() and over
    unbounded windows; Spark runs it per group on Arrow batches with
    partial aggregation disabled (a custom agg can't split), so groups
    shuffle whole — size strata accordingly. Returns the raw mean:
    rounding is done in the Spark plan with F.round so the half-away-
    from-zero convention matches the DuckDB oracle (Python's round()
    is banker's rounding and would diverge on exact .5e-7 ties)."""
    a = np.sort(v.to_numpy(dtype="float64"))
    k = int(len(a) * 0.1)
    core = a[k : len(a) - k] if len(a) > 2 * k else a
    return float(core.mean())
