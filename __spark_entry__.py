"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship reserve pipeline on sf0.001.
``queries()`` — every implemented SURVEY.md §2 operator as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB SQL (omitted for non-SQL ops →
rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from actuarial_reserve_modelling_spark.plans.registry import load_all

    return load_all()


def _prepare(spark: SparkSession) -> None:
    """Make an externally-created session compatible with our plans:
    executors must import our kernels, and timestamps must collect as
    UTC (DuckDB's timestamps are UTC-naive — a non-UTC session TZ would
    shift every timestamp result against the oracle)."""
    from actuarial_reserve_modelling_spark.session import ship_package

    ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from actuarial_reserve_modelling_spark.catalog import load_table, synthetic_portfolio
    from actuarial_reserve_modelling_spark.functions.reserves import simulate_reserves

    _prepare(spark)
    portfolio = synthetic_portfolio(load_table(spark, "/root/testdata/sf0.001", "customer"))
    return simulate_reserves(portfolio, n_trials=1_000, seed=42)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator row from SURVEY.md §2."""
    return {name: _wrap(q.spark_fn) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
