"""Registry mapping SURVEY.md §2 operator rows to runnable queries.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) a DuckDB oracle SQL string over the same
parquet tables. The driver runs both at sf0.01 and compares row count,
schema, and an order-insensitive value hash — so every query obeys the
determinism rules (SURVEY §5.2-1): keyed outputs, float aggregates
rounded, column names aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey_rows: str  # e.g. "A4" — ties back to SURVEY.md §2


REGISTRY: dict[str, Query] = {}


def register(name: str, survey_rows: str, oracle: str | None = None):
    """Decorator: add a query builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, survey_rows=survey_rows)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full registry."""
    # NOTE: import order = registration order = the driver's oracle-check
    # order (it samples the first 50 registry entries). Rounds 1-2 used
    # alphabetical order, which left the entire core relational/window/
    # streaming suite outside the checked window; round 3 front-loads it.
    # Rotate per round so every query accumulates driver correctness rows.
    # Round 4 should front-load the still-never-checked modules:
    # misc_queries, stats_queries, tpch_more, window_queries2, and the
    # llm_queries/llm_queries2 tails (l5f, l6b/l6c, l5h, l5i, l11,
    # f1b/f7b/f7c) — everything else has r1-r3 rows.
    from actuarial_reserve_modelling_spark.plans import (  # noqa: F401
        relational,
        window_queries,
        streaming_queries,
        analytics,
        extended,
        llm_queries2,
        composite,
        kernel_queries,
        llm_queries,
        misc_queries,
        stats_queries,
        tpch_more,
        window_queries2,
    )

    return REGISTRY
