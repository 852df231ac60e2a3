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

# The driver's oracle check samples the FIRST 50 entries of the registry
# each round. Rounds 1-3 rotated module import order; that cannot express
# a precise window, so from round 4 the window is an explicit name list:
# every query that has never appeared in a driver CORRECTNESS_r*.json,
# plus queries added or rewritten this round. Names not yet registered
# are skipped (harmless); everything else keeps registration order.
_ROUND4_FRONT = [
    # new this round (S2/S7 sources, T5/T6 stream batch-equivalence).
    # The l2b/l2c/l5f rewrites are NOT front-loaded: they hold driver
    # rows from r1 and the round-4 done-criteria verify them via the
    # local oracle gate (tools/check_oracle.py).
    "s2_file_provenance",
    "s7_resume_roundtrip",
    "t5_watermark_equivalence",
    "t6_stream_dedup_equivalence",
    # never driver-checked through round 3 (local check_oracle green)
    "l9_fuzzy_levenshtein",
    "f7c_to_json",
    "f1b_string_funcs2",
    "f7b_json_typed",
    "l5h_tfidf",
    "l11_rag_index_search",
    "l5i_bm25",
    "l2d_embedding_dedup",
    "l6c_frame_sample",
    "o5b_multiset_ops",
    "w7_nth_value",
    "a18_count_if_mode",
    "f4c_month_grid",
    "a17_bit_aggregates",
    "s9_json_roundtrip",
    "s10_schema_evolution",
    "f5c_explode_outer",
    "s11_orc_roundtrip",
    "a9_stats_aggregates",
    "a10_median_percentile",
    "a10b_approx_percentile",
    "a11_collect_set",
    "f5b_array_ops",
    "a12_salted_aggregate",
    "j7_salted_join",
    "a7c_grouping_sets",
    "a14_argmax_aggregates",
    "a15_regression_aggregates",
    "s6_partitioned_roundtrip",
    "a16_hll_sketch_union",
    "a13_bloom_filter",
    "s5b_orc_roundtrip",
    "s5c_jsonl_roundtrip",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "q16_supplier_part_variety",
    "q20_excess_shipments",
    "w5_range_frame",
    "w6_distribution_ranks",
    "o7_unpivot",
    "w8_nulls_ordering",
    # rows-only by design; least value from a window slot, so last
    "o6_tablesample",
]

# Round-5 rotation TODO: once CORRECTNESS_r04 lands, front-load the
# round-4 additions (never driver-sampled): q2_min_cost_supplier,
# q6_forecast_revenue, q11_important_stock, l12_train_test_split,
# l13_stratified_sample, l14_sequence_packing, l15_vocab_topk,
# l16_decontamination, l5j_repetition, t8_stream_static_join,
# t9_stateful_counters, w12_scd2_dimension, j5b_asof_tolerance,
# l6d_audio_frame_energy, ts2_ewma, u2d_grouped_agg_udf, l3d_ann_pq_topk
# (rows-only), s12_zorder_key, l17_bpe_merges (rows-only), plus
# o6_tablesample (fell just outside
# the r4 window) and any r4 window entries the driver did not reach.


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
        training_data,
        window_queries2,
    )

    front = [n for n in _ROUND4_FRONT if n in REGISTRY]
    seen = set(front)
    ordered = front + [n for n in REGISTRY if n not in seen]
    return {n: REGISTRY[n] for n in ordered}
