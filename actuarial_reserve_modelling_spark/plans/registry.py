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
_ROUND5_FRONT = [
    # 1) never driver-sampled through round 4 (VERDICT r4 "What's
    # missing" #1; all green under tools/check_oracle locally) — the
    # round-4 additions: training-data D-rows, TPC-H completions,
    # streaming/window/source additions.
    "l12_train_test_split",
    "l13_stratified_sample",
    "l14_sequence_packing",
    "l15_vocab_topk",
    "l16_decontamination",
    "l5j_repetition",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q11_important_stock",
    "t8_stream_static_join",
    "t9_stateful_counters",
    "w12_scd2_dimension",
    "j5b_asof_tolerance",
    "l6d_audio_frame_energy",
    "ts2_ewma",
    "u2d_grouped_agg_udf",
    "s12_zorder_key",
    "l4b_lsh_cosine_pairs",
    # 2) driver rows predate their round-4 rewrite (VERDICT #2):
    # re-earn driver-grade evidence for the current code.
    "l2_minhash_lsh_dedup",
    "l2b_simhash_pairs",
    "l2c_ngram_jaccard",
    "l5f_winnowing",
    "l4_cosine_pairs",
    # 3) fixed this round: list column → joined string so the driver
    # canonicalizer can hash it (r4 err row).
    "a11_collect_set",
    # 3b) new in round 5: incremental-ingest dedup tiers, PII scrub,
    # BPE apply side (l21 rows-only — trainer is iterative).
    "l18_incremental_exact_dedup",
    "l19_incremental_minhash_dedup",
    "l20_pii_scrub",
    "l21_bpe_encode",
    "t10_incremental_ingest_dedup",
    "t11_neardup_ingest_gate",
    "l22_shuffle_shards",
    "l23_weighted_sample",
    "l24_token_budget_select",
    "l25_ann_ivf_index_add",
    "l26_ann_ivfpq_topk",
    "s13_compaction_roundtrip",
    "l16b_decontaminate_flag",
    "o9_dataset_diff",
    # 4) rows-only by design — still worth a driver rows-check slot.
    "l3d_ann_pq_topk",
    "l17_bpe_merges",
    "o6_tablesample",
]

# Round-6 rotation TODO: after CORRECTNESS_r05 lands, return to
# steady-state sampling — front-load anything added/rewritten in round
# 5 plus any r5 window entries the driver did not reach; otherwise let
# registration order rotate older rows back through the window.


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

    front = [n for n in _ROUND5_FRONT if n in REGISTRY]
    seen = set(front)
    ordered = front + [n for n in REGISTRY if n not in seen]
    return {n: REGISTRY[n] for n in ordered}
