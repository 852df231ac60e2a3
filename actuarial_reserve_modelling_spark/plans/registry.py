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
_ROUND6_FRONT = [
    # 1) the 34 queries whose latest driver evidence dates to round 2
    #    (VERDICT r5 "What's missing" #1 / "Next round" #1): re-earn
    #    hash-grade driver rows on current code. All pass locally under
    #    tools/check_oracle; this is audit debt, not a code change.
    "l5_text_stats",
    "l5b_token_counts",
    "l5c_quality_scores",
    "l5d_lang_id",
    "l5e_fingerprints",
    "l5g_text_cleaning",
    "l6_multimodal",
    "l6b_multimodal_resize",
    "l7_label_centroids",
    "l7b_vector_normalize",
    "l8_chunking",
    "l10_corpus_prep",
    "l1_exact_dedup",
    "l2e_dedup_clusters",
    "l3_cosine_topk",
    "l3b_ann_lsh_topk",
    "l3c_ann_ivf_topk",
    "u1_reserve_pipeline",
    "u1b_reserve_sql_mc",
    "u1c_reserve_risk_measures",
    "u2_scalar_udf",
    "u2b_builtin_expression",
    "u2c_segment_reserves",
    "u3_grouped_map",
    "u4_table_function",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    # 2) rewritten or re-oracled in round 6 — must re-earn driver
    #    evidence for the NEW code/oracle: scrub_pii count semantics
    #    (n_ips now counted post-email-scrub), dataset_diff structural
    #    xxhash64, compaction rename-before-delete, t11/l21 promoted
    #    from rows-only to oracle-backed, decontamination count-path
    #    prefilter, ANN auto-centroids + content-hash init.
    "l20_pii_scrub",
    "o9_dataset_diff",
    "s13_compaction_roundtrip",
    "t11_neardup_ingest_gate",
    "l21_bpe_encode",
    "l16_decontamination",
    "l3d_ann_pq_topk",
    "l25_ann_ivf_index_add",
    "l26_ann_ivfpq_topk",
    # 2b) NEW in round 6: SemDeDup semantic dedup + domain-mix weights
    "l27_semantic_dedup",
    "l28_domain_mix",
    "l29_segment_dedup",
    # 3) r3-era rows filling the remaining window slots (oldest of the
    #    round-3 evidence, VERDICT-spot-checked but driver-stale).
    "u1d_reserve_closed_form",
    "u4b_python_udtf",
    "j5_asof_join",
    "w1_ranking",
]


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

    front = [n for n in _ROUND6_FRONT if n in REGISTRY]
    seen = set(front)
    ordered = front + [n for n in REGISTRY if n not in seen]
    return {n: REGISTRY[n] for n in ordered}
