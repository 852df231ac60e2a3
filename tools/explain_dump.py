"""Generate PLANS.md: formatted physical plans of the headline queries
with the scale-relevant properties annotated.

Usage: python tools/explain_dump.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = {
    "s3_parquet_scan_count": "count should be metadata-only (parquet aggregate pushdown)",
    "p3_p6_compound_filter": "all predicates in PushedFilters; pruned ReadSchema",
    "a4_groupby_q1": "partial HashAggregate below the single Exchange",
    "j1_broadcast_join_agg": "BroadcastHashJoin; no fact-side shuffle before the agg",
    "j5_asof_join": "one Exchange total (union + window on user_id)",
    "j4b_pure_range_join": "hash join on time buckets — no nested loop",
    "o1_o3_topk": "TakeOrderedAndProject; zero Exchanges",
    "w4_topk_per_group": "WindowGroupLimit pushes rn<=3 below the shuffle",
    "q5_local_supplier_volume": "dims broadcast; facts shuffle once on the shared key",
    "l3_cosine_topk": "broadcast nested loop is the intended brute-force (query side broadcast)",
    "l10_corpus_prep": "narrow maps end-to-end; only the dedup groupBy and survivor join shuffle",
    "u1b_reserve_sql_mc": "Monte Carlo entirely inside WholeStageCodegen — no Python in the plan",
    "l2b_simhash_pairs": "pigeonhole band equi-join (SortMergeJoin/ShuffledHashJoin on band+key) — no nested loop anywhere",
    "l2c_ngram_jaccard": "prefix-filter blocking: candidate join is an equi-join on prefix grams; no nested loop",
    "l9_fuzzy_levenshtein": "positional q-gram equi-join candidates; levenshtein verify only on candidates",
    "l2_minhash_lsh_dedup": "verify join strategy left to AQE (no hard-coded broadcast hint on the build side)",
    "l18_incremental_exact_dedup": "LeftAnti hash join on the digest — corpus side is 16-byte fingerprints, never documents",
    "l19_incremental_minhash_dedup": "asymmetric (band,bucket) equi-join new-batch×index — no index self-join, no nested loop",
    "l20_pii_scrub": "chained regexp_replace inside one WholeStageCodegen span — zero Exchanges",
    "l29_segment_dedup": "digest-only frequency aggregate; drop-set anti-join strategy left to AQE (no forced broadcast on the unbounded side)",
    "l31_dsir_weights": "one gram explode+hash pass; bounded |buckets|-row ratio table broadcast; per-doc reduce is an int64 sum",
    "l32_repeated_spans": "digest-only window-occurrence aggregate; repeated-set semi-join AQE-decided; span merge is two per-doc windows, no global sort",
    "l27b_semantic_dedup_lsh": "single-kernel multi-table signatures (one corpus scan); bucket-local candidate explode; exact verify only on candidates",
    "l27c_semantic_dedup_ivf": "hierarchical coarse quantizer: FlatMapGroupsInArrow trains each super-list's children executor-side (no driver centroid state); exact verify join AQE-decided; no nested loop",
    "w13_salted_topk": "two-phase skew-safe top-k: phase-1 Exchange hashes on (key, salt); WindowGroupLimit on BOTH sides of BOTH exchanges bounds every sort to k rows per group",
    "l3g_ann_ivf_hier_top1_planted": "two-level ANN index: child centroids are ROWS joined by probed super (queries broadcast per the bounded-query contract), per-super routing in one grouped kernel; exact re-rank only on probed lists",
    "s14_bucketed_colocated_join": "both scans Bucketed: true (SelectedBucketsCount 8/8); at sf0.01 the planner rightly broadcasts the small side — the zero-shuffle SortMergeJoin shape for the fact-x-fact case is pinned with broadcast disabled in tests/test_relational.py::test_bucketed_join_has_no_exchange",
    "l34_ann_index_persisted": "persisted-index query: the members scan carries the query batch's probed supers as PartitionFilters AND returns the stored vectors — per-batch I/O is the probed fraction of the index, zero corpus files (r10 vector-bearing layout)",
    "l37_ivfpq_index_persisted": "persisted IVF-PQ query: probed-cluster predicate prunes the cluster-partitioned codes scan (PartitionFilters); ADC scores the 32x-compressed codes; rerank reads the stored vectors from the same pruned rows",
    "l38_dedup_index_delete_persisted": "persisted fingerprint tier after add+delete: asymmetric (band,bucket) equi-join new-batch x surviving index — no index self-join; deleted ids are gone from both banding and verify sides",
    "l40_dedup_banded_persisted": "PRUNED persisted-dedup ingest: the banded scan carries the batch's own bpart set as PartitionFilters (per-batch index bytes O(batch footprint), never a full re-band); bucket-size skew stats computed over the same pruned read; verify reads fingerprints pruned to the candidates' id-hash buckets",
    "l43_vecsig_index_persisted": "PRUNED persisted vector near-dup ingest: the sigs scan carries the batch's own spart set as PartitionFilters; (table,sig) equi-join candidates; exact-cosine verify reads vectors/ pruned to the candidates' id-hash buckets — the pre-r11 gate shuffled the whole signature index per batch",
    "l41_hard_negative_mining": "exact mining path: bounded anchor batch broadcast (cosine_topk contract); one equi-join resolves pos_sim; margin filter BEFORE the per-anchor rank window, so only safe negatives are ranked",
    "l41b_hard_negative_ann_planted": "ANN-candidate mining scale path: candidates come from the hierarchical-IVF index (no corpus cross join anywhere); scoring joins only |anchors|*k_cand candidate rows; margin+rank identical to the exact path",
}


def main() -> None:
    from actuarial_reserve_modelling_spark.plans.registry import load_all
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-explain")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    sf = "/root/testdata/sf0.01"

    print("# PLANS — physical plans of the headline queries (sf0.01)\n")
    print("Generated by `python tools/explain_dump.py`. Each section notes the")
    print("property that matters at 100 TB and shows the executed plan that")
    print("exhibits it.\n")
    for name, expectation in HEADLINERS.items():
        df = registry[name].spark_fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"## {name}\n")
        print(f"**Scale property:** {expectation}\n")
        print("```")
        print(plan.strip()[:4000])
        print("```\n")


if __name__ == "__main__":
    main()
