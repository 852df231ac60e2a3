"""Scale-smell audit: render every registry query's physical plan and
flag constructs that do not survive a 100 TB scale-up, minus a reviewed
allowlist of intentional uses.

Smells checked:

* ``BatchEvalPython``  — row-at-a-time Python UDF in the plan (the slow
  path; kernels must be Arrow-vectorized ``ArrowEvalPython`` /
  ``MapInPandas``).
* ``CartesianProduct`` — unbounded cross product without a broadcast
  side; at scale this is a job-killer. (None allowed.)
* ``BroadcastNestedLoopJoin`` — acceptable only when one side is
  provably tiny (dims, one-row scalar aggregates, bounded query sets);
  every allowed instance is justified below.

Exit code 1 if an unreviewed smell appears — run in CI next to the
oracle gate.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin")

# name -> (smell, why it is fine here)
ALLOWED: dict[str, tuple[str, str]] = {
    "j6_cross_join": (
        "BroadcastNestedLoopJoin",
        "cross join of two broadcast-sized dims is the operator itself",
    ),
    "l3_cosine_topk": (
        "BroadcastNestedLoopJoin",
        "brute-force exact baseline: bounded query set broadcast against the corpus",
    ),
    "l4_cosine_pairs": (
        "BroadcastNestedLoopJoin",
        "exact all-pairs baseline on the (bounded) embeddings table; ANN is the scale path",
    ),
    "a13_bloom_filter": (
        "BroadcastNestedLoopJoin",
        "one-row bloom-filter aggregate broadcast to the probe side",
    ),
    "q20_excess_shipments": (
        "BroadcastNestedLoopJoin",
        "one-row total-quantity scalar broadcast (decorrelated Q20 threshold)",
    ),
    "q22_global_sales_opportunity": (
        "BroadcastNestedLoopJoin",
        "one-row global-average scalar broadcast (Q22 decorrelation)",
    ),
    "l5h_tfidf": (
        "BroadcastNestedLoopJoin",
        "one-row corpus-size scalar broadcast into the IDF expression",
    ),
    "l5i_bm25": (
        "BroadcastNestedLoopJoin",
        "one-row (N, avgdl) scalar broadcast into the BM25 expression",
    ),
    "u4b_python_udtf": (
        "BatchEvalPython",
        "Python UDTFs are row-based by API definition; surface-coverage row, not a hot path",
    ),
    "l11_rag_index_search": (
        "BroadcastNestedLoopJoin",
        "brute-force exact search with a 5-chunk query set broadcast; IVF/LSH are the scale path",
    ),
    "u1c_reserve_risk_measures": (
        "BroadcastNestedLoopJoin",
        "one-row VaR-quantile scalar broadcast into the tail filter",
    ),
}

# streaming plans need a query start, not a batch explain
SKIP = {
    "t1_stream_batch_equivalence",
    "t2_tumbling_window",
    "t3_sliding_window",
    "t4_session_window",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from actuarial_reserve_modelling_spark.plans.registry import load_all
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bad: list[str] = []
    for name, q in sorted(registry.items()):
        if name in SKIP:
            continue
        plan = q.spark_fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        for smell in SMELLS:
            if smell not in plan:
                continue
            allowed = ALLOWED.get(name)
            if allowed and allowed[0] == smell:
                print(f"ALLOW {name}: {smell} — {allowed[1]}")
            else:
                bad.append(f"{name}: {smell}")
    for b in bad:
        print("SMELL", b)
    print(f"{len(registry) - len(SKIP)} plans audited, {len(bad)} unreviewed smells")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
