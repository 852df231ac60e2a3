"""Scale-stress sanity: run the heavy operators on inputs 10-60× larger
than sf0.1 (derived deterministically from the driver tables — no
external data) and report throughput. This is the "would the plan
survive a scale-up" check: linear-ish wall-time growth and no OOM/spill
collapse.

Usage: python tools/stress.py [multiplier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from actuarial_reserve_modelling_spark.catalog import load_table, synthetic_portfolio
    from actuarial_reserve_modelling_spark.functions.reserves import simulate_reserves
    from actuarial_reserve_modelling_spark.operators.dedup import minhash_near_dup_pairs
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # 1) reserve kernel on mult× the portfolio (unique ids per replica —
    #    same per-row cost profile as a genuinely bigger book)
    base = synthetic_portfolio(load_table(spark, sf_dir, "customer"))
    replicas = spark.range(mult).select(F.col("id").alias("rep"))
    big = base.crossJoin(replicas).select(
        F.concat_ws("_", "id", "rep").alias("id"), "term"
    )
    n_policies = big.count()
    # warm the python workers before timing
    simulate_reserves(big.limit(64), n_trials=10).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    simulate_reserves(big, n_trials=10_000).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["reserve_kernel"] = {
        "rows": n_policies,
        "sec": round(dt, 2),
        "policies_per_sec": round(n_policies / dt),
    }

    # 2) minhash signatures + LSH + verify on 4× documents (unique ids)
    docs = load_table(spark, sf_dir, "documents")
    reps = spark.range(4).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )
    n_docs = big_docs.count()
    t0 = time.time()
    n_pairs = minhash_near_dup_pairs(
        big_docs, threshold=0.95, bands=16, rows_per_band=12
    ).count()
    dt = time.time() - t0
    out["minhash_dedup"] = {
        "docs": n_docs,
        "pairs": n_pairs,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt),
    }

    # 3) large-star/small-star connected components over the full
    #    near-dup pair graph of the replicated corpus — convergence
    #    rounds must stay logarithmic as the graph grows
    from actuarial_reserve_modelling_spark.operators.dedup import dedup_clusters

    pairs = (
        minhash_near_dup_pairs(big_docs, threshold=0.95, bands=16, rows_per_band=12)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    labels = dedup_clusters(pairs)
    n_vertices = labels.count()
    n_components = labels.select("rep_id").distinct().count()
    dt = time.time() - t0
    out["dedup_clusters"] = {
        "pairs": n_pairs,
        "vertices": n_vertices,
        "components": n_components,
        "sec": round(dt, 2),
    }

    print(json.dumps({"multiplier": mult, "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
