"""Doubling-growth measurement for the round-7 operators: run each on
1x and 2x sf0.1 documents/embeddings (2x = replica with offset ids, the
same construction as tools/stress.py) and report wall seconds. A
scale-safe plan grows ≤~2x wall per doubling (amortized overheads make
<2x common); super-linear growth flags a stage that would not survive
100 TB.

Usage: python tools/growth_r7.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(thunk) -> float:
    """Times the thunk INCLUDING DataFrame construction: operators with
    eager driver-side stages (dedup_clusters' checkpointed rounds run
    when the plan is BUILT, not when it is executed) would otherwise
    leak their real cost out of the measurement."""
    t0 = time.time()
    thunk().write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from actuarial_reserve_modelling_spark.catalog import load_table
    from actuarial_reserve_modelling_spark.operators.dedup import (
        repeated_span_removal,
        segment_dedup,
    )
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ivf_cosine_pairs,
        lsh_cosine_pairs,
        semantic_dedup,
    )
    from actuarial_reserve_modelling_spark.operators.traindata import (
        dsir_importance_weights,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-growth-r7")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, sf_dir, "documents")
    docs2 = docs1.unionByName(
        docs1.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang",
                     "source", "n_chars")
    )
    emb1 = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb2 = emb1.unionByName(
        emb1.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    # warm the JVM + python workers
    docs1.agg(F.count(F.lit(1))).collect()
    timed(lambda: segment_dedup(docs1.limit(64)))

    out = {}
    for name, one, two in [
        ("segment_dedup", lambda: segment_dedup(docs1),
         lambda: segment_dedup(docs2)),
        ("repeated_span_removal", lambda: repeated_span_removal(docs1, span_words=8),
         lambda: repeated_span_removal(docs2, span_words=8)),
        ("dsir_importance_weights",
         lambda: dsir_importance_weights(
             docs1, docs1.filter(F.col("source") == "src0")),
         lambda: dsir_importance_weights(
             docs2, docs2.filter(F.col("source") == "src0"))),
        ("semantic_dedup_lsh",
         # plant the same duplicate FRACTION at both sizes (every 5th
         # vector) so 1x and 2x carry proportional pair/cluster mass —
         # without plants the 1x corpus has zero pairs at tau=0.9 and
         # the "growth" ratio compares structurally different workloads
         lambda: semantic_dedup(
             c1 := emb1.unionByName(
                 emb1.filter(F.col("vec_id") % 5 == 0).select(
                     (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")),
             pairs=lsh_cosine_pairs(c1, threshold=0.9)),
         lambda: semantic_dedup(
             c2 := emb2.unionByName(
                 emb2.filter(F.col("vec_id") % 5 == 0).select(
                     (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")),
             pairs=lsh_cosine_pairs(c2, threshold=0.9))),
        ("semantic_dedup_ivf",
         lambda: semantic_dedup(
             c1 := emb1.unionByName(
                 emb1.filter(F.col("vec_id") % 5 == 0).select(
                     (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")),
             pairs=ivf_cosine_pairs(c1, threshold=0.9, nprobe=2, n_iters=1)),
         lambda: semantic_dedup(
             c2 := emb2.unionByName(
                 emb2.filter(F.col("vec_id") % 5 == 0).select(
                     (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")),
             pairs=ivf_cosine_pairs(c2, threshold=0.9, nprobe=2, n_iters=1))),
    ]:
        s1 = timed(one)
        s2 = timed(two)
        out[name] = {"x1_sec": s1, "x2_sec": s2,
                     "growth": round(s2 / s1, 2) if s1 else None}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
