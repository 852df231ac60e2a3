"""Targeted ANN recall-vs-growth stress (VERDICT r5 task 2 'done'
check): replicate tools/stress.py section 7 — the replicated-and-
perturbed embeddings corpus — at a given multiplier, and measure
recall@5 for the IVF family at auto (√n) settings vs fixed settings.

Usage: python tools/ann_recall_stress.py [mult] [paths...]
  mult: replication factor (128 → 256k vectors on sf0.1's 2k base)
  paths: which to run, subset of {ivf_auto, ivfpq_auto, ivf_fixed,
         ivfpq_fixed}; default all.
Prints one JSON line per path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = set(sys.argv[2:]) or {"ivf_auto", "ivfpq_auto", "ivf_fixed", "ivfpq_fixed"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from actuarial_reserve_modelling_spark.catalog import load_table
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
        cosine_topk,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="ann-recall-stress")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    repse = spark.range(mult).select(F.col("id").alias("rep"))
    # same corpus construction as tools/stress.py section 7
    big_emb = (
        emb.crossJoin(repse)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("rep") % 7).cast("double") * (i % 5).cast("double") / 500.0,
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    ne = big_emb.count()
    queries = big_emb.filter(
        ((F.col("vec_id") % 10_000_000) % 211 == 3) & (F.col("vec_id") < 4 * 10_000_000)
    ).localCheckpoint(eager=True)
    nq = queries.count()
    k = 5
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(big_emb, queries, k=k).collect()
    }

    paths = {
        "ivf_auto": lambda: ann_ivf_topk(
            big_emb, queries, k=k, n_centroids="auto", nprobe="auto"
        ),
        "ivfpq_auto": lambda: ann_ivfpq_topk(
            big_emb, queries, k=k, n_centroids="auto", nprobe="auto", rerank="auto"
        ),
        "ivf_fixed": lambda: ann_ivf_topk(big_emb, queries, k=k, n_centroids=32, nprobe=8),
        "ivfpq_fixed": lambda: ann_ivfpq_topk(
            big_emb, queries, k=k, n_centroids=32, nprobe=8, rerank=8
        ),
    }
    for name, fn in paths.items():
        if name not in which:
            continue
        t0 = time.time()
        got = {(r["query_id"], r["neighbor_id"]) for r in fn().collect()}
        print(
            json.dumps(
                {
                    "path": name,
                    "vectors": ne,
                    "queries": nq,
                    "recall_at_k": round(len(exact & got) / max(len(exact), 1), 3),
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
