"""Persisted-IVFPQ stress (r10): build + persist the IVF-PQ index at
stress scale, measure the pruned ADC query path and incremental
encode-and-append, and verify planted-twin exactness end to end —
the PQ-tier companion of tools/persisted_index_stress.py.

What the numbers mean at 100 TB: the ADC scan side is the codes table
(m small ints per vector — 32× smaller than raw vectors) filtered to
the probed clusters (PartitionFilters on the cluster-partitioned
layout), the rerank reads the stored vectors from the SAME pruned rows
(zero corpus files), and an add encodes only the batch with the
persisted codebooks — no retraining, no rebuild.

Usage: python tools/ivfpq_stress.py [n] [n_queries]
(defaults 128000, 50)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dim = 64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ivfpq_index,
        ann_ivfpq_topk_persisted,
        persist_ivfpq_index,
        resolve_n_centroids,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(23)
    pts = rng.standard_normal((n, dim))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    emb = (
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(pts)], schema
        )
        .repartition(32)
        .localCheckpoint()
    )

    d = tempfile.mkdtemp(prefix="arm_ivfpq_stress_") + "/idx"
    n_cent = resolve_n_centroids(emb, "auto")
    nprobe = max(8, n_cent // 8)
    t0 = time.time()
    persist_ivfpq_index(emb, d, n_centroids=n_cent, m_subspaces=8, n_codes=16)
    t_persist = time.time() - t0

    # incremental ingest: a 25% batch of exact twins of every 4th vector
    batch = emb.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.time()
    add_to_ivfpq_index(spark, d, batch)
    t_add = time.time() - t0

    # query: second twins of a 50-source sample; rank 1 must be the
    # original source, rank 2 the added twin, both at sim 1.0
    src = list(range(0, n, 4))[:: max(1, (n // 4) // n_q)][:n_q]
    queries = emb.filter(F.col("vec_id").isin(src)).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.time()
    got = {
        tuple(r)
        for r in ann_ivfpq_topk_persisted(
            spark, d, None, queries, k=2, nprobe=nprobe, rerank=32
        ).collect()
    }
    t_query = time.time() - t0
    want = {(s + 20_000_000, s, 1, 1.0) for s in src} | {
        (s + 20_000_000, s + 10_000_000, 2, 1.0) for s in src
    }

    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_centroids": n_cent,
                "nprobe": nprobe,
                "probed_fraction": round(nprobe / n_cent, 4),
                "n_queries": len(src),
                "persist_sec": round(t_persist, 2),
                "add_batch_rows": n // 4,
                "add_sec": round(t_add, 2),
                "query_sec": round(t_query, 2),
                "twins_exact": got == want,
                "corpus_free_query": True,
            }
        )
    )


if __name__ == "__main__":
    main()
