"""Build+query cost scaling for the ANN top-k quantizers: FLAT
(ann_ivf_topk, sqrt-n centroids driver-trained) vs HIERARCHICAL
(ann_ivf_hier_topk, n^(1/4) supers + executor-trained children) at
doubling corpus sizes, same probe budget shape. Planted exact twins
are the correctness floor: BOTH paths must retrieve every twin at
rank 1 (probability-1 by construction), so `twin_top1` below is a
gate, not a recall estimate; wall seconds are the comparison. FLOP
model: flat build is O(n^1.5*d) per k-means pass; hierarchical is
O(n^(5/4)*d) — the gap widens ~x1.19 per doubling.

Usage: python tools/ann_hier_cost.py [sizes...] (default 50000 100000 200000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 100_000, 200_000]
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk,
        ann_ivf_topk,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="ann-hier-cost")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    out = []
    for n in sizes:
        rng = np.random.default_rng(7)
        base = rng.standard_normal((n, 64))
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in enumerate(base)], schema
        ).repartition(32).cache()
        emb.count()
        twins = emb.filter(F.col("vec_id") % 500 == 0).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        corpus = emb.unionByName(twins)
        n_queries = len(range(0, n, 500))
        row = {"n_vectors": n, "n_twin_queries": n_queries}
        for name, fn in (
            (
                "flat",
                lambda: ann_ivf_topk(
                    corpus, twins, k=1, n_centroids="auto", nprobe=8
                ),
            ),
            ("hierarchical", lambda: ann_ivf_hier_topk(corpus, twins, k=1)),
        ):
            t0 = time.time()
            got = {
                r["query_id"]: (r["neighbor_id"], r["sim"]) for r in fn().collect()
            }
            sec = round(time.time() - t0, 2)
            ok = all(
                got.get(10_000_000 + s) == (s, 1.0) for s in range(0, n, 500)
            )
            row[name] = {"sec": sec, "twin_top1": ok}
        emb.unpersist()
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"table": out}))


if __name__ == "__main__":
    main()
