"""Assignment-cost scaling for ivf_cosine_pairs' coarse quantizer:
FLAT (single-level, k = n//16 centroids — the pre-r8 auto path) vs
HIERARCHICAL (two-level auto path, r8+) on the pair_recall_stress
corpus construction at doubling sizes. Reports wall seconds for the
full pair stage plus recall vs the planted ground truth, so the table
shows BOTH that the hierarchy is sub-quadratic and that it pays no
recall for it. FLOP model for context: flat assignment is
O(n * (n/16) * d) — ~4x work per doubling — while hierarchical is
O(n * sqrt(n/16) * d) — ~2.8x per doubling; wall times track those
slopes once assignment dominates.

Usage: python tools/ivf_hier_cost.py [sizes...] (default 50000 100000 200000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def planted_corpus(spark, n_base: int, dim: int = 64):
    """Same construction as tools/pair_recall_stress.py: every 10th
    vector gets a perturbed near-duplicate with exactly-known cosine."""
    from pyspark.sql import types as T

    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_base, dim))
    src_idx = np.arange(0, n_base, 10)
    noise = rng.standard_normal((len(src_idx), dim)) * 0.25
    dup = base[src_idx] + noise
    a, b = base[src_idx], dup
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    truth = {
        (int(i), int(n_base + k))
        for k, i in enumerate(src_idx)
        if np.round(cos[k], 6) >= 0.9
    }
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(int(n_base + k), [float(x) for x in v]) for k, v in enumerate(dup)]
    emb = spark.createDataFrame(rows, schema).repartition(32).cache()
    emb.count()
    return emb, truth


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 100_000, 200_000]
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ivf_cosine_pairs,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="ivf-hier-cost")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n_base in sizes:
        emb, truth = planted_corpus(spark, n_base)
        n = n_base + n_base // 10
        row = {"n_vectors": n, "n_true_pairs": len(truth)}
        for name, kwargs in (
            ("flat", {"n_centroids": max(16, n // 16)}),
            ("hierarchical", {"n_centroids": "auto"}),
        ):
            t0 = time.time()
            found = {
                (r["v1"], r["v2"])
                for r in ivf_cosine_pairs(
                    emb, threshold=0.9, nprobe=4, n_iters=1, **kwargs
                ).collect()
            }
            row[name] = {
                "sec": round(time.time() - t0, 2),
                "recall": round(len(found & truth) / len(truth), 4),
            }
        emb.unpersist()
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"table": out}))


if __name__ == "__main__":
    main()
