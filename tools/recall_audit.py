"""Sampled recall self-audit of a persisted ANN tier (r13, VERDICT r12
task 4): where tools/persisted_index_stress.py measured recall OFFLINE
(ground truth recomputed from the raw vectors it happened to still
hold), this audits the TIER ITSELF through the shipped operator
``ann_index_recall_audit`` — sampled stored vectors, pruned index
answers vs a bounded exact scan, per-query recall@k and the probe
histogram — i.e. exactly what a production user can run against their
own corpus without any side data.

Prints one JSON line per (shape, nprobe_super) cell:
  {"shape": "isotropic"|"clustered", "n": N, "nprobe_super": p,
   "recall_mean": r, "recall_p10": ..., "recall_p50": ..., "planted_recall": 1.0,
   "probe_hist": {...}, "audit_wall_sec": s}

Usage: python tools/recall_audit.py [n] [n_sample] [k]
(defaults 128000, 200, 10; runs both shapes × nprobe 1,2,4,8).
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
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dim = 64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_index_recall_audit,
        ivf_hier_build,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    for shape in ("isotropic", "clustered"):
        rng = np.random.default_rng(19)
        if shape == "clustered":
            centers = rng.standard_normal((256, dim))
            assign = rng.integers(0, 256, size=n)
            pts = centers[assign] + 0.15 * rng.standard_normal((n, dim))
        else:
            pts = rng.standard_normal((n, dim))
        emb = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(pts)], schema
        ).repartition(32).localCheckpoint()
        # planted twins of every 1000th vector: the exactness floor the
        # audit must report at 1.0 regardless of shape or nprobe
        twins = emb.filter(F.col("vec_id") % 1000 == 0).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        corpus = emb.unionByName(twins).localCheckpoint()
        path = tempfile.mkdtemp(prefix=f"arm_recall_audit_{shape}_") + "/ann_index"
        t0 = time.time()
        index, super_cent = ivf_hier_build(corpus)
        persist_ann_index(index, super_cent, path, embeddings=corpus)
        build_sec = round(time.time() - t0, 1)

        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            rows = ann_index_recall_audit(
                spark, path, n_sample=n_sample, k=k, nprobe_super=nprobe
            ).collect()
            wall = round(time.time() - t0, 1)
            rec = np.array(
                [r["recall_at_k"] for r in rows if r["recall_at_k"] is not None]
            )
            hist: dict[int, int] = {}
            for r in rows:
                hist[r["n_probed_supers"]] = hist.get(r["n_probed_supers"], 0) + 1
            t0 = time.time()
            planted = ann_index_recall_audit(
                spark, path, k=1, nprobe_super=nprobe,
                queries=corpus.filter(F.col("vec_id") >= 10_000_000),
            ).agg(
                F.min("recall_at_k").alias("mn"), F.avg("recall_at_k").alias("av")
            ).first()
            print(
                json.dumps(
                    {
                        "shape": shape,
                        "n": n,
                        "n_sample": n_sample,
                        "k": k,
                        "nprobe_super": nprobe,
                        "build_sec": build_sec,
                        "recall_mean": round(float(rec.mean()), 4),
                        "recall_p10": round(float(np.percentile(rec, 10)), 4),
                        "recall_p50": round(float(np.percentile(rec, 50)), 4),
                        "recall_p90": round(float(np.percentile(rec, 90)), 4),
                        "planted_recall_min": float(planted["mn"]),
                        "planted_recall_mean": round(float(planted["av"]), 4),
                        "probe_hist": {str(kk): v for kk, v in sorted(hist.items())},
                        "audit_wall_sec": wall,
                        "planted_wall_sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
