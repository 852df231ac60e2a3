"""Hard-negative mining stress (r11): run mine_hard_negatives' ANN-
candidate SCALE path at stress corpus sizes with a triple-planted
construction (positive twin + sim-1.0 decoy twin per anchor, the l41b
geometry) and verify the mined rank-1 negative is exactly the decoy
for EVERY anchor — while the brute-force path is never touched.

What the numbers mean at 100 TB: the candidate stage is a persisted
hierarchical-IVF query (probed-partition reads, zero corpus scans —
the l34 stress table's property) and mining scores only |anchors| ×
k_cand candidate pairs, so the whole pipeline is bounded by the anchor
batch, never the corpus. Brute force (the l41 exact path) is the
correctness oracle at small scale, not the production shape.

Usage: python tools/mining_stress.py [n] [n_anchors] [k_cand] [bcast_bytes]
(defaults 64000, 100, 8, unset)

``bcast_bytes``: optional spark.sql.autoBroadcastJoinThreshold override.
Passing a value SMALLER than the pos-side size (one row per anchor
pair) proves the r13-verdict fix — the candidates path carries no
forced broadcast hint, so when the anchor set exceeds the broadcast
ceiling AQE falls back to a shuffle join and the run COMPLETES instead
of OOMing on a forced broadcast (similarity.py mine_hard_negatives).
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k_cand = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    bcast_bytes = int(sys.argv[4]) if len(sys.argv) > 4 else None
    dim = 64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk_persisted,
        ivf_hier_build,
        mine_hard_negatives,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    extra = (
        {"spark.sql.autoBroadcastJoinThreshold": str(bcast_bytes)}
        if bcast_bytes is not None
        else None
    )
    spark = get_spark(extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(31)
    pts = rng.standard_normal((n, dim))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    base = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)], schema
    )
    # triple-plant every (n // n_anchors)-th vector: +10M is the
    # positive twin, +20M the decoy twin (ids clear of the corpus)
    step = max(1, n // n_anchors)
    anchors_np = np.arange(0, n, step)[:n_anchors]
    twin1 = base.filter(F.col("vec_id") % step == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    twin2 = base.filter(F.col("vec_id") % step == 0).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(twin1).unionByName(twin2).repartition(32).cache()
    n_total = corpus.count()

    # persisted ANN index over the corpus (the production candidate
    # source: build once, query per mining batch)
    path = tempfile.mkdtemp(prefix="arm_mining_stress_") + "/ann_index"
    t0 = time.time()
    index, supers = ivf_hier_build(corpus)
    persist_ann_index(index, supers, path, embeddings=corpus)
    build_sec = round(time.time() - t0, 2)

    anchors = base.filter(
        F.col("vec_id").isin([int(a) for a in anchors_np])
    ).select(
        "vec_id", "embedding", (F.col("vec_id") + 10_000_000).alias("positive_id")
    ).cache()
    anchors.count()

    # candidate stage: persisted-index query, k_cand per anchor
    t0 = time.time()
    cand = ann_ivf_hier_topk_persisted(
        spark, path, None, anchors.select("vec_id", "embedding"), k=k_cand
    ).select(
        F.col("query_id").alias("anchor_id"), F.col("neighbor_id").alias("cand_id")
    )
    mined = mine_hard_negatives(
        corpus, anchors, k=1, margin=0.0, candidates=cand
    ).collect()
    mine_sec = round(time.time() - t0, 2)

    got = {r["anchor_id"]: r for r in mined}
    exact = sum(
        1
        for a in anchors_np
        if int(a) in got
        and got[int(a)]["negative_id"] == int(a) + 20_000_000
        and got[int(a)]["neg_sim"] == 1.0
        and got[int(a)]["pos_sim"] == 1.0
    )
    print(
        json.dumps(
            {
                "n_corpus": int(n_total),
                "n_anchors": int(len(anchors_np)),
                "k_cand": k_cand,
                "bcast_bytes": bcast_bytes,
                "index_build_sec": build_sec,
                "mine_sec": mine_sec,
                "mined_rows": len(mined),
                "decoy_exact": exact,
                "all_exact": exact == len(anchors_np),
            }
        )
    )
    if exact != len(anchors_np):
        sys.exit(1)


if __name__ == "__main__":
    main()
