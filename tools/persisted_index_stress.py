"""Persisted-ANN-index stress (r9): build + persist a hierarchical
index at stress scale, then measure a query batch through (a) the
partition-PRUNED read path (``ann_ivf_hier_topk_persisted``) and
(b) a full-load query, reporting the probed/total super fraction —
the quantity that scales the per-batch index I/O at 10⁹ vectors —
plus planted-twin exactness on both paths.

On one local JVM with OS page cache the two walls are close; the
recorded evidence is the pruned fraction (bytes NOT read at scale)
and that pruning is answer-preserving at stress size, not the local
wall gap.

Usage: python tools/persisted_index_stress.py [n] [n_queries] [--clustered]
(defaults 128000, 200). ``--clustered`` draws the corpus from a
256-component Gaussian mixture (cluster std 0.15) instead of isotropic
noise — the realistic embedding-space shape where IVF cells align with
data structure, used to show the nprobe/recall curve on data the index
CAN exploit (isotropic noise is IVF's worst case and bounds recall@10
far below 1 regardless of probes).
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    clustered = "--clustered" in sys.argv
    n = int(args[0]) if args else 128_000
    n_q = int(args[1]) if len(args) > 1 else 200
    dim = 64

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk_indexed,
        ann_ivf_hier_topk_persisted,
        ivf_assign,
        ivf_hier_build,
        load_ann_index,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(19)
    if clustered:
        centers = rng.standard_normal((256, dim))
        assign = rng.integers(0, 256, size=n)
        pts = centers[assign] + 0.15 * rng.standard_normal((n, dim))
    else:
        pts = rng.standard_normal((n, dim))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)], schema
    ).repartition(32).localCheckpoint()
    src = list(range(0, n, max(1, n // n_q)))[:n_q]
    queries = emb.filter(
        F.col("vec_id").isin(src)
    ).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(queries).localCheckpoint()

    t0 = time.time()
    index, super_cent = ivf_hier_build(corpus)
    index.count()
    t_build = time.time() - t0
    d = tempfile.mkdtemp(prefix="arm_idx_stress_") + "/idx"
    t0 = time.time()
    # r10: vector-bearing layout — queries below pass embeddings=None,
    # so the per-batch cost is the probed index fraction and ZERO
    # corpus reads (the r9 verdict's scale-softness, closed)
    persist_ann_index(index, super_cent, d, embeddings=corpus)
    t_persist = time.time() - t0
    k1 = len(super_cent)

    nprobe_super = 4
    probes = ivf_assign(queries, super_cent, nprobe=nprobe_super)
    probed = probes.select("cluster").distinct().count()

    t0 = time.time()
    res_pruned = {
        tuple(r)
        for r in ann_ivf_hier_topk_persisted(
            spark, d, None, queries, k=1, nprobe_super=nprobe_super
        ).collect()
    }
    t_pruned = time.time() - t0

    t0 = time.time()
    full_index, full_cent = load_ann_index(spark, d)
    res_full = {
        tuple(r)
        for r in ann_ivf_hier_topk_indexed(
            full_index, full_cent, None, queries, k=1, nprobe_super=nprobe_super
        ).collect()
    }
    t_full = time.time() - t0

    want = {(s + 10_000_000, s, 1, 1.0) for s in src}

    # incremental ingest at scale: add a 25%-of-corpus batch (twins of
    # every 4th corpus vector so routing correctness is checkable),
    # then verify a sample of second twins retrieves (source, added)
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ann_index,
    )

    add_src = list(range(0, n, 4))
    batch = emb.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.time()
    add_to_ann_index(spark, d, batch)
    t_add = time.time() - t0
    # sample sources NOT in the first planted set (those already have a
    # +10M twin indexed, which would take the rank-2 slot at sim 1.0)
    step1 = max(1, n // n_q)
    clean = [s for s in add_src if s % step1 != 0]
    sample = clean[:: max(1, len(clean) // 50)][:50]
    q2 = emb.filter(F.col("vec_id").isin(sample)).select(
        (F.col("vec_id") + 30_000_000).alias("vec_id"), "embedding"
    )
    res_add = {
        tuple(r)
        for r in ann_ivf_hier_topk_persisted(
            spark, d, None, q2, k=2, nprobe_super=nprobe_super
        ).collect()
    }
    want_add = {(s + 30_000_000, s, 1, 1.0) for s in sample} | {
        (s + 30_000_000, s + 20_000_000, 2, 1.0) for s in sample
    }

    print(
        json.dumps(
            {
                "n_vectors": n + len(src),
                "n_queries": len(src),
                "k1_supers": k1,
                "probed_supers": probed,
                "pruned_fraction": round(probed / k1, 4),
                "build_sec": round(t_build, 2),
                "persist_sec": round(t_persist, 2),
                "query_pruned_sec": round(t_pruned, 2),
                "query_full_load_sec": round(t_full, 2),
                "pruned_equals_full": res_pruned == res_full,
                "twins_exact": res_pruned == want,
                "add_batch_rows": len(add_src),
                "add_sec": round(t_add, 2),
                "add_twins_exact": res_add == want_add,
                "corpus_free_queries": True,
            }
        ),
        flush=True,
    )

    # --- nprobe sensitivity (r12, VERDICT r11 task 7): recall@10 vs
    # nprobe_super in {1, 2, 4, 8} against the EXACT brute-force
    # neighbors, plus the planted-top1 floor at every setting — pins
    # the recall/latency trade before anyone turns nprobe down for
    # speed. Uses the ORIGINAL persisted layout semantics: corpus now
    # also holds the +20M add-batch twins, so ground truth is computed
    # over the post-add corpus the index actually serves.
    from actuarial_reserve_modelling_spark.operators.similarity import cosine_topk

    served = corpus.unionByName(batch)
    t0 = time.time()
    truth: dict[int, set[int]] = {}
    for r in cosine_topk(served, queries, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    t_brute = time.time() - t0
    curve = []
    for p in (1, 2, 4, 8):
        t0 = time.time()
        rows = ann_ivf_hier_topk_persisted(
            spark, d, None, queries, k=10, nprobe_super=p
        ).collect()
        t_q = time.time() - t0
        got: dict[int, set[int]] = {}
        top1: dict[int, tuple] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            if r["rank"] == 1:
                top1[r["query_id"]] = (r["neighbor_id"], r["sim"])
        recall = sum(
            len(got.get(q, set()) & t10) / len(t10) for q, t10 in truth.items()
        ) / max(1, len(truth))
        floor = all(
            top1.get(s + 10_000_000) == (s, 1.0) for s in src
        )
        curve.append(
            {
                "nprobe_super": p,
                "recall_at_10": round(recall, 4),
                "planted_top1_floor": floor,
                "query_sec": round(t_q, 2),
            }
        )
        print(json.dumps(curve[-1]), flush=True)
    print(
        json.dumps({"brute_force_sec": round(t_brute, 2), "nprobe_curve": curve})
    )


if __name__ == "__main__":
    main()
