"""Recall-at-scale stress for the blocked PAIR stages (the l27b/l27c
scale paths): plant perturbed near-duplicate pairs with KNOWN exact
cosines in a corpus ~50-100x the bench's vector count, run
lsh_cosine_pairs and ivf_cosine_pairs at tau=0.9, and report recall
against the planted ground truth plus wall seconds.

Ground truth needs no all-pairs oracle: each planted pair's cosine is
computed exactly in numpy at construction (O(n) verifies), random
64-d vectors have pairwise cosine far below 0.9 with overwhelming
probability at these sizes, and both operators verify exactly — so
found∩planted / planted IS the recall and false positives are
impossible by construction.

Usage: python tools/pair_recall_stress.py [n_base] [only] [dup_frac]
(defaults 50000, both paths, 0.0). NOTE: ``dup_frac`` > 0 runs the
IVF duplicate-skew band EXCLUSIVELY and returns — ``only`` has no
effect on that band (it is IVF-only by construction); pass
``dup_frac`` = 0 to run the LSH/IVF baseline bands the ``only``
selector filters. ``dup_frac`` > 0 additionally makes
that fraction of the corpus EXACT duplicates — spread over 100 source
vectors, the r9 duplicate-skew band (VERDICT r8 task #2): the digest
collapse must keep recall at 1.0 on the planted near-dup pairs, the
in-kernel group-cap assert must stay quiet, every intra-group sim-1.0
pair must be emitted (counted against the closed form), and the wall
should BEAT the duplicate-free run at equal corpus size (the quantizer
only sees the distinct reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    # optional path filter ("lsh" / "ivf"): at >=220k UNIFORM vectors the
    # LSH path's quadratic candidate mass spills past this box's disk
    # (the docstring's domain statement made concrete) — the IVF path
    # must stay runnable standalone at the sizes that prove its scaling
    only = sys.argv[2] if len(sys.argv) > 2 else None
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    if dup_frac > 0 and only not in (None, "ivf"):
        print(
            "note: dup_frac > 0 runs the IVF dup band exclusively; "
            f"'only={only}' is ignored (see usage)",
            file=sys.stderr,
        )
    dim = 64
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_base, dim))
    # every 10th vector gets a perturbed copy; noise sized so cosines
    # land around 0.93-0.99 (ground truth keeps only pairs >= tau)
    src_idx = np.arange(0, n_base, 10)
    noise = rng.standard_normal((len(src_idx), dim)) * 0.25
    dup = base[src_idx] + noise
    a, b = base[src_idx], dup
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    tau = 0.9
    truth_mask = np.round(cos, 6) >= tau
    truth = {
        (int(i), int(n_base + k))
        for k, i in enumerate(src_idx)
        if truth_mask[k]
    }

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.operators.similarity import (
        ivf_cosine_pairs,
        lsh_cosine_pairs,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="pair-recall-stress")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [
        (int(n_base + k), [float(x) for x in v]) for k, v in enumerate(dup)
    ]
    # r9 duplicate-skew band: dup_frac of the corpus as EXACT copies of
    # the first 100 base vectors (hot groups of ~n_dup/100 identical
    # members each — the shape that defeated the r8 quantizer)
    n_exact = int(dup_frac * n_base)
    if n_exact:
        rows += [
            (int(10_000_000 + j), [float(x) for x in base[j % 100]])
            for j in range(n_exact)
        ]
    emb = spark.createDataFrame(rows, schema).repartition(32).cache()
    n_total = emb.count()

    out = {
        "n_vectors": n_total,
        "n_true_pairs": len(truth),
        "tau": tau,
        "dup_frac": dup_frac,
    }
    if n_exact:
        # closed-form count of the exact-duplicate pairs the contract
        # owes: per source group g = 1 (source) + its copies
        sizes = [1 + n_exact // 100 + (1 if j < n_exact % 100 else 0) for j in range(100)]
        expected_sim1 = sum(g * (g - 1) // 2 for g in sizes)
        t0 = time.time()
        pairs = ivf_cosine_pairs(emb, threshold=tau, nprobe=4, n_iters=1)
        pairs = pairs.persist()
        n_found = pairs.count()
        n_sim1 = pairs.filter(F.col("sim") >= 0.9999995).count()
        truth_df = spark.createDataFrame(
            [(a, b) for a, b in truth], "v1 long, v2 long"
        )
        n_hit = pairs.join(F.broadcast(truth_df), ["v1", "v2"], "left_semi").count()
        dt = round(time.time() - t0, 2)
        pairs.unpersist()
        out["ivf_cosine_pairs_dup"] = {
            "sec": dt,
            "found": n_found,
            "recall_vs_planted": round(n_hit / len(truth), 4),
            "sim1_pairs": n_sim1,
            "sim1_expected": expected_sim1,
            "sim1_exact": n_sim1 == expected_sim1,
        }
        print(json.dumps(out))
        return
    for name, fn in (
        ("lsh_cosine_pairs", lambda: lsh_cosine_pairs(emb, threshold=tau)),
        (
            "ivf_cosine_pairs",
            lambda: ivf_cosine_pairs(emb, threshold=tau, nprobe=4, n_iters=1),
        ),
    ):
        if only and only not in name:
            continue
        t0 = time.time()
        found = {(r["v1"], r["v2"]) for r in fn().collect()}
        dt = round(time.time() - t0, 2)
        extra = found - truth  # non-planted pairs that genuinely verify
        recall = round(len(found & truth) / len(truth), 4) if truth else None
        out[name] = {
            "sec": dt,
            "found": len(found),
            "recall_vs_planted": recall,
            "non_planted_verified": len(extra),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
