"""Curation-tail scale stress (r12, VERDICT r11 task 6): run
``temperature_mix_weights`` → ``epoch_repetition_plan`` on a corpus
replicated far past sf0.1 (default 10M+ docs) and record wall, output
rows/s, the per-domain E[repeats] = weight pin at scale (both
upsampled w > 1 and downsampled w < 1 domains), and bit-identical
determinism across two runs.

The operators' scale claims under test: the mixture weights are one
|domains|-row hash aggregate + two broadcast scalars; the repetition
plan is a broadcast join + codegen explode with ZERO shuffles, so wall
should grow linearly in corpus rows and the expansion should stream —
no driver collect, no skew pivot.

Doc synthesis: each replica re-keys doc_id (unique ids ⇒ fresh md5
draws, the real stochastic-rounding profile) but keeps the text and a
synthetic heavy-tailed domain mix (80/12/5/2/1 percent across five
domains at alpha=0.3 ⇒ head weight < 1, tail weights > 1).

Usage: python tools/curation_tail_stress.py [n_docs]   (default 10_000_000)
Prints one JSON line per phase + a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from actuarial_reserve_modelling_spark.operators.traindata import (
        epoch_repetition_plan,
        temperature_mix_weights,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-curation-tail-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic corpus: heavy-tailed 5-domain mix, ~24-token docs whose
    # token counts vary by domain so token shares differ from doc shares
    dom = (
        F.when(F.col("id") % 100 < 80, F.lit("head"))
        .when(F.col("id") % 100 < 92, F.lit("mid1"))
        .when(F.col("id") % 100 < 97, F.lit("mid2"))
        .when(F.col("id") % 100 < 99, F.lit("tail1"))
        .otherwise(F.lit("tail2"))
    )
    n_tok = (F.lit(12) + F.pmod(F.xxhash64("id"), F.lit(24))).cast("int")
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            dom.alias("lang"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), n_tok), lambda i: F.concat(F.lit("w"), i)),
                " ",
            ).alias("text"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(json.dumps({"corpus_docs": n_docs, "partitions": 64}), flush=True)

    t0 = time.time()
    weights = temperature_mix_weights(docs, alpha=0.3, domain_col="lang")
    wrows = {r["domain"]: r for r in weights.collect()}
    t_weights = time.time() - t0
    print(
        json.dumps(
            {
                "weights_sec": round(t_weights, 2),
                "weights": {d: wrows[d]["weight"] for d in sorted(wrows)},
            }
        ),
        flush=True,
    )
    has_up = any(r["weight"] > 1.0 for r in wrows.values())
    has_down = any(0.0 < r["weight"] < 1.0 for r in wrows.values())
    assert has_up and has_down, "stress needs both w>1 and w<1 domains"

    t0 = time.time()
    plan = epoch_repetition_plan(docs, weights, domain_col="lang")
    # count + per-domain aggregate in ONE pass over the expansion
    agg = {
        r["domain"]: r
        for r in plan.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    t_plan = time.time() - t0
    total_rows = sum(int(r["n_rows"]) for r in agg.values())
    per_dom_docs = {
        r["domain"]: int(r["n_docs"])
        for r in docs.groupBy(F.col("lang").alias("domain"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .collect()
    }
    epins = {}
    for d in sorted(wrows):
        w = wrows[d]["weight"]
        realized = agg.get(d, {"n_rows": 0})["n_rows"] / per_dom_docs[d] if d in agg else 0.0
        # Bernoulli tail: realized repeats/doc within 4 sigma of w
        import math

        frac = w - math.floor(w)
        sigma = (
            math.sqrt(frac * (1 - frac) / per_dom_docs[d])
            if 0 < frac < 1
            else 0.0
        )
        epins[d] = {
            "weight": w,
            "realized": round(realized, 6),
            "ok": abs(realized - w) <= max(4 * sigma, 1e-9),
        }
    print(
        json.dumps(
            {
                "plan_sec": round(t_plan, 2),
                "plan_rows": total_rows,
                "rows_per_sec": int(total_rows / t_plan),
                "e_repeats_pins": epins,
            }
        ),
        flush=True,
    )

    # determinism: a second run over a REPARTITIONED input must produce
    # the identical multiset of (doc_id, rep_idx) rows
    t0 = time.time()
    again = epoch_repetition_plan(docs.repartition(17), weights, domain_col="lang")
    # order-insensitive multiset signature; bit_xor + count cannot
    # overflow (an ANSI sum of 10M xxhash64 longs does)
    sig = plan.select(
        F.expr("bit_xor(xxhash64(doc_id, rep_idx))").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    sig2 = again.select(
        F.expr("bit_xor(xxhash64(doc_id, rep_idx))").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    t_det = time.time() - t0
    deterministic = (sig["s"], sig["n"]) == (sig2["s"], sig2["n"])
    summary = {
        "corpus_docs": n_docs,
        "weights_sec": round(t_weights, 2),
        "plan_sec": round(t_plan, 2),
        "plan_rows": total_rows,
        "rows_per_sec": int(total_rows / t_plan),
        "e_repeats_all_ok": all(v["ok"] for v in epins.values()),
        "deterministic_across_runs": deterministic,
        "determinism_check_sec": round(t_det, 2),
    }
    print(json.dumps(summary), flush=True)
    assert summary["e_repeats_all_ok"] and deterministic


if __name__ == "__main__":
    main()
