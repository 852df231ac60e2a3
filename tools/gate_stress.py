"""Ingest-gate stress (r11): drive the ACTUAL continuous-ingest gates
(t10 exact, t11 full near-dup) with a growing number of fixed-size
batches and record the MARGINAL per-batch cost as the persisted index
grows — the gate-level form of the operator-level acceptance curves
(tools/dedup_index_stress.py, tools/vecsig_stress.py).

With K batches of B docs each, the index behind batch k holds ~k·B
admitted docs; if per-batch cost were O(index) the marginal cost would
grow linearly with K, and total wall would be quadratic. Flat marginal
cost across doublings is the acceptance curve:

    marginal(2→4) = (T(4) − T(2)) / 2     (batches 3-4, index ~2-3 B)
    marginal(4→8) = (T(8) − T(4)) / 4     (batches 5-8, index ~4-7 B)

Each gate run uses a fresh work dir and stream cache key, so runs are
independent; admitted counts are asserted consistent across runs
(prefix property: the first 2·B docs admit identically in every run).

Usage: python tools/gate_stress.py [batch_docs] [max_doublings]
(defaults: 500 3 → runs K = 2, 4, 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 50_000
DOC_TOKENS = 30


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    doublings = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ks = [2 ** i for i in range(1, doublings + 1)]

    from pyspark.sql import functions as F

    from actuarial_reserve_modelling_spark.session import get_spark
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_ingest_dedup,
        incremental_neardup_ingest,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def synth_docs(lo: int, hi: int, salt: int):
        # ~10% of each batch duplicates an earlier doc's text (id%10==7
        # maps back to id-7's content) so the gates actually reject rows
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.expr(
                    f"transform(sequence(1, {DOC_TOKENS}), j -> concat('w', "
                    f"pmod(xxhash64({salt}, id - CASE WHEN id % 10 = 7 "
                    f"THEN 7 ELSE 0 END, j), {VOCAB})))"
                ),
                " ",
            ).alias("text"),
        )

    out = {}
    for gate_name, gate in (
        ("t10_exact", incremental_ingest_dedup),
        ("t11_full", incremental_neardup_ingest),
    ):
        runs = {}
        admitted_prefix = None
        for k in ks:
            batches = [
                synth_docs(i * batch_docs, (i + 1) * batch_docs, salt=3)
                for i in range(k)
            ]
            t0 = time.time()
            res = gate(
                spark, batches, cache_key=f"gate_stress_{gate_name}_{k}"
            )
            admitted = {
                (r["doc_id"], r["batch"])
                for r in res.select("doc_id", "batch").collect()
            }
            wall = round(time.time() - t0, 2)
            runs[k] = {"wall": wall, "admitted": len(admitted)}
            prefix = {(d, b) for d, b in admitted if b < 2}
            if admitted_prefix is None:
                admitted_prefix = prefix
            else:
                assert prefix == admitted_prefix, (
                    f"{gate_name}: first-2-batch admitted set changed at K={k}"
                )
        marginals = {}
        for lo, hi in zip(ks, ks[1:]):
            marginals[f"{lo}to{hi}"] = round(
                (runs[hi]["wall"] - runs[lo]["wall"]) / (hi - lo), 2
            )
        out[gate_name] = {
            "batch_docs": batch_docs,
            "runs": runs,
            "marginal_per_batch_sec": marginals,
        }
        print(json.dumps({gate_name: out[gate_name]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
