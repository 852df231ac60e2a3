"""End-to-end curation pipeline (l45) scale stress (r14, VERDICT r13
task 8): the per-stage gate marginals are pinned (ARM_GATE_TIMING,
growth_r7), but the COMPOSED l45 chain — clean → exact+near-dup dedup
gate → decontaminate → temperature mix → epoch plan → shard shuffle —
had only been run at sf0.1 (5k docs). This derives 1×/2×/4× corpora
from sf0.1 documents (re-keyed doc_ids, per-replica text perturbation
so replicas are distinct documents rather than exact duplicates — the
tools/stress.py construction) into temp sf dirs and runs the REGISTRY
l45 builder on each, so the measured chain is byte-identical to the
oracle-checked one.

What linear marginals prove at 100 TB: every stage claims map-side or
banded/broadcast plans with no cross-stage shuffle amplification; a
super-linear wall per doubling would flag an inter-stage contract
(e.g. the dedup gate's pair graph or the shard window) quietly going
quadratic when composed.

Usage: python tools/curation_pipeline_stress.py [mults...] (default 1 2 4)
Prints one JSON line per scale + a summary line with per-doubling
ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from actuarial_reserve_modelling_spark.catalog import load_table
    from actuarial_reserve_modelling_spark.plans.registry import load_all
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-curation-pipeline-stress")
    spark.sparkContext.setLogLevel("ERROR")
    l45 = load_all()["l45_curation_pipeline"].spark_fn

    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()
    work = tempfile.mkdtemp(prefix="arm_l45_stress_")
    results = []
    try:
        for mult in mults:
            scale_dir = os.path.join(work, f"x{mult}")
            os.makedirs(scale_dir, exist_ok=True)
            reps = spark.range(mult).select(F.col("id").alias("rep"))
            # unique doc_ids per replica; text perturbed per replica so
            # cross-replica rows are DISTINCT documents (replicating
            # text verbatim would let the exact-dedup stage collapse
            # the corpus back to 1x and flatten the measurement)
            big = base.crossJoin(reps).select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text"))
                .otherwise(
                    F.concat_ws(" ", "text", F.concat(F.lit("zz"), F.col("rep")))
                )
                .alias("text"),
                *[c for c in base.columns if c not in ("doc_id", "text")],
            )
            big.repartition(32).write.mode("overwrite").parquet(
                os.path.join(scale_dir, "documents.parquet")
            )
            t0 = time.time()
            out_rows = l45(spark, scale_dir).count()
            wall = round(time.time() - t0, 2)
            rec = {
                "mult": mult,
                "n_docs": n_base * mult,
                "out_rows": int(out_rows),
                "wall_sec": wall,
                "rows_per_sec": round(n_base * mult / wall, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        ratios = [
            {
                "from_mult": a["mult"],
                "to_mult": b["mult"],
                "docs_ratio": round(b["n_docs"] / a["n_docs"], 2),
                "wall_ratio": round(b["wall_sec"] / a["wall_sec"], 2),
            }
            for a, b in zip(results, results[1:])
        ]
        # linear-or-better: wall per doubling must not exceed the doc
        # ratio by more than 30% (amortized session overheads usually
        # push it BELOW the ratio)
        ok = all(r["wall_ratio"] <= r["docs_ratio"] * 1.3 for r in ratios)
        print(json.dumps({"summary": True, "ratios": ratios, "linear_ok": ok}))
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
