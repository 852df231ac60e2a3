"""Reference-parity behaviors beyond the kernel: the claims probe join
(the hash join main.rs:56-59 builds but never probes), CSV PERMISSIVE
extension, and the scalar-gather filter chain (the Lambda's predicates).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import (
    CLAIM_SCHEMA,
    read_policies_csv,
)

from .conftest import write_policy_csvs


def _write_claims_csv(tmp_path, policy_ids, seed=7):
    """Claims fixture per FIXTURES.md: FK → policies.id with ~2% orphans
    (columns from the reference Claim struct, main.rs:27-32)."""
    rng = np.random.default_rng(seed)
    lines = ["id,claim_amount,policy_id,claim_date"]
    for i in range(400):
        if rng.random() < 0.02:
            pid = f"ORPHAN{i:04d}"
        else:
            pid = policy_ids[int(rng.integers(0, len(policy_ids)))]
        amt = float(rng.normal(100, 10))
        lines.append(f"C{i:05d},{amt:.4f},{pid},2021-06-0{1 + i % 9}")
    p = tmp_path / "claims.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_claims_probe_join(spark, tmp_path):
    """The join the reference gestures at (policy_map keyed on id,
    main.rs:56-59; Claim.policy_id as probe key, main.rs:29) — executed:
    per-policy claim totals via broadcast hash join, orphans surfaced
    via anti-join."""
    pdir, _ = write_policy_csvs(tmp_path, n_files=3, rows_per_file=30)
    policies = read_policies_csv(spark, pdir)
    cpath = _write_claims_csv(tmp_path, [r["id"] for r in policies.select("id").collect()])
    claims = spark.read.csv(cpath, header=True, schema=CLAIM_SCHEMA)

    joined = claims.join(
        F.broadcast(policies), claims.policy_id == policies.id, "inner"
    )
    per_policy = joined.groupBy("policy_id").agg(
        F.count(F.lit(1)).alias("n_claims"),
        F.round(F.sum("claim_amount"), 4).alias("total_claims"),
    )
    assert per_policy.count() > 0
    # join plan must be the broadcast hash join the reference built
    plan = per_policy._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    orphans = claims.join(policies, claims.policy_id == policies.id, "left_anti")
    n_orphans = orphans.count()
    assert 0 < n_orphans < 40  # ~2% of 400
    assert per_policy.agg(F.sum("n_claims")).collect()[0][0] == 400 - n_orphans


def test_csv_permissive_mode(spark, tmp_path):
    """PERMISSIVE is our documented extension (SURVEY §1.3): malformed
    rows become NULLs instead of failing the job."""
    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,age,gender,smoking_status,occupation,policy_type,effective_date,term,premium\n"
        "P1,44,M,s,o,t,2020-01-01,3650,1000\n"
        "P2,notanumber,M,s,o,t,2020-01-01,alsobad,1000\n"
        "P3,31,F,s,o,t,2020-01-01,1825,900\n"
    )
    df = read_policies_csv(spark, str(p), failfast=False)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["P2"]["age"] is None and rows["P2"]["term"] is None
    assert rows["P1"]["term"] == 3650.0


def test_scalar_gather_filters(spark, tmp_path):
    """The Lambda's gather predicates (size>0, endswith .txt, float
    parse — calculate_average_reserves.py:28-33) as one filter chain."""
    rows = [
        ("output/j1/policy_1.txt", 10, "123.5"),
        ("output/j1/policy_2.txt", 0, ""),  # size 0 → excluded
        ("output/j1/notes.log", 9, "999"),  # wrong suffix → excluded
        ("output/j1/policy_3.txt", 8, "76.5"),
    ]
    df = spark.createDataFrame(rows, "key string, size long, body string")
    total = (
        df.filter((F.col("size") > 0) & F.col("key").endswith(".txt"))
        .select(F.col("body").cast("double").alias("v"))
        .agg(F.round(F.sum("v"), 2).alias("total"))
        .collect()[0]["total"]
    )
    assert total == 200.0
