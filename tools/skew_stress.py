"""Skewed-key stress for the explicit skew operators (VERDICT r8 task
#4): one key holding ~30% of a mult×-scaled input — the shape where a
plain keys-only exchange funnels a third of the data through one
reducer. Reports, for top-k-per-group and the big×small join:

* wall seconds for the PLAIN form vs the SALTED form
  (operators/skew.py::salted_topk / salted_join), same answer
  (row-count cross-checked here; row-level equivalence is the w13
  oracle + pytest);
* the shuffle partition-size histogram (max/avg rows) when hashing on
  the bare key vs on (key, salt) — the direct evidence that salting
  bounds the hot partition while the plain exchange degrades linearly
  with skew.

AQE's skew-join split also handles the join case at runtime; this band
exists to show the EXPLICIT forms hold when you know the skew ahead of
time (and for the window case, which AQE does not split).

Usage: python tools/skew_stress.py [multiplier] (default 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _part_hist(df, cols, n=64) -> dict:
    sizes = (
        df.repartition(n, *[F.col(c) for c in cols])
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .first()
    )
    return {
        "max_partition_rows": int(sizes["mx"]),
        "avg_partition_rows": round(float(sizes["avg"]), 1),
    }


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = 300_000 * mult

    from pyspark.sql import Window

    from actuarial_reserve_modelling_spark.operators.skew import (
        salted_join,
        salted_topk,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic skewed fact table: 30% of rows on key 0, the rest
    # uniform over ~100k cold keys; score is a total order via (score,
    # id) like every salted_topk caller must use
    big = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(99_991)))
            .cast("int")
            .alias("key"),
            F.col("id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003)))
            .cast("double")
            .alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    out: dict = {"rows": n, "hot_key_share": 0.3}

    out["exchange_hist_key_only"] = _part_hist(big, ["key"])
    salted = big.withColumn("_s", F.pmod(F.xxhash64("id"), F.lit(16)))
    out["exchange_hist_key_salt"] = _part_hist(salted, ["key", "_s"])

    order = [F.col("score").desc(), F.col("id")]
    w = Window.partitionBy("key").orderBy(*order)
    t0 = time.time()
    n_plain = (
        big.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).count()
    )
    out["topk_plain_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    n_salted = salted_topk(big, ["key"], order, k=5, salt_cols=["id"]).count()
    out["topk_salted_sec"] = round(time.time() - t0, 2)
    out["topk_rows_equal"] = n_plain == n_salted

    small = spark.range(99_991).select(
        F.col("id").cast("int").alias("key"), (F.col("id") * 7).alias("dim")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        # force the shuffle-join shape salting exists for (a genuinely
        # huge dim side cannot broadcast), and disable AQE's skew split
        # so the PLAIN number shows the un-mitigated funnel
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.time()
        j_plain = big.join(small, "key").count()
        out["join_plain_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        j_salted = salted_join(big, small, "key").count()
        out["join_salted_sec"] = round(time.time() - t0, 2)
        out["join_rows_equal"] = j_plain == j_salted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
