"""Skew-mitigation operators (SURVEY §4.3, mandate: "skewed keys hurt →
salting").

AQE's skew-join splitting handles most cases at runtime; these are the
explicit forms for when you know the skew ahead of time:

* ``salted_aggregate`` — two-phase aggregation: burst each hot group
  across ``num_salts`` sub-groups (partial agg), then merge partials.
  Works for any algebraic aggregate (sum/count/min/max; avg = sum+count
  merged at the end). The partial shuffle carries (key, salt) — hot keys
  spread over ``num_salts`` reducers instead of one.
* ``salted_join`` — replicate the small side per salt and burst the big
  side's hot keys: equivalent join output, no single monster partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    num_salts: int = 16,
    sums: list[str] | None = None,
    counts: bool = True,
) -> DataFrame:
    """Two-phase skew-safe groupBy: sum/count aggregates per ``keys``.

    Phase 1 groups by (keys, random salt) — Spark's partial aggregation
    already does map-side combining, so this matters when even the
    *merged* per-key state is too hot for one reducer (billions of rows
    on one key). Phase 2 merges the ≤ num_salts partials per key.
    Result is identical to a plain groupBy (checked by the oracle).
    """
    sums = sums or []
    salted = df.withColumn("_salt", (F.rand(seed=7) * num_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{c}") for c in sums],
        F.count(F.lit(1)).alias("_c"),
    )
    aggs = [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        aggs.append(F.sum("_c").alias("n"))
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across every salt value, join on (key, salt). Each hot key's rows
    spread over ``num_salts`` partitions; the small side grows by
    ``num_salts``× (keep it broadcast-sized per salt)."""
    big_s = big.withColumn("_salt", (F.rand(seed=11) * num_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
