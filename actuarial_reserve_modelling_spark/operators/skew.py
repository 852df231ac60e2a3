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
* ``salted_topk`` — two-phase top-k per group for hot keys: Spark's own
  WindowGroupLimit already bounds the rank window's sort memory, but the
  whole group still shuffles to ONE reducer; salting splits it first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    num_salts: int = 16,
    salt_cols: list[str] | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase skew-safe top-k per group — identical output to
    ``row_number() OVER (PARTITION BY keys ORDER BY order) <= k``
    PROVIDED ``order`` is a total order within each group (ties broken
    by a unique column); with ties unresolved either form is free to
    pick any of the tied rows and the equivalence (and the oracle
    check) breaks.

    Why not just the plain window: Spark inserts WindowGroupLimit on a
    ``row_number() <= k`` filter, which caps the SORT (each map task and
    each reducer keeps only k rows per group before/after the exchange)
    — but the exchange still hashes on ``keys`` alone, so a hot key's
    surviving rows (k per upstream map partition — at 100 TB that is
    k × hundreds of thousands of map tasks) all land on ONE reducer's
    sort. Phase 1 here partitions by (keys, salt) instead, spreading
    that merge across ``num_salts`` reducers; phase 2 re-ranks the
    ≤ num_salts·k survivors per key — a trivially small window.

    The salt is a CONTENT hash (``xxhash64`` of ``salt_cols``, default:
    every column) rather than ``rand()``: a retried phase-1 task
    re-derives the same salt for every row, so speculative execution
    and partial stage retries cannot route a row to two different
    sub-groups (with exactly-k semantics that would double-count it);
    rand()-salting is only safe for algebraic aggregates like
    ``salted_aggregate`` where a row's sub-group choice never changes
    the merged result.

    Content-salting caveat: FULLY DUPLICATED rows of a hot key (every
    salt_col equal) hash to ONE salt, so a hot key whose mass is a few
    distinct row-values still lands on few sub-groups — the split is
    defeated exactly on duplicate-heavy hot keys. That is inherent to
    deterministic salting (any retry-stable function of row content
    maps equal rows together); for such inputs collapse duplicates
    first (count-weight them) or accept the plain window.
    """
    if rank_col in ("_salt", "_rn1"):
        raise ValueError(f"rank_col {rank_col!r} collides with an internal column")
    for c in {"_salt", "_rn1", rank_col} & set(df.columns):
        raise ValueError(
            f"salted_topk column {c!r} collides with an input column — "
            "rename the input (or pass a different rank_col)"
        )
    salt_src = [F.col(c) for c in (salt_cols or df.columns)]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(num_salts))
    )
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
