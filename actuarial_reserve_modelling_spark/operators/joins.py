"""J4/J5 — range join and as-of join (SURVEY §2.3).

As-of join: union + ordered window (below). Range join: Spark plans a
point-in-interval join with no equi key as BroadcastNestedLoopJoin —
O(|L|·|R|). ``bucketed_range_join`` restores hash-join scaling by
quantizing time into buckets: each interval explodes into the buckets it
overlaps, points join on their bucket, and the exact containment
predicate filters residually. Cost: O(|R|·avg_span/bucket) expansion +
one hash shuffle — the standard interval-bucketing trick.

Spark has no ASOF JOIN; the scalable composition is:

1. tag both sides and union them on (by-keys, time, payload columns);
2. one window per by-key ordered by (time, side, tiebreak) carrying
   ``last(right_payload, ignorenulls=True)`` forward;
3. keep only left rows.

Cost model: a single hash shuffle on the by-keys + one sort within
partitions — identical to what a dedicated as-of operator would do, and
strictly cheaper than the range-join + row_number alternative (which
shuffles twice). Skewed by-keys are split by AQE; at 100 TB with a
single hot key, pre-bucket by (key, time-bucket) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point_ts < hi`` — without an equi key and without a
    nested-loop plan.

    Both sides gain a ``_rj_bucket`` = floor(epoch/bucket_seconds)
    column; intervals are exploded over every bucket they overlap
    (``sequence`` is JVM-side). Choose ``bucket_seconds`` near the
    median interval span: expansion factor ≈ span/bucket + 1.
    """
    p = points.withColumn(
        "_rj_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    )
    i = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(hi)) / bucket_seconds),
            )
        ),
    )
    joined = p.join(i, "_rj_bucket", how).filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
    )
    return joined.drop("_rj_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    right_tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (or ``<`` if not allow_exact_matches),
    matching on the ``by`` keys. Left rows with no prior right row get
    NULLs (left-join semantics, like pandas ``merge_asof`` / DuckDB
    ``ASOF LEFT JOIN``).

    ``value_cols`` are the right-side columns to carry; they are
    suffixed. ``right_tiebreak`` makes the choice deterministic when two
    right rows share a timestamp (highest wins). ``tolerance`` (a SQL
    interval string, e.g. ``"30 minutes"``; only for timestamp ``on``
    columns) nulls the carried values when the matched right row is
    older than ``left.on - tolerance`` — pandas ``merge_asof``'s
    tolerance semantics.
    """
    by = list(by)
    # Right rows sort before left rows at equal time iff exact matches
    # are allowed, so `last(...)` has already seen them.
    left_tag, right_tag = (1, 0) if allow_exact_matches else (0, 1)

    carried = [f"{c}{suffix}" for c in value_cols]
    right_asof = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(right_tag).alias("_side"),
        (F.col(right_tiebreak).cast("double") if right_tiebreak else F.lit(0.0)).alias("_tie"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    left_asof = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(left_tag).alias("_side"),
        F.lit(0.0).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = right_asof.unionByName(left_asof)
    fill_cols = [F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    if tolerance is not None:
        # carry the matched right row's own time so tolerance can bound
        # it — only materialized when a tolerance is requested, so the
        # plain as-of path pays no extra window aggregate
        unioned = unioned.withColumn(
            "_r_on", F.when(F.col("_side") == right_tag, F.col(on))
        )
        fill_cols.append(F.last("_r_on", ignorenulls=True).over(w).alias("_f_on"))
    filled = unioned.select("*", *fill_cols)
    is_left = F.col("_side") == left_tag
    if tolerance is not None:
        in_tol = F.col("_f_on") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        out_cols = [
            F.when(in_tol, F.col(f"_f_{c}")).alias(c) for c in carried
        ]
    else:
        out_cols = [F.col(f"_f_{c}").alias(c) for c in carried]
    return filled.filter(is_left).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *out_cols,
    )
