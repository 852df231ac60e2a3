"""J5 — as-of join (SURVEY §2.3), expressed as union + ordered window.

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (or ``<`` if not allow_exact_matches),
    matching on the ``by`` keys. Left rows with no prior right row get
    NULLs (left-join semantics, like pandas ``merge_asof`` / DuckDB
    ``ASOF LEFT JOIN``).

    ``value_cols`` are the right-side columns to carry; they are
    suffixed. ``right_tiebreak`` makes the choice deterministic when two
    right rows share a timestamp (highest wins).
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
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    )
    is_left = F.col("_side") == left_tag
    return filled.filter(is_left).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(c) for c in carried],
    )
