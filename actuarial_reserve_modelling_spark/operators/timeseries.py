"""Time-series resample / gap-fill (the hypertable-rollup pattern).

``resample_locf`` downsamples an event stream to a fixed grid per key
(bucket aggregate), materializes the *complete* bucket grid between each
key's min and max bucket (JVM ``sequence`` — no driver loop), and fills
empty buckets by last-observation-carried-forward over an ordered
window.

Scale shape: one shuffle for the bucket aggregate (partial map-side),
the grid explode is narrow over the tiny per-key extent table, the fill
is one window shuffle keyed like the aggregate. Grid cardinality =
span/step per key — choose the step so per-key grids stay thousands,
not billions (coarser rollups chain: 1m → 15m → 1h materializations,
each built from the previous, exactly like continuous aggregates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    every: str = "15 minutes",
    ndigits: int = 6,
) -> DataFrame:
    """Per-key fixed-grid resample with LOCF gap fill.

    Returns (``*keys``, bucket, v_filled, is_gap): ``bucket`` is the
    window start, ``v_filled`` the bucket's rounded mean or the most
    recent earlier bucket's mean, ``is_gap`` whether the bucket was
    empty. The first bucket per key always has data (grids start at each
    key's first event), so LOCF never needs a leading default.
    """
    keys = list(keys)
    bucketed = (
        df.groupBy(*keys, F.window(ts_col, every).alias("w"))
        .agg(F.round(F.avg(value_col), ndigits).alias("v"))
        .select(*keys, F.col("w.start").alias("bucket"), "v")
    )
    extent = bucketed.groupBy(*keys).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    step = F.expr(f"INTERVAL {every}")
    grid = extent.select(
        *keys, F.explode(F.sequence("lo", "hi", step)).alias("bucket")
    )
    joined = grid.join(bucketed, [*keys, "bucket"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("is_gap"),
    )
