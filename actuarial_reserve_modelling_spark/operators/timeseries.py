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


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    alpha: float = 0.1,
    horizon: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key:
    ŷ_t = Σ_{j<horizon} w_j·y_{t−j} / Σ_{j<horizon} w_j with
    w_j = (1−α)^j — the EWMA every monitoring/feature pipeline wants,
    cut off at ``horizon`` lags.

    Truncation is the SCALE decision, not a shortcut: the exact
    infinite-history EWMA is a sequential recurrence (each value depends
    on the previous result — unparallelizable as stated) or a weighted
    sum whose weights span the key's whole history (numerically
    explosive: (1−α)^(−rn) overflows past a few hundred rows). Bounding
    the horizon makes it a banded self-join — each row joins its ≤
    ``horizon`` predecessors by row number — which shuffles only on the
    key, stays in whole-stage codegen, and is exact to within
    (1−α)^horizon of the weight mass (≈12% at the defaults alpha=0.1,
    horizon=20; pass horizon≈⌈ln(0.01)/ln(1−α)⌉ ≈ 44 for <1%). The
    renormalized weighted mean over the window keeps the *output* error
    far below the truncated mass for smooth series.

    Output: keys + ts + value + ``ewma`` (rounded 6 dp).
    """
    keys = list(keys)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    base = df.select(*keys, ts_col, value_col, *( [tiebreak] if tiebreak else [] )).withColumn(
        "_rn", F.row_number().over(w)
    )
    cur = base.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
        F.col("_rn").alias("_rn1"),
    )
    hist = base.select(
        *[F.col(k).alias(f"_h_{k}") for k in keys],
        F.col(value_col).alias("_hv"),
        F.col("_rn").alias("_rn2"),
    )
    cond = [F.col(f"_k_{k}") == F.col(f"_h_{k}") for k in keys] + [
        F.col("_rn2") <= F.col("_rn1"),
        F.col("_rn2") > F.col("_rn1") - horizon,
    ]
    wgt = F.pow(F.lit(1.0 - alpha), F.col("_rn1") - F.col("_rn2"))
    return (
        cur.join(hist, cond)
        .groupBy(*[f"_k_{k}" for k in keys], "_ts", "_v", "_rn1")
        .agg((F.sum(wgt * F.col("_hv")) / F.sum(wgt)).alias("_e"))
        .select(
            *[F.col(f"_k_{k}").alias(k) for k in keys],
            F.col("_ts").alias(ts_col),
            F.col("_v").alias(value_col),
            F.round("_e", 6).alias("ewma"),
        )
    )
