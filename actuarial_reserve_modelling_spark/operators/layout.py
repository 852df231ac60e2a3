"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional pruning.

Parquet scan pruning works off per-row-group min/max stats, which only
help when the file layout correlates with the predicate columns. A sort
on one column gives perfect pruning on that column and none on any
other; interleaving the BITS of several columns (the Z-order / Morton
key) gives bounded min/max spans on ALL of them, so any predicate
prunes — the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` at
100 TB. The key is pure JVM bit arithmetic (whole-stage codegen,
reproducible in any engine), and the layout step is the ordinary
``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_n(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton key over ``n = len(cols)`` non-negative int columns:
    bit ``i`` of column ``j`` lands at output position ``i*n + j``
    (for n=2 that is the classic even/odd interleave). ``n·bits ≤ 62``
    keeps the result in a positive bigint. Callers normalize each
    dimension into [0, 2^bits) first — see ``quantize_minmax`` /
    ``quantize_quantile`` — since Z-order locality is only as good as
    the per-dimension quantization."""
    cols = list(cols)
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError("len(cols)*bits must fit a positive bigint")
    ints = [c.cast("bigint") for c in cols]
    terms = [
        F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j))
        for i in range(bits)
        for j, c in enumerate(ints)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Two-column Morton key (c1 → even bit positions, c2 → odd) —
    the n=2 case of ``zorder_key_n``, kept as the common-path API."""
    return zorder_key_n([c1, c2], bits=bits)


def quantize_minmax(df: DataFrame, cols: Sequence[str], bits: int = 16) -> DataFrame:
    """Normalize each named numeric column into [0, 2^bits) by global
    min/max scaling, adding ``__q_<col>`` int columns ready for
    ``zorder_key_n``.

    The stats pass is ONE global aggregate collapsing to a single row
    (collected driver-side — the bounded-scalar pattern), then the
    scaling is pure codegen arithmetic. Min/max scaling is the cheap
    default; it quantizes poorly under heavy skew (one outlier
    compresses everything else into few buckets) — use
    ``quantize_quantile`` there.

    NULL handling (pinned, identical in both quantizers): NULL values
    map to bucket 0, so null-heavy rows co-locate at the low end of the
    Z-curve instead of scattering (``F.least`` skips NULL operands, so
    without the coalesce a NULL would land in the TOP bucket here but
    bucket 0 in ``quantize_quantile``)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    out = df
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"quantize_minmax: column {c!r} has no non-null values"
            )
        span = (mx - mn) or 1.0
        out = out.withColumn(
            f"__q_{c}",
            F.when(F.col(c).isNull(), F.lit(0))  # NULL → bucket 0 (see docstring)
            .otherwise(
                F.least(
                    F.lit(top),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * (top + 1)
                    ),
                )
            )
            .cast("bigint"),
        )
    return out


def quantize_quantile(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Normalize each named numeric column into [0, 2^bits) by
    approximate-quantile (equi-depth) bucketing — skew-robust: every
    bucket holds ~the same row count regardless of the value
    distribution, adding ``__q_<col>`` int columns.

    One approx_percentile pass (Greenwald-Khanna sketch, mergeable,
    single aggregate for ALL columns) yields 2^bits−1 boundaries per
    column; the bucket lookup is a broadcast-literal array binary
    search via ``width_bucket``-style filtering in codegen. Keep
    ``bits`` modest (≤12): the boundary array is 2^bits doubles per
    column, carried as a plan literal. NULLs map to bucket 0, matching
    ``quantize_minmax`` (see its docstring)."""
    if bits > 12:
        raise ValueError("quantile quantization bits should be <= 12")
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    row = df.agg(
        *[
            F.approx_percentile(F.col(c).cast("double"), F.array(*[F.lit(p) for p in probs]), F.lit(10_000)).alias(c)
            for c in cols
        ]
    ).collect()[0]
    out = df
    for c in cols:
        if row[c] is None:
            raise ValueError(
                f"quantize_quantile: column {c!r} has no non-null values"
            )
        bounds = sorted(set(row[c]))
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        # bucket = number of boundaries <= value (0..len(bounds))
        out = out.withColumn(
            f"__q_{c}",
            F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double"))).cast("bigint"),
        )
    return out


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    n_partitions: int,
    bits: int = 16,
    normalize: str | None = None,
) -> DataFrame:
    """Cluster a frame for multi-dimensional pruning: range-partition +
    sort by the Morton key of ``cols``. Writing the result gives every
    file a bounded min/max span on EVERY listed column — the property a
    min/max-pruning scan needs. One range-exchange (with its sampling
    pass), exactly the cost of a single-column sort. ``normalize``:
    None (inputs already in [0, 2^bits)), "minmax", or "quantile". The
    synthetic key (and any quantized helper columns) are internal and
    dropped: the returned frame has the caller's schema, just
    reordered (projection preserves partition order), so the written
    files don't carry derivable extra columns."""
    cols = list(cols)
    if normalize == "minmax":
        keyed_in = quantize_minmax(df, cols, bits=bits)
        key_cols = [F.col(f"__q_{c}") for c in cols]
    elif normalize == "quantile":
        keyed_in = quantize_quantile(df, cols, bits=min(bits, 8))
        key_cols = [F.col(f"__q_{c}") for c in cols]
        bits = min(bits, 8)
    elif normalize is None:
        keyed_in = df
        key_cols = [F.col(c) for c in cols]
    else:
        raise ValueError(f"unknown normalize mode: {normalize}")
    key = "__arm_zorder_key"
    keyed = keyed_in.withColumn(key, zorder_key_n(key_cols, bits=bits))
    return (
        keyed.repartitionByRange(n_partitions, key)
        .sortWithinPartitions(key)
        .select(*df.columns)
    )
