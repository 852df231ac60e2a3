"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional pruning.

Parquet scan pruning works off per-row-group min/max stats, which only
help when the file layout correlates with the predicate columns. A sort
on one column gives perfect pruning on that column and none on any
other; interleaving the BITS of two columns (the Z-order / Morton key)
gives bounded min/max spans on BOTH, so either predicate prunes — the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` at 100 TB. The
key is pure JVM bit arithmetic (whole-stage codegen, reproducible in
any engine), and the layout step is the ordinary
``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    int columns (c1 → even bit positions, c2 → odd). 2·bits ≤ 62 keeps
    the result in a positive bigint. Callers normalize each dimension
    into [0, 2^bits) first — by ranking, min/max scaling, or masking —
    since Z-order locality is only as good as the per-dimension
    quantization."""
    if 2 * bits > 62:
        raise ValueError("2*bits must fit a positive bigint")
    x, y = c1.cast("bigint"), c2.cast("bigint")
    terms = [
        F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_layout(
    df: DataFrame, c1: str, c2: str, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster a frame for two-dimensional pruning: range-partition +
    sort by the Morton key of (c1, c2). Writing the result gives every
    file a bounded min/max span on BOTH columns — the property a
    min/max-pruning scan needs. One range-exchange (with its sampling
    pass), exactly the cost of a single-column sort. The synthetic key
    is internal and dropped: the returned frame has the caller's
    schema, just reordered (projection preserves partition order), so
    the written files don't carry a derivable extra column."""
    key = "__arm_zorder_key"
    keyed = df.withColumn(key, zorder_key(F.col(c1), F.col(c2), bits=bits))
    return keyed.repartitionByRange(n_partitions, key).sortWithinPartitions(key).drop(key)
