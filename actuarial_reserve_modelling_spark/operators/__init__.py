"""Custom operators: compositions of built-ins for semantics Spark lacks
as single calls (as-of join, MinHash-LSH dedup, ANN search, winnowing)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_kernel(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition a (narrow) input before a CPU-bound Arrow kernel.

    File sources parallelize by *bytes* (maxPartitionBytes), so a small
    input — one parquet file, a filtered dimension — arrives in one or
    two partitions and a compute-heavy mapInPandas runs on one core. The
    kernels' cost is per-row CPU, not I/O, so we explicitly shuffle the
    (projected, few-column) rows across the cluster first; the exchange
    is trivially cheap next to the kernel. Per-row seeding keeps results
    partition-invariant, so this never changes answers.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism) if parallelism and parallelism > 1 else df
