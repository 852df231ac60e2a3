"""Custom operators: compositions of built-ins for semantics Spark lacks
as single calls (as-of join, MinHash-LSH dedup, ANN search, winnowing)."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Default per-task input budget for a *vectorized* Arrow kernel (numpy
# matrix work: MinHash, hyperplane signatures, k-means partials, PQ):
# ~4 MiB of input is tens of ms to ~0.5 s of kernel CPU, so tasks stay
# fine-grained without paying a Python-worker round-trip per core for
# inputs that fit in one batch. Callers with per-row-expensive kernels
# (Monte Carlo trials, BPE word loops, media decodes) pass a smaller
# budget so even small inputs spread wide.
KERNEL_BYTES_PER_TASK = 4 << 20

# Plan-stat sizes at or above this are treated as "unknown": Catalyst
# reports spark.sql.defaultSizeInBytes (Long.MaxValue) for nodes it
# cannot estimate (localCheckpoint RDD scans, some Python nodes). Real
# data is far below 2^60 bytes.
_SIZE_UNKNOWN = 1 << 60

# Mirrors spark.sql.files.maxPartitionBytes (pinned in session.py): the
# scan-side split size, used to estimate how many input tasks a file
# source will produce without building the physical RDD.
_SCAN_SPLIT_BYTES = 128 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df``'s optimized plan — a pure
    driver-side stat read (no job). None when unavailable or when the
    optimizer reports the unknown-size sentinel."""
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None
    return None if size >= _SIZE_UNKNOWN else size


def spread_for_kernel(
    df: DataFrame,
    parallelism: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Size-adaptive repartition of a (narrow) input before a CPU-bound
    Arrow kernel.

    File sources parallelize by *bytes* (maxPartitionBytes), so a small
    input — one parquet file, a filtered dimension — arrives in one or
    two partitions and a compute-heavy mapInPandas runs on one core.
    The original form repartitioned to ``defaultParallelism``
    unconditionally, which is wrong at both ends of the scale axis
    (r14 measurement, guide §2.4/§4.1):

    * tiny inputs: a 32-way Arrow stage costs ~0.4 s of Python-worker
      round-trips to compute ~50 ms of kernel work (measured: a no-op
      32-partition mapInArrow is 0.7 s wall vs 0.3 s at 1 partition);
    * huge inputs: a 100 TB scan already arrives in ~800k splits, and
      ``repartition(cores)`` would *coalesce* it through a full-corpus
      shuffle before every kernel.

    The adaptive rule sizes the exchange from Catalyst's plan-size
    stat (free, driver-side): ``target = clamp(ceil(size /
    bytes_per_task), 1, parallelism)``. When the scan's natural split
    count (``size / maxPartitionBytes``) already reaches the target,
    the exchange is skipped outright — so the repartition only ever
    fires to spread a *small* input wider, bounded by parallelism ×
    maxPartitionBytes shuffled bytes, and large inputs keep their scan
    partitioning. Unknown sizes (checkpointed RDD inputs) keep the
    conservative full spread. ``bytes_per_task`` encodes kernel CPU
    density: the default fits vectorized numpy kernels; per-row-heavy
    kernels (Monte Carlo, BPE, codec decodes) pass a smaller budget.
    Per-row seeding keeps results partition-invariant, so none of this
    changes answers.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    if not parallelism or parallelism <= 1:
        return df
    budget = bytes_per_task if bytes_per_task is not None else KERNEL_BYTES_PER_TASK
    size = _plan_size_bytes(df)
    if size is None:
        return df.repartition(parallelism)
    target = max(1, min(parallelism, -(-size // budget)))
    natural_splits = -(-size // _SCAN_SPLIT_BYTES)
    if natural_splits >= target or target <= 1:
        return df
    return df.repartition(target)
