"""Z-order layout: key correctness and the two-dimensional locality
property that makes min/max pruning work on both columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.layout import (
    quantize_minmax,
    zorder_key,
    zorder_key_n,
    zorder_layout,
)

SF = "/root/testdata/sf0.01"


def _interleave(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 1000)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave(x, y), (x, y)


def test_zorder_layout_bounds_both_dimensions(spark):
    """Partitioning by the Morton key must give per-partition min/max
    spans on BOTH columns far below the full domain — the property a
    min/max-pruning scan exploits. A single-column sort gives span ≈
    full domain on the other column."""
    # independent dimensions by construction (l_partkey/l_suppkey are
    # correlated in this testdata, which would let a 1-D sort localize
    # both and mask the property under test)
    li = (
        load_table(spark, SF, "lineitem")
        .select(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(1)), F.lit(1024)).alias("x"),
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(2)), F.lit(1024)).alias("y"),
        )
    )
    n_parts = 16
    z = zorder_layout(li, ["x", "y"], n_partitions=n_parts, bits=10)
    spans = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
        .collect()[0]
    )
    # single-column-sorted baseline: x is tight, y spans ~everything
    base = li.repartitionByRange(n_parts, "x").sortWithinPartitions("x")
    bspans = (
        base.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .agg(F.avg("sy").alias("ay"))
        .collect()[0]
    )
    # z-order: both dims bounded well below the 1024 domain; the x-sort
    # baseline leaves y unbounded (≈ full domain)
    assert spans["ax"] < 600 and spans["ay"] < 600, spans
    assert bspans["ay"] > 900, bspans


def _interleave_n(vals: list[int], bits: int) -> int:
    n = len(vals)
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_n_matches_python_reference(spark):
    rows = [(0, 0, 0), (1, 2, 3), (1023, 1023, 1023), (7, 511, 100)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    got = {
        (r["x"], r["y"], r["z"]): r["k"]
        for r in df.select(
            "x", "y", "z",
            zorder_key_n([F.col("x"), F.col("y"), F.col("z")], bits=10).alias("k"),
        ).collect()
    }
    for x, y, z in rows:
        assert got[(x, y, z)] == _interleave_n([x, y, z], 10), (x, y, z)


def test_zorder_layout_three_columns_with_normalization(spark):
    """The n-column generalization: three UNQUANTIZED double dims run
    through minmax normalization + Morton layout must each end up with
    per-partition spans far below the full domain."""
    li = load_table(spark, SF, "lineitem").select(
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(1)), F.lit(100000)) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(2)), F.lit(100000)) / 100.0).alias("y"),
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(3)), F.lit(100000)) / 100.0).alias("z"),
    )
    # 512 range partitions ≈ the top 9 z-key bits ≈ 3 bits per dim:
    # expected per-dim span ~domain/8 (plus range-sampling fuzz);
    # 8 partitions would only halve each dim
    out = zorder_layout(li, ["x", "y", "z"], n_partitions=512, bits=7, normalize="minmax")
    assert out.columns == ["x", "y", "z"]  # helper columns dropped
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            (F.max("z") - F.min("z")).alias("sz"),
        )
        .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"), F.avg("sz").alias("az"))
        .collect()[0]
    )
    # domain is ~1000 per dim; every dim must be bounded well below it
    # (a 1-D sort leaves two of the three near the full domain)
    assert spans["ax"] < 450 and spans["ay"] < 450 and spans["az"] < 450, spans


def test_quantize_minmax_bounds_and_monotonicity(spark):
    df = spark.createDataFrame([(float(v),) for v in [-50, -10, 0, 3, 9, 100]], ["v"])
    got = [r["__q_v"] for r in quantize_minmax(df, ["v"], bits=4).orderBy("v").collect()]
    assert got[0] == 0 and got[-1] == 15, got
    assert got == sorted(got), got
    assert all(0 <= q <= 15 for q in got), got


def test_quantize_null_pinned_to_bucket_zero(spark):
    """Both quantizers place NULL in bucket 0 (the pinned, documented
    behavior — minmax previously let F.least skip the NULL and emit
    the TOP bucket)."""
    from actuarial_reserve_modelling_spark.operators.layout import quantize_quantile

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 9.0), (4, 1.0)], ["k", "v"]
    )
    mm = {r["k"]: r["__q_v"] for r in quantize_minmax(df, ["v"], bits=4).collect()}
    qq = {r["k"]: r["__q_v"] for r in quantize_quantile(df, ["v"], bits=2).collect()}
    assert mm[2] == 0 and qq[2] == 0, (mm, qq)
    assert mm[3] == 15  # non-null max still tops out
