"""Statistical aggregates, collection aggregates, and sampling
(rounding out A-row and F-row coverage: stddev/variance/corr, median,
percentiles, collect_set, richer array ops, TABLESAMPLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "a9_stats_aggregates",
    "A4,A5 (statistical family)",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 8) AS var_disc,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qe,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qe,
           round(skewness(l_quantity), 4) AS skew_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family. Both engines use numerically
    stable single-pass algorithms; rounding absorbs last-ulp drift."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qe"),
        # corr to 4dp: the two engines' single-pass moment updates drift
        # beyond 1e-6 on 60k+ rows
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qe"),
        # skewness to 4dp: DuckDB applies the sample-bias correction
        # (factor ~1+3/2n), Spark reports population skewness
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@register(
    "a10_median_percentile",
    "A4 (ordered statistics)",
    oracle="""
    SELECT o_orderstatus,
           round(median(o_totalprice), 2) AS med_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def a10_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + continuous percentile. At 100 TB exact ordered
    statistics need a full sort per group — approx_percentile (a10b) is
    the scale path; this is the exact baseline."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
    )


@register("a10b_approx_percentile", "A6 (sketch family)", oracle=None)
def a10b_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — mergeable, one
    pass, bounded error; deterministic for fixed data but not equal to
    the exact quantile → rows-only check + unit test tolerance."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("approx_median")
    )


@register(
    "a11_collect_set",
    "A4,F5 (collection aggregates)",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') AS segments,
           CAST(len(list_distinct(list(c_mktsegment))) AS INT) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
)
def a11_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with array_sort for deterministic output (SURVEY
    §5.2-1: never emit unsorted collect_set in checked queries). The
    sorted set is emitted as a '|'-joined string so the driver's
    pandas-based canonicalizer can hash it (a raw list column is
    unhashable there — CORRECTNESS_r04 a11 err); the array-typed form
    stays covered by the local oracle gate via f5b/f5c."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
        F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
    )


@register(
    "f5b_array_ops",
    "F5",
    oracle="""
    SELECT vec_id,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
           CAST(array_position(embedding, list_max(embedding)) AS INT) AS argmax_1based,
           round(CAST(embedding[3] AS DOUBLE), 6) AS third,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings WHERE vec_id % 25 = 1
    """,
)
def f5b_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_max/min/position/element_at/filter — all JVM higher-order
    functions over the embedding column."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 25 == 1)
    return emb.select(
        "vec_id",
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.array_position("embedding", F.array_max("embedding")).cast("int").alias(
            "argmax_1based"
        ),
        F.round(F.element_at("embedding", 3).cast("double"), 6).alias("third"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "a12_salted_aggregate",
    "A4 (skew-safe form; SURVEY §4.3)",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a12_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately hot key
    (l_returnflag has 3 values → every value is a hot key). The oracle
    is the PLAIN group-by: salting must not change answers."""
    from actuarial_reserve_modelling_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(li, ["l_returnflag"], num_salts=16, sums=["l_quantity"])
    return out.select(
        "l_returnflag", F.round("sum_l_quantity", 2).alias("qty"), F.col("n")
    )


@register(
    "j7_salted_join",
    "J1 (skew-safe form; SURVEY §4.3)",
    oracle="""
    SELECT n_name, count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j7_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join against the plain-join oracle — identical
    output, hot fact keys spread across 8 salt partitions."""
    from actuarial_reserve_modelling_spark.operators.skew import salted_join

    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    joined = salted_join(cust, nation, on="nationkey", num_salts=8)
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a7c_grouping_sets",
    "A7",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n,
           CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def a7c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation (the
    grouping() bitmask distinguishes real NULL keys from rollup rows) —
    through the SQL front door since the DataFrame API only exposes
    rollup/cube shorthands."""
    from actuarial_reserve_modelling_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
               CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@register(
    "a14_argmax_aggregates",
    "A5 (argmax family), L1",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_name, c_acctbal) AS richest,
           arg_min(c_name, c_acctbal) AS poorest,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def a14_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates) — the one-pass form of "keep
    the best row per group" (e.g. dedup keep-highest-quality): no window,
    no self-join, partial-aggregatable."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "a15_regression_aggregates",
    "A4 (regression family), U3",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a15_regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression as built-in aggregates (regr_slope /
    intercept / r2 / count) — the single-pass JVM form of per-group
    model fitting; applyInPandas (u3) is the escape hatch for anything
    beyond linear."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n"),
    )


@register(
    "s6_partitioned_roundtrip",
    "S6,S3",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_mktsegment
    """,
)
def s6_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-parquet write → partition-pruned re-read → aggregate,
    checked against the direct answer. Puts the writer path inside the
    correctness gate; the re-read scan lists only the two matching
    partition directories (PartitionFilters)."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
        write_partitioned_parquet,
    )

    root, fresh = staging_dir("s6", sf_dir)
    out = root + "/cust"
    if fresh:
        cust = load_table(spark, sf_dir, "customer")
        write_partitioned_parquet(cust, out, ["c_mktsegment"])
        staging_commit(root)
    back = spark.read.parquet(out).filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )


@register("a16_hll_sketch_union", "A6 (sketch family)", oracle=None)
def a16_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (DataSketches HLL): build one
    sketch per segment, then union sketches to the global estimate —
    the pattern that makes distinct counts composable across partitions,
    days, and reruns at 100 TB (store sketch bytes, merge later; never
    recount). Rows-only (sketch estimates ≠ exact); test bounds error."""
    cust = load_table(spark, sf_dir, "customer")
    per_seg = cust.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch")
    )
    return per_seg.agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch")), 0)
        .cast("bigint")
        .alias("approx_total_custkeys"),
        F.count(F.lit(1)).alias("n_sketches"),
    )


@register("a13_bloom_filter", "A6 (sketch family), J3", oracle=None)
def a13_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style membership pre-filter for a fact-dim semi-join: hash
    dim keys into a 64k-bucket set (a k=1 Bloom filter — Spark's
    internal ``bloom_filter_agg`` is not SQL-exposed in this build, so
    the sketch is composed from collect_set + xxhash64), broadcast it,
    and pre-filter the fact side map-side before the exact join. False
    positives (bucket collisions) only cost extra rows into the exact
    join, never wrong answers; false negatives are impossible. Rows-only
    check; the unit test pins both bounds."""
    nbits = 65536
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    sketch = cust.agg(
        F.collect_set(F.pmod(F.xxhash64("c_custkey"), F.lit(nbits))).alias("buckets")
    )
    filtered = orders.join(F.broadcast(sketch)).filter(
        F.array_contains("buckets", F.pmod(F.xxhash64("o_custkey"), F.lit(nbits)))
    )
    exact = cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
    true_hits = filtered.join(exact, "o_custkey", "left_semi")
    return filtered.agg(
        F.count(F.lit(1)).alias("n_bloom_pass"),
    ).crossJoin(true_hits.agg(F.count(F.lit(1)).alias("n_true")))


@register(
    "a13b_bloom_join_exactness",
    "A6 (sketch family), J3 (hash-grade no-false-negative slice)",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_true_hits
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    """,
)
def a13b_bloom_join_exactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-grade slice of a13's bloom pre-filter: a Bloom filter has
    NO false negatives, so bloom-prefilter → exact semi-join must
    equal the plain semi-join row for row — an engine-independent
    identity DuckDB can state without knowing xxhash64. This pins the
    sketch plumbing end to end (a member's own bucket is always in the
    set, so no true hit is dropped map-side), while a13 keeps the
    rows-only view of the false-positive rate. 100 TB shape: the
    broadcast sketch prunes the fact scan before the shuffle — the
    whole point of the operator — and the final agg is |priorities|
    rows."""
    nbits = 65536
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    sketch = cust.agg(
        F.collect_set(F.pmod(F.xxhash64("c_custkey"), F.lit(nbits))).alias("buckets")
    )
    filtered = orders.join(F.broadcast(sketch)).filter(
        F.array_contains("buckets", F.pmod(F.xxhash64("o_custkey"), F.lit(nbits)))
    )
    exact = cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
    true_hits = filtered.join(exact, "o_custkey", "left_semi")
    return true_hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_true_hits")
    )


@register("o6_tablesample", "O3 (sampling)", oracle=None)
def o6_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling — deterministic within Spark (seed
    fixed) but engine-specific RNG → rows-only; the unit test pins
    reproducibility and the sampling fraction tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("l_quantity"), 2).alias("qty_sampled"),
    )


@register(
    "s5b_orc_roundtrip",
    "S3,S6 (columnar-format interchange)",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 4 = 1
    GROUP BY o_orderstatus
    """,
)
def s5b_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format interchange: parquet → ORC write → ORC scan →
    aggregate, hash-checked against the direct parquet answer (the
    roundtrip must be lossless, including timestamp columns). ORC is the
    other columnar format a lake migration encounters; the plan is the
    same scan→agg shape with ORC's own predicate pushdown."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s5b", sf_dir)
    out = root + "/orders_orc"
    if fresh:
        orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 1)
        orders.write.mode("overwrite").orc(out)
        staging_commit(root)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "s5c_jsonl_roundtrip",
    "S3,S5 (JSON-lines corpus interchange)",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5
    FROM documents WHERE doc_id % 23 = 3
    """,
)
def s5c_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines roundtrip — the interchange format LLM corpora actually
    ship in: parquet → .jsonl write → schema'd JSON scan → per-row md5,
    hash-checked against the source text. Pins escaping losslessness
    (quotes, newlines, unicode) through the JSON writer/reader pair, not
    just row counts."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s5c", sf_dir)
    out = root + "/docs_jsonl"
    if fresh:
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 3)
        docs.select("doc_id", "text").write.mode("overwrite").json(out)
        staging_commit(root)
    back = spark.read.schema("doc_id long, text string").json(out)
    return back.select("doc_id", F.md5("text").alias("text_md5"))


@register(
    "s12_zorder_key",
    "S6,F3 (Z-order multi-dimensional clustering key)",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(list_sum(list_transform(range(0, 16), i ->
               (((l_partkey & 65535) >> i) & 1) * (1::BIGINT << (2 * i)) +
               (((l_suppkey & 65535) >> i) & 1) * (1::BIGINT << (2 * i + 1))
           )) AS BIGINT) AS zkey,
           CAST(list_sum(list_transform(range(0, 16), i ->
               (((l_partkey & 65535) >> i) & 1) * (1::BIGINT << (3 * i)) +
               (((l_suppkey & 65535) >> i) & 1) * (1::BIGINT << (3 * i + 1)) +
               (((l_linenumber & 65535) >> i) & 1) * (1::BIGINT << (3 * i + 2))
           )) AS BIGINT) AS zkey3
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def s12_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys — 2-col over (l_partkey,
    l_suppkey) and the n-column generalization over (l_partkey,
    l_suppkey, l_linenumber) — the multi-dimensional layout technique
    behind OPTIMIZE ZORDER BY: sort/range-partition on this key and
    every written file gets a bounded min/max span on EVERY interleaved
    dimension, so a predicate on any of them prunes row groups
    (operators/layout.py; the locality effect itself is asserted in
    tests/test_layout.py, including the 3-col + minmax-normalization
    workflow). Pure codegen bit arithmetic, hash-checked against the
    same interleaves in DuckDB."""
    from actuarial_reserve_modelling_spark.operators.layout import (
        zorder_key,
        zorder_key_n,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(
            F.col("l_partkey").bitwiseAND(F.lit(65535)),
            F.col("l_suppkey").bitwiseAND(F.lit(65535)),
        ).alias("zkey"),
        zorder_key_n(
            [
                F.col("l_partkey").bitwiseAND(F.lit(65535)),
                F.col("l_suppkey").bitwiseAND(F.lit(65535)),
                F.col("l_linenumber").bitwiseAND(F.lit(65535)),
            ],
            bits=16,
        ).alias("zkey3"),
    )


@register(
    "a6b_approx_distinct_bound",
    "A6 (hash-grade bound companion for HLL++ approx distinct)",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_n_cust,
           CAST(1 AS INT) AS within_bound
    FROM orders
    """,
)
def a6b_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-grade companion for a6 (r10 verdict task #5, the a13b
    pattern generalized): the engine computes BOTH the HLL++ estimate
    and the exact distinct and emits (exact_n_cust, within_bound) where
    within_bound pins |approx − exact| ≤ 5·rsd·exact — a 5σ envelope
    for the sketch's rsd=0.02 accuracy contract, deterministic for
    fixed data (HLL merge is order-insensitive). DuckDB reproduces the
    exact count and expects the bound to hold; a sketch regression
    (wrong registers, broken merge) flips within_bound and
    hash-mismatches. a6 keeps the rows-only view of the raw estimate."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("exact_n_cust"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.countDistinct("o_custkey")
            )
            <= F.lit(0.1) * F.countDistinct("o_custkey")
        )
        .cast("int")
        .alias("within_bound"),
    )


@register(
    "a10c_approx_percentile_bound",
    "A6 (hash-grade rank-error bound companion for the GK sketch)",
    oracle="""
    SELECT round(median(o_totalprice), 2) AS med_exact,
           CAST(1 AS INT) AS within_bound
    FROM orders
    """,
)
def a10c_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-grade companion for a10b: the Greenwald-Khanna sketch
    guarantees RANK error ≤ n/accuracy, so the engine computes the
    approx median (accuracy=10000), counts how many rows fall at or
    below it, and pins |rank − n/2| ≤ n/1000 + 1 (10× the guarantee,
    deterministic for fixed data). Emitted alongside the exact median
    (rounded) that DuckDB reproduces — a sketch regression moves the
    approx value's rank outside the envelope and flips within_bound."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("ap"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.median("o_totalprice"), 2).alias("med_exact"),
    )
    return (
        orders.join(F.broadcast(stats))
        .agg(
            F.first("med_exact").alias("med_exact"),
            (
                F.abs(
                    F.sum((F.col("o_totalprice") <= F.col("ap")).cast("long"))
                    - F.first("n") / F.lit(2.0)
                )
                <= F.first("n") / F.lit(1000.0) + F.lit(1.0)
            )
            .cast("int")
            .alias("within_bound"),
        )
    )


@register(
    "a16b_hll_union_bound",
    "A6 (hash-grade bound companion for DataSketches HLL union)",
    oracle="""
    SELECT count(DISTINCT c_custkey) AS exact_total,
           CAST(1 AS INT) AS within_bound
    FROM customer
    """,
)
def a16b_hll_union_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-grade companion for a16: build one DataSketches HLL sketch
    per market segment, union them, and pin the merged estimate within
    ±5% of the exact distinct (lgK=12 ⇒ rsd ≈ 1.6%, so 5% ≈ 3σ;
    deterministic for fixed data). DuckDB reproduces the exact count
    and expects within_bound=1 — a broken sketch build or a lossy
    union flips it. The mergeability being tested is the 100 TB
    property: per-partition sketches union to the global estimate
    without recounting."""
    cust = load_table(spark, sf_dir, "customer")
    est = (
        cust.groupBy("c_mktsegment")
        .agg(F.hll_sketch_agg("c_custkey").alias("sketch"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
    )
    return (
        cust.agg(F.countDistinct("c_custkey").alias("exact_total"))
        .join(F.broadcast(est))
        .select(
            "exact_total",
            (
                F.abs(F.col("est") - F.col("exact_total"))
                <= F.lit(0.05) * F.col("exact_total")
            )
            .cast("int")
            .alias("within_bound"),
        )
    )


@register(
    "o6b_tablesample_bound",
    "O3 (hash-grade bound companion for seeded Bernoulli sampling)",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total, CAST(1 AS INT) AS within_bound
    FROM lineitem
    """,
)
def o6b_tablesample_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-grade companion for o6 (the a13b/a6b pattern): the Bernoulli
    sampler's RNG is engine-specific, so the SAMPLE itself stays
    rows-only — but its statistical contract is checkable. The engine
    samples at p=0.1 (seed 42), computes the realized fraction, and
    pins |frac − p| ≤ 4σ with σ = sqrt(p(1−p)/n) — a ~6e-5 failure
    probability for a correct sampler, and DETERMINISTIC for fixed data
    and seed, so the driver can hash-compare. Emitted alongside the
    exact total DuckDB reproduces; a broken sampler (wrong fraction,
    double-sampling, seed drift) flips within_bound."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(F.count(F.lit(1)).alias("n_total"))
    sampled = li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return (
        stats.join(F.broadcast(sampled))
        .select(
            F.col("n_total").cast("bigint").alias("n_total"),
            (
                F.abs(F.col("n_sampled") / F.col("n_total") - F.lit(0.1))
                <= F.lit(4.0) * F.sqrt(F.lit(0.09) / F.col("n_total"))
            )
            .cast("int")
            .alias("within_bound"),
        )
    )
