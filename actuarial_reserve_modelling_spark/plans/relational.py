"""Relational core queries (SURVEY §2.1-2.3, 2.5, 2.7, 2.8).

Every query is declarative DataFrame API — Catalyst does pushdown,
pruning, join selection, partial aggregation. Scale notes per query in
docstrings; the common rules:

* dims (region, nation, supplier at any SF; customer at small SF) are
  broadcast — either under the 10 MB auto threshold or hinted;
* fact-fact joins shuffle on the join key and rely on AQE for skew;
* aggregates are map-side partial first (HashAggregate partial→final);
* float aggregates are rounded for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


# --- S3: parquet scan -------------------------------------------------------


@register(
    "s3_parquet_scan_count",
    "S3",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def s3_parquet_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare parquet scan + count. At scale this is metadata-only
    (parquet row-group counts via aggregate pushdown), no data read."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


# --- P: projections / predicates -------------------------------------------


@register(
    "p2_project_prune",
    "P1,P2",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_quantity / 52.0 AS weekly
    FROM lineitem WHERE l_orderkey % 100 = 7
    """,
)
def p2_project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic; scan should read 3 of 11 columns
    (check ReadSchema in explain) and push the filter down."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 7).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_quantity") / 52.0).alias("weekly"),
    )


@register(
    "p3_p6_compound_filter",
    "P3,P6",
    oracle="""
    SELECT count(*) AS n, round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
      AND NOT l_linestatus = 'X'
    """,
)
def p3_p6_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/IN/BETWEEN/NOT predicates — all pushed to the scan
    (PushedFilters); TPC-H Q6 shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "X")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
    )


@register(
    "p4_string_predicates",
    "P4,F1",
    oracle="""
    SELECT p_type, count(*) AS n
    FROM part
    WHERE p_name LIKE '%bolt' OR p_name LIKE 'red%'
    GROUP BY p_type
    """,
)
def p4_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/suffix string predicates (the Lambda's endswith('.txt'),
    calculate_average_reserves.py:31) — StartsWith/EndsWith push down."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%bolt") | F.col("p_name").like("red%"))
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "p5_anti_join",
    "P5,J3",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def p5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the reference's output-exists skip
    (entrypoint.sh:24-28) as a set operation. Broadcast the distinct
    key set when small; shuffled otherwise (AQE decides)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey")


# --- J: joins ---------------------------------------------------------------


@register(
    "j1_broadcast_join_agg",
    "J1,A4",
    oracle="""
    SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j1_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim broadcast hash join (the reference's HashMap build side,
    main.rs:56-59, finally probed). nation is 25 rows at every SF —
    broadcast explicitly; no shuffle on the fact side until the agg."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "j2_left_outer_join",
    "J2",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price, c_name
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 500 = 1
    """,
)
def j2_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer equi-join. At 100 TB this is a shuffle join on
    o_custkey/c_custkey; AQE converts to broadcast when the filtered
    side fits. The filter lands on the probe side pre-join."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 1)
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price"), "c_name"
    )


@register(
    "j3_semi_join",
    "J3",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join with a pushed predicate on the probe side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "j4_range_join",
    "J4",
    oracle="""
    SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    """,
)
def j4_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a non-equi (range) residual — the equi key carries
    the shuffle; the theta predicate is evaluated post-probe, so this
    stays a hash/sort-merge join, never a nested-loop."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@register(
    "j6_cross_join",
    "J6",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def j6_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two broadcast-sized dims."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


# --- A: aggregations --------------------------------------------------------


@register(
    "a1_a2_global_agg",
    "A1,A2,A3",
    oracle="""
    SELECT round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS n
    FROM lineitem
    """,
)
def a1_a2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped sum/avg/count — the reference's accumulator + mean
    (main.rs:72,80) and Lambda sum (calculate_average_reserves.py:33).
    Spark runs it partial→exchange(1)→final: one double per task moves."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a4_groupby_q1",
    "A4",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the keystone grouped aggregation (SURVEY §7 M1).
    Low-cardinality keys → partial agg collapses almost everything
    map-side; the exchange moves ~6 rows per task at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a5_count_distinct",
    "A5",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_cust,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    """,
)
def a5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expands to a two-phase agg) + min/max."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register("a6_approx_count_distinct", "A6", oracle=None)
def a6_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path where exact distinct
    is a full shuffle. Deterministic for fixed data (HLL merge is
    order-insensitive) but not equal to exact count → rows-only check;
    the unit test asserts the rsd bound instead."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_n_cust")
    )


@register(
    "a7_rollup",
    "A7",
    oracle="""
    SELECT r_name, n_name, count(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over a two-dim snowflake path."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a8_distinct",
    "A8",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def a8_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct — hash aggregate w/o aggregate functions; partial
    distinct runs map-side, so the shuffle carries unique pairs only."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --- O: sorts / limits / set ops -------------------------------------------


@register(
    "o1_o3_topk",
    "O1,O3",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o1_o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ordered limit → Spark plans TakeOrderedAndProject: per-
    partition heap of k, driver merge of k×partitions — no global sort,
    which is the only sane plan at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


@register(
    "o4_union_all",
    "O4",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def o4_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName then aggregate — union is zero-cost (plan concat)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "o5_except_intersect",
    "O5",
    oracle="""
    SELECT 'except' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def o5_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/INTERSECT (distinct semantics) — planned as left-anti /
    left-semi over distinct inputs."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ex = cust.subtract(supp).select(F.lit("except").alias("op"), "nationkey")
    ix = cust.intersect(supp).select(F.lit("intersect").alias("op"), "nationkey")
    return ex.unionByName(ix)
