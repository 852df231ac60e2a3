"""Remaining TPC-H-shaped composite queries
(Q2/Q6/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21) — with these plus
composite.py/relational.py's Q1/Q3/Q4/Q5/Q10/Q12/Q14/Q18/Q19/Q22, all
22 TPC-H query shapes are covered.

The testdata star schema has no ``partsupp`` table and lineitem carries
only ``l_shipdate`` (no commit/receipt dates), so the shapes that depend
on those are adapted rather than dropped: lineitem stands in as the
part↔supplier bridge (Q2/Q16), observed min unit price as supplycost
(Q2), shipped value as stock value (Q11/Q20), Q9 profit omits the
supply-cost term, and Q21's "late" predicate is
``l_shipdate > o_orderdate + 60 days``. What each query exercises — the
join topology, correlated/decorrelated subqueries, conditional
aggregation, self-join exists/not-exists — is preserved.

Scale notes: all follow the star-join discipline (dims broadcast, facts
shuffle once on the shared key, aggregation partial before exchange).
Revenue sums go through DECIMAL(30,8) per-term quantization so the
result is independent of reduction order (see q5's note in
composite.py) — required for cross-engine hash equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


def _dec_sum(col):
    """Order-independent revenue sum: exact decimal accumulation."""
    return F.sum(col.cast("decimal(30,8)")).cast("double")


def _volume():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q7_volume_shipping",
    "J1,J2,A4,F4,F8",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(30,8))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. nation joins twice under different roles (supplier side /
    customer side) — both broadcast; the disjunctive nation-pair filter
    is applied post-join on broadcast columns, so the fact pipeline
    stays one shuffle (orders⋈lineitem key)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_13") & (F.col("cust_nation") == "NATION_19"))
            | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_13"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dec_sum(_volume()).alias("revenue"))


@register(
    "q8_market_share",
    "J1,J2,A4,F4,F8",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3'
                               THEN CAST(volume AS DECIMAL(30,8))
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(30,8))) AS DOUBLE),
                 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional PROMO-part revenue
    per order year — conditional aggregation (share = CASE-sum / sum).
    Both sums accumulate exactly in decimal; the final double division
    is then bit-identical across engines, so round(.,6) is hash-safe."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol_dec = _volume().cast("decimal(30,8)")
    national = F.when(F.col("nation") == "NATION_3", vol_dec).otherwise(F.lit(0).cast("decimal(30,8)"))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(vol_dec).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    "J1,J2,A4,F1,F4",
    oracle="""
    SELECT nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(30,8))) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit omits the
    supply-cost term): per supplier-nation, per order-year revenue on
    parts whose name matches a substring. The contains-filter prunes
    part before the broadcast."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(_dec_sum(_volume()).alias("sum_profit"))


@register(
    "q13_customer_distribution",
    "J2,A4,A5",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a left outer join
    with an extra join-condition predicate (the original's comment
    filter, here on o_orderpriority). count(col) counts matched rows
    only — NULL-preserving outer-join semantics are load-bearing."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    "J1,A4,O3",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue "view" reused twice — once as join
    input, once for the scalar max. Equality against the max is safe
    because both engines derive the double from the same exact decimal
    sum. In Spark the view is a cached-plan subtree; the scalar max is
    a broadcast join of one row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dec_sum(_volume()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    "J1,J2,A4,P6",
    oracle="""
    WITH thresholds AS (
        SELECT l_partkey AS t_partkey,
               CAST(0.2 * (sum(CAST(l_quantity AS DECIMAL(30,8))) / count(*))
                    AS DOUBLE) AS qty_threshold
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / 7.0,
                 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thresholds ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into a
    grouped threshold table joined back to lineitem — the standard
    rewrite Spark itself applies to the correlated form. The threshold
    avg accumulates exactly in decimal so the `<` comparison cannot
    flip on reduction order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(30,8)")) / F.count(F.lit(1)))
        )
        .cast("double")
        .alias("qty_threshold")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return joined.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast("double") / 7.0, 2
        ).alias("avg_yearly")
    )


@register(
    "q21_waiting_supplier",
    "J2,J3,A4,F4",
    oracle="""
    WITH flag AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    per_o AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
        FROM flag GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM flag
    JOIN per_o USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" is l_shipdate > o_orderdate +
    60 days, as lineitem has no commit/receipt dates): suppliers who
    were the *sole* late supplier on a finalized multi-supplier order.
    The exists / not-exists self-joins of the original are expressed as
    one pass of per-(order,supplier) flags plus per-order counts — two
    aggregations on the same shuffle key instead of two extra joins
    over lineitem, which is strictly better at 100 TB (lineitem is
    read once)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        flagged.filter(F.col("is_late") == 1)
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("o_key"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q16_supplier_part_variety",
    "J1,J2,A5,P6",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_size IN (1, 4, 7, 10, 13)
      AND p_type NOT LIKE 'PROMO%'
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem stands in for the absent
    partsupp as the part↔supplier bridge): distinct-supplier count per
    (brand, type) with negated predicates (<>, NOT LIKE, IN). The
    distinct agg expands to a two-phase hash aggregate keyed on
    (brand, type, suppkey) — the shuffle carries unique triples only."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 4, 7, 10, 13)
        & ~F.col("p_type").like("PROMO%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shipments",
    "J3,A4,P6",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%gear%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    ),
    total AS (SELECT CAST(sum(CAST(qty AS DECIMAL(30,8))) AS DOUBLE) AS total_qty
              FROM shipped)
    SELECT s_suppkey, s_name, round(qty, 2) AS qty
    FROM supplier
    JOIN shipped ON s_suppkey = l_suppkey
    CROSS JOIN total
    WHERE qty > 0.012 * total_qty
    """,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity stands in for the
    absent partsupp availability): suppliers whose shipped quantity of
    name-matched parts in a year exceeds a fraction of the total — a
    grouped sum reused as both join input and scalar threshold (same
    decorrelation pattern as Q15)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("qty"))
    )
    # decimal-exact re-sum: keeps the strict 1.2%-of-total membership
    # filter order-independent across engines (same fix as q11's tot)
    total = shipped.agg(_dec_sum(F.col("qty")).alias("total_qty"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        shipped.crossJoin(F.broadcast(total))
        .filter(F.col("qty") > 0.012 * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("qty", 2).alias("qty"))
    )


@register(
    "q6_forecast_revenue",
    "P3,P6,A1",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,8)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change — a pure scan-filter-aggregate.
    All three predicates (timestamp range, double range, double bound)
    push to the parquet scan as min/max row-group filters, the
    projection prunes to 4 columns, and the sum runs partial-before-
    exchange — the plan is a single narrow stage ending in a 1-row
    exchange. The simplest query in the suite and the purest pushdown
    check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "q2_min_cost_supplier",
    "J1,J2,A4,W3 (correlated min → window rewrite)",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    pc AS (
        SELECT p_partkey, p_brand, s_name, n_name, s_acctbal, supplycost
        FROM part
        JOIN cost ON p_partkey = l_partkey
        JOIN eu ON l_suppkey = s_suppkey
        WHERE p_size = 11 AND p_type = 'ECONOMY'
    )
    SELECT p_partkey, p_brand, s_name, n_name,
           round(s_acctbal, 2) AS s_acctbal,
           CAST(floor(supplycost * 10000) AS BIGINT) AS supplycost_e4
    FROM pc
    WHERE supplycost = (SELECT min(supplycost) FROM pc i
                        WHERE i.p_partkey = pc.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the absent partsupp's supplycost is the
    observed min unit price per (part, supplier) in lineitem): for each
    filtered part, the European supplier(s) offering the minimum cost.
    The correlated min subquery decorrelates to a window min over
    p_partkey — one extra shuffle on the group key instead of a
    re-scan + self-join. Dims (part slice, supplier⋈nation⋈region)
    broadcast; lineitem shuffles once on (l_partkey, l_suppkey) for the
    cost aggregate, and AQE coalesces the window exchange after the
    dim filters cut cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 11) & (F.col("p_type") == "ECONOMY")
    )
    pc = (
        cost.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal", "supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        pc.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            # floor of the SAME IEEE double scaled by 1e4 on both
            # engines — boundary-free, unlike round(x, 4), whose
            # half-way cases split Spark's exact-decimal HALF_UP from
            # DuckDB's scaled-float rounding (one 4th-decimal flip
            # surfaced at sf0.1; see BASELINE.md round-8 notes)
            F.floor(F.col("supplycost") * 10000).alias("supplycost_e4"),
        )
    )


@register(
    "q11_important_stock",
    "J1,A4,A1 (grouped value vs scalar-subquery threshold)",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
                   AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total,
                   count(*) AS n
            FROM val)
    SELECT l_partkey AS p_partkey, round(value, 2) AS value
    FROM val CROSS JOIN tot
    WHERE value > 1.5 * total / n
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: shipped line value by European
    suppliers stands in for partsupp stock value, and the qualifying
    fraction is 1.5× the mean part value rather than TPC-H's
    0.0001/SF — scale-free, so the query returns rows at every sf):
    parts whose value exceeds a scalar-subquery threshold. The grouped
    sum is computed once and reused as both the join input and (via a
    1-row cross join) the threshold — the Q15/Q20 decorrelation
    pattern. Supplier⋈nation⋈region broadcast; one fact shuffle on
    l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dec_sum(F.col("l_extendedprice")).alias("value"))
    )
    # decimal-exact total: value is a decimal-summed double (≤ 8 frac
    # digits, well under 2^53), so re-quantizing is lossless and makes
    # the strict threshold compare order-independent across engines
    tot = val.agg(
        _dec_sum(F.col("value")).alias("total"), F.count(F.lit(1)).alias("n")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 1.5 * F.col("total") / F.col("n"))
        .select(F.col("l_partkey").alias("p_partkey"), F.round("value", 2).alias("value"))
    )
