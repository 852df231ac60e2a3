"""Window tier 2 (range frames, distribution ranks) and reshaping
(unpivot/melt) — rounding out W-row and O-row coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "w5_range_frame",
    "W3",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW)
               AS n_last_30m,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW), 4)
               AS v_last_30m
    FROM events WHERE user_id % 25 = 3
    """,
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frames (trailing 30-minute aggregates per user) — the
    value-based frame built-in windows provide; unlike ROWS frames the
    bound is event-time, so ties and gaps are handled by value."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 3)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 60, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_30m"),
        F.round(F.sum("value").over(w), 4).alias("v_last_30m"),
    )


@register(
    "w6_distribution_ranks",
    "W1",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WHERE o_custkey % 100 = 7
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def w6_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a global ordering (single-partition
    window — acceptable because the filtered input is small; for full-
    table distribution ranks at scale, bucket into quantiles via
    approx_percentile instead)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "o7_unpivot",
    "O4 (reshape)",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    ) WHERE l_orderkey % 400 = 11
    """,
)
def o7_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — wide→long reshape (inverse of q_pivot), a plan-
    level expand with no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 400 == 11)
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    name = (
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax")
    )
    return melted.select(
        "l_orderkey", "l_linenumber", name.alias("metric"), F.round("val", 4).alias("val")
    )


@register(
    "w8_nulls_ordering",
    "W1,J2,F8",
    oracle="""
    SELECT c_custkey, c_nationkey, CAST(last_dt AS TIMESTAMP) AS last_dt, rnk
    FROM (
        SELECT c_custkey, c_nationkey, last_dt,
               CAST(row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY last_dt DESC NULLS LAST, c_custkey
               ) AS INT) AS rnk
        FROM (
            SELECT c_custkey, c_nationkey, max(o_orderdate) AS last_dt
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey, c_nationkey
        )
    )
    WHERE c_custkey % 10 = 0
    """,
)
def w8_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking over a NULLable sort key with explicit NULLS LAST —
    customers never having ordered sort after every real date. Engines
    disagree on default NULL placement (Spark: ASC=nulls first,
    DESC=nulls last; DuckDB: nulls last... by version), so checked
    queries must always say it explicitly; this row pins that rule."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    last_o = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.max("o_orderdate").alias("last_dt"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("last_dt").desc_nulls_last(), "c_custkey"
    )
    return (
        last_o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("last_dt").cast("timestamp").alias("last_dt"),
            "rnk",
        )
    )


@register(
    "w12_scd2_dimension",
    "W2,F4 (SCD2 changelog → validity intervals)",
    oracle="""
    WITH ch AS (
        SELECT user_id, event_type, ts, event_id
        FROM events WHERE user_id < 20
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL AS is_current
    FROM ch
    """,
)
def w12_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: turn a changelog into
    validity intervals — each change row's valid_to is the next change's
    timestamp (lead over the entity key; event_id tiebreaks equal
    timestamps deterministically), open intervals flagged current. One
    shuffle on the entity key; the standard warehouse pattern for
    dimension history at any scale (entities partition independently)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "w13_salted_topk",
    "W5,W4 (skew-safe two-phase top-k; joins the A12/J7 salting family)",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w13_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe top-3 orders per customer via operators/skew.py::
    salted_topk — the two-phase form whose phase-1 exchange hashes on
    (key, salt) so a hot customer's surviving rows spread over
    num_salts reducers instead of one (WindowGroupLimit bounds each
    phase's sort to k rows per group on both sides of its exchange).
    The oracle is the PLAIN single-window answer: (o_totalprice DESC,
    o_orderkey) is a total order within each customer, so the salted
    plan must reproduce it row for row — the equivalence claim under
    test."""
    from actuarial_reserve_modelling_spark.operators.skew import salted_topk

    orders = load_table(spark, sf_dir, "orders")
    out = salted_topk(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        num_salts=8,
        salt_cols=["o_orderkey"],
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.col("rn").cast("bigint").alias("rn"),
    )
