"""Window functions, ntile bucketing, as-of join, scalar-function surface
(SURVEY §2.3 J5, §2.6 W1-W4, §2.7 O2, §2.8 F1-F8).

Window queries shuffle once on the partition key then sort within
partitions; at 100 TB the partition key (custkey/user_id) has millions
of distinct values, so parallelism holds and AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.joins import asof_join
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "w1_ranking",
    "W1",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk
    FROM orders
    WHERE o_custkey % 50 = 3
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank; rank keys deliberately tie on the
    3-value o_orderstatus to exercise rank-vs-dense_rank semantics."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 3)
    w_rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
        F.rank().over(w_rank).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_rank).cast("bigint").alias("drnk"),
    )


@register(
    "w2_lag_lead",
    "W2",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 6) AS delta,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type
    FROM events
    WHERE user_id % 20 = 1
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first over a per-user event timeline."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 1)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


@register(
    "w3_running_agg",
    "W3",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    WHERE user_id % 20 = 2
    """,
)
def w3_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over row frames: running sum + 3-row moving average."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 2)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg"),
    )


@register(
    "w4_topk_per_group",
    "W4",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark's WindowGroupLimit pushes the
    rn<=3 limit into the sort (partial top-k before the shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), F.col("rn").cast("bigint").alias("rn"))
    )


@register(
    "o2_ntile_bucketing",
    "O2,W1",
    oracle="""
    SELECT bucket, count(*) AS n, min(c_custkey) AS lo, max(c_custkey) AS hi
    FROM (SELECT c_custkey, ntile(8) OVER (ORDER BY c_custkey) AS bucket FROM customer)
    GROUP BY bucket
    """,
)
def o2_ntile_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's static ceil-div file partitioning
    (entrypoint.sh:8-11) as ntile over a sorted domain. The global-order
    window is single-partition — fine for bucket *assignment* demos; the
    scale path for actual repartitioning is repartitionByRange."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_custkey")
    return (
        cust.select("c_custkey", F.ntile(8).over(w).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_custkey").alias("lo"),
            F.max("c_custkey").alias("hi"),
        )
    )


@register(
    "j5_asof_join",
    "J5",
    oracle="""
    SELECT p.event_id, p.user_id, round(p.value, 4) AS purchase_value,
           c.ts AS ts_click, round(c.value, 4) AS value_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase ↔ the same user's most recent click at
    or before it (union + ordered window, operators/joins.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        value_cols=["ts", "value"],
        suffix="_click",
        allow_exact_matches=True,
        right_tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        "ts_click",
        F.round("value_click", 4).alias("value_click"),
    )


@register(
    "j4b_pure_range_join",
    "J4",
    oracle="""
    WITH intervals AS (
        SELECT DISTINCT date_trunc('hour', ts) AS lo,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS hi
        FROM events WHERE event_id % 97 = 0
    )
    SELECT lo, count(*) AS n, CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                       ELSE 0 END) AS BIGINT) AS n_clicks
    FROM events JOIN intervals ON ts >= lo AND ts < hi
    GROUP BY lo
    """,
)
def j4b_pure_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure point-in-interval join (no equi key): Spark's native plan is
    a nested loop; bucketed_range_join (operators/joins.py) makes it a
    hash join on quantized time buckets + residual filter."""
    from actuarial_reserve_modelling_spark.operators.joins import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    intervals = (
        ev.filter(F.col("event_id") % 97 == 0)
        .select(F.date_trunc("hour", "ts").alias("lo"))
        .distinct()
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = bucketed_range_join(
        ev.select("ts", "event_type"), intervals, "ts", "lo", "hi", bucket_seconds=3600
    )
    return joined.groupBy("lo").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n_clicks"),
    )


# --- F: scalar function surface --------------------------------------------


@register(
    "f1_f2_string_funcs",
    "F1,F2",
    oracle="""
    SELECT split_part(p_name, ' ', 1) AS color,
           count(*) AS n,
           min(upper(p_brand)) AS first_brand,
           max(concat(p_brand, ':', cast(p_size AS VARCHAR))) AS max_label
    FROM part
    GROUP BY split_part(p_name, ' ', 1)
    """,
)
def f1_f2_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part/upper/concat/cast — the entrypoint.sh basename/strip
    string handling (F1) and float↔string casts (F2), JVM-side."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.withColumn("color", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
        .groupBy("color")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.upper("p_brand")).alias("first_brand"),
            F.max(F.concat("p_brand", F.lit(":"), F.col("p_size").cast("string"))).alias(
                "max_label"
            ),
        )
    )


@register(
    "f3_math_funcs",
    "F3",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS weeks,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(pow(l_tax, 2), 8) AS tax_sq,
           abs(l_quantity - 25) AS qdist
    FROM lineitem
    WHERE l_orderkey % 250 = 9
    """,
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor/ceil/ln/pow/abs (the kernel's floor-cast at main.rs:70 and
    rate arithmetic at main.rs:67, as built-ins)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 250 == 9)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") / 7.0).alias("weeks"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.pow("l_tax", F.lit(2)), 8).alias("tax_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qdist"),
    )


@register(
    "f4_date_funcs",
    "F4",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           year(o_orderdate) AS yr,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def f4_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/year over the (never-parsed-by-the-reference) date
    columns (main.rs:22) — our DateType extension (SURVEY §1.2)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "f5_array_funcs",
    "F5",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
)
def f5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size/element_at/transform/aggregate over the embedding
    column — all JVM-side higher-order functions, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(sq, 4).alias("sq_norm"),
    )


@register(
    "f6_struct_map",
    "F6",
    oracle="""
    SELECT c_custkey, c_mktsegment AS seg_from_struct, c_nationkey + 1000 AS mapped
    FROM customer WHERE c_custkey % 100 = 5
    """,
)
def f6_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct and a map, then access fields — round-trips nested
    types; output is flat so the oracle is plain columns."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 5)
    nested = cust.select(
        "c_custkey",
        F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")).alias("s"),
        F.create_map(F.lit("nk"), F.col("c_nationkey") + 1000).alias("m"),
    )
    return nested.select(
        "c_custkey",
        F.col("s.seg").alias("seg_from_struct"),
        F.element_at("m", "nk").alias("mapped"),
    )


@register(
    "f7_json_extract",
    "F7",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT)
    """,
)
def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f8_case_coalesce",
    "F8",
    oracle="""
    SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def f8_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif conditionals."""
    orders = load_table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
    )
    prio = F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!"))
    return (
        orders.select(status.alias("status"), prio.alias("prio"))
        .groupBy("status", "prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "j5b_asof_tolerance",
    "J5 (strict inequality + tolerance)",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.ts END
               AS ts_click,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
                THEN round(c.value, 4) END AS value_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
)
def j5b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join variant: strictly-before match (allow_exact_matches
    False) with a 30-minute tolerance — matches older than the window
    are nulled, pandas merge_asof semantics. Same single-shuffle
    union+window plan as j5; the oracle is DuckDB's native ASOF JOIN
    (strict '>') with the tolerance applied as a CASE."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        value_cols=["ts", "value"],
        suffix="_click",
        allow_exact_matches=False,
        right_tiebreak="event_id",
        tolerance="30 MINUTE",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_click",
        F.round("value_click", 4).alias("value_click"),
    )
