"""Composite TPC-H-shaped queries — multi-join + aggregation + top-k
pipelines exercising the operator surface end-to-end (the shapes a user
of the engine actually writes; SURVEY §7 M1 "keystone" tier).

Scale notes: these are the canonical star-join plans — dims broadcast,
fact-fact joins shuffle on the shared key, aggregation is partial before
the exchange, ordered limits take the TakeOrderedAndProject path. AQE
re-plans broadcast/skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "q3_shipping_priority",
    "J1,J2,A4,O3,F4",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, grouped revenue, ordered limit."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        # raw parquet timestamps surface as TIMESTAMP_NTZ in Spark 4;
        # cast to session-TZ timestamp to match the oracle's TIMESTAMP
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q5_local_supplier_volume",
    "J1,J2,A4,F4",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with a same-nation residual
    predicate; nation/region/supplier broadcast, facts shuffle once."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # exact decimal accumulation: a double sum's order-dependent last
    # ULP can flip 2dp rounding on boundary values (seen at sf0.001) —
    # per-term decimal quantization is deterministic on both engines
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,8)")
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue")
    )


@register(
    "q12_shipmode_priority",
    "J2,A4,F8,F4",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation buckets."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    "J1,A1,F8",
    oracle="""
    SELECT round(
        100.00 * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-08-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share; part broadcasts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-08-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
    )


@register(
    "q4_order_priority",
    "J3,A4,F4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join with a correlated range
    predicate, then grouped counts."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q19_disjunctive_predicates",
    "P6,J1,A1",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 20
           AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 40
           AND l_quantity >= 20 AND l_quantity <= 40)
       OR (p_brand = 'Brand#7' AND l_discount < 0.03)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    extracts the common join key and pushes per-side conjuncts; the
    disjunction evaluates post-probe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 40)
        )
        | ((F.col("p_brand") == "Brand#7") & (F.col("l_discount") < 0.03))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q22_global_sales_opportunity",
    "P5,A2,F1,A4 (scalar subquery + anti-join)",
    oracle="""
    WITH wealthy AS (
        SELECT c_custkey, c_nationkey % 7 AS cc, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    )
    SELECT cc, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM wealthy w
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = w.c_custkey AND o.o_totalprice > 400000)
    GROUP BY cc
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average —
    broadcast as a one-row literal), anti-join against orders, grouped
    totals by a derived code."""
    cust = load_table(spark, sf_dir, "customer")
    # uncorrelated scalar subquery as a broadcast one-row cross join —
    # stays fully declarative (no driver-side collect)
    avg_df = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    wealthy = (
        cust.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", (F.col("c_nationkey") % 7).alias("cc"), "c_acctbal")
    )
    # "no recent big order" anti-join side (plain no-orders is empty at
    # the tested SFs — every wealthy customer has some order)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    no_orders = wealthy.join(
        orders, wealthy.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("cc").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@register(
    "q10_returned_items",
    "J1,J2,A4,O3",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)))
                AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers with returned
    items — 4-way join, decimal-exact revenue (order-independent
    rounding), ordered limit."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,8)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q18_large_orders",
    "J2,A4,P6 (HAVING via subquery)",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c_name, o_orderkey, round(o_totalprice, 2) AS price,
           round(total_qty, 2) AS total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate → HAVING filter → join back to the
    fact and dim. The aggregate side shrinks before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@register(
    "l10_corpus_prep",
    "L1,L5,A8 (end-to-end training-data prep)",
    oracle="""
    WITH cleaned AS (
        SELECT doc_id, lang,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(lower(text), '[\\x00-\\x1f]', ' ', 'g'),
                           'https?://[^ ]+', '<url>', 'g'),
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
                   '\\s+', ' ', 'g')) AS clean
        FROM documents
    ),
    quality AS (
        SELECT * FROM cleaned
        WHERE len(list_filter(string_split(clean, ' '), x -> x <> '')) >= 12
          AND lang IN ('en', 'de')
    ),
    dedup AS (
        SELECT md5(clean) AS h, min(doc_id) AS doc_id FROM quality GROUP BY 1
    ),
    survivors AS (
        SELECT d.doc_id, q.clean FROM dedup d JOIN quality q ON q.doc_id = d.doc_id
    ),
    t AS (
        SELECT doc_id, list_filter(string_split(clean, ' '), x -> x <> '') AS toks
        FROM survivors
    ),
    s AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / 24 AS INT) AS chunk_idx,
           md5(array_to_string(list_slice(toks, start, start + 31), ' ')) AS chunk_hash,
           CAST(len(list_slice(toks, start, start + 31)) AS INT) AS n_tokens
    FROM s
    """,
)
def l10_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-data-pipeline composite: normalize text → drop
    low-quality and out-of-scope-language docs → exact-dedup on the
    *cleaned* form (normalization-aware: byte-different but
    content-equal docs collapse) → chunk survivors into overlapping
    32-token windows for embedding/indexing. Chunks leave as md5
    digests — at 100 TB the gate ships hashes, not text.

    Plan shape: narrow maps end-to-end except two shuffles — the dedup
    groupBy(md5) (16-byte keys) and the survivor join-back. Chunking is
    an explode, no shuffle. Every stage is an operator the registry
    also checks in isolation (l5g, l5c, l1, l8)."""
    from actuarial_reserve_modelling_spark.operators.textstats import (
        chunk_documents,
        clean_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    cleaned = clean_text(docs).join(docs.select("doc_id", "lang"), "doc_id")
    n_toks = F.size(F.expr("filter(split(clean, ' '), x -> x != '')"))
    quality = cleaned.filter((n_toks >= 12) & F.col("lang").isin("en", "de"))
    dedup = quality.groupBy(F.md5("clean").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = dedup.join(quality.select("doc_id", "clean"), "doc_id")
    chunks = chunk_documents(survivors, chunk_tokens=32, overlap=8, text_col="clean")
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_hash"),
        "n_tokens",
    )
