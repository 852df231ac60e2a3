"""Remaining surface fill-ins: multiset set-ops, nth_value windows,
edit-distance fuzzy matching, bit aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "o5b_multiset_ops",
    "O5",
    oracle="""
    SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey % 2 = 0
        INTERSECT ALL
        SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0
    ) GROUP BY nationkey
    UNION ALL
    SELECT 'except_all', nationkey, count(*) FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey % 2 = 0
        EXCEPT ALL
        SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0
    ) GROUP BY nationkey
    """,
)
def o5b_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset (bag) semantics, preserving
    duplicate counts, vs o5's distinct forms."""
    cust = load_table(spark, sf_dir, "customer")
    evens = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    thirds = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    ia = (
        evens.intersectAll(thirds)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        evens.exceptAll(thirds)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionByName(ea)


@register(
    "w7_nth_value",
    "W2",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order
    FROM orders
    WHERE o_custkey % 120 = 11
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def w7_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / whole-partition last_value (unbounded both ways)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 120 == 11)
    w_running = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w_running).alias("second_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


@register(
    "l9_fuzzy_levenshtein",
    "L2,F1",
    oracle="""
    WITH heads AS (
        -- length(text) >= 24 mirrors levenshtein_pairs' documented
        -- skip-short contract (strings shorter than q*(d+1) can't be
        -- q-gram-blocked); without it a corpus with any short doc
        -- would diverge from the Spark side
        SELECT doc_id, substr(text, 1, 24) AS head
        FROM documents WHERE doc_id < 40 AND length(text) >= 24
    )
    SELECT a.doc_id d1, b.doc_id d2,
           CAST(levenshtein(a.head, b.head) AS INT) AS dist
    FROM heads a JOIN heads b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 11
    """,
)
def l9_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over 24-char document heads via
    positional q-gram blocking (operators/dedup.py levenshtein_pairs) —
    exact candidate guarantee (q=2 grams, d=11: every qualifying pair
    shares ≥ 24−2+1−22 = 1 positional gram), equi-join candidates, DP
    levenshtein verify. No all-pairs / BNLJ stage; the oracle is the
    brute-force DuckDB self-join."""
    from actuarial_reserve_modelling_spark.operators.dedup import levenshtein_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    heads = docs.select("doc_id", F.substring("text", 1, 24).alias("head"))
    return levenshtein_pairs(heads, max_dist=11, q=2)


@register(
    "a18_count_if_mode",
    "A5,F8 (conditional/modal aggregates)",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
               CAST(count_if(l_quantity >= 30) AS BIGINT) AS n_bulk
        FROM lineitem GROUP BY l_returnflag
    ),
    qc AS (
        SELECT l_returnflag, l_quantity, count(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (SELECT l_returnflag, max(c) AS mc FROM qc GROUP BY 1),
    modal AS (
        SELECT qc.l_returnflag, min(l_quantity) AS modal_qty
        FROM qc JOIN m ON qc.l_returnflag = m.l_returnflag AND qc.c = m.mc
        GROUP BY qc.l_returnflag
    )
    SELECT base.l_returnflag, n_discounted, n_bulk, modal_qty
    FROM base JOIN modal ON base.l_returnflag = modal.l_returnflag
    """,
)
def a18_count_if_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if conditional counting + an explicitly tie-broken modal
    value (max frequency, ties → smallest value). The built-in mode()
    exists in both engines but resolves ties arbitrarily — at sf0.001
    they disagree — so checked queries must pin the tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 30).alias("n_bulk"),
    )
    qc = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    modal = qc.groupBy("l_returnflag").agg(
        F.max_by(
            "l_quantity", F.struct(F.col("c"), (-F.col("l_quantity")).alias("neg"))
        ).alias("modal_qty")
    )
    return base.join(modal, "l_returnflag")


@register(
    "f4c_month_grid",
    "F4,O4 (calendar grid + zero-fill)",
    oracle="""
    WITH ext AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL '1 month')) AS TIMESTAMP)
               AS month
        FROM ext
    ),
    per_month AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               count(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT g.month, CAST(coalesce(p.n, 0) AS BIGINT) AS n_orders
    FROM grid g LEFT JOIN per_month p ON g.month = p.month
    """,
)
def f4c_month_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete month grid between data extents with zero-filled counts
    (the calendar-dimension pattern: no missing months in reports)."""
    orders = load_table(spark, sf_dir, "orders")
    ext = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    grid = ext.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    per_month = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.count(F.lit(1)).alias("n"))
    return grid.join(per_month, "month", "left").select(
        "month", F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders")
    )


@register(
    "a17_bit_aggregates",
    "A5 (bitwise family)",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_custkey) AS all_and,
           bit_or(o_custkey) AS any_or,
           bit_xor(o_custkey) AS parity
    FROM orders WHERE o_orderkey % 50 = 21
    GROUP BY o_orderstatus
    """,
)
def a17_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor grouped aggregates (flag-mask
    folding; order-independent by construction)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 21)
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_custkey").alias("all_and"),
        F.bit_or("o_custkey").alias("any_or"),
        F.bit_xor("o_custkey").alias("parity"),
    )


@register(
    "s9_json_roundtrip",
    "S3,S5 (JSON lines source/sink)",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders WHERE o_orderkey % 200 = 1
    """,
)
def s9_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → schema-enforced re-read, checked against the
    direct parquet answer — value fidelity through the text format is
    the point (Spark writes shortest-round-trip doubles, so the re-read
    double is bit-identical). Explicit read schema: schema inference on
    JSON is a full extra pass at 100 TB and is never what you want."""
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s9", sf_dir)
    out = root + "/orders_json"
    if fresh:
        orders = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 200 == 1)
            .select(
                "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
            )
        )
        orders.write.mode("overwrite").json(out)
        staging_commit(root)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(out)


@register(
    "s10_schema_evolution",
    "S3,S6 (mergeSchema read across evolving batches)",
    oracle="""
    SELECT CAST(1 AS INT) AS batch, count(*) AS n,
           round(sum(c_acctbal), 2) AS bal, CAST(0 AS BIGINT) AS n_seg
    FROM customer WHERE c_custkey % 4 = 0
    UNION ALL
    SELECT CAST(2 AS INT), count(*), round(sum(c_acctbal), 2), count(c_mktsegment)
    FROM customer WHERE c_custkey % 4 = 1
    """,
)
def s10_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across ingest batches: batch 1 lacks a column
    that batch 2 adds; ``mergeSchema`` resolves the union schema and
    back-fills NULL. The production pattern for append-only datasets
    whose schema widens over time — the alternative (rewriting old
    batches) is a non-starter at 100 TB. mergeSchema's footer-merge cost
    is per-file at plan time; pin the merged schema explicitly once it
    stabilizes."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s10", sf_dir)
    out = root + "/cust"
    if fresh:
        cust = load_table(spark, sf_dir, "customer")
        cust.filter(F.col("c_custkey") % 4 == 0).select(
            "c_custkey", "c_acctbal"
        ).write.mode("overwrite").parquet(out + "/batch=1")
        cust.filter(F.col("c_custkey") % 4 == 1).select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        ).write.mode("overwrite").parquet(out + "/batch=2")
        staging_commit(root)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
        F.count("c_mktsegment").alias("n_seg"),
    )


@register(
    "f5c_explode_outer",
    "F5,O4 (NULL-preserving unnest)",
    oracle="""
    SELECT p_partkey,
           unnest(CASE WHEN p_partkey % 5 = 0
                       THEN [CAST(NULL AS VARCHAR)]
                       ELSE string_split(p_name, ' ') END) AS word
    FROM part
    WHERE p_partkey % 3 = 1
    """,
)
def f5c_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with an empty/NULL array survive as a single
    NULL row (plain explode drops them — silently losing parents is the
    classic unnest bug in fact tables). The oracle spells the same
    semantics with a [NULL] CASE pad, since DuckDB's unnest drops
    empties too."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 1)
    arr = F.when(
        F.col("p_partkey") % 5 == 0, F.lit(None).cast("array<string>")
    ).otherwise(F.split("p_name", " "))
    return part.select("p_partkey", F.explode_outer(arr).alias("word"))


@register(
    "s11_orc_roundtrip",
    "S3,S5 (ORC source/sink)",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_custkey % 3 = 0
    GROUP BY c_mktsegment
    """,
)
def s11_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → re-read → aggregate, checked against the direct
    parquet answer. ORC is the other columnar format Spark speaks
    natively (predicate pushdown, column pruning, zlib/zstd) — parity
    for shops whose lake is ORC/Hive."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s11", sf_dir)
    out = root + "/cust_orc"
    if fresh:
        cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
        cust.write.mode("overwrite").orc(out)
        staging_commit(root)
    back = spark.read.orc(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )


@register(
    "s13_compaction_roundtrip",
    "S6,S7 (small-file compaction preserves contents)",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 5 = 0
    GROUP BY o_orderpriority
    """,
)
def s13_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction under the oracle: the orders slice is
    written as SIX per-epoch append directories (the layout the
    streaming ingest gates produce), compacted into two files
    (sources/sinks.py::compact_parquet_dir), and the aggregate over the
    compacted layout must equal the direct answer — contents exactly
    preserved while the file count drops an order of magnitude. The
    operational OPTIMIZE step that keeps an append-heavy 100 TB layout
    readable."""
    import os

    from actuarial_reserve_modelling_spark.sources.sinks import (
        compact_parquet_dir,
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s13", sf_dir)
    out = root + "/epochs"
    if fresh:
        orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
        for e in range(6):
            orders.filter(F.col("o_orderkey") % 6 == e).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"e{e}"))
        n_files = compact_parquet_dir(spark, out, target_files=2)
        assert n_files <= 2, n_files
        staging_commit(root)
    back = spark.read.option("recursiveFileLookup", "true").parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "o9_dataset_diff",
    "O5,J2,S7 (snapshot diff: added/removed/changed keys)",
    oracle="""
    WITH oldv AS (
        SELECT o_orderkey, substr(md5(CAST(o_totalprice AS VARCHAR)
                   || CAST(o_orderstatus AS VARCHAR)), 1, 16) AS h
        FROM orders WHERE o_orderkey % 89 <> 0
    ),
    newv AS (
        SELECT o_orderkey,
               substr(md5(CAST(
                   CASE WHEN o_orderkey % 97 = 0
                        THEN round(o_totalprice + 1.5, 2) ELSE o_totalprice END
                   AS VARCHAR) || CAST(o_orderstatus AS VARCHAR)), 1, 16) AS h
        FROM orders WHERE o_orderkey % 83 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                WHEN o.h <> n.h THEN 'changed' END AS change_type
    FROM oldv o FULL OUTER JOIN newv n USING (o_orderkey)
    WHERE (o.h IS NULL) OR (n.h IS NULL) OR (o.h <> n.h)
    """,
)
def o9_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (sources/sinks.py::dataset_diff): the old snapshot
    drops keys %89=0, the new one drops %83=0 and bumps %97=0 prices —
    the diff must report exactly the removed, added, and changed keys.
    Both sides collapse map-side to (key, 16-byte hash) before one
    full-outer join; unchanged keys never leave the join stage."""
    from actuarial_reserve_modelling_spark.sources.sinks import dataset_diff

    orders = load_table(spark, sf_dir, "orders")
    oldv = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    newv = orders.filter(F.col("o_orderkey") % 83 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.round(F.col("o_totalprice") + 1.5, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    return dataset_diff(oldv, newv, key_cols=["o_orderkey"])


@register(
    "s14_bucketed_colocated_join",
    "S6,J2,A4 (bucketed-table co-located join — shuffle paid once at write time)",
    oracle="""
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def s14_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over bucketed managed tables
    (sources/sinks.py::write_bucketed): customer and orders are both
    persisted hash-bucketed AND sorted on the customer key, so the
    subsequent join needs NO exchange and NO sort on either side — the
    write-once/join-many layout for recurring fact⨝fact joins at
    100 TB, where neither side broadcasts and an every-query shuffle
    is the dominant cost. Correctness here is strategy-agnostic (the
    oracle is the plain join aggregate); the exchange-free plan shape
    is pinned by tests/test_relational.py::
    test_bucketed_join_has_no_exchange."""
    from actuarial_reserve_modelling_spark.sources.sinks import write_bucketed

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.rsplit("sf", 1)[-1])
    cust_t, ord_t = f"s14_cust_{tag}", f"s14_ord_{tag}"
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    write_bucketed(cust, cust_t, "c_custkey", buckets=8)
    write_bucketed(orders, ord_t, "c_custkey", buckets=8)
    return (
        spark.table(cust_t)
        .join(spark.table(ord_t), "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
