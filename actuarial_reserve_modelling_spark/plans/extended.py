"""Extended surface: remaining SURVEY §2 rows and the SQL front door.

Covers S4 (object-listing source), J2 full outer, A7 cube, F4 date
arithmetic, pivot, correlated subqueries via ``spark.sql`` (the parser /
planner front door — Catalyst is our optimizer, SURVEY §7), and a real
Python UDTF (U4's general form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table, register_views
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "s4_listing_source",
    "S4",
    # The driver always runs oracles at sf0.01, so the listing path is
    # pinned to that dir; read_blob() mirrors binaryFile's (path, length).
    oracle="""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           CAST(size AS BIGINT) AS size_bytes
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    WHERE size > 0
    ORDER BY file_name
    """,
)
def s4_listing_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store listing with predicates — the Lambda's size>0 +
    suffix filter (calculate_average_reserves.py:28-31) over Spark's
    distributed FileIndex (binaryFile source; driver-side listing
    parallelizes across executors for large prefixes)."""
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return (
        listing.filter((F.col("length") > 0) & F.col("path").endswith(".parquet"))
        .select(
            F.regexp_extract("path", "[^/]+$", 0).alias("file_name"),
            F.col("length").alias("size_bytes"),
        )
        .orderBy("file_name")
    )


@register(
    "j2b_full_outer_join",
    "J2",
    oracle="""
    WITH o AS (SELECT * FROM orders WHERE o_custkey % 3 = 0 AND o_orderkey % 7 = 0),
         c AS (SELECT * FROM customer WHERE c_custkey % 5 = 0)
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_null,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_null,
           count(DISTINCT coalesce(o_custkey, c_custkey)) AS n_keys
    FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey
    """,
)
def j2b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi-join with both-sided null production; summary
    aggregate keeps the checked output compact. DuckDB sum(CASE) yields
    HUGEINT → casts align to bigint."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") % 3 == 0) & (F.col("o_orderkey") % 7 == 0)
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    j = o.join(c, o.o_custkey == c.c_custkey, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_left_null"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_right_null"),
        F.countDistinct(F.coalesce("o_custkey", "c_custkey")).alias("n_keys"),
    )


@register(
    "a7b_cube",
    "A7",
    oracle="""
    SELECT c_mktsegment, c_nationkey % 5 AS nk_mod, count(*) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey % 5)
    """,
)
def a7b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two dims)."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "nk_mod", F.col("c_nationkey") % 5
    )
    return cust.cube("c_mktsegment", "nk_mod").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )


@register(
    "f4b_date_arith",
    "F4",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS BIGINT) AS days_since,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT) AS q
    FROM orders WHERE o_orderkey % 333 = 5
    """,
)
def f4b_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / interval add / calendar extraction. Spark's dayofweek
    is 1=Sunday..7 while DuckDB's is 0=Sunday..6, so the Spark
    expression subtracts 1 to align."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 333 == 5)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.quarter("o_orderdate").cast("int").alias("q"),
    )


@register(
    "q_sql_correlated_subquery",
    "SQL front door; P6,A2",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q_sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API front door: Catalyst parses/decorrelates the
    correlated scalar subquery into an aggregate + join — zero custom
    planner code (SURVEY §7 architecture stance)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q_pivot",
    "A4 (pivot form)",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list keeps the plan a single pass —
    unlisted-value pivots need a distinct-scan first)."""
    orders = load_table(spark, sf_dir, "orders")
    p = orders.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
    )


@register(
    "u1d_reserve_closed_form",
    "U1 (analytic companion), F3",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS id,
           round(100.0 / (exp(365.0 / (((c_custkey % 30) + 1) * 365.0)) - 1.0), 6)
               AS expected_reserve
    FROM customer
    """,
)
def u1d_reserve_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form E[reserve] = 100/(exp(365/term)-1) over the synthetic
    portfolio (functions/reserves.py expected_reserve_column, SURVEY
    §2.4) — the deterministic, hash-checkable companion of the stochastic
    U1 kernel, which stays under the analytic-tolerance pytest
    (tests/test_reserves.py). Pure JVM column arithmetic, no shuffle."""
    from actuarial_reserve_modelling_spark.catalog import synthetic_portfolio
    from actuarial_reserve_modelling_spark.functions.reserves import (
        expected_reserve_column,
    )

    pf = synthetic_portfolio(load_table(spark, sf_dir, "customer"))
    return pf.select(
        "id",
        F.round(expected_reserve_column(F.col("term")), 6).alias("expected_reserve"),
    )


@register(
    "u4b_python_udtf",
    "U4",
    oracle="""
    SELECT c_custkey, CAST(unnest(generate_series(1, c_custkey % 3 + 1)) AS INT) AS i,
           CAST((unnest(generate_series(1, c_custkey % 3 + 1))) ** 2 AS INT) AS sq
    FROM customer WHERE c_custkey % 200 = 11
    """,
)
def u4b_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 3.5+ arrow-backed table function) via
    LATERAL join — the general 1→N row form the explode path (u4) can't
    express when the expansion logic isn't a builtin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int, sq int")
    class ExpandSquares:
        def eval(self, n: int):
            for i in range(1, n + 1):
                yield i, i * i

    spark.udtf.register("expand_squares", ExpandSquares)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, t.i, t.sq
        FROM customer, LATERAL expand_squares(CAST(c_custkey % 3 + 1 AS INT)) t
        WHERE c_custkey % 200 = 11
        """
    )


@register(
    "s2_file_provenance",
    "S2,S6,F1",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def s2_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — directory-as-table scan with file provenance: the reference's
    dataset IS a directory of CSVs unioned in file order
    (entrypoint.sh:4), and per-file identity survives into the result
    (one output per input file, entrypoint.sh:21-22). Spark-native:
    write customer as a partitioned multi-file CSV directory, re-read
    the whole directory as ONE table, and recover each row's origin via
    ``input_file_name()`` — grouping by the parsed provenance must
    reproduce the per-segment aggregate computed directly."""
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s2", sf_dir)
    out = root + "/cust_csv"
    if fresh:
        cust = load_table(spark, sf_dir, "customer")
        (
            cust.select("c_custkey", "c_acctbal", "c_mktsegment")
            .repartition(2, F.col("c_mktsegment"))
            .write.mode("overwrite")
            .partitionBy("c_mktsegment")
            .option("header", True)
            .csv(out)
        )
        staging_commit(root)
    # file-level glob defeats hive partition discovery: provenance must
    # come from input_file_name(), not a reconstructed partition column
    back = spark.read.schema("c_custkey bigint, c_acctbal double").option(
        "header", True
    ).csv(out + "/c_mktsegment=*")
    prov = F.regexp_extract(F.input_file_name(), "c_mktsegment=([^/]+)", 1)
    return (
        back.withColumn("c_mktsegment", prov)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
    )


@register(
    "s7_resume_roundtrip",
    "S7,S6,P5",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def s7_resume_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — resumable write, resume-equals-fresh under the oracle: run 1
    writes only part of the dataset (simulated failure after one
    partition, like a preempted Batch array job), the resume pass lists
    the done partitions (entrypoint.sh:24's output-exists check), writes
    ONLY the missing ones via dynamic partition overwrite, and the final
    directory must aggregate identically to a fresh full write."""
    import os

    from actuarial_reserve_modelling_spark.sources.sinks import (
        overwrite_partitions,
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s7", sf_dir)
    out = root + "/orders"
    if fresh:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        # run 1: only status 'O' lands before the simulated failure
        overwrite_partitions(
            orders.filter(F.col("o_orderstatus") == "O"), out, ["o_orderstatus"]
        )
        # resume: done-set from the output listing; write only what's
        # missing
        done = [
            d.split("=", 1)[1]
            for d in os.listdir(out)
            if d.startswith("o_orderstatus=")
        ]
        remaining = orders.filter(~F.col("o_orderstatus").isin(done))
        overwrite_partitions(remaining, out, ["o_orderstatus"])
        staging_commit(root)
    return (
        spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE walk(k, root, depth, bal) AS (
        SELECT c_custkey, c_custkey, 0, CAST(c_acctbal AS DOUBLE)
        FROM customer WHERE c_custkey <= 50
        UNION ALL
        SELECT c2.c_custkey, w.root, w.depth + 1,
               w.bal + CAST(c2.c_acctbal AS DOUBLE)
        FROM walk w JOIN customer c2
          ON c2.c_custkey = CAST(floor(w.k / 2.0) AS BIGINT)
        WHERE w.k > 1
    )
    SELECT root, CAST(max(depth) AS INT) AS levels,
           round(max(bal), 2) AS path_bal
    FROM walk GROUP BY root
"""


@register(
    "q_recursive_cte",
    "U4,A4 (SQL surface: WITH RECURSIVE — iterative closure inside Catalyst)",
    oracle=_RECURSIVE_SQL,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x WITH RECURSIVE): walk each anchor
    customer's binary-tree ancestor chain (parent key = floor(k/2))
    accumulating depth and the running acctbal path sum — the
    transitive-closure / hierarchy-rollup SQL shape (BOM explosions,
    org charts) that previously needed a driver-side loop
    (dedup_clusters-style) or an external iteration. Catalyst executes
    the recursion as iterated UnionLoop steps with the same bounded
    anchor set per level; the oracle replays the identical recursion
    in DuckDB (floats added in the same recursion order, rounded at
    the end). Anchors bounded (c_custkey <= 50, depth <= 6) so the
    per-level join is a broadcast against the dim-sized customer
    table."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


@register(
    "s1_csv_roundtrip",
    "S1 (header CSV scan, explicit schema, FAILFAST)",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(sum(c_acctbal), 2) AS bal,
           count(DISTINCT c_nationkey) AS n_nations
    FROM customer WHERE c_custkey % 2 = 0
    GROUP BY c_mktsegment
    """,
)
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 as a direct hash-grade oracle row (VERDICT r12 task 5 — the
    one SURVEY row whose driver evidence was indirect): customer is
    written as HEADER CSV and re-read exactly the way the reference
    ingests its policy files (main.rs:17-24 reads a 9-column header CSV
    with a fixed schema and hard-fails on malformed rows) — header
    consumed, EXPLICIT schema (no inference pass — schema inference is
    a full extra read at 100 TB), ``mode=FAILFAST`` so a malformed row
    aborts the scan instead of silently nulling, then aggregated.
    Value fidelity through the text format is the point: Spark writes
    shortest-round-trip doubles, so the re-read double is bit-identical
    and the aggregate hashes equal to DuckDB's over the original
    parquet."""
    from pyspark.sql import types as T

    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    root, fresh = staging_dir("s1", sf_dir)
    out = root + "/customer_csv"
    if fresh:
        load_table(spark, sf_dir, "customer").filter(
            F.col("c_custkey") % 2 == 0
        ).write.mode("overwrite").option("header", "true").csv(out)
        staging_commit(root)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    cust = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(out)
    )
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )
