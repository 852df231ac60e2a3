"""Schemas and table loaders.

Two table groups (FIXTURES.md):

* Group A — the reference's own data contract: ``policies`` (CSV, 9
  positional columns — reference ``docker_files/src/main.rs:14-25``) and
  ``claims`` (``main.rs:27-32``, declared-but-unused probe side).
* Group B — the driver's synthetic star schema + LLM tables under
  ``/root/testdata/sf*/*.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Reference contract: 9 columns, positional, header row present but names
# ignored (main.rs:51 `deserialize(None)`). All numerics are f64
# (main.rs:17,23,24) — we keep DoubleType for byte-faithful parity.
POLICY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("age", T.DoubleType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("smoking_status", T.StringType(), True),
        T.StructField("occupation", T.StringType(), True),
        T.StructField("policy_type", T.StringType(), True),
        T.StructField("effective_date", T.StringType(), True),
        T.StructField("term", T.DoubleType(), True),
        T.StructField("premium", T.DoubleType(), True),
    ]
)

# Reference main.rs:27-32 (`Claim` struct: id, claim_amount, policy_id,
# claim_date) — the intended hash-join probe side (SURVEY §2.3).
CLAIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("claim_amount", T.DoubleType(), True),
        T.StructField("policy_id", T.StringType(), True),
        T.StructField("claim_date", T.StringType(), True),
    ]
)

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table (SURVEY §2.1 S3).

    A plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
    column pruning, and partition pruning — the 100 TB path is identical,
    just with an object-store URI.

    ``events.ts`` has shipped as two different parquet physical types
    across testdata generations: TIMESTAMP(NANOS) (which Spark's reader
    only accepts as raw int64 via the legacy ``nanosAsLong`` conf) and
    TIMESTAMP(MICROS) (loaded natively as TIMESTAMP_NTZ). The loader
    branches on what actually comes back so either generation works:

    * native timestamp / timestamp_ntz → cast to session-TZ ``timestamp``
      (session TZ is pinned UTC, so values are identical to the oracle's);
    * int64 (legacy nanosAsLong in effect) → truncate nanos → micros,
      the same truncation DuckDB applies.
    """
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` robustly across testdata timestamp generations."""
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) physical type: only readable as raw int64.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanosAsLong path: int64 nanos → micros → timestamp.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, T.TimestampType):
        # TIMESTAMP_NTZ (native micros read) → session-TZ timestamp so the
        # downstream schema matches what every query/oracle expects.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every Group-B table as a temp view for the SQL front door."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def synthetic_portfolio(customer: DataFrame) -> DataFrame:
    """Derive a deterministic policy portfolio from the ``customer`` table.

    The driver's testdata has no ``policies`` table (the reference's CSVs
    were stripped — .MISSING_LARGE_BLOBS), so the flagship pipeline and
    bench derive one: ``id = c_custkey``, ``term`` cycles 1..30 years in
    days. Pure column arithmetic — no UDF, no shuffle.
    """
    from pyspark.sql import functions as F

    return customer.select(
        F.col("c_custkey").cast("string").alias("id"),
        ((F.col("c_custkey") % 30 + 1) * 365.0).cast("double").alias("term"),
    )


def read_policies_csv(spark: SparkSession, path: str, failfast: bool = True) -> DataFrame:
    """S1/S2: policy CSV scan, faithful to the reference contract.

    Header row skipped, positional 9-column schema, FAILFAST reproduces
    panic-on-malformed (main.rs:51 `unwrap`). ``path`` may be a file or a
    directory (directory-as-table, entrypoint.sh:4) — Spark's FileIndex
    replaces the reference's `find | sort` listing and scales to millions
    of files via distributed listing.
    """
    return spark.read.csv(
        path,
        header=True,
        schema=POLICY_SCHEMA,
        mode="FAILFAST" if failfast else "PERMISSIVE",
    )
