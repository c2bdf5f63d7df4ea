"""Query registry: every SURVEY.md §2 operator as a (spark, sf_dir) ->
DataFrame callable plus, where SQL-expressible, a DuckDB oracle string.

Each submodule exports ``QUERIES`` and ``ORACLES``; this package merges
them for ``__spark_entry__``. Cross-engine determinism rules used
throughout (so the driver's order-insensitive value-hash matches):

- double sums go through ``CAST(x AS DECIMAL(30,6))`` so they are exact
  and independent of partition/aggregation order in BOTH engines;
- hashes are the first 15 hex digits of md5 parsed as a 60-bit bigint
  (Spark ``conv(substr(md5,1,15),16,10)``, DuckDB ``CAST('0x'||... )``);
- timestamps are emitted as ``yyyy-MM-dd HH:mm:ss`` strings with the
  Spark session forced to UTC;
- every top-k ordering carries a unique-key tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Exact decimal type used for order-independent double sums.
DEC = "decimal(30,6)"

TABLES = [
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
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; forces session tz to UTC so timestamp
    formatting is engine-independent.

    The events table carries TIMESTAMP(NANOS) parquet values, which
    Spark's vectorized reader rejects — read them as raw int64 nanos
    (legacy.parquet.nanosAsLong) and truncate to microsecond
    timestamps, matching DuckDB's ns→µs truncation on the same files.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Coerce events.ts to a session-tz TIMESTAMP regardless of how the
    generator encoded it: int64 nanos (TIMESTAMP(NANOS) under
    nanosAsLong) or naive µs (TIMESTAMP_NTZ). With the session pinned
    to UTC both coercions preserve the wall-clock value DuckDB sees."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integer `div`, NOT float division: ns since epoch (~1.7e18)
        # exceeds double's 2^53 mantissa, and the rounding error shows
        # up as ±1 µs once queries compare microsecond gaps
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the source has
    fewer input splits than cores.

    Small single-file tables otherwise run CPU-heavy per-row stages
    (md5 shingles, minhash, lambda reductions) on ONE task. At real
    scale the scan has thousands of splits and this is a no-op; the
    round-robin shuffle only triggers when splits < cores, and costs
    far less than the serial compute it unblocks.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dsum(col, alias: str):
    """Exact (order-independent) sum of a double expression."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


def build_registry() -> tuple[dict[str, Callable], dict[str, str]]:
    from data_validator_spark.queries import (
        analytics,
        dedup,
        multimodal,
        similarity,
        streaming_queries,
        textops,
        validator_queries,
    )

    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (
        validator_queries,
        analytics,
        textops,
        dedup,
        similarity,
        multimodal,
        streaming_queries,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
