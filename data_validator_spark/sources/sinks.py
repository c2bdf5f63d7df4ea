"""Write-side surface: partitioned and repartition-controlled sinks.

At 100 TB the write layout IS the read performance of every downstream
query: hive-style `partitionBy` directories give scans static
partition pruning (a filter on the partition column prunes directories
before any file is opened — `PartitionFilters` in the scan node,
verified by tests/test_sinks.py), and pre-write `repartition` on the
partition columns bounds the file count to one file per partition per
shuffle task instead of `tasks x partitions` small files — the classic
small-file explosion that kills a data lake.

Parity note: the reference validator only writes reports (Reports/
IO.scala); data-lake sinks are part of the beyond-reference pipeline
surface, like the bucketed-join writers in operators/bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
) -> None:
    """Hive-style partitioned write.

    ``coalesce_per_partition`` shuffles rows onto their partition keys
    first, so each output directory receives a bounded number of
    files. Without it every upstream task writes a fragment into every
    partition directory: at 1000 tasks x 365 daily partitions that is
    365k files per day of output — unmanageable namenode pressure and
    slow listings. The shuffle costs one exchange; at scale, pair with
    AQE coalescing so near-empty partitions share tasks.
    """
    out = df
    if coalesce_per_partition and partition_cols:
        out = df.repartition(*partition_cols)
    out.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned layout back; partition columns come from
    directory names and filters on them prune before file IO."""
    return spark.read.format(fmt).load(path)
