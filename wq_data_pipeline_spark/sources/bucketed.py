"""Bucketed parquet layout — co-located joins and aggregations with
ZERO shuffle exchanges.

At 100 TB the dominant cost of the fact-fact join (lineitem x orders
on orderkey) is shuffling both sides. Writing both tables bucketed
(and sorted) by the join key pins row placement at WRITE time:
hash(key) % n_buckets decides the file, so at read time Spark's
bucketed scan reports a HashPartitioning that already satisfies the
join/aggregation distribution requirement — the Exchange (and with
``sortBy``, the Sort) disappears from the plan. The shuffle is paid
once at layout time and amortized over every subsequent query.

Rules the writer enforces (Spark's bucketing contract):
* both join sides must use the SAME bucket count and bucket columns;
* the table must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not in the files);
* bucket pruning additionally applies to equality filters on the
  bucket column (scan reads 1/n of the files);
* Sort elision on top of Exchange elision needs one file per bucket
  (the writer repartitions to guarantee it) plus
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` —
  sorted bucketed scans are opt-in since SPARK-24528 because reading
  a many-file bucket as one sorted stream serializes the read; with
  the one-file layout that concern is moot.

Tested by tests/test_bucketed.py, which asserts the joined plan
contains zero shuffle Exchange nodes with broadcast disabled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) parquet table
    registered in the session catalog. ``path`` makes it external."""
    cols = list(bucket_cols)
    # one writer task per bucket -> exactly one file per bucket, which
    # is what lets the scan-side Sort be elided too (Spark only trusts
    # per-bucket sort order when a bucket is a single file)
    df = df.repartition(n_buckets, *cols)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket
    distribution so downstream joins/aggs on the bucket columns plan
    without an Exchange."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket columns. With both
    sides bucketed+sorted on ``on`` with equal bucket counts, the
    plan is a SortMergeJoin with no Exchange and no Sort on either
    side."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how
    )
