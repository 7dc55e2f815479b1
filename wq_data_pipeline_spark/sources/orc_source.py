"""ORC source/sink — completes the columnar-format matrix (CSV,
JSONL, Parquet, ORC). ORC ships in Spark's JVM (no extra package),
reads through the vectorized reader, and supports the same
predicate/column pushdown as parquet — the format a warehouse
migrating from Hive brings with it.

Scale rules baked in:

- Filters and projections push into the ORC scan exactly like
  parquet (``PushedFilters`` / ``ReadSchema`` in .explain) — tested
  in tests/test_sources.py.
- Writes accept hive-style ``partition_by`` so downstream reads
  partition-prune.
- ``zlib`` compression by default (the ORC ecosystem default;
  snappy available via option).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    compression: str = "zlib",
) -> None:
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Plain ORC scan; schema comes from file footers (cheap — footer
    metadata, not a data pass, unlike JSONL inference)."""
    return spark.read.orc(path)
