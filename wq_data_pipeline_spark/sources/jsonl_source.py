"""JSONL (newline-delimited JSON) source/sink — the interchange
format of LLM-corpus pipelines (one document object per line). The
reference ingests CSV only; this extends the engine's source surface
for corpus work.

Scale rules baked in:

- An explicit schema is REQUIRED for reads. Schema inference scans
  the input once before the real read — at 100 TB that is a full
  extra pass; a declared schema also pins column types against
  drifting producers.
- Malformed lines follow Spark's PERMISSIVE policy: the row survives
  with data columns NULL and the raw line captured in
  ``_corrupt_record``, so one bad producer shard can't kill a
  corpus-wide job. ``drop_corrupt`` gives the DROPMALFORMED behavior
  while still letting callers count rejects first.
- Reads/writes are line-splittable (no multiline mode), so Spark can
  split large files and parallelize by byte range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    drop_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema.

    The corrupt-record column is always declared so malformed lines
    are observable; with ``drop_corrupt`` they are filtered out (and
    the column removed) after the scan.
    """
    if not isinstance(schema, StructType):  # pragma: no cover - guard
        raise TypeError("read_jsonl requires an explicit StructType schema")
    full = schema
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if drop_corrupt:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def corrupt_count(df: DataFrame) -> int:
    """Number of malformed input lines in a PERMISSIVE jsonl read.

    Spark refuses queries that reference ONLY the corrupt-record
    column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    the documented workaround is to pin the scan first, so the count
    runs against a cached frame and unpersists on the way out."""
    if CORRUPT_COL not in df.columns:
        return 0
    cached = df.cache()
    try:
        return cached.filter(F.col(CORRUPT_COL).isNotNull()).count()
    finally:
        cached.unpersist()


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write newline-delimited JSON. ``n_files`` coalesces small
    outputs (report-sized frames); leave None for corpus-sized data
    so every task writes its own split."""
    out = df
    if CORRUPT_COL in out.columns:
        out = out.drop(CORRUPT_COL)
    if n_files is not None:
        out = out.coalesce(n_files)
    out.write.mode("overwrite").json(path)
