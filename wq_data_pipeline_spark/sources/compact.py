"""Small-file compaction — the table-maintenance pass every long-
lived 100-TB dataset needs: streaming jobs and incremental appends
leave thousands of KB-scale files; scans then pay one task + one
footer read per file, and the NameNode/object-store listing becomes
the bottleneck. Compaction rewrites a directory into ~target-size
files.

Spark-first shape: the target file count derives from the ACTUAL
input bytes (filesystem listing, no data pass); the rewrite is one
scan + repartition(n) + write. With ``sort_cols`` the rewrite uses
``repartitionByRange`` + ``sortWithinPartitions`` instead, so
compaction doubles as a clustering pass (min/max file skipping —
see the zorder_layout entry for the multi-column form).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession


def plan_compaction(path: str, target_mb: int = 128) -> dict:
    """Inspect a parquet directory: file count/bytes and the file
    count a compaction would produce. Pure metadata — no Spark job."""
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    target = max(1, round(total / (target_mb * 1024 * 1024)) or 1)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": target,
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_cols: Sequence[str] | None = None,
) -> dict:
    """Rewrite ``src`` (a parquet directory) into ``dst`` as
    ~``target_mb``-sized files; returns the plan dict. Writes to a
    NEW directory — swap-in (atomic rename) is the caller's move,
    which is what keeps readers consistent without a table format."""
    plan = plan_compaction(src, target_mb)
    df = spark.read.parquet(src)
    n = plan["target_files"]
    if sort_cols:
        cols = list(sort_cols)
        df = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst)
    return plan
