"""Small-file compaction (sources/compact.py): many-files in,
~target-size files out, rows and schema intact; sorted mode clusters
for min/max skipping."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from wq_data_pipeline_spark.sources.compact import compact_parquet, plan_compaction


def _write_fragmented(spark, path, n_files=40, n_rows=20000):
    df = spark.range(0, n_rows).select(
        F.col("id"),
        (F.col("id") % 97).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _write_fragmented(spark, src, n_files=40)
    assert plan_compaction(src)["n_files"] == 40
    plan = compact_parquet(spark, src, dst, target_mb=128)
    out_files = glob.glob(f"{dst}/*.parquet")
    assert len(out_files) == plan["target_files"] < 40
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.schema == b.schema
    assert b.count() == 20000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sorted_compaction_clusters(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "sorted")
    _write_fragmented(spark, src, n_files=16, n_rows=200000)
    compact_parquet(spark, src, dst, target_mb=1, sort_cols=["k"])
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) > 1
    # range-partitioned sort => per-file k ranges are disjoint
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")
        ).first()
        if r["lo"] is not None:
            ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
