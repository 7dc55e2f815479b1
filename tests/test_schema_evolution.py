"""Parquet schema evolution: a dataset whose files were written under
different schema versions must read back as one unified relation —
the mergeSchema path a long-lived 100-TB table depends on (new
columns appear in new partitions; history stays readable)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_union(spark, tmp_path):
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "name"]
    )
    v2 = spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], ["id", "name", "score"]
    )
    v1.write.parquet(f"{base}/batch=1")
    v2.write.parquet(f"{base}/batch=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None  # old files surface NULL
    assert rows[3]["score"] == 30.0
    assert len(rows) == 4


def test_merge_schema_filter_still_pushed(spark, tmp_path):
    """Column pruning + predicate pushdown must survive the merged
    schema: the scan should read only the projected columns and push
    the id filter."""
    base = str(tmp_path / "evolving2")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(
        f"{base}/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.0)], ["id", "name", "score"]
    ).write.parquet(f"{base}/batch=2")
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(base)
        .filter(F.col("id") > 1)
        .select("id", "score")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan, plan
    assert "ReadSchema: struct<id:bigint,score:double>" in plan, plan
    assert df.collect() == [(2, 9.0)]
