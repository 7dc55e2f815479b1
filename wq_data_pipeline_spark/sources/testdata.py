"""Parquet sources for the driver's synthetic tables (TESTDATA.md).

Parquet scans go through Spark's vectorized reader; filters and column
pruning push down automatically (verify with ``.explain`` —
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
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


# Columns stored as parquet TIMESTAMP(NANOS): with nanosAsLong they
# surface as int64 epoch-ns and are normalized to TimestampType here.
_NS_TS_COLS = {"events": ("ts",)}

# SQL confs the engine's semantics depend on. The driver hands us ITS
# SparkSession, so these must be applied at runtime, not only in our
# own builder (all of them are runtime-settable SQL confs).
_REQUIRED_SQL_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_SQL_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: surface the read error instead
    # Right-size shuffle width for the actual cluster: a vanilla
    # session leaves spark.sql.shuffle.partitions at 200; on a small
    # local[N] driver every concurrent map task then opens ~200
    # bypass-merge partition writers (each with an LZ4 buffer), which
    # can exhaust the default 1 GB heap (observed: OOM in banded-join
    # shuffles). Only the untouched default is overridden — an
    # explicit user/cluster setting is respected. Results are
    # partition-count independent (all order-sensitive accumulations
    # are quantized; verified hash-exact at 8/32/200).
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            n = max(spark.sparkContext.defaultParallelism, 32)
            if n < 200:
                spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:
        pass
    # executors must be able to import this package (pandas-UDF
    # closures are pickled by module reference)
    from wq_data_pipeline_spark.session import ship_package

    try:
        ship_package(spark)
    except Exception:
        pass  # local-repo-root runs work without it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NS_TS_COLS.get(name, ()):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
