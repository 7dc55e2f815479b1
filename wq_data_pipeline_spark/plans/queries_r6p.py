"""Catalog batch 25 (round 6, thirteenth wave): state diffing and
path mining:

* snapshot_diff — CDC-style diff of the per-user AS-OF state between
                  two timestamps: each user's state at T is their
                  latest event value before T (deterministic argmax
                  via struct max on (ts, event_id)); rows classify
                  as added / changed / unchanged. ONE scan, two
                  conditional struct-max aggregates — the shape that
                  diffs table versions without a table format.
* top_paths     — most common per-(user, day) event journeys: the
                  first 4 event types in exact (ts, event_id) order,
                  gathered deterministically via array_sort over
                  collected (ts, id, type) structs (collect_list's
                  gather order is NOT deterministic; the sort makes
                  it irrelevant), then ranked with a full tiebreak.

Determinism: struct comparison is field-lexicographic in both
engines with (ts_us, event_id) leading; integer centi values; no
floats.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_DAY_US = 86_400_000_000
_T1 = "2024-01-15"
_T2 = "2024-01-25"
_PATH_LEN = 4
_PATH_TOPK = 20


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user as-of state at {_T1} vs {_T2} and its change class.

    Scale: one hash aggregate over the scan — the two snapshot
    states are conditional struct-max aggregates (map-side
    combinable), so diffing two 'versions' needs neither a second
    scan nor a self-join."""
    ev = _events(spark, sf_dir)
    t1_us = F.lit(f"{_T1} 00:00:00").cast("timestamp")
    t2_us = F.lit(f"{_T2} 00:00:00").cast("timestamp")
    t1 = F.unix_micros(t1_us)
    t2 = F.unix_micros(t2_us)
    st = F.struct(F.col("ts_us"), F.col("event_id"), F.col("vc"))
    agg = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts_us") < t1, st)).alias("s1"),
        F.max(F.when(F.col("ts_us") < t2, st)).alias("s2"),
    )
    v1 = F.col("s1").getField("vc")
    v2 = F.col("s2").getField("vc")
    status = (
        F.when(F.col("s1").isNull() & F.col("s2").isNotNull(), F.lit("added"))
        .when(F.col("s2").isNull(), F.lit("absent"))
        .when(v1 != v2, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return agg.select(
        "user_id",
        v1.alias("v1"),
        v2.alias("v2"),
        status.alias("status"),
    ).orderBy("user_id")


SQL_SNAPSHOT_DIFF = f"""
WITH agg AS (
  SELECT user_id,
         max(CASE WHEN ts < TIMESTAMP '{_T1} 00:00:00'
                  THEN {{'ts_us': epoch_us(ts), 'event_id': event_id,
                         'vc': CAST(round(value * 100) AS BIGINT)}} END) AS s1,
         max(CASE WHEN ts < TIMESTAMP '{_T2} 00:00:00'
                  THEN {{'ts_us': epoch_us(ts), 'event_id': event_id,
                         'vc': CAST(round(value * 100) AS BIGINT)}} END) AS s2
  FROM events GROUP BY 1
)
SELECT user_id,
       s1.vc AS v1,
       s2.vc AS v2,
       CASE WHEN s1 IS NULL AND s2 IS NOT NULL THEN 'added'
            WHEN s2 IS NULL THEN 'absent'
            WHEN s1.vc <> s2.vc THEN 'changed'
            ELSE 'unchanged' END AS status
FROM agg ORDER BY 1"""


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {_PATH_TOPK} per-(user, day) event journeys (first
    {_PATH_LEN} event types in time order, '>'-joined).

    Scale: the journey build is one hash aggregate per (user, day)
    whose state is that day's events for one user — bounded by
    per-user daily activity, not by corpus size; the final top-k is
    a rank over journey counts."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    j = (
        ev.groupBy(
            "user_id", (F.col("ts_us") / _DAY_US).cast("long").alias("day")
        )
        .agg(
            F.collect_list(
                F.struct(F.col("ts_us"), F.col("event_id"), F.col("event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.transform(
                    F.slice(F.array_sort("evs"), 1, _PATH_LEN),
                    lambda x: x.getField("event_type"),
                ),
            ).alias("journey")
        )
    )
    counts = j.groupBy("journey").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("journey"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PATH_TOPK)
        .select("rk", "journey", "n")
        .orderBy("rk")
    )


SQL_TOP_PATHS = f"""
WITH j AS (
  SELECT array_to_string(
           list_transform(
             list_sort(list({{'ts_us': epoch_us(ts), 'event_id': event_id,
                              't': event_type}}))[1:{_PATH_LEN}],
             x -> x.t), '>') AS journey
  FROM events
  GROUP BY user_id, epoch_us(ts) // {_DAY_US}
),
c AS (SELECT journey, count(*) AS n FROM j GROUP BY 1)
SELECT row_number() OVER (ORDER BY n DESC, journey) AS rk, journey, n
FROM c
QUALIFY rk <= {_PATH_TOPK}
ORDER BY rk"""


QUERIES25: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "snapshot_diff": q_snapshot_diff,
    "top_paths": q_top_paths,
}

ORACLES25: dict[str, str] = {
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "top_paths": SQL_TOP_PATHS,
}
