"""Catalog entries that drive the STREAMING module's operators in
batch mode (SURVEY.md §2.8 extension; VERDICT r3 order #6).

Structured Streaming transformations are mode-agnostic DataFrame
plans: ``F.window`` / ``F.session_window`` / the interval-join
condition execute identically on a batch frame (``withWatermark`` is
a no-op outside a stream). Cataloging the SAME functions from
``streaming/stream_qc.py`` over the driver's events table gives the
streaming suite real driver-green oracle rows instead of pytest-only
coverage — the one streaming piece that genuinely cannot run in batch
(``dropDuplicatesWithinWatermark`` raises on batch frames) stays
covered by the dedicated streaming tests.

Determinism: the readings feed quantizes value to integer cents
(as doubles) BEFORE the rollups, so every sum/avg below accumulates
integer-valued doubles — exact in IEEE754 regardless of partitioning
or accumulation order, which is what keeps the driver's value-hash
stable across engines. Timestamps are emitted as epoch-µs bigints per
the repo convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

# session gap / tumbling width / interval-join bound — shared with the
# oracle SQL below
_SESSION_GAP = "30 minutes"
_SESSION_GAP_US = 1_800_000_000
_TUMBLE = "1 hour"
_IJ_WITHIN = "2 hours"


def _readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> the streaming readings shape (station, variable, ts,
    value): station = event_type, variable = user_id mod 7 (35 series),
    value = integer cents as double (exact accumulation)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("station"),
        (F.col("user_id") % 7).cast("string").alias("variable"),
        "ts",
        F.round(F.col("value") * 100).alias("value"),
    )


def q_stream_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.tumbling_rollup (W17 stream analog) run in batch:
    per-series hourly window stats. Same plan a watermark + append-mode
    sink would execute incrementally."""
    from wq_data_pipeline_spark.streaming.stream_qc import tumbling_rollup

    out = tumbling_rollup(_readings(spark, sf_dir), window=_TUMBLE)
    return out.select(
        "station",
        "variable",
        F.unix_micros("window_start").alias("win_start_us"),
        "n",
        F.round("mean_value", 6).alias("mean_value"),
        "min_value",
        "max_value",
    )


SQL_STREAM_TUMBLING = """
WITH r AS (
  SELECT event_type AS station, CAST(user_id % 7 AS VARCHAR) AS variable,
         ts, round(value * 100) AS value
  FROM events
)
SELECT station, variable, epoch_us(date_trunc('hour', ts)) AS win_start_us,
       count(value) AS n, round(avg(value), 6) AS mean_value,
       min(value) AS min_value, max(value) AS max_value
FROM r GROUP BY station, variable, date_trunc('hour', ts)"""


def q_stream_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.session_rollup (W2-gap analog) run in batch:
    ``session_window`` sessions per series, 30-min silence closes a
    session. Spark merges sessions whose [ts, ts+gap) intervals touch,
    so a diff of exactly the gap still merges — the oracle's islands
    rule is `diff > gap` starts a session, and session_end =
    last_ts + gap."""
    from wq_data_pipeline_spark.streaming.stream_qc import session_rollup

    out = session_rollup(_readings(spark, sf_dir), gap=_SESSION_GAP)
    return out.select(
        "station",
        "variable",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n",
        F.round("mean_value", 6).alias("mean_value"),
    )


SQL_STREAM_SESSION = f"""
WITH r AS (
  SELECT event_type AS station, CAST(user_id % 7 AS VARCHAR) AS variable,
         ts, round(value * 100) AS value
  FROM events
),
d AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM r WINDOW w AS (PARTITION BY station, variable ORDER BY ts)
),
s AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY station, variable ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM d
)
SELECT station, variable,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + {_SESSION_GAP_US} AS session_end_us,
       count(value) AS n, round(avg(value), 6) AS mean_value
FROM s GROUP BY station, variable, sid"""


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.stream_interval_join run in batch: pair each click
    with the same user's views in the preceding 2 hours. In streaming
    both sides are watermarked so join state stays bounded; the batch
    plan (this entry) is the same equi+range hash join."""
    from wq_data_pipeline_spark.streaming.stream_qc import stream_interval_join

    ev = load_table(spark, sf_dir, "events")

    def side(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            "user_id", "ts", "event_id", "value"
        )

    out = stream_interval_join(
        side("click"), side("view"), key="user_id", ts="ts", within=_IJ_WITHIN
    )
    return out.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        F.unix_micros("r_ts").alias("r_ts_us"),
        "r_event_id",
        "r_value",
    )


SQL_STREAM_IJ = """
SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id, l.value,
       epoch_us(r.ts) AS r_ts_us, r.event_id AS r_event_id, r.value AS r_value
FROM events l JOIN events r
  ON l.event_type = 'click' AND r.event_type = 'view'
 AND l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 2 HOUR AND r.ts <= l.ts"""


def q_wrtds_residuals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRTDS with the DISCHARGE-KERNEL branch active (reference
    scripts/ufz_water_qc_pipeline.py:608-614: weights multiply a
    Gaussian in q scaled by 3×MAD): the catalog's plain
    wrtds_residuals runs without a q column, so this variant feeds a
    deterministic synthetic discharge (seasonal sinusoid + a
    value-coupled term) to execute wrtds.py's q-kernel paths under
    the driver. Rows-only like its sibling (iterative weighted lstsq
    is not SQL-expressible)."""
    from wq_data_pipeline_spark.operators.wrtds import wrtds_buster, wrtds_residuals

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    d = (
        ev.select(F.lit("s").alias("station"), F.lit("q").alias("variable"), "ts", "value")
        .groupBy("station", "variable", F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.median("value").alias("value"))
    )
    two_pi = 6.283185307179586
    d = d.withColumn(
        "discharge",
        2.0
        + F.sin(two_pi * F.dayofyear("ts") / 365.25)
        + F.pmod(F.col("value"), F.lit(1.0)),
    )
    res = wrtds_residuals(d, keys=["station", "variable"], q_col="discharge")
    spikes = wrtds_buster(res, keys=["station", "variable"], thresh=3.0)
    return spikes.select(
        F.unix_micros("ts").alias("ts_us"), "value", "residual", "robust_z"
    )


QUERIES6: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_tumbling_rollup": q_stream_tumbling_rollup,
    "stream_session_rollup": q_stream_session_rollup,
    "stream_interval_join": q_stream_interval_join,
    "wrtds_residuals_q": q_wrtds_residuals_q,
}

ORACLES6: dict[str, str] = {
    "stream_tumbling_rollup": SQL_STREAM_TUMBLING,
    "stream_session_rollup": SQL_STREAM_SESSION,
    "stream_interval_join": SQL_STREAM_IJ,
    # wrtds_residuals_q: rows-only (same reason as wrtds_residuals)
}
