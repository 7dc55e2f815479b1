"""Catalog batch 19 (round 6, seventh wave): irregular-time-series
resampling surface — the hypertable operations (TimescaleDB
time_weighted_average / candlestick / interpolation family) a sensor
or metrics engine layers over raw events:

* twa_daily   — duration-weighted daily average per series: each
                sample is weighted by its holding time (time to the
                next sample), the right-open integral a plain AVG
                gets wrong on irregular samples.
* ohlc_hourly — open/high/low/close candlestick bars per series per
                hour, first/last picked by deterministic (ts,
                event_id) order via conditional aggregation (no
                min_by/struct-ordering portability risk).
* gap_lerp    — linear interpolation of each series onto an hourly
                grid: prev/next neighbors via ONE sorted union pass
                (the as-of trick, both directions), then an exact
                integer lerp.

Determinism: values quantize to integer centi-units; durations are
exact BIGINT microseconds; every product stays under 2^63; the only
doubles are final single divisions. Signed interpolation divides in
the integer domain (Spark DIV / DuckDB //, both truncate toward
zero) because the lerp numerator can exceed 2^53 where double
division stops being exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


# --------------------------------------------------------------------------
# time-weighted average
# --------------------------------------------------------------------------


def q_twa_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted daily mean per series: sum(v * dt) / sum(dt)
    where dt is each sample's holding time until the next sample in
    the same (series, day); the day's last sample carries no weight
    (right-open integral). The plain AVG is reported beside it — on
    irregular sampling the two diverge, which is the point.

    Scale: one lead() window per (series, day) partition + one hash
    agg; numerators stay exact because per-group sum(dt) <= one day
    of microseconds, so sum(vc*dt) <= vc_max * 8.64e10 << 2^63."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type", "day").orderBy("ts_us", "event_id")
    d = ev.withColumn("day", (F.col("ts_us") / _DAY_US).cast("long")).withColumn(
        "dt_us", F.lead("ts_us").over(w) - F.col("ts_us")
    )
    return (
        d.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("vc") * F.col("dt_us")).alias("_num"),
            F.sum("dt_us").alias("span_us"),
            F.sum("vc").alias("_sv"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "event_type",
            "day",
            "n",
            "span_us",
            (F.col("_num") / F.col("span_us")).alias("twa_cents"),
            # exact-integer sum / count: one division, no accumulation order
            (F.col("_sv") / F.col("n")).alias("avg_cents"),
        )
        .orderBy("event_type", "day")
    )


SQL_TWA_DAILY = f"""
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // {_DAY_US} AS day,
         epoch_us(ts) AS ts_us,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
d AS (
  SELECT *,
         lead(ts_us) OVER (PARTITION BY event_type, day
                           ORDER BY ts_us, event_id) - ts_us AS dt_us
  FROM e
)
SELECT event_type, day,
       count(*) AS n,
       CAST(sum(dt_us) AS BIGINT) AS span_us,
       CAST(sum(vc * dt_us) AS DOUBLE) / CAST(sum(dt_us) AS BIGINT) AS twa_cents,
       CAST(sum(vc) AS DOUBLE) / count(*) AS avg_cents
FROM d
GROUP BY 1, 2
HAVING CAST(sum(dt_us) AS BIGINT) > 0
ORDER BY 1, 2"""


# --------------------------------------------------------------------------
# OHLC candlestick bars
# --------------------------------------------------------------------------


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per series. Open/close are the first/last
    sample in deterministic (ts, event_id) order, extracted by
    conditional aggregation over a single row_number window (rn = 1 /
    rn = n) — portable where min_by-on-struct ordering is not.

    Scale: one window + one hash agg, both on the same
    (series, hour) key — the sort is reused by the aggregate."""
    ev = _events(spark, sf_dir)
    d = ev.withColumn("hour", (F.col("ts_us") / _HOUR_US).cast("long"))
    w = Window.partitionBy("event_type", "hour").orderBy("ts_us", "event_id")
    r = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("event_type", "hour"))
    )
    return (
        r.groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("vc"))).alias("open_c"),
            F.max("vc").alias("high_c"),
            F.min("vc").alias("low_c"),
            F.max(F.when(F.col("rn") == F.col("cnt"), F.col("vc"))).alias("close_c"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "hour")
    )


SQL_OHLC_HOURLY = f"""
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // {_HOUR_US} AS hour,
         epoch_us(ts) AS ts_us,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, hour
                            ORDER BY ts_us, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type, hour) AS cnt
  FROM e
)
SELECT event_type, hour,
       max(CASE WHEN rn = 1 THEN vc END) AS open_c,
       max(vc) AS high_c,
       min(vc) AS low_c,
       max(CASE WHEN rn = cnt THEN vc END) AS close_c,
       count(*) AS n
FROM r
GROUP BY 1, 2
ORDER BY 1, 2"""


# --------------------------------------------------------------------------
# linear interpolation onto an hourly grid
# --------------------------------------------------------------------------




def q_gap_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each series linearly interpolated onto the hourly grid between
    its first and last sample.

    Neighbor discovery is ONE sorted pass over the union of samples
    and grid points (the as-of formulation, run in both directions):
    last non-null value/ts before each grid point, first after. The
    lerp itself is exact integer arithmetic with floor division, so
    both engines produce identical BIGINT centi-values — no float
    interpolation to drift.

    Scale: grid generation is a per-series sequence (bounded rows),
    the union sorts once per series partition; no joins at all —
    this beats the two-range-join formulation by a full shuffle."""
    ev = _events(spark, sf_dir)
    bounds = ev.groupBy("event_type").agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    # A series whose samples all land inside one hour bucket has
    # grid start > stop; Spark's sequence() with a positive step
    # raises on that, while the oracle's range() returns no rows —
    # guard so degenerate series yield zero grid points either way.
    g_start = (F.floor(F.col("lo") / _HOUR_US).cast("long") + 1) * _HOUR_US
    g_stop = F.floor(F.col("hi") / _HOUR_US).cast("long") * _HOUR_US
    grid = bounds.select(
        "event_type",
        F.explode(
            F.when(
                g_start <= g_stop,
                F.sequence(g_start, g_stop, F.lit(_HOUR_US)),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("ts_us"),
    )
    g = grid.select(
        "event_type",
        "ts_us",
        F.lit(1).alias("is_grid"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("vc"),
    )
    e = ev.select("event_type", "ts_us", F.lit(0).alias("is_grid"), "event_id", "vc")
    u = e.unionByName(g)
    # events sort before grid points at equal ts so an exact-ts sample
    # is the "previous" neighbor (lerp then degenerates to it exactly)
    order = [F.col("ts_us"), F.col("is_grid"), F.col("event_id")]
    wb = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The forward neighbor runs as a BACKWARD scan over the reversed
    # ordering: Spark evaluates last(ignorenulls) over
    # [unboundedPreceding, currentRow] incrementally (O(n)), whereas
    # first(ignorenulls) over [currentRow, unboundedFollowing]
    # re-scans the frame tail per row — O(n^2) per partition
    # (measured: 171 s vs 3 s on a 100k-row series). Same frame
    # contents: rows at or after the current row in ascending order.
    wf = (
        Window.partitionBy("event_type")
        .orderBy(*[c.desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev_ts = F.when(F.col("is_grid") == 0, F.col("ts_us"))
    d = (
        u.withColumn("pv", F.last("vc", ignorenulls=True).over(wb))
        .withColumn("pt", F.last(ev_ts, ignorenulls=True).over(wb))
        .withColumn("nv", F.last("vc", ignorenulls=True).over(wf))
        .withColumn("nt", F.last(ev_ts, ignorenulls=True).over(wf))
        .filter((F.col("is_grid") == 1) & F.col("pv").isNotNull() & F.col("nv").isNotNull())
    )
    # Signed integer division: Spark's DIV and DuckDB's // BOTH
    # truncate toward zero (verified: -7//2 = -3 in DuckDB), so plain
    # DIV mirrors the oracle exactly. Stays in the integer domain
    # end-to-end: num can exceed 2^53, so a double division would not
    # be exact.
    d = d.withColumn(
        "_num", (F.col("nv") - F.col("pv")) * (F.col("ts_us") - F.col("pt"))
    ).withColumn("_den", F.col("nt") - F.col("pt"))
    lerp = F.when(F.col("_den") == 0, F.col("pv")).otherwise(
        F.col("pv") + F.expr("_num DIV _den")
    )
    return d.select(
        "event_type", "ts_us", lerp.cast("long").alias("lerp_cents")
    ).orderBy("event_type", "ts_us")


SQL_GAP_LERP = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, 0 AS is_grid,
         event_id, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
b AS (
  SELECT event_type, min(ts_us) AS lo, max(ts_us) AS hi FROM e GROUP BY 1
),
g AS (
  SELECT event_type, ts_us, 1 AS is_grid,
         CAST(-1 AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS vc
  FROM b, unnest(range((lo // {_HOUR_US} + 1) * {_HOUR_US},
                       (hi // {_HOUR_US}) * {_HOUR_US} + 1,
                       {_HOUR_US})) AS t(ts_us)
),
u AS (SELECT * FROM e UNION ALL SELECT * FROM g),
d AS (
  SELECT *,
         last_value(vc IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wb AS pt,
         first_value(vc IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wf AS nt
  FROM u
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY ts_us, is_grid, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY ts_us, is_grid, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, ts_us,
       CAST(CASE WHEN nt = pt THEN pv
                 ELSE pv + ((nv - pv) * (ts_us - pt)) // (nt - pt)
            END AS BIGINT) AS lerp_cents
FROM d
WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL
ORDER BY 1, 2"""


QUERIES19: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "twa_daily": q_twa_daily,
    "ohlc_hourly": q_ohlc_hourly,
    "gap_lerp": q_gap_lerp,
}

ORACLES19: dict[str, str] = {
    "twa_daily": SQL_TWA_DAILY,
    "ohlc_hourly": SQL_OHLC_HOURLY,
    "gap_lerp": SQL_GAP_LERP,
}
