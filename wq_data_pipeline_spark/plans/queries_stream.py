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


def q_qc_full_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's COMPLETE 9-detector fallback suite
    (apply_saqc_suite else-branch,
    scripts/ufz_water_qc_pipeline.py:566-577) composed over the events
    series and driver-oracled: premask (>200 -> NULL, gives
    missing/isolated real signal) -> range + missing + plateau
    (flat-run interval mask incl. the first-row-after-run convention,
    :392-407, atol=1.0/min 0.75h tuned to fire on this cadence) +
    variance (w=24, 1e-12) + robust zscore (w=25, 3.5) + jumps
    (100.0) + isolated (<=2 pts, >30 min both sides); uniLOF ==
    zscore (:455-457). n_variance and n_isolated are structurally 0
    on this data (no >=8-point exactly-equal window; nulls too sparse
    for 2-point islands) — their per-detector semantics carry their
    own driver-green entries (w7_rolling_var, w9_isolated); this
    entry's evidence is the 9-way composition and 0/255 assembly. Per-type counts of every component flag plus
    the OR-combined 0/255 assembly. Boolean-valued detectors are
    hash-safe: variance crosses 1e-12 only for exactly-equal windows,
    every other comparison is identical IEEE arithmetic in both
    engines."""
    from wq_data_pipeline_spark.operators import clean as C
    from wq_data_pipeline_spark.operators import detectors as D

    key = ["event_type"]
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d = C.resolve_duplicates(ev, key, "ts", "value")
    d = d.withColumn("value", F.when(F.col("value") <= 200.0, F.col("value")))
    # pandas skiplist rolling-median engine: bit-equal to the JVM
    # window form (test_robust_z_pandas_engine_matches_window) and
    # ~this query's only non-O(w) cost at sf0.1
    d = D.flag_robust_z(d, "value", 25, 3.5, key, "ts", out="f_z", engine="pandas")
    d = d.withColumn("f_range", D.flag_range("value", 1.0, 180.0))
    d = d.withColumn("f_missing", D.flag_missing("value"))
    d = d.withColumn("f_jump", D.flag_jumps("value", 100.0, key, "ts"))
    d = d.withColumn("f_var", D.flag_variance("value", 24, key, "ts", 1e-12))
    # pin the flagged frame: the flat-run interval leg and the
    # isolated-groups leg below otherwise duplicate the whole upstream
    # subtree (median dedup + the pandas robust-z stage — the r12 plan
    # audit shows the source scanned 8x). At runtime AQE's shuffle-
    # stage reuse recovers MOST of that (A/B measured a wash at sf0.1:
    # ~4.6 s both forms warm), so this pin buys robustness, a smaller
    # plan, and one guaranteed execution of the Python stage rather
    # than wall clock — kept because reuse across the broadcast-leg
    # job boundary is a runtime fortuity, not a plan property.
    d = d.localCheckpoint(eager=False)
    runs = D.detect_flat_runs(d, "value", key, "ts", 1.0, 0.75).select(
        F.col("event_type").alias("_r_et"),
        F.col("start").alias("_rs"),
        F.col("end").alias("_re"),
        F.lit(True).alias("_in_flat"),
    )
    d = d.join(
        F.broadcast(runs),
        (F.col("event_type") == F.col("_r_et"))
        & F.col("ts").between(F.col("_rs"), F.col("_re")),
        "left",
    ).drop("_r_et", "_rs", "_re")
    d = d.withColumn("f_flat", F.coalesce(F.col("_in_flat"), F.lit(False))).drop(
        "_in_flat"
    )
    d = D.detect_isolated_groups(d, "value", key, "ts", 2, 1800.0, out="f_iso")
    combined = D.merge_flags(
        F.col("f_z"), F.col("f_range"), F.col("f_missing"), F.col("f_jump"),
        F.col("f_var"), F.col("f_flat"), F.col("f_iso"),
    )
    d = d.withColumn("flag_code", D.flags_to_code(combined))
    d = d.withColumn("accepted", F.when(combined, None).otherwise(F.col("value")))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("f_range").cast("int")).alias("n_range"),
        F.sum(F.col("f_missing").cast("int")).alias("n_missing"),
        F.sum(F.col("f_flat").cast("int")).alias("n_plateau"),
        F.sum(F.col("f_var").cast("int")).alias("n_variance"),
        F.sum(F.col("f_z").cast("int")).alias("n_z"),
        F.sum(F.col("f_jump").cast("int")).alias("n_jump"),
        F.sum(F.col("f_iso").cast("int")).alias("n_isolated"),
        F.sum((F.col("flag_code") == 255).cast("int")).alias("n_flagged"),
        F.count("accepted").alias("n_accepted"),
    )


SQL_QC_FULL_SUITE = """
WITH clean AS (
  SELECT event_type, ts, median(value) AS value
  FROM events GROUP BY event_type, ts
),
pm AS (
  SELECT event_type, ts, CASE WHEN value <= 200.0 THEN value END AS value
  FROM clean
),
base AS (
  SELECT *, lag(value) OVER w AS prev_v,
         lag(ts) OVER w AS prev_ts, lead(ts) OVER w AS next_ts,
         value IS NOT NULL AS is_fin,
         COALESCE(abs(value - lag(value) OVER w) <= 1.0, FALSE)
           AND value IS NOT NULL AS eq
  FROM pm WINDOW w AS (PARTITION BY event_type ORDER BY ts)
),
med AS (
  SELECT *, CASE WHEN count(value) OVER wz >= 8 THEN median(value) OVER wz END AS m
  FROM base WINDOW wz AS (PARTITION BY event_type ORDER BY ts
                          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
madt AS (
  SELECT *, CASE WHEN count(abs(value - m)) OVER wz >= 8
                 THEN median(abs(value - m)) OVER wz END AS mad
  FROM med WINDOW wz AS (PARTITION BY event_type ORDER BY ts
                         ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
vart AS (
  SELECT *, COALESCE(
           CASE WHEN count(value) OVER wv >= 8
                THEN var_samp(value) OVER wv END <= 1e-12, FALSE) AS f_var
  FROM madt WINDOW wv AS (PARTITION BY event_type ORDER BY ts
                          ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
),
isl AS (
  SELECT *, sum(CASE WHEN chg THEN 1 ELSE 0 END)
            OVER (PARTITION BY event_type ORDER BY ts ROWS UNBOUNDED PRECEDING) AS fin_isl,
         sum(CASE WHEN eqchg THEN 1 ELSE 0 END)
            OVER (PARTITION BY event_type ORDER BY ts ROWS UNBOUNDED PRECEDING) AS eq_isl
  FROM (SELECT *,
          lag(is_fin) OVER (PARTITION BY event_type ORDER BY ts) IS DISTINCT FROM is_fin AS chg,
          lag(eq) OVER (PARTITION BY event_type ORDER BY ts) IS DISTINCT FROM eq AS eqchg
        FROM vart)
),
flat_runs AS (
  SELECT event_type, min(ts) AS rs,
         COALESCE(max(next_ts), max(ts)) AS re
  FROM isl WHERE eq GROUP BY event_type, eq_isl
  HAVING (epoch_us(COALESCE(max(next_ts), max(ts))) - epoch_us(min(ts))) / 3.6e9 >= 0.75
),
iso_groups AS (
  SELECT event_type, fin_isl,
         count(*) <= 2
         AND min_by({'t': prev_ts}, ts).t IS NOT NULL
         AND (epoch_us(min(ts)) - epoch_us(min_by({'t': prev_ts}, ts).t)) / 1e6 > 1800.0
         AND max_by({'t': next_ts}, ts).t IS NOT NULL
         AND (epoch_us(max_by({'t': next_ts}, ts).t) - epoch_us(max(ts))) / 1e6 > 1800.0 AS isolated
  FROM isl WHERE is_fin GROUP BY event_type, fin_isl
),
fl AS (
  SELECT i.event_type,
         COALESCE(i.value < 1.0 OR i.value > 180.0, FALSE) AS f_range,
         i.value IS NULL AS f_missing,
         EXISTS (SELECT 1 FROM flat_runs r
                 WHERE r.event_type = i.event_type AND i.ts BETWEEN r.rs AND r.re) AS f_flat,
         i.f_var,
         COALESCE(CASE WHEN i.mad > 0
                       THEN abs(0.6745 * (i.value - i.m) / i.mad) >= 3.5 END, FALSE) AS f_z,
         COALESCE(abs(i.value - i.prev_v) >= 100.0, FALSE) AS f_jump,
         COALESCE(i.is_fin AND g.isolated, FALSE) AS f_iso,
         i.value
  FROM isl i LEFT JOIN iso_groups g
    ON i.event_type = g.event_type AND i.fin_isl = g.fin_isl
)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(CASE WHEN f_range THEN 1 ELSE 0 END) AS BIGINT) AS n_range,
       CAST(sum(CASE WHEN f_missing THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(sum(CASE WHEN f_flat THEN 1 ELSE 0 END) AS BIGINT) AS n_plateau,
       CAST(sum(CASE WHEN f_var THEN 1 ELSE 0 END) AS BIGINT) AS n_variance,
       CAST(sum(CASE WHEN f_z THEN 1 ELSE 0 END) AS BIGINT) AS n_z,
       CAST(sum(CASE WHEN f_jump THEN 1 ELSE 0 END) AS BIGINT) AS n_jump,
       CAST(sum(CASE WHEN f_iso THEN 1 ELSE 0 END) AS BIGINT) AS n_isolated,
       CAST(sum(CASE WHEN f_range OR f_missing OR f_flat OR f_var OR f_z OR f_jump OR f_iso
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       count(CASE WHEN NOT (f_range OR f_missing OR f_flat OR f_var OR f_z OR f_jump OR f_iso)
             THEN value END) AS n_accepted
FROM fl GROUP BY event_type"""


QUERIES6: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_tumbling_rollup": q_stream_tumbling_rollup,
    "stream_session_rollup": q_stream_session_rollup,
    "stream_interval_join": q_stream_interval_join,
    "wrtds_residuals_q": q_wrtds_residuals_q,
    "qc_full_suite": q_qc_full_suite,
}

ORACLES6: dict[str, str] = {
    "stream_tumbling_rollup": SQL_STREAM_TUMBLING,
    "stream_session_rollup": SQL_STREAM_SESSION,
    "stream_interval_join": SQL_STREAM_IJ,
    "qc_full_suite": SQL_QC_FULL_SUITE,
    # wrtds_residuals_q: rows-only (same reason as wrtds_residuals)
}
