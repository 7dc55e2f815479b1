"""Catalog batch 4: as-of join, Gaussian smoothing (W16), interval
containment / range join (J3), TPC-H Q6-style filter-agg.
"""

from __future__ import annotations

from collections.abc import Callable
import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators import clean as C
from wq_data_pipeline_spark.operators import detectors as D
from wq_data_pipeline_spark.operators import windows as W
from wq_data_pipeline_spark.operators.asof import asof_join_backward
from wq_data_pipeline_spark.operators.windows import ordered
from wq_data_pipeline_spark.sources.testdata import load_table

KEY = ["event_type"]

ORACLE_CLEAN = (
    "WITH clean AS (SELECT event_type, ts, median(value) AS value "
    "FROM events GROUP BY event_type, ts)"
)


def _events_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    return C.resolve_duplicates(ev, KEY, "ts", "value")


def _us(col: str = "ts") -> F.Column:
    return F.unix_micros(F.col(col))


# --- As-of join -------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union+window): each 'error' event matched to the
    latest prior 'purchase' of the same user. Spark has no native
    ASOF JOIN; DuckDB's ASOF LEFT JOIN is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id", "value")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = asof_join_backward(
        left, right, on=["user_id"], right_value_cols=["value"]
    )
    return j.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.col("matched_value").alias("purchase_value"),
        F.unix_micros("matched_ts").alias("purchase_ts_us"),
    )


SQL_ASOF = """
WITH l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us, l.value,
       r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"""


# --- W16: Gaussian smooth + residual ---------------------------------------

_SIGMA = 2.0
_TAPS = 4  # +-4 taps (~2 sigma; reference truncates at 4 sigma)
_GW = [math.exp(-(k * k) / (2.0 * _SIGMA * _SIGMA)) for k in range(-_TAPS, _TAPS + 1)]


def q_w16_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W16: sparsify (value<5 -> NULL), forward/back-fill, Gaussian
    kernel smooth (sigma=2 pts, +-4 taps, renormalized over non-null
    taps), residual = filled - smooth. Explicit tap expression tree ->
    bit-deterministic (reference plot_gaussian_compare,
    scripts/ufz_water_qc_pipeline.py:371-389)."""
    d = _events_clean(spark, sf_dir)
    d = d.withColumn("v", F.when(F.col("value") >= 5.0, F.col("value")))
    wts = ordered(KEY, "ts")
    ff = F.last("v", ignorenulls=True).over(
        wts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # bfill as a REVERSED ffill: Spark evaluates ignore-nulls first()
    # over an unbounded-FOLLOWING frame by rescanning per row (O(n²)
    # per partition — 46 s at sf0.1); the descending-order running
    # last() is a single O(n) pass (one extra sort).
    wdesc = Window.partitionBy(*KEY).orderBy(F.desc("ts")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bf = F.last("v", ignorenulls=True).over(wdesc)
    d = d.withColumn("filled", F.coalesce(ff, bf))
    w = ordered(KEY, "ts")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(-_TAPS, _TAPS + 1):
        wt = _GW[k + _TAPS]
        tap = (
            F.col("filled")
            if k == 0
            else (F.lag("filled", -k).over(w) if k < 0 else F.lead("filled", k).over(w))
        )
        num = num + F.coalesce(tap, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(tap.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    smooth = F.when(den > 0, num / den)
    # round to 6 decimals (data resolution 0.01; cross-engine tap
    # accumulation differs by ~1 ulp at 1e-14 relative — 6-decimal
    # rounding absorbs it with 1e8 margin)
    return d.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "filled",
        F.round(smooth, 6).alias("smooth"),
        F.round(F.col("filled") - smooth, 6).alias("residual"),
    )


def _w16_sql() -> str:
    num_terms, den_terms = [], []
    for k in range(-_TAPS, _TAPS + 1):
        wt = repr(_GW[k + _TAPS])
        tap = (
            "filled"
            if k == 0
            else (f"lag(filled, {-k}) OVER w" if k < 0 else f"lead(filled, {k}) OVER w")
        )
        num_terms.append(f"COALESCE({tap}, 0.0) * {wt}")
        den_terms.append(f"(CASE WHEN {tap} IS NOT NULL THEN {wt} ELSE 0.0 END)")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""{ORACLE_CLEAN},
sp AS (SELECT event_type, ts, CASE WHEN value >= 5.0 THEN value END AS v FROM clean),
fill AS (
  SELECT event_type, ts,
         COALESCE(
           last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts ROWS UNBOUNDED PRECEDING),
           first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts
                                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         ) AS filled
  FROM sp
),
sm AS (
  SELECT event_type, ts, filled,
         CASE WHEN 0.0 + {den} > 0 THEN (0.0 + {num}) / (0.0 + {den}) END AS smooth
  FROM fill WINDOW w AS (PARTITION BY event_type ORDER BY ts)
)
SELECT event_type, epoch_us(ts) AS ts_us, filled,
       round(smooth, 6) AS smooth, round(filled - smooth, 6) AS residual
FROM sm"""


SQL_W16 = _w16_sql()


# --- J3: interval containment (runs -> mask) -------------------------------

def q_j3_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: mark rows inside flat-run intervals (reference
    _mask_from_runs, scripts/ufz_water_qc_pipeline.py:392-397) via a
    broadcast range join; per-key counts of in-run rows."""
    d = _events_clean(spark, sf_dir)
    # runs derives FROM d: rename its join columns so the self-join
    # predicate can't resolve both sides to the same attribute
    # (otherwise Spark warns 'trivially true equals predicate' and
    # correctness hangs on dataset-id disambiguation)
    runs = D.detect_flat_runs(d, "value", KEY, "ts", atol=1.0, min_hours=0.5).select(
        F.col("event_type").alias("r_type"),
        F.col("start").alias("r_start"),
        F.col("end").alias("r_end"),
    )
    joined = d.join(
        F.broadcast(runs),
        on=[
            F.col("event_type") == F.col("r_type"),
            F.col("ts") >= F.col("r_start"),
            F.col("ts") <= F.col("r_end"),
        ],
        how="leftsemi",
    )
    return joined.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_in_run"))


SQL_J3 = f"""{ORACLE_CLEAN},
lagd AS (
  SELECT event_type, ts, value,
         COALESCE(abs(value - lag(value) OVER w) <= 1.0, FALSE) AND value IS NOT NULL AS eq,
         lead(ts) OVER w AS next_ts
  FROM clean WINDOW w AS (PARTITION BY event_type ORDER BY ts)
),
isl AS (
  SELECT *, sum(CASE WHEN chg THEN 1 ELSE 0 END)
            OVER (PARTITION BY event_type ORDER BY ts ROWS UNBOUNDED PRECEDING) AS island
  FROM (SELECT *, lag(eq) OVER (PARTITION BY event_type ORDER BY ts)
               IS DISTINCT FROM eq AS chg FROM lagd)
),
runs AS (
  SELECT event_type, min(ts) AS start_ts,
         COALESCE(max(next_ts), max(ts)) AS end_ts
  FROM isl WHERE eq GROUP BY event_type, island
  HAVING (epoch_us(COALESCE(max(next_ts), max(ts))) - epoch_us(min(ts))) / 3.6e9 >= 0.5
)
SELECT c.event_type, count(*) AS n_in_run
FROM clean c
WHERE EXISTS (SELECT 1 FROM runs r
              WHERE r.event_type = c.event_type
                AND c.ts >= r.start_ts AND c.ts <= r.end_ts)
GROUP BY c.event_type"""


# --- TPC-H Q6: filter + global agg -----------------------------------------

def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue: pushed-down filters + one agg row."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_rows
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""


def q_a9_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: % available / % flagged per series (reference
    scripts/sentemqc.py:167-169). The flag here is the jump detector
    so the percentage is non-trivial. Ratios as exact int divisions."""
    d = _events_clean(spark, sf_dir)
    d = d.withColumn("f", D.flag_jumps("value", 100.0, KEY, "ts"))
    return d.groupBy("event_type").agg(
        (F.count("value").cast("double") / F.count(F.lit(1)).cast("double") * 100.0).alias(
            "pct_available"
        ),
        (F.sum(F.col("f").cast("long")).cast("double") / F.count(F.lit(1)).cast("double") * 100.0).alias(
            "pct_flagged"
        ),
    )


SQL_A9 = f"""{ORACLE_CLEAN},
fl AS (
  SELECT event_type, value,
         COALESCE(abs(value - lag(value) OVER (PARTITION BY event_type ORDER BY ts)) >= 100.0, FALSE) AS f
  FROM clean
)
SELECT event_type,
       CAST(count(value) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 100.0 AS pct_available,
       CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 100.0 AS pct_flagged
FROM fl GROUP BY event_type"""


# P2/P16 combined slice bounds — shared between the Spark query and
# the oracle SQL below
_P2_LO = "2024-01-10 00:00:00"
_P2_HI = "2024-01-20 00:00:00"


def q_p16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16/J2 + P2 in one driver row: inclusive-inclusive time-range
    slice (pandas .loc semantics == BETWEEN) feeding the long -> wide
    pivot (per-day rows, one count column per event_type) — the
    reference's wide output assembly as groupBy().pivot() over a
    sliced scan."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").between(_P2_LO, _P2_HI)
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).pivot(
        "event_type", ["click", "error", "purchase", "signup", "view"]
    ).count()
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in ("click", "error", "purchase", "signup", "view")],
    )


SQL_P16 = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
WHERE ts BETWEEN TIMESTAMP '{_P2_LO}' AND TIMESTAMP '{_P2_HI}'
GROUP BY CAST(ts AS DATE)"""


def q_w15_band_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15: band support masking — rolling count of finite values over
    the band window; bands kept only where support >= minp (reference
    scripts/sentemqc.py:105-107). Sparsified input so support varies."""
    d = _events_clean(spark, sf_dir)
    d = d.withColumn("v", F.when(F.col("value") >= 20.0, F.col("value")))
    frame = W.centered(12, KEY, "ts")
    support = F.count("v").over(frame)
    d = d.withColumn("support", support)
    ma = F.sum(F.round(F.col("v") * 100).cast("long")).over(frame).cast(
        "double"
    ) / support.cast("double") / F.lit(100.0)
    return d.select(
        "event_type",
        _us().alias("ts_us"),
        "support",
        F.when(support >= 4, ma).alias("band_center"),
        (support >= 4).alias("band_ok"),
    )


SQL_W15 = f"""{ORACLE_CLEAN},
sp AS (SELECT event_type, ts, CASE WHEN value >= 20.0 THEN value END AS v FROM clean),
s AS (
  SELECT event_type, ts,
         count(v) OVER w AS support,
         sum(CAST(round(v * 100) AS BIGINT)) OVER w AS s1
  FROM sp WINDOW w AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
)
SELECT event_type, epoch_us(ts) AS ts_us, support,
       CASE WHEN support >= 4 THEN CAST(s1 AS DOUBLE) / CAST(support AS DOUBLE) / 100.0 END AS band_center,
       support >= 4 AS band_ok
FROM s"""


def q_p2_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: inclusive-inclusive time-range slice (pandas .loc
    semantics == BETWEEN) + per-key counts."""
    d = _events_clean(spark, sf_dir)
    d = d.filter(
        F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )


SQL_P2 = f"""{ORACLE_CLEAN}
SELECT event_type, count(*) AS n_rows,
       epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
FROM clean
WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type"""


def q_wrtds_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRTDS-proxy local regression per series (applyInPandas island,
    SURVEY §2.9) + robust-z spike flags on residuals. Rows-only check:
    iterative weighted lstsq is not SQL-expressible (the components —
    A8 buster, harmonics — are oracled separately)."""
    from wq_data_pipeline_spark.operators.wrtds import wrtds_buster, wrtds_residuals

    d = _events_clean(spark, sf_dir).withColumn("station", F.lit("s"))
    d = d.withColumnRenamed("event_type", "variable")
    # W17 resample to hourly medians first: WRTDS is O(n·w) per series
    # (w = points inside the time half-width); the hourly grid bounds n
    # per series at any scale factor while the regression still sees
    # the full time span. This is how the operator stays tractable at
    # 100 TB too: coarsen, fit, then join flags back to raw rows.
    d = d.groupBy("station", "variable", F.date_trunc("hour", "ts").alias("ts")).agg(
        F.median("value").alias("value")
    )
    res = wrtds_residuals(d, keys=["station", "variable"])
    spikes = wrtds_buster(res, keys=["station", "variable"], thresh=4.0)
    return spikes.select(
        F.col("variable").alias("event_type"),
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "residual",
        "robust_z",
    )


QUERIES4: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join": q_asof_join,
    "w16_gaussian": q_w16_gaussian,
    "j3_range_join": q_j3_range_join,
    "tpch_q6": q_tpch_q6,
    "wrtds_residuals": q_wrtds_residuals,
    "a9_availability": q_a9_availability,
    "p16_pivot": q_p16_pivot,
    "w15_band_support": q_w15_band_support,
    "p2_time_slice": q_p2_time_slice,
}

ORACLES4: dict[str, str] = {
    "asof_join": SQL_ASOF,
    "w16_gaussian": SQL_W16,
    "j3_range_join": SQL_J3,
    "tpch_q6": SQL_TPCH_Q6,
    "a9_availability": SQL_A9,
    "p16_pivot": SQL_P16,
    "w15_band_support": SQL_W15,
    "p2_time_slice": SQL_P2,
    # wrtds_residuals: rows-only (iterative weighted lstsq)
}
