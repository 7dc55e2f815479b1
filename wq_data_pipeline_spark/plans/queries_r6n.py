"""Catalog batch 23 (round 6, eleventh wave): two more estimation /
evaluation primitives:

* cms_user_counts   — count-min sketch over the event stream's user
                      ids (d=4 rows x w=256 counters, md5-seeded),
                      plus the sketch's point estimates for the 10
                      heaviest users next to their exact counts. The
                      sketch build is d hash aggregates (map-side
                      combinable — the mergeability that makes CMS
                      work on 100 TB); estimates and their
                      overcount bias are themselves oracled.
* seasonal_naive_mae — backtest of the seasonal-naive forecaster
                      (value(t) := value at the same hour one day
                      earlier, per series): per-series MAE and bias
                      over the final week, in exact integer centi
                      units. The standard baseline any forecasting
                      stack must beat — and a pure lag window here.

Determinism: md5 hashing, integer centi-units, BIGINT sums, single
final divisions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_CMS_D = 4
_CMS_W = 256
_TOPK = 10


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


def _cms_cell(col: F.Column, row: int) -> F.Column:
    seeded = F.concat(F.lit(f"cms{row}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("long") % _CMS_W


def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event counts: build the d x w
    counter table (one hash agg per row — partial-aggregable, so the
    sketch merges across partitions/executors for free), then report
    the 10 heaviest users' exact counts beside their CMS estimate
    (min over the d counters they hash to). est >= exact always; the
    overcount IS the oracled signal.

    Scale: the sketch is d map-side-combinable aggs to d*w rows
    total; the top-k exact pass is one hash agg + rank. The point
    lookups broadcast-join the d*w-row sketch."""
    ev = _events(spark, sf_dir)
    cells = None
    for r in range(_CMS_D):
        c = ev.groupBy(
            F.lit(r).alias("row"), _cms_cell(F.col("user_id"), r).alias("cell")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        cells = c if cells is None else cells.unionByName(c)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("n_exact").desc(), F.col("user_id"))
        ),
    ).filter(F.col("rk") <= _TOPK)
    probes = top.select(
        "user_id",
        "n_exact",
        "rk",
        *[
            _cms_cell(F.col("user_id"), r).alias(f"c{r}")
            for r in range(_CMS_D)
        ],
    )
    for r in range(_CMS_D):
        s = cells.filter(F.col("row") == r).select(
            F.col("cell").alias(f"c{r}"), F.col("cnt").alias(f"e{r}")
        )
        probes = probes.join(F.broadcast(s), f"c{r}")
    est = F.least(*[F.col(f"e{r}") for r in range(_CMS_D)])
    return probes.select(
        "rk",
        "user_id",
        "n_exact",
        est.alias("n_cms"),
        (est - F.col("n_exact")).alias("overcount"),
    ).orderBy("rk")


def _cms_cell_sql(expr: str, row: int) -> str:
    return (
        f"('0x' || substr(md5('cms{row}:' || CAST({expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_CMS_W}"
    )


SQL_CMS_USER_COUNTS = f"""
WITH cells AS (
  {" UNION ALL ".join(
      f"SELECT {r} AS row, {_cms_cell_sql('user_id', r)} AS cell, count(*) AS cnt "
      f"FROM events GROUP BY 2"
      for r in range(_CMS_D)
  )}
),
exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
top AS (
  SELECT *, row_number() OVER (ORDER BY n_exact DESC, user_id) AS rk
  FROM exact QUALIFY rk <= {_TOPK}
),
est AS (
  SELECT t.rk, t.user_id, t.n_exact,
         least({", ".join(
             f"(SELECT cnt FROM cells WHERE row = {r} "
             f"AND cell = {_cms_cell_sql('t.user_id', r)})"
             for r in range(_CMS_D)
         )}) AS n_cms
  FROM top t
)
SELECT rk, user_id, n_exact, CAST(n_cms AS BIGINT) AS n_cms,
       CAST(n_cms - n_exact AS BIGINT) AS overcount
FROM est ORDER BY rk"""


_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_BT_LAST_DAYS = 7


def q_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest the seasonal-naive forecaster on the hourly series:
    prediction for hour h = the series' value sum at hour h - 24
    (the SAME hour one day earlier, not 24 observed rows back — the
    hourly grids have gaps, so this is a calendar self-join on
    h - 24, not a lag window); score per series over the last
    {_BT_LAST_DAYS} days as MAE and mean bias in integer centi-units.
    Hours whose previous-day hour is unobserved have no prediction
    and are excluded from the score.

    Scale: hourly pre-agg (map-side combinable) then ONE per-series
    equi-join on (event_type, h-24) — shuffle-keyed, no densify
    materialization; the cutoff scalar stays a lazy 1-row broadcast
    cross-join (no driver collect)."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", (F.col("ts_us") / _HOUR_US).cast("long").alias("h")
    ).agg(F.sum("vc").alias("v"))
    prev_day = hourly.select(
        "event_type", (F.col("h") + 24).alias("h"), F.col("v").alias("pred")
    )
    d = hourly.join(prev_day, ["event_type", "h"], "left")
    cut = d.groupBy().agg(
        (F.max("h") - F.lit(_BT_LAST_DAYS * 24)).alias("h_cut")
    )
    scored = d.crossJoin(F.broadcast(cut)).filter(
        (F.col("h") > F.col("h_cut")) & F.col("pred").isNotNull()
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.abs(F.col("v") - F.col("pred"))).alias("_sae"),
            F.sum(F.col("v") - F.col("pred")).alias("_sbias"),
        )
        .select(
            "event_type",
            "n_hours",
            (F.col("_sae") / F.col("n_hours")).alias("mae_c"),
            (F.col("_sbias") / F.col("n_hours")).alias("bias_c"),
        )
        .orderBy("event_type")
    )


SQL_SEASONAL_NAIVE_MAE = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT a.event_type, a.h, a.v, b.v AS pred
  FROM hourly a
  LEFT JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h - 24
),
cut AS (SELECT max(h) - {_BT_LAST_DAYS * 24} AS c FROM d)
SELECT event_type,
       count(*) AS n_hours,
       CAST(sum(abs(v - pred)) AS DOUBLE) / count(*) AS mae_c,
       CAST(sum(v - pred) AS DOUBLE) / count(*) AS bias_c
FROM d, cut
WHERE h > c AND pred IS NOT NULL
GROUP BY 1 ORDER BY 1"""


QUERIES23: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cms_user_counts": q_cms_user_counts,
    "seasonal_naive_mae": q_seasonal_naive_mae,
}

ORACLES23: dict[str, str] = {
    "cms_user_counts": SQL_CMS_USER_COUNTS,
    "seasonal_naive_mae": SQL_SEASONAL_NAIVE_MAE,
}
