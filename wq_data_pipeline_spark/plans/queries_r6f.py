"""Catalog batch 15 (round 6, fifth wave): time-series analytics and
graph analytics over the events table — the classic operations a
monitoring/QC engine layers on top of the detector suite:

* ewma_series         — truncated exponentially-weighted moving
                        average (alpha = 1/2, 16 taps)
* acf_lags            — per-series autocorrelation at lags
                        1/2/3/6/12
* cusum_changepoint   — CUSUM changepoint statistic + argmax
                        location per series
* seasonal_hours      — hour-of-day seasonal indices (additive
                        decomposition means)
* xcorr_daily         — lagged cross-correlation between the click
                        and purchase daily-count series
* triangle_counts     — per-user triangle participation in the
                        hourly co-occurrence graph

Determinism: every order-sensitive double sum is eliminated, not
rounded — values quantize to integer centi-units (round(value*100),
one IEEE product per row), deviations subtract an integer floor-div
mean, and all accumulations run as exact BIGINT sums; the only
floating-point steps are single divisions / square roots of exact
integers (bit-identical cross-engine). The EWMA's weights are exact
powers of two, so its products are exact scalings and its fixed
left-associated 16-term sum is bit-identical in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


def _vq() -> F.Column:
    """value in integer centi-units (one IEEE product + round)."""
    return F.round(F.col("value") * 100).cast("long")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# --------------------------------------------------------------------------
# EWMA (16-tap truncated, alpha = 1/2)
# --------------------------------------------------------------------------

_EWMA_TAPS = 16
# 0.5**j round-trips exactly through repr(), so the Spark literal and
# the SQL literal parse to the same double.
_EWMA_NORM = repr(sum(0.5**j for j in range(_EWMA_TAPS)))  # 2 - 2^-15


def q_ewma_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA over the click series: at each point,
    sum_{j=0..15} value[i-j] * (1/2)^j, normalized by the constant
    weight mass (rows with fewer than 15 predecessors are excluded,
    so the mass is constant and no per-row weight bookkeeping is
    needed).

    The recursive EWMA is deliberately truncated to a 16-tap FIR:
    the (1/2)^16 tail is below double noise for this use, the
    operator becomes a bounded per-key window (no sequential scan /
    no unbounded state), and — because the weights are exact powers
    of two — every product is an exact scaling, making the result
    bit-deterministic across engines.

    Scale: per-key lag windows; a single monster key routes through
    operators/scale.bucketed_window_apply (halo >= 15 rows)."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withColumn("_rn", F.row_number().over(w))
    )
    num = F.col("value")  # j = 0
    for j in range(1, _EWMA_TAPS):
        num = num + F.lag("value", j).over(w) * F.lit(0.5**j)
    return (
        ev.withColumn("_num", num)
        .filter(F.col("_rn") > _EWMA_TAPS - 1)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            (F.col("_num") / F.lit(float(_EWMA_NORM))).alias("ewma"),
        )
    )


def _ewma_sql() -> str:
    terms = ["value"] + [
        f"lag(value, {j}) OVER w * {0.5 ** j!r}" for j in range(1, _EWMA_TAPS)
    ]
    chain = " + ".join(terms)
    return f"""
SELECT event_id, epoch_us(ts) AS ts_us, value,
       ({chain}) / {_EWMA_NORM} AS ewma
FROM events
WHERE event_type = 'click'
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
QUALIFY row_number() OVER w > {_EWMA_TAPS - 1}"""


SQL_EWMA_SERIES = _ewma_sql()


# --------------------------------------------------------------------------
# ACF at fixed lags
# --------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6, 12)


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation r_k at lags 1/2/3/6/12.

    All sums are exact: values quantize to centi-units, the mean is
    an integer floor-div, deviation products are BIGINT (|dev| <=
    ~5e4, so a 100-TB-scale sum stays far under int64), and r_k is
    ONE double division of two exact integers.

    Plan shape: one pass computes all five lag columns under a
    single window sort; per-type totals (5 rows) broadcast back."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = _events(spark, sf_dir).withColumn("vq", _vq())
    for k in _ACF_LAGS:
        ev = ev.withColumn(f"lq_{k}", F.lag("vq", k).over(w))
    stats = ev.groupBy("event_type").agg(
        F.sum("vq").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    ev = ev.join(F.broadcast(stats), "event_type").withColumn(
        "_m", F.expr("_s DIV _n")
    )
    dev = F.col("vq") - F.col("_m")
    aggs = [F.sum(dev * dev).alias("den")]
    for k in _ACF_LAGS:
        devk = F.col(f"lq_{k}") - F.col("_m")
        aggs.append(
            F.sum(F.when(F.col(f"lq_{k}").isNotNull(), dev * devk)).alias(f"num_{k}")
        )
        aggs.append(
            F.count(F.col(f"lq_{k}")).alias(f"np_{k}")
        )
    per = ev.groupBy("event_type").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.col(f"np_{k}").alias("n_pairs"),
                (F.col(f"num_{k}").cast("double") / F.col("den").cast("double")).alias(
                    "acf"
                ),
            )
            for k in _ACF_LAGS
        ]
    )
    return per.select(
        "event_type", F.explode(pairs).alias("_p")
    ).select("event_type", "_p.lag", "_p.n_pairs", "_p.acf")


SQL_ACF_LAGS = """
WITH q AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events
),
l AS (
  SELECT event_type, vq,
         lag(vq, 1) OVER w AS lq_1, lag(vq, 2) OVER w AS lq_2,
         lag(vq, 3) OVER w AS lq_3, lag(vq, 6) OVER w AS lq_6,
         lag(vq, 12) OVER w AS lq_12
  FROM q WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
s AS (
  SELECT event_type, CAST(sum(vq) AS BIGINT) AS _s, count(*) AS _n
  FROM q GROUP BY 1
),
d AS (
  SELECT l.*, _s // _n AS _m FROM l JOIN s USING (event_type)
),
per AS (
  SELECT event_type,
         CAST(sum((vq - _m) * (vq - _m)) AS BIGINT) AS den,
         CAST(sum(CASE WHEN lq_1  IS NOT NULL THEN (vq - _m) * (lq_1  - _m) END) AS BIGINT) AS num_1,
         count(lq_1)  AS np_1,
         CAST(sum(CASE WHEN lq_2  IS NOT NULL THEN (vq - _m) * (lq_2  - _m) END) AS BIGINT) AS num_2,
         count(lq_2)  AS np_2,
         CAST(sum(CASE WHEN lq_3  IS NOT NULL THEN (vq - _m) * (lq_3  - _m) END) AS BIGINT) AS num_3,
         count(lq_3)  AS np_3,
         CAST(sum(CASE WHEN lq_6  IS NOT NULL THEN (vq - _m) * (lq_6  - _m) END) AS BIGINT) AS num_6,
         count(lq_6)  AS np_6,
         CAST(sum(CASE WHEN lq_12 IS NOT NULL THEN (vq - _m) * (lq_12 - _m) END) AS BIGINT) AS num_12,
         count(lq_12) AS np_12
  FROM d GROUP BY 1
)
SELECT event_type, lag, n_pairs, acf FROM (
  SELECT event_type, CAST(1 AS BIGINT) AS lag, np_1 AS n_pairs,
         CAST(num_1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM per
  UNION ALL
  SELECT event_type, 2, np_2, CAST(num_2 AS DOUBLE) / CAST(den AS DOUBLE) FROM per
  UNION ALL
  SELECT event_type, 3, np_3, CAST(num_3 AS DOUBLE) / CAST(den AS DOUBLE) FROM per
  UNION ALL
  SELECT event_type, 6, np_6, CAST(num_6 AS DOUBLE) / CAST(den AS DOUBLE) FROM per
  UNION ALL
  SELECT event_type, 12, np_12, CAST(num_12 AS DOUBLE) / CAST(den AS DOUBLE) FROM per
)"""


# --------------------------------------------------------------------------
# CUSUM changepoint
# --------------------------------------------------------------------------

def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint: the running sum of integer
    deviations from the series mean, its maximum absolute excursion,
    and the FIRST (ts, event_id) where that maximum is reached — the
    classic single-changepoint location statistic.

    Exactness: deviations are integers (centi-units minus a floor-div
    mean), so the prefix sum, the max, and the argmax are all exact;
    no float ever enters the comparison.

    Scale: the per-key prefix sum is a bounded window here; a single
    giant series routes through operators/scale.distributed_prefix_sum
    (range-partitioned two-level cumsum)."""
    ev = _events(spark, sf_dir).withColumn("vq", _vq())
    stats = ev.groupBy("event_type").agg(
        F.sum("vq").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cum = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("_m", F.expr("_s DIV _n"))
        .withColumn("c", F.sum(F.col("vq") - F.col("_m")).over(w))
        .withColumn("absc", F.abs("c"))
    )
    mx = cum.groupBy("event_type").agg(F.max("absc").alias("cusum_max"))
    return (
        cum.join(F.broadcast(mx), "event_type")
        .filter(F.col("absc") == F.col("cusum_max"))
        .groupBy("event_type")
        .agg(
            F.first("cusum_max").alias("cusum_max"),
            F.min(
                F.struct(F.unix_micros("ts").alias("ts_us"), F.col("event_id"))
            ).alias("_w"),
        )
        .select(
            "event_type", "cusum_max",
            F.col("_w.ts_us").alias("cp_ts_us"),
            F.col("_w.event_id").alias("cp_event_id"),
        )
    )


SQL_CUSUM_CHANGEPOINT = """
WITH q AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events
),
s AS (
  SELECT event_type, CAST(sum(vq) AS BIGINT) AS _s, count(*) AS _n
  FROM q GROUP BY 1
),
c AS (
  SELECT q.event_type, ts, event_id,
         abs(CAST(sum(vq - (_s // _n))
             OVER (PARTITION BY q.event_type ORDER BY ts, event_id)
             AS BIGINT)) AS absc
  FROM q JOIN s USING (event_type)
),
m AS (SELECT event_type, max(absc) AS cusum_max FROM c GROUP BY 1)
SELECT c.event_type, cusum_max,
       epoch_us(ts) AS cp_ts_us, event_id AS cp_event_id
FROM c JOIN m ON c.event_type = m.event_type AND absc = cusum_max
QUALIFY row_number() OVER (PARTITION BY c.event_type
                           ORDER BY ts, event_id) = 1"""


# --------------------------------------------------------------------------
# Hour-of-day seasonal indices
# --------------------------------------------------------------------------

def q_seasonal_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive hour-of-day seasonality: per (event_type, hour), the
    deviation of the hour's mean from the series mean, in integer
    micro-value units — the seasonal component of a classical
    decomposition at the hour period.

    means are integer floor-divs of exact centi-unit sums scaled to
    micro (x10000), so the subtraction is exact BIGINT math.

    Plan shape: two hash aggs over one scan (hour grain, then type
    grain re-aggregated FROM the hour grain — never a second pass
    over the fact), broadcast join of the 5-row type totals."""
    ev = _events(spark, sf_dir).withColumn("vq", _vq())
    hour = F.hour("ts").cast("long")
    per_hour = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.sum("vq").alias("s_h"), F.count(F.lit(1)).alias("n_h")
    )
    per_type = per_hour.groupBy("event_type").agg(
        F.sum("s_h").alias("s"), F.sum("n_h").alias("n")
    )
    return (
        per_hour.join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "hour",
            F.col("n_h").alias("n_obs"),
            F.expr("(10000 * s_h) DIV n_h").alias("hour_mean_micro"),
            (
                F.expr("(10000 * s_h) DIV n_h") - F.expr("(10000 * s) DIV n")
            ).alias("seasonal_micro"),
        )
    )


SQL_SEASONAL_HOURS = """
WITH q AS (
  SELECT event_type, hour(ts) AS hour,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events
),
ph AS (
  SELECT event_type, hour, CAST(sum(vq) AS BIGINT) AS s_h,
         count(*) AS n_h
  FROM q GROUP BY 1, 2
),
pt AS (
  SELECT event_type, CAST(sum(s_h) AS BIGINT) AS s,
         CAST(sum(n_h) AS BIGINT) AS n
  FROM ph GROUP BY 1
)
SELECT event_type, hour, n_h AS n_obs,
       (10000 * s_h) // n_h AS hour_mean_micro,
       (10000 * s_h) // n_h - (10000 * s) // n AS seasonal_micro
FROM ph JOIN pt USING (event_type)"""


# --------------------------------------------------------------------------
# Lagged cross-correlation of daily counts
# --------------------------------------------------------------------------

_XC_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def q_xcorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the click and purchase DAILY COUNT
    series at lags -3..3 days (does click volume lead purchase
    volume?). Pearson r from the exact-integer identity
    n*Sxy - Sx*Sy over sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) — counts
    are integers, every aggregate is exact, and the only floats are
    one sqrt and one division of exact integers.

    Plan shape: the daily-count agg is one shuffle over the
    date-projected scan; the 30-row daily tables broadcast into the
    7 lag joins (a literal lag array explode, one joined pass)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    clicks = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("cd"), F.col("cnt").alias("x")
    )
    purch = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("pd"), F.col("cnt").alias("y")
    )
    lags = spark.range(len(_XC_LAGS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _XC_LAGS]), (F.col("id") + 1).cast("int")
        ).alias("lag")
    )
    joined = (
        clicks.join(F.broadcast(lags))
        .join(
            purch,
            F.expr("date_add(cd, CAST(lag AS INT))") == F.col("pd"),
        )
    )
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (
            (n * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (n * F.col("syy") - F.col("sy") * F.col("sy"))
        ).cast("double")
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        (num.cast("double") / den).alias("xcorr"),
    )


SQL_XCORR_DAILY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS cnt
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
c AS (SELECT d AS cd, cnt AS x FROM daily WHERE event_type = 'click'),
p AS (SELECT d AS pd, cnt AS y FROM daily WHERE event_type = 'purchase'),
j AS (
  SELECT lag, x, y
  FROM c
  CROSS JOIN (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag)
  JOIN p ON cd + CAST(lag AS INT) = pd
),
a AS (
  SELECT lag, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM j GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
       / sqrt(CAST((n_days * sxx - sx * sx) * (n_days * syy - sy * sy)
               AS DOUBLE)) AS xcorr
FROM a"""


# --------------------------------------------------------------------------
# Triangle counting on the hourly co-occurrence graph
# --------------------------------------------------------------------------

_TRI_BUCKET_CAP = 20


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared user co-occurrence graph: distinct (ua < ub) pairs
    of users acting in the same (event_type, hour) bucket, with
    buckets over the hot cap dropped BEFORE the pair self-join.
    Returned PINNED (localCheckpoint) because every consumer fans
    out over it multiple times."""
    ev = _events(spark, sf_dir)
    bucket_users = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "user_id",
        )
        .distinct()
    )
    sized = bucket_users.withColumn(
        "_bn", F.count(F.lit(1)).over(Window.partitionBy("event_type", "h"))
    ).filter(F.col("_bn") <= _TRI_BUCKET_CAP)
    a = sized.select("event_type", "h", F.col("user_id").alias("ua"))
    b = sized.select("event_type", "h", F.col("user_id").alias("ub"))
    return (
        a.join(b, ["event_type", "h"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
        .localCheckpoint()
    )


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle participation: users are linked when they
    act in the same (event_type, hour) bucket; triangles are the
    standard two-hop join a<b<c with the closing (a, c) edge checked
    by an inner join on the deduplicated edge set.

    Hot-bucket guard: buckets with more than 20 distinct users are
    dropped BEFORE the pair self-join (documented contract, same
    rule both engines), bounding per-bucket pair fan-out at cap^2 —
    the same discipline as the MinHash-LSH hot-bucket guard.

    Plan shape at scale: bucket agg (one shuffle) -> bounded
    per-bucket pair explosion -> edge distinct (shuffle on the pair
    key), then the edge set is PINNED (localCheckpoint) because five
    downstream branches read it (e1/e2/the closing semi-join/both
    degree sides) — unpinned, Catalyst recomputes the whole edge
    subtree per branch (measured E=30 vs E<=8 pinned). The two-hop
    join partitions on the shared vertex. No CartesianProduct;
    every join is keyed."""
    edges = cooccurrence_edges(spark, sf_dir)
    e1 = edges.select(F.col("ua").alias("a"), F.col("ub").alias("b"))
    e2 = edges.select(F.col("ua").alias("b2"), F.col("ub").alias("c"))
    e3 = edges.select(F.col("ua").alias("a3"), F.col("ub").alias("c3"))
    tris = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "leftsemi",
        )
        .select("a", "b", "c")
    )
    tri_nodes = tris.select(
        F.explode(F.array("a", "b", "c")).alias("user_id")
    ).groupBy("user_id").agg(F.count(F.lit(1)).alias("n_triangles"))
    degree = (
        edges.select(F.col("ua").alias("user_id"))
        .unionAll(edges.select(F.col("ub").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        degree.join(tri_nodes, "user_id", "left")
        .select(
            "user_id", "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )


SQL_TRIANGLE_COUNTS = """
WITH bu AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY event_type, h) AS _bn FROM bu
),
ok AS (SELECT * FROM sized WHERE _bn <= 20),
edges AS (
  SELECT DISTINCT x.user_id AS ua, y.user_id AS ub
  FROM ok x JOIN ok y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
),
tris AS (
  SELECT e1.ua AS a, e1.ub AS b, e2.ub AS c
  FROM edges e1
  JOIN edges e2 ON e1.ub = e2.ua
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.ua = e1.ua AND e3.ub = e2.ub)
),
tn AS (
  SELECT user_id, count(*) AS n_triangles FROM (
    SELECT a AS user_id FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
  ) GROUP BY 1
),
deg AS (
  SELECT user_id, count(*) AS degree FROM (
    SELECT ua AS user_id FROM edges UNION ALL SELECT ub FROM edges
  ) GROUP BY 1
)
SELECT deg.user_id, degree, coalesce(n_triangles, 0) AS n_triangles
FROM deg LEFT JOIN tn ON deg.user_id = tn.user_id"""


QUERIES15: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ewma_series": q_ewma_series,
    "acf_lags": q_acf_lags,
    "cusum_changepoint": q_cusum_changepoint,
    "seasonal_hours": q_seasonal_hours,
    "xcorr_daily": q_xcorr_daily,
    "triangle_counts": q_triangle_counts,
}

ORACLES15: dict[str, str] = {
    "ewma_series": SQL_EWMA_SERIES,
    "acf_lags": SQL_ACF_LAGS,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "seasonal_hours": SQL_SEASONAL_HOURS,
    "xcorr_daily": SQL_XCORR_DAILY,
    "triangle_counts": SQL_TRIANGLE_COUNTS,
}
