"""Catalog batch 11 (round 6, second wave): warehouse-surface
operators — SCD2 history intervals and MERGE/upsert semantics. These
round out the lakehouse read/write patterns next to
``latest_snapshot`` (snapshot read) and ``event_dedup_window``
(idempotent ingest): together they are the batch forms of what
Delta/Iceberg MERGE INTO + time travel give a 100-TB table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each version of
    a (user_id, event_type) key becomes a validity interval
    [valid_from, valid_to) closed by the NEXT version's timestamp;
    the last version stays open (is_current). One window partitioned
    by the key — parallelism scales with key cardinality, no global
    sort; the standard way a warehouse derives SCD2 history from an
    append-only change log."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros("ts")).over(w)
    return ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        "value",
        F.row_number().over(w).alias("version_n"),
        nxt.isNull().alias("is_current"),
    )


SQL_SCD2_INTERVALS = """
SELECT user_id, event_type, event_id,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       value,
       row_number() OVER w AS version_n,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)"""


_MU_NEW_OFFSET = 10_000_000  # synthetic insert keys sit above real ids


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a batch operator (the Delta/Iceberg
    upsert, expressed engine-neutrally): a deterministic updates feed
    (every 10th event re-arrives with a corrected value; the same
    rows ALSO arrive as brand-new keys) is merged into the target on
    the primary key — matched rows take the update's value, unmatched
    updates insert, everything else carries over. One full-outer hash
    join on the key; at scale this is exactly the shuffle MERGE INTO
    performs (or a broadcast join when the delta is small — AQE picks
    that here)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    ).withColumn("_tpresent", F.lit(True))
    upd_src = ev.filter(F.col("event_id") % 10 == 0)
    updates = upd_src.select(
        "event_id", "user_id", "event_type", "ts_us",
        (F.col("value") + 100.0).alias("value"),
    ).unionByName(
        upd_src.select(
            (F.col("event_id") + _MU_NEW_OFFSET).alias("event_id"),
            "user_id",
            "event_type",
            "ts_us",
            (F.col("value") * 2.0).alias("value"),
        )
    )
    u = updates.select(
        F.col("event_id"),
        F.col("user_id").alias("_uu"),
        F.col("event_type").alias("_ue"),
        F.col("ts_us").alias("_ut"),
        F.col("value").alias("_uv"),
        F.lit(True).alias("_upresent"),
    )
    merged = ev.join(u, "event_id", "full_outer")
    return merged.select(
        "event_id",
        F.coalesce(F.col("_uu"), F.col("user_id")).alias("user_id"),
        F.coalesce(F.col("_ue"), F.col("event_type")).alias("event_type"),
        F.coalesce(F.col("_ut"), F.col("ts_us")).alias("ts_us"),
        F.coalesce(F.col("_uv"), F.col("value")).alias("value"),
        # presence markers, not value nullness: a matched update whose
        # payload value is NULL must still read as updated
        (F.col("_upresent").isNotNull() & F.col("_tpresent").isNotNull()).alias(
            "was_updated"
        ),
        F.col("_tpresent").isNull().alias("was_inserted"),
    )


SQL_MERGE_UPSERT = f"""
WITH t AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events
),
u AS (
  SELECT event_id, user_id, event_type, ts_us, value + 100.0 AS value
  FROM t WHERE event_id % 10 = 0
  UNION ALL
  SELECT event_id + {_MU_NEW_OFFSET}, user_id, event_type, ts_us, value * 2.0
  FROM t WHERE event_id % 10 = 0
)
SELECT coalesce(t.event_id, u.event_id) AS event_id,
       coalesce(u.user_id, t.user_id) AS user_id,
       coalesce(u.event_type, t.event_type) AS event_type,
       coalesce(u.ts_us, t.ts_us) AS ts_us,
       coalesce(u.value, t.value) AS value,
       u.event_id IS NOT NULL AND t.event_id IS NOT NULL AS was_updated,
       t.event_id IS NULL AS was_inserted
FROM t FULL OUTER JOIN u ON t.event_id = u.event_id"""


QUERIES11: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scd2_intervals": q_scd2_intervals,
    "merge_upsert": q_merge_upsert,
}

ORACLES11: dict[str, str] = {
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "merge_upsert": SQL_MERGE_UPSERT,
}


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p25/p50/p75/p90) of the value
    column — the profiling companion to sketch_profile's approximate
    path: at moderate group cardinality the exact sort-based
    percentile is affordable and oracle-comparable (both engines use
    linear interpolation over the sorted values; identical inputs →
    bit-identical doubles, the F.median precedent)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type, count(value) AS n,
       percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS p25,
       percentile_cont(0.50) WITHIN GROUP (ORDER BY value) AS p50,
       percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS p75,
       percentile_cont(0.90) WITHIN GROUP (ORDER BY value) AS p90
FROM events GROUP BY event_type"""


_TG_STEP_US = 900_000_000  # 15-minute grid


def q_time_grid_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid upsampling with forward-fill — the complement of
    W17's downsample and the standard series-alignment step before
    feature windows: per event_type, generate the full 15-min grid
    between the series' first and last points (floor-aligned), attach
    the observed value where a slot has one (slot-max ts wins, exact
    median is already applied upstream of real pipelines; here
    last-by-(ts,event_id) for determinism), and forward-fill gaps
    with the most recent observation. Grid generation is a per-group
    sequence() explode (narrow, sized by the span); the fill is one
    key-partitioned window — no Python, no global sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "value", "event_id"
    )
    # floor-div (not double-div + cast, which truncates toward zero):
    # matches the oracle's // for pre-1970 timestamps
    span = ev.groupBy("event_type").agg(
        (F.floor(F.min("us") / _TG_STEP_US).cast("long") * _TG_STEP_US).alias("_lo"),
        (F.floor(F.max("us") / _TG_STEP_US).cast("long") * _TG_STEP_US).alias("_hi"),
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(_TG_STEP_US))
        ).alias("slot_us"),
    )
    # one observation per slot: the latest (us, event_id) in the slot
    obs = (
        ev.withColumn(
            "slot_us", F.floor(F.col("us") / _TG_STEP_US).cast("long") * _TG_STEP_US
        )
        .groupBy("event_type", "slot_us")
        .agg(
            F.max_by(
                F.col("value"), F.struct(F.col("us"), F.col("event_id"))
            ).alias("obs_value"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    from pyspark.sql import Window

    g = grid.join(obs, ["event_type", "slot_us"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last(
        F.when(F.col("n_obs").isNotNull(), F.col("obs_value")), ignorenulls=True
    ).over(w)
    return g.select(
        "event_type",
        "slot_us",
        F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"),
        filled.alias("value_ffill"),
        F.col("n_obs").isNull().alias("is_filled"),
    )


SQL_TIME_GRID_FFILL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, value, event_id FROM events
),
span AS (
  SELECT event_type,
         (min(us) // {_TG_STEP_US}) * {_TG_STEP_US} AS lo,
         (max(us) // {_TG_STEP_US}) * {_TG_STEP_US} AS hi
  FROM e GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, {_TG_STEP_US})) AS slot_us
  FROM span
),
obs AS (
  SELECT event_type, slot_us, obs_value, n_obs FROM (
    SELECT event_type, (us // {_TG_STEP_US}) * {_TG_STEP_US} AS slot_us,
           value AS obs_value,
           row_number() OVER (PARTITION BY event_type, us // {_TG_STEP_US}
                              ORDER BY us DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY event_type, us // {_TG_STEP_US}) AS n_obs
    FROM e
  ) WHERE rn = 1
)
SELECT g.event_type, g.slot_us,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
       last_value(CASE WHEN o.n_obs IS NOT NULL THEN o.obs_value END IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.slot_us
               ROWS UNBOUNDED PRECEDING) AS value_ffill,
       o.n_obs IS NULL AS is_filled
FROM grid g LEFT JOIN obs o USING (event_type, slot_us)"""


QUERIES11["value_percentiles"] = q_value_percentiles
ORACLES11["value_percentiles"] = SQL_VALUE_PERCENTILES
QUERIES11["time_grid_ffill"] = q_time_grid_ffill
ORACLES11["time_grid_ffill"] = SQL_TIME_GRID_FFILL


def q_embed_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERING end-to-end: banded-LSH candidate
    pairs at cosine >= 0.45 (the embed_near_dup plan) -> connected
    components (min-label propagation, O(log n) rounds) -> cluster
    assignment per vector + cluster size. The embedding-space twin of
    ``dedup_clusters`` (MinHash pairs over documents): together they
    cover both modalities of the pairs->components dedup composition.
    The oracle replays the identical md5-hyperplane pair generation
    and closes components with a recursive CTE."""
    from wq_data_pipeline_spark.operators.dedup import connected_components
    from wq_data_pipeline_spark.plans.queries_ext import q_embed_near_dup

    pairs = q_embed_near_dup(spark, sf_dir).select("id_a", "id_b")
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")
    comps = connected_components(nodes, pairs, "vec_id", "id_a", "id_b")
    sizes = comps.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comps.join(sizes, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def _embed_dup_clusters_sql() -> str:
    from wq_data_pipeline_spark.plans.queries_ext import _EMBED_NEAR_DUP_CTE

    return f"""{_EMBED_NEAR_DUP_CTE},
edges AS (
  SELECT id_a AS a, id_b AS b FROM dup_pairs
  UNION SELECT id_b, id_a FROM dup_pairs
),
reach AS (
  WITH RECURSIVE r(node, root) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.b, r.root FROM r JOIN edges e ON e.a = r.node
  )
  SELECT node, min(root) AS cluster_id FROM r GROUP BY node
),
sized AS (
  SELECT cluster_id, count(*) AS cluster_size FROM reach GROUP BY cluster_id
)
SELECT node AS vec_id, reach.cluster_id, cluster_size,
       node = reach.cluster_id AS is_canonical
FROM reach JOIN sized USING (cluster_id)"""


SQL_EMBED_DUP_CLUSTERS = _embed_dup_clusters_sql()


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): per user,
    the first view, the first click AT OR AFTER that view, and the
    first purchase at or after that click — the classic product-
    analytics sequence query. Three per-user min-aggregations chained
    by time predicates; every agg is map-side combinable and shuffles
    only (user, ts) pairs. depth = how far the user got."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("us") >= F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("us") >= F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    out = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    depth = (
        F.lit(1)
        + F.col("click_us").isNotNull().cast("int")
        + F.col("purchase_us").isNotNull().cast("int")
    )
    return out.select(
        "user_id", "view_us", "click_us", "purchase_us", depth.alias("depth")
    )


SQL_EVENT_FUNNEL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
t1 AS (SELECT user_id, min(us) AS view_us FROM e WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.us) AS click_us
  FROM e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.us >= t1.view_us
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.us) AS purchase_us
  FROM e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.us >= t2.click_us
  GROUP BY e.user_id
)
SELECT t1.user_id, t1.view_us, t2.click_us, t3.purchase_us,
       1 + CAST(t2.user_id IS NOT NULL AS INT) + CAST(t3.user_id IS NOT NULL AS INT) AS depth
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id"""


_DAY_US = 86_400_000_000


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle: users are cohorted by their first
    active day;each (cohort_day, day-offset) cell counts the distinct
    users active that day. Two hash aggs (per-user first day; per-cell
    distinct count) — the standard growth-analytics rollup, all
    integer day arithmetic (µs // 86.4e9, timezone-free)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_micros("ts") / _DAY_US).cast("long").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = ev.distinct()
    return (
        act.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_RETENTION_COHORTS = f"""
WITH e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
SELECT f.cohort_day, e.day - f.cohort_day AS offset_days,
       count(DISTINCT e.user_id) AS n_users
FROM e JOIN f ON e.user_id = f.user_id
GROUP BY f.cohort_day, e.day - f.cohort_day"""


QUERIES11["embed_dup_clusters"] = q_embed_dup_clusters
ORACLES11["embed_dup_clusters"] = SQL_EMBED_DUP_CLUSTERS
QUERIES11["event_funnel"] = q_event_funnel
ORACLES11["event_funnel"] = SQL_EVENT_FUNNEL
QUERIES11["retention_cohorts"] = q_retention_cohorts
ORACLES11["retention_cohorts"] = SQL_RETENTION_COHORTS
