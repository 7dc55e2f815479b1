"""Catalog batch 27 (round 9): incremental / merge-on-read CDC
surface over the events change stream — the depth item VERDICT r8 #7
asked for next to the existing snapshot pair (``latest_snapshot`` =
copy-on-write snapshot read, ``merge_upsert`` = MERGE INTO,
``scd2_intervals`` = history build, ``event_dedup_window`` =
idempotent ingest). These three are the *merge-on-read* half of the
lakehouse story (Hudi MoR / Delta change-data-feed / Iceberg v2
position-delete reads, expressed engine-neutrally):

- ``cdc_merge_on_read``  — read-time resolution of base snapshot +
  change log (upserts AND deletes), the MoR query path;
- ``cdc_changes_between`` — net change set between two table
  versions (the ``table_changes(lo, hi)`` incremental read);
- ``compaction_plan``    — the planner that decides which file
  groups the compactor should rewrite, from log/base amplification.

CDC framing, deterministic from the driver's events table: every
event row is a change record on key (user_id, event_type) with
sequence = (ts, event_id); rows whose event_id % 5 == 0 are DELETE
markers, the rest upserts. "Table versions" are µs cut points at
fixed fractions of the observed ts span — exact BIGINT arithmetic,
identical in both dialects.

Exactness: values pass through per-row (no distributed double
accumulation); the one ratio (compaction amplification) divides two
exact BIGINT counts, rounded 6dp in both dialects. Timestamps emit
as epoch-µs BIGINT per repo convention.

Scale: all three are one-shuffle-per-key-window / hash-agg shapes.
The span cut is a 1-row global agg broadcast back (the two-pass
scalar pattern from SURVEY §4.1); raw rows shuffle once on the key;
nothing quadratic, nothing collected. At 100 TB the key window is
the same shuffle a MERGE INTO or CDF read performs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

# version cut points, in tenths of the observed [min_ts, max_ts] µs
# span: the base snapshot is "version as of 7/10"; the incremental
# read consumes (4/10, 7/10]
_CUT_NUM = 7
_LO_NUM = 4
_DEN = 10


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as CDC records: key (user_id, event_type), sequence
    (ts_us, event_id), op ('D' delete marker / 'U' upsert), plus the
    span cut points broadcast onto every row (1-row agg cross-join —
    stays one lazy plan, no driver round-trip)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    # integer DIV, not float "/ then cast": DuckDB CASTs doubles to
    # BIGINT by ROUNDING while Spark truncates — at µs resolution the
    # two cuts could land 1 µs apart (oracle-exactness convention)
    span = ev.agg(
        F.min("ts_us").alias("_t0"), F.max("ts_us").alias("_t1")
    ).select(
        F.expr(
            f"_t0 + (_t1 - _t0) * {_CUT_NUM} DIV {_DEN}"
        ).alias("_cut_us"),
        F.expr(
            f"_t0 + (_t1 - _t0) * {_LO_NUM} DIV {_DEN}"
        ).alias("_lo_us"),
    )
    return ev.join(F.broadcast(span))


_KEY = ["user_id", "event_type"]


def _latest(w_cols: list[str]) -> Window:
    return Window.partitionBy(*w_cols).orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )


def q_cdc_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read CDC view: the base snapshot (latest record per
    key as of the 7/10 cut — what a compactor would have written)
    overlaid at READ time with the change log (every record after
    the cut, upserts and delete markers). For each key the winning
    record is the latest by (ts, event_id) across base+log; a
    winning delete marker removes the key from the view. Emits the
    resolved row plus the read-amplification facts a MoR table
    exposes per key: how many log records the read had to merge and
    whether the winner came from the log.

    Scale: base and log are filters of ONE scan; the overlay is a
    single row_number window on the key — the same one shuffle the
    copy-on-write ``latest_snapshot`` pays, plus zero extra joins.
    This is exactly why MoR reads stay cheap when the log is thin
    and why ``compaction_plan`` watches the ratio."""
    r = _records(spark, sf_dir)
    base = (
        r.filter(F.col("ts_us") <= F.col("_cut_us"))
        .withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter(F.col("_rn") == 1)
        # the base file is a resolved snapshot: delete markers that
        # "won" at compaction time simply left no row behind
        .filter(F.col("op") == "U")
        .select(*_KEY, "ts_us", "event_id", "value", "op")
        .withColumn("from_log", F.lit(False))
    )
    log = (
        r.filter(F.col("ts_us") > F.col("_cut_us"))
        .select(*_KEY, "ts_us", "event_id", "value", "op")
        .withColumn("from_log", F.lit(True))
    )
    merged = base.unionByName(log)
    kw = Window.partitionBy(*_KEY)
    return (
        merged.withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .withColumn(
            "n_log_records", F.sum(F.col("from_log").cast("long")).over(kw)
        )
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            "event_type",
            "ts_us",
            "value",
            "n_log_records",
            "from_log",
        )
    )


SQL_CDC_MERGE_ON_READ = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * {_CUT_NUM} // {_DEN} AS cut_us
  FROM r
),
base AS (
  SELECT user_id, event_type, ts_us, event_id, value, op, FALSE AS from_log
  FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM r, span WHERE ts_us <= cut_us
  ) WHERE rn = 1 AND op = 'U'
),
log AS (
  SELECT user_id, event_type, ts_us, event_id, value, op, TRUE AS from_log
  FROM r, span WHERE ts_us > cut_us
),
merged AS (SELECT * FROM base UNION ALL SELECT * FROM log)
SELECT user_id, event_type, ts_us, value, n_log_records, from_log FROM (
  SELECT user_id, event_type, ts_us, value, op, from_log,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts_us DESC, event_id DESC) AS rn,
         CAST(sum(CASE WHEN from_log THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id, event_type) AS BIGINT)
           AS n_log_records
  FROM merged
) WHERE rn = 1 AND op = 'U'"""


def q_cdc_changes_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental read between two table versions — the
    ``table_changes(lo, hi)`` / CDF consumer pattern: for every key
    with activity in (lo, hi] (µs cuts at 4/10 and 7/10 of the ts
    span), emit its NET change: the pre-image (resolved state as of
    lo), the post-image (resolved state as of hi), and the change
    type a downstream incremental materialization would apply
    (insert / update / delete; keys whose net effect is a no-op —
    absent before AND deleted within the window — drop out). This is
    how a 100-TB pipeline avoids full-table reprocessing: consumers
    see |changed keys| rows, not |table| rows.

    Scale: two resolved states ride the SAME key-window shuffle on
    filtered subsets of one scan; the pre/post stitch is a per-key
    equi-join of two already-aggregated (one row per key) sides."""
    r = _records(spark, sf_dir)
    pre = (
        r.filter(F.col("ts_us") <= F.col("_lo_us"))
        .withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .select(*_KEY, F.col("value").alias("pre_value"))
    )
    win = r.filter(
        (F.col("ts_us") > F.col("_lo_us")) & (F.col("ts_us") <= F.col("_cut_us"))
    )
    post = (
        win.withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .withColumn(
            "n_changes",
            F.count(F.lit(1)).over(Window.partitionBy(*_KEY)),
        )
        .filter(F.col("_rn") == 1)
        .select(
            *_KEY,
            F.col("ts_us").alias("post_ts_us"),
            F.col("value").alias("post_raw"),
            "op",
            "n_changes",
        )
    )
    j = post.join(pre, _KEY, "left")
    deleted = F.col("op") == "D"
    change_type = (
        F.when(deleted & F.col("pre_value").isNotNull(), F.lit("delete"))
        .when(~deleted & F.col("pre_value").isNotNull(), F.lit("update"))
        .when(~deleted, F.lit("insert"))
    )  # pre-absent delete -> NULL -> filtered: net no-op
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            "user_id",
            "event_type",
            "change_type",
            "pre_value",
            F.when(~deleted, F.col("post_raw")).alias("post_value"),
            "post_ts_us",
            "n_changes",
        )
    )


SQL_CDC_CHANGES_BETWEEN = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * {_LO_NUM} // {_DEN} AS lo_us,
         min(ts_us) + (max(ts_us) - min(ts_us)) * {_CUT_NUM} // {_DEN} AS cut_us
  FROM r
),
pre AS (
  SELECT user_id, event_type, value AS pre_value FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM r, span WHERE ts_us <= lo_us
  ) WHERE rn = 1 AND op = 'U'
),
post AS (
  SELECT user_id, event_type, ts_us AS post_ts_us, value AS post_raw, op,
         n_changes
  FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn,
           CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
             AS n_changes
    FROM r, span WHERE ts_us > lo_us AND ts_us <= cut_us
  ) WHERE rn = 1
)
SELECT user_id, event_type, change_type, pre_value,
       CASE WHEN change_type <> 'delete' THEN post_raw END AS post_value,
       post_ts_us, n_changes
FROM (
  SELECT post.user_id, post.event_type, post_ts_us, post_raw, n_changes,
         pre_value,
         CASE WHEN op = 'D' AND pre_value IS NOT NULL THEN 'delete'
              WHEN op <> 'D' AND pre_value IS NOT NULL THEN 'update'
              WHEN op <> 'D' THEN 'insert' END AS change_type
  FROM post LEFT JOIN pre USING (user_id, event_type)
) WHERE change_type IS NOT NULL"""


_N_BUCKETS = 32


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read compaction planner: file groups (keys hash-
    bucketed by user_id % 32, standing in for the table's physical
    bucketing — see sources/bucketed.py for the real layout) are
    ranked by read amplification = log records per resolved base
    row. Buckets where the log has outgrown the base (ratio >= 1)
    are flagged for rewrite — the exact scheduling input Hudi's
    compactor and Iceberg's rewrite_data_files act on; delete-marker
    counts ride along because a delete-heavy log shrinks the rewrite
    output. Pure hash aggregation: one shuffle for the per-key base
    resolution (shared shape with q_cdc_merge_on_read), one map-side
    combinable rollup to 32 rows."""
    r = _records(spark, sf_dir)
    base_rows = (
        r.filter(F.col("ts_us") <= F.col("_cut_us"))
        .withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .groupBy((F.col("user_id") % _N_BUCKETS).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("base_rows"))
    )
    log_rows = (
        r.filter(F.col("ts_us") > F.col("_cut_us"))
        .groupBy((F.col("user_id") % _N_BUCKETS).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("log_rows"),
            F.sum((F.col("op") == "D").cast("long")).alias("delete_rows"),
        )
    )
    j = base_rows.join(log_rows, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("base_rows", F.lit(0)).alias("base_rows"),
        F.coalesce("log_rows", F.lit(0)).alias("log_rows"),
        F.coalesce("delete_rows", F.lit(0)).alias("delete_rows"),
    )
    amp = F.round(
        F.col("log_rows").cast("double")
        / F.greatest(F.col("base_rows"), F.lit(1)).cast("double"),
        6,
    )
    return j.select(
        "bucket",
        "base_rows",
        "log_rows",
        "delete_rows",
        amp.alias("amplification"),
        (F.col("log_rows") >= F.col("base_rows")).alias("needs_compaction"),
    ).orderBy("bucket")


SQL_COMPACTION_PLAN = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * {_CUT_NUM} // {_DEN} AS cut_us
  FROM r
),
base AS (
  SELECT user_id % {_N_BUCKETS} AS bucket, count(*) AS base_rows FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM r, span WHERE ts_us <= cut_us
  ) WHERE rn = 1 AND op = 'U' GROUP BY 1
),
log AS (
  SELECT user_id % {_N_BUCKETS} AS bucket,
         count(*) AS log_rows,
         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
           AS delete_rows
  FROM r, span WHERE ts_us > cut_us GROUP BY 1
)
SELECT bucket,
       CAST(coalesce(base_rows, 0) AS BIGINT) AS base_rows,
       CAST(coalesce(log_rows, 0) AS BIGINT) AS log_rows,
       CAST(coalesce(delete_rows, 0) AS BIGINT) AS delete_rows,
       round(CAST(coalesce(log_rows, 0) AS DOUBLE)
             / CAST(greatest(coalesce(base_rows, 0), 1) AS DOUBLE), 6)
         AS amplification,
       coalesce(log_rows, 0) >= coalesce(base_rows, 0) AS needs_compaction
FROM base FULL OUTER JOIN log USING (bucket)
ORDER BY bucket"""


QUERIES27: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_merge_on_read": q_cdc_merge_on_read,
    "cdc_changes_between": q_cdc_changes_between,
    "compaction_plan": q_compaction_plan,
}

ORACLES27: dict[str, str] = {
    "cdc_merge_on_read": SQL_CDC_MERGE_ON_READ,
    "cdc_changes_between": SQL_CDC_CHANGES_BETWEEN,
    "compaction_plan": SQL_COMPACTION_PLAN,
}


# --------------------------------------------------------------------------
# forget_user_sweep — right-to-be-forgotten delete propagation
# --------------------------------------------------------------------------

_FORGET_MOD = 97  # deterministic erasure cohort: custkey % 97 == 0


def q_forget_user_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep — the governance companion of the
    CDC surface: given an erasure cohort (customers with
    c_custkey % 97 == 0, standing in for a deletion-request list),
    measure the blast radius across the table graph BEFORE rewriting
    anything: customer rows directly, orders via o_custkey, lineitem
    via the cascaded order keys, events via user_id (an independent
    id space sharing the cohort rule — the cross-system case where
    the same subject key appears in another service's log). Emits
    per-table rows_to_delete / rows_total / pct — what a compliance
    job reports and what a compactor (see q_compaction_plan) turns
    into delete files.

    Scale: the cohort is a FILTER on each fact's own key column
    (custkey/user_id % 97) — no join at all for customer/orders/
    events; only lineitem needs the cascade, a semi join against the
    already-filtered orders keys (broadcast at these sizes, shuffle
    hash at 100 TB — either way one join on the fact). Counts are
    map-side-combinable aggs; output is 4 rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    doomed_orders = orders.filter(F.col("o_custkey") % _FORGET_MOD == 0)

    def _counts(df: DataFrame, hit, table: str) -> DataFrame:
        return df.agg(
            F.lit(table).alias("table_name"),
            F.sum(hit.cast("long")).alias("rows_to_delete"),
            F.count(F.lit(1)).alias("rows_total"),
            F.round(
                F.sum(hit.cast("long")) * 100.0 / F.count(F.lit(1)), 6
            ).alias("pct"),
        )

    li_hit = li.join(
        F.broadcast(doomed_orders.select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
        "left",
    ).select((F.col("o_orderkey").isNotNull()).alias("hit"))
    out = (
        _counts(cust, F.col("c_custkey") % _FORGET_MOD == 0, "customer")
        .unionByName(_counts(orders, F.col("o_custkey") % _FORGET_MOD == 0, "orders"))
        .unionByName(_counts(li_hit, F.col("hit"), "lineitem"))
        .unionByName(_counts(ev, F.col("user_id") % _FORGET_MOD == 0, "events"))
    )
    return out.orderBy("table_name")


SQL_FORGET_USER_SWEEP = f"""
WITH li_hit AS (
  SELECT (o.o_orderkey IS NOT NULL) AS hit
  FROM lineitem LEFT JOIN (
    SELECT o_orderkey FROM orders WHERE o_custkey % {_FORGET_MOD} = 0
  ) o ON lineitem.l_orderkey = o.o_orderkey
), u AS (
  SELECT 'customer' AS table_name,
         CAST(sum(CASE WHEN c_custkey % {_FORGET_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS rows_to_delete,
         count(*) AS rows_total
  FROM customer
  UNION ALL
  SELECT 'orders',
         CAST(sum(CASE WHEN o_custkey % {_FORGET_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
         count(*)
  FROM orders
  UNION ALL
  SELECT 'lineitem',
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT), count(*)
  FROM li_hit
  UNION ALL
  SELECT 'events',
         CAST(sum(CASE WHEN user_id % {_FORGET_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
         count(*)
  FROM events
)
SELECT table_name, rows_to_delete, rows_total,
       round(rows_to_delete * 100.0 / rows_total, 6) AS pct
FROM u ORDER BY table_name"""

QUERIES27["forget_user_sweep"] = q_forget_user_sweep
ORACLES27["forget_user_sweep"] = SQL_FORGET_USER_SWEEP


# --------------------------------------------------------------------------
# kanon_audit — k-anonymity / quasi-identifier re-identification audit
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) — the third leg of the
    governance surface next to the PII scan and the forget sweep:
    treat (event_type, day, coarse value bucket) as the
    quasi-identifier an adversary could link on, group rows by it,
    and roll the group-size distribution up into the standard risk
    classes (k=1 unique rows are directly re-identifiable; k in
    [2,5) is the usual policy red line). Each class also carries the
    subject-diversity facts an l-diversity check needs: total and
    minimum distinct user_ids per QI group in the class.

    Exactness: buckets are integer floors of centi-quantized values;
    all outputs are counts/mins of exact integers.

    Scale: two hash aggregations (QI group sizes + distinct users,
    then the class rollup) — both map-side combinable; the QI
    cardinality, not the row count, bounds the second stage. The
    distinct-user count shuffles (QI, user) pairs once."""
    ev = load_table(spark, sf_dir, "events")
    # integer DIV on both sides (DuckDB // and Spark DIV both
    # truncate toward zero — verified; the float-div-then-cast form
    # would also work here but DIV is the pinned convention)
    qi = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"),
        F.expr("CAST(round(value * 100) AS LONG) DIV 1000").alias("vbucket"),
        "user_id",
    )
    groups = qi.groupBy("event_type", "day", "vbucket").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("user_id").alias("n_users"),
    )
    size_class = (
        F.when(F.col("k") == 1, F.lit("k=1"))
        .when(F.col("k") < 5, F.lit("2<=k<5"))
        .when(F.col("k") < 10, F.lit("5<=k<10"))
        .otherwise(F.lit("k>=10"))
    )
    return (
        groups.groupBy(size_class.alias("size_class"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("n_users").alias("sum_users"),
            F.min("n_users").alias("min_users"),
        )
        .orderBy("size_class")
    )


SQL_KANON_AUDIT = f"""
WITH qi AS (
  SELECT event_type,
         epoch_us(ts) // {_DAY_US} AS day,
         CAST(round(value * 100) AS BIGINT) // 1000 AS vbucket,
         user_id
  FROM events
),
g AS (
  SELECT event_type, day, vbucket,
         count(*) AS k,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM qi GROUP BY 1, 2, 3
)
SELECT CASE WHEN k = 1 THEN 'k=1'
            WHEN k < 5 THEN '2<=k<5'
            WHEN k < 10 THEN '5<=k<10'
            ELSE 'k>=10' END AS size_class,
       count(*) AS n_groups,
       CAST(sum(k) AS BIGINT) AS n_rows,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(n_users) AS BIGINT) AS sum_users,
       min(n_users) AS min_users
FROM g GROUP BY 1 ORDER BY 1"""

QUERIES27["kanon_audit"] = q_kanon_audit
ORACLES27["kanon_audit"] = SQL_KANON_AUDIT
