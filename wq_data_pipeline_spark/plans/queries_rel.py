"""Catalog batch 5: relational breadth — distinct aggregates,
anti/semi joins, grouping-set rollup, union, having. The reference has
none of these (SURVEY §2.3 note: 'our engine gets them free from
Spark'); they round out the engine's general-purpose query surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_distinct + grouped distinct aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no high-value (>250k) order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 250_000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_ANTI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: suppliers that shipped any high-quantity item."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


SQL_SEMI = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 45)"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over the region/nation hierarchy."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.rollup("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_ROLLUP = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)"""


def q_union_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two filtered projections + HAVING-style post-agg filter."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 200_000).select(
        "o_custkey", F.lit("high").alias("bucket")
    )
    lo = orders.filter(F.col("o_totalprice") < 50_000).select(
        "o_custkey", F.lit("low").alias("bucket")
    )
    u = hi.unionByName(lo)
    return (
        u.groupBy("o_custkey", "bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


SQL_UNION_HAVING = """
WITH u AS (
  SELECT o_custkey, 'high' AS bucket FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_totalprice < 50000
)
SELECT o_custkey, bucket, count(*) AS n_orders
FROM u GROUP BY o_custkey, bucket HAVING count(*) >= 2"""


def q_corr_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average order value (correlated
    scalar subquery; expressed as a window in Spark)."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    d = orders.withColumn("_avg", F.avg("o_totalprice").over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(w)
    )
    return (
        d.filter((F.col("_n") >= 3) & (F.col("o_totalprice") > F.col("_avg") * 1.5))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_CORR = """
WITH s AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS a,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM s WHERE n >= 3 AND o_totalprice > a * 1.5"""


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over events — the pre-flight a pipeline
    runs before touching a new 100-TB table: row/null counts, ranges,
    exact distinct cardinalities. One scan, one agg row (at scale the
    distinct counts would switch to approx_count_distinct; the exact
    forms stay oracle-comparable)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_value_nonnull"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_value_null"),
        F.unix_micros(F.min("ts")).alias("ts_min_us"),
        F.unix_micros(F.max("ts")).alias("ts_max_us"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type").alias("n_event_types"),
    )


SQL_PROFILE = """
SELECT count(*) AS n_rows,
       count(value) AS n_value_nonnull,
       count(*) - count(value) AS n_value_null,
       epoch_us(min(ts)) AS ts_min_us, epoch_us(max(ts)) AS ts_max_us,
       min(value) AS value_min, max(value) AS value_max,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_event_types
FROM events"""


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profiling — the 100-TB path where exact distincts
    and exact percentiles are unaffordable: HLL++ distinct-user
    estimates (rsd 2%) and approximate value quantiles per
    event_type, one scan, constant memory per group. Rows-only by
    design: sketch estimates are engine-specific (DuckDB's HLL is a
    different implementation), so there is no cross-engine oracle —
    the error bounds vs the exact profile are pinned in
    tests/test_scale.py::test_sketch_profile_error_bounds instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
        F.percentile_approx("value", 0.95, 10_000).alias("approx_p95"),
    )


def q_sketch_profile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion to ``sketch_profile``: the EXACT columns of the same
    one-scan per-event_type profile (row/null counts, value and ts
    ranges) — everything the sketches sit next to, DuckDB-oracled.
    Splitting these out leaves only the genuinely engine-specific
    sketch estimates (HLL++ distincts, approx percentiles) rows-only
    (VERDICT r5 #8). Same scale shape: one hash agg, map-side
    combinable, constant memory per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_value_nonnull"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_value_null"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.unix_micros(F.min("ts")).alias("ts_min_us"),
        F.unix_micros(F.max("ts")).alias("ts_max_us"),
    )


SQL_SKETCH_EXACT = """
SELECT event_type,
       count(*) AS n_rows,
       count(value) AS n_value_nonnull,
       count(*) - count(value) AS n_value_null,
       min(value) AS value_min, max(value) AS value_max,
       epoch_us(min(ts)) AS ts_min_us, epoch_us(max(ts)) AS ts_max_us
FROM events GROUP BY event_type"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: top-10 user_ids by event count with their
    corpus share — the check that decides whether a join key needs
    salting BEFORE the shuffle melts an executor. TakeOrdered top-k,
    no single-partition rank window; the corpus total rides in as a
    broadcast 1-row agg (zero plan-time driver jobs — the lazy-scalar
    pattern, SURVEY §7.0)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = counts.agg(F.sum("n_events").cast("double").alias("_tot"))
    top = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") / F.col("_tot"), 6).alias("share"),
            "rank",
        )
    )


SQL_HEAVY = """
WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT user_id, n_events,
       round(n_events / (SELECT CAST(count(*) AS DOUBLE) FROM events), 6) AS share,
       rank
FROM (
  SELECT *, row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rank FROM c
) WHERE rank <= 10"""


QUERIES5: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_distinct_agg": q_distinct_agg,
    "rel_anti_join": q_anti_join,
    "rel_semi_join": q_semi_join,
    "rel_rollup": q_rollup_revenue,
    "rel_union_having": q_union_having,
    "rel_corr_subquery": q_corr_scalar_subquery,
    "table_profile": q_table_profile,
    "heavy_hitters": q_heavy_hitters,
    "sketch_profile": q_sketch_profile,
    "sketch_profile_exact": q_sketch_profile_exact,
}

ORACLES5: dict[str, str] = {
    "rel_distinct_agg": SQL_DISTINCT,
    "rel_anti_join": SQL_ANTI,
    "rel_semi_join": SQL_SEMI,
    "rel_rollup": SQL_ROLLUP,
    "rel_union_having": SQL_UNION_HAVING,
    "rel_corr_subquery": SQL_CORR,
    "table_profile": SQL_PROFILE,
    "heavy_hitters": SQL_HEAVY,
    "sketch_profile_exact": SQL_SKETCH_EXACT,
}
