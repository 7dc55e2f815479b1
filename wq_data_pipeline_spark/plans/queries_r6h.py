"""Catalog batch 17 (round 6, seventh wave): retail-analytics and
SQL-surface breadth —

* market_basket     — frequent part pairs with support and lift
                      (association-rule mining, the bounded
                      within-order self-join shape)
* rfm_segments      — RFM customer segmentation via NTILE(5) scores
* window_funcs_suite— the rank-family window surface (row_number,
                      ntile, percent_rank, cume_dist, lead, lag,
                      first_value) in ONE window pass
* user_set_ops      — INTERSECT / EXCEPT set algebra on user sets

Determinism: supports are integer floor-divs, lift is one double
division of exact integers, rank-family outputs are rank arithmetic
((rank-1)/(n-1)) on fully tie-broken orderings, and money is
cents-quantized before BIGINT sums.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# market_basket — pair support + lift
# --------------------------------------------------------------------------

def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: part pairs co-occurring
    in >= 3 orders, with support (floor-div micro) and lift
    ((N * c_ab) / (c_a * c_b), one exact-integer division).

    Plan shape at scale: the self-join is keyed on l_orderkey and
    bounded by basket size (max 13 lines here; the hot-bucket guard
    family applies if a degenerate order had thousands) — pair
    fan-out is sum(k^2) over baskets, never corpus^2. Item counts
    ride a second hash agg of the SAME deduped basket relation; the
    per-item table broadcasts into the pair table twice.

    Basket dedup first: a part appearing on two lineitems of one
    order must count once (DISTINCT before the self-join, not
    after)."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    items = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c_item")
    )
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = items.select(F.col("l_partkey").alias("pa"), F.col("c_item").alias("c_a"))
    ib = items.select(F.col("l_partkey").alias("pb"), F.col("c_item").alias("c_b"))
    return (
        pairs.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .join(F.broadcast(n_orders))
        .select(
            "pa", "pb", "c_ab", "c_a", "c_b",
            F.expr("(1000000 * c_ab) DIV n_orders").alias("support_micro"),
            (
                (F.col("n_orders") * F.col("c_ab")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
    )


SQL_MARKET_BASKET = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
items AS (SELECT l_partkey, count(*) AS c_item FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT pa, pb, c_ab, ia.c_item AS c_a, ib.c_item AS c_b,
       (1000000 * c_ab) // n_orders AS support_micro,
       CAST(n_orders * c_ab AS DOUBLE)
       / CAST(ia.c_item * ib.c_item AS DOUBLE) AS lift
FROM pairs
JOIN items ia ON pa = ia.l_partkey
JOIN items ib ON pb = ib.l_partkey
CROSS JOIN n"""


# --------------------------------------------------------------------------
# rfm_segments — NTILE(5) RFM segmentation
# --------------------------------------------------------------------------

def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days from last order
    to the corpus max date), frequency (order count), monetary
    (cents). Each scored 1-5 by NTILE over a FULLY tie-broken order
    (metric, custkey) — both engines implement standard SQL NTILE
    (first n%k tiles one row larger), so scores match exactly. The
    output is the segment-level rollup (<=125 rows), not the
    per-customer table.

    Scale note: NTILE over all customers is a global sort; at 100 TB
    the same scores come from a rank join against percentile
    boundaries (value_percentiles' shape) — documented trade at this
    row count."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .join(F.broadcast(ref))
        .withColumn(
            "recency_days",
            F.datediff("ref_date", "last_order").cast("long"),
        )
    )
    scored = per_cust.select(
        "o_custkey",
        # low recency = best -> score 5; ntile ascending then invert
        (6 - F.ntile(5).over(
            Window.orderBy("recency_days", "o_custkey")
        )).cast("long").alias("r"),
        F.ntile(5).over(
            Window.orderBy("frequency", "o_custkey")
        ).cast("long").alias("f"),
        F.ntile(5).over(
            Window.orderBy("monetary_cents", "o_custkey")
        ).cast("long").alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn(
            "segment",
            F.concat(F.col("r"), F.lit("-"), F.col("f"), F.lit("-"), F.col("m")),
        )
    )


SQL_RFM_SEGMENTS = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ref AS (SELECT max(o_orderdate) AS ref_date FROM o),
pc AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM o GROUP BY 1
),
sc AS (
  SELECT o_custkey,
         CAST(6 - ntile(5) OVER (ORDER BY
           date_diff('day', last_order, ref_date), o_custkey) AS BIGINT) AS r,
         CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f,
         CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS BIGINT) AS m
  FROM pc CROSS JOIN ref
)
SELECT r, f, m, count(*) AS n_customers,
       r || '-' || f || '-' || m AS segment
FROM sc GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------------
# window_funcs_suite — the rank-family surface in one pass
# --------------------------------------------------------------------------

def q_window_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window surface over URGENT orders, every
    function sharing ONE (partition, order) spec so Catalyst plans a
    single Window node (one sort, no extra exchanges) —
    test_single_window_exec_for_shared_sort's discipline applied to
    the full rank family.

    percent_rank/cume_dist are rank arithmetic over a fully
    tie-broken order — exact-integer divisions, deterministic."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return orders.select(
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("cents", 1).over(w).alias("prev_cents"),
        F.lead("cents", 1).over(w).alias("next_cents"),
        F.first("cents").over(w).alias("first_cents"),
    )


SQL_WINDOW_FUNCS_SUITE = """
SELECT o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       lag(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER w AS prev_cents,
       lead(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER w AS next_cents,
       first_value(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_cents
FROM orders
WHERE o_orderpriority = '1-URGENT'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)"""


# --------------------------------------------------------------------------
# user_set_ops — INTERSECT / EXCEPT algebra
# --------------------------------------------------------------------------

def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on behavior cohorts: the INTERSECT / EXCEPT
    surface (DISTINCT semantics) over clicker and purchaser user
    sets, plus the union size — four labeled counts.

    Plan shape: the two distinct user sets build once each (hash
    aggs); intersect/except plan as keyed semi/anti joins, never
    materializing products."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()

    def count1(df, label):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("cohort"), "n_users"
        )

    out = count1(clickers.intersect(buyers), "click_and_purchase")
    out = out.unionAll(count1(clickers.exceptAll(buyers), "click_no_purchase"))
    out = out.unionAll(count1(buyers.exceptAll(clickers), "purchase_no_click"))
    out = out.unionAll(count1(clickers.union(buyers).distinct(), "either"))
    return out


SQL_USER_SET_OPS = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'click_and_purchase' AS cohort,
       (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS n_users
UNION ALL
SELECT 'click_no_purchase',
       (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
UNION ALL
SELECT 'purchase_no_click',
       (SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM c))
UNION ALL
SELECT 'either',
       (SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p))"""


QUERIES17: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "market_basket": q_market_basket,
    "rfm_segments": q_rfm_segments,
    "window_funcs_suite": q_window_funcs_suite,
    "user_set_ops": q_user_set_ops,
}

ORACLES17: dict[str, str] = {
    "market_basket": SQL_MARKET_BASKET,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "window_funcs_suite": SQL_WINDOW_FUNCS_SUITE,
    "user_set_ops": SQL_USER_SET_OPS,
}


# --------------------------------------------------------------------------
# attribution_last_touch — as-of attribution of purchases to clicks
# --------------------------------------------------------------------------

def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase is attributed to the
    user's most recent click AT OR BEFORE it (the as-of backward
    join, operators/asof.py — one shuffle on user_id + one sorted
    window over the unioned stream, no range explosion), then rolled
    up by time-to-convert bucket.

    Buckets are integer-microsecond threshold compares (<=1h, <=6h,
    <=24h, >24h, none) — no float time arithmetic anywhere."""
    from wq_data_pipeline_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = asof_join_backward(
        purchases, clicks, on=["user_id"], right_value_cols=(),
    )
    hour_us = 3_600_000_000
    delta = F.unix_micros("ts") - F.unix_micros("matched_ts")
    bucket = (
        F.when(F.col("matched_ts").isNull(), "none")
        .when(delta <= hour_us, "<=1h")
        .when(delta <= 6 * hour_us, "<=6h")
        .when(delta <= 24 * hour_us, "<=24h")
        .otherwise(">24h")
    )
    return (
        j.groupBy(bucket.alias("convert_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


SQL_ATTRIBUTION_LAST_TOUCH = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.ts, c.ts AS matched_ts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT CASE
         WHEN matched_ts IS NULL THEN 'none'
         WHEN epoch_us(ts) - epoch_us(matched_ts) <= 3600000000 THEN '<=1h'
         WHEN epoch_us(ts) - epoch_us(matched_ts) <= 21600000000 THEN '<=6h'
         WHEN epoch_us(ts) - epoch_us(matched_ts) <= 86400000000 THEN '<=24h'
         ELSE '>24h' END AS convert_bucket,
       count(*) AS n_purchases,
       count(DISTINCT user_id) AS n_users
FROM j GROUP BY 1"""


QUERIES17["attribution_last_touch"] = q_attribution_last_touch
ORACLES17["attribution_last_touch"] = SQL_ATTRIBUTION_LAST_TOUCH


# --------------------------------------------------------------------------
# khop_reach — bounded BFS from the max-degree seed
# --------------------------------------------------------------------------

def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS reachability over the hourly co-occurrence graph
    from a deterministic seed (the max-degree user, min user_id on
    ties): how many users are FIRST reached at each hop.

    The iterative-traversal pattern at scale: per round, the
    frontier joins the pinned edge set (keyed join), new nodes are
    anti-joined against the reached set, and the reached set is
    localCheckpoint'ed so plans stay flat across rounds — the same
    discipline as dedup_clusters' label propagation. Rounds are
    bounded (3), so construction cost is fixed.

    Oracle: a DuckDB RECURSIVE CTE replays the identical BFS with
    min-distance semantics."""
    from wq_data_pipeline_spark.plans.queries_r6f import cooccurrence_edges

    edges = cooccurrence_edges(spark, sf_dir)
    undir = edges.unionAll(
        edges.select(F.col("ub").alias("ua"), F.col("ua").alias("ub"))
    ).localCheckpoint()
    deg = undir.groupBy("ua").agg(F.count(F.lit(1)).alias("degree"))
    mx = deg.agg(F.max("degree").alias("mxd"))
    seed = (
        deg.join(F.broadcast(mx))
        .filter(F.col("degree") == F.col("mxd"))
        .agg(F.min("ua").alias("user_id"))
        .select("user_id", F.lit(0).cast("long").alias("dist"))
    )
    reached = seed.localCheckpoint()
    for hop in range(1, 4):
        frontier = reached.filter(F.col("dist") == hop - 1).select(
            F.col("user_id").alias("ua")
        )
        new = (
            frontier.join(undir, "ua")
            .select(F.col("ub").alias("user_id"))
            .distinct()
            .join(reached.select("user_id"), "user_id", "left_anti")
            .select("user_id", F.lit(hop).cast("long").alias("dist"))
        )
        reached = reached.unionAll(new).localCheckpoint()
    return reached.groupBy(F.col("dist").alias("hop")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


SQL_KHOP_REACH = """
WITH RECURSIVE bu AS (
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
undir AS (
  SELECT ua, ub FROM edges UNION ALL SELECT ub, ua FROM edges
),
deg AS (SELECT ua, count(*) AS degree FROM undir GROUP BY 1),
seed AS (
  SELECT min(ua) AS user_id FROM deg
  WHERE degree = (SELECT max(degree) FROM deg)
),
reach(user_id, d) AS (
  SELECT user_id, 0 FROM seed
  UNION
  SELECT u.ub, reach.d + 1
  FROM reach JOIN undir u ON u.ua = reach.user_id
  WHERE reach.d < 3
)
SELECT CAST(d AS BIGINT) AS hop, count(*) AS n_users
FROM (SELECT user_id, min(d) AS d FROM reach GROUP BY 1)
GROUP BY 1"""


QUERIES17["khop_reach"] = q_khop_reach
ORACLES17["khop_reach"] = SQL_KHOP_REACH
