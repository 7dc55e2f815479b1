"""Catalog batch 16 (round 6, sixth wave): data-quality / governance
surface —

* dq_checks          — Deequ-style declarative constraint suite over
                       four tables (one agg per table)
* fk_orphans         — referential-integrity audit of the six star-
                       schema foreign keys (anti-join counts)
* sql_surface_q3     — the raw spark.sql() surface: TPC-H Q3 run as
                       SQL TEXT over registered views (the engine's
                       second query language, same ANSI text on both
                       sides)
* control_chart_days — Shewhart 3-sigma control chart on daily event
                       counts (exact integer cross-multiplied bound)

Determinism: counts and booleans everywhere; the control chart's
3-sigma test is the integer inequality n*dev_i^2 > 9*sum(dev^2) with
dev_i = n*x_i - S (no float mean, no sqrt).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.operators import dq
from wq_data_pipeline_spark.sources.testdata import load_table

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------------
# dq_checks — declarative constraint suite
# --------------------------------------------------------------------------

def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over events / documents / orders / lineitem:
    completeness, ranges, set membership, key uniqueness. Each
    table's row-level checks compile to ONE conditional-sum agg over
    one scan (Deequ's analyzer batching); uniqueness adds one keyed
    agg. Unions of tiny per-table results are driver-free."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        dq.run_suite(
            ev,
            "events",
            [
                dq.not_null("event_id"),
                dq.not_null("ts"),
                dq.not_null("user_id"),
                dq.in_set(
                    "event_type",
                    ("view", "click", "purchase", "signup", "error"),
                ),
                dq.in_range("value", 0.0, 1e6),
            ],
        ),
        dq.uniqueness(ev, "events", ["event_id"]),
        dq.run_suite(
            docs,
            "documents",
            [
                dq.not_null("doc_id"),
                dq.not_null("text"),
                dq.non_negative("n_chars"),
            ],
        ),
        dq.uniqueness(docs, "documents", ["doc_id"]),
        dq.run_suite(
            orders,
            "orders",
            [
                dq.not_null("o_orderkey"),
                dq.in_set("o_orderstatus", ("O", "F", "P")),
                dq.non_negative("o_totalprice"),
                dq.in_set(
                    "o_orderpriority",
                    (
                        "1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW",
                    ),
                ),
            ],
        ),
        dq.uniqueness(orders, "orders", ["o_orderkey"]),
        dq.run_suite(
            li,
            "lineitem",
            [
                dq.not_null("l_orderkey"),
                dq.in_range("l_quantity", 1.0, 50.0),
                dq.in_range("l_discount", 0.0, 1.0),
                dq.non_negative("l_extendedprice"),
            ],
        ),
        dq.uniqueness(li, "lineitem", ["l_orderkey", "l_linenumber"]),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


SQL_DQ_CHECKS = """
WITH ev AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
              ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         CAST(sum(CASE WHEN value IS NOT NULL AND value NOT BETWEEN 0.0 AND 1e6
              THEN 1 ELSE 0 END) AS BIGINT) AS v4
  FROM events
),
docs AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM documents
),
ord AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN
              ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority NOT IN
              ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
              THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM orders
),
lin AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1.0 AND 50.0
              THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN l_discount IS NOT NULL AND l_discount NOT BETWEEN 0.0 AND 1.0
              THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN l_extendedprice IS NOT NULL AND l_extendedprice < 0
              THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM lineitem
),
uev AS (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) AS d FROM
        (SELECT count(*) AS k FROM events GROUP BY event_id HAVING count(*) > 1)),
udoc AS (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) AS d FROM
        (SELECT count(*) AS k FROM documents GROUP BY doc_id HAVING count(*) > 1)),
uord AS (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) AS d FROM
        (SELECT count(*) AS k FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
ulin AS (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) AS d FROM
        (SELECT count(*) AS k FROM lineitem GROUP BY l_orderkey, l_linenumber
         HAVING count(*) > 1))
SELECT 'events' AS table_name, 'not_null(event_id)' AS check_name,
       n AS n_rows, v0 AS n_violations, v0 = 0 AS passed FROM ev
UNION ALL SELECT 'events', 'not_null(ts)', n, v1, v1 = 0 FROM ev
UNION ALL SELECT 'events', 'not_null(user_id)', n, v2, v2 = 0 FROM ev
UNION ALL SELECT 'events', 'in_set(event_type)', n, v3, v3 = 0 FROM ev
UNION ALL SELECT 'events', 'range(value)', n, v4, v4 = 0 FROM ev
UNION ALL SELECT 'events', 'unique(event_id)', n, d, d = 0 FROM ev, uev
UNION ALL SELECT 'documents', 'not_null(doc_id)', n, v0, v0 = 0 FROM docs
UNION ALL SELECT 'documents', 'not_null(text)', n, v1, v1 = 0 FROM docs
UNION ALL SELECT 'documents', 'non_negative(n_chars)', n, v2, v2 = 0 FROM docs
UNION ALL SELECT 'documents', 'unique(doc_id)', n, d, d = 0 FROM docs, udoc
UNION ALL SELECT 'orders', 'not_null(o_orderkey)', n, v0, v0 = 0 FROM ord
UNION ALL SELECT 'orders', 'in_set(o_orderstatus)', n, v1, v1 = 0 FROM ord
UNION ALL SELECT 'orders', 'non_negative(o_totalprice)', n, v2, v2 = 0 FROM ord
UNION ALL SELECT 'orders', 'in_set(o_orderpriority)', n, v3, v3 = 0 FROM ord
UNION ALL SELECT 'orders', 'unique(o_orderkey)', n, d, d = 0 FROM ord, uord
UNION ALL SELECT 'lineitem', 'not_null(l_orderkey)', n, v0, v0 = 0 FROM lin
UNION ALL SELECT 'lineitem', 'range(l_quantity)', n, v1, v1 = 0 FROM lin
UNION ALL SELECT 'lineitem', 'range(l_discount)', n, v2, v2 = 0 FROM lin
UNION ALL SELECT 'lineitem', 'non_negative(l_extendedprice)', n, v3, v3 = 0 FROM lin
UNION ALL SELECT 'lineitem', 'unique(l_orderkey,l_linenumber)', n, d, d = 0 FROM lin, ulin"""


# --------------------------------------------------------------------------
# fk_orphans — referential-integrity audit
# --------------------------------------------------------------------------

def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts for the six star-schema foreign keys, each an
    anti-join of child against parent keys. Parents are broadcast
    when dimension-sized; the lineitem->orders relation shuffles on
    the key (at 100 TB that parent is also huge — exactly the case
    where you want the plain keyed anti-join, not a broadcast).

    Output: one row per relation with child row count and orphan
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def rel(name, child, ckey, parent, pkey, bcast):
        p = parent.select(pkey).distinct()
        if bcast:
            p = F.broadcast(p)
        orphans = child.select(ckey).join(
            p, F.col(ckey) == F.col(pkey), "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .join(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )

    parts = [
        rel("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey", False),
        rel("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey", True),
        rel("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey", True),
        rel("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey", True),
        rel("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey", True),
        rel("nation.n_regionkey->region", nation, "n_regionkey", region, "r_regionkey", True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


SQL_FK_ORPHANS = """
SELECT 'lineitem.l_orderkey->orders' AS relation,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
          (SELECT o_orderkey FROM orders)) AS n_orphans,
       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
          (SELECT o_orderkey FROM orders)) = 0 AS intact
UNION ALL
SELECT 'lineitem.l_partkey->part', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
          (SELECT p_partkey FROM part)),
       (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
          (SELECT p_partkey FROM part)) = 0
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier)),
       (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier)) = 0
UNION ALL
SELECT 'orders.o_custkey->customer', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer)),
       (SELECT count(*) FROM orders WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer)) = 0
UNION ALL
SELECT 'customer.c_nationkey->nation', (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
          (SELECT n_nationkey FROM nation)),
       (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
          (SELECT n_nationkey FROM nation)) = 0
UNION ALL
SELECT 'nation.n_regionkey->region', (SELECT count(*) FROM nation),
       (SELECT count(*) FROM nation WHERE n_regionkey NOT IN
          (SELECT r_regionkey FROM region)),
       (SELECT count(*) FROM nation WHERE n_regionkey NOT IN
          (SELECT r_regionkey FROM region)) = 0"""


# --------------------------------------------------------------------------
# sql_surface_q3 — the raw SQL query language
# --------------------------------------------------------------------------

_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 20"""


def q_sql_surface_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SECOND query language: the same ANSI text runs
    through spark.sql() here and through DuckDB as the oracle —
    zero dialect translation. Views are registered per-call
    (createOrReplaceTempView is metadata-only); Catalyst plans the
    text identically to the DataFrame form of Q3 (same pushdowns,
    same broadcasts under AQE).

    The deliberate point: a user of the reference can keep their SQL
    instead of learning the DataFrame API."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3_SQL)


# --------------------------------------------------------------------------
# control_chart_days — Shewhart 3-sigma on daily counts
# --------------------------------------------------------------------------

def q_control_chart_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control chart on daily event counts per type: a day
    is out-of-control when its count deviates from the series mean
    by more than 3 sigma. With dev_i = n*x_i - S (exact BIGINT), the
    3-sigma test is the integer cross-multiplication
        n * dev_i^2 > 9 * sum_j dev_j^2
    — no float mean, no sqrt, bit-deterministic.

    Plan shape: daily-count agg (one shuffle), 5-row per-type
    moments broadcast back onto the 150-row daily table."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
    )
    j = daily.join(F.broadcast(stats), "event_type").withColumn(
        "dev", F.col("n") * F.col("x") - F.col("s")
    )
    ss = j.groupBy("event_type").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("ssd")
    )
    return (
        j.join(F.broadcast(ss), "event_type")
        .select(
            "event_type",
            "day",
            "x",
            F.expr("s DIV n").alias("mean_floor"),
            (
                F.col("n") * F.col("dev") * F.col("dev")
                > 9 * F.col("ssd")
            ).alias("out_of_control"),
        )
    )


SQL_CONTROL_CHART_DAYS = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
  FROM daily GROUP BY 1
),
d AS (
  SELECT daily.*, n, s, n * x - s AS dev
  FROM daily JOIN st USING (event_type)
),
ss AS (
  SELECT event_type, CAST(sum(dev * dev) AS BIGINT) AS ssd
  FROM d GROUP BY 1
)
SELECT d.event_type, day, x, s // n AS mean_floor,
       n * dev * dev > 9 * ssd AS out_of_control
FROM d JOIN ss USING (event_type)"""


QUERIES16: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_checks": q_dq_checks,
    "fk_orphans": q_fk_orphans,
    "sql_surface_q3": q_sql_surface_q3,
    "control_chart_days": q_control_chart_days,
}

ORACLES16: dict[str, str] = {
    "dq_checks": SQL_DQ_CHECKS,
    "fk_orphans": SQL_FK_ORPHANS,
    "sql_surface_q3": _Q3_SQL,
    "control_chart_days": SQL_CONTROL_CHART_DAYS,
}
