"""Catalog batch 14 (round 6, fourth wave): TPC-H completion — the
ten query shapes whose canonical columns (partsupp, l_commitdate /
l_receiptdate, l_shipmode, p_container) do not exist in the driver's
star schema, re-expressed with the SAME plan shapes on available
columns:

* Q2  — min-cost supplier per part (correlated-min over a derived
        part-supplier cost relation)
* Q4  — EXISTS semi-join order-priority count (lateness proxy:
        shipdate vs orderdate)
* Q9  — product-type profit by nation x year (cost proxy:
        0.1 x p_retailprice per unit)
* Q11 — important-value parts (HAVING over a fraction of a scalar
        grand total)
* Q12 — lateness-bucket x priority-class line counts
* Q15 — top supplier vs a scalar max revenue (view + max shape)
* Q16 — supplier count per (brand, type, size) with NOT-IN supplier
        exclusion
* Q17 — small-quantity lineitems vs 0.2 x per-part average
        (correlated-avg shape)
* Q20 — potential promotion suppliers (semi-join + HAVING threshold)
* Q21 — suppliers who kept multi-supplier orders waiting (sole
        latest shipper; EXISTS / NOT-EXISTS shape)

Together with queries_ext (Q1/Q3/Q5/Q6) and queries_r6c
(Q7/Q8/Q10/Q13/Q14/Q18/Q19/Q22) this completes all 22 TPC-H shapes.

Determinism conventions follow plans/queries.py: money quantized to
integer cents PER ROW (one IEEE product/difference, identical in
both engines) and summed as BIGINT (every DuckDB sum() that reaches
the output is CAST to BIGINT — the HUGEINT trap), quantities are
integer-valued doubles (exact sums, so derived averages/thresholds
are bit-deterministic), years cast to long, every computed column
aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


def _rev_cents() -> F.Column:
    """Per-row revenue in integer cents: one product + one round —
    bit-identical across engines."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")


# --------------------------------------------------------------------------
# TPC-H Q2 — minimum-cost supplier
# --------------------------------------------------------------------------

def q_tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): for STANDARD parts of size 10-20, the
    EUROPE supplier(s) offering the minimum observed unit cost.

    partsupp does not exist, so the part-supplier cost relation is
    DERIVED from lineitem: per (l_partkey, l_suppkey), min unit
    price in integer cents (round(extendedprice/quantity*100) — one
    IEEE divide + product, identical in DuckDB). The correlated-min
    subquery of the original is the per-part window min on the
    already-dimension-filtered relation.

    Plan shape at scale: ONE shuffle builds the derived relation
    (hash agg on the pair key, map-side combinable); part and the
    EUROPE supplier-nation dim are broadcast; the window min runs on
    the post-filter remnant (tiny), not the full relation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        ).cast("long").alias("unit_cost_cents")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(10, 20)
        )
        .select("p_partkey", "p_name")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .withColumn("min_cost", F.min("unit_cost_cents").over(w))
        .filter(F.col("unit_cost_cents") == F.col("min_cost"))
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            "unit_cost_cents",
        )
    )


SQL_TPCH_Q2_MINCOST = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(round(l_extendedprice / l_quantity * 100)) AS BIGINT)
           AS unit_cost_cents
  FROM lineitem GROUP BY 1, 2
),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost_cents,
         min(unit_cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
  FROM ps
  JOIN part ON l_partkey = p_partkey
           AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
  JOIN eur ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost_cents
FROM cand WHERE unit_cost_cents = min_cost"""


# --------------------------------------------------------------------------
# TPC-H Q4 — order priority checking (EXISTS semi-join)
# --------------------------------------------------------------------------

def q_tpch_q4_latesemi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted): per order priority, how many 1997 orders
    had at least one lineitem shipped more than 60 days after the
    order date (the l_commitdate < l_receiptdate lateness predicate
    re-expressed on shipdate vs orderdate).

    Plan shape: a TRUE left-semi join — the lateness predicate lives
    in the join condition, so each order contributes at most once
    regardless of how many late lineitems it has, and Spark never
    materializes the multiplicity. Orderdate-year filter is pushed
    to the orders scan."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, orders.o_orderdate) > 60),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_TPCH_Q4_LATESEMI = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE year(o_orderdate) = 1997
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND date_diff('day', o_orderdate, l_shipdate) > 60)
GROUP BY 1"""


# --------------------------------------------------------------------------
# TPC-H Q9 — product profit by nation x year
# --------------------------------------------------------------------------

def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit on 'widget' parts per supplier
    nation x ship year. ps_supplycost does not exist; the unit-cost
    proxy is 10% of p_retailprice, so
    amount = extendedprice*(1-discount) - 0.1*retailprice*quantity,
    quantized to integer cents per row before the BIGINT sum.

    Plan shape: the name-filtered part dim and supplier/nation dims
    broadcast; the single shuffle is the final (nation, year) hash
    agg with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_shipdate",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(
            (F.sum(amount_cents).cast("double") / 100).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q9_PROFIT = """
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(sum(CAST(round(
         (l_extendedprice * (1 - l_discount)
          - 0.1 * p_retailprice * l_quantity) * 100) AS BIGINT))
         AS DOUBLE) / 100 AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2"""


# --------------------------------------------------------------------------
# TPC-H Q11 — important value parts (HAVING over scalar total)
# --------------------------------------------------------------------------

def q_tpch_q11_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose revenue shipped by EUROPE
    suppliers exceeds 0.1% of the EUROPE grand total. The
    ps_supplycost*ps_availqty inventory value is re-expressed as
    shipped revenue in integer cents; the HAVING-over-scalar shape
    is an integer cross-multiplication (value_cents * 1000 > total)
    so no float division touches the comparison.

    Plan shape: ONE shuffle (per-part hash agg); the grand total is
    a second pass over the tiny per-part agg, broadcast back as a
    1-row literal join — not a driver round-trip."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eur_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(eur_supp), li.l_suppkey == eur_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("_total"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("_total"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "value_cents")
    )


SQL_TPCH_Q11_VALUE = """
WITH eur AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem JOIN eur ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT p_partkey, p_name, value_cents
FROM pv
JOIN part ON l_partkey = p_partkey
WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM pv)"""


# --------------------------------------------------------------------------
# TPC-H Q12 — lateness buckets x priority classes
# --------------------------------------------------------------------------

def q_tpch_q12_latemode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): l_shipmode does not exist, so lines ship
    in LATE / SLOW / FAST buckets by shipdate-minus-orderdate lag
    (>90 / >30 / rest days); per bucket, count critical-priority
    (1-URGENT, 2-HIGH) vs other lines for 1998 shipments — the
    CASE-sum pivot of the original intact.

    Plan shape: one orderkey join (orders projected to two columns),
    one 3-group hash agg; the year filter prunes at the lineitem
    scan."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1998)
        .select("l_orderkey", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(lag > 90, "LATE").when(lag > 30, "SLOW").otherwise("FAST")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


SQL_TPCH_Q12_LATEMODE = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 'LATE'
            WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'SLOW'
            ELSE 'FAST' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = 1998
GROUP BY 1"""


# --------------------------------------------------------------------------
# TPC-H Q15 — top supplier (view + scalar max)
# --------------------------------------------------------------------------

def q_tpch_q15_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue for Q1-1996
    shipments. The revenue view is a per-supplier cents agg; the
    scalar max is a second agg over that tiny view, broadcast back
    (the WHERE total = (SELECT max...) shape).

    Plan shape: one shuffle (supplier hash agg over the
    date-pruned scan); everything downstream is broadcast."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("rev_cents"))
    mx = rev.agg(F.max("rev_cents").alias("_max"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("_max"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            (F.col("rev_cents").cast("double") / 100).alias("total_revenue"),
        )
    )


SQL_TPCH_Q15_TOPSUPP = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rev_cents AS DOUBLE) / 100 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)"""


# --------------------------------------------------------------------------
# TPC-H Q16 — supplier count per (brand, type, size)
# --------------------------------------------------------------------------

def q_tpch_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted): how many distinct suppliers have shipped
    each (brand, type, size) combination, for eight sizes, excluding
    Brand#4 and PROMO parts, and excluding suppliers with negative
    account balance (the NOT IN complaints subquery re-expressed as
    an anti-join on the derived shipping relation).

    Plan shape: the part-supplier relation is DERIVED as distinct
    (l_partkey, l_suppkey) — one shuffle; the bad-supplier set and
    the filtered part dim broadcast; count(DISTINCT) runs on the
    post-filter remnant."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#4")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16_SUPPCNT = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------------
# TPC-H Q17 — small-quantity-order revenue (correlated avg)
# --------------------------------------------------------------------------

def q_tpch_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted, per-brand): average yearly revenue lost
    if small-quantity orders (below 20% of the part's average
    quantity) moved to scheduled deliveries. p_container does not
    exist, so the report is per brand instead of one
    (brand, container) cell.

    Determinism: l_quantity is integer-valued, so per-part
    sum/count — and hence the 0.2*avg threshold — is exact in
    double; revenue is cents-quantized before the BIGINT sum.

    Plan shape: per-part avg is one hash agg; the threshold joins
    back on partkey (co-partitioned with the first shuffle under
    AQE); the per-brand final agg is tiny."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("double") / 100 / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SQL_TPCH_Q17_SMALLQTY = """
WITH aq AS (
  SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            AS DOUBLE) / 100 / 7.0 AS avg_yearly,
       count(*) AS n_small
FROM lineitem
JOIN aq ON l_partkey = ak
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < 0.2 * avg_qty
GROUP BY 1"""


# --------------------------------------------------------------------------
# TPC-H Q20 — potential part promotion (semi-join + HAVING)
# --------------------------------------------------------------------------

def q_tpch_q20_potential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers who shipped more than 200
    units of 'red' parts during 1997 (the ps_availqty > half-of-
    shipped threshold re-expressed as an absolute HAVING on shipped
    quantity), with their nation.

    Plan shape: name-filtered part dim broadcast into the
    date-pruned lineitem scan; one per-supplier hash agg; supplier/
    nation dims broadcast onto the surviving handful of rows."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1997)
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_shipped"))
        .filter(F.col("qty_shipped") > 200)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "qty_shipped")
    )


SQL_TPCH_Q20_POTENTIAL = """
SELECT s_suppkey, s_name, n_name, qty_shipped
FROM (
  SELECT l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_shipped
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
  WHERE year(l_shipdate) = 1997
  GROUP BY 1
) q
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty_shipped > 200"""


# --------------------------------------------------------------------------
# TPC-H Q21 — suppliers who kept orders waiting
# --------------------------------------------------------------------------

def q_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): per supplier, the number of finalized
    ('F') multi-supplier orders where THIS supplier was the sole
    latest shipper — the EXISTS(other supplier) / NOT EXISTS(other
    equally-late supplier) pair re-expressed on l_shipdate (the
    receipt/commit columns do not exist).

    Plan shape: three hash aggs — (orderkey, suppkey) max-shipdate,
    per-order rollup (n suppliers, order max), then a per-order
    winner rollup where min(l_suppkey) IS the sole winner whenever
    the winner count is 1 — so no window ever touches per-supplier
    rows. Orders ('F' filter) joins on orderkey before the first agg
    so pruning happens early, and all three aggs + the join share
    the orderkey partitioning (AQE reuses the exchange)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("s_max").alias("o_max"),
    )
    winners = (
        per_supp.join(per_order, "l_orderkey")
        .filter((F.col("s_max") == F.col("o_max")) & (F.col("n_supp") >= 2))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_winners"),
            F.min("l_suppkey").alias("winner"),
        )
        .filter(F.col("n_winners") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.groupBy("winner")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("winner") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_TPCH_Q21_WAITING = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey AS ok, count(*) AS n_supp, max(s_max) AS o_max
  FROM per_supp GROUP BY 1
),
winners AS (
  SELECT l_orderkey, count(*) AS n_winners, min(l_suppkey) AS winner
  FROM per_supp JOIN per_order ON l_orderkey = ok
  WHERE s_max = o_max AND n_supp >= 2
  GROUP BY 1
)
SELECT s_suppkey, s_name, numwait
FROM (
  SELECT winner, count(*) AS numwait
  FROM winners WHERE n_winners = 1
  GROUP BY 1
) w
JOIN supplier ON winner = s_suppkey"""


QUERIES14: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q2_mincost": q_tpch_q2_mincost,
    "tpch_q4_latesemi": q_tpch_q4_latesemi,
    "tpch_q9_profit": q_tpch_q9_profit,
    "tpch_q11_value": q_tpch_q11_value,
    "tpch_q12_latemode": q_tpch_q12_latemode,
    "tpch_q15_topsupp": q_tpch_q15_topsupp,
    "tpch_q16_suppcnt": q_tpch_q16_suppcnt,
    "tpch_q17_smallqty": q_tpch_q17_smallqty,
    "tpch_q20_potential": q_tpch_q20_potential,
    "tpch_q21_waiting": q_tpch_q21_waiting,
}

ORACLES14: dict[str, str] = {
    "tpch_q2_mincost": SQL_TPCH_Q2_MINCOST,
    "tpch_q4_latesemi": SQL_TPCH_Q4_LATESEMI,
    "tpch_q9_profit": SQL_TPCH_Q9_PROFIT,
    "tpch_q11_value": SQL_TPCH_Q11_VALUE,
    "tpch_q12_latemode": SQL_TPCH_Q12_LATEMODE,
    "tpch_q15_topsupp": SQL_TPCH_Q15_TOPSUPP,
    "tpch_q16_suppcnt": SQL_TPCH_Q16_SUPPCNT,
    "tpch_q17_smallqty": SQL_TPCH_Q17_SMALLQTY,
    "tpch_q20_potential": SQL_TPCH_Q20_POTENTIAL,
    "tpch_q21_waiting": SQL_TPCH_Q21_WAITING,
}
