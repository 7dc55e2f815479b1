"""Catalog batch 12 (round 6, third wave): relational completeness —
the TPC-H query shapes expressible on the driver's star schema
(no partsupp / shipmode / commitdate columns exist, so Q2/Q4/Q12/
Q16/Q21 are out of reach; Q7/Q8/Q10/Q13/Q18/Q19/Q22 are adapted to
the available columns with their canonical plan shapes intact) —
plus two corpus-statistics entries (per-source unigram KL drift and
Zipf rank-frequency slope).

Determinism conventions follow the catalog rules (plans/queries.py
module docstring): order-sensitive double sums rounded identically
on both sides, log-derived terms quantized to integer micro-units
and summed as BIGINT, timestamps emitted as epoch micros, every
computed column aliased to the same name in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators import text as TX
from wq_data_pipeline_spark.sources.testdata import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# TPC-H Q7 — volume shipping between nation pairs
# --------------------------------------------------------------------------

def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (adapted): revenue flow between distinct
    (supplier-nation, customer-nation) pairs per ship year.

    Plan shape: the two fact tables join on l_orderkey (one shuffle),
    customer joins on o_custkey (second shuffle); supplier and both
    nation sides are broadcast dims. The nation dim is aliased twice
    — once per side — instead of re-reading it.

    Determinism: with ~4200 output groups the round-after-sum double
    discipline hits half-cent boundaries (order-dependent last cent),
    so revenue is quantized to integer cents PER ROW (one IEEE
    product, identical in both engines) and summed exactly as
    BIGINT."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            (
                F.sum(F.round(_rev() * 100).cast("long")).cast("double") / 100
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q7_VOLUME = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS DOUBLE) / 100 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------------
# TPC-H Q8 — market share per supplier nation
# --------------------------------------------------------------------------

def q_tpch_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted): each supplier nation's share of PROMO-part
    revenue sold to ASIA-region customers, per ship year.

    Revenue accumulates as EXACT integer cents (per-row product +
    one round is bit-identical across engines; the BIGINT sum is
    order-free) — the r8 sf0.1 insurance sweep caught the previous
    round-after-double-sum form landing a group on opposite sides of
    a cent boundary (5701761.14 vs .15). The share divides two exact
    integers, so the window division is bit-deterministic too. part
    is filtered then broadcast; the per-(year, nation) agg is tiny,
    so the share window costs nothing."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nc = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("nc_key"))
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy("supp_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.round(_rev() * 100).cast("long")).alias("_cents")
        )
    )
    w = Window.partitionBy("ship_year")
    return rev.select(
        "supp_nation",
        "ship_year",
        (F.col("_cents") / F.lit(100.0)).alias("revenue"),
        F.round(
            F.col("_cents").cast("double")
            / F.sum("_cents").over(w).cast("double"),
            6,
        ).alias("mkt_share"),
    )


SQL_TPCH_Q8_SHARE = """
WITH rev AS (
  SELECT ns.n_name AS supp_nation, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  GROUP BY 1, 2)
SELECT supp_nation, ship_year, cents / 100.0 AS revenue,
       round(CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY ship_year) AS DOUBLE), 6) AS mkt_share
FROM rev"""


# --------------------------------------------------------------------------
# TPC-H Q10 — returned-item revenue, top customers
# --------------------------------------------------------------------------

def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items
    ('R') for orders placed in a 6-month window.

    The o_orderdate range filter lands on the orders scan (partition
    pruning at scale); after it, the orders side is small enough for
    AQE to pick a broadcast join against lineitem. nation is an
    explicit broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10_RETURNS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""


# --------------------------------------------------------------------------
# TPC-H Q13 — customer order-count distribution
# --------------------------------------------------------------------------

def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by how many non-URGENT
    orders they placed — the canonical left-outer-join + double-agg
    shape (customers with zero qualifying orders land in the c_count
    = 0 bucket via the null-skipping count)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_TPCH_Q13_CUSTDIST = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count"""


# --------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders
# --------------------------------------------------------------------------

def q_tpch_q18_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds 300, with
    the buying customer — group-filter-join-back. The HAVING-filtered
    aggregate is a tiny fraction of orders, so AQE broadcasts it into
    the joins back to orders/customer."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("o_orderdate_us"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18_LARGE = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300)
SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""


# --------------------------------------------------------------------------
# TPC-H Q19 — discounted revenue under OR'd brand/size/quantity bands
# --------------------------------------------------------------------------

def q_tpch_q19_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted to available columns): revenue from three
    OR'd (brand, size-range, quantity-band) predicates.

    The OR spans both tables, so Catalyst can't push it; the classic
    Q19 rewrite is applied by hand — each side gets the union of its
    own conjuncts (part: brand IN + size bound; lineitem: overall
    quantity envelope) BEFORE the broadcast join, and the exact OR
    runs on the joined rows."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#12") & (s <= 15) & (q >= 1) & (q <= 11))
        | ((b == "Brand#23") & (s <= 10) & (q >= 10) & (q <= 20))
        | ((b == "Brand#34") & (s <= 5) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q19_BRAND = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 20 AND 30)"""


# --------------------------------------------------------------------------
# TPC-H Q22 — wealthy customers gone quiet
# --------------------------------------------------------------------------

def q_tpch_q22_idle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: no phone column, so the grouping key is
    the customer's nation): customers with above-average positive
    account balance and NO orders since 2000-06-01 — scalar subquery
    + anti join, rolled up per nation.

    The average is computed plan-side and broadcast (no driver
    collect); the anti join runs against the date-filtered distinct
    custkey set, which is far smaller than orders."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


SQL_TPCH_Q22_IDLE = """
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY n_name"""


# --------------------------------------------------------------------------
# Corpus statistics: per-source unigram KL drift vs the whole corpus
# --------------------------------------------------------------------------

def q_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: KL(source ‖ corpus) over
    the unigram distributions — the standard domain-shift monitor for
    a mixed-source training corpus (flags a crawl slice whose word
    distribution departs from the mix).

    Determinism (bigram_lm_score precedent): each term's contribution
    c_st·log2((c_st·T_g)/(T_s·c_t)) is quantized to integer micro-bits
    and summed as BIGINT — order-free under any partitioning; every
    log2 input is the same IEEE division of the same exact integers
    in both engines.

    Scale shape: ONE per-(source, token) hash agg feeds everything —
    per-source totals, the corpus vocabulary, and the scoring join
    all ride on it (the dsir_weights lesson); the vocabulary and the
    20-row totals are broadcast."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    tc = (
        d.select("source", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
        .localCheckpoint()  # three consumers below
    )
    ts = tc.groupBy("source").agg(F.sum("c_st").cast("long").alias("t_s"))
    g = tc.groupBy("tok").agg(F.sum("c_st").cast("long").alias("c_t"))
    tot = g.agg(F.sum("c_t").cast("long").alias("t_g"))
    ratio = (F.col("c_st").cast("double") * F.col("t_g").cast("double")) / (
        F.col("t_s").cast("double") * F.col("c_t").cast("double")
    )
    contrib = F.round(F.col("c_st") * F.log2(ratio) * 1e6).cast("long")
    return (
        tc.join(F.broadcast(g), "tok")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "t_s", contrib.alias("u"))
        .groupBy("source")
        .agg(
            F.max("t_s").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("u").cast("long").alias("kl_micro_sum"),
            F.round(
                F.sum("u").cast("double") / 1e6 / F.max("t_s"), 6
            ).alias("kl_bits"),
        )
    )


SQL_TOKEN_KL_DRIFT = """
WITH w AS (SELECT source,
            list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
           FROM documents),
tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
       FROM (SELECT source, unnest(toks) AS tok FROM w) GROUP BY source, tok),
ts AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM tc GROUP BY source),
g  AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM tc GROUP BY tok),
tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_g FROM g),
scored AS (
  SELECT tc.source, ts.t_s,
         CAST(round(tc.c_st * log2((CAST(tc.c_st AS DOUBLE) * CAST(t_g AS DOUBLE))
                                   / (CAST(ts.t_s AS DOUBLE) * CAST(g.c_t AS DOUBLE)))
                    * 1e6) AS BIGINT) AS u
  FROM tc JOIN g USING (tok) JOIN ts USING (source) CROSS JOIN tot)
SELECT source, max(t_s) AS n_tokens, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(u) AS BIGINT) AS kl_micro_sum,
       round(CAST(sum(u) AS DOUBLE) / 1e6 / max(t_s), 6) AS kl_bits
FROM scored GROUP BY source"""


# --------------------------------------------------------------------------
# Corpus statistics: Zipf rank-frequency slope per source
# --------------------------------------------------------------------------

def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: least-squares slope of ln(freq) vs
    ln(rank) over the top-100 tokens — a text-naturalness diagnostic
    (natural language sits near -1; templated/spammy sources drift).

    Determinism: ln(rank) and ln(count) are quantized to integer
    micro-units per term (inputs are exact integers, so both engines
    feed identical doubles to ln); all regression sums are then exact
    BIGINT, and the closed-form slope is one double division of
    identical operands. Top-100 cap keeps every BIGINT product far
    from overflow at any corpus size."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    tc = (
        d.select("source", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    r = (
        tc.select(
            "source", "tok", "c", F.row_number().over(w).alias("rank")
        ).filter(F.col("rank") <= 100)
    )
    lx = F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long")
    ly = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    t = r.select("source", "tok", "c", "rank", lx.alias("lx"), ly.alias("ly"))
    a = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.max(F.when(F.col("rank") == 1, F.col("tok"))).alias("top_token"),
        F.max(F.when(F.col("rank") == 1, F.col("c"))).alias("top_count"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
    )
    den = (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    num = (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return a.select(
        "source",
        "n_terms",
        "top_token",
        "top_count",
        F.when(den != 0, F.round(num / den, 6)).alias("zipf_slope"),
    )


SQL_ZIPF_SLOPE = """
WITH w AS (SELECT source,
            list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
           FROM documents),
tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT source, unnest(toks) AS tok FROM w) GROUP BY source, tok),
rk AS (SELECT source, tok, c,
              row_number() OVER (PARTITION BY source ORDER BY c DESC, tok ASC) AS rank
       FROM tc),
t AS (SELECT source, tok, c, rank,
             CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS lx,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS ly
      FROM rk WHERE rank <= 100),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
             max(CASE WHEN rank = 1 THEN tok END) AS top_token,
             CAST(max(CASE WHEN rank = 1 THEN c END) AS BIGINT) AS top_count,
             CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             CAST(sum(lx * ly) AS BIGINT) AS sxy,
             CAST(sum(lx * lx) AS BIGINT) AS sxx
      FROM t GROUP BY source)
SELECT source, n_terms, top_token, top_count,
       CASE WHEN n_terms * sxx - sx * sx <> 0
            THEN round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                       / CAST(n_terms * sxx - sx * sx AS DOUBLE), 6)
       END AS zipf_slope
FROM a"""


QUERIES12: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q7_volume": q_tpch_q7_volume,
    "tpch_q8_share": q_tpch_q8_share,
    "tpch_q10_returns": q_tpch_q10_returns,
    "tpch_q13_custdist": q_tpch_q13_custdist,
    "tpch_q18_large": q_tpch_q18_large,
    "tpch_q19_brand": q_tpch_q19_brand,
    "tpch_q22_idle": q_tpch_q22_idle,
    "token_kl_drift": q_token_kl_drift,
    "zipf_slope": q_zipf_slope,
}

ORACLES12: dict[str, str] = {
    "tpch_q7_volume": SQL_TPCH_Q7_VOLUME,
    "tpch_q8_share": SQL_TPCH_Q8_SHARE,
    "tpch_q10_returns": SQL_TPCH_Q10_RETURNS,
    "tpch_q13_custdist": SQL_TPCH_Q13_CUSTDIST,
    "tpch_q18_large": SQL_TPCH_Q18_LARGE,
    "tpch_q19_brand": SQL_TPCH_Q19_BRAND,
    "tpch_q22_idle": SQL_TPCH_Q22_IDLE,
    "token_kl_drift": SQL_TOKEN_KL_DRIFT,
    "zipf_slope": SQL_ZIPF_SLOPE,
}
