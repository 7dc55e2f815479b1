"""Catalog batch 13 (round 6, fourth wave): three engine operators a
complete analytics stack needs that nothing else in the catalog
covers — interval coalescing (merge overlapping per-key intervals),
deterministic weighted sampling without replacement (Efraimidis-
Spirakis A-ES keys), and fixed-iteration PageRank over a purchase
graph in exact integer arithmetic.

Determinism conventions as in plans/queries.py: all interval and
rank math is BIGINT (µs / micro-rank units); the sampling keys feed
an ORDER BY only (never the output), so a 1-ulp libm-vs-JVM ``ln``
divergence can't surface in the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_IV_LEN_US = 1_800_000_000  # each event opens a 30-min activity interval


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: each event opens a 30-min activity
    interval per user; overlapping-or-touching intervals merge into
    maximal islands (the classic sorted-sweep with a running max of
    interval ends — one window per key, no self-join).

    The same primitive underlies uptime/coverage reports, QC mask
    consolidation, and GDPR retention-window math. Per-user rollup:
    island count, covered time, longest island. All µs BIGINT."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = ev.select(
        "user_id",
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + F.lit(_IV_LEN_US)).alias("end_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col("start_us") > prev_max_end)
    ).cast("long")
    islands = (
        s.withColumn("new_i", new_island)
        .withColumn(
            "island",
            F.sum("new_i").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("start_us").alias("i_start"),
            F.max("end_us").alias("i_end"),
        )
    )
    return islands.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).alias("covered_us"),
        F.max(F.col("i_end") - F.col("i_start")).alias("longest_us"),
    )


SQL_INTERVAL_MERGE = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + {_IV_LEN_US} AS end_us, event_id
  FROM events),
m AS (
  SELECT *,
         max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_end
  FROM s),
i AS (
  SELECT *, CAST(sum(CASE WHEN prev_max_end IS NULL
                           OR start_us > prev_max_end THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY start_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM m),
isl AS (
  SELECT user_id, island, count(*) AS n_events,
         min(start_us) AS i_start, max(end_us) AS i_end
  FROM i GROUP BY user_id, island)
SELECT user_id, CAST(sum(n_events) AS BIGINT) AS n_events,
       count(*) AS n_islands,
       CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
       CAST(max(i_end - i_start) AS BIGINT) AS longest_us
FROM isl GROUP BY user_id"""


_WS_K = 10  # sample size per source


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis A-ES scheme — each doc draws u ~ U(0,1) from
    its md5 (52-bit prefix), gets key ln(u)/w with weight w =
    n_chars, and the top-k keys per source win. One hash per row +
    one per-source top-k window: fully map-side until the tiny
    shuffle of per-source candidates.

    The float key orders candidates but is NOT emitted, so libm/JVM
    ln() ulp differences can't reach the value hash; a flip would
    need two keys within 1 ulp of each other."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + 0.5) / F.lit(float(1 << 52))
    key = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        d.withColumn("key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _WS_K)
        .select("source", "sample_rank", "doc_id", F.col("n_chars").alias("weight"))
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
             + 0.5) / {float(1 << 52)!r}) / n_chars AS key
  FROM documents WHERE n_chars > 0),
r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC)
           AS sample_rank
  FROM d)
SELECT source, sample_rank, doc_id, n_chars AS weight
FROM r WHERE sample_rank <= {_WS_K}"""


_PR_ITERS = 3


def q_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-supplier purchase graph (edge when
    a customer ever bought from a supplier), {_PR_ITERS} fixed
    iterations, damping 0.85 — iterative graph analytics on the star
    schema (supplier influence / customer centrality in one rank).

    Exact integer arithmetic end-to-end: ranks live in micro-units,
    each neighbor contribution is the BIGINT integral division
    (85·r) div (100·deg), so the per-iteration sums are order-free
    under any partitioning and the oracle unrolls the same rounds as
    CTEs. The edge skeleton (one distinct pair per relationship) is
    pinned once and reused by degree + every iteration; each round
    is one join + one hash agg — the standard distributed-PR shape."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # degree + 3 iterations all read this skeleton — pin it once,
        # ALREADY hash-partitioned on src so every iteration's join
        # shuffles only the node-sized rank table, never the edges
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .localCheckpoint()
    )
    # the degree table joins into every round AND the final select —
    # pin it once (it is node-sized); count it while materializing so
    # the round joins can be broadcast-pinned below the same gate the
    # connected-components operator uses (checkpointed RDD frames
    # carry no stats, so AQE would otherwise run every round as a
    # sort-merge join that re-sorts the EDGE skeleton — 14 SMJs in
    # the r12 initial-plan audit). Above the gate (the true 100-TB
    # node count) the shuffling joins run unchanged.
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()
    n_nodes = deg.count()
    # byte-aware gate (r12-VERDICT #2): a broadcast (node, u) row is a
    # ~10-char node string + one long ≈ 40 B framed, so 1.5M nodes ≈
    # 60 MB raw — at the session's 64 MB autoBroadcast intent; the old
    # 4M-row gate allowed ~160 MB per executor at the boundary
    hint = F.broadcast if n_nodes <= 1_500_000 else (lambda d: d)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1_000_000).alias("r"))
    for _ in range(_PR_ITERS):
        # pre-join ranks with degrees (both node-sized) so each round
        # pays ONE edge-side join on the broadcast (node, u) table
        # instead of two
        rd = ranks.join(hint(deg), ranks.node == deg.src).select(
            "node", F.expr("(85 * r) div (100 * deg)").alias("u")
        )
        contrib = edges.join(hint(rd), edges.src == rd.node).select("dst", "u")
        ranks = contrib.groupBy("dst").agg(
            (F.lit(150_000) + F.sum("u")).cast("long").alias("r")
        ).select(F.col("dst").alias("node"), "r")
    return (
        ranks.join(hint(deg), ranks.node == deg.src)
        .select(
            "node",
            F.substring("node", 1, 1).alias("node_type"),
            "deg",
            F.col("r").alias("rank_micro"),
        )
    )


def _pr_round(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT e.dst AS node,
         CAST(150000 + sum((85 * r.r) // (100 * d.deg)) AS BIGINT) AS r
  FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst)"""


SQL_PAGERANK_PURCHASES = f"""
WITH pairs AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                  's:' || CAST(l_suppkey AS VARCHAR) AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL SELECT s AS src, c AS dst FROM pairs),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
{_pr_round("r0", "r1")},
{_pr_round("r1", "r2")},
{_pr_round("r2", "r3")}
SELECT r3.node, substr(r3.node, 1, 1) AS node_type, d.deg,
       r3.r AS rank_micro
FROM r3 JOIN deg d ON r3.node = d.src"""


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (region, order priority) — all four
    grouping combinations (detail, two marginals, grand total) in one
    pass; completes the grouping-set surface next to rel_rollup.
    Order totals are summed in integer cents (exact BIGINT, order-
    free) since the marginals aggregate enough doubles to hit
    half-cent boundaries. Data has no NULL keys, so 'ALL' coalesce
    markers are unambiguous."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "r_name",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return (
        j.cube("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents").cast("double") / 100).alias("total_price"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


SQL_REL_CUBE = """
WITH j AS (
  SELECT r_name, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey)
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(cents) AS DOUBLE) / 100 AS total_price
FROM j GROUP BY CUBE (r_name, o_orderpriority)"""


_SPAN_N = 8  # token n-gram width, matches queries_scale.dup_spans


def q_dup_span_removal_keepone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with a STRICT keep-one guarantee — the
    complement of ``dup_span_removal`` (queries_scale.py), whose
    per-island first-gram keeper can destroy every copy of a run when
    islands merge differently across docs (the pinned over-removal
    case).

    Rule here: occurrences are grouped by the md5 of the island's
    ACTUAL TOKEN TEXT; within each group the (doc_id, span_start)-
    minimal occurrence is the keeper and only the others are removed.
    Guarantee: the keeper's island IS that exact text, so one copy of
    every removed string always survives — removal can never orphan a
    span. The trade (documented dual of the old entry): when chained
    runs merge into one island in some doc, its island text differs
    from the standalone runs', the groups are singletons, and NOTHING
    is removed there — conservative under-removal instead of
    destructive over-removal. Identical spans (the overwhelmingly
    common case) dedup exactly as before. True maximal-match keep-one
    still requires suffix-array semantics (Lee et al. 2022 §3).

    Scale shape: dup_spans' detect chain (gram hash agg + island
    windows), plus ONE doc_id equi-join of the span list against the
    token arrays to md5 each island's text, a row_number window over
    text groups (tiny partitions), and the same per-doc rewrite join.
    """
    from wq_data_pipeline_spark.operators.text import (
        gram_hash,
        shingles_from_tokens,
        tokens,
    )
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    toks = d.select("doc_id", F.posexplode(tokens("text")).alias("tpos", "tok"))
    # token array materialized first: an inline tokens("text") inside
    # the shingle transform re-tokenizes per gram position (r12)
    g = d.select("doc_id", tokens("text").alias("_toks")).select(
        "doc_id",
        F.posexplode(shingles_from_tokens(F.col("_toks"), _SPAN_N)).alias(
            "pos", "g"
        ),
    ).select("doc_id", "pos", gram_hash(F.col("g")).alias("h"))
    # ONE gram build via the (h, doc) two-level agg + h-window — the
    # same r13 rewrite as q_dup_spans (nd ≡ countDistinct(doc) at the
    # (h, doc) grain); the old groupBy+join-back executed the
    # tokenize+shingle explode twice
    g2 = g.groupBy("h", "doc_id").agg(F.collect_list("pos").alias("_ps"))
    hits = (
        g2.withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("_ps").alias("pos"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_N, 1).otherwise(0)
    isl = hits.withColumn("island", F.sum(brk).over(w))
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s0"),
        (F.max("pos") + F.lit(_SPAN_N - 1)).alias("s1"),
    )
    ta = d.select("doc_id", tokens("text").alias("toks"))
    keyed = spans.join(ta, "doc_id").select(
        "doc_id",
        "s0",
        "s1",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    F.col("s0") + 1,
                    F.col("s1") - F.col("s0") + 1,
                ),
            )
        ).alias("tkey"),
    )
    wk = Window.partitionBy("tkey").orderBy("doc_id", "s0")
    removed = (
        keyed.withColumn("occ", F.row_number().over(wk))
        .filter(F.col("occ") >= 2)
        .select(F.col("doc_id").alias("r_doc"), "s0", "s1")
    )
    j = toks.join(
        removed,
        (toks.doc_id == removed.r_doc) & toks.tpos.between(removed.s0, removed.s1),
        "left",
    )
    keep = F.col("s0").isNull()
    kept_struct = F.when(keep, F.struct("tpos", "tok"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((~keep).cast("long")).alias("n_removed"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x.tok
                ),
            )
        ).alias("text_md5"),
    )


SQL_DUP_SPAN_REMOVAL_KEEPONE = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
t AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS tpos, toks[i] AS tok
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
        FROM w WHERE len(toks) >= 1)
),
g AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' ')), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS i
        FROM w WHERE len(toks) >= {_SPAN_N})
),
dup AS (
  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_N}
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
),
spans AS (
  SELECT doc_id, min(pos) AS s0, max(pos) + {_SPAN_N - 1} AS s1
  FROM isl GROUP BY doc_id, island
),
keyed AS (
  SELECT s.doc_id, s.s0, s.s1,
         md5(array_to_string(list_slice(w.toks, s.s0 + 1, s.s1 + 1), ' ')) AS tkey
  FROM spans s JOIN w ON s.doc_id = w.doc_id
),
rm AS (
  SELECT doc_id AS r_doc, s0, s1
  FROM (SELECT doc_id, s0, s1,
               row_number() OVER (PARTITION BY tkey ORDER BY doc_id, s0) AS occ
        FROM keyed)
  WHERE occ >= 2
),
m AS (
  SELECT t.doc_id, t.tpos, t.tok, (rm.s0 IS NULL) AS keep
  FROM t LEFT JOIN rm ON t.doc_id = rm.r_doc AND t.tpos BETWEEN rm.s0 AND rm.s1
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(tok, ' ' ORDER BY tpos) FILTER (WHERE keep), '')) AS text_md5
FROM m GROUP BY doc_id"""


QUERIES13: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "interval_merge": q_interval_merge,
    "weighted_sample": q_weighted_sample,
    "pagerank_purchases": q_pagerank_purchases,
    "dup_span_removal_keepone": q_dup_span_removal_keepone,
    "rel_cube": q_rel_cube,
}

ORACLES13: dict[str, str] = {
    "interval_merge": SQL_INTERVAL_MERGE,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "pagerank_purchases": SQL_PAGERANK_PURCHASES,
    "dup_span_removal_keepone": SQL_DUP_SPAN_REMOVAL_KEEPONE,
    "rel_cube": SQL_REL_CUBE,
}
