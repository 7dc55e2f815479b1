"""Catalog batch 18 (round 6, sixth wave): scale-join machinery and
sketches — the join/estimation shapes a 100-TB engine needs when the
small side stops being broadcastable and exact distinct counts stop
being affordable:

* binned_range_join — large x large interval join WITHOUT broadcast:
                      intervals explode onto a fixed time-bin grid,
                      the probe side computes its single bin, and the
                      match becomes an equi-join on (key, bin) + a
                      residual range predicate. Neither side is
                      collected or broadcast, so the plan survives
                      both sides being 100-TB tables (contrast
                      j3_range_join, which broadcasts the intervals).
* bloom_prune_join  — Bloom-filter semi-join pruning: the dim-side
                      key set compresses to an m-bit filter (m fixed,
                      independent of key count), the fact side is
                      pruned by k deterministic md5 hash probes
                      before the exact join. The entry reports
                      total / bloom-pass / exact-match counts so the
                      false-positive behavior itself is oracled.
* kmv_distinct      — K-minimum-values distinct-count sketch: the
                      estimate is (K-1) * H / h_(K) over a 52-bit
                      md5 hash space, all in exact BIGINT arithmetic
                      (13 hex digits = 52 bits keeps every product
                      inside int64), reported next to the exact
                      distinct count so the error is visible.
* linreg_daily      — per-series least-squares trend (daily counts
                      vs day index) from the five exact integer
                      sums n, Sx, Sy, Sxy, Sxx; slope and intercept
                      are single divisions of exact BIGINTs, so the
                      doubles are bit-identical cross-engine.

Scale notes are on each query. Determinism: md5 is the only hash
(identical hex in Spark and DuckDB); every accumulation is an exact
BIGINT sum; doubles appear only as final single divisions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_HOUR_US = 3_600_000_000
_WIN_US = 2 * _HOUR_US  # purchase attribution window


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# --------------------------------------------------------------------------
# binned range join (large x large, no broadcast)
# --------------------------------------------------------------------------


def q_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside any same-user 2-hour purchase window,
    joined WITHOUT broadcasting either side.

    Every purchase interval [pts, pts + 2h) explodes onto the hourly
    bin grid it covers (3 bins for a 2-hour window); every probe
    event computes its single bin. The join is then a plain shuffled
    equi-join on (user_id, bin) with the residual range predicate
    applied after the match. Each qualifying (event, purchase) pair
    matches exactly once because the event's bin is unique.

    Scale: both sides shuffle-partition on (user_id, bin) — no
    broadcast, no nested-loop, no interval index held in one task.
    Fan-out is bounded by ceil(window / bin) + 1 rows per interval;
    bin width tunes the fan-out vs selectivity trade. This is the
    shape that replaces j3_range_join when intervals stop fitting in
    a broadcast."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("pts_us"),
    )
    # interval side: one row per covered hourly bin
    p_binned = purchases.withColumn(
        "bin",
        F.explode(
            F.sequence(
                (F.col("pts_us") / _HOUR_US).cast("long"),
                ((F.col("pts_us") + F.lit(_WIN_US)) / _HOUR_US).cast("long"),
            )
        ),
    )
    # probe side: single bin per event
    e_binned = ev.withColumn("bin", (F.col("ts_us") / _HOUR_US).cast("long"))
    pairs = e_binned.join(
        p_binned,
        (e_binned["user_id"] == p_binned["p_user"]) & (e_binned["bin"] == p_binned["bin"]),
    ).filter(
        (F.col("ts_us") >= F.col("pts_us"))
        & (F.col("ts_us") < F.col("pts_us") + F.lit(_WIN_US))
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("event_id").alias("n_events"),
            F.sum("vc").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


SQL_BINNED_RANGE_JOIN = f"""
WITH p AS (
  SELECT user_id AS p_user, epoch_us(ts) AS pts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_type,
       count(*) AS n_pairs,
       count(DISTINCT e.event_id) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events e
JOIN p ON e.user_id = p.p_user
      AND epoch_us(e.ts) >= p.pts_us
      AND epoch_us(e.ts) < p.pts_us + {_WIN_US}
GROUP BY 1 ORDER BY 1"""


# --------------------------------------------------------------------------
# Bloom-filter join pruning
# --------------------------------------------------------------------------

_BLOOM_M = 8192  # bits
_BLOOM_K = 3  # hash probes
_VIP_MIN_PRICE = 450000.0


def _bloom_pos(col: F.Column, i: int) -> F.Column:
    """Deterministic Bloom position i: first 8 md5 hex digits of the
    seeded key string, mod m. Mirrors the SQL form exactly."""
    seeded = F.concat(F.lit(f"b{i}:"), col.cast("string"))
    return (F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("long") % _BLOOM_M)


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prune the events fact table against the VIP-customer key set
    with an m-bit Bloom filter before the exact semi-join.

    The dim side (custkeys of orders over {_VIP_MIN_PRICE}) reduces
    to at most m = 8192 bit positions — the filter's size is FIXED
    regardless of how many keys feed it, which is the whole point: at
    100 TB a 10M-key dim side no longer broadcasts as rows, but its
    Bloom image is still 1 KiB. The fact side tests k = 3 md5 probes
    JVM-side (no shuffle, no join) and only surviving rows reach the
    exact join. The entry reports per-event-type totals, bloom
    survivors, and exact matches, so the (deterministic) false-
    positive count is itself part of the oracled result.

    Scale: the positions array is collected (bounded by m, not by key
    count) and shipped as a literal — the standard runtime-filter
    pattern. The exact join on the survivors is a plain shuffled
    semi-join."""
    orders = load_table(spark, sf_dir, "orders")
    vip = (
        orders.filter(F.col("o_totalprice") > _VIP_MIN_PRICE)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    pos_rows = (
        vip.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    # pack the positions into the actual m-bit bitset: m/64 longs,
    # FIXED size regardless of |vip|. (A literal ARRAY of raw
    # positions was measured at ~17 s/query from codegen alone —
    # thousands of literal nodes in one expression tree; the packed
    # form is 128 literals and three shift-and-mask probes.)
    words = [0] * (_BLOOM_M // 64)
    for r in pos_rows:
        words[r["pos"] // 64] |= 1 << (r["pos"] % 64)
    # two's-complement into signed int64 literals
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    _signed_masks = [
        m - (1 << 64) if (m := 1 << b) >= (1 << 63) else m for b in range(64)
    ]
    lit_masks = F.array(*[F.lit(m).cast("long") for m in _signed_masks])

    ev = _events(spark, sf_dir)

    def _probe(i: int) -> F.Column:
        pos = _bloom_pos(F.col("user_id"), i)
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        mask = F.element_at(lit_masks, (pos % 64).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    bloom_pass = _probe(0)
    for i in range(1, _BLOOM_K):
        bloom_pass = bloom_pass & _probe(i)
    flagged = ev.withColumn("_bloom", bloom_pass)
    survivors = flagged.filter(F.col("_bloom"))
    exact = survivors.join(vip, survivors["user_id"] == vip["k"], "left_semi")
    per_type = flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("_bloom").cast("long")).alias("n_bloom_pass"),
    )
    exact_counts = exact.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        per_type.join(exact_counts, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            "n_bloom_pass",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
        )
        .orderBy("event_type")
    )


def _bloom_pos_sql(expr: str, i: int) -> str:
    return f"('0x' || substr(md5('b{i}:' || CAST({expr} AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M}"


SQL_BLOOM_PRUNE_JOIN = f"""
WITH vip AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > {_VIP_MIN_PRICE}
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_bloom_pos_sql("k", 0)} AS pos FROM vip
    UNION ALL SELECT {_bloom_pos_sql("k", 1)} FROM vip
    UNION ALL SELECT {_bloom_pos_sql("k", 2)} FROM vip
  )
),
flagged AS (
  SELECT event_type, user_id,
         ({_bloom_pos_sql("user_id", 0)} IN (SELECT pos FROM bits)
          AND {_bloom_pos_sql("user_id", 1)} IN (SELECT pos FROM bits)
          AND {_bloom_pos_sql("user_id", 2)} IN (SELECT pos FROM bits)) AS bloom_pass
  FROM events
)
SELECT event_type,
       count(*) AS n_total,
       CAST(sum(CAST(bloom_pass AS BIGINT)) AS BIGINT) AS n_bloom_pass,
       CAST(sum(CAST(bloom_pass AND user_id IN (SELECT k FROM vip) AS BIGINT)) AS BIGINT) AS n_exact
FROM flagged
GROUP BY 1 ORDER BY 1"""


# --------------------------------------------------------------------------
# KMV distinct sketch
# --------------------------------------------------------------------------

_KMV_K = 32
_KMV_SPACE = 1 << 52  # 13 md5 hex digits


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-user estimate per event type,
    reported beside the exact count.

    Each distinct (type, user) hashes to a 52-bit value (13 md5 hex
    digits — chosen so (K-1) * |space| stays inside int64); the K-th
    smallest hash h_(K) estimates the distinct count as
    (K-1) * |space| / h_(K) (Bar-Yossef et al. 2002). Everything up
    to the final floor-division is exact BIGINT.

    Scale: the min-K selection is a per-group row_number window over
    the DISTINCT (type, user) pairs — the heavy dedup is a hash
    aggregate with map-side combine; the window then sees at most
    |distinct| rows per group. A mergeable production form would keep
    a bounded K-heap per partition (approx_count_distinct's HLL is
    the built-in alternative); this entry is the exact-arithmetic,
    oracle-portable form of the same sketch."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("event_type", "user_id").distinct()
    hashed = ev.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10).cast(
            "long"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth_hash"),
        )
        .select(
            "event_type",
            "n_exact",
            "kth_hash",
            F.when(
                F.col("kth_hash").isNotNull(),
                F.expr(f"CAST({_KMV_K - 1} * {_KMV_SPACE} DIV kth_hash AS BIGINT)"),
            )
            .otherwise(F.col("n_exact"))
            .alias("est_kmv"),
        )
        .orderBy("event_type")
    )


SQL_KMV_DISTINCT = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h,
         row_number() OVER (PARTITION BY event_type ORDER BY
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT) AS rn
  FROM du
)
SELECT event_type,
       count(*) AS n_exact,
       max(CASE WHEN rn = {_KMV_K} THEN h END) AS kth_hash,
       CASE WHEN max(CASE WHEN rn = {_KMV_K} THEN h END) IS NOT NULL
            THEN CAST({_KMV_K - 1} * {_KMV_SPACE} // max(CASE WHEN rn = {_KMV_K} THEN h END) AS BIGINT)
            ELSE count(*) END AS est_kmv
FROM h GROUP BY 1 ORDER BY 1"""


# --------------------------------------------------------------------------
# exact-integer least-squares trend
# --------------------------------------------------------------------------

_LR_EPOCH = "2024-01-01"


def q_linreg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of daily event counts vs
    day index (days since {_LR_EPOCH}).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and
    intercept = (Sy - slope_num/slope_den * Sx) / n are computed from
    the five exact BIGINT sums; each output double is one division of
    exact integers (intercept uses the exact rational form
    (Sy*den - num*Sx) / (n*den) so it too is a single division) —
    bit-identical cross-engine.

    Scale: two chained hash aggregates (events -> daily counts ->
    five sums per series); both partial-aggregate map-side. No
    windows, no broadcast."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_LR_EPOCH).cast("date")).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        (num / den).alias("slope"),
        ((F.col("sy") * den - num * F.col("sx")) / (F.col("n") * den)).alias("intercept"),
    ).orderBy("event_type")


SQL_LINREG_DAILY = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{_LR_EPOCH}', CAST(ts AS DATE)) AS x,
         count(*) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type,
       n AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS slope,
       CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
         / (n * (n * sxx - sx * sx)) AS intercept
FROM s ORDER BY 1"""


QUERIES18: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "binned_range_join": q_binned_range_join,
    "bloom_prune_join": q_bloom_prune_join,
    "kmv_distinct": q_kmv_distinct,
    "linreg_daily": q_linreg_daily,
}

ORACLES18: dict[str, str] = {
    "binned_range_join": SQL_BINNED_RANGE_JOIN,
    "bloom_prune_join": SQL_BLOOM_PRUNE_JOIN,
    "kmv_distinct": SQL_KMV_DISTINCT,
    "linreg_daily": SQL_LINREG_DAILY,
}
