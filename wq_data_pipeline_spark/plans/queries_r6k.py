"""Catalog batch 20 (round 6, eighth wave): reshaping, robust-stats,
and record-linkage surface:

* unpivot_metrics   — wide->long melt of the per-series daily metric
                      columns (the inverse of the p16 pivot), all
                      integer values.
* winsorize         — per-series 5th/95th-percentile clamping stats:
                      exact rank-based cut values (no interpolation),
                      clipped-row counts and the winsorized sum.
* fuzzy_join        — blocked Levenshtein self-join over document
                      prefixes: block on (lang, length-bucket), pair
                      within block, keep edit distance <= threshold.
                      Both engines implement identical Levenshtein.
* event_transitions — first-order Markov transition counts between
                      consecutive event types per user, with exact
                      integer-micro transition probabilities.
* rollup_merge      — two-level aggregation: daily partial
                      aggregates merged to weekly rollups (count /
                      sum / min / max / variance via the exact
                      integer closed form). The ORACLE aggregates the
                      raw rows directly, so the entry proves
                      partial-merge == direct — the algebraic
                      property that makes incremental rollup
                      maintenance sound at 100 TB.

Determinism: integer centi-units, BIGINT sums, single final
divisions; Levenshtein is exact; rank-based percentiles avoid
interpolation arithmetic entirely.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_DAY_US = 86_400_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


# --------------------------------------------------------------------------
# unpivot / melt
# --------------------------------------------------------------------------


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-series metrics melted long: one row per
    (series, day, metric). The unpivot is a zero-shuffle Expand over
    the aggregated frame — the metric axis becomes data, which is how
    a metrics store serves heterogeneous dashboards from one table.

    Scale: agg first (small frame), melt after — melting the raw
    table first would triple the shuffle volume for nothing."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", (F.col("ts_us") / _DAY_US).cast("long").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("sum_cents"),
        F.max("vc").alias("max_cents"),
    )
    return (
        daily.unpivot(
            ["event_type", "day"],
            ["n", "sum_cents", "max_cents"],
            "metric",
            "value_c",
        )
        .orderBy("event_type", "day", "metric")
    )


SQL_UNPIVOT_METRICS = f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // {_DAY_US} AS day,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         max(CAST(round(value * 100) AS BIGINT)) AS max_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, metric, value_c FROM (
  SELECT event_type, day, 'n' AS metric, n AS value_c FROM daily
  UNION ALL
  SELECT event_type, day, 'sum_cents', sum_cents FROM daily
  UNION ALL
  SELECT event_type, day, 'max_cents', max_cents FROM daily
)
ORDER BY 1, 2, 3"""


# --------------------------------------------------------------------------
# winsorization
# --------------------------------------------------------------------------

_WINS_LO_PCT = 5
_WINS_HI_PCT = 95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series winsorization report: exact rank-based p05/p95 cut
    values (element at rank ceil(p*n), 1-indexed — percentile_disc
    semantics, no interpolation), how many rows clip at each end, and
    the winsorized sum.

    Scale: one value-ranked window per series + one broadcast of the
    5 cut rows back onto the scan; the clamp itself is a map-side
    expression."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    k_lo = F.expr(f"(cnt * {_WINS_LO_PCT} + 99) DIV 100")
    k_hi = F.expr(f"(cnt * {_WINS_HI_PCT} + 99) DIV 100")
    cuts = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == k_lo, F.col("vc"))).alias("lo_c"),
        F.max(F.when(F.col("rn") == k_hi, F.col("vc"))).alias("hi_c"),
    )
    j = ev.join(F.broadcast(cuts), "event_type")
    clamped = F.greatest(F.least(F.col("vc"), F.col("hi_c")), F.col("lo_c"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lo_c").alias("lo_c"),
            F.max("hi_c").alias("hi_c"),
            F.sum((F.col("vc") < F.col("lo_c")).cast("long")).alias("n_clip_lo"),
            F.sum((F.col("vc") > F.col("hi_c")).cast("long")).alias("n_clip_hi"),
            F.sum(clamped).alias("wins_sum_c"),
        )
        .orderBy("event_type")
    )


SQL_WINSORIZE = f"""
WITH e AS (
  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM e
),
cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = (cnt * {_WINS_LO_PCT} + 99) // 100 THEN vc END) AS lo_c,
         max(CASE WHEN rn = (cnt * {_WINS_HI_PCT} + 99) // 100 THEN vc END) AS hi_c
  FROM r GROUP BY 1
)
SELECT e.event_type,
       count(*) AS n,
       max(lo_c) AS lo_c,
       max(hi_c) AS hi_c,
       CAST(sum(CAST(vc < lo_c AS BIGINT)) AS BIGINT) AS n_clip_lo,
       CAST(sum(CAST(vc > hi_c AS BIGINT)) AS BIGINT) AS n_clip_hi,
       CAST(sum(greatest(least(vc, hi_c), lo_c)) AS BIGINT) AS wins_sum_c
FROM e JOIN cuts ON e.event_type = cuts.event_type
GROUP BY 1 ORDER BY 1"""


# --------------------------------------------------------------------------
# blocked Levenshtein fuzzy join
# --------------------------------------------------------------------------

_FJ_PREFIX = 40
_FJ_BUCKET = 50
_FJ_MAXDIST = 14
_FJ_MAXBLOCK = 100


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document pairs by edit distance on the leading
    {_FJ_PREFIX} chars, found WITHOUT the all-pairs join: candidates
    are generated only within (lang, length-bucket) blocks. The
    blocking is a HEURISTIC, mirrored exactly by the oracle: pairs
    straddling a bucket boundary are not candidates (same trade as
    LSH banding), and length closeness is only a necessary condition
    for edit closeness within a bucket.

    Scale: per-block work is |block|^2, and with a length histogram
    concentrated around one size the block population grows linearly
    with the corpus — so, exactly like the MinHash hot-bucket guard
    (dedup.py max_df) and the triangle-count bucket cap, blocks over
    {_FJ_MAXBLOCK} docs are EXCLUDED (deterministic, mirrored in the
    oracle; measured unbounded: 14.5 s -> 124 s at 1x -> 3x replicas,
    a pure pair quadratic). Production precondition: exact-dedup
    upstream so a block is not one document repeated. The
    Levenshtein evaluation is JVM codegen, not a UDF."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / _FJ_BUCKET).cast("long").alias("b"),
        F.substring("text", 1, _FJ_PREFIX).alias("p"),
    )
    from pyspark.sql import Window

    docs = (
        docs.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("lang", "b"))
        )
        .filter(F.col("_bn") <= _FJ_MAXBLOCK)
        .drop("_bn")
    )
    x = docs.select(
        F.col("doc_id").alias("a"),
        "lang",
        "b",
        F.col("p").alias("pa"),
    )
    y = docs.select(
        F.col("doc_id").alias("bdoc"),
        F.col("lang").alias("lang2"),
        F.col("b").alias("b2"),
        F.col("p").alias("pb"),
    )
    # threshold form (Spark 3.5+): banded DP, O(prefix × maxdist) per
    # pair instead of O(prefix²), returning -1 past the bound — the
    # kept rows and their dist values are identical because the entry
    # only emits dist <= maxdist (measured 2x on the pair stage; the
    # block join is unchanged)
    pairs = x.join(
        y,
        (x["lang"] == y["lang2"]) & (x["b"] == y["b2"]) & (x["a"] < y["bdoc"]),
    ).withColumn("dist", F.levenshtein("pa", "pb", _FJ_MAXDIST))
    return (
        pairs.filter((F.col("dist") >= 0) & (F.col("dist") <= _FJ_MAXDIST))
        .select("a", F.col("bdoc").alias("b_doc"), "dist")
        .orderBy("a", "b_doc")
    )


SQL_FUZZY_JOIN = f"""
WITH d0 AS (
  SELECT doc_id, lang, n_chars // {_FJ_BUCKET} AS b,
         substr(text, 1, {_FJ_PREFIX}) AS p
  FROM documents
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY lang, b) AS _bn FROM d0
),
d AS (SELECT * FROM sized WHERE _bn <= {_FJ_MAXBLOCK})
SELECT x.doc_id AS a, y.doc_id AS b_doc, levenshtein(x.p, y.p) AS dist
FROM d x JOIN d y
  ON x.lang = y.lang AND x.b = y.b AND x.doc_id < y.doc_id
WHERE levenshtein(x.p, y.p) <= {_FJ_MAXDIST}
ORDER BY 1, 2"""


# --------------------------------------------------------------------------
# Markov transition counts
# --------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions: for each user's event stream
    in (ts, event_id) order, count (previous type -> type) moves; a
    session start transitions from '_start'. Probabilities are exact
    integer micros of the per-source-state total.

    Scale: one lag window per user partition + one hash agg; the
    25-state output is driver-tiny but the windows scale with
    users."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = ev.withColumn(
        "prev", F.coalesce(F.lag("event_type").over(w), F.lit("_start"))
    )
    counts = t.groupBy("prev", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("prev")
    return (
        counts.withColumn("state_total", F.sum("n").over(tot))
        .select(
            "prev",
            "event_type",
            "n",
            F.expr("(1000000 * n) DIV state_total").alias("p_micro"),
        )
        .orderBy("prev", "event_type")
    )


SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id),
                  '_start') AS prev,
         event_type
  FROM events
),
c AS (SELECT prev, event_type, count(*) AS n FROM t GROUP BY 1, 2)
SELECT prev, event_type, n,
       (1000000 * n) // CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS p_micro
FROM c
ORDER BY 1, 2"""


# --------------------------------------------------------------------------
# partial-aggregate merge (incremental rollup)
# --------------------------------------------------------------------------


def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rollups produced by MERGING daily partial aggregates —
    count/sum/min/max merge trivially, variance merges through the
    exact integer closed form (n*Sxx - Sx^2) / (n*(n-1)) because sums
    and sums-of-squares are algebraic. The oracle aggregates the RAW
    rows directly, so a green row proves partial-merge == direct —
    the property that lets a 100-TB pipeline maintain daily partials
    and serve any coarser grain without rescanning history.

    Scale: the daily partial is the only pass over the data; the
    weekly merge sees one row per (series, day)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.timestamp_micros(F.col("ts_us"))).alias("wk"),
        (F.col("ts_us") / _DAY_US).cast("long").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("vc").alias("ps"),
        F.sum(F.col("vc") * F.col("vc")).alias("pss"),
        F.min("vc").alias("pmin"),
        F.max("vc").alias("pmax"),
    )
    weekly = daily.groupBy(
        "event_type", F.unix_micros("wk").alias("week_us")
    ).agg(
        F.sum("pn").alias("n"),
        F.sum("ps").alias("sum_c"),
        F.sum("pss").alias("_ss"),
        F.min("pmin").alias("min_c"),
        F.max("pmax").alias("max_c"),
    )
    return weekly.select(
        "event_type",
        "week_us",
        "n",
        "sum_c",
        "min_c",
        "max_c",
        (F.col("sum_c") / F.col("n")).alias("mean_c"),
        (
            (F.col("n") * F.col("_ss") - F.col("sum_c") * F.col("sum_c"))
            / (F.col("n") * (F.col("n") - 1))
        ).alias("var_c"),
    ).orderBy("event_type", "week_us")


SQL_ROLLUP_MERGE = """
WITH e AS (
  SELECT event_type,
         epoch_us(date_trunc('week', ts)) AS week_us,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT event_type, week_us,
       count(*) AS n,
       CAST(sum(vc) AS BIGINT) AS sum_c,
       min(vc) AS min_c,
       max(vc) AS max_c,
       CAST(sum(vc) AS DOUBLE) / count(*) AS mean_c,
       CAST(count(*) * CAST(sum(vc * vc) AS BIGINT)
            - CAST(sum(vc) AS BIGINT) * CAST(sum(vc) AS BIGINT) AS DOUBLE)
         / (count(*) * (count(*) - 1)) AS var_c
FROM e
GROUP BY 1, 2
ORDER BY 1, 2"""


QUERIES20: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "unpivot_metrics": q_unpivot_metrics,
    "winsorize": q_winsorize,
    "fuzzy_join": q_fuzzy_join,
    "event_transitions": q_event_transitions,
    "rollup_merge": q_rollup_merge,
}

ORACLES20: dict[str, str] = {
    "unpivot_metrics": SQL_UNPIVOT_METRICS,
    "winsorize": SQL_WINSORIZE,
    "fuzzy_join": SQL_FUZZY_JOIN,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "rollup_merge": SQL_ROLLUP_MERGE,
}
