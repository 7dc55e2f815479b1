"""Corpus-assembly entries (r5): the selection/rebalancing layer that
sits between a filtered corpus and the training run, plus the
scale-correct trained-centroid SemDeDup composition.

* ``token_budget_fill`` — greedy budget fill: order documents by a
  quality priority (type-token ratio, integer-micro exact) and take
  them in order until a token budget (half the corpus here) is
  reached. This is the "assemble an N-token training mix" primitive;
  the cumulative sum runs through
  ``operators/scale.py:distributed_prefix_sum`` (range-partitioned
  two-level scan), NOT a single-partition global window, so the same
  plan holds when the corpus has 10^10 rows.
* ``domain_rebalance`` — per-source downsampling to a target mixture:
  each source gets a target weight, the implied per-source keep rate
  is ``min(1, target_share x N / n_s)``, and the per-document keep
  decision is a deterministic md5 bucket (reproducible on any engine,
  no RNG — the ``hash_split`` convention). The keep predicate is
  evaluated as a BIGINT cross-multiplication, so there is no float
  boundary for the oracle to flake on.

Scale shapes: token_budget_fill is one corpus scan -> prefix sum
(range repartition + per-partition window + an n_partitions-row
driver cumsum) -> broadcast of the 1-row total; domain_rebalance is
one tiny per-source agg broadcast back over the scan — no shuffle of
the corpus at all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wq_data_pipeline_spark.operators import text as TX
from wq_data_pipeline_spark.operators.scale import distributed_prefix_sum
from wq_data_pipeline_spark.plans.queries_ext import SQL_WORDS
from wq_data_pipeline_spark.sources.testdata import load_table

# --- token_budget_fill ------------------------------------------------------

# priority = type-token ratio in integer micro units: floor(1e6 *
# n_distinct / n_tokens). Integer floor-division is exact in DuckDB
# (//); Spark computes floor(double-division) of the same BIGINTs,
# which agrees because the true remainder is >= 1/n_tokens >> one ulp.
_TBF_SCALE = 1_000_000
# packed total-order key: (priority DESC, doc_id ASC) in one BIGINT —
# assumes doc_id < 2^33 and priority <= 1e6 (a ratio x 1e6)
_TBF_SHIFT = 1 << 33


def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill: take documents in (type-token-ratio
    DESC, doc_id ASC) order while the running token total stays
    within half the corpus tokens. One row per document with its
    inclusive cumulative position and the keep decision."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).withColumn(
        "ttr_micro",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(
                (F.col("n_distinct") * F.lit(_TBF_SCALE)).cast("double")
                / F.col("n_tokens").cast("double")
            ).cast("long")
        ),
    )
    keyed = base.withColumn(
        "_ok",
        (F.lit(_TBF_SCALE) - F.col("ttr_micro")) * F.lit(_TBF_SHIFT)
        + F.col("doc_id"),
    )
    cum = distributed_prefix_sum(
        keyed, value_col="n_tokens", order_col="_ok", out="_cum_before"
    )
    total = base.agg(F.sum("n_tokens").alias("_total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "ttr_micro",
            (F.col("_cum_before") + F.col("n_tokens")).alias("cum_tokens"),
            (
                F.col("_cum_before") + F.col("n_tokens")
                <= F.floor(F.col("_total") / 2).cast("long")
            ).alias("selected"),
        )
    )


SQL_TOKEN_BUDGET_FILL = f"""{SQL_WORDS},
t AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
  FROM w
),
k AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE (n_distinct * {_TBF_SCALE}) // n_tokens END AS ttr_micro
  FROM t
),
c AS (
  SELECT doc_id, n_tokens, ttr_micro,
         sum(n_tokens) OVER (ORDER BY ttr_micro DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         sum(n_tokens) OVER () AS total
  FROM k
)
SELECT doc_id, n_tokens, CAST(ttr_micro AS BIGINT) AS ttr_micro,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens <= total // 2 AS selected
FROM c"""


# --- domain_rebalance -------------------------------------------------------

# target mixture: weight 1 + (source index mod 4) — a deterministic
# skewed target so the per-source rates genuinely differ (sources in
# the test tables are src0..srcN with uniform counts)
_DR_BUCKETS = 1_000_000


def q_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a target per-source mixture: source
    s with target weight w_s gets keep rate min(1, w_s*N / (sum_w *
    n_s)); each doc keeps iff its md5 bucket falls under the rate.
    Keep predicate is exact BIGINT cross-multiplication:
    bucket * sum_w * n_s < w_s * N * 1e6."""
    d = load_table(spark, sf_dir, "documents")
    w_expr = (
        F.lit(1)
        + F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("long") % 4
    ).cast("long")
    per_src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_src"))
        .withColumn("w", w_expr)
    )
    totals = per_src.agg(
        F.sum("n_src").alias("n_total"), F.sum("w").alias("sum_w")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _DR_BUCKETS
    )
    return (
        d.select("doc_id", "source", bucket.alias("_bucket"))
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "source",
            F.col("w").alias("target_w"),
            F.col("n_src"),
            F.least(
                F.lit(_DR_BUCKETS).cast("long"),
                F.floor(
                    (F.col("w") * F.col("n_total") * F.lit(_DR_BUCKETS)).cast(
                        "double"
                    )
                    / (F.col("sum_w") * F.col("n_src")).cast("double")
                ).cast("long"),
            ).alias("rate_micro"),
            (
                F.col("_bucket") * F.col("sum_w") * F.col("n_src")
                < F.col("w") * F.col("n_total") * F.lit(_DR_BUCKETS)
            ).alias("keep"),
        )
    )


SQL_DOMAIN_REBALANCE = f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src,
         CAST(1 + CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4 AS BIGINT) AS w
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_src) AS n_total, sum(w) AS sum_w FROM s),
b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {_DR_BUCKETS} AS bucket
  FROM documents
)
SELECT b.doc_id, b.source, s.w AS target_w, s.n_src,
       least({_DR_BUCKETS}, (s.w * t.n_total * {_DR_BUCKETS}) // (t.sum_w * s.n_src)) AS rate_micro,
       b.bucket * t.sum_w * s.n_src < s.w * t.n_total * {_DR_BUCKETS} AS keep
FROM b JOIN s USING (source) CROSS JOIN t"""


QUERIES9: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_budget_fill": q_token_budget_fill,
    "domain_rebalance": q_domain_rebalance,
}

ORACLES9: dict[str, str] = {
    "token_budget_fill": SQL_TOKEN_BUDGET_FILL,
    "domain_rebalance": SQL_DOMAIN_REBALANCE,
}
