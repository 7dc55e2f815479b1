"""Catalog batch 26 (round 8): curation-analytics extensions over the
documents/events tables — per-document token entropy (a classic
quality-filter signal, e.g. Rae et al. 2021 Gopher §A1.2 use token
distribution heuristics), corpus-order n-gram novelty (the
duplication-pressure metric behind incremental-crawl dedup), the
cross-source near-duplicate matrix (which source pairs share content —
the curation view of MinHash dedup), and a double-exponential-smoothing
forecast backtest (Brown 1963) completing the seasonal-naive family.

Reference scope note: the reference pipeline (WalterHet/
wq_data_pipeline) has none of these; they extend the SURVEY.md §7
north-star surface (text analysis / dedup analytics / time-series).

Exactness discipline (the r1 oracle convention): every distributed
accumulation is integer (counts, per-term quantized BIGINTs, dyadic-
rational FIR weights); doubles appear only in per-row deterministic
expressions and one final division, rounded to 6 decimals in both
dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators import dedup as DD
from wq_data_pipeline_spark.operators.text import shingles_from_tokens, tokens
from wq_data_pipeline_spark.plans.queries_ext import (
    _MH_K,
    _MH_MAXDF,
    _MH_R,
    SQL_WORDS,
    _docs_parallel,
    _minhash_pairs_sql,
)
from wq_data_pipeline_spark.plans.queries_r6n import _events

# --------------------------------------------------------------------------
# token_entropy — per-document unigram Shannon entropy
# --------------------------------------------------------------------------


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution entropy: H = log2(n) -
    (sum_t c_t*log2(c_t)) / n over the doc's token counts, plus the
    normalized form H / log2(u) (u = distinct tokens; 0 when u = 1).
    Low-entropy docs are boilerplate/repetition candidates — the
    quality-filter companion to the Gopher repetition stats.

    Exactness: the only cross-engine-order-sensitive piece is the
    sum over distinct tokens, so each term is quantized FIRST
    (round(c*log2(c)*1e9) as BIGINT — deterministic per (c) in both
    engines) and the integer sum is order-free; H is then one fixed
    expression over exact ints, rounded to 6dp.

    Scale: explode -> two chained hash aggs, both map-side
    combinable; no joins, no windows."""
    d = _docs_parallel(spark, sf_dir)
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    term_q = F.round(F.col("c") * F.log2("c") * F.lit(1e9)).cast("long")
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(term_q).alias("_sq"),
    )
    ent = F.log2(F.col("n_tokens").cast("double")) - (
        F.col("_sq") / F.lit(1e9)
    ) / F.col("n_tokens")
    norm = F.when(
        F.col("n_unique") > 1,
        F.round(ent / F.log2(F.col("n_unique").cast("double")), 6),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        F.round(ent, 6).alias("entropy"),
        norm.alias("norm_entropy"),
    )


SQL_TOKEN_ENTROPY = f"""{SQL_WORDS},
cnt AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS t FROM w)
  GROUP BY doc_id, t
),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_unique,
         sum(CAST(round(c * log2(c) * 1e9) AS BIGINT)) AS sq
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_unique,
       round(log2(CAST(n_tokens AS DOUBLE)) - (sq / 1e9) / n_tokens, 6) AS entropy,
       CASE WHEN n_unique > 1
            THEN round((log2(CAST(n_tokens AS DOUBLE)) - (sq / 1e9) / n_tokens)
                       / log2(CAST(n_unique AS DOUBLE)), 6)
            ELSE 0.0 END AS norm_entropy
FROM agg"""


# --------------------------------------------------------------------------
# ngram_novelty — corpus-order first-occurrence novelty per document
# --------------------------------------------------------------------------

_NOV_N = 8  # same gram width as the exact-substring dup-span family


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order {_NOV_N}-gram novelty: for each document, the
    fraction of its DISTINCT word 8-grams whose first corpus
    occurrence (min doc_id) is this document — the duplication-
    pressure metric an incremental crawl watches (novelty trending
    to 0 means the crawl is re-reading known content). Docs shorter
    than 8 tokens carry no grams and are not emitted (both engines).

    Exactness: counts and one final division of exact integers,
    rounded 6dp. Scale: one explode of per-doc DISTINCT grams ->
    gram min-agg (map-side combinable) -> skinny equi-join back ->
    per-doc agg. Linear; the gram join shuffles (gram, doc) ids
    only, never text."""
    d = _docs_parallel(spark, sf_dir)
    # token array materialized first (one tokenize per doc, r12)
    grams = d.select("doc_id", tokens("text").alias("_toks")).select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("_toks"), _NOV_N))
        ).alias("g"),
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("_first_doc"))
    return (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_seen_earlier"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_seen_earlier",
            F.round(
                F.lit(1.0)
                - F.col("n_seen_earlier").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


_NOV_GRAM_SQL = (
    "list_distinct(CASE WHEN len(toks) >= 8 THEN "
    "list_transform(generate_series(1, len(toks) - 7), i -> "
    + " || ' ' || ".join(f"toks[i + {j}]" for j in range(8)).replace(
        "toks[i + 0]", "toks[i]"
    )
    + ") ELSE [] END)"
)

SQL_NGRAM_NOVELTY = f"""{SQL_WORDS},
g AS (SELECT doc_id, unnest({_NOV_GRAM_SQL}) AS g FROM w),
fst AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
SELECT g.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN fst.first_doc < g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_earlier,
       round(1.0 - CAST(sum(CASE WHEN fst.first_doc < g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM g JOIN fst USING (g)
GROUP BY g.doc_id"""


# --------------------------------------------------------------------------
# dup_source_matrix — which source pairs share near-duplicate content
# --------------------------------------------------------------------------

_DSM_TAU = 0.5  # exact-Jaccard verification threshold


def q_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate matrix: MinHash-LSH candidate
    pairs (the minhash_lsh_pairs machinery, k=32, 4 rows/band),
    verified with exact word-set Jaccard >= {_DSM_TAU}, rolled up to
    unordered (source_a <= source_b) pair counts — the curation view
    that tells you WHICH feeds are mirroring each other before you
    spend dedup budget. max_jaccard (order-free max of exact
    rational divisions) is the per-cell severity.

    Scale: rides the banded single-self-join LSH shape; the rollup
    adds one broadcast-size join to the doc->source projection and a
    tiny (sources^2) agg."""
    d = _docs_parallel(spark, sf_dir)
    cand = DD.minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=_MH_K, rows_per_band=_MH_R, max_df=_MH_MAXDF
    )
    ver = DD.jaccard_pairs(d, cand, "text", "doc_id").filter(
        F.col("jaccard") >= _DSM_TAU
    )
    src = d.select("doc_id", "source")
    j = (
        ver.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")), "id_b")
    )
    return (
        j.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SQL_DUP_SOURCE_MATRIX = f"""{SQL_WORDS},
{_minhash_pairs_sql(_MH_K, _MH_R)},
ws AS (SELECT doc_id, source, list_distinct(toks) AS ws FROM w),
ver AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE) AS jaccard
  FROM pairs JOIN ws a ON pairs.id_a = a.doc_id JOIN ws b ON pairs.id_b = b.doc_id
)
SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       count(*) AS n_pairs, round(max(jaccard), 6) AS max_jaccard
FROM ver WHERE jaccard >= {_DSM_TAU}
GROUP BY 1, 2 ORDER BY 1, 2"""


# --------------------------------------------------------------------------
# des_forecast_mae — Brown double-exponential-smoothing backtest
# --------------------------------------------------------------------------

_DES_TAPS = 8  # per-EWMA FIR taps; composed kernel spans 2*T-1 lags


def _des_coeffs() -> tuple[list[float], list[float]]:
    """FIR weights for the truncated S1 and composed S2 kernels,
    alpha = 1/2: w1_j = 0.5^j (j < T); w2_m = cnt(m) * 0.5^m with
    cnt(m) = #{(j,k): j+k=m, j,k < T} = min(m, 2T-2-m) + 1. All
    exact dyadic-rational doubles — identical literals in both
    dialects."""
    t = _DES_TAPS
    w1 = [0.5**j for j in range(t)]
    w2 = [(min(m, 2 * t - 2 - m) + 1) * 0.5**m for m in range(2 * t - 1)]
    return w1, w2


def q_des_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of Brown's double exponential
    smoothing (alpha=1/2) per event-type series: forecast_(t+1) =
    2*S1 + (S1 - S2) = 3*S1 - 2*S2 where S1/S2 are the first/second
    smoothings — the trend-aware upgrade of seasonal_naive_mae's
    level-only forecaster.

    The recursive smoothings are truncated to FIR kernels (the
    q_ewma_series convention): S1 = (sum_j 0.5^j x_(t-j)) / 2 and
    S2 = (sum_m cnt(m) 0.5^m x_(t-m)) / 4 with the infinite-kernel
    masses 2 and 4 as fixed divisors, so every product is an exact
    dyadic scaling of the centi-quantized values and the forecast is
    bit-deterministic. Rows without full kernel history (first 2T-2
    per series) and rows without a next observation are excluded in
    both engines. Per-row |err| and err are quantized to micro-units
    BEFORE the distributed sum (order-free BIGINT), one final
    division each, rounded 6dp.

    Scale: ONE window sort per series carries all 2T-1 lags, the
    row_number, and the lead; then a map-side-combinable agg."""
    w1, w2 = _des_coeffs()
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    ev = _events(spark, sf_dir)
    num1 = F.col("vc") * F.lit(w1[0])
    for j in range(1, len(w1)):
        num1 = num1 + F.lag("vc", j).over(w) * F.lit(w1[j])
    num2 = F.col("vc") * F.lit(w2[0])
    for m in range(1, len(w2)):
        num2 = num2 + F.lag("vc", m).over(w) * F.lit(w2[m])
    fc = F.lit(1.5) * num1 - F.lit(0.5) * num2
    d = ev.select(
        "event_type",
        F.row_number().over(w).alias("_rn"),
        F.lead("vc", 1).over(w).alias("_nxt"),
        fc.alias("_fc"),
    ).filter((F.col("_rn") > 2 * _DES_TAPS - 2) & F.col("_nxt").isNotNull())
    err = F.col("_nxt") - F.col("_fc")
    return (
        d.select(
            "event_type",
            F.round(F.abs(err) * F.lit(1e6)).cast("long").alias("_ae"),
            F.round(err * F.lit(1e6)).cast("long").alias("_se"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("_ae").alias("_sae"),
            F.sum("_se").alias("_sbias"),
        )
        .select(
            "event_type",
            "n_points",
            F.round(F.col("_sae") / F.lit(1e6) / F.col("n_points"), 6).alias("mae_c"),
            F.round(F.col("_sbias") / F.lit(1e6) / F.col("n_points"), 6).alias(
                "bias_c"
            ),
        )
        .orderBy("event_type")
    )


def _des_sql() -> str:
    w1, w2 = _des_coeffs()
    n1 = " + ".join(
        ("vc" if j == 0 else f"lag(vc, {j}) OVER w * {w1[j]!r}")
        for j in range(len(w1))
    )
    n2 = " + ".join(
        (f"vc * {w2[0]!r}" if m == 0 else f"lag(vc, {m}) OVER w * {w2[m]!r}")
        for m in range(len(w2))
    )
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
d AS (
  SELECT event_type,
         row_number() OVER w AS rn,
         lead(vc, 1) OVER w AS nxt,
         1.5 * ({n1}) - 0.5 * ({n2}) AS fc
  FROM ev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
),
e AS (
  SELECT event_type,
         CAST(round(abs(nxt - fc) * 1e6) AS BIGINT) AS ae,
         CAST(round((nxt - fc) * 1e6) AS BIGINT) AS se
  FROM d WHERE rn > {2 * _DES_TAPS - 2} AND nxt IS NOT NULL
)
SELECT event_type, count(*) AS n_points,
       round(sum(ae) / 1e6 / count(*), 6) AS mae_c,
       round(sum(se) / 1e6 / count(*), 6) AS bias_c
FROM e GROUP BY event_type ORDER BY event_type"""


SQL_DES_FORECAST_MAE = _des_sql()


QUERIES26: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_entropy": q_token_entropy,
    "ngram_novelty": q_ngram_novelty,
    "dup_source_matrix": q_dup_source_matrix,
    "des_forecast_mae": q_des_forecast_mae,
}

ORACLES26: dict[str, str] = {
    "token_entropy": SQL_TOKEN_ENTROPY,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "dup_source_matrix": SQL_DUP_SOURCE_MATRIX,
    "des_forecast_mae": SQL_DES_FORECAST_MAE,
}


# --------------------------------------------------------------------------
# benford_digits — first-significant-digit profile vs Benford's law
# --------------------------------------------------------------------------

import math as _math

_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of |value| per series vs
    Benford's law — the fraud/sensor-tamper screen sibling of the
    reference's decimal-uniformity chi-square
    (/root/reference/scripts/ufz_water_qc_pipeline.py:239-248 bins
    fractional parts; this bins leading digits).

    Exactness: the leading digit is taken from the INTEGER
    centi-quantized magnitude (round(|v|*100) as BIGINT — scaling by
    10^k never changes the leading significant digit), via
    integer-to-string substr, so no float log10 edge cases at decade
    boundaries; shares are one division of exact counts, rounded 6dp;
    the Benford expectation is the same Python-computed literal in
    both dialects. Per-digit rows avoid any order-sensitive sum.

    Scale: one scan -> one (series, digit) hash agg -> per-series
    total via a 9-rows-per-series window; no joins."""
    ev = _events(spark, sf_dir)
    vc = F.abs(F.col("vc"))
    d = (
        ev.filter(vc > 0)
        .select(
            "event_type",
            F.substring(vc.cast("string"), 1, 1).cast("int").alias("digit"),
        )
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w = Window.partitionBy("event_type")
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_P.items() for x in kv]
        ),
        F.col("digit"),
    )
    # the displayed share is a Python-rounded LITERAL in both dialects
    # (DuckDB constant-folds round(literal, 6) to DECIMAL, which the
    # type-strict value compare rejects); dev keeps the full-precision
    # expectation inside its own rounded expression
    shown = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for dd, p in _BENFORD_P.items()
                for x in (dd, round(p, 6))
            ]
        ),
        F.col("digit"),
    )
    obs_share = F.col("n_obs").cast("double") / F.sum("n_obs").over(w).cast(
        "double"
    )
    return d.select(
        "event_type",
        "digit",
        "n_obs",
        F.round(obs_share, 6).alias("obs_share"),
        shown.alias("benford_share"),
        F.round(obs_share - expected, 6).alias("dev"),
    ).orderBy("event_type", "digit")


def _benford_sql() -> str:
    exp_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
    ) + " END"
    # CAST per branch: DuckDB parses bare decimal literals as
    # DECIMAL(7,6), which the type-strict value compare rejects
    shown_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({round(p, 6)!r} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    ) + " END"
    return f"""
WITH ev AS (
  SELECT event_type, abs(CAST(round(value * 100) AS BIGINT)) AS vc FROM events
),
d AS (
  SELECT event_type,
         CAST(substr(CAST(vc AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM ev WHERE vc > 0 GROUP BY 1, 2
)
SELECT event_type, digit, n_obs,
       round(CAST(n_obs AS DOUBLE)
             / CAST(sum(n_obs) OVER (PARTITION BY event_type) AS DOUBLE), 6)
         AS obs_share,
       {shown_case} AS benford_share,
       round(CAST(n_obs AS DOUBLE)
             / CAST(sum(n_obs) OVER (PARTITION BY event_type) AS DOUBLE)
             - {exp_case}, 6) AS dev
FROM d ORDER BY event_type, digit"""


SQL_BENFORD_DIGITS = _benford_sql()

QUERIES26["benford_digits"] = q_benford_digits
ORACLES26["benford_digits"] = SQL_BENFORD_DIGITS


# --------------------------------------------------------------------------
# theil_sen_trend — Theil–Sen slope + Mann–Kendall trend test
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series monotone-trend analysis on the daily aggregates:
    the Theil–Sen slope (median of all pairwise day-to-day slopes —
    Theil 1950 / Sen 1968) and the Mann–Kendall S statistic with its
    tie-corrected normal approximation z (Mann 1945 / Kendall 1975)
    — the standard robust trend pair in environmental / water-quality
    series analysis, i.e. the trend-question companion to the
    reference's WRTDS anomaly finder
    (/root/reference/scripts/ufz_water_qc_pipeline.py:606-621).

    Exactness: daily values are exact centi-unit BIGINT sums; each
    pairwise slope is ONE division of two BIGINT diffs (deterministic
    per pair); the Sen slope is a median selection rounded to 6dp in
    BOTH dialects (ADVICE r8: the even-count midpoint interpolation
    is engine-internal, so the raw double is not pinned bit-for-bit);
    S is an integer sum of signs; var(S) and z come from exact
    integer counts and tie-group sizes, z rounded 6dp.

    Scale: the pair set is quadratic in DAYS PER SERIES, not rows —
    bounded by (span_days choose 2) per key (a decade-long daily
    series is ~6.6M pairs, one task's work); the self-join is
    per-series co-partitioned and the day table it joins is already
    aggregated. Ties and S ride the same daily table."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", (F.col("ts_us") / _DAY_US).cast("long").alias("d")
    ).agg(F.sum("vc").alias("v"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("v").alias("va"))
    b = daily.select("event_type", F.col("d").alias("db"), F.col("v").alias("vb"))
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db"))
    slope = (F.col("vb") - F.col("va")).cast("double") / (
        F.col("db") - F.col("da")
    ).cast("double")
    p = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.median(slope), 6).alias("sen_slope_c"),
        F.sum(F.signum(F.col("vb") - F.col("va")).cast("long")).alias("mk_s"),
    )
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.lit(1) * F.col("_t")).alias("n_days"),
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie_term"),
        )
    )
    j = p.join(ties, "event_type")
    n = F.col("n_days")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("_tie_term")).cast("double")
        / F.lit(18.0)
    )
    s = F.col("mk_s")
    z = F.when(var_s <= 0, F.lit(0.0)).otherwise(
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var_s))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        "n_days",
        "n_pairs",
        "sen_slope_c",
        "mk_s",
        F.round(z, 6).alias("mk_z"),
    ).orderBy("event_type")


SQL_THEIL_SEN_TREND = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         count(*) AS n_pairs,
         round(median(CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)), 6)
           AS sen_slope_c,
         CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS mk_s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
  GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(sum(t) AS BIGINT) AS n_days,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, v, count(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT p.event_type, n_days, n_pairs, sen_slope_c, mk_s,
       round(CASE
         WHEN (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term) <= 0 THEN 0.0
         WHEN mk_s > 0 THEN CAST(mk_s - 1 AS DOUBLE)
              / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE) / 18.0)
         WHEN mk_s < 0 THEN CAST(mk_s + 1 AS DOUBLE)
              / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE) / 18.0)
         ELSE 0.0 END, 6) AS mk_z
FROM p JOIN ties USING (event_type)
ORDER BY p.event_type"""

QUERIES26["theil_sen_trend"] = q_theil_sen_trend
ORACLES26["theil_sen_trend"] = SQL_THEIL_SEN_TREND
