"""Catalog batch 34 (round 12): model- and tokenizer-QUALITY rollups —
the two acceptance reports a curation pipeline reads after training its
in-engine artifacts, both riding the session-stashed trainers so the
construction cost is paid once per session.

- ``quality_calibration``: the reliability diagram of the trained
  quality classifier (queries_r10) on its held-out slice — per
  predicted-probability decile: doc count, teacher-positive count, the
  summed quantized probability mass, observed positive rate, mean
  predicted probability, and the calibration gap. A classifier whose
  AUC gate passes (``quality_train_eval``) can still be badly
  mis-calibrated; a pipeline that thresholds on probability (keep docs
  with p > 0.9) reads THIS table before picking the threshold. The
  probability is quantized to integer micro units per doc BEFORE any
  aggregation (the trainer's own sigmoid discipline, queries_r10.py),
  so bucket membership and every sum are exact BIGINT ops; the only
  floats are three final divisions rounded 6dp in both dialects.

- ``tokenizer_fertility``: per-language fertility of the learned BPE
  tokenizer (queries_r5) — BPE tokens per word and characters per BPE
  token, the standard multilingual tokenizer-acceptance metric (a
  tokenizer trained on English-heavy data over-segments other
  languages; fertility per language is how that shows up). Rides the
  stashed ``_bpe_train_state`` vocabulary: the corpus is tokenized by
  ONE broadcast join of per-word symbol counts (the ``bpe_apply``
  inference shape), then rolled up per language instead of per doc.
  Ratios are exact integer micro units (a * 1_000_000 DIV b — integral
  division in both dialects, no float anywhere); exactness envelope:
  n_bpe_tokens * 1e6 must stay under 2^63, i.e. ~9.2e12 BPE tokens per
  language — past that, drop the micro scaling to 1e3 or report the
  raw integer pair (the components themselves are plain BIGINT sums).

- ``epoch_mix_plan``: epoch-capped token-budget allocation across
  sources with closed-form (non-iterative) waterfilling of the
  saturated sources' overflow — the mixture-recipe computation
  (LLaMA/DoReMi-style data recipes). Fully integer: see the entry
  docstring.

Reference scope: the reference pipeline (scripts/ufz_water_qc_pipeline.py)
has no tokenizer, classifier, or mixture stage — these entries are the
LLM-pipeline extension surface, completing the train -> apply -> eval
-> ACCEPT loop for the two trained-artifact families and the
recipe-planning step a corpus assembly runs before ``sequence_pack``.

100-TB shape, both entries: one corpus-sized explode feeding a
map-side-combinable hash agg, one broadcast join of O(1)-sized trained
state (64-row model / vocab symbol counts), then a rollup whose key
cardinality is tiny (10 bins / #languages). No windows, no
driver-side loops beyond the stashed construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.plans.queries_r10 import (
    _QT_ROUNDS,
    _bucket_counts,
    _doc_scores,
    _held_docs,
    _sql_bucket_cte,
    _sql_held_cte,
    _sql_score_cte,
    _sql_train_prefix,
    _train_traj,
)
from wq_data_pipeline_spark.plans.queries_r5 import (
    _BPT_ROUNDS,
    _sql_vocab_counts_cte,
    _vocab_token_counts,
)


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring. Held-out docs (the slice the trainer
    never saw — calibration on training data flatters the model,
    shared slice definition: ``_held_docs``) are scored with the
    final-round weights, the sigmoid is quantized to p_micro =
    round(1e6 / (1 + exp(-z/1e6))) per doc (BIGINT; the same
    micro-quantization discipline as the trainer's gradient, though a
    different double expression — the trainer rounds (p - y) * 1e6 —
    so the two are not claimed bit-identical at .5 boundaries), and
    docs land in decile bins by integer division. p_micro = 1_000_000
    (p rounding to exactly 1) would index bin 10, hence the
    least(9, ...) clamp on both sides.

    Output per bin: n_docs, n_pos (teacher label), sum_p_micro, and
    the three 6dp-rounded diagnostics — frac_pos (observed rate),
    mean_p (predicted rate), gap (frac_pos - mean_p; sums to ~0 times
    weights iff calibrated). Docs with no tokens score nothing and
    drop on both sides (explode/unnest agree)."""
    w_final = _train_traj(spark, sf_dir)[-1]
    held = _held_docs(spark, sf_dir)
    z = _doc_scores(_bucket_counts(held, ["y"]), w_final, ["y"])
    p_micro = (
        F.round(
            F.lit(1000000.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(F.col("z_micro").cast("double") / F.lit(1000000.0))
                )
            )
        )
        .cast("long")
        .alias("p_micro")
    )
    binned = z.select(
        "y",
        p_micro,
    ).select(
        "y",
        "p_micro",
        F.least(
            F.lit(9).cast("long"),
            F.expr("CAST(p_micro DIV 100000 AS BIGINT)"),
        ).alias("bin"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("p_micro").cast("long").alias("sum_p_micro"),
    )
    nd = F.col("n_docs").cast("double")
    frac_pos = F.round(F.col("n_pos").cast("double") / nd, 6)
    mean_p = F.round(
        F.col("sum_p_micro").cast("double") / (nd * F.lit(1000000.0)), 6
    )
    return agg.select(
        "bin",
        "n_docs",
        "n_pos",
        "sum_p_micro",
        frac_pos.alias("frac_pos"),
        mean_p.alias("mean_p"),
        F.round(frac_pos - mean_p, 6).alias("gap"),
    ).orderBy("bin")


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring. The stashed BPE vocabulary maps every
    corpus word to its trained symbol count; fertility per language is
    the shared ``_vocab_token_counts`` inference shape (the one
    ``bpe_apply`` uses, keyed on lang instead of doc_id) + a
    per-language rollup — the corpus never re-tokenizes per merge
    rule, and the rollup shuffles #languages rows.

    Output per lang: n_words, n_bpe_tokens, n_chars (whitespace-token
    characters, the denominator that ignores the whitespace the
    tokenizer never sees), and the two integral micro-ratios. Docs
    with no tokens contribute nothing; a NULL lang groups as its own
    row (both engines)."""
    agg = (
        _vocab_token_counts(spark, sf_dir, ["lang"])
        .groupBy("lang")
        .agg(
            F.sum("k").cast("long").alias("n_words"),
            F.sum(F.col("k") * F.col("n_sym")).cast("long").alias("n_bpe_tokens"),
            F.sum(F.col("k") * F.length("tok")).cast("long").alias("n_chars"),
        )
    )
    return agg.select(
        "lang",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        F.expr("CAST(n_bpe_tokens * 1000000 DIV n_words AS BIGINT)").alias(
            "bpe_per_word_micro"
        ),
        F.expr("CAST(n_chars * 1000000 DIV n_bpe_tokens AS BIGINT)").alias(
            "chars_per_bpe_micro"
        ),
    ).orderBy("lang")


# --- SQL mirrors ------------------------------------------------------------


def _sql_quality_calibration() -> str:
    """Training replay (the shared ``_sql_train_prefix`` chain — ONE
    definition of the trainer across the family) + held-out scoring +
    the identical micro-quantized binning."""
    return f"""{_sql_train_prefix()},
{_sql_held_cte("hl")},
{_sql_bucket_cte("hl", "y", "cf", "cx")},
{_sql_score_cte("cx", f"w{_QT_ROUNDS}", "cz", "y", "z_micro")},
pm AS (
  SELECT y,
         CAST(round(1000000.0 /
                    (1.0 + exp(-(CAST(z_micro AS DOUBLE) / 1000000.0))))
              AS BIGINT) AS p_micro
  FROM cz
),
bn AS (
  SELECT y, p_micro, least(9, p_micro // 100000) AS bin FROM pm
),
ag AS (
  SELECT bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(p_micro) AS BIGINT) AS sum_p_micro
  FROM bn GROUP BY bin
)
SELECT bin, n_docs, n_pos, sum_p_micro,
       round(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS frac_pos,
       round(CAST(sum_p_micro AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) * 1000000.0), 6) AS mean_p,
       round(round(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             - round(CAST(sum_p_micro AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * 1000000.0), 6), 6) AS gap
FROM ag ORDER BY bin"""


def _sql_tokenizer_fertility() -> str:
    """The shared ``_bpe_chain_sql`` trainer replay (vocab v{N} after
    the unrolled merge rounds) + the per-language rollup."""
    from wq_data_pipeline_spark.plans.queries_r5 import _bpe_chain_sql

    return f"""{_bpe_chain_sql()},
{_sql_vocab_counts_cte("lang", "lw")},
fa AS (
  SELECT lang,
         CAST(sum(k) AS BIGINT) AS n_words,
         CAST(sum(k * len(v.s)) AS BIGINT) AS n_bpe_tokens,
         CAST(sum(k * length(lw.tok)) AS BIGINT) AS n_chars
  FROM lw JOIN v{_BPT_ROUNDS} v ON lw.tok = v.tok
  GROUP BY lang
)
SELECT lang, n_words, n_bpe_tokens, n_chars,
       CAST(n_bpe_tokens * 1000000 // n_words AS BIGINT) AS bpe_per_word_micro,
       CAST(n_chars * 1000000 // n_bpe_tokens AS BIGINT) AS chars_per_bpe_micro
FROM fa ORDER BY lang"""


# --- epoch_mix_plan ---------------------------------------------------------

_EMP_MAX_EPOCHS = 3  # per-source repetition cap (the data-recipe knob)
_EMP_BUDGET_MULT = 2  # token budget = 2x the corpus (forces saturation)


def q_epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped token-budget allocation across sources — the
    mixture-recipe computation (LLaMA/DoReMi-style data recipes cap
    how many epochs any one source may repeat and redistribute the
    overflow): allocate a global budget B = {_EMP_BUDGET_MULT}x corpus
    tokens across sources proportionally to the shared target weights
    (``_src_weight_col``), capped at capacity c_i =
    {_EMP_MAX_EPOCHS} x n_tokens_i, with the overflow of saturated
    sources waterfalled onto the rest.

    The waterfill is CLOSED-FORM, not iterative: sorted ascending by
    capacity-per-weight, the saturated set is a prefix, and row i is
    saturated iff c_i * W_from_i <= (B - C_before_i) * w_i — one
    prefix-sum window over the per-source frame decides every row
    (the classic waterfilling prefix property). Every quantity is
    exact BIGINT: weights are small integers, the ratio sort key is
    c_i * (12 DIV w_i) (12 = lcm(1..4), so the division is exact),
    saturation is cross-multiplied, and unsaturated allocations floor
    via integral division (the undistributed remainder is < sum of
    unsaturated weights, reported implicitly by sum(alloc) < B). No
    float exists anywhere in the entry.

    Scale shape: ONE corpus scan -> per-source token-count agg
    (map-side combinable; no explode — F.size on the token array),
    localCheckpoint'ed because three downstream branches (budget
    total, saturated/unsaturated sums, final output) would each
    re-run the corpus scan from lineage; everything after runs on the
    #sources-row checkpointed frame, whose window sort is bounded by
    source cardinality, not corpus size (the source_mixture /
    hybrid_rrf precedent). Overflow envelope: B * max_w must stay
    under 2^63 — ~2.3e18 / 4 tokens, far past any real corpus."""
    from wq_data_pipeline_spark.operators.text import tokens
    from wq_data_pipeline_spark.plans.queries_r5 import _src_weight_col
    from wq_data_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    per = (
        d.groupBy("source")
        .agg(
            # coalesce: a source whose every text is NULL still gets a
            # row (the group comes from documents) — both engines must
            # report 0, not NULL
            F.coalesce(F.sum(F.size(tokens("text"))), F.lit(0))
            .cast("long")
            .alias("n_tokens")
        )
        .withColumn("w", _src_weight_col())
        .withColumn(
            "capacity",
            (F.lit(_EMP_MAX_EPOCHS) * F.col("n_tokens")).cast("long"),
        )
        .withColumn("r_key", F.expr("capacity * (12 DIV w)"))
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        (F.sum("n_tokens") * F.lit(_EMP_BUDGET_MULT)).cast("long").alias("b")
    )
    f = per.crossJoin(F.broadcast(tot))
    win = Window.orderBy("r_key", "source")
    c_before = F.coalesce(
        F.sum("capacity").over(
            win.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    w_from = F.sum("w").over(
        win.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    f = f.withColumn(
        "saturated",
        F.col("capacity") * w_from <= (F.col("b") - c_before) * F.col("w"),
    )
    sums = f.agg(
        F.coalesce(
            F.sum(F.when(F.col("saturated"), F.col("capacity"))), F.lit(0)
        )
        .cast("long")
        .alias("c_sat"),
        F.coalesce(
            F.sum(F.when(~F.col("saturated"), F.col("w"))), F.lit(0)
        )
        .cast("long")
        .alias("w_unsat"),
    )
    out = f.crossJoin(F.broadcast(sums)).withColumn(
        "alloc_tokens",
        F.when(F.col("saturated"), F.col("capacity")).otherwise(
            F.expr("(b - c_sat) * w DIV greatest(w_unsat, 1)")
        ),
    )
    return out.select(
        "source",
        "n_tokens",
        "w",
        "capacity",
        "saturated",
        "alloc_tokens",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE alloc_tokens * 1000000 DIV n_tokens END"
        ).alias("epochs_micro"),
    ).orderBy("source")


def _sql_epoch_mix_plan() -> str:
    from wq_data_pipeline_spark.plans.queries_r5 import _SQL_SRC_WEIGHT

    return f"""
WITH per AS (
  SELECT source,
         CAST(coalesce(sum(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), 0) AS BIGINT) AS n_tokens,
         {_SQL_SRC_WEIGHT} AS w
  FROM documents GROUP BY source
),
cap AS (
  SELECT source, n_tokens, w,
         CAST({_EMP_MAX_EPOCHS} * n_tokens AS BIGINT) AS capacity,
         CAST(({_EMP_MAX_EPOCHS} * n_tokens) * (12 // w) AS BIGINT) AS r_key
  FROM per
),
tot AS (SELECT CAST(sum(n_tokens) * {_EMP_BUDGET_MULT} AS BIGINT) AS b FROM cap),
sat AS (
  SELECT cap.*, tot.b,
         capacity * sum(w) OVER (ORDER BY r_key, source
                                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           <= (tot.b - COALESCE(sum(capacity) OVER (ORDER BY r_key, source
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) * w
           AS saturated
  FROM cap CROSS JOIN tot
),
sums AS (
  SELECT CAST(COALESCE(sum(CASE WHEN saturated THEN capacity END), 0) AS BIGINT) AS c_sat,
         CAST(COALESCE(sum(CASE WHEN NOT saturated THEN w END), 0) AS BIGINT) AS w_unsat
  FROM sat
)
SELECT source, n_tokens, w, capacity, saturated,
       CAST(CASE WHEN saturated THEN capacity
                 ELSE (b - c_sat) * w // greatest(w_unsat, 1) END AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN n_tokens = 0 THEN 0
                 ELSE (CASE WHEN saturated THEN capacity
                            ELSE (b - c_sat) * w // greatest(w_unsat, 1) END) * 1000000 // n_tokens
            END AS BIGINT) AS epochs_micro
FROM sat CROSS JOIN sums ORDER BY source"""


SQL_QUALITY_CALIBRATION = _sql_quality_calibration()
SQL_TOKENIZER_FERTILITY = _sql_tokenizer_fertility()
SQL_EPOCH_MIX_PLAN = _sql_epoch_mix_plan()


QUERIES34: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_calibration": q_quality_calibration,
    "tokenizer_fertility": q_tokenizer_fertility,
    "epoch_mix_plan": q_epoch_mix_plan,
}

ORACLES34: dict[str, str] = {
    "quality_calibration": SQL_QUALITY_CALIBRATION,
    "tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "epoch_mix_plan": SQL_EPOCH_MIX_PLAN,
}
