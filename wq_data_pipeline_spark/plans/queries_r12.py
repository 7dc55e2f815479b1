"""Catalog batch 33 (round 12): model-based language identification
trained in-engine — the VERDICT r11 #4 depth item.

``predict_lang`` (operators/text.py:103) is a 5-class marker-word
heuristic: it only sees a handful of hand-picked stopwords per
language and a CJK codepoint class (reference parity for a quick
filter: scripts/ufz_water_qc_pipeline.py has no lang-id at all — this
family is the LLM-pipeline extension surface). Real curation pipelines
(CCNet, C4, fastText lang-id) train a linear model over character
n-gram features instead. This batch is that trainer, built on the
round-10 generic-trainer discipline so the whole optimization is
oracle-replayable:

- ``lang_id_train``: K one-vs-rest logistic models (one per distinct
  training language) over hashed character TRIGRAMS of the first
  {_LI_SNIP} chars of each document, trained jointly in one
  distributed loop — 3 rounds of full-batch GD, all state in
  DataFrames keyed (lang, bucket). Output: the full weight
  trajectory, (lang, b, w_micro_r1..r3).
- ``lang_id_apply``: the trained final-round weights score the WHOLE
  corpus (held-out docs included) and predict argmax-logit language;
  output is the (true lang, predicted lang) confusion matrix — a
  green row pins training AND multi-class inference end to end.

Integer discipline (identical to quality_train, queries_r10.py):
logits are exact BIGINT dots of counts x micro-weights; the sigmoid is
quantized per (doc, class) BEFORE summation (round((p - y) * 1e6)),
so gradients are order-free BIGINT sums and each update is one
deterministic double op on exact integers. The only nondeterminism a
multi-class head could add — argmax ties — is closed by the (z DESC,
lang ASC) tiebreak in both dialects.

100-TB shape: the feature table is built once, checkpointed, and only
joined; the model (K x {_LI_B} rows, K = #languages) is BROADCAST to
every join — per round that is two map-side-combinable shuffles (by
doc for logits, by (lang, bucket) for gradients), never a
driver-collected weight vector. Lang-id reads a fixed-length SNIPPET
(the fastText deployment shape): feature cost is O(docs), not
O(corpus chars), and substring(text, 1, k) never pays Spark's
char-offset scan (start position 1). The trainer trajectory is
session-stashed (operators/stash.py) so train/apply share one build.

The held-out-accuracy capability pin (trained model beats the
marker-word heuristic on a mixed multilingual fixture whose text
carries real trigram signal but no marker words) lives in
tests/test_round12_entries.py — the synthetic documents table's
``lang`` column is uncorrelated with its token-soup text, so on
testdata both predictors are at chance and the oracle pins
determinism, not accuracy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators.text import gram_hash

_LI_B = 128  # hashed trigram buckets per class (model size — O(1))
_LI_SNIP = 160  # chars of text the featurizer reads (fastText shape)
_LI_ROUNDS = 3  # fixed full-batch GD rounds (the oracle replays each)
_LI_LR = 0.1
_LI_HOLD_MOD = 5  # doc_id % 5 == 4 held out (the quality_train split)
_LI_HOLD_RES = 4


def _li_snippet(text: F.Column) -> F.Column:
    """lower() of the first _LI_SNIP chars — start position 1, so the
    substring never pays the char-offset byte scan."""
    return F.lower(F.substring(text, 1, _LI_SNIP))


def _li_features(d: DataFrame, extra_cols: list[str]) -> DataFrame:
    """(doc_id, *extra, b, cnt): hashed-trigram bucket counts of the
    snippet. Trigrams come from sequence+transform (no per-char
    explode of raw text — the array explodes post-build, bounded at
    _LI_SNIP - 2 rows/doc). Docs with < 3 snippet chars drop
    (explode of the empty array), matching the oracle's unnest."""
    sn = _li_snippet(F.col("text"))
    m = F.length(sn)
    tris = F.when(
        m >= 3,
        F.transform(
            F.sequence(F.lit(1), m - 2),
            lambda i: sn.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", *extra_cols, F.explode(tris).alias("g"))
        .select(
            "doc_id",
            *extra_cols,
            F.pmod(gram_hash(F.col("g")), F.lit(_LI_B)).alias("b"),
        )
        .groupBy("doc_id", *extra_cols, "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _li_traj(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Session-stashed trainer trajectory: _LI_ROUNDS checkpointed
    (lang, b, w) frames. Params carry every non-input degree of
    freedom (buckets, snippet, rounds, lr, split) so the stash can
    never serve a differently-configured model."""
    from wq_data_pipeline_spark.operators.stash import session_stash

    return session_stash(
        spark,
        sf_dir,
        "documents",
        (
            "langid-traj",
            _LI_B,
            _LI_SNIP,
            _LI_ROUNDS,
            _LI_LR,
            _LI_HOLD_MOD,
            _LI_HOLD_RES,
        ),
        lambda: _li_traj_build(spark, sf_dir),
    )


def _li_traj_build(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    tr = _docs_parallel(spark, sf_dir).filter(
        ((F.col("doc_id") % _LI_HOLD_MOD) != _LI_HOLD_RES)
        & F.col("lang").isNotNull()
        & F.col("text").isNotNull()
    )
    # x carries the true label through the feature table (the binary
    # trainer's extra_cols=['y'] trick, lifted to the class string)
    x = _li_features(tr, ["lang"]).localCheckpoint()
    classes = (
        tr.select(F.col("lang").alias("cand")).distinct().localCheckpoint()
    )
    n_train = int(x.agg(F.countDistinct("doc_id").alias("n")).first()["n"])
    w = classes.crossJoin(
        spark.range(_LI_B).select(F.col("id").cast("long").alias("b"))
    ).select("cand", "b", F.lit(0).cast("long").alias("w"))
    if n_train == 0:  # no featurizable docs: weights stay at zero init
        w = w.localCheckpoint()
        return [w] * _LI_ROUNDS

    traj = []
    for _ in range(_LI_ROUNDS):
        # one-vs-rest logits for EVERY (doc, class) in one broadcast
        # join: the K x _LI_B model fans each (doc, b) row out to K
        # candidates, then the per-(doc, cand) sum is map-side
        # combinable
        z = (
            x.join(F.broadcast(w), "b")
            .groupBy("doc_id", "lang", "cand")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("z_micro"))
        )
        p = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(-(F.col("z_micro").cast("double") / F.lit(1000000.0)))
        )
        y = (F.col("lang") == F.col("cand")).cast("int")
        e = z.select(
            "doc_id",
            "cand",
            F.round((p - y.cast("double")) * F.lit(1000000.0))
            .cast("long")
            .alias("e"),
        )
        g = (
            x.join(e, "doc_id")
            .groupBy("cand", "b")
            .agg(F.sum(F.col("cnt") * F.col("e")).alias("g"))
        )
        w = (
            w.join(g, ["cand", "b"], "left")
            .select(
                "cand",
                "b",
                (
                    F.col("w")
                    - F.round(
                        F.lit(_LI_LR)
                        * F.coalesce(F.col("g"), F.lit(0))
                        / F.lit(n_train)
                    ).cast("long")
                ).alias("w"),
            )
            .localCheckpoint()
        )
        traj.append(w)
    return traj


def q_lang_id_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring — trajectory output (lang, b,
    w_micro_r1..r{_LI_ROUNDS}), one row per (class, bucket), pinning
    every round of the joint one-vs-rest optimization."""
    traj = _li_traj(spark, sf_dir)
    out = traj[0].select(
        F.col("cand").alias("lang"), "b", F.col("w").alias("w_micro_r1")
    )
    for r in range(2, _LI_ROUNDS + 1):
        # (n_langs × n_buckets)-row weight frames, RDD-backed (no
        # stats) — pin the broadcast instead of the planner's
        # sort-merge fallback (guide §3.1; size is a config constant)
        out = out.join(
            F.broadcast(
                traj[r - 1].select(
                    F.col("cand").alias("lang"),
                    "b",
                    F.col("w").alias(f"w_micro_r{r}"),
                )
            ),
            ["lang", "b"],
        )
    return out.orderBy("lang", "b")


def q_lang_id_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> INFER: the final-round model scores the whole corpus
    (held-out docs included) and predicts argmax-logit language with
    the (z DESC, lang ASC) tiebreak; output is the confusion matrix
    (lang, pred_lang, n_docs). Docs with no trigram features score
    nothing and are excluded on both sides (explode and unnest
    agree); inference is one snippet featurization + a broadcast of
    the K x 128 model + one per-doc rank window."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    w_final = _li_traj(spark, sf_dir)[-1]
    d = _docs_parallel(spark, sf_dir).filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    z = (
        _li_features(d, ["lang"])
        .join(F.broadcast(w_final), "b")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("z_micro"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("z_micro").desc(), F.col("cand").asc()
        )
    )
    return (
        z.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .groupBy("lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def q_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> apply -> EVAL, closing the lang-id loop (the
    quality_train_eval pairing for the multi-class family): per-class
    precision / recall / F1 of the trained model on the held-out
    slice (doc_id % 5 == 4) against the documents.lang labels — the
    acceptance gate before swapping a trained identifier in for the
    marker heuristic.

    One pass: held docs featurize + broadcast-score + argmax window
    into a <= K x K confusion frame, checkpointed ONCE (three metric
    aggregates would otherwise re-run the corpus featurization), then
    per-class rollups left-joined onto the trained class list so
    classes absent from the held slice still report. F1 uses the
    2*tp/(n_pred + n_true) identity — algebraically 2PR/(P+R) — so
    the only float is one final division, rounded 6dp in both
    dialects."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    w_final = _li_traj(spark, sf_dir)[-1]
    held = _docs_parallel(spark, sf_dir).filter(
        ((F.col("doc_id") % _LI_HOLD_MOD) == _LI_HOLD_RES)
        & F.col("lang").isNotNull()
        & F.col("text").isNotNull()
    )
    z = (
        _li_features(held, ["lang"])
        .join(F.broadcast(w_final), "b")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("z_micro"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("z_micro").desc(), F.col("cand").asc()
        )
    )
    conf = (
        z.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .groupBy(F.col("lang").alias("t"), F.col("cand").alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    classes = w_final.select(F.col("cand").alias("lang")).distinct()
    n_true = conf.groupBy(F.col("t").alias("lang")).agg(
        F.sum("n").alias("n_true")
    )
    n_pred = conf.groupBy(F.col("p").alias("lang")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = conf.filter(F.col("t") == F.col("p")).select(
        F.col("t").alias("lang"), F.col("n").alias("tp")
    )
    j = (
        classes.join(n_true, "lang", "left")
        .join(n_pred, "lang", "left")
        .join(tp, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") == 0, F.lit(None).cast("double")
    ).otherwise(
        F.round(F.col("tp").cast("double") / F.col("n_pred"), 6)
    )
    rec = F.when(
        F.col("n_true") == 0, F.lit(None).cast("double")
    ).otherwise(
        F.round(F.col("tp").cast("double") / F.col("n_true"), 6)
    )
    f1 = F.when(
        (F.col("n_pred") + F.col("n_true")) == 0,
        F.lit(None).cast("double"),
    ).otherwise(
        F.round(
            F.lit(2.0)
            * F.col("tp").cast("double")
            / (F.col("n_pred") + F.col("n_true")),
            6,
        )
    )
    return j.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        prec.alias("prec"),
        rec.alias("rec"),
        f1.alias("f1"),
    ).orderBy("lang")


# --- SQL mirrors ------------------------------------------------------------

# ONE definition of the featurizer per source CTE, interpolated by
# both oracles (the queries_r10 _sql_bucket_cte pattern): snippet ->
# per-offset trigram -> md5-derived bucket -> (doc, *extra, b) counts.
def _sql_li_features(src: str, extra: str, p_n: str, x_n: str) -> str:
    ex = f"{extra}, " if extra else ""
    return (
        f"{p_n} AS (\n"
        f"  SELECT doc_id, {ex}sn,"
        " unnest(range(1, greatest(length(sn) - 1, 1))) AS i\n"
        f"  FROM (SELECT doc_id, {ex}lower(substr(text, 1, {_LI_SNIP})) AS sn"
        f" FROM {src})\n"
        f"),\n"
        f"{x_n} AS (\n"
        f"  SELECT doc_id, {ex}"
        f"('0x' || substr(md5(substr(sn, i, 3)), 1, 15))::BIGINT % {_LI_B} AS b,\n"
        f"         CAST(count(*) AS BIGINT) AS cnt\n"
        f"  FROM {p_n} GROUP BY ALL\n"
        f")"
    )


def _sql_li_train_prefix() -> str:
    """WITH chain: training docs -> features -> classes -> w0 ->
    _LI_ROUNDS unrolled GD rounds. CAST(lr AS DOUBLE) and
    greatest(n, 1) carry the r10/r11 lessons (DECIMAL literals;
    zero-trainable-docs NULL division)."""
    rounds = []
    prev = "w0"
    for r in range(1, _LI_ROUNDS + 1):
        rounds.append(
            f"""z{r} AS (
  SELECT x.doc_id, x.lang, w.cand, sum(x.cnt * w.w) AS z_micro
  FROM x JOIN {prev} w USING (b) GROUP BY ALL
),
e{r} AS (
  SELECT doc_id, cand,
         CAST(round((1.0 / (1.0 + exp(-(CAST(z_micro AS DOUBLE) / 1000000.0)))
                     - CASE WHEN lang = cand THEN 1.0 ELSE 0.0 END)
                    * 1000000.0) AS BIGINT) AS e
  FROM z{r}
),
g{r} AS (
  SELECT e.cand, x.b, sum(x.cnt * e.e) AS g
  FROM x JOIN e{r} e USING (doc_id) GROUP BY ALL
),
w{r} AS (
  SELECT w.cand, w.b,
         CAST(w.w - CAST(round(CAST({_LI_LR} AS DOUBLE) * COALESCE(g.g, 0)
                               / greatest(n.n, 1)) AS BIGINT) AS BIGINT) AS w
  FROM {prev} w LEFT JOIN g{r} g USING (cand, b) CROSS JOIN n
)"""
        )
        prev = f"w{r}"
    return f"""
WITH tr AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_LI_HOLD_MOD} <> {_LI_HOLD_RES}
    AND lang IS NOT NULL AND text IS NOT NULL
),
{_sql_li_features("tr", "lang", "p", "x")},
cls AS (SELECT DISTINCT lang AS cand FROM tr),
n AS (SELECT count(DISTINCT doc_id) AS n FROM x),
w0 AS (
  SELECT cand, unnest(generate_series(0, {_LI_B - 1})) AS b,
         CAST(0 AS BIGINT) AS w
  FROM cls
),
{",".join(rounds)}"""


def _sql_lang_id_train() -> str:
    sel = ", ".join(
        f"w{r}.w AS w_micro_r{r}" for r in range(1, _LI_ROUNDS + 1)
    )
    joins = " ".join(
        f"JOIN w{r} USING (cand, b)" for r in range(2, _LI_ROUNDS + 1)
    )
    return f"""{_sql_li_train_prefix()}
SELECT w1.cand AS lang, w1.b, {sel}
FROM w1 {joins} ORDER BY lang, b"""


def _sql_lang_id_apply() -> str:
    return f"""{_sql_li_train_prefix()},
af AS (
  SELECT doc_id, lang, text FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
),
{_sql_li_features("af", "lang", "ap", "ax")},
az AS (
  SELECT x.doc_id, x.lang, w.cand, sum(x.cnt * w.w) AS z_micro
  FROM ax x JOIN w{_LI_ROUNDS} w USING (b) GROUP BY ALL
),
pr AS (
  SELECT doc_id, lang, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY z_micro DESC, cand ASC) AS rn
  FROM az
)
SELECT lang, cand AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pr WHERE rn = 1 GROUP BY ALL ORDER BY lang, pred_lang"""


def _sql_lang_id_eval() -> str:
    return f"""{_sql_li_train_prefix()},
hd AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_LI_HOLD_MOD} = {_LI_HOLD_RES}
    AND lang IS NOT NULL AND text IS NOT NULL
),
{_sql_li_features("hd", "lang", "hp", "hx")},
hz AS (
  SELECT x.doc_id, x.lang, w.cand, sum(x.cnt * w.w) AS z_micro
  FROM hx x JOIN w{_LI_ROUNDS} w USING (b) GROUP BY ALL
),
hpr AS (
  SELECT doc_id, lang, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY z_micro DESC, cand ASC) AS rn
  FROM hz
),
conf AS (
  SELECT lang AS t, cand AS p, CAST(count(*) AS BIGINT) AS n
  FROM hpr WHERE rn = 1 GROUP BY ALL
),
nt AS (SELECT t AS lang, CAST(sum(n) AS BIGINT) AS n_true FROM conf GROUP BY 1),
np AS (SELECT p AS lang, CAST(sum(n) AS BIGINT) AS n_pred FROM conf GROUP BY 1),
tpc AS (SELECT t AS lang, n AS tp FROM conf WHERE t = p),
j AS (
  SELECT c.cand AS lang,
         COALESCE(n_true, 0) AS n_true,
         COALESCE(n_pred, 0) AS n_pred,
         COALESCE(tp, 0) AS tp
  FROM cls c LEFT JOIN nt ON c.cand = nt.lang
             LEFT JOIN np ON c.cand = np.lang
             LEFT JOIN tpc ON c.cand = tpc.lang
)
SELECT lang, n_true, n_pred, tp,
       CASE WHEN n_pred = 0 THEN NULL
            ELSE round(CAST(tp AS DOUBLE) / n_pred, 6) END AS prec,
       CASE WHEN n_true = 0 THEN NULL
            ELSE round(CAST(tp AS DOUBLE) / n_true, 6) END AS rec,
       CASE WHEN n_pred + n_true = 0 THEN NULL
            ELSE round(2.0 * CAST(tp AS DOUBLE) / (n_pred + n_true), 6) END AS f1
FROM j ORDER BY lang"""


SQL_LANG_ID_TRAIN = _sql_lang_id_train()
SQL_LANG_ID_APPLY = _sql_lang_id_apply()
SQL_LANG_ID_EVAL = _sql_lang_id_eval()


QUERIES33: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lang_id_train": q_lang_id_train,
    "lang_id_apply": q_lang_id_apply,
    "lang_id_eval": q_lang_id_eval,
}

ORACLES33: dict[str, str] = {
    "lang_id_train": SQL_LANG_ID_TRAIN,
    "lang_id_apply": SQL_LANG_ID_APPLY,
    "lang_id_eval": SQL_LANG_ID_EVAL,
}
