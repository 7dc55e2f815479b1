"""Catalog batch 31 (round 11): the two depth items VERDICT r10
ranked —

- ``hybrid_rrf`` — HYBRID RETRIEVAL FUSION (reciprocal-rank fusion,
  Cormack/Clarke/Buettcher SIGIR 2009): production RAG/eval stacks
  retrieve with BOTH a lexical ranker and a vector ranker and fuse
  the two lists by summed 1/(k + rank). Here the lexical list is the
  existing BM25 top-20 (same terms/constants as ``bm25_search``) and
  the vector list is a brute-force quantized-integer-cosine top-20
  against the BM25 rank-1 hit's embedding (pseudo-relevance feedback:
  "expand the best text hit semantically" — a real product pattern,
  and it keeps the whole entry self-contained on the fixture's
  vec_id = doc_id contract).
- ``quality_train_bigram`` — the fastText-shaped upgrade of the r10
  in-engine quality classifier: features extend from hashed unigram
  buckets (64) to hashed unigram + bigram buckets (64 + 64 = 128-row
  weight state, still O(1) w.r.t. the corpus), trained by the SAME
  generic GD recurrence (queries_r10._train_traj) and judged by the
  SAME held-out acceptance gate (queries_r10._eval_frame) — the
  entry emits the held-out confusion/accuracy/kappa/AUC row, so a
  green row pins training AND the quality lift in one shot. The
  AUC-improves-on-unigram pin lives in tests/test_round11_entries.py.

Exactness: RRF contributions are quantized to integer micros
(round(1e6/(k+rank)) as BIGINT) before the per-doc sum — rank fusion
is exact integer math, no float-order ties; cosine follows the
established quantized-integer rule (round(x*1e7) BIGINT dots, one
double division at the end); the bigram trainer inherits the r10
integer discipline unchanged (BIGINT logits, per-doc quantized
sigmoid, deterministic double weight update).

Scale shapes:
- hybrid_rrf: the BM25 side is the proven plan (explode -> hash aggs
  -> TakeOrderedAndProject top-20, checkpointed once at <= 20 rows);
  the anchor (1 row) and its embedding (1 row) ride as broadcasts;
  the vector side is ONE narrow broadcast-cross-join score over the
  embeddings scan + a distributed TakeOrdered top-20 — no self-join,
  no global sort, nothing quadratic (a 100-TB corpus pays one text
  scan + two embeddings scans — anchor extraction and scoring — and
  two top-20s). Rank windows only ever run over the <= 20 surviving
  rows; the fusion join is 20 x 20.
- quality_train_bigram: identical to quality_train (two map-side-
  combinable shuffles per round + a broadcast of the weight table) —
  the feature explode emits ~2x rows and the state is 128 rows
  instead of 64; nothing about the shuffle structure changes.

Reference scope: the reference engine (WalterHet/wq_data_pipeline)
has no retrieval/curation surface; these extend the LLM-pipeline
families per VERDICT r10 #4/#6.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators.retrieval import bm25_search
from wq_data_pipeline_spark.plans.queries_ext import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TOPN,
    _Q,
    SQL_BM25_CTES,
    _quantized,
)
from wq_data_pipeline_spark.plans.queries_r10 import (
    _QT_B,
    _eval_frame,
    _hash_bucket,
    _sql_quality_train_eval,
    _sql_train_prefix,
    _train_traj,
)
from wq_data_pipeline_spark.sources.testdata import load_table

# --- hybrid_rrf -------------------------------------------------------------

_RRF_K = 60  # the standard RRF smoothing constant (SIGIR 2009)
_RRF_TOPN = 20  # fused list length (= both input list lengths)


def _qcos(a, b) -> "F.Column":
    """Quantized-integer cosine (the embed_ivf_topk rule): exact
    BIGINT dot + norms, ONE double division at the end — identical
    FP sequence in both engines."""
    zero = F.lit(0).cast("long")
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), zero, lambda s, x: s + x)
    n1 = F.aggregate(F.transform(a, lambda x: x * x), zero, lambda s, x: s + x)
    n2 = F.aggregate(F.transform(b, lambda x: x * x), zero, lambda s, x: s + x)
    return dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))


def _rrf_micro(rank: "F.Column") -> "F.Column":
    """Integer-micro RRF contribution: round(1e6/(k+rank)) as BIGINT,
    0 when the doc is absent from that list — the fused score is an
    exact BIGINT sum, so no float accumulation order can flip a rank."""
    return F.when(
        rank.isNotNull(),
        F.round(F.lit(1_000_000.0) / (F.lit(_RRF_K) + rank)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval with reciprocal-rank fusion:
    BM25 top-20 for the fixed 3-term query, vector top-20 by cosine
    against the BM25 rank-1 doc's embedding (the anchor itself is
    excluded from the vector list — it anchors, it doesn't compete
    there; it still carries its BM25 contribution), fused by
    rrf_micro = round(1e6/(60+rank)) summed over the lists a doc
    appears in. Output: top-20 fused (doc_id, bm25_rank, vec_rank,
    rrf_micro, fused_rank); absent-list ranks are NULL.

    100-TB shape: one corpus text scan (BM25, checkpointed at <= 20
    rows) and TWO embeddings scans — one to extract the anchor's
    vector (a join, so vec_id can't push down as a literal; at a real
    deployment a point-lookup index or a pre-materialized anchor row
    would drop it) and one broadcast-score pass feeding a
    TakeOrderedAndProject top-20. Everything is linear; the rank
    windows and the full-outer fusion join touch only the <= 20-row
    survivors. Ragged or NULL embeddings are refused up front (the
    embed_decontaminate guard): Spark's zip_with pads/propagates
    NULLs where DuckDB's list_sum skips them — a silent ranking
    divergence, so the entry fails loudly instead."""
    docs = load_table(spark, sf_dir, "documents")
    # TWO consumers (the rank list and the anchor derivation) would
    # otherwise replay the whole BM25 subtree — two corpus scans + two
    # shuffle chains at 100 TB. The result is <= topn rows, so pin it
    # once (the bigram_lm_score localCheckpoint convention; bounded
    # construction cost: one distributed top-20)
    bm = bm25_search(
        docs, _BM25_TERMS, topn=_BM25_TOPN, k1=_BM25_K1, b=_BM25_B
    ).localCheckpoint()
    anchor = bm.filter(F.col("rank") == 1).select(
        F.col("doc_id").alias("anchor_id")
    )
    raw = load_table(spark, sf_dir, "embeddings")
    dims = raw.agg(
        F.min(F.size("embedding")).alias("lo"),
        F.max(F.size("embedding")).alias("hi"),
        F.sum(F.col("embedding").isNull().cast("long")).alias("n_null"),
    ).first()
    if (dims["n_null"] or 0) > 0:
        raise ValueError(
            f"hybrid_rrf: {dims['n_null']} NULL embedding(s); "
            "clean or drop them upstream"
        )
    if dims["lo"] is not None and dims["lo"] != dims["hi"]:
        raise ValueError(
            "hybrid_rrf requires uniform embedding width; got sizes "
            f"in [{dims['lo']}, {dims['hi']}]"
        )
    emb = raw.select("vec_id", _quantized("embedding").alias("q"))
    qvec = emb.join(
        F.broadcast(anchor), emb["vec_id"] == anchor["anchor_id"]
    ).select("anchor_id", F.col("q").alias("qq"))
    scored = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select("vec_id", _qcos(F.col("q"), F.col("qq")).alias("cos_sim"))
    )
    # global sort + limit plans as TakeOrderedAndProject (the
    # bm25_search precedent); the rank window then runs over only the
    # topn surviving rows
    vtop = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(_RRF_TOPN)
    wv = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    vr = vtop.withColumn("vec_rank", F.row_number().over(wv)).select(
        F.col("vec_id").alias("doc_id"), "vec_rank"
    )
    br = bm.select("doc_id", F.col("rank").alias("bm25_rank"))
    fused = br.join(vr, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "vec_rank",
        (_rrf_micro(F.col("bm25_rank")) + _rrf_micro(F.col("vec_rank"))).alias(
            "rrf_micro"
        ),
    )
    wf = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return fused.withColumn("fused_rank", F.row_number().over(wf)).filter(
        F.col("fused_rank") <= _RRF_TOPN
    )


SQL_HYBRID_RRF = f"""{SQL_BM25_CTES},
anchor AS (SELECT doc_id AS anchor_id FROM bm25 WHERE rank = 1),
eq AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_Q}) AS BIGINT)) AS q
  FROM embeddings
),
qv AS (SELECT e.q AS qq, a.anchor_id FROM eq e JOIN anchor a ON e.vec_id = a.anchor_id),
vs AS (
  SELECT e.vec_id,
         CAST(list_sum(list_transform(generate_series(1, len(e.q)), i -> e.q[i] * qv.qq[i])) AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(e.q, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(qv.qq, x -> x * x)) AS DOUBLE))) AS cos_sim
  FROM eq e CROSS JOIN qv
  WHERE e.vec_id <> qv.anchor_id
),
vr AS (
  SELECT vec_id AS doc_id, rank AS vec_rank FROM (
    SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM vs
  ) WHERE rank <= {_RRF_TOPN}
),
br AS (SELECT doc_id, rank AS bm25_rank FROM bm25),
fused AS (
  SELECT COALESCE(br.doc_id, vr.doc_id) AS doc_id, br.bm25_rank, vr.vec_rank,
         COALESCE(CAST(round(1000000.0 / ({_RRF_K} + br.bm25_rank)) AS BIGINT), 0)
         + COALESCE(CAST(round(1000000.0 / ({_RRF_K} + vr.vec_rank)) AS BIGINT), 0) AS rrf_micro
  FROM br FULL OUTER JOIN vr ON br.doc_id = vr.doc_id
)
SELECT doc_id, bm25_rank, vec_rank, rrf_micro, fused_rank FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS fused_rank
  FROM fused
) WHERE fused_rank <= {_RRF_TOPN}"""


# --- quality_train_bigram ---------------------------------------------------

_BG_NB = 2 * _QT_B  # 64 unigram buckets + 64 bigram buckets


def _bg_bucket_counts(df: DataFrame, extra_cols: list[str]) -> DataFrame:
    """The bigram-model featurizer (fastText shape): hashed unigrams
    land in buckets 0.._QT_B-1 (the SAME _hash_bucket rule as the r10
    unigram model), hashed "w1 w2" bigrams in buckets _QT_B..2B-1 —
    separate sub-spaces so unigram evidence is never aliased by
    bigram collisions. Docs with < 2 tokens contribute unigrams only;
    docs with no tokens drop entirely (explode), matching the
    oracle's unnest."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat(
            F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
        ),
    )
    uni = df.select(
        "doc_id", *extra_cols, F.explode("toks").alias("g"), F.lit(0).alias("off")
    )
    big = (
        # the size guard matters: F.sequence(1, 0) would step DOWN
        df.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            *extra_cols,
            F.explode(bigrams).alias("g"),
            F.lit(_QT_B).alias("off"),
        )
    )
    return (
        uni.unionByName(big)
        .select(
            "doc_id",
            *extra_cols,
            (F.col("off") + _hash_bucket(F.col("g"))).alias("b"),
        )
        .groupBy("doc_id", *extra_cols, "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _sql_bg_bucket_cte(src: str, extra: str, f_n: str, x_n: str) -> str:
    """SQL mirror of _bg_bucket_counts — same (src, extra, f, x)
    contract as queries_r10._sql_bucket_cte so it drops into the
    shared training/eval oracle bodies."""
    ex = f"{extra}, " if extra else ""
    return (
        f"{f_n} AS (\n"
        f"  SELECT doc_id, {ex}('0x' || substr(md5(g), 1, 15))::BIGINT % {_QT_B} + off AS b FROM (\n"
        f"    SELECT doc_id, {ex}unnest(toks) AS g, 0 AS off FROM {src}\n"
        f"    UNION ALL\n"
        f"    SELECT doc_id, {ex}unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)), i -> toks[i] || ' ' || toks[i + 1])) AS g, {_QT_B} AS off FROM {src}\n"
        f"  )\n"
        f"),\n"
        f"{x_n} AS (SELECT doc_id, {ex}b, CAST(count(*) AS BIGINT) AS cnt FROM {f_n} GROUP BY doc_id, {ex}b)"
    )


def q_quality_train_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram-featured quality classifier, trained in-engine and
    judged by the held-out acceptance gate in one entry: the SAME
    3-round integer-exact GD recurrence as ``quality_train``
    (queries_r10._train_traj, generic over the featurizer) over
    128-bucket unigram+bigram features, evaluated on the never-seen
    doc_id % 5 == 4 slice via the SAME eval rule as
    ``quality_train_eval`` (queries_r10._eval_frame). Output: one row
    (n_docs, n_pos, n_neg, tp, fp, fn, tn, accuracy, kappa, auc).
    The bigram-beats-unigram held-out AUC pin lives in
    tests/test_round11_entries.py.

    100-TB shape: identical to quality_train — per round two
    map-side-combinable shuffles of the skinny feature table plus a
    broadcast of the (now 128-row) weight state; the featurizer adds
    ~2x exploded rows, nothing structural. The trainer trajectory is
    stashed per (session, sf_dir, featurizer-identity), so repeated
    constructions pay one build per session."""
    traj = _train_traj(
        spark, sf_dir, feats=_bg_bucket_counts, n_buckets=_BG_NB
    )
    return _eval_frame(spark, sf_dir, traj[-1], feats=_bg_bucket_counts)


SQL_QUALITY_TRAIN_BIGRAM = _sql_quality_train_eval(
    prefix=_sql_train_prefix(_sql_bg_bucket_cte, _BG_NB),
    bucket_cte=_sql_bg_bucket_cte,
)


QUERIES31: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hybrid_rrf": q_hybrid_rrf,
    "quality_train_bigram": q_quality_train_bigram,
}

ORACLES31: dict[str, str] = {
    "hybrid_rrf": SQL_HYBRID_RRF,
    "quality_train_bigram": SQL_QUALITY_TRAIN_BIGRAM,
}
