"""Corpus-composition entries (r4): the data-mixing arithmetic a
training-data pipeline runs over a crawled corpus before sampling —
per-(source, lang) rollups and temperature-scaled source weights
(the mT5/PaLM mixing rule: p_i ∝ n_i^alpha with alpha < 1 to up-weight
low-resource slices; Xue et al. 2021 §3.2).

Scale shape: both entries are one hash aggregation over the documents
scan (map-side combinable) plus, for the mixture, a broadcast 1-row
agg cross-join for the normalizer — the same lazy two-pass-scalar
pattern as BM25's corpus stats (SURVEY §7.0). Exact-integer sums
everywhere; the only libm call (pow) is rounded to 6 decimals, which
absorbs last-ulp differences between engines (same precedent as the
idf ln()).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.operators.text import tokens
from wq_data_pipeline_spark.sources.testdata import load_table

_MIX_ALPHA = 0.3
_MIX_TARGET = 100_000


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus composition: doc count, exact char
    and whitespace-token sums, mean tokens/doc. The inventory a
    mixing/sampling stage reads before deciding per-slice quotas."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.sum(F.size(tokens("text"))).alias("toks_sum"),
        F.round(
            F.sum(F.size(tokens("text"))).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_toks"),
    )


SQL_CORPUS_ROLLUP = """
WITH w AS (
  SELECT source, lang, n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS ntok
  FROM documents
)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       CAST(sum(ntok) AS BIGINT) AS toks_sum,
       round(CAST(sum(ntok) AS DOUBLE) / count(*), 6) AS avg_toks
FROM w GROUP BY source, lang"""


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: w_i =
    n_i^alpha / sum_j n_j^alpha at alpha=0.3, plus the integer
    document quota for a 100k-doc epoch. The normalizer rides in as a
    broadcast 1-row agg (zero plan-time driver jobs)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    powed = counts.withColumn("_p", F.pow(F.col("n_docs"), F.lit(_MIX_ALPHA)))
    norm = powed.agg(F.sum("_p").alias("_z"))
    out = powed.crossJoin(F.broadcast(norm))
    weight = F.round(F.col("_p") / F.col("_z"), 6)
    return out.select(
        "source",
        "n_docs",
        weight.alias("weight"),
        F.round(weight * _MIX_TARGET).cast("long").alias("quota_docs"),
    )


SQL_SOURCE_MIXTURE = f"""
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
p AS (SELECT source, n_docs, pow(n_docs, {_MIX_ALPHA}) AS pw FROM c)
SELECT source, n_docs,
       round(pw / (SELECT sum(pw) FROM p), 6) AS weight,
       CAST(round(round(pw / (SELECT sum(pw) FROM p), 6) * {_MIX_TARGET}) AS BIGINT) AS quota_docs
FROM p"""


_PACK_SEQ_LEN = 512


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): documents are
    concatenated in doc_id order and split every 512 tokens; each doc
    reports its global token offset and the first/last training
    sequence it lands in. The global cumsum runs through
    ``distributed_prefix_sum`` — a two-level scan (range partition →
    per-partition window → broadcast base offsets), NOT the
    single-partition ``Window.orderBy`` cumsum that can't scale. All
    integer arithmetic; the oracle replays the same math with a plain
    window cumsum (fine at sf0.01, the thing the operator exists to
    avoid at 100 TB)."""
    from wq_data_pipeline_spark.operators.scale import distributed_prefix_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("ntok")
    )
    d = distributed_prefix_sum(d, "doc_id", "ntok", out="start_offset")
    # zero-token docs contribute nothing and would emit an inverted
    # [first_seq > last_seq] span — drop them like pack_assignments
    d = d.filter(F.col("ntok") > 0)
    # integer division (div), not floor(double/..): offsets are exact
    # BIGINTs and stay exact past 2^53 where double floor would not
    first = F.expr(f"start_offset div {_PACK_SEQ_LEN}")
    last = F.expr(f"(start_offset + ntok - 1) div {_PACK_SEQ_LEN}")
    return d.select(
        "doc_id",
        "ntok",
        "start_offset",
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first).alias("n_boundaries_crossed"),
    )


SQL_SEQUENCE_PACK = f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS ntok
  FROM documents
),
c AS (
  SELECT doc_id, ntok,
         CAST(COALESCE(sum(ntok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM w
)
SELECT doc_id, ntok, start_offset,
       start_offset // {_PACK_SEQ_LEN} AS first_seq,
       (start_offset + ntok - 1) // {_PACK_SEQ_LEN} AS last_seq,
       (start_offset + ntok - 1) // {_PACK_SEQ_LEN}
            - start_offset // {_PACK_SEQ_LEN} AS n_boundaries_crossed
FROM c WHERE ntok > 0"""


def q_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packing map: one row per (training sequence, doc)
    span — which doc-local token range [tok_from, tok_to) fills each
    512-token sequence. This is the table a data loader actually
    consumes. The explode over a doc's sequence range is a narrow op
    with bounded fan-out (ntok/512 + 1 rows per doc); the heavy part
    remains the same two-level prefix sum as sequence_pack."""
    from wq_data_pipeline_spark.operators.scale import distributed_prefix_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("ntok")
    )
    d = distributed_prefix_sum(d, "doc_id", "ntok", out="start_offset")
    first = F.expr(f"start_offset div {_PACK_SEQ_LEN}")
    last = F.expr(f"(start_offset + ntok - 1) div {_PACK_SEQ_LEN}")
    spans = d.filter(F.col("ntok") > 0).select(
        "doc_id",
        "ntok",
        "start_offset",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    lo = F.greatest(F.col("start_offset"), F.col("seq_id") * _PACK_SEQ_LEN)
    hi = F.least(
        F.col("start_offset") + F.col("ntok"),
        (F.col("seq_id") + 1) * _PACK_SEQ_LEN,
    )
    return spans.select(
        "seq_id",
        "doc_id",
        (lo - F.col("start_offset")).alias("tok_from"),
        (hi - F.col("start_offset")).alias("tok_to"),
        (hi - lo).alias("n_toks"),
    )


SQL_PACK_ASSIGNMENTS = f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS ntok
  FROM documents
),
c AS (
  SELECT doc_id, ntok,
         CAST(COALESCE(sum(ntok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM w
),
s AS (
  SELECT doc_id, ntok, start_offset,
         unnest(range(start_offset // {_PACK_SEQ_LEN},
                      (start_offset + ntok - 1) // {_PACK_SEQ_LEN} + 1)) AS seq_id
  FROM c WHERE ntok > 0
)
SELECT seq_id, doc_id,
       greatest(start_offset, seq_id * {_PACK_SEQ_LEN}) - start_offset AS tok_from,
       least(start_offset + ntok, (seq_id + 1) * {_PACK_SEQ_LEN}) - start_offset AS tok_to,
       least(start_offset + ntok, (seq_id + 1) * {_PACK_SEQ_LEN})
         - greatest(start_offset, seq_id * {_PACK_SEQ_LEN}) AS n_toks
FROM s"""


_LD_MIN_CHARS = 12


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level corpus dedup: per-document kept/dropped
    line counts plus an md5 of the reassembled text (hash-exact
    evidence the reconstruction itself matches, without shipping the
    full corpus through the compare)."""
    from wq_data_pipeline_spark.operators.dedup import line_dedup

    d = load_table(spark, sf_dir, "documents")
    out = line_dedup(d, text="text", id_col="doc_id", min_chars=_LD_MIN_CHARS)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "n_dropped",
        F.md5("text_dedup").alias("text_md5"),
    )


SQL_LINE_DEDUP = f"""
WITH l AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
e AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS p, ls FROM l
),
x AS (
  SELECT doc_id, p - 1 AS pos, ls[p] AS line FROM e
),
c AS (
  SELECT doc_id, pos, line,
         len(trim(line)) >= {_LD_MIN_CHARS} AS dd,
         md5(line) AS h,
         doc_id * 1048576 + pos AS packed
  FROM x
),
k AS (
  SELECT h, min(packed) AS kp FROM c WHERE dd GROUP BY h
),
j AS (
  SELECT c.*, (NOT dd) OR (packed = kp) AS keep
  FROM c LEFT JOIN k USING (h)
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep), '')) AS text_md5
FROM j GROUP BY doc_id"""


_SD_TAU = 0.44  # stress threshold for the synthetic embeddings (real
# corpora use ~0.97); at 0.44 the sf0.01/sf0.1 tables yield 9/42 dups
_SD_STRIDE = 64
_SD_Q = 10_000_000


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): coarse-cluster the embeddings
    (deterministic stride-64 centroids so the oracle can replay the
    assignment), then inside each cluster flag every vector whose
    quantized-integer cosine to an earlier (lower-id) member is
    >= tau. One row per vector with (cluster_id, is_dup,
    n_dup_earlier, max_sim_earlier)."""
    from wq_data_pipeline_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * _SD_Q).cast("long")
        ).alias("q"),
    )
    # single-file scan -> one input split: spread rows before the
    # centroid-count-wide scoring fan-out (r1 single-file-scan rule)
    from wq_data_pipeline_spark.operators.scale import spread_small_scan

    emb = spread_small_scan(emb)
    cent = emb.filter(F.col("vec_id") % _SD_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("q").alias("cq")
    )
    return semdedup(
        emb, cent, id_col="vec_id", vec_col="q", tau=_SD_TAU, pin_assignment=True
    )


SQL_SEMDEDUP = f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SD_Q}) AS BIGINT)) AS q
  FROM embeddings
),
cent AS (SELECT vec_id AS centroid_id, q AS cq FROM q WHERE vec_id % {_SD_STRIDE} = 0),
scored AS (
  SELECT a.vec_id, a.q, c.centroid_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * c.cq[i])) AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(c.cq, x -> x * x)) AS DOUBLE))) AS cs
  FROM q a CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, q, centroid_id AS cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, centroid_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
sims AS (
  SELECT a.vec_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i])) AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(b.q, x -> x * x)) AS DOUBLE))) AS sim
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND b.vec_id < a.vec_id
),
dup AS (
  SELECT vec_id, count(*) AS n_dup_earlier, round(max(sim), 6) AS max_sim_earlier
  FROM sims WHERE sim >= {_SD_TAU} GROUP BY vec_id
)
SELECT a.vec_id, a.cluster_id,
       d.vec_id IS NOT NULL AS is_dup,
       CAST(coalesce(d.n_dup_earlier, 0) AS BIGINT) AS n_dup_earlier,
       d.max_sim_earlier
FROM assigned a LEFT JOIN dup d USING (vec_id)"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality buckets (Wenzek et al. 2020 §4.3):
    rank each document inside its language by unigram-LM mean
    surprisal and cut into head/middle/tail terciles. Reuses the
    integer-micro surprisal convention of ``unigram_logprob`` (exact
    BIGINT sums -> order-free doubles), so the ntile ordering is
    bit-identical across engines; ties broken by doc_id.

    Scale shape: corpus freq table is broadcast-sized vocabulary; the
    per-lang ntile partitions on lang — at 100 TB swap the global
    ntile for approx-quantile cutpoints per lang (same output
    contract), as exact ranking of 10^10 docs per language is the one
    part that doesn't scale; documented, deliberate at test SF."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    lp = F.round(
        -F.log2(F.col("c").cast("double") / F.col("total").cast("double")) * 1e6
    ).cast("long")
    scored = toks.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(total))
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum(lp).cast("double") / F.count(F.lit(1))).alias(
            "mean_surprisal_micro"
        ),
    )
    w = Window.partitionBy("lang").orderBy(
        F.asc("mean_surprisal_micro"), F.asc("doc_id")
    )
    bucket = F.ntile(3).over(w)
    return per_doc.select(
        "doc_id",
        "lang",
        "n_tokens",
        "mean_surprisal_micro",
        bucket.alias("bucket"),
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket_label"),
    )


SQL_CCNET_BUCKETS = """
WITH w AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, lang, unnest(toks) AS tok FROM w),
f AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM f),
term AS (
  SELECT t.doc_id, t.lang,
         CAST(round(-log2(CAST(f.c AS DOUBLE) / CAST(tot.total AS DOUBLE)) * 1e6) AS BIGINT) AS lp
  FROM t JOIN f USING (tok) CROSS JOIN tot
),
m AS (
  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(lp) AS DOUBLE) / count(*) AS mean_surprisal_micro
  FROM term GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, mean_surprisal_micro,
       ntile(3) OVER (PARTITION BY lang ORDER BY mean_surprisal_micro ASC, doc_id ASC) AS bucket,
       CASE ntile(3) OVER (PARTITION BY lang ORDER BY mean_surprisal_micro ASC, doc_id ASC)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket_label
FROM m"""


_DSIR_B = 1024  # hashed feature buckets
_DSIR_TARGET = "src0"  # the "target distribution" source slice


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    hash word bigrams into 1024 buckets, estimate the target
    (source='src0') and raw feature distributions with add-1
    smoothing, and score every document by the sum of per-feature
    log importance ratios log2(p_b / q_b). Per-bucket ratios are
    micro-quantized BIGINTs, so per-doc sums are order-free exact.

    Scale shape: the bucket table is 1024 rows (broadcast); totals
    ride in as a broadcast 1-row agg (zero plan-time driver jobs).
    The ONLY corpus-sized work is one explode + one hash agg to
    per-(doc, source, bucket) counts; the bucket distributions AND the
    final per-doc score all re-read that aggregation's exchange
    (ReusedExchange — the bigram explode and md5 run once, not three
    times; the naive three-scan form measured 17.7 s vs ~2 s at
    sf0.1)."""
    from wq_data_pipeline_spark.operators.text import (
        gram_hash,
        shingles_from_tokens,
        tokens,
    )
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)  # md5-heavy explode: spread the 1-file scan
    # token array materialized first (one tokenize per doc, r12)
    feats = d.select(
        "doc_id", "source", tokens("text").alias("_toks")
    ).select(
        "doc_id", "source",
        F.explode(shingles_from_tokens(F.col("_toks"), 2)).alias("g"),
    ).select(
        "doc_id", "source", F.pmod(gram_hash(F.col("g")), F.lit(_DSIR_B)).alias("b")
    )
    pg = feats.groupBy("doc_id", "source", "b").agg(F.count(F.lit(1)).alias("n"))
    ca = pg.groupBy("b").agg(F.sum("n").alias("ca"))
    ct = (
        pg.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("n").alias("ct"))
    )
    bt = ca.join(ct, "b", "left").select(
        "b", "ca", F.coalesce("ct", F.lit(0).cast("long")).alias("ct")
    )
    tot = bt.agg(F.sum("ca").alias("ta"), F.sum("ct").alias("tt"))
    lr = F.round(
        (
            F.log2(
                (F.col("ct") + 1).cast("double")
                / (F.col("tt") + _DSIR_B).cast("double")
            )
            - F.log2(
                (F.col("ca") + 1).cast("double")
                / (F.col("ta") + _DSIR_B).cast("double")
            )
        )
        * 1e6
    ).cast("long")
    lrtab = bt.crossJoin(F.broadcast(tot)).select("b", lr.alias("lr"))
    return (
        pg.join(F.broadcast(lrtab), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("lr")).cast("long").alias("sum_logratio_micro"),
        )
    )


SQL_DSIR_WEIGHTS = f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM w WHERE len(toks) >= 2
),
f AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {_DSIR_B} AS b
  FROM g
),
ca_ AS (SELECT b, count(*) AS ca FROM f GROUP BY b),
ct_ AS (SELECT b, count(*) AS ct FROM f WHERE source = '{_DSIR_TARGET}' GROUP BY b),
bt AS (SELECT ca_.b, ca, coalesce(ct, 0) AS ct FROM ca_ LEFT JOIN ct_ USING (b)),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(ct) AS BIGINT) AS tt FROM bt),
lr AS (
  SELECT b,
         CAST(round((log2(CAST(ct + 1 AS DOUBLE) / CAST(tt + {_DSIR_B} AS DOUBLE))
                   - log2(CAST(ca + 1 AS DOUBLE) / CAST(ta + {_DSIR_B} AS DOUBLE))) * 1e6) AS BIGINT) AS lr
  FROM bt CROSS JOIN tot
)
SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_feats,
       CAST(sum(lr) AS BIGINT) AS sum_logratio_micro
FROM f JOIN lr USING (b) GROUP BY doc_id, source"""


QUERIES7: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_rollup": q_corpus_rollup,
    "source_mixture": q_source_mixture,
    "sequence_pack": q_sequence_pack,
    "pack_assignments": q_pack_assignments,
    "line_dedup": q_line_dedup,
    "semdedup": q_semdedup,
    "ccnet_buckets": q_ccnet_buckets,
    "dsir_weights": q_dsir_weights,
}

ORACLES7: dict[str, str] = {
    "corpus_rollup": SQL_CORPUS_ROLLUP,
    "source_mixture": SQL_SOURCE_MIXTURE,
    "sequence_pack": SQL_SEQUENCE_PACK,
    "pack_assignments": SQL_PACK_ASSIGNMENTS,
    "line_dedup": SQL_LINE_DEDUP,
    "semdedup": SQL_SEMDEDUP,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "dsir_weights": SQL_DSIR_WEIGHTS,
}
