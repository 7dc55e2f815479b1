"""Ranked retrieval over the documents table: TF-IDF term weighting
and BM25 scoring (Robertson & Zaragoza 2009) — the search-side
primitive a training-data pipeline uses for decontamination lookups,
eval-leak probes and corpus exploration.

Scale shape: everything reduces to one explode of tokens followed by
hash aggregations / windows keyed on (doc, term) or term — map-side
combinable, no driver loops, no UDFs. Corpus-level scalars (N,
average doc length) are a 1-row aggregate broadcast-cross-joined into
the plan (SURVEY §7.0 two-pass-scalar pattern), so building a query
runs ZERO driver jobs — the scalars are computed inside the same lazy
plan when (and only when) the query executes. At 100 TB that matters
twice: no eager full scan for a query that may never run, and the
scalar agg is map-side-combinable metadata, not data movement.

Cross-engine determinism: tf/df/dl are exact integers; idf applies
ln() to bit-identical doubles (last-ulp libm differences are absorbed
by 6-decimal rounding); BM25 per-term scores are quantized to integer
micros BEFORE the per-doc sum, so the sum is BIGINT-exact and no
float accumulation order can flip a rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from wq_data_pipeline_spark.operators.text import tokens


def term_frequencies(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, dl) rows: term frequency per (doc, term) plus
    the doc length as a window sum over the same grouping — no second
    scan, no join."""
    t = df.select(F.col(id_col), F.explode(tokens(text)).alias("term"))
    tf = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))


def bm25_idf(n_docs: Column | int, df_count: Column) -> Column:
    """BM25 idf: ln((N - df + 0.5)/(df + 0.5) + 1) — always positive,
    standard smoothing. ``n_docs`` may be a literal int or a Column
    (the lazy corpus-stats form)."""
    n = n_docs if isinstance(n_docs, Column) else F.lit(float(n_docs))
    return F.log((n - df_count + 0.5) / (df_count + 0.5) + 1.0)


def corpus_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """1-row frame (_n, _avgdl): corpus size and average token count.
    Broadcast-cross-join this into per-term plans so the scalars stay
    inside one lazy plan (no plan-time driver actions)."""
    return df.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size(tokens(text))).alias("_avgdl"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc top-k terms by tf·idf (BM25-smoothed idf), ties broken
    by term ascending. Output: (id, term, tf, score, rank). Builds
    with zero driver jobs: N rides in via a broadcast 1-row agg."""
    tf = term_frequencies(df, text, id_col).crossJoin(
        F.broadcast(corpus_stats(df, text).select("_n"))
    )
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = tf.withColumn(
        "score", F.round(F.col("tf") * bm25_idf(F.col("_n"), dfreq), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def bm25_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    topn: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25-ranked top-n docs for a literal query term set.

    Per-term contributions are quantized to integer micros before the
    per-doc sum (exact BIGINT accumulation — no float-order ties), so
    the ranking is bit-deterministic across engines and partitionings.
    Output: (id, score, rank). Builds with zero driver jobs — N and
    avgdl ride in via a broadcast 1-row agg; an empty corpus therefore
    just yields an empty result instead of a plan-time TypeError.
    """
    if not query_terms:
        # empty query: no term can match — lazy empty frame, same schema
        return (
            df.select(F.col(id_col))
            .limit(0)
            .withColumn("score", F.lit(0.0))
            .withColumn("rank", F.lit(1))
        )
    tf = (
        term_frequencies(df, text, id_col)
        .filter(F.col("term").isin(*query_terms))
        .crossJoin(F.broadcast(corpus_stats(df, text)))
    )
    # window count over the filtered rows still equals docs-per-term:
    # (id, term) rows are distinct and the filter keeps whole terms
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    per_term = bm25_idf(F.col("_n"), dfreq) * (
        (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + (b * F.col("dl")) / F.col("_avgdl")))
    )
    micro = F.round(per_term * 1_000_000.0).cast("long")
    doc_scores = (
        tf.withColumn("_m", micro)
        .groupBy(id_col)
        .agg((F.sum("_m").cast("double") / 1e6).alias("score"))
    )
    # global sort + limit plans as TakeOrderedAndProject (per-partition
    # partial top-k, no single-partition shuffle); the rank window then
    # runs over only the topn surviving rows
    top = doc_scores.orderBy(F.desc("score"), F.asc(id_col)).limit(topn)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )
