"""Catalog batch 21 (round 6, ninth wave): embedding-column algebra
— per-vector feature statistics and int8 quantization, the
model-serving-side operations of an embedding pipeline, expressed
entirely with higher-order array functions (transform / aggregate /
array_max / array_position), no UDFs:

* embed_feature_stats — per-vector exact integer stats: L1 mass,
                        max element and its dimension, positive
                        count, sum of squares (micro^2) — the
                        monitoring profile for embedding drift.
* embed_int8_quant    — symmetric int8 quantization (the standard
                        serving compression): q_i = round(127 *
                        x_i / max|x|), reported as exact integer
                        aggregates per vector so the codes
                        themselves are oracled.

Determinism: every element is cast FLOAT -> DOUBLE (exact) before
any arithmetic — scaling a raw FLOAT would round differently across
engines — then quantized to BIGINT micros; per-vector reductions run
as exact integer folds, so no accumulation-order sensitivity exists
anywhere.

Scale: pure per-row column algebra — zero shuffles beyond the final
presentation sort; the natural shape for a 100-TB mapInArrow-free
scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table


def _micro(x: Column) -> Column:
    """Element in integer micros via an exact float->double cast."""
    return F.round(x.cast("double") * 1000000).cast("long")


def _lsum(arr: Column) -> Column:
    """Exact BIGINT fold over an array<long>."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def q_embed_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding profile in exact integer micros: L1 mass,
    max element + its (1-indexed) dimension, positive-element count,
    and the sum of squared micros (the L2 norm's exact square).

    Cited shape: the per-column profile the reference's QC stage
    computes for scalar series, lifted to the vector column."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    m = F.transform(F.col("embedding"), _micro)
    d = emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _lsum(F.transform(m, lambda x: F.abs(x))).alias("l1_micro"),
        F.array_max(m).alias("max_micro"),
        F.array_position(m, F.array_max(m)).alias("argmax_dim"),
        _lsum(
            F.transform(F.col("embedding"), lambda x: (x > 0).cast("long"))
        ).alias("n_pos"),
        _lsum(F.transform(m, lambda x: x * x)).alias("ss_micro2"),
    )
    return d.orderBy("vec_id")


SQL_EMBED_FEATURE_STATS = """
WITH m AS (
  SELECT vec_id,
         embedding,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mi
  FROM embeddings
)
SELECT vec_id,
       len(embedding) AS dim,
       CAST(list_sum(list_transform(mi, x -> abs(x))) AS BIGINT) AS l1_micro,
       CAST(list_max(mi) AS BIGINT) AS max_micro,
       CAST(list_position(mi, list_max(mi)) AS BIGINT) AS argmax_dim,
       CAST(list_sum(list_transform(embedding,
              x -> CAST(x > 0 AS BIGINT))) AS BIGINT) AS n_pos,
       CAST(list_sum(list_transform(mi, x -> x * x)) AS BIGINT) AS ss_micro2
FROM m
ORDER BY vec_id"""


def q_embed_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding: scale =
    max|x_i| (per vector), q_i = round(127 * x_i / scale) in
    [-127, 127]. The entry reports the per-vector code aggregates
    (sum, min, max, zero count) plus the scale in exact micros, so
    the quantization itself — not just its existence — is oracled.

    Zero-vectors quantize to all-zero codes (scale NULL)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(dbl, lambda x: F.abs(x)))
    d = emb.select("vec_id", dbl.alias("v"), scale.alias("s"))
    q = F.when(
        F.col("s") > 0,
        F.transform(
            F.col("v"), lambda x: F.round(x * 127 / F.col("s")).cast("long")
        ),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0).cast("long")))
    d = d.select(
        "vec_id",
        F.round(F.col("s") * 1000000).cast("long").alias("scale_micro"),
        q.alias("q"),
    )
    return d.select(
        "vec_id",
        "scale_micro",
        _lsum(F.col("q")).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        _lsum(
            F.transform(F.col("q"), lambda x: (x == 0).cast("long"))
        ).alias("n_zero"),
    ).orderBy("vec_id")


SQL_EMBED_INT8_QUANT = """
WITH d AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)))) AS s
  FROM embeddings
),
qd AS (
  SELECT vec_id,
         CAST(round(s * 1000000) AS BIGINT) AS scale_micro,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x * 127 / s) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
  FROM d
)
SELECT vec_id, scale_micro,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_min(q) AS BIGINT) AS q_min,
       CAST(list_max(q) AS BIGINT) AS q_max,
       CAST(list_sum(list_transform(q,
              x -> CAST(x = 0 AS BIGINT))) AS BIGINT) AS n_zero
FROM qd
ORDER BY vec_id"""


QUERIES21: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embed_feature_stats": q_embed_feature_stats,
    "embed_int8_quant": q_embed_int8_quant,
}

ORACLES21: dict[str, str] = {
    "embed_feature_stats": SQL_EMBED_FEATURE_STATS,
    "embed_int8_quant": SQL_EMBED_INT8_QUANT,
}
