"""Catalog batch 32 (round 11, second wave): two capability classes
the catalog's sketch and curation families were still missing —

- ``hll_distinct`` — HyperLogLog distinct estimation (Flajolet et al.
  2007, the stochastic-averaging form): THE production cardinality
  sketch, completing the sketch family next to ``kmv_distinct`` (KMV)
  and ``cms_user_counts`` (count-min). The whole sketch state is m
  integer registers per group holding max leading-zero ranks —
  max() is commutative/idempotent, so the state is map-side
  combinable AND mergeable across days/partitions/clusters, which is
  exactly why HLL (not KMV) is what warehouses ship.
- ``cluster_balanced_sample`` — diversity (cluster-balanced)
  subsampling over the embedding space: assign every vector to its
  nearest fixed centroid, then keep a deterministic per-cluster
  quota — the curation op that keeps a pretraining mix from
  collapsing onto its densest mode (the SemDeDup/DCLM diversify
  step, complementing the near-dup REMOVAL entries). Centroids are
  md5-derived ±1 vectors (the embed_near_dup hyperplane portability
  rule), so the oracle replays assignment bit-for-bit.

Exactness: the HLL hash is the shared 60-bit md5 gram hash; register
index/rank are bit arithmetic on it; 2^(cap-M) terms are summed as
BIGINT (dyadic doubles would be order-sensitive past 53 bits) and the
only floats are the final alpha·m²·2^cap / S division, ln() in the
small-range correction, both 6dp-rounded. Cluster assignment is an
exact BIGINT argmax: quantized vectors dotted with ±1 centroids are
pure add/subtract sums; the per-cluster quota ranks on the md5 hash
of vec_id (deterministic pseudo-random), ties by vec_id.

Scale shapes:
- hll_distinct: one narrow scan -> per-(group, register) max agg
  (map-side combinable; at most groups × m rows shuffle regardless of
  corpus size) -> per-group rollup. The 100-TB story is the register
  table ITSELF: it is the mergeable sketch a warehouse would persist
  per partition/day and OR together at query time.
- cluster_balanced_sample: k centroids broadcast as baked literals;
  assignment is one narrow scan-side argmax (the embed_ivf_topk
  max_by shape — no window over the n×k expansion); the quota rank
  is ONE window per cluster. At a fixed k the per-cluster sort grows
  with n/k — production scales k with the corpus (k ≈ n/target) or
  swaps the window for a per-key partial top-Q agg; the plan shape
  is otherwise unchanged.

Reference scope: the reference engine (WalterHet/wq_data_pipeline)
has no sketch/curation surface; these extend the LLM-pipeline
families (round-11 brief).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators.similarity import hyperplane_components
from wq_data_pipeline_spark.operators.text import gram_hash
from wq_data_pipeline_spark.plans.queries_ext import _quantized
from wq_data_pipeline_spark.sources.testdata import load_table

# --- hll_distinct -----------------------------------------------------------

_HLL_P = 8  # register-index bits
_HLL_M = 1 << _HLL_P  # 256 registers
_HLL_W = 60 - _HLL_P  # rank window: remaining hash bits (52)
# bias constant for m >= 128 (Flajolet et al. 2007 Fig. 3). ONE python
# float, interpolated into BOTH dialects so they divide by the exact
# same double.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _hll_rho(w: "F.Column") -> "F.Column":
    """rho(w) = leading zeros of w in a _HLL_W-bit window + 1 =
    _HLL_W - floor(log2(w)) for w > 0, else _HLL_W + 1. floor(log2)
    is a descending power-of-two comparison chain — pure integer
    compares, bit-identical in any engine (float log2 would round at
    2^53)."""
    flog = F.when(w >= F.lit(1 << (_HLL_W - 1)), F.lit(_HLL_W - 1))
    for b in range(_HLL_W - 2, -1, -1):
        flog = flog.when(w >= F.lit(1 << b), F.lit(b))
    return F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(F.lit(_HLL_W) - flog)


def _sql_hll_rho(w: str) -> str:
    chain = " ".join(
        f"WHEN {w} >= {1 << b} THEN {b}"
        for b in range(_HLL_W - 1, -1, -1)
    )
    return (
        f"CASE WHEN {w} = 0 THEN {_HLL_W + 1} "
        f"ELSE {_HLL_W} - (CASE {chain} END) END"
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate: 256
    registers of max leading-zero ranks over the 60-bit md5 hash (low
    8 bits pick the register, the remaining 52 feed the rank), raw
    estimate alpha·m²/Z with the standard small-range linear-counting
    correction (est <= 2.5m and empty registers -> m·ln(m/V)).

    Output: (event_type, n_rows, n_zero_registers, est_distinct).
    The accuracy pin (vs exact distinct, both regimes: linear-count
    at sf0.01's ~150 users/type and raw-HLL past 2.5m) lives in
    tests/test_round11b_entries.py — the entry itself never computes
    the exact count, because never needing to is the point of the
    sketch.

    Exactness discipline: Z is accumulated as a BIGINT sum of
    2^(_HLL_W+1 - M) (53-bit-safe: <= m·2^52 < 2^61) — summing the
    dyadic doubles directly would be float-order-sensitive past 53
    bits of spread; the scale divides back out in the one final
    double division. NULL user_ids are excluded on both sides (no
    identity to count).

    100-TB shape: scan -> per-(type, register) MAX agg — map-side
    combinable, idempotent, and mergeable: the shuffle carries at
    most n_types × 256 rows no matter the corpus; persist the
    register table per day/partition and max-merge to union sketches
    without rescanning."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    h = gram_hash(F.col("user_id").cast("string"))
    rows = ev.select(
        "event_type",
        F.pmod(h, F.lit(_HLL_M)).alias("j"),
        F.shiftright(h, _HLL_P).alias("w"),
    )
    regs = rows.groupBy("event_type", "j").agg(
        F.max(_hll_rho(F.col("w"))).alias("m_j"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    cap = _HLL_W + 1
    term = F.pow(F.lit(2.0), F.lit(cap) - F.col("m_j")).cast("long")
    agg = regs.groupBy("event_type").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(term).alias("s_obs"),
    )
    m = F.lit(_HLL_M)
    v = (m - F.col("n_obs")).cast("long")
    s_int = F.col("s_obs") + v * F.lit(1 << cap).cast("long")
    est_raw = (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M * _HLL_M))
        * F.lit(float(1 << cap))
        / s_int.cast("double")
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(m.cast("double") / v.cast("double")),
    ).otherwise(est_raw)
    return agg.select(
        "event_type",
        "n_rows",
        v.alias("n_zero_registers"),
        F.round(est, 6).alias("est_distinct"),
    ).orderBy("event_type")


SQL_HLL_DISTINCT = f"""
WITH e AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, h % {_HLL_M} AS j, h >> {_HLL_P} AS w FROM e
),
regs AS (
  SELECT event_type, j, max({_sql_hll_rho("w")}) AS m_j,
         CAST(count(*) AS BIGINT) AS c
  FROM r GROUP BY event_type, j
),
agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(CAST(power(2.0, {_HLL_W + 1} - m_j) AS BIGINT)) AS BIGINT) AS s_obs
  FROM regs GROUP BY event_type
)
SELECT event_type, n_rows,
       CAST({_HLL_M} - n_obs AS BIGINT) AS n_zero_registers,
       round(CASE WHEN (CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({float(_HLL_M * _HLL_M)!r} AS DOUBLE) * CAST({float(1 << (_HLL_W + 1))!r} AS DOUBLE)
                        / CAST(s_obs + ({_HLL_M} - n_obs) * {1 << (_HLL_W + 1)} AS DOUBLE)) <= CAST({2.5 * _HLL_M!r} AS DOUBLE)
                   AND ({_HLL_M} - n_obs) > 0
                  THEN CAST({float(_HLL_M)!r} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / CAST({_HLL_M} - n_obs AS DOUBLE))
                  ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({float(_HLL_M * _HLL_M)!r} AS DOUBLE) * CAST({float(1 << (_HLL_W + 1))!r} AS DOUBLE)
                       / CAST(s_obs + ({_HLL_M} - n_obs) * {1 << (_HLL_W + 1)} AS DOUBLE)
             END, 6) AS est_distinct
FROM agg ORDER BY event_type"""


# --- cluster_balanced_sample ------------------------------------------------

_CBS_K = 8  # fixed centroid count (production: k scales with corpus)
_CBS_QUOTA = 40  # per-cluster keep quota


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity subsample over the embedding space: every vector is
    assigned to its nearest of {_CBS_K} fixed md5-derived ±1
    centroids (cosine argmax == integer-dot argmax — equal-norm
    centroids), then each cluster keeps its first {_CBS_QUOTA}
    vectors under a deterministic pseudo-random order (md5 hash of
    vec_id, ties by vec_id). Output per cluster: population, kept
    count, and the exact BIGINT sum of kept vec_ids (the membership
    checksum that makes the quota selection oracle-checkable).

    This is the diversify step of a curation stack (SemDeDup/DCLM):
    near-dup REMOVAL entries prune redundancy; this caps how much any
    single mode of the distribution can contribute. Swap the fixed
    centroids for ``similarity._kmeans_distributed`` output and the
    plan is unchanged (the quality_classifier fixed-weights
    convention: fixed parameters keep the ENTRY oracle-replayable;
    the trained path exists in the same package).

    Exactness: quantized BIGINT vectors dotted with ±1 centroids are
    exact add/subtract sums; argmax ties break to the smaller
    centroid id; the quota rank is integer (hash, vec_id). Ragged or
    NULL embeddings are refused up front (the embed_decontaminate
    guard).

    100-TB shape: centroids ride as baked literal arrays (zero
    broadcast, zero md5 work on executors); assignment is a narrow
    scan-side max_by agg — never a window over the n×k expansion
    (the semdedup_trained shape lesson); the quota is ONE window per
    cluster. At fixed k the per-cluster sort grows n/k — production
    scales k with the corpus or swaps in a per-key partial top-Q
    agg; everything else is shape-identical."""
    raw = load_table(spark, sf_dir, "embeddings")
    dims = raw.agg(
        F.min(F.size("embedding")).alias("lo"),
        F.max(F.size("embedding")).alias("hi"),
        F.sum(F.col("embedding").isNull().cast("long")).alias("n_null"),
    ).first()
    if (dims["n_null"] or 0) > 0:
        raise ValueError(
            f"cluster_balanced_sample: {dims['n_null']} NULL embedding(s); "
            "clean or drop them upstream"
        )
    if dims["lo"] is None:  # empty table: contract schema
        return spark.createDataFrame(
            [], "cluster INT, n_total LONG, n_kept LONG, kept_id_sum LONG"
        )
    if dims["lo"] != dims["hi"]:
        raise ValueError(
            "cluster_balanced_sample requires uniform embedding width; "
            f"got sizes in [{dims['lo']}, {dims['hi']}]"
        )
    dim = dims["hi"]
    q = raw.select("vec_id", _quantized("embedding").alias("q"))
    zero = F.lit(0).cast("long")
    best = None
    for k in range(_CBS_K):
        plane = F.array(
            *[F.lit(int(c)) for c in hyperplane_components(k, dim)]
        )
        dot = F.aggregate(
            F.zip_with("q", plane, lambda x, h: x * h), zero, lambda s, x: s + x
        )
        cand = F.struct(dot.alias("d"), F.lit(-k).alias("nk"))
        best = cand if best is None else F.greatest(best, cand)
    assigned = q.select(
        "vec_id",
        (-best["nk"]).cast("int").alias("cluster"),
        gram_hash(F.col("vec_id").cast("string")).alias("rh"),
    )
    w = Window.partitionBy("cluster").orderBy("rh", "vec_id")
    ranked = assigned.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("rk") <= _CBS_QUOTA).cast("long")).alias("n_kept"),
            F.coalesce(
                F.sum(
                    F.when(F.col("rk") <= _CBS_QUOTA, F.col("vec_id")).otherwise(
                        F.lit(0).cast("long")
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("kept_id_sum"),
        )
        .orderBy("cluster")
    )


def _sql_cbs(dim: int = 64) -> str:
    """Oracle for the fixture's embedding width (64; asserted by the
    entry's uniform-width guard — a different-width fixture would
    need the dim re-probed, which the compare harness does not do, so
    the oracle bakes the testdata contract)."""
    # replay the ±1 centroids: parity of the first hex digit of
    # md5('<k>:<i>') — identical to similarity.hyperplane_components
    comp = (
        "CASE WHEN substr(md5(CAST({k} AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1) "
        "IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END"
    )
    dots = ",\n         ".join(
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> q[i] * ({comp.format(k=k)}))) AS d{k}"
        for k in range(_CBS_K)
    )
    # argmax with ties to the SMALLER centroid id: k beats every
    # earlier centroid strictly and every later one at-least-equally
    best = "CASE "
    for k in range(_CBS_K):
        others = " AND ".join(
            f"d{k} {'>' if j < k else '>='} d{j}"
            for j in range(_CBS_K)
            if j != k
        )
        best += f"WHEN {others or 'TRUE'} THEN {k} "
    best += "END"
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)) AS q
  FROM embeddings
),
d AS (
  SELECT vec_id,
         {dots}
  FROM q
),
a AS (
  SELECT vec_id, {best} AS cluster,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS rh
  FROM d
),
rk AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY rh, vec_id) AS rk
  FROM a
)
SELECT CAST(cluster AS INT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN rk <= {_CBS_QUOTA} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN rk <= {_CBS_QUOTA} THEN vec_id ELSE 0 END), 0) AS BIGINT) AS kept_id_sum
FROM rk GROUP BY cluster ORDER BY cluster"""


SQL_CLUSTER_BALANCED_SAMPLE = _sql_cbs()


QUERIES32: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hll_distinct": q_hll_distinct,
    "cluster_balanced_sample": q_cluster_balanced_sample,
}

ORACLES32: dict[str, str] = {
    "hll_distinct": SQL_HLL_DISTINCT,
    "cluster_balanced_sample": SQL_CLUSTER_BALANCED_SAMPLE,
}
