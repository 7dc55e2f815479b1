"""Catalog batch 10 (round 6): the ANN-assignment SemDeDup — the
final piece of the at-scale semantic-dedup composition (VERDICT r5
what's-wrong #2 / builder handoff #2).

``semdedup_trained`` fixed the centroid COUNT (k = n/64 trained
centroids instead of stride samples) and r6's distributed-state
trainer fixed the driver-memory wall, but its exact assignment still
scores every (vector, centroid) pair — an O(n·k) = O(n²/64) term
that is the one remaining super-linear leg. ``semdedup_ann`` replaces
exact assignment with banded random-hyperplane LSH bucketing shared
between vectors and centroids: a vector is scored only against
centroids it shares a band signature with (expected candidates
~ n·k / 2^planes_per_band per band), and a vector with NO candidate
centroid becomes its own singleton cluster (never marked dup — the
conservative direction for dedup). The md5-derived ±1 hyperplanes are
engine-portable (the embed_near_dup / embed_lsh_ann precedent), and
integer plane dots make every signature bit — hence the candidate
set, the assignment, and the final dup marks — exactly mirrorable in
DuckDB.

Reference scope note: the reference pipeline (WalterHet/
wq_data_pipeline) has no embedding operators; this family is part of
the training-data-pipeline extension surface (SURVEY.md §2 north-star
list), built on Abbas et al. 2023 (SemDeDup, arXiv:2303.09540) and
Charikar 2002 (random-hyperplane LSH).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_SDA_TAU = 0.44  # same stress threshold as semdedup / semdedup_trained
_SDA_TARGET = 64  # target cluster size; k = ceil(n / target)
_SDA_BANDS = 8
# bits per band are AUTO-SIZED: planes = max(1, ceil(log2(k))) — the
# auto_planes_per_band law (VERDICT r6 #4), enforced in code for both
# the in-loop trainer assignment and the final assignment here, and
# derived identically in-SQL by the oracle.


def q_semdedup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with ANN (LSH-bucketed) centroid assignment — the
    100-TB composition end-to-end: distributed-state Lloyd trainer
    (k = ceil(n/64), no driver-held centroids), assignment candidates
    from a shared (band, signature) join instead of the full n×k
    scoring, exact cosine + lowest-centroid-id tie only within
    candidates, unmatched vectors become singleton clusters
    (cluster_id = -vec_id - 1, never dup), then the standard
    within-cluster earlier-id marking at tau.

    Scale shape: signatures are per-row column algebra (literal ±1
    planes, no shuffle); the candidate join shuffles skinny
    (id, band, sig) rows against a broadcast centroid-signature table
    (k rows × bands); scoring touches only candidates; max_by
    combines map-side so n rows cross the assignment shuffle. Every
    stage is linear in n for fixed bucket occupancy — the O(n·k)
    exact-assignment term is gone.

    Tuning law (ENFORCED, not prose): candidates/vector ≈
    k·bands/2^planes, so planes/band = max(1, ceil(log2(k))) —
    ``auto_planes_per_band`` — keeping per-band buckets ≳ the
    centroid count and the per-vector candidate set O(bands) at any
    k. On the synthetic bench corpus (vector-to-own-centroid cosine
    low, median ~0.25 → per-plane agreement ~0.58) this yields
    planes=3 at k=8 with a low singleton rate; a real embedding
    corpus clusters far tighter (cos ≥ 0.7 → agreement ≥ 0.75),
    which keeps the same law workable at large k (8–12 bits/band).
    Bucket occupancy and singleton rate on both corpus shapes are
    pinned by tests/test_round7_entries.py."""
    from wq_data_pipeline_spark.operators.similarity import (
        auto_planes_per_band,
        banded_signatures,
        cosine,
        kmeans_centroids,
        semdedup_within,
    )
    from wq_data_pipeline_spark.plans.queries_ext import _KM_ITERS, _quantized

    raw = load_table(spark, sf_dir, "embeddings")
    head = raw.select(F.size("embedding")).head()
    if head is None:  # empty table: contract schema, no dim to probe
        empty = spark.createDataFrame(
            [], "vec_id LONG, q ARRAY<BIGINT>, cluster_id LONG"
        )
        return semdedup_within(empty, id_col="vec_id", vec_col="q", tau=_SDA_TAU)
    dim = head[0]
    # pin the scan + quantization once: count(), both banded() sides,
    # the scoring join, and the final assignment all read `emb` —
    # without the checkpoint each is an independent re-scan. r13: the
    # spread-repartition fires only when the scan is COARSER than the
    # cluster (the single-file small-table case it was written for) —
    # at corpus scale the scan has >= defaultParallelism splits and
    # the unconditional form was a full corpus shuffle for nothing;
    # and the pin is lazy, so the gate count() below is the ONE
    # construction job that materializes it (the ADVICE r12 #1
    # eager+count double-job pattern, fixed here too).
    from wq_data_pipeline_spark.operators.scale import spread_small_scan

    emb = spread_small_scan(
        raw.select("vec_id", _quantized("embedding").alias("q"))
    ).localCheckpoint(eager=False)
    k = max(1, math.ceil(emb.count() / _SDA_TARGET))
    planes = auto_planes_per_band(k)
    # SIZE-GATED trainer (VERDICT r7 #1): exact distributed/broadcast
    # rounds while k×dim fits the broadcast budget (the r7 all-banded
    # trainer measured 34.7 s vs 11.1 s at sf0.1), banded LSH rounds
    # only past k*dim > 1e6 (n > 64M vectors at dim=64). The entry's
    # ANN identity — the banded FINAL assignment below, linear in n —
    # is unchanged; only the trainer's per-round assignment is gated.
    # literal_centroids_max=0: k ∝ n, keep centroid state a DataFrame.
    # trained state is deterministic in (input content, params) and
    # tiny (k rows) -> one build per session (operators/stash.py)
    from wq_data_pipeline_spark.operators.stash import session_stash

    cent = session_stash(
        spark,
        sf_dir,
        "embeddings",
        ("kmeans", k, _KM_ITERS, "auto-nolit"),
        lambda: kmeans_centroids(
            emb,
            k=k,
            iters=_KM_ITERS,
            vec_col="q",
            assignment="auto",
            literal_centroids_max=0,
        ),
    )
    # banded_signatures signs the half-away-from-zero-ROUNDED vector,
    # so the (double) centroid means sign as integers — every
    # signature bit is portable across engines
    # no distinct() on the candidate pairs (r13): a (vec, cid) pair
    # that matches in several bands reaches the scoring join several
    # times, but max_by is invariant to duplicates — same argmax, and
    # the duplicate factor is bounded by the band count while the
    # distinct cost a full candidate-set shuffle (guide §2.4).
    cand = (
        banded_signatures(emb, "vec_id", "q", _SDA_BANDS, planes, dim)
        .join(
            banded_signatures(cent, "_cid", "q", _SDA_BANDS, planes, dim),
            on=["band", "sig"],
        )
        .select("vec_id", "_cid")
    )
    c = cent.select(F.col("centroid_id").alias("_cid"), F.col("q").alias("_cv"))
    best = (
        cand.join(c, "_cid")
        .join(emb, "vec_id")
        .select("vec_id", "_cid", cosine("q", "_cv").alias("_cs"))
        .groupBy("vec_id")
        .agg(
            F.max_by(F.col("_cid"), F.struct(F.col("_cs"), -F.col("_cid"))).alias(
                "_best_cid"
            )
        )
    )
    assigned = (
        emb.join(best, "vec_id", "left")
        .select(
            "vec_id",
            "q",
            F.coalesce(
                F.col("_best_cid").cast("long"), -F.col("vec_id") - F.lit(1)
            ).alias("cluster_id"),
        )
        .localCheckpoint()  # the within stage reads it twice
    )
    return semdedup_within(
        assigned, id_col="vec_id", vec_col="q", tau=_SDA_TAU, dim=dim
    )


def _semdedup_ann_sql() -> str:
    """DuckDB replay: the shared EXACT dynamic-k Lloyd prefix (final
    centroids CTE ``c{_KM_ITERS}`` — the engine's "auto" trainer
    resolves to the bit-identical exact mode at every oracle scale,
    crossover k*dim > 1e6), then the BANDED final assignment exactly
    as the engine runs it: the auto-planes law evaluated in-SQL
    (planes/band = greatest(1, ceil(log2(k)))), one md5 ±1 plane
    table shared by both sides, vector signatures over the quantized
    corpus, centroid signatures over the ROUNDED means, band-join
    candidates, exact-cosine best-candidate assignment with the
    (cs DESC, cid ASC) tie rule, singleton fallback, then the
    within-cluster earlier-id tail of SQL_SEMDEDUP_TRAINED."""
    from wq_data_pipeline_spark.plans.queries_ext import (
        _KM_ITERS,
        _kmeans_prefix_sql,
        _lr_dots,
        _lr_sq,
    )

    last = f"c{_KM_ITERS}"
    pl = "(SELECT pl FROM pp)"
    k_sql = (
        f"SELECT CAST(ceil(count(*) / {_SDA_TARGET}.0) AS BIGINT) FROM embeddings"
    )
    dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(a.q)), "
        "i -> a.q[i] * b.q[i])) AS DOUBLE)"
    )
    nrm = "sqrt(CAST(list_sum(list_transform({v}, x -> x * x)) AS DOUBLE))"
    return f"""{_kmeans_prefix_sql(k_sql)},
kk AS (SELECT ({k_sql}) AS k),
pp AS (SELECT greatest(1, CAST(ceil(log2(k)) AS INT)) AS pl FROM kk),
dims AS (SELECT unnest(generate_series(0, (SELECT max(len(q)) - 1 FROM q))) AS i),
pls AS (SELECT unnest(generate_series(0, (SELECT {_SDA_BANDS} * pl - 1 FROM pp))) AS p),
planes AS (
  SELECT pls.p, dims.i,
         CASE WHEN substr(md5(CAST(pls.p AS VARCHAR) || ':' || CAST(dims.i AS VARCHAR)), 1, 1)
                   IN ('0','2','4','6','8','a','c','e')
              THEN 1 ELSE -1 END AS h
  FROM pls CROSS JOIN dims
),
vdim AS (
  SELECT vec_id, i, q[i + 1] AS xi
  FROM (SELECT vec_id, q, unnest(generate_series(0, len(q) - 1)) AS i FROM q)
),
vdot AS (
  SELECT v.vec_id, pl2.p, sum(v.xi * pl2.h) AS s
  FROM vdim v JOIN planes pl2 ON v.i = pl2.i GROUP BY v.vec_id, pl2.p
),
vsig AS (
  SELECT vec_id, p // {pl} AS band,
         CAST(sum(CASE WHEN s > 0 THEN 1 << (p % {pl}) ELSE 0 END) AS BIGINT) AS sig
  FROM vdot GROUP BY vec_id, p // {pl}
),
cquant AS (
  SELECT cid, list_transform(c, x -> CAST(round(x) AS BIGINT)) AS cqv FROM {last}
),
cdim AS (
  SELECT cid, i, cqv[i + 1] AS xi
  FROM (SELECT cid, cqv, unnest(generate_series(0, len(cqv) - 1)) AS i FROM cquant)
),
cdot AS (
  SELECT c.cid, pl2.p, sum(c.xi * pl2.h) AS s
  FROM cdim c JOIN planes pl2 ON c.i = pl2.i GROUP BY c.cid, pl2.p
),
csig AS (
  SELECT cid, p // {pl} AS band,
         CAST(sum(CASE WHEN s > 0 THEN 1 << (p % {pl}) ELSE 0 END) AS BIGINT) AS sig
  FROM cdot GROUP BY cid, p // {pl}
),
cand AS (
  SELECT DISTINCT v.vec_id, c.cid
  FROM vsig v JOIN csig c ON v.band = c.band AND v.sig = c.sig
),
cscored AS (
  SELECT cand.vec_id, cand.cid,
         {_lr_dots("v.q", "ct.c")} / (sqrt({_lr_sq("v.q")}) * sqrt({_lr_sq("ct.c")})) AS cs
  FROM cand JOIN q v USING (vec_id) JOIN {last} ct USING (cid)
),
bestc AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
    FROM cscored
  ) WHERE rn = 1
),
avv AS (
  SELECT v.vec_id, v.q,
         CAST(coalesce(b.cid, -v.vec_id - 1) AS BIGINT) AS bucket
  FROM q v LEFT JOIN bestc b USING (vec_id)
),
simsx AS (
  SELECT a.vec_id,
         {dot} / ({nrm.format(v="a.q")} * {nrm.format(v="b.q")}) AS sim
  FROM avv a JOIN avv b
    ON a.bucket = b.bucket AND b.vec_id < a.vec_id
),
dupx AS (
  SELECT vec_id, count(*) AS n_dup_earlier, round(max(sim), 6) AS max_sim_earlier
  FROM simsx WHERE sim >= {_SDA_TAU} GROUP BY vec_id
)
SELECT avv.vec_id, avv.bucket AS cluster_id,
       d.vec_id IS NOT NULL AS is_dup,
       CAST(coalesce(d.n_dup_earlier, 0) AS BIGINT) AS n_dup_earlier,
       d.max_sim_earlier
FROM avv LEFT JOIN dupx d USING (vec_id)"""


SQL_SEMDEDUP_ANN = _semdedup_ann_sql()


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch-0 data
    loader wants the corpus in a reproducible pseudo-random order. The
    order key is md5(doc_id) (seedless, engine-portable, uniform) and
    the 0-based position comes from ``distributed_prefix_sum`` of a
    ones column — the two-level global rank (range partition →
    per-partition window → broadcast base offsets), NEVER a
    ``row_number() OVER (ORDER BY …)`` single-partition window, which
    is the canonical 100-TB global-sort trap. Emits (doc_id, source,
    n_tokens, shuffle_pos) ready for sequence packing downstream."""
    from wq_data_pipeline_spark.operators.scale import distributed_prefix_sum
    from wq_data_pipeline_spark.operators.text import tokens

    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(tokens("text")).cast("long").alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("_k"),
            F.lit(1).cast("long").alias("_one"),
        )
    )
    ranked = distributed_prefix_sum(d, "_k", "_one", out="shuffle_pos")
    return ranked.select("doc_id", "source", "n_tokens", "shuffle_pos")


SQL_CORPUS_SHUFFLE = """
SELECT doc_id, source,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS BIGINT) AS n_tokens,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
            AS BIGINT) AS shuffle_pos
FROM documents"""


_LB_WIDTH = 8  # tokens per length bucket (bench corpus docs are 10-99 tokens)
_LB_CAP = 16  # bucket ids clamp at cap (overflow bucket)


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report: group documents into
    fixed-width token-length buckets (the standard padding-efficiency
    trick — batching similar-length sequences so pad-to-max waste
    stays small) and report per bucket the doc count, token sum, the
    bucket's max length, and the padding waste a pad-to-bucket-max
    batcher would pay. All-integer arithmetic; one explode-free scan
    + one hash agg (map-side combinable) — scales."""
    from wq_data_pipeline_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents").select(
        F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    # integer floor-div: Spark's / on longs is double division — use
    # floor() so both engines produce the same integer bucket id
    bucket = F.least(
        F.lit(_LB_CAP).cast("long"),
        F.floor(F.col("n_tokens") / F.lit(_LB_WIDTH)).cast("long"),
    )
    return (
        d.select(bucket.alias("bucket_id"), "n_tokens")
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_sum"),
            F.max("n_tokens").alias("max_len"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias(
                "pad_waste"
            ),
        )
    )


SQL_LENGTH_BUCKETS = f"""
WITH t AS (
  SELECT CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT least({_LB_CAP}, n_tokens // {_LB_WIDTH}) AS bucket_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       max(n_tokens) AS max_len,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste
FROM t GROUP BY least({_LB_CAP}, n_tokens // {_LB_WIDTH})"""


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert latest-snapshot view: one row per (user_id,
    event_type) — the most recent version by (ts, event_id) — plus the
    version count. The standard warehouse MERGE-read pattern (Delta/
    Iceberg snapshot reads compact to exactly this). Window partitions
    on the key, so parallelism scales with key cardinality and no
    global sort exists; at 100 TB this is one shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_versions",
            F.count(F.lit(1)).over(
                Window.partitionBy("user_id", "event_type")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            "n_versions",
        )
    )


SQL_LATEST_SNAPSHOT = """
SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, n_versions FROM (
  SELECT user_id, event_type, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM events
) WHERE rn = 1"""


_SJ_SALTS = 8


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-to-dim join via ``scale.salted_join``: events
    (fact) joined to per-user order-of-magnitude stats (a dim too big
    to broadcast at real scale) on a salted key, spreading any hot
    user over ``_SJ_SALTS`` reducers. The oracle is the PLAIN join —
    salting must be row-for-row invisible in the result (also pinned
    by tests/test_scale.py::test_salted_join_matches_plain_join)."""
    from wq_data_pipeline_spark.operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_n"),
        F.round(F.avg("value"), 6).alias("user_avg"),
    )
    j = salted_join(
        ev.select("event_id", "user_id", "value"),
        stats,
        key="user_id",
        n_salts=_SJ_SALTS,
        salt_source="event_id",
    )
    return j.select(
        "event_id",
        "user_id",
        "value",
        "user_n",
        "user_avg",
        (F.col("value") > F.col("user_avg")).alias("above_avg"),
    )


SQL_SALTED_JOIN = """
WITH s AS (
  SELECT user_id, count(*) AS user_n, round(avg(value), 6) AS user_avg
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.value, s.user_n, s.user_avg,
       e.value > s.user_avg AS above_avg
FROM events e JOIN s USING (user_id)"""


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quality deciles without a single-partition rank window:
    order docs by (n_tokens, doc_id), rank via the two-level
    ``distributed_prefix_sum`` (the corpus_shuffle machinery), decile
    = floor(10·rank/n). The curation use case: keep the top-k% by a
    quality score with an EXACT global cut, where ntile()/row_number()
    over a global ORDER BY would funnel the corpus through one task."""
    from wq_data_pipeline_spark.operators.scale import distributed_prefix_sum
    from wq_data_pipeline_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    # exact composite order key: score major, doc_id minor (both
    # BIGINT; doc_id < 1e10 in the fixtures and the replicas)
    d = d.withColumn(
        "_k", F.col("n_tokens") * F.lit(10_000_000_000) + F.col("doc_id")
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = distributed_prefix_sum(d, "_k", "_one", out="rank")
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "rank",
            F.least(
                F.lit(9).cast("long"),
                F.floor(F.col("rank") * 10 / F.col("_n")).cast("long"),
            ).alias("decile"),
        )
    )


SQL_QUALITY_DECILES = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT) AS rank
  FROM t
)
SELECT doc_id, n_tokens, rank,
       least(9, CAST(floor(rank * 10.0 / (SELECT count(*) FROM r)) AS BIGINT)) AS decile
FROM r"""


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per ship month: lineitem ⋈
    broadcast(part), CASE-split revenue sums. Part is the classic
    broadcast dim; one hash agg on the month."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("_m"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0)), 2
            ).alias("economy_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.unix_micros("_m").alias("month_us"),
            "economy_rev",
            "total_rev",
            F.round(
                F.col("economy_rev") * 100.0 / F.col("total_rev"), 6
            ).alias("economy_pct"),
            "n_items",
        )
    )


SQL_TPCH_Q14 = """
SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
       round(sum(CASE WHEN p_type = 'ECONOMY'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS economy_rev,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
       round(round(sum(CASE WHEN p_type = 'ECONOMY'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) * 100.0
             / round(sum(l_extendedprice * (1 - l_discount)), 2), 6) AS economy_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY date_trunc('month', l_shipdate)"""


QUERIES10: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "semdedup_ann": q_semdedup_ann,
    "corpus_shuffle": q_corpus_shuffle,
    "length_buckets": q_length_buckets,
    "latest_snapshot": q_latest_snapshot,
    "salted_join": q_salted_join,
    "quality_deciles": q_quality_deciles,
    "tpch_q14_promo": q_tpch_q14_promo,
}

ORACLES10: dict[str, str] = {
    "semdedup_ann": SQL_SEMDEDUP_ANN,
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "length_buckets": SQL_LENGTH_BUCKETS,
    "latest_snapshot": SQL_LATEST_SNAPSHOT,
    "salted_join": SQL_SALTED_JOIN,
    "quality_deciles": SQL_QUALITY_DECILES,
    "tpch_q14_promo": SQL_TPCH_Q14,
}


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup fingerprinting through the REAL codec path:
    deterministic 16×16 gray PNGs (pixels = md5 chain seeded by the
    document's content digest) are ENCODED with the stdlib PNG
    writer, decoded back, and average-hashed
    (``multimodal.perceptual_hash``); hashes group into visual-dup
    buckets. Duplicate documents produce identical images, so the
    is_dup_image column mirrors content dedup through the image
    pipeline end-to-end.

    ORACLED despite the codec: 8-bit gray PNG round-trips losslessly,
    so DuckDB can replay the expected pixels straight from the md5
    chain and recompute the all-integer aHash — the comparison
    cross-checks both the hash math AND the codec round-trip. Scale
    shape: two chained mapInPandas stages (one narrow Arrow pass, no
    shuffle between), then one hash agg on the 64-bit fingerprint.
    NULL-text docs are excluded symmetrically on both sides (a NULL
    doc has no content digest to seed the pixel chain)."""
    from wq_data_pipeline_spark.operators.multimodal import perceptual_hash
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = (
        _docs_parallel(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("media_id"), "text")
    )

    from pyspark.sql import types as T

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _render(batches):
        import hashlib

        import pandas as pd

        from wq_data_pipeline_spark.operators.codecs import png_encode

        for pdf in batches:
            out = []
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                seed = hashlib.md5(str(text).encode()).hexdigest()
                pixels = b"".join(
                    hashlib.md5(f"{seed}:{c}".encode()).digest() for c in range(16)
                )
                out.append(
                    {"media_id": int(mid), "content": png_encode(16, 16, 1, pixels)}
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = d.mapInPandas(_render, media_schema)
    hashed = perceptual_hash(media)
    # bucket size as a WINDOW count (r13, guide §2.4): the old
    # groupBy(ahash)+join-back read `hashed` twice, so the whole
    # Python render+decode+hash chain (the entry's dominant cost, two
    # mapInPandas stages) executed TWICE per run — and the per-run
    # Python double-execution is exactly what kept tripping the
    # bench's worker-churn adjudication on this entry (VERDICT r12
    # #9). Same rows: count over the ahash partition == the joined
    # per-ahash count.
    from pyspark.sql import Window

    return hashed.withColumn(
        "n_same_hash", F.count(F.lit(1)).over(Window.partitionBy("ahash"))
    ).select(
        "media_id",
        "width",
        "height",
        "ahash",
        "n_same_hash",
        (F.col("n_same_hash") > 1).alias("is_dup_image"),
    )


# Oracle: replay the md5 pixel chain (PNG round-trip is lossless for
# 8-bit gray, pinned by tests/test_codecs.py), block-mean to 8x8 with
# floor division, threshold at the floor-mean of block means — every
# step integer, so the 64 bits match the engine's codec path exactly.
SQL_IMAGE_AHASH = """
WITH s AS (SELECT doc_id AS media_id, md5(text) AS seed FROM documents
           WHERE text IS NOT NULL),
idx AS (SELECT unnest(generate_series(0, 255)) AS i),
px AS (
  SELECT s.media_id, idx.i,
         ('0x' || substr(md5(s.seed || ':' || CAST(idx.i // 16 AS VARCHAR)),
                         (idx.i % 16) * 2 + 1, 2))::INT AS pix
  FROM s CROSS JOIN idx
),
blocks AS (
  SELECT media_id,
         ((i // 16) // 2) * 8 + ((i % 16) // 2) AS block,
         CAST(sum(pix) // 4 AS BIGINT) AS bm
  FROM px GROUP BY media_id, ((i // 16) // 2) * 8 + ((i % 16) // 2)
),
thr AS (SELECT media_id, CAST(sum(bm) // 64 AS BIGINT) AS t FROM blocks GROUP BY media_id),
bits AS (
  SELECT b.media_id,
         string_agg(CASE WHEN b.bm > t.t THEN '1' ELSE '0' END, '' ORDER BY b.block) AS ahash
  FROM blocks b JOIN thr t USING (media_id) GROUP BY b.media_id
),
cnt AS (SELECT ahash, count(*) AS n_same_hash FROM bits GROUP BY ahash)
SELECT media_id, 16 AS width, 16 AS height, ahash, n_same_hash,
       n_same_hash > 1 AS is_dup_image
FROM bits JOIN cnt USING (ahash)"""


QUERIES10["image_ahash"] = q_image_ahash
ORACLES10["image_ahash"] = SQL_IMAGE_AHASH
