"""Catalog batch 29 (round 9, third wave): six gaps a production
training-data pipeline hits that the catalog's neighbors don't cover —

- ``leak_free_split``  — dup-GROUP-aware train/val/test split: the
  whole order-insensitive-fingerprint group lands in ONE split
  (bucketed by the group fingerprint, not the doc id), plus an audit
  of how many groups a naive per-doc split (``hash_split``'s rule)
  would have torn across splits — i.e. the train→test leakage a
  doc-id split silently ships. ``hash_split`` is the reproducible
  per-doc primitive; ``decontaminate`` checks against an EXTERNAL
  benchmark; this is the third leg: self-leakage between splits.
- ``domain_top_cap``   — per-source HARD cap of the top-N docs by
  rank (longest first, doc_id tiebreak): the RefinedWeb/C4-style
  truncation knob, vs ``domain_rebalance``'s rate-based sampling.
  Real deployments plug any rank key (quality score, recency); the
  cap/report shape is identical.
- ``audio_energy``     — waveform analytics through the REAL codec
  path (the audio sibling of ``image_ahash``): deterministic 16-bit
  mono PCM clips (samples = md5 chain seeded by the document's
  content digest) are ENCODED with the stdlib ``wave`` writer,
  decoded back, and reduced to exact-integer loudness/activity
  features (sum |v|, sum v², peak, strict zero crossings) that
  double as a playback-dup key.
- ``txn_conflict_check`` — optimistic-concurrency write-write
  conflict detection between two concurrent change sets (the
  Delta/Iceberg commit-validation shape), pinned to the one-pass
  conditional-agg form instead of the naive two-filter self-join.
- ``mrl_recall``        — Matryoshka-truncation retrieval eval:
  recall@5 of prefix-dimension cosine vs the full-dimension ground
  truth, per truncation width (the dims-vs-recall curve behind
  dimension-truncated serving indexes).
- ``corpus_manifest``   — the dataset-release reproducibility
  manifest: per-(source, split) counts plus an ORDER-FREE mergeable
  content checksum (bit_xor of per-doc hashes — one map-side-
  combinable hash agg, vs the unbounded ordered-gather checksum).

Exactness: every emitted measure is an integer (BIGINT counts/sums,
INT peak) except mrl_recall's recall ratio — a single division of
exact counts rounded 6dp in both dialects — so value hashes cannot
flake on accumulation order.

Scale: leak_free_split is two map-side-combinable hash aggs (fp
group, then split rollup) — the corpus never joins back; domain_top_cap
is ONE per-source window sort whose grouping rollup reuses the same
partitioning; audio_energy is two chained narrow mapInPandas stages
(no shuffle between) + one feature-key window — Python-constant-bound
by design, like image_ahash.

Reference scope: the reference engine (WalterHet/wq_data_pipeline)
has no dedup/curation/multimodal surface; these extend the SURVEY §2.7
text-function and multimodal families per the round brief.

Oracle notes: the WAV clip is replayed in DuckDB straight from the
md5 chain (16-bit PCM round-trips losslessly through the stdlib
codec — pinned by tests/test_codecs.py), little-endian signed pairs
decoded as u - 65536 when u >= 32768; the lag-product zero-crossing
stays inside INT32 (32768² < 2³¹). sample_rate is read from the WAV
header engine-side and is a constant 8000 oracle-side, so the header
round-trip is cross-checked too.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators.text import doc_fingerprint
from wq_data_pipeline_spark.plans.queries_ext import (
    _Q,
    SQL_WORDS,
    _docs_parallel,
    _md5_bucket,
    _quantized,
    _split_of,
    _sql_split_case,
)
from wq_data_pipeline_spark.sources.testdata import load_table

# --- leak_free_split --------------------------------------------------------
# The 80/10/10 bucket rule (_split_of/_md5_bucket/_sql_split_case) is
# imported from queries_ext — the SAME objects hash_split publishes,
# so the group split here and the per-doc split there cannot drift.


def q_leak_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-group-aware train/val/test split + leakage audit. Every doc
    carries (a) its exact-dup group key — the order-insensitive word-set
    fingerprint shared by content duplicates — and (b) the naive
    per-doc split ``hash_split`` would assign from md5(doc_id). The
    GROUP split is bucketed from the group fingerprint itself, so all
    members of a dup group land in one split by construction (the law
    pinned in tests/test_round9c_entries.py); a group is *naive-leaky*
    if its members' per-doc splits disagree — exactly the groups a
    doc-id split would tear across train/test, turning held-out docs
    into memorized training dupes.

    Per split: group/doc/char counts, docs in multi-doc groups, and
    the naive-leaky group count. Scale: one fingerprint hash agg (the
    same shuffle ``exact_dedup`` pays) feeding a 3-row rollup; the
    corpus text never joins back and nothing is collected."""
    d = load_table(spark, sf_dir, "documents")
    naive = _split_of(
        _md5_bucket(F.md5(F.col("doc_id").cast("string")))
    )
    per_doc = d.select(
        doc_fingerprint("text").alias("fp"),
        naive.alias("naive_split"),
        "n_chars",
    )
    # size(collect_set) instead of countDistinct: the set is bounded at
    # 3 splits so state is O(1), and it avoids the distinct-agg expand
    # (one exchange fewer — (fp, split) pre-shuffle eliminated)
    g = per_doc.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.size(F.collect_set("naive_split")).cast("long").alias("n_naive_splits"),
    )
    return (
        g.select(
            _split_of(_md5_bucket(F.col("fp"))).alias("split"),
            "n_docs",
            "sum_chars",
            "n_naive_splits",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_chars").cast("long").alias("sum_chars"),
            F.sum(F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum((F.col("n_naive_splits") > 1).cast("long")).alias(
                "n_naive_leaky_groups"
            ),
        )
        .orderBy("split")
    )


# coalesce(...,'') mirrors the engine's concat_ws NULL rule: a NULL-text
# doc fingerprints as md5('') on BOTH sides (same group as empty text),
# so the entry is NULL-safe by construction, not by fixture luck.
SQL_LEAK_FREE_SPLIT = f"""{SQL_WORDS},
pd AS (
  SELECT md5(coalesce(array_to_string(list_sort(list_distinct(toks)), ' '), '')) AS fp,
         {_sql_split_case("md5(CAST(doc_id AS VARCHAR))")} AS naive_split,
         n_chars
  FROM w
),
g AS (
  SELECT fp,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         CAST(count(DISTINCT naive_split) AS BIGINT) AS n_naive_splits
  FROM pd GROUP BY fp
)
SELECT {_sql_split_case("fp")} AS split,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(sum_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN n_naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_naive_leaky_groups
FROM g GROUP BY 1 ORDER BY 1"""


# --- domain_top_cap ---------------------------------------------------------

_CAP = 15  # binds at every SF (25 docs/source at sf0.01, 250 at sf0.1)


def q_domain_top_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hard cap: keep the top-``_CAP`` docs per source by
    rank (n_chars DESC, doc_id ASC tiebreak — deterministic on any
    engine), report per source what survived and the admission cutoff.
    This is the RefinedWeb/C4-style per-domain truncation that stops a
    single crawl domain from dominating the mix — the CAP complement
    of ``domain_rebalance``'s rate-based keep. Real deployments swap
    the rank key for a quality score; the window/report shape is
    identical.

    Scale: ONE window sort partitioned by source (parallelism scales
    with source cardinality; a skewed mega-source is exactly the
    ``key_skew_profile`` → salting case), and the rollup groups by the
    window's own partition key so it reuses that exchange."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = d.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("rk")
    )
    kept = F.col("rk") <= _CAP
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars"))).cast("long").alias("kept_chars"),
            F.sum(F.when(~kept, F.col("n_chars")))
            .cast("long")
            .alias("dropped_chars"),
            F.min(F.when(kept, F.col("n_chars"))).cast("long").alias("cutoff_chars"),
        )
        .orderBy("source")
    )


SQL_DOMAIN_TOP_CAP = f"""
WITH r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rk <= {_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk > {_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN rk <= {_CAP} THEN n_chars END) AS BIGINT) AS kept_chars,
       CAST(sum(CASE WHEN rk > {_CAP} THEN n_chars END) AS BIGINT) AS dropped_chars,
       CAST(min(CASE WHEN rk <= {_CAP} THEN n_chars END) AS BIGINT) AS cutoff_chars
FROM r GROUP BY source ORDER BY source"""


# --- audio_energy -----------------------------------------------------------

_N_CHUNKS = 32  # md5 digests per clip; 8 int16 samples each -> 256 frames
_RATE = 8000


def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analytics through the REAL codec path: deterministic
    16-bit mono PCM clips (256 samples, little-endian int16 pairs from
    an md5 chain seeded by the document's content digest) are ENCODED
    with the stdlib ``wave`` writer, decoded back, and reduced to the
    exact-integer waveform features of
    :func:`multimodal.audio_features` — sum |v|, sum v², peak |v|,
    strict zero crossings. Duplicate documents produce byte-identical
    clips, so n_same_clip (count of clips sharing the full feature
    row) mirrors content dedup through the audio pipeline end-to-end —
    the WAV twin of ``image_ahash``.

    ORACLED despite the codec: 16-bit PCM round-trips losslessly
    (pinned by tests/test_codecs.py), so DuckDB replays the expected
    samples straight from the md5 chain and recomputes the all-integer
    features; sample_rate comes from the decoded header engine-side vs
    the constant oracle-side, cross-checking the header too. NULL-text
    docs are excluded symmetrically on both sides (a NULL doc has no
    content digest to seed the sample chain), so parity is NULL-safe
    by construction. Scale
    shape: two chained narrow mapInPandas stages (no shuffle between),
    then one window over the feature key."""
    from wq_data_pipeline_spark.operators.multimodal import audio_features
    from pyspark.sql import types as T

    d = (
        _docs_parallel(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("media_id"), "text")
    )

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _render(batches):
        import hashlib
        import struct

        import pandas as pd

        from wq_data_pipeline_spark.operators.codecs import wav_encode

        for pdf in batches:
            out = []
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                seed = hashlib.md5(str(text).encode()).hexdigest()
                raw = b"".join(
                    hashlib.md5(f"{seed}:{c}".encode()).digest()
                    for c in range(_N_CHUNKS)
                )
                samples = [v for (v,) in struct.iter_unpack("<h", raw)]
                out.append(
                    {"media_id": int(mid), "content": wav_encode(samples, rate=_RATE)}
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    feats = audio_features(d.mapInPandas(_render, media_schema))
    wdup = Window.partitionBy("sum_abs", "sum_sq", "peak_abs", "n_zero_cross")
    return feats.select(
        "media_id",
        "n_frames",
        "sample_rate",
        "sum_abs",
        "sum_sq",
        "peak_abs",
        "n_zero_cross",
        F.count(F.lit(1)).over(wdup).alias("n_same_clip"),
    )


# Replay: md5 hex digit pairs -> bytes; sample k of chunk c is bytes
# (2k, 2k+1) of md5(seed:c) little-endian -> u = b0 + 256*b1, signed
# v = u - 65536 when u >= 32768 (two's complement int16). Every
# feature is integer; v*lag(v) stays within INT32.
SQL_AUDIO_ENERGY = f"""
WITH s AS (SELECT doc_id AS media_id, md5(text) AS seed FROM documents
           WHERE text IS NOT NULL),
idx AS (SELECT unnest(generate_series(0, {_N_CHUNKS * 8 - 1})) AS i),
u AS (
  SELECT s.media_id, idx.i,
         ('0x' || substr(md5(s.seed || ':' || CAST(idx.i // 8 AS VARCHAR)),
                         (idx.i % 8) * 4 + 1, 2))::INT
       + 256 * ('0x' || substr(md5(s.seed || ':' || CAST(idx.i // 8 AS VARCHAR)),
                               (idx.i % 8) * 4 + 3, 2))::INT AS uv
  FROM s CROSS JOIN idx
),
v AS (
  SELECT media_id, i,
         CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS v
  FROM u
),
z AS (
  SELECT media_id, v,
         CASE WHEN v * lag(v) OVER (PARTITION BY media_id ORDER BY i) < 0
              THEN 1 ELSE 0 END AS zc
  FROM v
),
f AS (
  SELECT media_id,
         CAST(count(*) AS BIGINT) AS n_frames,
         CAST({_RATE} AS INTEGER) AS sample_rate,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
         CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
         CAST(max(abs(v)) AS INTEGER) AS peak_abs,
         CAST(sum(zc) AS BIGINT) AS n_zero_cross
  FROM z GROUP BY media_id
)
SELECT media_id, n_frames, sample_rate, sum_abs, sum_sq, peak_abs,
       n_zero_cross,
       count(*) OVER (PARTITION BY sum_abs, sum_sq, peak_abs, n_zero_cross)
         AS n_same_clip
FROM f"""


# --- txn_conflict_check -----------------------------------------------------

# two "concurrent transactions" carved from the change-log tail
# (ts_us above the 4/10 base cut, the same framing as the batch-27
# CDC entries): txn A = event_id % 3 == 1, txn B = event_id % 3 == 2
_TXN_LO_NUM = 4
_TXN_DEN = 10


def q_txn_conflict_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency commit check — the validation Delta /
    Iceberg run before committing one of two concurrent transactions:
    do the write sets intersect? Two txns are carved from the change
    log's tail (disjoint event_id residues, so they are genuinely
    concurrent writers over overlapping keys); per event_type the
    report counts each txn's written keys, the write-write conflict
    keys (both txns wrote the key — the serializable-isolation abort
    set), and the disjoint remainder that would commit cleanly.

    Scale shape: the naive form filters the log twice and inner-joins
    the two key sets — THREE shuffles of the same records plus a join
    whose output is the conflict set itself. This entry pins the
    one-pass form: a single per-key conditional aggregation (wrote_a /
    wrote_b as max-of-case flags) followed by a rollup on the key's
    own grouping prefix — the conflict set never materializes as join
    output, and the log shuffles ONCE.

    Reference scope: the reference engine has no transactional
    surface; this completes the lakehouse family (merge_upsert →
    cdc_* → vacuum_plan → conflict check)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    span = ev.agg(
        F.min("ts_us").alias("_t0"), F.max("ts_us").alias("_t1")
    ).select(
        F.expr(f"_t0 + (_t1 - _t0) * {_TXN_LO_NUM} DIV {_TXN_DEN}").alias(
            "_lo_us"
        )
    )
    tail = ev.join(F.broadcast(span)).filter(F.col("ts_us") > F.col("_lo_us"))
    res = F.col("event_id") % 3
    per_key = (
        tail.filter(res.isin(1, 2))
        .groupBy("event_type", "user_id")
        .agg(
            F.max((res == 1).cast("int")).alias("wrote_a"),
            F.max((res == 2).cast("int")).alias("wrote_b"),
        )
    )
    both = (F.col("wrote_a") == 1) & (F.col("wrote_b") == 1)
    return (
        per_key.groupBy("event_type")
        .agg(
            F.sum("wrote_a").cast("long").alias("n_keys_a"),
            F.sum("wrote_b").cast("long").alias("n_keys_b"),
            F.sum(both.cast("long")).alias("n_conflict_keys"),
            F.sum((~both).cast("long")).alias("n_clean_keys"),
        )
        .orderBy("event_type")
    )


SQL_TXN_CONFLICT_CHECK = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * {_TXN_LO_NUM} // {_TXN_DEN}
           AS lo_us
  FROM r
),
pk AS (
  SELECT event_type, user_id,
         max(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END) AS wrote_a,
         max(CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END) AS wrote_b
  FROM r, span
  WHERE ts_us > lo_us AND event_id % 3 IN (1, 2)
  GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(sum(wrote_a) AS BIGINT) AS n_keys_a,
       CAST(sum(wrote_b) AS BIGINT) AS n_keys_b,
       CAST(sum(CASE WHEN wrote_a = 1 AND wrote_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conflict_keys,
       CAST(sum(CASE WHEN wrote_a = 1 AND wrote_b = 1 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_clean_keys
FROM pk GROUP BY event_type ORDER BY event_type"""


# --- mrl_recall ---------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)  # prefix dims; 64 = full (recall 1 by identity)
_MRL_K = 5


def q_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval: retrieval recall@5 of
    PREFIX-dimension cosine (d = 8/16/32) against the full-dimension
    (64) ground truth, per truncation width — the standard quality
    curve behind dimension-truncated serving indexes (MRL, Kusupati et
    al. 2022: nested prefixes trade dims for recall; vector DBs ship
    exactly this knob). The full-dim row rides along as the identity
    check (recall exactly 1).

    Exactness: quantized-integer per-dim products (the family's
    round(x·1e7) BIGINT convention) make every prefix dot/norm an
    exact BIGINT fold, so cosine ties are bit-identical cross-engine
    and the (cos DESC, neighbor_id ASC) ranking is deterministic;
    recall is a single division of exact counts, rounded 6dp in both
    dialects.

    Scale shape: the per-dim product array is computed ONCE per
    (neighbor, query) pair; each prefix is a slice-fold of that array
    (no re-dot). One Generate (4 rows/pair), one (query, d) window,
    and ground-truth membership is a second window over the tiny
    top-k table — never a rank⋈rank join (the join form re-executed
    the corpus-scoring chain per consumer: E 11→6, G 3→1). Corpus
    scan is spread before the broadcast fan-out (single-file-scan
    rule). Like ``embed_cosine_topk`` (and by design): the EXACT
    ground truth costs O(corpus × queries) — the accepted envelope
    for an eval entry (replica exponent 0.46); production retrieval
    at scale uses the IVF/LSH/PQ entries, and this eval subsamples
    queries (here the %100 residue does exactly that).

    Reference scope: the reference engine has no embedding surface;
    extends the similarity family per the round brief."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized("embedding").alias("q")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    from wq_data_pipeline_spark.operators.scale import spread_small_scan

    j = (
        spread_small_scan(emb)
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    prod = F.zip_with("q", "qq", lambda a, b: a * b)

    def _fold(arr) -> F.Column:
        return F.aggregate(arr, F.lit(0).cast("long"), lambda s, x: s + x)

    def _cos_at(d: int) -> F.Column:
        dot = _fold(F.slice(prod, 1, d))
        n1 = _fold(F.slice(F.transform("q", lambda a: a * a), 1, d))
        n2 = _fold(F.slice(F.transform("qq", lambda a: a * a), 1, d))
        return dot.cast("double") / (
            F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double"))
        )

    scored = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("trunc_dim"), _cos_at(d).alias("cos_sim")
                    )
                    for d in _MRL_DIMS
                ]
            )
        ).alias("s"),
    ).select("query_id", "neighbor_id", "s.trunc_dim", "s.cos_sim")
    w = Window.partitionBy("query_id", "trunc_dim").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _MRL_K
    )
    # ground-truth membership as a WINDOW over the tiny top-k table,
    # not a rank⋈rank join: a join would make `ranked` a multi-consumer
    # subtree and re-execute the whole corpus-scoring chain per branch
    w_pair = Window.partitionBy("query_id", "neighbor_id")
    in_full = F.max(
        (F.col("trunc_dim") == max(_MRL_DIMS)).cast("int")
    ).over(w_pair)
    return (
        ranked.withColumn("in_full", in_full)
        .groupBy("trunc_dim")
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_ranked"),
            F.sum("in_full").cast("long").alias("sum_hits"),
        )
        .select(
            "trunc_dim",
            "n_queries",
            "n_ranked",
            "sum_hits",
            F.round(
                F.col("sum_hits").cast("double") / F.col("n_ranked").cast("double"),
                6,
            ).alias("recall_at_5"),
        )
        .orderBy("trunc_dim")
    )


def _mrl_cos_sql(d: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {d}), i -> a.q[i] * b.q[i])) AS DOUBLE)"
        f" / (sqrt(CAST(list_sum(list_transform(generate_series(1, {d}), i -> a.q[i] * a.q[i])) AS DOUBLE))"
        f" * sqrt(CAST(list_sum(list_transform(generate_series(1, {d}), i -> b.q[i] * b.q[i])) AS DOUBLE)))"
    )


SQL_MRL_RECALL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_Q}) AS BIGINT)) AS q
  FROM embeddings
),
scored AS (
  {" UNION ALL ".join(
    f'''SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         {d} AS trunc_dim, {_mrl_cos_sql(d)} AS cos_sim
  FROM q a JOIN q b ON b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id'''
    for d in _MRL_DIMS
  )}
),
ranked AS (
  SELECT * FROM (
    SELECT query_id, neighbor_id, trunc_dim,
           row_number() OVER (PARTITION BY query_id, trunc_dim
                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
    FROM scored
  ) WHERE rk <= {_MRL_K}
),
flagged AS (
  SELECT *, max(CASE WHEN trunc_dim = {max(_MRL_DIMS)} THEN 1 ELSE 0 END)
              OVER (PARTITION BY query_id, neighbor_id) AS in_full
  FROM ranked
)
SELECT trunc_dim,
       CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_ranked,
       CAST(sum(in_full) AS BIGINT) AS sum_hits,
       round(CAST(sum(in_full) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS recall_at_5
FROM flagged GROUP BY trunc_dim ORDER BY trunc_dim"""


# --- corpus_manifest ----------------------------------------------------------


def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility manifest — the checksummed per-(source, split)
    inventory a dataset release publishes (dataset cards / integrity
    audits): doc and char counts plus an ORDER-FREE content checksum
    (bit_xor of each doc's 60-bit md5 content hash, with the min/max
    hash as corroborating range facts). Any engine, any partitioning,
    any row order reproduces the same manifest; two corpus copies
    differ iff some manifest row differs (up to xor collisions).

    The order-free design IS the scale story: the obvious checksum —
    md5 over doc hashes concatenated in doc_id order — needs an
    ordered per-group gather (collect_list: unbounded state, one
    reduce task per group). bit_xor is commutative/associative, so it
    map-side combines like any sum: one hash agg over the corpus,
    O(1) state per group, mergeable across files/shards (the same
    property that makes it the standard content-set digest in
    replication anti-entropy checks).

    Splits are ``hash_split``'s published md5(doc_id) rule, so the
    manifest documents exactly the release that entry defines.

    Reference scope: the reference engine has no corpus/release
    surface; extends the curation family per the round brief."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return (
        d.select(
            "source",
            _split_of(
                _md5_bucket(F.md5(F.col("doc_id").cast("string")))
            ).alias("split"),
            "n_chars",
            h.alias("h"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.expr("bit_xor(h)").alias("checksum_xor"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
        .orderBy("source", "split")
    )


SQL_CORPUS_MANIFEST = f"""
WITH d AS (
  SELECT source,
         {_sql_split_case("md5(CAST(doc_id AS VARCHAR))")} AS split,
         n_chars,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
  FROM documents
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(bit_xor(h) AS BIGINT) AS checksum_xor,
       CAST(min(h) AS BIGINT) AS h_min,
       CAST(max(h) AS BIGINT) AS h_max
FROM d GROUP BY source, split ORDER BY source, split"""


QUERIES29: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "leak_free_split": q_leak_free_split,
    "domain_top_cap": q_domain_top_cap,
    "audio_energy": q_audio_energy,
    "txn_conflict_check": q_txn_conflict_check,
    "mrl_recall": q_mrl_recall,
    "corpus_manifest": q_corpus_manifest,
}

ORACLES29: dict[str, str] = {
    "leak_free_split": SQL_LEAK_FREE_SPLIT,
    "domain_top_cap": SQL_DOMAIN_TOP_CAP,
    "audio_energy": SQL_AUDIO_ENERGY,
    "txn_conflict_check": SQL_TXN_CONFLICT_CHECK,
    "mrl_recall": SQL_MRL_RECALL,
    "corpus_manifest": SQL_CORPUS_MANIFEST,
}
