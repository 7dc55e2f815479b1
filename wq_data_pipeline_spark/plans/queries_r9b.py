"""Catalog batch 28 (round 9, second wave): depth on the two families
the r8 VERDICT called the engine's core value at 100 TB — the
lakehouse/CDC surface (``queries_r9.py``) and the dedup stack
(``operators/dedup.py``) — plus the operational diagnosis that decides
HOW those jobs run (key-skew profiling → salting / AQE skew-join
choices, the knob SURVEY §6's scale notes hang on).

- ``cdc_time_travel``     — VERSION AS OF read over the merge-on-read
  layout: base snapshot + change log replayed only up to a PAST
  version cut. The pytest invariant pins the lakehouse law that the
  MoR path must equal a direct resolution of all records ≤ as-of.
- ``incremental_dedup``   — novelty triage of an incoming batch
  against the existing corpus: exact (order-insensitive fingerprint)
  → near (batch×corpus MinHash-LSH banding + exact-Jaccard verify)
  → novel. The incremental-ingest shape: the corpus is joined, never
  self-joined, so each ingest pays O(|batch| + matched buckets).
- ``key_skew_profile``    — per-group key-frequency skew diagnosis
  (max/avg ratio, hot-key count, top key) over events.user_id: the
  input that decides salting factors and flags AQE skew-join cases.
- ``containment_pairs``   — asymmetric containment |A∩B|/|A| next to
  Jaccard over the bounded candidate set: the subset-duplication
  (quotation/wholesale-inclusion) detector Jaccard misses.

Exactness: statuses/ids/counts are integers or strings; Jaccard and
containment are single divisions of exact integer cardinalities
(bit-identical cross-engine); skew_ratio divides two exact BIGINTs,
rounded 6dp in both dialects; version cuts are µs BIGINT integer-DIV
(DuckDB ``//``) per the batch-27 convention.

Scale: nothing here collects, crosses, or self-joins an unbounded
side. The time-travel read rides the same one key-window shuffle as
``cdc_merge_on_read``; incremental dedup's corpus side is band-
bucketed with the hot-bucket guard (corpus buckets > max_df dropped);
the skew profile is two map-side-combinable hash aggs; containment
verifies an equi-join-bounded candidate set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators import dedup as DD
from wq_data_pipeline_spark.plans.queries_ext import (
    _MH_K,
    _MH_MAXDF,
    _MH_R,
    SQL_WORDS,
    _docs_parallel,
    _minhash_sig_sql,
    _shingles_sql,
    _simhash_sql_bits,
)
from wq_data_pipeline_spark.plans.queries_r9 import _KEY, _LO_NUM, _DEN, _latest
from wq_data_pipeline_spark.sources.testdata import load_table

# --- cdc_time_travel --------------------------------------------------------

# as-of version cut, in hundredths of the observed µs span: strictly
# between the batch-27 base cut (4/10 = 40/100) and log head (7/10),
# so the read replays a strict PREFIX of the change log
_TT_NUM = 55
_TT_DEN = 100


def _tt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-27 CDC framing of events (key (user_id, event_type),
    sequence (ts_us, event_id), op = D on event_id%5==0) with the base
    cut (4/10 of span) and the as-of cut (55/100) broadcast onto every
    row — same 1-row-agg cross-join scalar pattern as
    ``queries_r9._records``, integer DIV for both cuts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    span = ev.agg(
        F.min("ts_us").alias("_t0"), F.max("ts_us").alias("_t1")
    ).select(
        F.expr(f"_t0 + (_t1 - _t0) * {_LO_NUM} DIV {_DEN}").alias("_lo_us"),
        F.expr(f"_t0 + (_t1 - _t0) * {_TT_NUM} DIV {_TT_DEN}").alias(
            "_asof_us"
        ),
    )
    return ev.join(F.broadcast(span))


def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel (``VERSION AS OF``) over the merge-on-read layout:
    reconstruct the table as of a PAST version cut (55/100 of the ts
    span) from the base snapshot compacted at an OLDER cut (4/10) plus
    the change log replayed only through the as-of point — upserts and
    delete markers resolved per key by (ts, event_id); a winning
    delete removes the key from that version. This is the read path
    Delta/Iceberg time travel executes when the requested version
    predates the latest compaction: base file + log prefix, never a
    full-history replay.

    Law (pinned in tests/test_round9b_entries.py): the base+log-prefix
    path must equal a direct latest-per-key resolution of ALL records
    ≤ as-of — reading an old version from a newer physical layout can
    never change the answer.

    Scale: base and log prefix are filters of ONE scan; resolution is
    the same single key-window shuffle ``cdc_merge_on_read`` pays —
    time travel costs no more than the current-version read."""
    r = _tt_records(spark, sf_dir)
    base = (
        r.filter(F.col("ts_us") <= F.col("_lo_us"))
        .withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .select(*_KEY, "ts_us", "event_id", "value", "op")
        .withColumn("from_log", F.lit(False))
    )
    log = (
        r.filter(
            (F.col("ts_us") > F.col("_lo_us"))
            & (F.col("ts_us") <= F.col("_asof_us"))
        )
        .select(*_KEY, "ts_us", "event_id", "value", "op")
        .withColumn("from_log", F.lit(True))
    )
    merged = base.unionByName(log)
    return (
        merged.withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .select("user_id", "event_type", "ts_us", "value", "from_log")
    )


SQL_CDC_TIME_TRAVEL = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * {_LO_NUM} // {_DEN} AS lo_us,
         min(ts_us) + (max(ts_us) - min(ts_us)) * {_TT_NUM} // {_TT_DEN}
           AS asof_us
  FROM r
),
base AS (
  SELECT user_id, event_type, ts_us, event_id, value, op, FALSE AS from_log
  FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM r, span WHERE ts_us <= lo_us
  ) WHERE rn = 1 AND op = 'U'
),
log AS (
  SELECT user_id, event_type, ts_us, event_id, value, op, TRUE AS from_log
  FROM r, span WHERE ts_us > lo_us AND ts_us <= asof_us
),
merged AS (SELECT * FROM base UNION ALL SELECT * FROM log)
SELECT user_id, event_type, ts_us, value, from_log FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM merged
) WHERE rn = 1 AND op = 'U'"""


# --- incremental_dedup ------------------------------------------------------

_NEAR_J = 0.8  # near-dup threshold, same as the minhash_lsh_pairs family


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup triage: treat doc_id%10==0
    as the incoming ingest batch and the rest as the existing corpus,
    and classify every batch doc WITHOUT ever self-joining the corpus:

    - ``exact_dup``: order-insensitive word-set fingerprint matches a
      corpus doc (match = smallest such corpus id);
    - ``near_dup``: a MinHash-LSH band key (k=32, 4 rows/band, corpus
      hot-bucket guard at 100) matches a corpus doc AND the exact
      word-set Jaccard of the best candidate (max Jaccard, ties to the
      smaller corpus id) is >= 0.8;
    - ``novel``: neither.

    This is the ingest-time shape of Lee et al. 2022-style dedup: the
    corpus band rows are a pure function of the corpus (bucketable,
    persisted once — see sources/bucketed.py), so each new batch pays
    one fingerprint hash-join plus one band equi-join against matched
    buckets only. Re-running corpus×corpus per ingest is the 100-TB
    anti-pattern this entry exists to replace (the full self-join
    remains available as ``minhash_lsh_pairs``).

    Reference scope: the reference engine has no dedup surface; this
    extends SURVEY §2.7's text-function family per the round brief.
    """
    d = _docs_parallel(spark, sf_dir)
    is_new = F.col("doc_id") % 10 == 0
    newd = d.filter(is_new)
    corp = d.filter(~is_new)

    cfp = (
        corp.select(DD.doc_fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("exact_id"))
    )
    exact = (
        newd.select("doc_id", DD.doc_fingerprint("text").alias("fp"))
        .join(cfp, "fp", "left")
        .select("doc_id", "exact_id")
    )

    cand = DD.incremental_lsh_candidates(
        newd,
        corp,
        "text",
        "doc_id",
        num_hashes=_MH_K,
        rows_per_band=_MH_R,
        max_df=_MH_MAXDF,
    )
    pairs = cand.select(
        F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b")
    )
    j = DD.jaccard_pairs(d, pairs, "text", "doc_id")
    best = (
        j.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("id_a").orderBy(
                    F.desc("jaccard"), F.asc("id_b")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id_a").alias("doc_id"),
            F.col("id_b").alias("near_id"),
            F.col("jaccard").alias("near_j"),
        )
    )

    out = exact.join(best, "doc_id", "left")
    is_exact = F.col("exact_id").isNotNull()
    is_near = F.col("near_j") >= _NEAR_J  # NULL near_j -> NULL -> not near
    return out.select(
        "doc_id",
        F.when(is_exact, F.lit("exact_dup"))
        .when(is_near, F.lit("near_dup"))
        .otherwise(F.lit("novel"))
        .alias("status"),
        F.when(is_exact, F.col("exact_id"))
        .when(is_near, F.col("near_id"))
        .alias("match_id"),
        F.when(~is_exact & is_near, F.col("near_j")).alias("jaccard"),
    )


def _incremental_bands_sql(num_hashes: int, rows_per_band: int) -> str:
    """bands CTE (doc_id, band, key) — the SQL mirror of
    ``dedup._band_rows``: sig columns from queries_ext's shared
    builders, unpivoted one band per row."""
    n_bands = (num_hashes + rows_per_band - 1) // rows_per_band
    unpivot = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, band{b} AS key FROM sig"
        for b in range(n_bands)
    )
    return (
        f"sh AS (SELECT doc_id, {_shingles_sql()} AS sh FROM w),\n"
        f"sig AS (\n  SELECT doc_id,\n"
        f"         {_minhash_sig_sql(num_hashes, rows_per_band)}\n  FROM sh\n),\n"
        f"bands AS (\n  {unpivot}\n)"
    )


SQL_INCREMENTAL_DEDUP = f"""{SQL_WORDS},
ws AS (SELECT doc_id, list_distinct(toks) AS ws FROM w),
fp AS (
  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
  FROM w
),
exact AS (
  SELECT n.doc_id, min(c.doc_id) AS exact_id
  FROM fp n JOIN fp c ON n.fp = c.fp AND c.doc_id % 10 <> 0
  WHERE n.doc_id % 10 = 0 GROUP BY n.doc_id
),
{_incremental_bands_sql(_MH_K, _MH_R)},
cb AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 10 <> 0),
guard AS (
  SELECT band, key FROM cb GROUP BY band, key HAVING count(*) <= {_MH_MAXDF}
),
cg AS (SELECT cb.doc_id, cb.band, cb.key FROM cb JOIN guard USING (band, key)),
nb AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 10 = 0),
cand AS (
  SELECT DISTINCT nb.doc_id AS id_a, cg.doc_id AS id_b
  FROM nb JOIN cg USING (band, key)
),
jac AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE)
           AS jaccard
  FROM cand JOIN ws a ON cand.id_a = a.doc_id
            JOIN ws b ON cand.id_b = b.doc_id
),
best AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT id_a, id_b, jaccard,
           row_number() OVER (PARTITION BY id_a
                              ORDER BY jaccard DESC, id_b ASC) AS rn
    FROM jac
  ) WHERE rn = 1
)
SELECT n.doc_id,
       CASE WHEN e.exact_id IS NOT NULL THEN 'exact_dup'
            WHEN b.jaccard >= {_NEAR_J} THEN 'near_dup'
            ELSE 'novel' END AS status,
       CASE WHEN e.exact_id IS NOT NULL THEN e.exact_id
            WHEN b.jaccard >= {_NEAR_J} THEN b.id_b END AS match_id,
       CASE WHEN e.exact_id IS NULL AND b.jaccard >= {_NEAR_J}
            THEN b.jaccard END AS jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) n
LEFT JOIN exact e ON n.doc_id = e.doc_id
LEFT JOIN best b ON n.doc_id = b.id_a"""


# --- key_skew_profile -------------------------------------------------------


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis per event_type over events.user_id — the
    measurement that decides the engine's own shuffle strategy: a
    skew_ratio (hottest key count / mean key count) near 1 means plain
    hash partitioning is fine; large ratios or a fat n_hot_keys tail
    (keys strictly above 2× the mean) call for salting
    (``salted_user_stats``) or AQE skew-join handling. top_user_id
    (ties to the smallest id) names the key to salt first.

    Integer-exact: the hot-key predicate compares cnt·n_keys >
    2·n_rows in BIGINT (no division); skew_ratio is the single
    double division, rounded 6dp in both dialects.

    Scale: ONE per-key count aggregation (the same shuffle the
    downstream job would pay anyway) feeds everything — group stats,
    top key, and the hot-key predicate all come from one window pass
    over the counts (two window specs, same event_type partitioning →
    one exchange) plus a final already-co-partitioned rollup. The
    naive 3-branch form (separate agg/top/hot consumers of the
    counts) re-shuffles the per-key counts three times; at 100 TB
    that triples the dominant stage, so this entry pins the
    single-pass shape (E budget 3 in test_plan_budget)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wg = Window.partitionBy("event_type")
    wr = wg.orderBy(F.desc("cnt"), F.asc("user_id"))
    cw = c.select(
        "event_type",
        "user_id",
        "cnt",
        F.count(F.lit(1)).over(wg).alias("n_keys"),
        F.sum("cnt").over(wg).alias("n_rows"),
        F.row_number().over(wr).alias("_rn"),
    )
    return (
        cw.groupBy("event_type")
        .agg(
            F.max("n_keys").alias("n_keys"),
            F.max("n_rows").alias("n_rows"),
            F.max("cnt").alias("max_rows"),
            F.min(F.when(F.col("_rn") == 1, F.col("user_id"))).alias(
                "top_user_id"
            ),
            F.sum(
                (F.col("cnt") * F.col("n_keys") > 2 * F.col("n_rows")).cast(
                    "long"
                )
            ).alias("n_hot_keys"),
        )
        .select(
            "event_type",
            "n_keys",
            "n_rows",
            "max_rows",
            "top_user_id",
            F.round(
                (F.col("max_rows") * F.col("n_keys")).cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
            "n_hot_keys",
        )
        .orderBy("event_type")
    )


SQL_KEY_SKEW_PROFILE = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         count(*) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         max(cnt) AS max_rows
  FROM c GROUP BY 1
),
top AS (
  SELECT event_type, user_id AS top_user_id FROM (
    SELECT event_type, user_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cnt DESC, user_id ASC) AS rn
    FROM c
  ) WHERE rn = 1
),
hot AS (
  SELECT c.event_type, count(*) AS n_hot_keys
  FROM c JOIN agg USING (event_type)
  WHERE c.cnt * agg.n_keys > 2 * agg.n_rows
  GROUP BY 1
)
SELECT agg.event_type, n_keys, n_rows, max_rows, top_user_id,
       round(CAST(max_rows * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS skew_ratio,
       CAST(coalesce(n_hot_keys, 0) AS BIGINT) AS n_hot_keys
FROM agg JOIN top USING (event_type) LEFT JOIN hot USING (event_type)
ORDER BY event_type"""


# --- containment_pairs ------------------------------------------------------

_CONT_T = 0.5  # report threshold on containment


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric word-set containment |A∩B|/|A| (with Jaccard
    alongside) over the same bounded candidate set as
    ``jaccard_pairs`` (anchors doc_id%5==0 vs the next 25 ids, as an
    exploded equi-join — never a nested loop). Containment >= 0.5
    surfaces subset duplication — an anchor quoted wholesale inside a
    longer doc scores containment ~1 while its Jaccard stays below
    any dedup threshold; dedup pipelines report both for exactly this
    case (Lee et al. 2022 §4)."""
    d = load_table(spark, sf_dir, "documents")
    ids = d.select("doc_id")
    a = (
        ids.filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            F.explode(F.sequence(F.lit(1), F.lit(25))).alias("_off"),
        )
        .select("id_a", (F.col("id_a") + F.col("_off")).alias("id_b"))
    )
    b = ids.select(F.col("doc_id").alias("id_b"))
    pairs = a.join(b, on="id_b")
    c = DD.containment_pairs(d, pairs, "text", "doc_id", restrict=False)
    return c.filter(F.col("containment") >= _CONT_T)


SQL_CONTAINMENT_PAIRS = f"""{SQL_WORDS},
ws AS (SELECT doc_id, list_distinct(toks) AS ws FROM w)
SELECT id_a, id_b, containment, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / CAST(len(a.ws) AS DOUBLE) AS containment,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE)
           AS jaccard
  FROM ws a JOIN ws b
    ON a.doc_id % 5 = 0 AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 25
  WHERE len(a.ws) > 0
) WHERE containment >= {_CONT_T}"""


# --- dedup_keep_best --------------------------------------------------------


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based canonical selection: within each order-insensitive
    word-set fingerprint group, keep the LONGEST variant (max n_chars,
    ties to the smaller doc_id) instead of ``fingerprint_dedup``'s
    min-id. This is how production curation picks survivors — dedup
    keeps the best-quality duplicate (longest / highest-scoring), not
    an arbitrary one, because near-identical variants often differ by
    truncation. Per-doc output (canonical_id, group_size, is_kept);
    singletons are their own canonical.

    Scale: one hash per doc + a single fingerprint-partitioned window
    (two specs, same partitioning → one shuffle), no joins."""
    d = _docs_parallel(spark, sf_dir)
    d = d.withColumn("_fp", DD.doc_fingerprint("text"))
    wg = Window.partitionBy("_fp")
    wo = wg.orderBy(F.desc("n_chars"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        "doc_id",
        F.first("doc_id").over(wo).alias("canonical_id"),
        F.count(F.lit(1)).over(wg).alias("group_size"),
        (F.col("doc_id") == F.first("doc_id").over(wo)).alias("is_kept"),
    )


SQL_DEDUP_KEEP_BEST = f"""{SQL_WORDS},
fp AS (
  SELECT doc_id, n_chars,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
  FROM w
)
SELECT doc_id,
       first_value(doc_id) OVER kept AS canonical_id,
       CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS group_size,
       doc_id = first_value(doc_id) OVER kept AS is_kept
FROM fp
WINDOW kept AS (PARTITION BY fp ORDER BY n_chars DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""


# --- simhash_near_pairs -----------------------------------------------------

_SH_WORD_BITS = 32
_SH_WORDS = 2  # 64-bit fingerprint = two independently-salted 32-bit words
_SH_BANDS = 4  # -> 16-bit blocks, Manku's production configuration
_SH_MAXH = 3


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 3 via
    Hamming-block banding (Manku et al. 2007): a 64-bit fingerprint
    (two independently-salted 32-bit portable simhashes — md5 yields
    32 usable bits per expression) split into 4×16-bit blocks;
    distance <= 3 < 4 blocks guarantees agreement on a whole block
    (pigeonhole), so the per-block equi-join has recall 1.0 —
    deterministic, unlike MinHash-LSH's probabilistic banding — and
    only block collisions pay the popcount verify, map-side, before
    any shuffle. 16-bit blocks are the scale knob: chance collisions
    grow n²/65 536 (the 8-bit-block prototype measured 10×
    superlinear at 50k docs; this shape re-measured ~linear)."""
    d = _docs_parallel(spark, sf_dir)
    return DD.simhash_hamming_pairs(
        d,
        "text",
        "doc_id",
        n_words=_SH_WORDS,
        word_bits=_SH_WORD_BITS,
        n_bands=_SH_BANDS,
        max_hamming=_SH_MAXH,
    )


def _sh_band_sql() -> str:
    block = _SH_WORDS * _SH_WORD_BITS // _SH_BANDS
    per_word = _SH_WORD_BITS // block
    parts = [
        f"SELECT doc_id, sh0, sh1, {b} AS band, "
        f"(sh{b // per_word} // {1 << ((b % per_word) * block)}) % {1 << block} AS key FROM s"
        for b in range(_SH_BANDS)
    ]
    return "\n  UNION ALL\n  ".join(parts)


SQL_SIMHASH_NEAR_PAIRS = f"""{SQL_WORDS},
d AS (SELECT doc_id, list_distinct(toks) AS ws FROM w),
s AS (SELECT doc_id,
        CAST({_simhash_sql_bits(_SH_WORD_BITS, DD.SIMHASH_SALTS[0])} AS BIGINT) AS sh0,
        CAST({_simhash_sql_bits(_SH_WORD_BITS, DD.SIMHASH_SALTS[1])} AS BIGINT) AS sh1
      FROM d),
bands AS (
  {_sh_band_sql()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sh0 AS a0, a.sh1 AS a1, b.sh0 AS b0, b.sh1 AS b1
  FROM bands a JOIN bands b USING (band, key)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) <= {_SH_MAXH}"""


# --- incremental_agg_maintenance --------------------------------------------


def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the CDC stream — the
    materialized-aggregate law, executed: a per-event_type aggregate
    (live keys, sum of values in integer cents) materialized at
    version lo (4/10 cut) is MAINTAINED to version hi (7/10) by
    applying only the net change set (``cdc_changes_between``):
    insert → (+1, +post), delete → (−1, −pre), update → (0,
    post−pre). The DuckDB oracle computes the hi aggregate DIRECTLY
    from the resolved view, so the driver's hash equality IS the IVM
    law cross-engine: maintain(agg(lo), changes(lo,hi)) == agg(hi).

    This is how a 100-TB pipeline keeps dashboards current: the
    maintenance side touches |changed keys| rows (here the lo
    aggregate is derived in-plan because nothing is persisted between
    driver queries; in production it is the stored matview), never
    re-aggregating the table. Delete/re-insert, no-op keys (absent
    before AND deleted within the window), and pre-image-less inserts
    all flow through the change-type table — the cases that break
    naive delta scripts.

    Exactness: counts are BIGINT; value sums use the repo's integer-
    cents convention (CAST(round(value*100) AS BIGINT)), so the
    maintained and direct sums are bit-identical."""
    from wq_data_pipeline_spark.plans.queries_r9 import (
        _records,
        q_cdc_changes_between,
    )

    r = _records(spark, sf_dir)
    cents = lambda c: F.round(F.col(c) * 100).cast("long")
    view_lo = (
        r.filter(F.col("ts_us") <= F.col("_lo_us"))
        .withColumn("_rn", F.row_number().over(_latest(_KEY)))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
    )
    agg_lo = view_lo.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_lo"),
        F.sum(cents("value")).alias("sum_lo"),
    )
    ch = q_cdc_changes_between(spark, sf_dir)
    delta = ch.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("change_type") == "insert", 1)
            .when(F.col("change_type") == "delete", -1)
            .otherwise(0)
        ).alias("dn"),
        F.sum(
            F.coalesce(cents("post_value"), F.lit(0))
            - F.coalesce(cents("pre_value"), F.lit(0))
        ).alias("dsum"),
    )
    return (
        agg_lo.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_lo", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long")
            .alias("n_keys"),
            (F.coalesce("sum_lo", F.lit(0)) + F.coalesce("dsum", F.lit(0)))
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy("event_type")
    )


# the oracle is the DIRECT aggregate at hi — equality proves the
# maintenance path
SQL_INCREMENTAL_AGG_MAINTENANCE = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * 7 // {_DEN} AS cut_us
  FROM r
),
v AS (
  SELECT user_id, event_type, value FROM (
    SELECT r.*, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM r, span WHERE ts_us <= cut_us
  ) WHERE rn = 1 AND op = 'U'
)
SELECT event_type,
       count(*) AS n_keys,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM v GROUP BY event_type ORDER BY event_type"""


# --- vacuum_plan -------------------------------------------------------------


def q_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention vacuum planner (Delta VACUUM / Iceberg
    expire_snapshots semantics): with every version at or after the
    oldest retained cut (7/10 of the span) retained for time travel,
    a change record is UNREACHABLE — safe to vacuum — iff it is at or
    before the retained horizon AND not its key's winner there
    (superseded before any retained version can see it). Winners stay
    even when they are delete markers: reading the horizon version
    from raw records needs the tombstone. Records after the horizon
    always stay (some retained version sees each). Emits the per-
    bucket rewrite economics: record counts, vacuumable share, and
    how many vacuumable records are tombstones (a delete-heavy purge
    shrinks files the most).

    Scale: one key-window shuffle (the winner rank at the horizon) +
    one map-side-combinable rollup to 32 bucket rows — the same
    shape family as ``compaction_plan``."""
    r = _records_vac(spark, sf_dir)
    horizon = F.col("ts_us") <= F.col("_h_us")
    w = Window.partitionBy(*_KEY, "_pre").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    d = (
        r.withColumn("_pre", horizon)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("vacuumable", F.col("_pre") & (F.col("_rn") > 1))
    )
    return (
        d.groupBy((F.col("user_id") % 32).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.col("vacuumable").cast("long")).alias("n_vacuumable"),
            F.sum(
                (F.col("vacuumable") & (F.col("op") == "D")).cast("long")
            ).alias("n_tombstones_vacuumable"),
        )
        .select(
            "bucket",
            "n_records",
            "n_vacuumable",
            "n_tombstones_vacuumable",
            F.round(
                F.col("n_vacuumable").cast("double")
                / F.col("n_records").cast("double"),
                6,
            ).alias("vacuum_pct"),
        )
        .orderBy("bucket")
    )


def _records_vac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC records with the retention horizon (7/10 cut) broadcast on."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    span = ev.agg(
        F.min("ts_us").alias("_t0"), F.max("ts_us").alias("_t1")
    ).select(F.expr(f"_t0 + (_t1 - _t0) * 7 DIV {_DEN}").alias("_h_us"))
    return ev.join(F.broadcast(span))


SQL_VACUUM_PLAN = f"""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN event_id % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
span AS (
  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) * 7 // {_DEN} AS h_us
  FROM r
),
d AS (
  SELECT r.*, ts_us <= h_us AS pre,
         row_number() OVER (PARTITION BY user_id, event_type, ts_us <= h_us
                            ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM r, span
)
SELECT user_id % 32 AS bucket,
       count(*) AS n_records,
       CAST(sum(CASE WHEN pre AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_vacuumable,
       CAST(sum(CASE WHEN pre AND rn > 1 AND op = 'D' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tombstones_vacuumable,
       round(CAST(sum(CASE WHEN pre AND rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS vacuum_pct
FROM d GROUP BY 1 ORDER BY 1"""


QUERIES28: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_time_travel": q_cdc_time_travel,
    "incremental_dedup": q_incremental_dedup,
    "key_skew_profile": q_key_skew_profile,
    "containment_pairs": q_containment_pairs,
    "dedup_keep_best": q_dedup_keep_best,
    "simhash_near_pairs": q_simhash_near_pairs,
    "incremental_agg_maintenance": q_incremental_agg_maintenance,
    "vacuum_plan": q_vacuum_plan,
}

ORACLES28: dict[str, str] = {
    "cdc_time_travel": SQL_CDC_TIME_TRAVEL,
    "incremental_dedup": SQL_INCREMENTAL_DEDUP,
    "key_skew_profile": SQL_KEY_SKEW_PROFILE,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "simhash_near_pairs": SQL_SIMHASH_NEAR_PAIRS,
    "incremental_agg_maintenance": SQL_INCREMENTAL_AGG_MAINTENANCE,
    "vacuum_plan": SQL_VACUUM_PLAN,
}
