"""Scale-machinery entries (r4, late batch): operators whose point is
the 100-TB execution shape, made driver-visible with DuckDB oracles.

* ``salted_user_stats`` — the aggregation-side skew treatment
  (``operators/scale.py:salted_agg``): two-phase groupBy where one hot
  key is spread over 16 deterministic salts in phase 1, so no single
  reducer owns a hot key's whole row stream. AQE skew handling covers
  sort-merge joins only; this is the agg equivalent. Oracle = plain
  GROUP BY (the two-phase form must be value-identical).
* ``dup_spans`` — exact-substring duplicate spans (the token-level
  dedup of Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better", arXiv:2107.06499, approximated at n-gram
  granularity instead of suffix arrays): hash every word 8-gram, keep
  grams shared by >= 2 docs, and merge overlapping duplicated
  positions per doc into maximal spans (gaps-and-islands).
* ``pq_encode`` — product-quantization codes (Jégou et al. 2011):
  split the 64-dim embedding into 4 sub-vectors and assign each to
  the nearest of 16 deterministic codebook centroids. PQ is the
  memory path real billion-vector ANN runs on (codes are 4 bytes vs
  256 for the raw vector); distances are quantized-integer exact so
  the oracle hash can't flake on floats.
* ``event_dedup_window`` — batch mirror of the streaming
  watermark-dedup (`streaming/stream_qc.py:stream_dedup_exact`):
  keep the first event per (user_id, event_type, 10-min tumbling
  window), deterministic tie-break on (ts, event_id).

Scale shapes: salted_user_stats is two map-side-combinable hash aggs
(phase 2 touches n_salts rows/key); dup_spans is one corpus-sized
hash agg + one hash join on the gram hash + a per-doc window (each
gram hashed once — the same no-rescan discipline as the winnowing
rewrite); pq_encode broadcasts a 64-row codebook (16 centroids × 4
subspaces) against the vector scan — no shuffle at all on the big
side until the final per-vector agg, which AQE coalesces;
event_dedup_window is one window over (user, type, window) — the
partition count scales with key cardinality, not data volume.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.operators.text import gram_hash, tokens, shingles_from_tokens
from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel
from wq_data_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------- salted agg

_N_SALTS = 16


def q_salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats via the two-phase salted aggregation.
    Values aggregated in integer cents (exact BIGINT sums); the
    derived mean is rounded to 6 decimals outside the salted core."""
    from wq_data_pipeline_spark.operators.scale import salted_agg

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = salted_agg(
        ev,
        ["user_id"],
        [
            ("event_id", "count", "n_events"),
            ("cents", "sum", "sum_cents"),
            ("cents", "min", "min_cents"),
            ("cents", "max", "max_cents"),
        ],
        n_salts=_N_SALTS,
        salt_source="event_id",
    )
    return out.withColumn(
        "avg_cents",
        F.round(F.col("sum_cents").cast("double") / F.col("n_events"), 6),
    )


SQL_SALTED_USER_STATS = """
WITH e AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, count(event_id) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       min(cents) AS min_cents, max(cents) AS max_cents,
       round(CAST(sum(cents) AS DOUBLE) / count(event_id), 6) AS avg_cents
FROM e GROUP BY user_id"""


# ----------------------------------------------------------------- dup spans

_SPAN_N = 8  # token n-gram width; two docs sharing >= 8 consecutive tokens hit


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans: positions whose word 8-gram
    occurs in >= 2 documents, merged into maximal per-doc token spans.
    Gram sharing counted with an exact distinct (swap to HLL++
    approx_count_distinct at 100 TB — documented trade, the join shape
    is unchanged). Covered intervals [pos, pos+7] merge when the next
    duplicated position starts within 8 tokens of the previous."""
    d = _docs_parallel(spark, sf_dir)  # md5-heavy explode: spread the 1-file scan
    g = d.select(
        "doc_id",
        F.posexplode(shingles_from_tokens(tokens("text"), _SPAN_N)).alias("pos", "g"),
    ).select("doc_id", "pos", gram_hash(F.col("g")).alias("h"))
    # ONE gram build (r13, guide §2.4 / VERDICT r12 #4): the old
    # groupBy(h)+join-back read `g` twice, so the tokenize+md5 explode
    # executed twice (plan: 2 Generates). Two-level instead: (h, doc)
    # partial agg (map-side combinable — positions of one gram in one
    # doc collect locally), then nd = count of DOC rows per gram via a
    # window over h (countDistinct(doc) ≡ count(*) at the (h, doc)
    # grain), and the positions re-explode. Same rows, same nd.
    g2 = g.groupBy("h", "doc_id").agg(F.collect_list("pos").alias("_ps"))
    wh = Window.partitionBy("h")
    hits = (
        g2.withColumn("nd", F.count(F.lit(1)).over(wh))
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("_ps").alias("pos"), "nd")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_N, 1).otherwise(0)
    isl = hits.withColumn("island", F.sum(brk).over(w))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(_SPAN_N - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(_SPAN_N)).alias("span_len"),
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.max("nd").alias("max_docs_sharing"),
        )
        .drop("island")
    )


SQL_DUP_SPANS = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' ')), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS i
        FROM w WHERE len(toks) >= {_SPAN_N})
),
dup AS (
  SELECT h, count(DISTINCT doc_id) AS nd FROM g GROUP BY h
  HAVING count(DISTINCT doc_id) >= 2
),
hits AS (SELECT doc_id, pos, nd FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos, nd,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_N}
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos, nd,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {_SPAN_N - 1} AS span_end,
       max(pos) - min(pos) + {_SPAN_N} AS span_len,
       count(*) AS n_dup_grams,
       max(nd) AS max_docs_sharing
FROM isl GROUP BY doc_id, island"""


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rewrite for exact-substring dedup: every duplicated span
    is removed from all docs EXCEPT the lowest doc_id among the docs
    sharing the span's FIRST 8-gram (a deterministic approximation of
    the "keep one occurrence" rule of Lee et al. 2022). Emits per-doc
    token counts and an md5 of the reassembled cleaned text —
    hash-exact evidence the reconstruction matches without shipping
    the corpus through the compare (same trick as line_dedup).

    Keeper-rule caveat (documented deviation from strict keep-one):
    the keeper is chosen PER MERGED ISLAND by its first gram. When two
    distinct duplicated runs A and B sit directly ADJACENT (or
    overlapping) in one doc — their dup-gram positions within
    ``_SPAN_N`` of each other; one unique token between runs already
    separates the islands — they merge into one island whose keeper
    is A's, so that doc removes its copy of B even if it would have
    been B's keeper, and B can end up removed from every doc. Exact
    keep-one over arbitrarily overlapping/chained runs requires
    suffix-array maximal-match semantics (Lee et al. §3); this
    gram-island approximation errs toward over-removal, which is the
    safe direction for training-data dedup. For a STRICT keep-one
    guarantee (at the cost of under-removing chained runs) use the
    ``dup_span_removal_keepone`` companion (queries_r6d.py), which
    groups occurrences by island-text md5 and keeps the minimal one
    per group. The DuckDB oracle
    implements the identical rule;
    tests/test_round4_scale_entries.py::
    test_dup_span_removal_merged_island_over_removes plants the
    chained-island case pinning this behavior.

    Scale shape: the detect chain is dup_spans'; the rewrite adds one
    per-doc equi-join (doc_id, range residual) between the token
    stream and that doc's few removed spans, then one hash agg with an
    in-group sort bounded by document length."""
    d = _docs_parallel(spark, sf_dir)  # md5-heavy explode: spread the 1-file scan
    toks = d.select("doc_id", F.posexplode(tokens("text")).alias("tpos", "tok"))
    g = d.select(
        "doc_id",
        F.posexplode(shingles_from_tokens(tokens("text"), _SPAN_N)).alias("pos", "g"),
    ).select("doc_id", "pos", gram_hash(F.col("g")).alias("h"))
    # ONE gram build via the (h, doc) two-level agg + h-window — the
    # same rewrite as q_dup_spans above (nd ≡ countDistinct(doc) at
    # the (h, doc) grain; keeper ≡ min(doc) over the gram's rows)
    g2 = g.groupBy("h", "doc_id").agg(F.collect_list("pos").alias("_ps"))
    wh = Window.partitionBy("h")
    hits = (
        g2.withColumn("nd", F.count(F.lit(1)).over(wh))
        .withColumn("keeper_doc", F.min("doc_id").over(wh))
        .filter(F.col("nd") >= 2)
        .select("doc_id", F.explode("_ps").alias("pos"), "keeper_doc")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > _SPAN_N, 1).otherwise(0)
    isl = hits.withColumn("island", F.sum(brk).over(w))
    spans = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("s0"),
            (F.max("pos") + F.lit(_SPAN_N - 1)).alias("s1"),
            F.min(F.struct("pos", "keeper_doc")).alias("fk"),
        )
        .select("doc_id", "s0", "s1", F.col("fk.keeper_doc").alias("keeper_doc"))
    )
    removed = spans.filter(F.col("doc_id") != F.col("keeper_doc")).select(
        F.col("doc_id").alias("r_doc"), "s0", "s1"
    )
    j = toks.join(
        removed,
        (toks.doc_id == removed.r_doc)
        & toks.tpos.between(removed.s0, removed.s1),
        "left",
    )
    keep = F.col("s0").isNull()
    kept_struct = F.when(keep, F.struct("tpos", "tok"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((~keep).cast("long")).alias("n_removed"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x.tok
                ),
            )
        ).alias("text_md5"),
    )


SQL_DUP_SPAN_REMOVAL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
t AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS tpos, toks[i] AS tok
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
        FROM w WHERE len(toks) >= 1)
),
g AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' ')), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS i
        FROM w WHERE len(toks) >= {_SPAN_N})
),
dup AS (
  SELECT h, count(DISTINCT doc_id) AS nd, min(doc_id) AS keeper_doc
  FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hits AS (SELECT g.doc_id, g.pos, dup.keeper_doc FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos, keeper_doc,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_N}
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos, keeper_doc,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
),
spans AS (
  SELECT doc_id, island, min(pos) AS s0, max(pos) + {_SPAN_N - 1} AS s1,
         arg_min(keeper_doc, pos) AS keeper_doc
  FROM isl GROUP BY doc_id, island
),
rm AS (SELECT doc_id AS r_doc, s0, s1 FROM spans WHERE doc_id <> keeper_doc),
m AS (
  SELECT t.doc_id, t.tpos, t.tok, (rm.s0 IS NULL) AS keep
  FROM t LEFT JOIN rm ON t.doc_id = rm.r_doc AND t.tpos BETWEEN rm.s0 AND rm.s1
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(tok, ' ' ORDER BY tpos) FILTER (WHERE keep), '')) AS text_md5
FROM m GROUP BY doc_id"""


# ----------------------------------------------------------------- PQ encode

_PQ_M = 4  # subspaces
_PQ_DSUB = 16  # dims per subspace (4 x 16 = the 64-dim embedding)
_PQ_K = 16  # centroids per subspace codebook
_PQ_Q = 10_000_000  # float -> BIGINT quantization (same scale as LSH ANN)


def _pq_quantized(vec: str) -> F.Column:
    return F.transform(
        F.col(vec), lambda x: F.round(x.cast("double") * _PQ_Q).cast("long")
    )


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, s, sub): each embedding quantized to BIGINT and split
    into _PQ_M subspace slices."""
    raw = load_table(spark, sf_dir, "embeddings")
    q = raw.select("vec_id", _pq_quantized("embedding").alias("q"))
    return q.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice("q", s * _PQ_DSUB + 1, _PQ_DSUB).alias("sub"),
                    )
                    for s in range(_PQ_M)
                ]
            )
        ).alias("e"),
    ).select("vec_id", F.col("e.s").alias("s"), F.col("e.sub").alias("sub"))


def _pq_codebook(sub: DataFrame) -> DataFrame:
    """(c, s, csub): the deterministic 16-centroid-per-subspace
    codebook (lowest vec_ids as trained centroids)."""
    return sub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("c"), "s", F.col("sub").alias("csub")
    )


def _pq_dist(a: str = "sub", b: str = "csub") -> F.Column:
    """Exact BIGINT squared-L2 between two quantized sub-vectors.
    Built lazily: higher-order Columns need an active session, and the
    catalog module is imported before the driver creates one."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, s, code, err): nearest codebook centroid per subspace,
    deterministic tie-break on the lower centroid id."""
    sub = _pq_subvectors(spark, sf_dir)
    cb = _pq_codebook(sub)
    scored = sub.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "c", _pq_dist().alias("d")
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "c")).alias("m"))
        .select("vec_id", "s", F.col("m.c").alias("code"), F.col("m.d").alias("err"))
    )


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes over the embeddings table. The
    codebook is deterministic (the 16 lowest vec_ids act as trained
    centroids — swap in k-means centroids in production; the encode
    shape is identical). Each vector becomes 4 small codes plus the
    exact quantized-integer reconstruction error."""
    best = _pq_best(spark, sf_dir)
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("code"))).alias(f"code_{s}")
            for s in range(_PQ_M)
        ],
        F.sum("err").alias("err_sum"),
    )


SQL_PQ_ENCODE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_PQ_Q}) AS BIGINT)) AS q
  FROM embeddings
),
sub AS (
  SELECT vec_id, s, list_slice(q, s * {_PQ_DSUB} + 1, s * {_PQ_DSUB} + {_PQ_DSUB}) AS sub
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) ss
),
cb AS (SELECT vec_id AS c, s, sub AS csub FROM sub WHERE vec_id < {_PQ_K}),
d AS (
  SELECT a.vec_id, a.s, cb.c,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
              i -> (a.sub[i] - cb.csub[i]) * (a.sub[i] - cb.csub[i]))) AS BIGINT) AS dist
  FROM sub a JOIN cb ON a.s = cb.s
),
best AS (
  SELECT vec_id, s, c, dist,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
  FROM d
)
SELECT vec_id,
       max(CASE WHEN s = 0 THEN c END) AS code_0,
       max(CASE WHEN s = 1 THEN c END) AS code_1,
       max(CASE WHEN s = 2 THEN c END) AS code_2,
       max(CASE WHEN s = 3 THEN c END) AS code_3,
       CAST(sum(dist) AS BIGINT) AS err_sum
FROM best WHERE rn = 1 GROUP BY vec_id"""


_PQ_TOPK = 10
_PQ_QUERY_MOD = 100  # query set: vec_id % 100 == 0 (same as LSH ANN)


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k search (ADC, Jégou et al. 2011
    §IV): each query builds a 4×16 lookup table of exact
    quantized-integer distances from its sub-vectors to every codebook
    centroid; every database vector is then scored by FOUR table
    lookups on its codes — never touching the raw 64-dim vector.

    Scale shape: the LUT is queries × 64 rows (broadcast); the
    corpus-side work is one broadcast join on (s, code) over the
    4-rows-per-vector code stream plus one hash agg — the raw vector
    array never shuffles. At 1B vectors the shuffled payload is 4
    BIGINTs/vector vs 64 floats: that ratio is the reason PQ exists."""
    best = _pq_best(spark, sf_dir).select("vec_id", "s", "code")
    sub = _pq_subvectors(spark, sf_dir)
    cb = _pq_codebook(sub)
    qs = sub.filter(F.col("vec_id") % _PQ_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sub").alias("qsub")
    )
    lut = qs.join(cb, "s").select(
        "query_id",
        "s",
        "c",
        _pq_dist("qsub", "csub").alias("d"),
    )
    scored = best.join(
        F.broadcast(lut), (best.s == lut.s) & (best.code == lut.c)
    ).select("vec_id", "query_id", "d")
    adc = (
        scored.groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "adc_dist", "rank")
    )


SQL_PQ_SEARCH = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_PQ_Q}) AS BIGINT)) AS q
  FROM embeddings
),
sub AS (
  SELECT vec_id, s, list_slice(q, s * {_PQ_DSUB} + 1, s * {_PQ_DSUB} + {_PQ_DSUB}) AS sub
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) ss
),
cb AS (SELECT vec_id AS c, s, sub AS csub FROM sub WHERE vec_id < {_PQ_K}),
d AS (
  SELECT a.vec_id, a.s, cb.c,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
              i -> (a.sub[i] - cb.csub[i]) * (a.sub[i] - cb.csub[i]))) AS BIGINT) AS dist
  FROM sub a JOIN cb ON a.s = cb.s
),
codes AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
    FROM d
  ) WHERE rn = 1
),
lut AS (
  SELECT qs.vec_id AS query_id, qs.s, cb.c,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
              i -> (qs.sub[i] - cb.csub[i]) * (qs.sub[i] - cb.csub[i]))) AS BIGINT) AS d
  FROM (SELECT * FROM sub WHERE vec_id % {_PQ_QUERY_MOD} = 0) qs
  JOIN cb ON qs.s = cb.s
),
adc AS (
  SELECT l.query_id, c2.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM codes c2 JOIN lut l ON c2.s = l.s AND c2.code = l.c
  GROUP BY l.query_id, c2.vec_id
)
SELECT query_id, vec_id AS neighbor_id, adc_dist, rank FROM (
  SELECT query_id, vec_id, adc_dist,
         row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id
) WHERE rank <= {_PQ_TOPK}"""


_IVF_C_LO = 16  # coarse centroids: vec_ids [16, 32) — disjoint from the
_IVF_C_HI = 32  # PQ codebook ids [0, 16) so the two quantizers differ
_IVF_NPROBE = 4


def q_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (Jégou et al. 2011 §V — the billion-vector
    production stack): the index holds, per vector, ONE coarse bucket
    id plus 4 PQ codes (the IVFADC layout, non-residual variant; the
    residual refinement changes the encode, not the plan shape). A
    query exactly scores the 16 coarse centroids, probes its nprobe=4
    nearest buckets, and ADC-scores only the vectors in those buckets
    via its broadcast LUT.

    Scale shape: index build is one broadcast coarse-assign over the
    vector scan plus one join with the code stream; search touches
    only probed buckets — candidates shrink by ~nprobe/n_coarse vs
    pq_search's full scan, and the raw vectors never shuffle."""
    raw = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = raw.select("vec_id", _pq_quantized("embedding").alias("q"))
    coarse = q.filter(
        (F.col("vec_id") >= _IVF_C_LO) & (F.col("vec_id") < _IVF_C_HI)
    ).select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
    d64 = q.crossJoin(F.broadcast(coarse)).select(
        "vec_id",
        "cid",
        F.aggregate(
            F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    asg = (
        d64.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("coarse_id"))
    )
    codes = _pq_best(spark, sf_dir).select("vec_id", "s", "code")
    index = codes.join(asg, "vec_id")  # the IVF-PQ index: bucket + codes

    wp = Window.partitionBy("vec_id").orderBy("dist", "cid")
    probes = (
        d64.filter(F.col("vec_id") % _PQ_QUERY_MOD == 0)
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("coarse_id"))
    )
    sub = _pq_subvectors(spark, sf_dir)
    cb = _pq_codebook(sub)
    qs = sub.filter(F.col("vec_id") % _PQ_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sub").alias("qsub")
    )
    lut = qs.join(cb, "s").select(
        "query_id", "s", "c", _pq_dist("qsub", "csub").alias("d")
    )
    cand = index.join(F.broadcast(probes), "coarse_id")
    scored = cand.join(
        F.broadcast(lut),
        (cand.s == lut.s) & (cand.code == lut.c) & (cand.query_id == lut.query_id),
    ).select(index.vec_id, cand.query_id, "coarse_id", "d")
    adc = (
        scored.groupBy("query_id", "vec_id", "coarse_id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "coarse_id",
            "adc_dist",
            "rank",
        )
    )


SQL_IVF_PQ_SEARCH = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_PQ_Q}) AS BIGINT)) AS q
  FROM embeddings
),
sub AS (
  SELECT vec_id, s, list_slice(q, s * {_PQ_DSUB} + 1, s * {_PQ_DSUB} + {_PQ_DSUB}) AS sub
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) ss
),
cb AS (SELECT vec_id AS c, s, sub AS csub FROM sub WHERE vec_id < {_PQ_K}),
d AS (
  SELECT a.vec_id, a.s, cb.c,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
              i -> (a.sub[i] - cb.csub[i]) * (a.sub[i] - cb.csub[i]))) AS BIGINT) AS dist
  FROM sub a JOIN cb ON a.s = cb.s
),
codes AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
    FROM d
  ) WHERE rn = 1
),
coarse AS (SELECT vec_id AS cid, q AS cq FROM q
           WHERE vec_id >= {_IVF_C_LO} AND vec_id < {_IVF_C_HI}),
d64 AS (
  SELECT a.vec_id, c.cid,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_M * _PQ_DSUB}),
              i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS BIGINT) AS dist
  FROM q a CROSS JOIN coarse c
),
asg AS (
  SELECT vec_id, cid AS coarse_id FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d64
  ) WHERE rn = 1
),
idx AS (SELECT codes.vec_id, asg.coarse_id, codes.s, codes.code
        FROM codes JOIN asg USING (vec_id)),
probes AS (
  SELECT vec_id AS query_id, cid AS coarse_id FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d64 WHERE vec_id % {_PQ_QUERY_MOD} = 0
  ) WHERE rn <= {_IVF_NPROBE}
),
lut AS (
  SELECT qs.vec_id AS query_id, qs.s, cb.c,
         CAST(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
              i -> (qs.sub[i] - cb.csub[i]) * (qs.sub[i] - cb.csub[i]))) AS BIGINT) AS d
  FROM (SELECT * FROM sub WHERE vec_id % {_PQ_QUERY_MOD} = 0) qs
  JOIN cb ON qs.s = cb.s
),
cand AS (
  SELECT p.query_id, i.vec_id, i.coarse_id, i.s, i.code
  FROM idx i JOIN probes p ON i.coarse_id = p.coarse_id
),
adc AS (
  SELECT cand.query_id, cand.vec_id, cand.coarse_id,
         CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM cand JOIN lut l
    ON cand.s = l.s AND cand.code = l.c AND cand.query_id = l.query_id
  GROUP BY cand.query_id, cand.vec_id, cand.coarse_id
)
SELECT query_id, vec_id AS neighbor_id, coarse_id, adc_dist, rank FROM (
  SELECT query_id, vec_id, coarse_id, adc_dist,
         row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id
) WHERE rank <= {_PQ_TOPK}"""


# -------------------------------------------------- watermark-dedup (batch)

_DEDUP_WIN_US = 600_000_000  # 10 minutes


def q_event_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user_id, event_type, 10-min tumbling
    window) — the batch semantics of streaming
    ``dropDuplicatesWithinWatermark``; tie-break (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    r = ev.withColumn("w", F.window("ts", "10 minutes")).withColumn(
        "win_start_us", F.unix_micros(F.col("w.start"))
    )
    part = Window.partitionBy("user_id", "event_type", "win_start_us")
    r = r.withColumn(
        "rn", F.row_number().over(part.orderBy("ts", "event_id"))
    ).withColumn("n_in_window", F.count(F.lit(1)).over(part))
    return r.filter(F.col("rn") == 1).select(
        "event_id", "user_id", "event_type", "win_start_us", "n_in_window"
    )


SQL_EVENT_DEDUP_WINDOW = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
r AS (
  SELECT event_id, user_id, event_type,
         (us // {_DEDUP_WIN_US}) * {_DEDUP_WIN_US} AS win_start_us,
         row_number() OVER (PARTITION BY user_id, event_type, us // {_DEDUP_WIN_US}
                            ORDER BY us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type, us // {_DEDUP_WIN_US}) AS n_in_window
  FROM e
)
SELECT event_id, user_id, event_type, win_start_us, n_in_window
FROM r WHERE rn = 1"""


# ------------------------------------------------- BPE pair statistics

_BPE_TOPK = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: the first BPE merge round
    (Sennrich et al. 2016) — count adjacent character pairs over the
    corpus vocabulary, weighted by word frequency, and rank the top
    merge candidates. Deterministic tie-break on the pair string.

    Scale shape: ONE explode to the (token -> freq) vocab hash agg
    (map-side combinable; the vocab is orders of magnitude smaller
    than the corpus), then pairs are generated per DISTINCT word —
    the per-word char work never touches corpus-sized data again.
    Top-k lands in a single TakeOrderedAndProject.

    Character indexing: Spark's ``length``/``substr`` index CODE
    POINTS (UTF8String counts whole code points, not UTF-16 units),
    exactly like DuckDB's ``len``/``substr`` — verified empirically
    for supplementary-plane input (emoji) and pinned by
    tests/test_round7_entries.py::test_bpe_pairs_supplementary_plane,
    so the pairing stays in lockstep with the oracle on any input."""
    d = _docs_parallel(spark, sf_dir)
    vocab = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.filter(F.length("tok") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    # limit FIRST (TakeOrderedAndProject, distributed partial top-k),
    # then rank only the surviving <= topk rows — house style for
    # global top-k (heavy_hitters, bm25)
    top = counts.orderBy(F.desc("pair_count"), F.asc("pair")).limit(_BPE_TOPK)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "pair", "pair_count", "rank"
    )


SQL_BPE_PAIR_COUNTS = f"""
WITH w AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
v AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok
),
p AS (
  SELECT substr(tok, i, 2) AS pair, freq
  FROM (SELECT tok, freq, unnest(generate_series(1, len(tok) - 1)) AS i
        FROM v WHERE len(tok) >= 2)
),
c AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM p GROUP BY pair)
SELECT pair, pair_count, rank FROM (
  SELECT pair, pair_count,
         row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS rank
  FROM c
) WHERE rank <= {_BPE_TOPK}"""


# ------------------------------------------- corpus dedup / vocab reports


def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication report over word-set fingerprint groups
    (``text.doc_fingerprint`` — the near-dup key fingerprint_dedup
    clusters on): one row per observed group SIZE with how many
    groups/docs it covers, plus each size's share of the corpus — the
    summary a dedup run prints before anyone commits to deleting
    data. Two small hash aggs over one scan; the fingerprint group agg
    is the same shuffle fingerprint_dedup runs, so at 100 TB the
    report rides the dedup pass for free."""
    from wq_data_pipeline_spark.operators.text import doc_fingerprint

    d = _docs_parallel(spark, sf_dir)
    groups = d.groupBy(doc_fingerprint("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    total = groups.agg(F.sum("sz").alias("n_docs_total"))
    return (
        groups.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("sz").alias("group_size"),
            "n_groups",
            (F.col("sz") * F.col("n_groups")).alias("n_docs"),
            F.round(
                (F.col("sz") * F.col("n_groups")).cast("double")
                / F.col("n_docs_total"),
                6,
            ).alias("corpus_share"),
        )
    )


SQL_DEDUP_REPORT = """
WITH f AS (
  SELECT md5(array_to_string(list_sort(list_distinct(
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), ' ')) AS h
  FROM documents
),
g AS (SELECT h, count(*) AS sz FROM f GROUP BY h),
t AS (SELECT CAST(sum(sz) AS BIGINT) AS n_docs_total FROM g)
SELECT sz AS group_size, count(*) AS n_groups,
       CAST(sz * count(*) AS BIGINT) AS n_docs,
       round(CAST(sz * count(*) AS DOUBLE) / (SELECT n_docs_total FROM t), 6) AS corpus_share
FROM g GROUP BY sz"""


# deliberately smaller than the synthetic corpus's distinct-token count
# (31) so the coverage rate is a real fraction, not a constant 1.0
_VOCAB_TOP = 16


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-support report: what fraction of corpus token
    OCCURRENCES a top-k frequency vocabulary covers (the OOV-rate
    check run before fixing a vocab size). One corpus explode into the
    vocab hash agg; the top-k side is ``orderBy(...).limit(k)`` —
    TakeOrderedAndProject, a distributed partial top-k — NOT a global
    rank window, which would funnel a real (multi-million-row) vocab
    through one partition. Both branches re-read the vocab agg's
    exchange."""
    d = _docs_parallel(spark, sf_dir)
    vocab = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    topv = vocab.orderBy(F.desc("freq"), F.asc("tok")).limit(_VOCAB_TOP)
    cov = topv.agg(F.sum("freq").alias("covered_occurrences"))
    tot = vocab.agg(
        F.sum("freq").alias("n_token_occurrences"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
    )
    return tot.crossJoin(F.broadcast(cov)).select(
        "n_token_occurrences",
        "n_distinct_tokens",
        "covered_occurrences",
        F.round(
            F.col("covered_occurrences").cast("double")
            / F.col("n_token_occurrences"),
            6,
        ).alias("coverage_rate"),
    )


SQL_VOCAB_COVERAGE = f"""
WITH w AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
v AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok
),
r AS (
  SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk FROM v
)
SELECT CAST(sum(freq) AS BIGINT) AS n_token_occurrences,
       count(*) AS n_distinct_tokens,
       CAST(sum(CASE WHEN rnk <= {_VOCAB_TOP} THEN freq ELSE 0 END) AS BIGINT) AS covered_occurrences,
       round(CAST(sum(CASE WHEN rnk <= {_VOCAB_TOP} THEN freq ELSE 0 END) AS DOUBLE) / sum(freq), 6) AS coverage_rate
FROM r"""


# ---------------------------------------- classifier + blocklist filters

_QC_B = 256  # hashed feature buckets for the linear quality scorer


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter (the fastText-classifier stage of
    CCNet/DCLM-style pipelines, here a hashed-bag-of-words linear
    scorer with deterministic md5-derived weights standing in for
    trained ones — swap the weight table, keep the plan): every token
    hashes to one of 256 buckets, the doc score is the exact integer
    sum of per-occurrence bucket weights (milli fixed-point), and the
    keep decision is score > 0.

    Scale shape: the weight table is 256 rows (broadcast); the only
    corpus-sized work is one explode + one map-side-combinable hash
    agg. Classifier inference as a broadcast join — no UDF, no
    per-row model call."""
    d = _docs_parallel(spark, sf_dir)
    feats = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).select("doc_id", F.pmod(gram_hash(F.col("tok")), F.lit(_QC_B)).alias("b"))
    wtab = spark.range(_QC_B).select(
        F.col("id").alias("b"),
        (
            F.pmod(
                gram_hash(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                F.lit(2001),
            )
            - 1000
        ).alias("w_milli"),
    )
    return (
        feats.join(F.broadcast(wtab), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("score_milli"),
        )
        .withColumn("keep", F.col("score_milli") > 0)
    )


SQL_QUALITY_CLASSIFIER = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(unnest(toks)), 1, 15)) AS BIGINT) % {_QC_B} AS b
  FROM w
),
wt AS (
  SELECT b,
         CAST(('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS w_milli
  FROM (SELECT unnest(generate_series(0, {_QC_B - 1})) AS b)
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(w_milli) AS BIGINT) AS score_milli,
       CAST(sum(w_milli) AS BIGINT) > 0 AS keep
FROM f JOIN wt USING (b) GROUP BY doc_id"""


_BLOCKLIST = ("slow", "error", "broken")  # C4 §2.2-style term blocklist
# explicit IN-list (a 1-term tuple repr would emit a trailing comma,
# which is invalid SQL)
_BLOCKLIST_SQL = "(" + ", ".join(repr(t) for t in _BLOCKLIST) + ")"


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter: drop any document containing a
    blocklisted token; report per-doc hit counts. Pure Column algebra
    over the token array — no explode, no shuffle beyond the scan;
    the blocklist compiles into the row expression (at a real 100-TB
    scale with a large list, swap to a broadcast-join on the token
    stream — the decision column is the same)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    hits = F.size(F.filter(toks, lambda t: t.isin(*_BLOCKLIST)))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        hits.alias("n_blocked"),
        (hits == 0).alias("keep"),
    )


SQL_BLOCKLIST_FILTER = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_filter(toks, t -> t IN {_BLOCKLIST_SQL})) AS INT) AS n_blocked,
       len(list_filter(toks, t -> t IN {_BLOCKLIST_SQL})) = 0 AS keep
FROM w"""


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation funnel report: how many documents survive
    each stage of blocklist -> quality classifier -> exact dedup (the
    one-row summary every training-data pipeline prints per snapshot).
    Dedup runs AFTER the filters (count of distinct md5 among
    survivors), matching real pipeline ordering.

    Scale shape: one classifier explode + hash agg, one per-doc join,
    one global agg — every stage decision is a Column, so adding a
    stage never adds a scan."""
    d = _docs_parallel(spark, sf_dir)
    feats = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).select("doc_id", F.pmod(gram_hash(F.col("tok")), F.lit(_QC_B)).alias("b"))
    wtab = spark.range(_QC_B).select(
        F.col("id").alias("b"),
        (
            F.pmod(
                gram_hash(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                F.lit(2001),
            )
            - 1000
        ).alias("w_milli"),
    )
    scores = (
        feats.join(F.broadcast(wtab), "b")
        .groupBy("doc_id")
        .agg(F.sum("w_milli").alias("score_milli"))
    )
    toks = tokens("text")
    flags = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.filter(toks, lambda t: t.isin(*_BLOCKLIST))).alias("n_blocked"),
    ).join(scores, "doc_id", "left")
    pass_bl = F.col("n_blocked") == 0
    pass_cl = pass_bl & (F.coalesce(F.col("score_milli"), F.lit(0)) > 0)
    return flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(pass_bl.cast("long")).alias("n_after_blocklist"),
        F.sum(pass_cl.cast("long")).alias("n_after_classifier"),
        F.countDistinct(F.when(pass_cl, F.col("h"))).alias("n_after_dedup"),
    )


SQL_CURATION_FUNNEL = f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(unnest(toks)), 1, 15)) AS BIGINT) % {_QC_B} AS b
  FROM w
),
wt AS (
  SELECT b,
         CAST(('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS w_milli
  FROM (SELECT unnest(generate_series(0, {_QC_B - 1})) AS b)
),
sc AS (
  SELECT doc_id, CAST(sum(w_milli) AS BIGINT) AS score_milli
  FROM f JOIN wt USING (b) GROUP BY doc_id
),
fl AS (
  SELECT w.doc_id, md5(w.text) AS h,
         len(list_filter(w.toks, t -> t IN {_BLOCKLIST_SQL})) AS n_blocked,
         coalesce(sc.score_milli, 0) AS score_milli
  FROM w LEFT JOIN sc ON w.doc_id = sc.doc_id
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN n_blocked = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_blocklist,
       CAST(sum(CASE WHEN n_blocked = 0 AND score_milli > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_classifier,
       CAST(count(DISTINCT CASE WHEN n_blocked = 0 AND score_milli > 0 THEN h END) AS BIGINT) AS n_after_dedup
FROM fl"""


QUERIES8: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "salted_user_stats": q_salted_user_stats,
    "dup_spans": q_dup_spans,
    "dup_span_removal": q_dup_span_removal,
    "pq_encode": q_pq_encode,
    "pq_search": q_pq_search,
    "ivf_pq_search": q_ivf_pq_search,
    "bpe_pair_counts": q_bpe_pair_counts,
    "dedup_report": q_dedup_report,
    "vocab_coverage": q_vocab_coverage,
    "quality_classifier": q_quality_classifier,
    "blocklist_filter": q_blocklist_filter,
    "curation_funnel": q_curation_funnel,
    "event_dedup_window": q_event_dedup_window,
}

ORACLES8: dict[str, str] = {
    "salted_user_stats": SQL_SALTED_USER_STATS,
    "dup_spans": SQL_DUP_SPANS,
    "dup_span_removal": SQL_DUP_SPAN_REMOVAL,
    "pq_encode": SQL_PQ_ENCODE,
    "pq_search": SQL_PQ_SEARCH,
    "ivf_pq_search": SQL_IVF_PQ_SEARCH,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "dedup_report": SQL_DEDUP_REPORT,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "blocklist_filter": SQL_BLOCKLIST_FILTER,
    "curation_funnel": SQL_CURATION_FUNNEL,
    "event_dedup_window": SQL_EVENT_DEDUP_WINDOW,
}
