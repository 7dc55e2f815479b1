"""Corpus-assembly entries (r5): the selection/rebalancing layer that
sits between a filtered corpus and the training run, plus the
scale-correct trained-centroid SemDeDup composition.

* ``token_budget_fill`` — greedy budget fill: order documents by a
  quality priority (type-token ratio, integer-micro exact) and take
  them in order until a token budget (half the corpus here) is
  reached. This is the "assemble an N-token training mix" primitive;
  the cumulative sum runs through
  ``operators/scale.py:distributed_prefix_sum`` (range-partitioned
  two-level scan), NOT a single-partition global window, so the same
  plan holds when the corpus has 10^10 rows.
* ``domain_rebalance`` — per-source downsampling to a target mixture:
  each source gets a target weight, the implied per-source keep rate
  is ``min(1, target_share x N / n_s)``, and the per-document keep
  decision is a deterministic md5 bucket (reproducible on any engine,
  no RNG — the ``hash_split`` convention). The keep predicate is
  evaluated as a BIGINT cross-multiplication, so there is no float
  boundary for the oracle to flake on.

Scale shapes: token_budget_fill is one corpus scan -> prefix sum
(range repartition + per-partition window + an n_partitions-row
driver cumsum) -> broadcast of the 1-row total; domain_rebalance is
one tiny per-source agg broadcast back over the scan — no shuffle of
the corpus at all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wq_data_pipeline_spark.operators import text as TX
from wq_data_pipeline_spark.operators.pinning import pin
from wq_data_pipeline_spark.operators.scale import (
    distributed_prefix_sum,
    spread_small_scan,
)
from wq_data_pipeline_spark.plans.queries_ext import SQL_WORDS
from wq_data_pipeline_spark.sources.testdata import load_table

# --- token_budget_fill ------------------------------------------------------

# priority = type-token ratio in integer micro units: floor(1e6 *
# n_distinct / n_tokens). Integer floor-division is exact in DuckDB
# (//); Spark computes floor(double-division) of the same BIGINTs,
# which agrees because the true remainder is >= 1/n_tokens >> one ulp.
_TBF_SCALE = 1_000_000
# packed total-order key: (priority DESC, doc_id ASC) in one BIGINT.
# priority <= 1e6 (a ratio x 1e6) needs 20 bits, so shifting by 2^43
# leaves room for doc_id < 2^43 (~8.8e12) before the packing bleeds
# into the priority field — comfortably past the 10^10-row scale the
# prefix-sum design targets ((1e6) * 2^43 = 8.80e18 < 2^63-1)
_TBF_SHIFT = 1 << 43


def _tbf_priority(d: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, ttr_micro) priority columns — the greedy
    fill's ordering basis, shared by token_budget_fill and
    mix_report so the composition can never diverge from the
    standalone entry."""
    toks = TX.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).withColumn(
        "ttr_micro",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(
                (F.col("n_distinct") * F.lit(_TBF_SCALE)).cast("double")
                / F.col("n_tokens").cast("double")
            ).cast("long")
        ),
    )


def _tbf_order_key() -> F.Column:
    """Packed (priority DESC, doc_id ASC) BIGINT total-order key."""
    return (F.lit(_TBF_SCALE) - F.col("ttr_micro")) * F.lit(_TBF_SHIFT) + F.col(
        "doc_id"
    )


def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill: take documents in (type-token-ratio
    DESC, doc_id ASC) order while the running token total stays
    within half the corpus tokens. One row per document with its
    inclusive cumulative position and the keep decision."""
    d = load_table(spark, sf_dir, "documents")
    base = _tbf_priority(d)
    keyed = base.withColumn("_ok", _tbf_order_key())
    cum = distributed_prefix_sum(
        keyed, value_col="n_tokens", order_col="_ok", out="_cum_before"
    )
    total = base.agg(F.sum("n_tokens").alias("_total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "ttr_micro",
            (F.col("_cum_before") + F.col("n_tokens")).alias("cum_tokens"),
            (
                F.col("_cum_before") + F.col("n_tokens")
                <= F.floor(F.col("_total") / 2).cast("long")
            ).alias("selected"),
        )
    )


SQL_TOKEN_BUDGET_FILL = f"""{SQL_WORDS},
t AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
  FROM w
),
k AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE (n_distinct * {_TBF_SCALE}) // n_tokens END AS ttr_micro
  FROM t
),
c AS (
  SELECT doc_id, n_tokens, ttr_micro,
         sum(n_tokens) OVER (ORDER BY ttr_micro DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         sum(n_tokens) OVER () AS total
  FROM k
)
SELECT doc_id, n_tokens, CAST(ttr_micro AS BIGINT) AS ttr_micro,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens <= total // 2 AS selected
FROM c"""


# --- domain_rebalance -------------------------------------------------------

# target mixture: weight 1 + (source index mod 4) — a deterministic
# skewed target so the per-source rates genuinely differ (sources in
# the test tables are src0..srcN with uniform counts)
_DR_BUCKETS = 1_000_000


def _src_weight_col() -> "F.Column":
    """The ONE synthetic per-source target-weight rule (w = 1 + source
    index % 4, BIGINT 1..4) — shared by ``domain_rebalance`` and the
    r12 ``epoch_mix_plan`` so their mixture targets can never drift.
    Digit-less source names weight as index 0 on BOTH engines (a raw
    cast of '' would be NULL on Spark and a conversion ERROR in
    DuckDB — the engines must agree on arbitrary source names)."""
    return (
        F.lit(1)
        + F.coalesce(
            F.nullif(F.regexp_extract(F.col("source"), r"(\d+)", 1), F.lit("")),
            F.lit("0"),
        ).cast("long")
        % 4
    ).cast("long")


# SQL mirror of _src_weight_col — interpolate wherever an oracle
# weights sources.
_SQL_SRC_WEIGHT = (
    "CAST(1 + CAST(coalesce(nullif(regexp_extract(source, '(\\d+)', 1), ''),"
    " '0') AS BIGINT) % 4 AS BIGINT)"
)


def q_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a target per-source mixture: source
    s with target weight w_s gets keep rate min(1, w_s*N / (sum_w *
    n_s)); each doc keeps iff its md5 bucket falls under the rate.
    Keep predicate is exact BIGINT cross-multiplication:
    bucket * sum_w * n_s < w_s * N * 1e6."""
    d = load_table(spark, sf_dir, "documents")
    w_expr = _src_weight_col()
    per_src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_src"))
        .withColumn("w", w_expr)
    )
    totals = per_src.agg(
        F.sum("n_src").alias("n_total"), F.sum("w").alias("sum_w")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _DR_BUCKETS
    )
    return (
        d.select("doc_id", "source", bucket.alias("_bucket"))
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "source",
            F.col("w").alias("target_w"),
            F.col("n_src"),
            F.least(
                F.lit(_DR_BUCKETS).cast("long"),
                F.floor(
                    (F.col("w") * F.col("n_total") * F.lit(_DR_BUCKETS)).cast(
                        "double"
                    )
                    / (F.col("sum_w") * F.col("n_src")).cast("double")
                ).cast("long"),
            ).alias("rate_micro"),
            (
                F.col("_bucket") * F.col("sum_w") * F.col("n_src")
                < F.col("w") * F.col("n_total") * F.lit(_DR_BUCKETS)
            ).alias("keep"),
        )
    )


SQL_DOMAIN_REBALANCE = f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src,
         {_SQL_SRC_WEIGHT} AS w
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total,
             CAST(sum(w) AS BIGINT) AS sum_w FROM s),
b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {_DR_BUCKETS} AS bucket
  FROM documents
)
SELECT b.doc_id, b.source, s.w AS target_w, s.n_src,
       least({_DR_BUCKETS}, (s.w * t.n_total * {_DR_BUCKETS}) // (t.sum_w * s.n_src)) AS rate_micro,
       b.bucket * t.sum_w * s.n_src < s.w * t.n_total * {_DR_BUCKETS} AS keep
FROM b JOIN s USING (source) CROSS JOIN t"""


# --- semdedup_trained -------------------------------------------------------

_SDT_TAU = 0.44  # same stress threshold as the stride `semdedup` entry
_SDT_TARGET = 64  # target cluster size; k = ceil(n / target)


def q_semdedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over TRAINED fixed-k centroids — the at-scale
    composition the stride entry's caveat prescribes (BASELINE.md r5
    scale row: stride centroids grow with n, making exact assignment
    O(n^2/stride), measured exponent 1.56 at 1x/3x/10x; trained k ~
    n/target-size keeps per-cluster pair work bounded, so the whole
    pipeline scales ~linearly).

    Stages: Lloyd k-means on the quantized vectors (k = ceil(n/64),
    3 rounds, md5-seeded deterministic init — identical machinery to
    ``embed_kmeans_ivf``, so at sf0.01 the oracle shares its unrolled
    Lloyd-round prefix verbatim), broadcast-literal assignment of
    every vector to its nearest final centroid, then within-cluster
    earlier-id duplicate marking at tau=0.44 with BIGINT-exact
    quantized cosines (``semdedup_within``)."""
    import math

    from wq_data_pipeline_spark.operators.similarity import (
        cosine,
        kmeans_centroids,
        semdedup_within,
    )
    from wq_data_pipeline_spark.plans.queries_ext import (
        _KM_ITERS,
        _quantized,
    )

    # single-file scan -> one input split; spread BEFORE the k-way
    # scoring fan-out or the n x k dot products run on one core (the
    # r1 single-file-scan rule; embed_cosine_topk precedent)
    emb = spread_small_scan(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _quantized("embedding").alias("q")
        )
    )
    k = max(1, math.ceil(emb.count() / _SDT_TARGET))
    # SIZE-GATED trainer (VERDICT r7 #1): "auto" resolves to the
    # exact distributed/broadcast rounds while k×dim fits the
    # broadcast budget (strictly cheaper — the r7 all-banded form
    # measured 23.5 s vs 5.3 s at sf0.1) and to the banded LSH
    # candidate rounds only past it (k ∝ n at production scale,
    # where per-round k×dim broadcast is the wall banded removes;
    # the zero-BroadcastExchange plan shape stays pinned by
    # test_banded_round_has_no_broadcast_when_autobroadcast_off).
    # literal_centroids_max=0: k grows with the corpus here and the
    # literal-array plan pays analysis cost per literal per round
    # (measured at k=32/dim=64: 8.3 s literal vs 3.7 s broadcast).
    # With integer-quantized vectors the exact modes are
    # bit-identical, so the oracle replays the exact rounds
    # (_kmeans_prefix_sql) — valid at every oracle/bench scale; the
    # banded regime starts at k*dim > 1e6 (n > 64M vectors at
    # dim=64), far past any scale the DuckDB oracle runs at.
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
    c = cent.select(F.col("centroid_id").alias("_cid"), F.col("q").alias("_cv"))
    # final assignment via NARROW max_by, NOT a per-vector row_number
    # window: the window form shuffled and sorted the full n x k
    # scored expansion (measured 189 s at 10x replica scale); max_by
    # is partial-aggregable so only n rows cross the shuffle, and
    # scoring (vec_id, cid, cs) rows only — the vector array never
    # rides the k-way expansion — cuts the allocation/GC cost. The
    # winning cluster joins back to the scan for the vectors the
    # within-cluster stage needs. Tie rule (highest cosine, lowest
    # centroid id) matches the oracle's ORDER BY cs DESC, cid.
    ids = (
        emb.crossJoin(F.broadcast(c))
        .select("vec_id", F.col("_cid"), cosine("q", "_cv").alias("_cs"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("_cid"), F.struct(F.col("_cs"), -F.col("_cid"))
            ).alias("cluster_id")
        )
    )
    # the within-cluster stage reads `assigned` twice (a and b join
    # sides) — pin it so the n x k assignment scoring runs once
    assigned = (
        emb.join(ids, "vec_id")
        .select("vec_id", "q", "cluster_id")
        .localCheckpoint()
    )
    return semdedup_within(assigned, id_col="vec_id", vec_col="q", tau=_SDT_TAU)


def _semdedup_trained_sql() -> str:
    """DuckDB replay: the shared EXACT Lloyd-round prefix (ends at
    ``av`` = final bucket per vector; k is derived IN-SQL as
    ceil(count(*)/target) so the oracle's clustering tracks the
    engine's runtime k at any scale factor — ADVICE r5), then the
    within-cluster earlier-id pairwise tail of SQL_SEMDEDUP. The
    engine's "auto" trainer resolves to the bit-identical exact mode
    at every scale the oracle runs at (crossover k*dim > 1e6)."""
    from wq_data_pipeline_spark.plans.queries_ext import _kmeans_prefix_sql

    dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(a.q)), "
        "i -> a.q[i] * b.q[i])) AS DOUBLE)"
    )
    nrm = "sqrt(CAST(list_sum(list_transform({v}, x -> x * x)) AS DOUBLE))"
    k_sql = (
        f"SELECT CAST(ceil(count(*) / {_SDT_TARGET}.0) AS BIGINT) FROM embeddings"
    )
    return f"""{_kmeans_prefix_sql(k_sql)},
sims AS (
  SELECT a.vec_id,
         {dot} / ({nrm.format(v="a.q")} * {nrm.format(v="b.q")}) AS sim
  FROM av a JOIN av b
    ON a.bucket = b.bucket AND b.vec_id < a.vec_id
),
dup AS (
  SELECT vec_id, count(*) AS n_dup_earlier, round(max(sim), 6) AS max_sim_earlier
  FROM sims WHERE sim >= {_SDT_TAU} GROUP BY vec_id
)
SELECT av.vec_id, av.bucket AS cluster_id,
       d.vec_id IS NOT NULL AS is_dup,
       CAST(coalesce(d.n_dup_earlier, 0) AS BIGINT) AS n_dup_earlier,
       d.max_sim_earlier
FROM av LEFT JOIN dup d USING (vec_id)"""


SQL_SEMDEDUP_TRAINED = _semdedup_trained_sql()


# --- bpe_train --------------------------------------------------------------

_BPT_ROUNDS = 6


def _merge_fold(s_col: F.Column, lft: str, rgt: str) -> F.Column:
    """Greedy left-to-right single-pass BPE merge of the (lft, rgt)
    pair over a symbol array — a narrow array fold, no shuffle.
    ``F.get`` (not element_at) so the empty-accumulator probe yields
    NULL instead of an ANSI out-of-bounds error."""
    return F.aggregate(
        s_col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(lft)) & (x == F.lit(rgt)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(lft + rgt))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-rule training (Sennrich et al. 2016): run
    ``_BPT_ROUNDS`` merge rounds over the corpus vocabulary and emit
    the learned merge table — the multi-round generalization of
    ``bpe_pair_counts`` (which is round 1's candidate list).

    Round loop: count adjacent symbol pairs per DISTINCT word
    weighted by word frequency (one small hash agg — the corpus is
    never touched again after the vocab agg), pick the top pair
    (count DESC, pair ASC — deterministic), then apply the merge to
    every word's symbol list as a greedy left-to-right single pass
    via ``F.aggregate`` (array fold, narrow — no shuffle). The vocab
    is localCheckpoint'ed per round so plans stay flat (the
    connected-components discipline). This is exactly how
    distributed BPE trainers shard: per-distinct-word state, driver
    holds only the (tiny) merge table — scale-independent.

    The DuckDB oracle unrolls the rounds as CTE blocks; its merge
    application uses the gaps-and-islands selection (greedy = every
    even offset inside each run of consecutive match positions),
    which is provably equivalent to the fold: for lft != rgt match
    positions are never adjacent, and for lft == rgt a run of k
    matches is k+1 repeated symbols where both rules take positions
    run_start, run_start+2, ... Char indexing is UTF-16 vs
    code points across the engines — ASCII corpus assumption, same
    caveat as ``bpe_pair_counts``."""
    _, merges = _bpe_train_state(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round INT, lft STRING, rgt STRING, merged STRING, pair_count BIGINT"
    )


def _bpe_train_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, str, str, str, int]]]:
    """The BPE trainer round loop shared by ``bpe_train`` (emits the
    merge table) and ``bpe_apply`` (tokenizes with the final vocab):
    returns (final vocab frame (tok, freq, s), merge list). One
    build per (session, corpus content): the vocab frame is a
    localCheckpoint and the merge list lives on the driver, so the
    state stashes whole (operators/stash.py, the r11 trainer-stash
    generalization)."""
    from wq_data_pipeline_spark.operators.stash import session_stash

    return session_stash(
        spark,
        sf_dir,
        "documents",
        ("bpe", _BPT_ROUNDS),
        lambda: _bpe_train_state_build(spark, sf_dir),
    )


def _bpe_train_state_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, str, str, str, int]]]:
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    v = (
        d.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("tok", "freq", chars.alias("s"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, _BPT_ROUNDS + 1):
        pair = F.transform(
            F.sequence(F.lit(0), F.size("s") - 2),
            lambda i: F.struct(
                F.get("s", i).alias("lft"), F.get("s", i + 1).alias("rgt")
            ),
        )
        top = (
            v.filter(F.size("s") >= 2)
            .select("freq", F.explode(pair).alias("p"))
            .groupBy("p.lft", "p.rgt")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lft, rgt, c = top[0]["lft"], top[0]["rgt"], int(top[0]["c"])
        merges.append((r, lft, rgt, lft + rgt, c))
        v = v.withColumn("s", _merge_fold(F.col("s"), lft, rgt))
        # checkpoint every few rounds, not every round: the vocab is
        # tiny so recomputing 1-2 chained folds is cheaper than a
        # materialization job per round; unbounded chaining would
        # instead grow the fold expression tree (analysis cost).
        # (The final round is a multiple of 3, so the returned vocab
        # frame is always materialized.)
        if r % 3 == 0:
            v = v.localCheckpoint()
    return v, merges


def _bpe_chain_sql() -> str:
    """Shared DuckDB WITH-chain for the BPE oracles: vocab with
    per-char symbol lists, then ``_BPT_ROUNDS`` unrolled rounds of
    (pair counts -> top-1 -> islands-selected greedy merge ->
    rebuilt symbol lists), ending at v{N}/m{1..N}. Consumed by
    ``_bpe_train_sql`` (merge-table tail) and ``_bpe_apply_sql``
    (per-doc tokenize tail)."""
    blocks = []
    for r in range(1, _BPT_ROUNDS + 1):
        prev = f"v{r - 1}"
        blocks.append(f"""
p{r} AS MATERIALIZED (
  SELECT s[i] AS lft, s[i + 1] AS rgt, CAST(sum(freq) AS BIGINT) AS c
  FROM (SELECT freq, s, unnest(generate_series(1, len(s) - 1)) AS i
        FROM {prev} WHERE len(s) >= 2)
  GROUP BY 1, 2
),
m{r} AS MATERIALIZED (SELECT lft, rgt, c FROM p{r} ORDER BY c DESC, lft ASC, rgt ASC LIMIT 1),
e{r} AS MATERIALIZED (
  SELECT tok, freq, unnest(generate_series(1, len(s))) AS i, unnest(s) AS sym
  FROM {prev}
),
mt{r} AS (
  SELECT a.tok, a.i FROM e{r} a JOIN e{r} b ON a.tok = b.tok AND b.i = a.i + 1
  CROSS JOIN m{r} m WHERE a.sym = m.lft AND b.sym = m.rgt
),
sel{r} AS MATERIALIZED (
  SELECT tok, i FROM (
    SELECT tok, i, i - row_number() OVER (PARTITION BY tok ORDER BY i) AS g
    FROM mt{r}
  ) QUALIFY (i - min(i) OVER (PARTITION BY tok, g)) % 2 = 0
),
v{r} AS MATERIALIZED (
  SELECT e.tok, e.freq,
         list(CASE WHEN s1.i IS NOT NULL THEN m.lft || m.rgt ELSE e.sym END
              ORDER BY e.i) AS s
  FROM e{r} e
  LEFT JOIN m{r} m ON TRUE
  LEFT JOIN sel{r} s1 ON e.tok = s1.tok AND e.i = s1.i
  LEFT JOIN sel{r} s2 ON e.tok = s2.tok AND e.i = s2.i + 1
  WHERE s2.i IS NULL
  GROUP BY e.tok, e.freq
)""")
    return f"""{SQL_WORDS},
v0 AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq,
         list_transform(generate_series(1, len(tok)), i -> substr(tok, i, 1)) AS s
  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok
),{",".join(blocks)}"""


def _bpe_train_sql() -> str:
    finals = "\n  UNION ALL\n  ".join(
        f"SELECT {r} AS round, lft, rgt, lft || rgt AS merged, c AS pair_count FROM m{r}"
        for r in range(1, _BPT_ROUNDS + 1)
    )
    return f"""{_bpe_chain_sql()}
SELECT CAST(round AS INT) AS round, lft, rgt, merged, pair_count FROM (
  {finals}
)"""


SQL_BPE_TRAIN = _bpe_train_sql()


def _vocab_token_counts(
    spark: SparkSession, sf_dir: str, keys: list[str]
) -> DataFrame:
    """The ONE tokenize-by-trained-vocab inference shape — explode
    words, pre-agg per (*keys, tok), broadcast-join the stashed
    vocab's per-word symbol counts — shared by ``bpe_apply``
    (keys=['doc_id']) and the r12 ``tokenizer_fertility``
    (keys=['lang']) so the two rollups of the same tokenizer can
    never tokenize differently. Returns (*keys, tok, k, n_sym);
    callers do their own rollup."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    v, _ = _bpe_train_state(spark, sf_dir)
    d = _docs_parallel(spark, sf_dir)
    kw = (
        d.select(*keys, F.explode(TX.tokens("text")).alias("tok"))
        .groupBy(*keys, "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    nsym = v.select("tok", F.size("s").cast("long").alias("n_sym"))
    return kw.join(F.broadcast(nsym), "tok")


def _sql_vocab_counts_cte(key: str, cte: str) -> str:
    """SQL mirror of ``_vocab_token_counts``'s pre-agg: per-(key, tok)
    word counts over the shared ``w`` tokenization CTE."""
    return (
        f"{cte} AS (\n"
        f"  SELECT {key}, tok, CAST(count(*) AS BIGINT) AS k\n"
        f"  FROM (SELECT {key}, unnest(toks) AS tok FROM w) GROUP BY 1, 2\n"
        f")"
    )


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize WITH the learned BPE vocab — the apply half of the
    train->apply tokenizer loop: rerun the ``_BPT_ROUNDS`` trainer
    (same deterministic merges), then join every document's words to
    the final per-word symbol count and report per doc (n_words,
    n_bpe_tokens, tokens_per_word_micro). Compression under the
    learned merges is the signal a tokenizer-budget planner reads.

    Scale shape: the per-word symbol counts live in the vocab table
    (broadcast-sized), so applying the tokenizer to the corpus is a
    per-(doc, word) pre-agg + one broadcast join — the corpus never
    re-tokenizes per merge rule."""
    return (
        _vocab_token_counts(spark, sf_dir, ["doc_id"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_words"),
            F.sum(F.col("k") * F.col("n_sym")).cast("long").alias("n_bpe_tokens"),
            F.floor(
                (F.sum(F.col("k") * F.col("n_sym")) * F.lit(1_000_000)).cast(
                    "double"
                )
                / F.sum("k").cast("double")
            )
            .cast("long")
            .alias("tokens_per_word_micro"),
        )
    )


def _bpe_apply_sql() -> str:
    return f"""{_bpe_chain_sql()},
{_sql_vocab_counts_cte("doc_id", "dw")}
SELECT dw.doc_id,
       CAST(sum(k) AS BIGINT) AS n_words,
       CAST(sum(k * len(v.s)) AS BIGINT) AS n_bpe_tokens,
       CAST((sum(k * len(v.s)) * 1000000) // sum(k) AS BIGINT) AS tokens_per_word_micro
FROM dw JOIN v{_BPT_ROUNDS} v ON dw.tok = v.tok
GROUP BY dw.doc_id"""


SQL_BPE_APPLY = _bpe_apply_sql()


# --- bigram_lm_score --------------------------------------------------------

_BLM_LAMBDA = 0.75  # interpolation weight (exact binary fraction)


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM surprisal per document — the bigram
    upgrade of ``unigram_logprob`` (CCNet-style LM quality scoring):
    P(w2|w1) = 0.75 * c(w1,w2)/c(w1) + 0.25 * c(w2)/T, scored as mean
    -log2 P over the document's bigrams.

    Determinism convention (unigram_logprob precedent): per-bigram
    surprisal is quantized to integer micro-bits and summed as BIGINT
    (order-free under any partitioning); every float input to log2 is
    produced by the same division of the same exact integers in both
    engines, and 0.75/0.25 are exact binary fractions.

    Scale shape (the dsir_weights lesson): ONE per-(doc, bigram)
    pre-agg feeds everything — the corpus-wide bigram table rides on
    it as a second (bigram-key) hash agg, the unigram table is a
    broadcast-sized vocabulary, and the surprisal join multiplies by
    the stored multiplicity instead of re-exploding occurrences.
    Documents with < 2 tokens have no bigrams and drop out."""
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    toks = TX.tokens("text")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(
            F.element_at("toks", i).alias("w1"),
            F.element_at("toks", i + 1).alias("w2"),
        ),
    )
    base = d.select("doc_id", toks.alias("toks"))
    bgc = (
        base.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b.w1", "b.w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        # two consumers (the corpus bigram table and the surprisal
        # join) would otherwise re-run the explode+agg subtree twice —
        # the dsir_weights lesson. Pin it once; on a real cluster swap
        # for reliable-store checkpoint/persist.
        .localCheckpoint()
    )
    bf = bgc.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c12"))
    uf = (
        base.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # three consumers (u1, u2, total) — pin the vocabulary agg
        .localCheckpoint()
    )
    total = uf.agg(F.sum("c").cast("long").alias("total"))
    u1 = uf.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uf.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    p = (
        F.lit(_BLM_LAMBDA) * (F.col("c12").cast("double") / F.col("c1"))
        + F.lit(1 - _BLM_LAMBDA) * (F.col("c2").cast("double") / F.col("total"))
    )
    lp = F.round(-F.log2(p) * 1e6).cast("long")
    scored = (
        bgc.join(bf, ["w1", "w2"])
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "k", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("lp")).cast("long").alias("sum_surprisal_micro"),
        (
            F.sum(F.col("k") * F.col("lp")).cast("double") / F.sum("k")
        ).alias("mean_surprisal_micro"),
    )


SQL_BIGRAM_LM_SCORE = f"""{SQL_WORDS},
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM w WHERE len(toks) >= 2)
),
bgc AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k FROM bg GROUP BY 1, 2, 3
),
bf AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM bgc GROUP BY 1, 2),
uf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok
),
t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uf),
s AS (
  SELECT bgc.doc_id, bgc.k,
         CAST(round(-log2({_BLM_LAMBDA} * (CAST(bf.c12 AS DOUBLE) / u1.c)
                          + {1 - _BLM_LAMBDA} * (CAST(u2.c AS DOUBLE) / t.total))
                    * 1000000) AS BIGINT) AS lp
  FROM bgc
  JOIN bf USING (w1, w2)
  JOIN uf u1 ON bgc.w1 = u1.tok
  JOIN uf u2 ON bgc.w2 = u2.tok
  CROSS JOIN t
)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       CAST(sum(k * lp) AS BIGINT) AS sum_surprisal_micro,
       CAST(sum(k * lp) AS DOUBLE) / sum(k) AS mean_surprisal_micro
FROM s GROUP BY doc_id"""


# --- contamination_overlap --------------------------------------------------

_CO_N = 5  # word n-gram width for the overlap metric
_CO_TAU_MICRO = 500_000  # flag a doc at >= 50% benchmark-gram overlap


def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram overlap fraction against a benchmark set —
    the graded decontamination metric (GPT-3 appendix C / PaLM-style
    n-gram collision rate), upgrading the binary fingerprint
    ``decontaminate`` scan: for every non-src0 document, the share of
    its DISTINCT word 5-grams that also occur in the src0 'benchmark'
    corpus, plus a >= 50% contamination flag. Gram hashing follows
    the dup_spans convention (15-hex md5 -> BIGINT, engine-portable);
    the overlap fraction is integer floor-division, no float boundary.

    Scale shape: one explode -> per-doc distinct gram agg, pinned
    once (benchmark and eval branches both read it — without the pin
    the md5-heavy explode subtree runs twice); the hit check is a
    hash join on the gram hash. In production the benchmark grams
    come from a separate, small eval-suite corpus and that side
    becomes a broadcast; here both sides derive from the one test
    table. Documents with < 5 tokens have no grams and drop out."""
    from wq_data_pipeline_spark.operators.text import (
        gram_hash,
        shingles_from_tokens,
    )
    from wq_data_pipeline_spark.plans.queries_ext import _docs_parallel

    d = _docs_parallel(spark, sf_dir)
    g = (
        # token array materialized first (one tokenize per doc, r12)
        d.select("doc_id", "source", TX.tokens("text").alias("_toks"))
        .select(
            "doc_id",
            "source",
            F.explode(shingles_from_tokens(F.col("_toks"), _CO_N)).alias("g"),
        )
        .select("doc_id", "source", gram_hash(F.col("g")).alias("h"))
        .distinct()
        .localCheckpoint()
    )
    bench = (
        g.filter(F.col("source") == "src0")
        .select("h")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = g.filter(F.col("source") != "src0")
    per_doc = (
        ev.join(bench, "h", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    overlap = F.floor(
        (F.col("n_hit") * F.lit(1_000_000)).cast("double")
        / F.col("n_grams").cast("double")
    ).cast("long")
    return per_doc.select(
        "doc_id",
        "source",
        "n_grams",
        "n_hit",
        overlap.alias("overlap_micro"),
        (overlap >= F.lit(_CO_TAU_MICRO)).alias("contaminated"),
    )


SQL_CONTAMINATION_OVERLAP = f"""{SQL_WORDS},
g AS (
  SELECT DISTINCT doc_id, source,
         ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {_CO_N - 1}), ' ')), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, source, toks, unnest(generate_series(1, len(toks) - {_CO_N - 1})) AS i
        FROM w)
),
bench AS (SELECT DISTINCT h FROM g WHERE source = 'src0'),
ev AS (SELECT doc_id, source, h FROM g WHERE source <> 'src0'),
m AS (
  SELECT ev.doc_id, ev.source, CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM ev LEFT JOIN bench b USING (h)
),
p AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(hit) AS BIGINT) AS n_hit
  FROM m GROUP BY 1, 2
)
SELECT doc_id, source, n_grams, n_hit,
       (n_hit * 1000000) // n_grams AS overlap_micro,
       (n_hit * 1000000) // n_grams >= {_CO_TAU_MICRO} AS contaminated
FROM p"""


# --- mix_report -------------------------------------------------------------


def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mix assembly report: the corpus-assembly layer
    COMPOSED — domain_rebalance's deterministic keep decision, then
    token_budget_fill's greedy priority fill over the surviving
    docs (budget = half the surviving tokens), rolled up per source:
    (n_docs, n_kept, n_selected, tokens_selected). This is the
    summary a pipeline operator reads before launching a training
    run. Same exact-integer conventions as the two stages it chains;
    the prefix sum is the distributed two-level scan."""
    keep = q_domain_rebalance(spark, sf_dir).select("doc_id", "source", "keep")
    d = load_table(spark, sf_dir, "documents")
    base = _tbf_priority(d)
    # pin the skinny (doc_id, source, tokens, ttr, keep) frame: it
    # feeds the survivor chain (prefix sum + total agg) AND the final
    # per-source rollup — without the cut the tokenize + rebalance
    # subtree re-executes per consumer (r12 plan audit: 16 scans)
    kept = pin(base.join(keep, "doc_id"), eager=False)
    surv = kept.filter(F.col("keep")).withColumn("_ok", _tbf_order_key())
    cum = distributed_prefix_sum(
        surv, value_col="n_tokens", order_col="_ok", out="_cum_before"
    )
    total = surv.agg(F.sum("n_tokens").alias("_total"))
    sel = (
        cum.crossJoin(F.broadcast(total))
        .withColumn(
            "selected",
            F.col("_cum_before") + F.col("n_tokens")
            <= F.floor(F.col("_total") / 2).cast("long"),
        )
        .select("doc_id", "selected")
    )
    return (
        kept.join(sel, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.sum(F.coalesce(F.col("selected").cast("long"), F.lit(0)))
            .cast("long")
            .alias("n_selected"),
            F.sum(
                F.when(F.coalesce("selected", F.lit(False)), F.col("n_tokens"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("tokens_selected"),
        )
    )


SQL_MIX_REPORT = f"""{SQL_WORDS},
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src,
         CAST(1 + CAST(coalesce(nullif(regexp_extract(source, '(\\d+)', 1), ''), '0') AS BIGINT) % 4 AS BIGINT) AS wt
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_src) AS n_total, sum(wt) AS sum_w FROM s),
kd AS (
  SELECT w.doc_id, w.source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (CAST(len(list_distinct(toks)) AS BIGINT) * {_TBF_SCALE}) // len(toks)
         END AS ttr_micro,
         (('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 8))::BIGINT % {_DR_BUCKETS})
           * t.sum_w * s.n_src < s.wt * t.n_total * {_DR_BUCKETS} AS keep
  FROM w JOIN s USING (source) CROSS JOIN t
),
surv AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (ORDER BY ttr_micro DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         sum(n_tokens) OVER () AS total
  FROM kd WHERE keep
),
sel AS (SELECT doc_id, cum_tokens <= total // 2 AS selected, n_tokens FROM surv)
SELECT kd.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN kd.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN coalesce(sel.selected, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(sum(CASE WHEN coalesce(sel.selected, FALSE) THEN kd.n_tokens ELSE 0 END) AS BIGINT) AS tokens_selected
FROM kd LEFT JOIN sel USING (doc_id)
GROUP BY kd.source"""


# --- cross_dedup ------------------------------------------------------------

_CD_TAU = 0.8  # verified-Jaccard near-dup threshold


def q_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup: check every NEW document (source !=
    src0) for near-duplicates in the BASE corpus (src0 — the existing
    training set) via MinHash-LSH candidates + exact word-set Jaccard
    verification, at the operator-default constants the
    minhash_lsh_pairs entry pins (k=32, 4 rows/band, max_df guard).
    One row per new doc: (n_base_matches, best_jaccard, is_dup at
    Jaccard >= 0.8). This is the dedupe-the-increment operation a
    crawl pipeline runs before merging a new snapshot — distinct
    from ``decontaminate`` (whole-doc fingerprint semi-join) and
    from within-corpus clustering (``dedup_clusters``).

    Scale shape: identical to minhash_lsh_pairs (banded self-join on
    (band, key) with the hot-bucket guard); the cross-corpus
    restriction is a filter on the verified pairs, and the per-new-doc
    rollup is one hash agg + a broadcast-sized source lookup."""
    from wq_data_pipeline_spark.operators import dedup as DD
    from wq_data_pipeline_spark.plans.queries_ext import (
        _MH_K,
        _MH_MAXDF,
        _MH_R,
        _docs_parallel,
    )

    d = _docs_parallel(spark, sf_dir)
    cand = DD.minhash_lsh_candidates(
        d, "text", "doc_id", num_hashes=_MH_K, rows_per_band=_MH_R, max_df=_MH_MAXDF
    )
    jac = DD.jaccard_pairs(d, cand, "text", "doc_id")
    src = d.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    pairs = jac.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    # exactly one side in the base corpus; emit the NEW side
    cross = pairs.filter(
        (F.col("src_a") == "src0") != (F.col("src_b") == "src0")
    ).select(
        F.when(F.col("src_a") == "src0", F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("doc_id"),
        "jaccard",
    )
    hits = cross.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_base_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )
    return (
        src.filter(F.col("source") != "src0")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_base_matches", F.lit(0).cast("long")).alias(
                "n_base_matches"
            ),
            "best_jaccard",
            F.coalesce(F.col("best_jaccard") >= _CD_TAU, F.lit(False)).alias(
                "is_dup"
            ),
        )
    )


def _cross_dedup_sql() -> str:
    from wq_data_pipeline_spark.plans.queries_ext import (
        _MH_K,
        _MH_R,
        _minhash_pairs_sql,
    )

    return f"""{SQL_WORDS},
{_minhash_pairs_sql(_MH_K, _MH_R)},
ws AS (SELECT doc_id, list_distinct(toks) AS ws FROM w),
jac AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE) AS jaccard
  FROM pairs JOIN ws a ON pairs.id_a = a.doc_id JOIN ws b ON pairs.id_b = b.doc_id
),
srcs AS (SELECT doc_id, source FROM documents),
cross_hits AS (
  SELECT CASE WHEN sa.source = 'src0' THEN j.id_b ELSE j.id_a END AS doc_id,
         j.jaccard
  FROM jac j
  JOIN srcs sa ON j.id_a = sa.doc_id
  JOIN srcs sb ON j.id_b = sb.doc_id
  WHERE (sa.source = 'src0') <> (sb.source = 'src0')
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_base_matches,
         max(jaccard) AS best_jaccard
  FROM cross_hits GROUP BY doc_id
)
SELECT s.doc_id, s.source,
       coalesce(a.n_base_matches, 0) AS n_base_matches,
       a.best_jaccard,
       coalesce(a.best_jaccard >= {_CD_TAU}, FALSE) AS is_dup
FROM srcs s LEFT JOIN agg a USING (doc_id)
WHERE s.source <> 'src0'"""


SQL_CROSS_DEDUP = _cross_dedup_sql()


# --- zorder_layout ----------------------------------------------------------

_ZO_BITS = 16  # bits per dimension interleaved into the z-value
_ZO_BUCKETS = 64  # equal-width z-range buckets (files, in a real layout)
# the box query the skipping report evaluates: users 100-200, first day
_ZO_U0, _ZO_U1 = 100, 200
_ZO_M0, _ZO_M1 = 0, 1440  # minutes since epoch-min of the table


def _interleave_bits(x: F.Column, y: F.Column) -> F.Column:
    """Morton z-value: interleave the low ``_ZO_BITS`` bits of x and y
    (x on even positions, y on odd) — pure 64-bit integer bit algebra,
    identical in DuckDB."""
    z = F.lit(0).cast("long")
    for i in range(_ZO_BITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _interleave_sql(x: str, y: str) -> str:
    """SQL mirror of :func:`_interleave_bits` — shared by the zorder
    and layout-comparison oracles so the bit layout can't diverge."""
    terms = []
    for i in range(_ZO_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zo_skippable(u_min, u_max, m_min, m_max) -> F.Column:
    """Bucket skippability for the representative 2-D box query —
    shared by zorder_layout and layout_compare."""
    return ~(
        (u_min <= _ZO_U1) & (u_max >= _ZO_U0) & (m_min <= _ZO_M1) & (m_max >= _ZO_M0)
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout report — the storage-layout
    side of 100-TB efficiency (Delta/Iceberg OPTIMIZE ZORDER): compute
    the interleaved z-value over (user_id, event minute), split the
    z-range into ``_ZO_BUCKETS`` equal-width buckets (files), and
    report per bucket the row count, both dimensions' min/max (the
    footer stats a reader would consult), and whether the bucket is
    SKIPPABLE for a representative box query (users 100-200 on day 1).
    Because z-order keeps both dimensions locally coherent, most
    buckets are skippable for a 2-D box — the property a
    single-column sort lacks on its second dimension.

    Scale shape: the z-value is per-row bit algebra (no shuffle); the
    bucket id is equal-width on the z-range (two broadcast scalars —
    at write time this is repartitionByRange on z, the same sampling
    machinery as a global sort); the report is one hash agg. Minutes
    are taken relative to the table's min timestamp so the bucket
    layout is content-deterministic, not wall-clock-dependent."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    base = ev.select(
        F.col("user_id").cast("long").alias("u"),
        F.floor(F.unix_micros("ts") / F.lit(60_000_000)).cast("long").alias("m"),
    )
    bounds = base.agg(
        F.min("m").alias("m_min"),
        F.max("m").alias("m_max"),
        F.max("u").alias("u_max"),
    )
    b = base.crossJoin(F.broadcast(bounds)).select(
        "u",
        (F.col("m") - F.col("m_min")).alias("mrel"),
        "m_min",
        "m_max",
        "u_max",
    )
    z = _interleave_bits(F.col("u"), F.col("mrel"))
    zmax = _interleave_bits(F.col("u_max"), F.col("m_max") - F.col("m_min"))
    # equal-width z-range buckets; +1 so z == zmax lands in the last
    bucket = F.least(
        F.lit(_ZO_BUCKETS - 1).cast("long"),
        F.floor(
            (z * F.lit(_ZO_BUCKETS)).cast("double") / (zmax + 1).cast("double")
        ).cast("long"),
    )
    per = (
        b.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max_b"),
            F.min("mrel").alias("m_min_b"),
            F.max("mrel").alias("m_max_b"),
        )
    )
    skippable = _zo_skippable(
        F.col("u_min"), F.col("u_max_b"), F.col("m_min_b"), F.col("m_max_b")
    )
    return per.select(
        "bucket",
        "n_rows",
        "u_min",
        F.col("u_max_b").alias("u_max"),
        F.col("m_min_b").alias("m_min"),
        F.col("m_max_b").alias("m_max"),
        skippable.alias("skippable"),
    )


def _zorder_sql() -> str:
    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(epoch_us(ts) // 60000000 AS BIGINT) AS m
  FROM events
),
bounds AS (SELECT min(m) AS m_min, max(m) AS m_max, max(u) AS u_max FROM e),
b AS (
  SELECT u, m - bounds.m_min AS mrel, bounds.m_max - bounds.m_min AS mrel_max,
         bounds.u_max AS u_max
  FROM e CROSS JOIN bounds
),
zc AS (
  SELECT u, mrel,
         {_interleave_sql('u', 'mrel')} AS z,
         {_interleave_sql('u_max', 'mrel_max')} AS zmax
  FROM b
),
pb AS (
  SELECT least({_ZO_BUCKETS - 1}, (z * {_ZO_BUCKETS}) // (zmax + 1)) AS bucket,
         u, mrel
  FROM zc
),
agg AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         min(u) AS u_min, max(u) AS u_max,
         min(mrel) AS m_min, max(mrel) AS m_max
  FROM pb GROUP BY bucket
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_rows, u_min, u_max, m_min, m_max,
       NOT (u_min <= {_ZO_U1} AND u_max >= {_ZO_U0}
            AND m_min <= {_ZO_M1} AND m_max >= {_ZO_M0}) AS skippable
FROM agg"""


SQL_ZORDER_LAYOUT = _zorder_sql()


# --- layout_compare ---------------------------------------------------------


def q_layout_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies WHY z-order: bucket the events table three ways —
    z-order (Morton interleave), user-major sort, time-major sort —
    into the same number of equal-width key-range buckets, and report
    per layout how many buckets (and rows) the representative 2-D box
    query can skip on footer stats alone. Single-column sorts skip
    well on their own dimension and poorly on the other; z-order
    skips on both. One scan computes all three keys, one explode +
    one hash agg does the rest — the whole comparison is one shuffle.

    All three keys are exact BIGINT compositions (the sort-key pairs
    are packed as a*(max_b+1)+b), so bucket boundaries are
    engine-identical."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    base = ev.select(
        F.col("user_id").cast("long").alias("u"),
        F.floor(F.unix_micros("ts") / F.lit(60_000_000)).cast("long").alias("m"),
    )
    bounds = base.agg(
        F.min("m").alias("m_min"), F.max("m").alias("m_max"), F.max("u").alias("u_max")
    )
    b = base.crossJoin(F.broadcast(bounds)).select(
        "u",
        (F.col("m") - F.col("m_min")).alias("mr"),
        (F.col("m_max") - F.col("m_min")).alias("mr_max"),
        "u_max",
    )
    z = _interleave_bits(F.col("u"), F.col("mr"))
    zmax = _interleave_bits(F.col("u_max"), F.col("mr_max"))
    k_user = F.col("u") * (F.col("mr_max") + 1) + F.col("mr")
    k_user_max = F.col("u_max") * (F.col("mr_max") + 1) + F.col("mr_max")
    k_time = F.col("mr") * (F.col("u_max") + 1) + F.col("u")
    k_time_max = F.col("mr_max") * (F.col("u_max") + 1) + F.col("u_max")

    def bkt(k: F.Column, kmax: F.Column) -> F.Column:
        return F.least(
            F.lit(_ZO_BUCKETS - 1).cast("long"),
            F.floor(
                (k * F.lit(_ZO_BUCKETS)).cast("double") / (kmax + 1).cast("double")
            ).cast("long"),
        )

    layouts = F.array(
        F.struct(F.lit("zorder").alias("layout"), bkt(z, zmax).alias("bucket")),
        F.struct(
            F.lit("user_sort").alias("layout"), bkt(k_user, k_user_max).alias("bucket")
        ),
        F.struct(
            F.lit("time_sort").alias("layout"), bkt(k_time, k_time_max).alias("bucket")
        ),
    )
    rows = b.select("u", "mr", F.explode(layouts).alias("L")).select(
        "u", "mr", F.col("L.layout").alias("layout"), F.col("L.bucket").alias("bucket")
    )
    per = rows.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("u").alias("u_min"),
        F.max("u").alias("u_max"),
        F.min("mr").alias("m_min"),
        F.max("mr").alias("m_max"),
    )
    skippable = _zo_skippable(
        F.col("u_min"), F.col("u_max"), F.col("m_min"), F.col("m_max")
    )
    agg = per.withColumn("skip", skippable).groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("skip").cast("long")).cast("long").alias("n_skippable"),
        F.sum(F.when(F.col("skip"), F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_skipped"),
        F.sum("n_rows").cast("long").alias("rows_total"),
    )
    return agg.withColumn(
        "skip_pct_micro",
        F.floor(
            (F.col("rows_skipped") * F.lit(1_000_000)).cast("double")
            / F.col("rows_total").cast("double")
        ).cast("long"),
    )


def _layout_compare_sql() -> str:
    def bkt(k: str, kmax: str) -> str:
        return f"least({_ZO_BUCKETS - 1}, ({k} * {_ZO_BUCKETS}) // ({kmax} + 1))"

    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(epoch_us(ts) // 60000000 AS BIGINT) AS m
  FROM events
),
bounds AS (SELECT min(m) AS m_min, max(m) AS m_max, max(u) AS u_max FROM e),
b AS (
  SELECT u, m - bounds.m_min AS mr, bounds.m_max - bounds.m_min AS mr_max,
         bounds.u_max AS u_max
  FROM e CROSS JOIN bounds
),
keyed AS (
  SELECT u, mr,
         {_interleave_sql('u', 'mr')} AS z, {_interleave_sql('u_max', 'mr_max')} AS zmax,
         u * (mr_max + 1) + mr AS ku, u_max * (mr_max + 1) + mr_max AS kumax,
         mr * (u_max + 1) + u AS kt, mr_max * (u_max + 1) + u_max AS ktmax
  FROM b
),
rows_l AS (
  SELECT u, mr, 'zorder' AS layout, {bkt('z', 'zmax')} AS bucket FROM keyed
  UNION ALL
  SELECT u, mr, 'user_sort', {bkt('ku', 'kumax')} FROM keyed
  UNION ALL
  SELECT u, mr, 'time_sort', {bkt('kt', 'ktmax')} FROM keyed
),
per AS (
  SELECT layout, bucket, CAST(count(*) AS BIGINT) AS n_rows,
         min(u) AS u_min, max(u) AS u_max, min(mr) AS m_min, max(mr) AS m_max
  FROM rows_l GROUP BY layout, bucket
),
marked AS (
  SELECT *, NOT (u_min <= {_ZO_U1} AND u_max >= {_ZO_U0}
                 AND m_min <= {_ZO_M1} AND m_max >= {_ZO_M0}) AS skip
  FROM per
),
agg AS (
  SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CASE WHEN skip THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
         CAST(sum(CASE WHEN skip THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
         CAST(sum(n_rows) AS BIGINT) AS rows_total
  FROM marked GROUP BY layout
)
SELECT layout, n_buckets, n_skippable, rows_skipped, rows_total,
       CAST((rows_skipped * 1000000) // rows_total AS BIGINT) AS skip_pct_micro
FROM agg"""


SQL_LAYOUT_COMPARE = _layout_compare_sql()


QUERIES9: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_budget_fill": q_token_budget_fill,
    "domain_rebalance": q_domain_rebalance,
    "semdedup_trained": q_semdedup_trained,
    "bpe_train": q_bpe_train,
    "bigram_lm_score": q_bigram_lm_score,
    "contamination_overlap": q_contamination_overlap,
    "mix_report": q_mix_report,
    "bpe_apply": q_bpe_apply,
    "cross_dedup": q_cross_dedup,
    "zorder_layout": q_zorder_layout,
    "layout_compare": q_layout_compare,
}

ORACLES9: dict[str, str] = {
    "token_budget_fill": SQL_TOKEN_BUDGET_FILL,
    "domain_rebalance": SQL_DOMAIN_REBALANCE,
    "semdedup_trained": SQL_SEMDEDUP_TRAINED,
    "bpe_train": SQL_BPE_TRAIN,
    "bigram_lm_score": SQL_BIGRAM_LM_SCORE,
    "contamination_overlap": SQL_CONTAMINATION_OVERLAP,
    "mix_report": SQL_MIX_REPORT,
    "bpe_apply": SQL_BPE_APPLY,
    "cross_dedup": SQL_CROSS_DEDUP,
    "zorder_layout": SQL_ZORDER_LAYOUT,
    "layout_compare": SQL_LAYOUT_COMPARE,
}
