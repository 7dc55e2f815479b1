"""Deduplication operators: exact, fingerprint, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design (the point of these at 100 TB):
- Exact/fingerprint dedup is one hash-groupBy — embarrassingly
  parallel, one shuffle on the hash.
- MinHash signatures are computed per-row (no shuffle); LSH banding
  turns all-pairs comparison into a groupBy on band keys, so the
  candidate-pair join touches only same-bucket docs. The only
  all-pairs fallback (jaccard_pairs) is for verification of bounded
  candidate sets.
- Portability: minhashes are lexicographic minima of md5 hex digests
  (md5 is identical everywhere) rather than engine-specific integer
  hashes, so results are reproducible across engines and languages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from wq_data_pipeline_spark.operators.text import distinct_words, doc_fingerprint, word_shingles


def exact_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: md5-of-text groups; canonical = min id. Returns
    per-row (id, canonical_id, is_duplicate)."""
    d = df.withColumn("_h", F.md5(F.col(text)))
    canon = d.groupBy("_h").agg(F.min(id_col).alias("canonical_id"))
    return (
        d.join(canon, on="_h")
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
        .drop("_h")
    )


def fingerprint_groups(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", min_size: int = 2
) -> DataFrame:
    """Near-dup clusters by order-insensitive word-set fingerprint."""
    d = df.withColumn("fp", doc_fingerprint(text))
    return (
        d.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") >= min_size)
    )


def minhash_signature(
    text: str | Column, num_hashes: int = 8, shingle_n: int = 3
) -> list[Column]:
    """MinHash signature: for seed i, min over shingles of
    md5(shingle || '#' || i) — the lexicographic min of a uniformly
    distributed hex digest is a valid min-hash, and md5 hex strings
    are engine-portable."""
    sh = word_shingles(text, shingle_n)
    sigs = []
    for i in range(num_hashes):
        hashed = F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"#{i}"))))
        sigs.append(F.array_min(hashed).alias(f"mh{i}"))
    return sigs


def minhash_signatures_table(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures via explode + groupBy — the scale form.

    The per-row array formulation (:func:`minhash_signature`) rebuilds
    the shingle array once per signature column; exploding shingles to
    rows computes them once and the per-seed minima come from one
    partial-aggregated groupBy (map-side combine, one shuffle on id).
    ``explode_outer`` keeps shingle-less docs (NULL signature), like
    the per-row form."""
    sh = df.select(
        F.col(id_col), F.explode_outer(word_shingles(text, shingle_n)).alias("_s")
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("_s"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(sig_cols: list[str], rows_per_band: int = 2) -> list[Column]:
    """Band keys: hash of each consecutive group of signature rows.
    Docs sharing ANY band key are near-dup candidates."""
    bands = []
    for b in range(0, len(sig_cols), rows_per_band):
        group = sig_cols[b : b + rows_per_band]
        bands.append(
            F.md5(F.concat_ws("|", *[F.col(c) for c in group])).alias(f"band{b // rows_per_band}")
        )
    return bands


def minhash_lsh_candidates(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding: signature ->
    band keys -> self-join per band (shuffle on band key only)."""
    sig = minhash_signatures_table(df, text, id_col, num_hashes, shingle_n)
    banded = sig.select(
        id_col, *lsh_bands([f"mh{i}" for i in range(num_hashes)], rows_per_band)
    )
    n_bands = (num_hashes + rows_per_band - 1) // rows_per_band
    pairs = None
    for b in range(n_bands):
        a = banded.select(F.col(id_col).alias("id_a"), F.col(f"band{b}").alias("_k"))
        c = banded.select(F.col(id_col).alias("id_b"), F.col(f"band{b}").alias("_k"))
        p = a.join(c, on="_k").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def simhash_bits(text: str | Column, bits: int = 16) -> Column:
    """SimHash over the distinct word set: bit j of the hash is the
    sign of sum over words of (+1 if bit j of md5(word) else -1).
    Returns the integer simhash. Bit j of a word's md5 = parity test
    on hex digit j (deterministic, engine-portable)."""
    words = distinct_words(text)
    odd_hex = ("1", "3", "5", "7", "9", "b", "d", "f")
    acc = F.lit(0)
    for j in range(bits):
        # parity of hex digit j of md5(word) — an IN-list test on the
        # digit is portable to any SQL dialect (no conv/strtol needed)
        digit = F.transform(
            words,
            lambda w: F.when(F.substring(F.md5(w), j + 1, 1).isin(*odd_hex), 1).otherwise(0),
        )
        vote = F.aggregate(digit, F.lit(0), lambda a, x: a + x) * 2 - F.size(words)
        acc = acc + F.when(vote > 0, F.lit(1 << j)).otherwise(0)
    return acc


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    final stage of near-dup clustering (candidate pairs -> clusters).

    Each node's label converges to the minimum id in its component;
    iterations needed = component diameter (small for dedup clusters).
    Loops until a fixpoint (one tiny count() per round) or max_iters.
    At 100 TB this is the standard large-scale formulation: every round
    is one shuffle join on the edge list; no driver-side graph.
    """
    lab = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    for _ in range(max_iters):
        neighbor_min = (
            both.join(lab, both.b == lab.node)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_lab = (
            lab.join(neighbor_min, lab.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
        )
        new_lab = new_lab.cache()
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        lab.unpersist() if hasattr(lab, "unpersist") else None
        lab = new_lab
        if changed == 0:
            break
    return lab.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verify candidate pairs with exact word-set Jaccard. ``pairs``
    has (id_a, id_b); the doc table is joined twice (broadcast when
    small)."""
    w = df.select(F.col(id_col), distinct_words(text).alias("ws"))
    a = w.select(F.col(id_col).alias("id_a"), F.col("ws").alias("ws_a"))
    b = w.select(F.col(id_col).alias("id_b"), F.col("ws").alias("ws_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    return j.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )
