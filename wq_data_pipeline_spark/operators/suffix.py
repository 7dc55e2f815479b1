"""Suffix-array construction by prefix doubling — pure DataFrame
algebra, no UDFs.

The reference corpus-dedup literature (Lee et al. 2022 §3) detects
exact duplicated substrings with a suffix array; the repo's gram-hash
operators (dup_spans / dup_span_removal) approximate that with fixed
n-grams. This module adds the genuine article at the per-document
grain: ``suffix_ranks`` computes, for every position of every
document, the rank of its suffix among that document's suffixes under
depth-bounded lexicographic order — via prefix doubling:

    rank_1    = dense_rank of the single character
    rank_{2k} = dense_rank of the pair (rank_k[pos], rank_k[pos+k])

Each doubling round is ONE equi-join (pos+k lookup) and ONE dense-rank
window, both partitioned by doc_id — embarrassingly parallel across
documents, no global sort anywhere, and the number of rounds is
log2(depth), a CONSTANT chosen by the caller (depth 64 -> 6 rounds),
not a function of corpus size.

Depth bound: ranks order suffixes by their first ``depth`` characters
(ties broken by position). For repeat detection with a minimum match
length L <= depth this is exact; it is also what keeps the operator
scale-sane — the full-depth variant would need ceil(log2(max_doc_len))
rounds.

Scaling to the corpus-global suffix array (cross-document repeats):
the same doubling recurrence applies with (doc_id, pos) replaced by a
global offset (distributed_prefix_sum in operators/scale.py builds
the offsets) and each dense-rank window replaced by a range-partitioned
sort + two-level rank — i.e. rounds stay O(log depth), each round one
shuffle of (pos, rank, rank2) triples. Per-doc windows are used here
because the catalog entry targets within-document repetition
(the Gopher self-repetition class) where the oracle can brute-force
the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def suffix_positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, 0-based position): (id, pos, n)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.length(text_col).alias("n"),
    ).select(
        "doc_id",
        "_text",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("pos"),
    )


def suffix_ranks(
    docs: DataFrame, id_col: str, text_col: str, depth: int = 64, seed: int = 8
) -> DataFrame:
    """(doc_id, pos, rank): rank of the suffix starting at ``pos``
    among the document's suffixes, ordered by the first ``depth``
    characters. ``depth`` and ``seed`` must be powers of two.

    ``seed`` is the length of the literal prefix the FIRST rank sorts
    on; doubling then runs log2(depth/seed) rounds. The trade: a
    bigger seed shuffles seed-length strings once but removes whole
    join+rank rounds (seed 8 / depth 64 = 3 rounds vs 6 from seed 1 —
    measured 2x faster end-to-end); at cluster scale the seed is the
    8 chars that pack into one int64 sort key."""
    if depth < 1 or depth & (depth - 1):
        raise ValueError(f"depth must be a power of two, got {depth}")
    if seed < 1 or seed & (seed - 1) or seed > depth:
        raise ValueError(f"seed must be a power of two <= depth, got {seed}")
    p = suffix_positions(docs, id_col, text_col)
    wd = Window.partitionBy("doc_id")
    r = p.withColumn(
        "rank",
        F.dense_rank()
        .over(wd.orderBy(F.col("_text").substr(F.col("pos") + 1, F.lit(seed))))
        .cast("long"),
    ).select("doc_id", "n", "pos", "rank")
    k = seed
    while k < depth:
        # each round reads the previous round TWICE (itself + the
        # pos+k shift); without pinning, the doubling chain re-executes
        # the whole prefix 2^rounds times (the dual-subtree rule in
        # BASELINE.md) — measured 34 s vs 9 s at sf0.01
        r = r.localCheckpoint(eager=True)
        shifted = r.select(
            "doc_id",
            (F.col("pos") - k).alias("pos"),
            F.col("rank").alias("_r2"),
        )
        r = (
            r.join(shifted, ["doc_id", "pos"], "left")
            .withColumn("_r2", F.coalesce("_r2", F.lit(0)))
            .withColumn(
                "rank",
                F.dense_rank()
                .over(wd.orderBy(F.col("rank"), F.col("_r2")))
                .cast("long"),
            )
            .select("doc_id", "n", "pos", "rank")
        )
        k *= 2
    return r


def _lcp_capped(a: Column, b: Column, text: Column, cap: int) -> Column:
    """Length of the common prefix of the suffixes at 0-based ``a``
    and ``b`` of ``text``, capped at ``cap`` — by GREEDY BINARY
    DESCENT: for step in cap's descending binary decomposition, test
    whether the next ``step`` characters match and extend the
    accumulated length if so. log2(cap) substring comparisons per
    row, all plain codegen expressions. (Two rejected forms, both
    measured at sf0.01: a k-prefix indicator sum re-extracts
    O(cap^2) chars/row; a per-char array fold runs outside codegen
    with a struct allocation per element — 13.7 s vs 1.3 s for the
    descent on the same 85k pairs.)

    Precondition: the two suffixes must have different lengths —
    always true for distinct positions of one document. (When a
    comparison window runs past both string ends, truncated-equal
    prefixes would over-count; different lengths make truncated
    tails unequal, so the descent stops exactly at the true LCP.)"""
    pa = text.substr(a + 1, F.lit(cap))
    pb = text.substr(b + 1, F.lit(cap))
    steps: list[int] = []
    rem = cap
    p = 1
    while p * 2 <= cap:
        p *= 2
    while p:
        if rem >= p:
            steps.append(p)
            rem -= p
        p //= 2
    lcp: Column = F.lit(0).cast("long")
    for step in steps:
        ext = pa.substr(lcp + 1, F.lit(step)) == pb.substr(lcp + 1, F.lit(step))
        lcp = lcp + F.when(ext, F.lit(step)).otherwise(F.lit(0))
    return lcp


def adjacent_lcp(
    docs: DataFrame, id_col: str, text_col: str, depth: int = 64
) -> DataFrame:
    """Adjacent-suffix LCPs in per-document suffix-array order:
    (doc_id, pos, prev_pos, lcp), lcp capped at depth-1. The longest
    internally repeated substring of a document is max(lcp) — the
    suffix-array identity the gram-hash operators approximate."""
    ranks = suffix_ranks(docs, id_col, text_col, depth)
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    w = Window.partitionBy("doc_id").orderBy("rank", "pos")
    adj = (
        ranks.withColumn("prev_pos", F.lag("pos").over(w))
        .filter(F.col("prev_pos").isNotNull())
        .join(base, "doc_id")
    )
    return adj.select(
        "doc_id",
        "n",
        "pos",
        "prev_pos",
        _lcp_capped(
            F.col("pos"), F.col("prev_pos"), F.col("_text"), depth - 1
        ).alias("lcp"),
    )
