"""Catalog batch 24 (round 6, twelfth wave): keeper-protected
exact-substring removal — the strict keep-one semantics the gram-
island operators could not guarantee.

Background (ADVICE r4/r5, COVERAGE handoff #2): dup_span_removal and
its island-text-keeper variant can remove EVERY occurrence of a
duplicated substring when distinct duplicate runs merge into one
island — keep-one holds per island, not per duplicated string. This
entry makes the text-level guarantee:

  for every duplicated L-gram in the corpus, the KEEPER occurrence's
  characters are NEVER removed — removal coverage is computed as
  (non-keeper span coverage) MINUS (keeper span coverage).

Construction (all equi-joins and hash aggregates):
  1. every character offset contributes its L-char gram;
  2. grams occurring >= 2 times form groups; the group keeper is the
     minimum (doc, pos) in corpus order — aligned copies of a longer
     duplicate therefore pick ALL their keepers in the same (first)
     occurrence, so full spans survive intact in the aligned case;
  3. non-keeper occurrences mark [pos, pos+L) for removal, keeper
     occurrences mark [pos, pos+L) as protected;
  4. a character is removed iff covered by some removal span AND NOT
     covered by any protection span — COUNTED (the report needs
     counts, not char rows) by an endpoint line sweep per document
     (keepone_removed_counts, r9): cumulative +1/−1 coverage over
     span boundaries, segment lengths where rm > 0 and kp = 0. The
     exact per-char form (binned interval join: span -> <= 2 L-bins,
     char -> 1 bin) survives in keepone_marks_and_removed for the
     invariant tests and the sweep-parity pin.

Scale: gram grouping is explode + hash agg (dup_spans' measured
shape); the sweep is 4 event rows per duplicated occurrence + one
per-doc window sort — span-density-bound, so documents without
duplicates cost nothing past the gram scan (the replaced char-join
form paid one join probe per corpus character regardless).

The oracle mirrors every step in SQL; the keep-one guarantee itself
is pinned by tests/test_keepone.py on the exact merged-island
scenario that breaks the island-keeper rule.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wq_data_pipeline_spark.sources.testdata import load_table

_KP_L = 20
# composite corpus-order key: doc_id * 2^24 + pos (pos < 2^24 always
# at our doc sizes; doc_id stays < 2^39 even with replica offsets)
_KP_POSBITS = 1 << 24


def _positions(docs: DataFrame) -> DataFrame:
    """One row per character offset: (doc_id, n, x, text)."""
    d = docs.select(
        F.col("doc_id"), F.col("text"), F.length("text").alias("n")
    )
    # guarded: sequence(0, -1) on an empty text would infer step -1
    # and emit phantom positions [0, -1] (operators/text.py pattern)
    return d.select(
        "doc_id",
        "n",
        F.explode(
            F.when(
                F.col("n") > 0, F.sequence(F.lit(0), F.col("n") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("x"),
        "text",
    ).withColumn("x", F.col("x").cast("long"))


def _grams(docs: DataFrame, L: int) -> DataFrame:
    """(doc_id, s, g): the L-char gram at every 0-based offset.

    BYTE-slices ASCII documents (octet_length == length, so byte
    positions == char positions): encode once, then O(L) binary
    substr per offset — Spark's char-indexed substr must scan from
    byte 0 to locate the start, O(pos) per call and O(n²) per
    document (the suffix_window_keys lesson, operators/suffix.py:
    measured 29 s of pure offset scanning over 22M positions). The
    gram stage is built TWICE per keepone run (group side + probe
    side of keepone_marked), so the quadratic scan dominated the
    entry's wall (r11 bench: 14.4 s, the catalog's slowest row).
    Non-ASCII documents keep the exact char-indexed path."""
    d = docs.select(
        F.col("doc_id"),
        F.col("text"),
        F.length("text").alias("n"),
        F.octet_length("text").alias("nb"),
    )
    # offsets 0..n-L directly (== the old explode-all + x+L<=n filter)
    posed = F.explode(
        F.when(
            F.col("n") >= L, F.sequence(F.lit(0), F.col("n") - L)
        ).otherwise(F.array().cast("array<int>"))
    ).alias("s")
    fast = (
        d.filter(F.col("n") == F.col("nb"))
        .withColumn("_bin", F.encode("text", "UTF-8"))
        .select("doc_id", "_bin", posed)
        .select(
            "doc_id",
            F.col("s").cast("long").alias("s"),
            F.decode(
                F.col("_bin").substr(F.col("s") + 1, F.lit(L)), "UTF-8"
            ).alias("g"),
        )
    )
    slow = (
        d.filter(F.col("n") != F.col("nb"))
        .select("doc_id", "text", posed)
        .select(
            "doc_id",
            F.col("s").cast("long").alias("s"),
            F.col("text").substr(F.col("s") + 1, F.lit(L)).alias("g"),
        )
    )
    return fast.unionByName(slow)


def keepone_marked(docs: DataFrame, L: int = _KP_L) -> DataFrame:
    """(doc_id, s, is_keeper) per duplicated-gram occurrence: every
    L-gram occurring >= 2 times in the corpus, keeper = minimum
    (doc, pos) in corpus order.

    Window form (r12): group count and keeper key are plain
    count/min — computable as window aggregates over the SAME
    partitioning the old groupBy+join shuffled on — so the gram
    stream (the entry's dominant cost: byte-substr explode + one
    shuffle of L-char strings per corpus position) is built and
    shuffled ONCE instead of feeding both the group side and the
    probe side of a join. Per-window state is the occurrence count of
    one gram — exactly the join's output size for that gram, so no
    new hot-key exposure."""
    from pyspark.sql import Window

    grams = _grams(docs, L)
    wg = Window.partitionBy("g")
    key = F.col("doc_id") * _KP_POSBITS + F.col("s")
    marked = (
        grams.withColumn("_cnt", F.count(F.lit(1)).over(wg))
        .withColumn("_kkey", F.min(key).over(wg))
        .filter(F.col("_cnt") >= 2)
        .select("doc_id", "s", (key == F.col("_kkey")).alias("is_keeper"))
    )
    # pinned: marked feeds the sweep events (twice: +1/-1) AND the
    # per-doc occurrence agg; without it the gram explode + window
    # re-execute per consumer (the dual-subtree rule)
    return marked.localCheckpoint(eager=True)


def keepone_marks_and_removed(
    docs: DataFrame, L: int = _KP_L
) -> tuple[DataFrame, DataFrame]:
    """The exact PER-CHARACTER form, kept for the keep-one invariant
    and sweep-parity tests: (marked, removed) where removed =
    (doc_id, x) per erased character, resolved by the binned
    char × span interval join. Production counting goes through
    keepone_removed_counts (the endpoint sweep) — same result,
    span-density cost instead of corpus-size cost."""
    pos = _positions(docs)
    marked = keepone_marked(docs, L)
    spans = marked.withColumn(
        "bin",
        F.explode(
            F.array(
                (F.col("s") / L).cast("long"),
                ((F.col("s") + L - 1) / L).cast("long"),
            )
        ),
    ).dropDuplicates(["doc_id", "s", "is_keeper", "bin"])
    chars = pos.select(
        "doc_id", "n", "x", (F.col("x") / L).cast("long").alias("bin")
    )
    # ONE binned interval join resolves both coverages; a char is
    # removed iff some non-keeper span covers it and no keeper span
    # does (two boolean aggs over the joined rows)
    sp = spans.select(F.col("doc_id").alias("sdoc"), "s", "bin", "is_keeper")
    cov = (
        chars.join(
            sp,
            (chars["doc_id"] == sp["sdoc"])
            & (chars["bin"] == sp["bin"])
            & (chars["x"] >= sp["s"])
            & (chars["x"] < sp["s"] + L),
        )
        .groupBy("doc_id", "x")
        .agg(
            F.max(~F.col("is_keeper")).alias("any_rm"),
            F.max(F.col("is_keeper")).alias("any_kp"),
        )
    )
    removed = cov.filter(F.col("any_rm") & ~F.col("any_kp")).select("doc_id", "x")
    return marked, removed


def keepone_removed_counts(marked: DataFrame, L: int = _KP_L) -> DataFrame:
    """Interval-sweep count of removed characters per document (the
    r8-VERDICT #4 optimization): a char is removed iff covered by a
    non-keeper span and by NO keeper span, so |removed| per doc is a
    classic line sweep over span ENDPOINTS — +1/−1 events at s and
    s+L per occurrence, cumulative rm/kp counts ordered by position,
    summing segment lengths where rm > 0 and kp = 0.

    Cost: 4 event rows per duplicated-gram OCCURRENCE and one
    per-doc window sort — span-density-bound. The char-explode form
    it replaces ((doc,char) × span binned join + a corpus-sized
    groupBy) is corpus-size-bound: every character becomes a join
    probe even in documents with no duplicates at all. Measured at
    sf0.1: 12.6 s → see BASELINE.md r9 row. Parity with the exact
    per-char form is pinned by test_keepone.py.
    """
    rm = F.when(~F.col("is_keeper"), F.col("_d")).otherwise(F.lit(0))
    kp = F.when(F.col("is_keeper"), F.col("_d")).otherwise(F.lit(0))
    events = (
        marked.select(
            "doc_id", "is_keeper", F.col("s").alias("p"), F.lit(1).alias("_d")
        )
        .unionByName(
            marked.select(
                "doc_id",
                "is_keeper",
                (F.col("s") + L).alias("p"),
                F.lit(-1).alias("_d"),
            )
        )
        .groupBy("doc_id", "p")
        .agg(F.sum(rm).alias("d_rm"), F.sum(kp).alias("d_kp"))
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    seg = events.select(
        "doc_id",
        "p",
        F.sum("d_rm").over(w).alias("rm_cnt"),
        F.sum("d_kp").over(w).alias("kp_cnt"),
        (F.lead("p").over(w) - F.col("p")).alias("seg_len"),
    )
    return (
        seg.filter(
            (F.col("rm_cnt") > 0)
            & (F.col("kp_cnt") == 0)
            & F.col("seg_len").isNotNull()
        )
        .groupBy("doc_id")
        .agg(F.sum("seg_len").alias("chars_removed"))
    )


def keepone_removal_report(docs: DataFrame, L: int = _KP_L) -> DataFrame:
    """Per-document report of keeper-protected removal: duplicate /
    keeper occurrence counts and exactly how many characters the
    protected removal erases (counted by the interval sweep — see
    keepone_removed_counts; the per-char form survives in
    keepone_marks_and_removed for the invariant/parity tests)."""
    d = docs.select(F.col("doc_id"), F.length("text").alias("n"))
    marked = keepone_marked(docs, L)
    per_doc_occ = marked.groupBy("doc_id").agg(
        F.sum((~F.col("is_keeper")).cast("long")).alias("dup_occ"),
        F.sum(F.col("is_keeper").cast("long")).alias("keep_occ"),
    )
    per_doc_rm = keepone_removed_counts(marked, L)
    return (
        d.select("doc_id", "n")
        .join(per_doc_occ, "doc_id", "left")
        .join(per_doc_rm, "doc_id", "left")
        .select(
            "doc_id",
            "n",
            F.coalesce("dup_occ", F.lit(0)).alias("dup_occ"),
            F.coalesce("keep_occ", F.lit(0)).alias("keep_occ"),
            F.coalesce("chars_removed", F.lit(0)).alias("chars_removed"),
            F.expr("1000000 * coalesce(chars_removed, 0) DIV n").alias(
                "removed_micro"
            ),
        )
        .orderBy("doc_id")
    )


def q_keepone_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See keepone_removal_report — the catalog form over the
    documents table."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return keepone_removal_report(docs, _KP_L)


SQL_KEEPONE_REMOVAL = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
p AS (
  SELECT doc_id, n, unnest(range(0, n)) AS x, text FROM d
),
grams AS (
  SELECT doc_id, x AS s, substr(text, x + 1, {_KP_L}) AS g
  FROM p WHERE x + {_KP_L} <= n
),
groups AS (
  SELECT g, count(*) AS cnt,
         min(doc_id * {_KP_POSBITS} + s) AS kkey
  FROM grams GROUP BY 1 HAVING count(*) >= 2
),
marked AS (
  SELECT grams.doc_id, grams.s,
         (grams.doc_id * {_KP_POSBITS} + grams.s = groups.kkey) AS is_keeper
  FROM grams JOIN groups USING (g)
),
spans AS (
  SELECT DISTINCT doc_id, s, is_keeper, bin FROM (
    SELECT *, s // {_KP_L} AS bin FROM marked
    UNION ALL
    SELECT *, (s + {_KP_L} - 1) // {_KP_L} AS bin FROM marked
  )
),
chars AS (SELECT doc_id, n, x, x // {_KP_L} AS bin FROM p),
cov AS (
  SELECT c.doc_id, c.x,
         max(NOT sp.is_keeper) AS any_rm,
         max(sp.is_keeper) AS any_kp
  FROM chars c JOIN spans sp
    ON c.doc_id = sp.doc_id AND c.bin = sp.bin
   AND c.x >= sp.s AND c.x < sp.s + {_KP_L}
  GROUP BY 1, 2
),
removed AS (
  SELECT doc_id, x FROM cov WHERE any_rm AND NOT any_kp
),
occ AS (
  SELECT doc_id,
         CAST(sum(CAST(NOT is_keeper AS BIGINT)) AS BIGINT) AS dup_occ,
         CAST(sum(CAST(is_keeper AS BIGINT)) AS BIGINT) AS keep_occ
  FROM marked GROUP BY 1
),
rm AS (SELECT doc_id, count(*) AS chars_removed FROM removed GROUP BY 1)
SELECT d.doc_id, d.n,
       coalesce(dup_occ, 0) AS dup_occ,
       coalesce(keep_occ, 0) AS keep_occ,
       coalesce(chars_removed, 0) AS chars_removed,
       (1000000 * coalesce(chars_removed, 0)) // d.n AS removed_micro
FROM d LEFT JOIN occ USING (doc_id) LEFT JOIN rm USING (doc_id)
ORDER BY 1"""


QUERIES24: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "keepone_removal": q_keepone_removal,
}

ORACLES24: dict[str, str] = {
    "keepone_removal": SQL_KEEPONE_REMOVAL,
}
