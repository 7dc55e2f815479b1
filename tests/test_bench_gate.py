"""Per-query wall-cap gate: every catalog entry must build AND
noop-sink at sf0.01 inside a hard per-query budget.

This is the regression fence for the round-2 failure mode: a query
with a quadratic plan (winnow_fingerprints re-evaluating its md5
array per window position — 61.5 s at sf0.01) landed after the last
self-bench and timed out the driver's whole sf0.1 bench run. Nothing
enters QUERIES without passing this gate, so a pathological plan is
caught in the suite, not in the driver.

The timer covers query CONSTRUCTION plus execution: iterative
operators (connected components, k-means) run their driver-side
rounds eagerly at build time, and that cost is as real as the sink.
"""

from __future__ import annotations

import time

import pytest

# slow tier (pytest.ini): run with -m slow
pytestmark = pytest.mark.slow

# Absolute floor of the cap on fast hardware. On slow/shared machines
# the cap scales with a measured per-run floor instead (a cold JVM or
# noisy neighbor must not flake a healthy query): budget =
# max(BUDGET_MIN_S, BUDGET_PROBE_MULT × wall of a trivial scan+sink).
# A genuinely quadratic plan (the r2 winnow failure was 61.5 s at
# sf0.01) blows past either form.
BUDGET_MIN_S = 15.0
BUDGET_PROBE_MULT = 15.0


def _names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


# Hard ceiling on the scaled cap: the r2 winnow quadratic ran 61.5 s
# at sf0.01 — the budget must never stretch past a value that would
# re-admit that magnitude of regression, however slow the machine.
BUDGET_MAX_S = 40.0


@pytest.fixture(scope="module")
def budget_s(spark, sf_dir):
    # warm up first (JVM/codegen/session start-up), THEN time the
    # probe — this module is often the first pytest collects, and a
    # cold first action would inflate the cap by the very warmup cost
    # the gate must not absorb
    for _ in range(2):
        spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
            "overwrite"
        ).save()
    # also touch the heavy table + a shuffle agg: first-query codegen
    # compilation otherwise lands on whichever (alphabetically early)
    # heavy catalog entry runs first and flakes it past the cap
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy(F.length("text").alias("g"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    t0 = time.perf_counter()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    probe = time.perf_counter() - t0
    return min(BUDGET_MAX_S, max(BUDGET_MIN_S, BUDGET_PROBE_MULT * probe))


@pytest.mark.parametrize("name", _names())
def test_query_within_budget(spark, sf_dir, name, budget_s):
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    # One retry on breach: full-suite runs hit the documented ±35%+
    # machine-drift band (r6: 28.9 s charged to a ~1 s query; r7/r8:
    # three sub-second entries "failed" in-suite and passed alone on
    # an idle machine). A genuinely quadratic plan — the regression
    # this gate exists for — blows the budget BOTH times; a drift
    # stall doesn't repeat back-to-back.
    elapsed = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        if elapsed <= budget_s:
            return
    assert elapsed <= budget_s, (
        f"{name} took {elapsed:.1f}s at sf0.01 twice in a row (budget "
        f"{budget_s:.1f}s) — quadratic plan? fix before it reaches the "
        "driver bench"
    )
