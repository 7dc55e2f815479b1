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

BUDGET_S = 10.0


def _names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_within_budget(spark, sf_dir, name):
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    assert elapsed <= BUDGET_S, (
        f"{name} took {elapsed:.1f}s at sf0.01 (budget {BUDGET_S}s) — "
        "quadratic plan? fix before it reaches the driver bench"
    )
