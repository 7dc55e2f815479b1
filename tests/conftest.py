from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TEST = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from wq_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="wq-engine-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST


@pytest.fixture(scope="session")
def drain_stateful(spark):
    """Callable (q, table, target_rows, timeout=150) that waits until a
    memory sink holds target_rows rows (or the query dies), then stops
    the query. applyInPandasWithState queries do not self-terminate
    under availableNow, so every stateful-streaming test needs this.
    Lives in conftest so tests work under bare ``pytest`` from any cwd
    (tests/ has no __init__.py, so cross-test-module imports don't)."""
    import time

    def _drain(q, table: str, target_rows: int, timeout: float = 150.0):
        deadline = time.time() + timeout
        while time.time() < deadline and q.isActive:
            try:
                if spark.sql(f"select count(*) from {table}").first()[0] >= target_rows:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        if q.isActive:
            q.stop()
        q.awaitTermination(30)

    return _drain
