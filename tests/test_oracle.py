"""Every queries() entry must match its oracle_sql() on sf0.01 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

# slow tier (pytest.ini): run with -m slow
pytestmark = pytest.mark.slow

from tests.oracle_utils import compare


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return sorted(q.keys()), q, o


NAMES, QUERIES, ORACLES = _pairs()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ok, msg = compare(df, ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3
