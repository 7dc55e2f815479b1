"""Local mirror of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet dir, compare
row-count, column names, and order-insensitive values."""

from __future__ import annotations

import decimal
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark directory-style writes in fixtures
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    """Driver-strict cell normalization: EXACT values, tagged with a
    type class so cross-engine type artifacts (e.g. DuckDB
    decimal128(38,0) from sum(INTEGER) vs Spark int64) fail locally
    exactly like the driver's value-hash does. No float rounding —
    round-1 showed exact paths are bit-identical cross-engine."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    s_cols = sorted(c.lower() for c in spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_con(sf_dir)
    # The driver hashes the oracle result through a pandas frame, where
    # DuckDB HUGEINT (e.g. any uncast sum(BIGINT) reaching the output)
    # degrades to float64 while Spark emits int64 -> hash divergence
    # even when every value matches (the r5 domain_rebalance red row).
    # fetchall() returns Python ints for HUGEINT so the value compare
    # below can't see it; check the declared types instead.
    hug = [
        (c, t)
        for c, t, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
        if "HUGEINT" in t.upper() or "INT128" in t.upper()
    ]
    if hug:
        return False, (
            f"oracle emits HUGEINT column(s) {hug}: cast sum()-derived "
            "outputs to BIGINT or the driver's pandas hash will diverge"
        )
    res = con.execute(sql)
    d_cols_raw = [d[0] for d in res.description]
    d_rows = res.fetchall()
    d_cols = sorted(c.lower() for c in d_cols_raw)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    a = _norm_rows(list(spark_df.columns), s_rows)
    b = _norm_rows(d_cols_raw, d_rows)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    if mism:
        return False, f"{len(mism)} mismatched rows; first 3: {mism[:3]}"
    return True, f"OK ({len(s_rows)} rows)"
