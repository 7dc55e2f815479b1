"""Scalar expression helpers (SURVEY.md §2.2, §2.7).

All are pure Column algebra — they stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def sanitize_name(name: str) -> str:
    """Plan-time column-name sanitizer (P3; reference sanitize,
    scripts/ufz_water_qc_pipeline.py:65-66)."""
    return re.sub(r"[^A-Za-z0-9._-]+", "_", name).strip("_")


def season_expr(ts: str | Column, out_month: bool = False) -> Column:
    """Meteorological season of a timestamp (P9; reference as_season,
    scripts/ufz_water_qc_pipeline.py:84-89): DJF/MAM/JJA/SON."""
    t = F.col(ts) if isinstance(ts, str) else ts
    m = F.month(t)
    return (
        F.when(m.isin(12, 1, 2), "DJF")
        .when(m.isin(3, 4, 5), "MAM")
        .when(m.isin(6, 7, 8), "JJA")
        .otherwise("SON")
    )


def frac_part(value: str | Column) -> Column:
    """Fractional part matching numpy ``modf(v)[0] % 1.0`` (P8;
    reference dec_frac, scripts/ufz_water_qc_pipeline.py:125-127):
    non-negative for negative inputs too -> pmod."""
    v = F.col(value) if isinstance(value, str) else value
    return F.pmod(v - F.floor(v), F.lit(1.0))


def doy_harmonics(ts: str | Column) -> tuple[Column, Column]:
    """Day-of-year sin/cos features (P10; reference
    scripts/ufz_water_qc_pipeline.py:595)."""
    import math

    t = F.col(ts) if isinstance(ts, str) else ts
    ang = F.lit(2.0 * math.pi) * F.dayofyear(t) / F.lit(365.25)
    return F.sin(ang), F.cos(ang)


def isfinite(value: str | Column) -> Column:
    """Post-ingest the engine uses NULL for all non-finite values
    (SURVEY §1.2), so finite == not-null; the isnan guard covers
    DataFrames that bypassed ingest."""
    v = F.col(value) if isinstance(value, str) else value
    return v.isNotNull() & ~F.isnan(v)
