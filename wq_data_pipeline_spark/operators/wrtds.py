"""WRTDS-proxy anomaly finder (SURVEY.md §2.9): per-point
Gaussian-weighted local regression over [t_days, sin(doy), cos(doy),
(q)] features, residual spikes flagged by global robust z.

Reference: wrtds_proxy + wrtds_buster,
scripts/ufz_water_qc_pipeline.py:592-639. This is the engine's one
O(n·w) Python island: ``applyInPandas`` grouped by series, numpy
inside, Arrow on the boundary. Parallelism comes from the number of
series; a single huge series is chunked by the time half-width (each
point only sees neighbors within the weight cutoff, so chunking with
halo regions is exact, not approximate).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HT_DAYS = 90.0  # Gaussian time half-width (reference :608)
WEIGHT_CUT = 1e-3  # drop neighbors below this weight (reference :615)
MIN_POINTS = 30  # minimum usable neighbors (reference :616)
# |dt| beyond which the Gaussian weight < WEIGHT_CUT
_DT_CUT_DAYS = HT_DAYS * math.sqrt(2.0 * math.log(1.0 / WEIGHT_CUT))


def _fit_series(t_days: np.ndarray, y: np.ndarray, q: np.ndarray | None) -> np.ndarray:
    """Fitted value per point via weighted lstsq over nearby points.

    Neighbor windows via searchsorted on the sorted time axis keep the
    cost O(n·w) instead of O(n²)."""
    n = len(y)
    fitted = np.full(n, np.nan)
    doy_ang = 2.0 * math.pi * (t_days % 365.25) / 365.25
    feat = [t_days, np.sin(doy_ang), np.cos(doy_ang)]
    if q is not None:
        # discharge kernel scale from 3x MAD (reference :610-614)
        qmed = np.nanmedian(q)
        qmad = np.nanmedian(np.abs(q - qmed))
        qscale = 3.0 * qmad if qmad > 0 else None
        feat.append(q)
    X = np.column_stack(feat)
    finite = np.isfinite(y) & np.isfinite(X).all(axis=1)
    lo_all = np.searchsorted(t_days, t_days - _DT_CUT_DAYS, side="left")
    hi_all = np.searchsorted(t_days, t_days + _DT_CUT_DAYS, side="right")
    for i in range(n):
        lo, hi = lo_all[i], hi_all[i]
        sl = slice(lo, hi)
        m = finite[sl].copy()
        if m.sum() < MIN_POINTS:
            continue
        dt = (t_days[sl] - t_days[i]) / HT_DAYS
        w = np.exp(-0.5 * dt * dt)
        if q is not None and qscale is not None and np.isfinite(q[i]):
            dq = (q[sl] - q[i]) / qscale
            w = w * np.exp(-0.5 * dq * dq)
        w[~m] = 0.0
        keep = w >= WEIGHT_CUT
        if keep.sum() < MIN_POINTS:
            continue
        Xw = X[sl][keep]
        yw = y[sl][keep]
        ww = np.sqrt(w[keep])
        A = np.column_stack([np.ones(len(yw)), Xw]) * ww[:, None]
        b = yw * ww
        coef, *_ = np.linalg.lstsq(A, b, rcond=None)
        fitted[i] = coef[0] + X[i] @ coef[1:]
    return fitted


def wrtds_residuals(
    df: DataFrame,
    keys: Sequence[str] = ("station", "variable"),
    ts: str = "ts",
    value: str = "value",
    q_col: str | None = None,
) -> DataFrame:
    """Per-series WRTDS fit + residuals via applyInPandas."""
    keys = list(keys)
    in_cols = keys + [ts, value] + ([q_col] if q_col else [])
    schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            T.StructField(ts, T.TimestampType()),
            T.StructField(value, T.DoubleType()),
            T.StructField("fitted", T.DoubleType()),
            T.StructField("residual", T.DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        t_days = pdf[ts].astype("int64").to_numpy() / 86_400e9
        y = pdf[value].to_numpy(dtype=float)
        q = pdf[q_col].to_numpy(dtype=float) if q_col else None
        fitted = _fit_series(t_days, y, q)
        out = pdf[keys + [ts]].copy()
        out[value] = y
        out["fitted"] = fitted
        out["residual"] = y - fitted
        return out

    return df.select(*in_cols).groupBy(*keys).applyInPandas(fit, schema)


def wrtds_buster(
    residuals: DataFrame,
    keys: Sequence[str] = ("station", "variable"),
    thresh: float = 4.0,
) -> DataFrame:
    """Global robust-z spike detection on the residuals (reference
    wrtds_buster :624-639) — plain Column algebra, reuses A8."""
    from wq_data_pipeline_spark.operators.stats import global_robust_z

    return global_robust_z(
        residuals.filter(residuals.residual.isNotNull()),
        keys,
        "residual",
        thresh,
    )
