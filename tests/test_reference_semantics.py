"""Golden-replication tests (SURVEY §5.2 item 2): run the engine's
pipeline stages against an independent pandas reimplementation of the
reference's semantics on the same fixture — covers the pieces the
DuckDB oracle can't see (full DAG composition, nitrate/calibration
paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

KEYS = ["station", "variable"]


@pytest.fixture(scope="module")
def qc_fixture():
    rng = np.random.default_rng(21)
    n = 3000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    v = rng.normal(12, 2, n)
    v[40:60] = -9999.0          # active sentinel (20 hits)
    # inactive sentinel: 2 hits < 5 AND 2/2981 rows = 0.067% < 0.1%
    # (3 hits would be 0.1006% — over the frac threshold and masked)
    v[100:102] = -99.0
    v[500:540] = 3.3            # 10h flat run
    dup_ts = ts[900]            # duplicate timestamp with two values
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    pdf = pd.concat(
        [pdf, pd.DataFrame({"station": ["s"], "variable": ["x"], "ts": [dup_ts], "value": [99.0]})]
    ).sort_values("ts").reset_index(drop=True)
    # 5h gap
    mask = (pdf["ts"] < ts[2000]) | (pdf["ts"] >= ts[2000] + pd.Timedelta(hours=5))
    return pdf[mask].reset_index(drop=True)


def _pandas_reference_clean(pdf: pd.DataFrame) -> pd.Series:
    """Independent reimplementation of the reference's clean deriv:
    sentinel mask (count>=5 or frac>=0.1%) -> dup median -> gap>2h null
    (scripts/ufz_water_qc_pipeline.py:158-189, 666-675 semantics)."""
    s = pdf.set_index("ts")["value"].astype(float)
    for sent in (-9.0, -99.0, -999.0, -9999.0):
        cnt = int((s == sent).sum())
        if cnt >= 5 or cnt / len(s) >= 0.001:
            s = s.mask(s == sent, np.nan)
    s = s.groupby(level=0).median()
    gaps = s.index.to_series().diff() > pd.Timedelta(hours=2)
    s[gaps] = np.nan
    return s


def test_clean_stage_matches_pandas_reference(spark, qc_fixture):
    from wq_data_pipeline_spark.plans.qc_pipeline import QCConfig, clean_stage

    got = (
        clean_stage(spark.createDataFrame(qc_fixture), QCConfig())
        .orderBy("ts")
        .select("ts", "clean")
        .toPandas()
    )
    exp = _pandas_reference_clean(qc_fixture)
    assert len(got) == len(exp)
    assert np.allclose(
        got["clean"].to_numpy(dtype=float), exp.to_numpy(), equal_nan=True, rtol=1e-12
    )
    # the inactive sentinel must have survived
    assert (got["clean"] == -99.0).sum() == 2


def test_flat_run_matches_pandas_reference(spark, qc_fixture):
    """Flat-run events vs the reference convention: eq = isclose to
    predecessor, end = first row after the run (:217)."""
    from wq_data_pipeline_spark.operators.detectors import detect_flat_runs
    from wq_data_pipeline_spark.plans.qc_pipeline import QCConfig, clean_stage

    cleaned = clean_stage(spark.createDataFrame(qc_fixture), QCConfig())
    ev = detect_flat_runs(
        cleaned.withColumnRenamed("clean", "value"), "value", KEYS, "ts",
        atol=0.0, min_hours=2.0,
    ).collect()

    s = _pandas_reference_clean(qc_fixture)
    eq = np.zeros(len(s), dtype=bool)
    vals = s.to_numpy()
    eq[1:] = np.isfinite(vals[1:]) & np.isfinite(vals[:-1]) & (
        np.abs(vals[1:] - vals[:-1]) <= 0.0
    )
    # islands of eq
    runs = []
    i = 0
    while i < len(eq):
        if eq[i]:
            j = i
            while j + 1 < len(eq) and eq[j + 1]:
                j += 1
            start, endi = s.index[i], (s.index[j + 1] if j + 1 < len(s) else s.index[j])
            hours = (endi - start).total_seconds() / 3600
            if hours >= 2.0:
                runs.append((start, endi, hours, vals[i]))
            i = j + 1
        else:
            i += 1
    assert len(ev) == len(runs) == 1
    g, r = ev[0], runs[0]
    assert pd.Timestamp(g.start) == r[0] and pd.Timestamp(g.end) == r[1]
    assert abs(g.hours - r[2]) < 1e-9 and abs(g.value - r[3]) < 1e-12


def test_sentem_nitrate_and_calibration_path(spark):
    """P4 calibration + P5 nitrate conversion through apply_sentemqc:
    NO3 input is converted to N (×14/62) before banding; the output
    masked values are in N units."""
    from wq_data_pipeline_spark.operators.sentem import (
        apply_sentemqc,
        calibration_offset,
        nitrate_to_n,
        NITRATE_NO3_TO_N,
    )

    rng = np.random.default_rng(8)
    n = 1200
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    no3 = rng.normal(20, 1.0, n)
    pdf = pd.DataFrame({"station": "s", "variable": "no3", "ts": ts, "value": no3})
    sdf = spark.createDataFrame(pdf)
    sdf = sdf.withColumn("value", calibration_offset("value", 0.5))
    sdf = sdf.withColumn("value", nitrate_to_n("value"))
    out = apply_sentemqc(sdf).orderBy("ts").collect()
    exp0 = (no3[0] + 0.5) * NITRATE_NO3_TO_N
    assert abs(out[0].value - exp0) < 1e-12
    ok = [r for r in out if not r.is_flagged]
    assert len(ok) > 0.9 * n
    # N units (~4.6 ± 0.23), not NO3 (~20.5): ±4σ bound
    assert all(3.5 < r.value_masked < 7.0 for r in ok)


def test_prefix_rolling_matches_direct(spark):
    """O(n) prefix-sum rolling mean/std must agree with the direct
    frame computation to float precision (incl. null gaps, series
    edges, the even-window left-heavy frame, and min_periods)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from wq_data_pipeline_spark.operators.sentem import (
        rolling_mean_std,
        rolling_mean_std_prefix,
    )

    rng = np.random.default_rng(5)
    n = 4000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    v = rng.normal(1000.0, 3.0, n)  # large offset stresses cancellation
    v[500:700] = np.nan  # a long null gap
    v[::97] = np.nan  # scattered nulls
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf)
    for w in (48, 960):
        a = (
            rolling_mean_std(df, "value", w, ma_col="ma", sd_col="sd")
            .orderBy("ts").select("ma", "sd").toPandas()
        )
        b = (
            rolling_mean_std_prefix(df, "value", w, ma_col="ma", sd_col="sd")
            .orderBy("ts").select("ma", "sd").toPandas()
        )
        assert a["ma"].isna().equals(b["ma"].isna()), f"minp mask differs at w={w}"
        np.testing.assert_allclose(a["ma"], b["ma"], rtol=1e-9, atol=1e-9, equal_nan=True)
        np.testing.assert_allclose(a["sd"], b["sd"], rtol=1e-7, atol=1e-9, equal_nan=True)


def test_robust_z_pandas_engine_matches_window(spark):
    """The applyInPandas robust-z engine must agree with the window
    engine to float identity (same exact medians) including null gaps
    and MAD==0 plateaus."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from wq_data_pipeline_spark.operators.detectors import with_robust_z

    rng = np.random.default_rng(9)
    n = 3000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    v = rng.normal(50.0, 4.0, n)
    v[400:600] = np.nan
    v[800:950] = 7.0  # constant plateau -> MAD == 0 -> NULL z
    v[::53] = np.nan
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf)
    a = (
        with_robust_z(df, "value", 96, out="z", engine="window")
        .orderBy("ts").select("z").toPandas()["z"]
    )
    b = (
        with_robust_z(df, "value", 96, out="z", engine="pandas")
        .orderBy("ts").select("z").toPandas()["z"]
    )
    assert a.isna().equals(b.isna())
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12, equal_nan=True)


def test_rolling_median_pandas_matches_window(spark):
    """The pandas skiplist median/std engine must match the
    percentile-over-frame computation to float identity."""
    import numpy as np
    import pandas as pd

    from wq_data_pipeline_spark.operators.sentem import (
        rolling_mean_std,
        rolling_median_std_pandas,
    )

    rng = np.random.default_rng(13)
    n = 3000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    v = rng.normal(20.0, 2.0, n)
    v[100:300] = np.nan
    v[::71] = np.nan
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf)
    for w in (12, 48):
        a = (
            rolling_mean_std(df, "value", w, stat="median", ma_col="ma", sd_col="sd")
            .orderBy("ts").select("ma", "sd").toPandas()
        )
        b = (
            rolling_median_std_pandas(df, "value", w, ma_col="ma", sd_col="sd")
            .orderBy("ts").select("ma", "sd").toPandas()
        )
        assert a["ma"].isna().equals(b["ma"].isna()), f"minp mask differs at w={w}"
        np.testing.assert_allclose(a["ma"], b["ma"], rtol=1e-12, atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(a["sd"], b["sd"], rtol=1e-12, atol=1e-12, equal_nan=True)


def _ref_fallback_masks(s: pd.Series, lo: float, hi: float) -> dict[str, pd.Series]:
    """Pandas reimplementation of the reference's COMPLETE no-SaQC
    fallback suite (apply_saqc_suite else-branch,
    scripts/ufz_water_qc_pipeline.py:566-577) at the reference's
    parameters converted at 15-min step: range, missing,
    constants/plateau('2h' flat-run interval mask incl. first row
    after the run, :392-407), variance('6h'=24pts, 1e-12, :409-413),
    zscore('24h'=96pts, 4.0, :415-422), jumps(5.0, :424-428),
    isolated('3h' gap, '30min'=2pts group, :430-453); unilof == the
    zscore mask (:455-457)."""
    masks = {}
    masks["range"] = ((s < lo) | (s > hi)).fillna(False)
    masks["missing"] = s.isna()
    # plateau/constants: flat runs >= 2h, mask start..end (end = first
    # row after the run)
    vals = s.to_numpy()
    eq = np.zeros(len(s), dtype=bool)
    eq[1:] = (
        np.isfinite(vals[1:]) & np.isfinite(vals[:-1])
        & (np.abs(vals[1:] - vals[:-1]) <= 0.0)
    )
    flat = np.zeros(len(s), dtype=bool)
    i = 0
    while i < len(eq):
        if eq[i]:
            j = i
            while j + 1 < len(eq) and eq[j + 1]:
                j += 1
            endi = j + 1 if j + 1 < len(s) else j
            hours = (s.index[endi] - s.index[i]).total_seconds() / 3600
            if hours >= 2.0:
                flat[i : endi + 1] = True
            i = j + 1
        else:
            i += 1
    masks["plateau"] = pd.Series(flat, index=s.index)
    k6, k24 = 24, 96
    masks["variance"] = (
        s.rolling(k6, min_periods=max(3, k6 // 3), center=True).var() <= 1e-12
    ).fillna(False)
    med = s.rolling(k24, min_periods=max(5, k24 // 3), center=True).median()
    mad = (s - med).abs().rolling(k24, min_periods=max(5, k24 // 3), center=True).median()
    z = 0.6745 * (s - med) / mad.replace(0, np.nan)
    masks["zscore"] = (z.abs() >= 4.0).fillna(False)
    masks["jumps"] = (s.diff().abs() >= 5.0).fillna(False)
    # isolated: finite row-groups <= 2 points with > 3h index gap on
    # BOTH sides
    finite = np.isfinite(vals)
    t = s.index.view("int64")
    big_gap = np.concatenate(([False], np.diff(t) > int(3 * 3600 * 1e9)))
    iso = np.zeros(len(s), dtype=bool)
    i = 0
    while i < len(finite):
        if finite[i]:
            j = i
            while j + 1 < len(finite) and finite[j + 1]:
                j += 1
            left_big = i > 0 and big_gap[i]
            right_big = (j + 1 < len(big_gap)) and big_gap[j + 1]
            if (j - i + 1) <= 2 and left_big and right_big:
                iso[i : j + 1] = True
            i = j + 1
        else:
            i += 1
    masks["isolated"] = pd.Series(iso, index=s.index)
    return masks


def test_full_suite_flag_stage_matches_pandas_reference(spark):
    """flag_stage(full_suite=True) must reproduce the reference's
    complete 9-detector fallback OR (0/255 codes) row-for-row on a
    fixture that exercises every detector.

    The gap-null threshold is raised to 6h: under the default 2h any
    index gap large enough for the isolated detector (>3h) has already
    nulled the group's first row, so isolated can never fire — true of
    the reference's own composition (gap-null at :673-675 precedes
    apply_saqc_suite at :687) and verified here by using 4h gaps that
    null nothing at the 6h setting."""
    from wq_data_pipeline_spark.plans.qc_pipeline import (
        QCConfig,
        clean_stage,
        flag_stage,
    )

    rng = np.random.default_rng(77)
    n = 2000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    v = rng.normal(12, 2, n)
    v[300:340] = 3.3       # flat run -> plateau/constants + variance
    v[800] = 50.0          # spike -> zscore + jumps + range(hi=40)
    # ONE -99.0 hit: 1 < 5 hits AND 1/1938 = 0.05% < 0.1%, so the
    # sentinel stays INACTIVE and the value survives cleaning to
    # exercise range-low (two hits would be 0.103% — active, masked
    # to NaN, and the lo comparison would have no coverage)
    v[150] = -99.0
    # isolated: the reference's RLE runs over ROW order, so the group
    # needs NaN-valued neighbor rows that sit >3h away in time — NaN
    # sentinels at 1184/1217 with 4h of rows carved between them and
    # the finite 2-point group (1200, 1201); 4h < the 6h gap-null so
    # the group itself survives cleaning
    v[1184] = np.nan
    v[1217] = np.nan
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    drop = (
        list(range(1185, 1200)) + list(range(1202, 1217))
        + list(range(1600, 1632))  # 8h gap -> gap-null -> missing
    )
    pdf = pdf.drop(index=drop).reset_index(drop=True)

    cfg = QCConfig(
        range_map={"x": (0.0, 40.0)}, full_suite=True, max_gap_seconds=6 * 3600.0
    )
    cleaned = clean_stage(spark.createDataFrame(pdf), cfg)
    got = (
        flag_stage(cleaned, cfg)
        .orderBy("ts")
        .select("ts", "saqc_flag")
        .toPandas()
    )

    # pandas clean at the 6h gap threshold (reference :673-675 with
    # max_gap='6h'); sentinel/dup handling as _pandas_reference_clean
    s = pdf.set_index("ts")["value"].astype(float)
    for sent in (-9.0, -99.0, -999.0, -9999.0):
        cnt = int((s == sent).sum())
        if cnt >= 5 or cnt / len(s) >= 0.001:
            s = s.mask(s == sent, np.nan)
    s = s.groupby(level=0).median()
    s[s.index.to_series().diff() > pd.Timedelta(hours=6)] = np.nan
    masks = _ref_fallback_masks(s, 0.0, 40.0)
    combined = np.zeros(len(s), dtype=bool)
    for m in masks.values():
        combined |= m.to_numpy()
    exp = np.where(combined, 255, 0)

    assert len(got) == len(exp)
    mismatch = got["saqc_flag"].to_numpy() != exp
    assert not mismatch.any(), (
        f"{mismatch.sum()} rows differ; first at "
        f"{got['ts'][mismatch.argmax()]}"
    )
    # every planted artefact must have fired its detector
    for name in ("range", "missing", "plateau", "variance", "zscore", "jumps", "isolated"):
        assert masks[name].any(), f"fixture never triggers {name}"
    # ...and range must fire on BOTH bounds (the -99 survivor covers lo)
    assert bool(masks["range"][s < 0.0].any()), "range-low never exercised"
    assert bool(masks["range"][s > 40.0].any()), "range-high never exercised"


def _ref_quant_step(x, atol=1e-3):
    """Direct reimplementation of reference quant_step_estimate
    (scripts/ufz_water_qc_pipeline.py:129-142)."""
    v = pd.Series(np.asarray(x, dtype=float))
    d = v.diff().dropna().abs()
    d = d[(d > 0) & np.isfinite(d)]
    if d.empty:
        return np.nan
    q = np.quantile(d, [0.1, 0.25, 0.5, 0.75, 0.9])
    cand = [q[0], q[1], q[2]] + [q[2] / i for i in range(2, 10)]
    cand = [c for c in cand if c > 0]
    best = np.nan
    besth = 0
    for c in cand:
        h = np.mean(np.isclose((d / c) - np.round(d / c), 0, atol=atol))
        if h > besth:
            besth = h
            best = c
    return best if besth > 0.7 else np.nan


def test_quant_step_matches_reference(spark):
    """quant_step_estimate must reproduce the reference's full
    candidate set (q10/q25/q50 + q50 sub-multiples) and first-best
    tie rule on three regimes: clean quantization, coarse jumps where
    only a q50/i sub-multiple recovers the fine step, and
    unquantized noise (rejected)."""
    from wq_data_pipeline_spark.operators.stats import quant_step_estimate

    rng = np.random.default_rng(3)
    ts = pd.date_range("2024-01-01", periods=800, freq="15min")
    series = {
        # random walk on a strict 0.05 grid with 1-3 quantum steps ->
        # q10 of the |diff| distribution IS the quantum
        "grid": np.cumsum(rng.integers(1, 4, 800)) * 0.05,
        # coarse: most jumps are 2-4 quanta of 0.02 -> the median diff
        # overshoots the true step; a q50/i candidate must recover it
        "coarse": np.cumsum(rng.integers(2, 5, 800)) * 0.02,
        # white noise: no quantization, score must stay <= 0.7 -> NULL
        "noise": rng.normal(10, 1, 800),
    }
    frames = [
        pd.DataFrame({"station": "s", "variable": name, "ts": ts, "value": v})
        for name, v in series.items()
    ]
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    got = {
        r.variable: (r.quant_step, r.quant_score)
        for r in quant_step_estimate(df).collect()
    }
    for name, v in series.items():
        expected = _ref_quant_step(v)
        step = got[name][0]
        if np.isnan(expected):
            assert step is None, f"{name}: expected rejection, got {step}"
        else:
            assert step == pytest.approx(expected, rel=1e-9), (
                f"{name}: {step} != reference {expected}"
            )
    assert got["noise"][0] is None
    assert got["grid"][0] is not None and got["coarse"][0] is not None


def _ref_binary_switches(v, idx, zero_tol=1e-12):
    """Direct reimplementation of reference detect_binary_switches +
    events_from_binary (scripts/ufz_water_qc_pipeline.py:192-205,
    642-649)."""
    v = np.asarray(v, dtype=float)
    z = np.isfinite(v) & (np.abs(v) <= zero_tol)
    events = []
    i = 0
    while i < len(z):
        if z[i]:
            j = i
            while j + 1 < len(z) and z[j + 1]:
                j += 1
            a, b = i, j
            pre, post = max(0, a - 1), min(len(v) - 1, b + 1)
            preval = v[pre] if np.isfinite(v[pre]) else np.nan
            postval = v[post] if np.isfinite(v[post]) else np.nan
            if (
                np.isfinite(preval)
                and np.isfinite(postval)
                and (preval != 0 or postval != 0)
            ):
                events.append(
                    (idx[a], idx[b], idx[pre], idx[post], preval, postval)
                )
            i = j + 1
        else:
            i += 1
    return events


def test_binary_switches_match_reference(spark):
    """W4 events vs the reference row-for-row, covering the edge
    conventions: run at the series start (clamped pre = own endpoint),
    run at the end, NaN neighbor suppression, and an all-zero
    neighborhood (no event: pre==post==0)."""
    from wq_data_pipeline_spark.operators.detectors import detect_binary_switches

    n = 300
    ts = pd.date_range("2024-02-01", periods=n, freq="15min")
    v = np.full(n, 3.7)
    v[:4] = 0.0            # run at series start -> pre clamps to v[0]=0
    v[50:55] = 0.0         # interior run, nonzero neighbors
    v[100:103] = 0.0
    v[99] = np.nan         # NaN pre-neighbor -> suppressed
    v[200:204] = 0.0
    v[204] = np.nan        # NaN post-neighbor -> suppressed
    v[n - 3:] = 0.0        # run at series end -> post clamps to v[-1]=0
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    got = (
        detect_binary_switches(spark.createDataFrame(pdf))
        .orderBy("start")
        .collect()
    )
    exp = _ref_binary_switches(v, ts)
    assert len(got) == len(exp), (len(got), len(exp))
    for g, e in zip(got, exp):
        assert pd.Timestamp(g.start) == e[0] and pd.Timestamp(g.end) == e[1]
        assert pd.Timestamp(g.pre) == e[2] and pd.Timestamp(g.post) == e[3]
        assert g.pre_val == pytest.approx(e[4]) and g.post_val == pytest.approx(e[5])


def _ref_flat_slopes(v, idx, min_hours=2.0, win=25, abs_slope=0.0):
    """Direct reimplementation of reference detect_flat_slopes over
    rolling_lin_slope (scripts/ufz_water_qc_pipeline.py:105-123,
    223-236)."""
    v = np.asarray(v, dtype=float)
    t = (idx.view("int64").astype(float) - idx.view("int64").astype(float).min()) / 1e9
    n = v.size
    minp = max(5, win // 3)
    h = win // 2
    slope = np.full(n, np.nan)
    for i in range(n):
        a, b = max(0, i - h), min(n, i + h + 1)
        seg, ts_seg = v[a:b], t[a:b]
        m = np.isfinite(seg)
        if m.sum() >= minp:
            X = np.vstack([ts_seg[m], np.ones(m.sum())]).T
            slope[i] = np.linalg.lstsq(X, seg[m], rcond=None)[0][0]
    eq = np.isfinite(slope) & (np.abs(slope) <= abs_slope)
    runs = []
    i = 0
    while i < n:
        if eq[i]:
            j = i
            while j + 1 < n and eq[j + 1]:
                j += 1
            endi = j + 1 if j + 1 < n else j
            hours = (idx[endi] - idx[i]).total_seconds() / 3600
            if hours >= min_hours:
                runs.append((idx[i], idx[endi], hours))
            i = j + 1
        else:
            i += 1
    return runs


def test_flat_slopes_match_reference(spark):
    """W6 events row-for-row vs the reference numpy reimplementation:
    constant plateaus (slope ~1e-17, far inside the 1e-10 threshold)
    between clearly-sloped ramps (~1e-3 s^-1, far outside) — slopes
    from the closed-form window algebra and numpy lstsq agree on
    which rows are flat, and the run boundaries use the
    first-row-after-run end convention."""
    from wq_data_pipeline_spark.operators.detectors import detect_flat_slopes

    n = 600
    ts = pd.date_range("2024-03-01", periods=n, freq="15min")
    v = np.linspace(0.0, 600.0, n).copy()  # ramp: slope ~1.1e-3 / s
    v[100:150] = v[100]   # 12.25h plateau
    v[300:330] = v[300]   # 7h plateau
    v[400:408] = v[400]   # short plateau: slope window still sees ramp
    v[120] = np.nan       # a null inside a plateau
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    got = (
        detect_flat_slopes(
            spark.createDataFrame(pdf), "value", KEYS, "ts",
            window_points=25, abs_slope=1e-10, min_hours=2.0,
        )
        .orderBy("start")
        .collect()
    )
    exp = _ref_flat_slopes(v, ts, min_hours=2.0, win=25, abs_slope=1e-10)
    assert len(got) == len(exp) > 0, (len(got), len(exp))
    for g, e in zip(got, exp):
        assert pd.Timestamp(g.start) == e[0] and pd.Timestamp(g.end) == e[1]
        assert abs(g.hours - e[2]) < 1e-9


def test_seasonal_stats_match_reference_on_irregular_cadence(spark):
    """A7 coverage vs the reference's INTEGER expected-point rule
    (expected = max(1, round(span/step + 1)),
    scripts/ufz_water_qc_pipeline.py:265-275): on an irregular cadence
    the rounded denominator differs from the continuous span/step + 1
    the pre-r4 engine used — this pins the reference semantics."""
    from wq_data_pipeline_spark.operators.stats import seasonal_stats

    rng = np.random.default_rng(17)
    # irregular: 15-min base grid with jitter and dropped rows, spanning DJF+MAM
    base = pd.date_range("2024-01-10", periods=4000, freq="15min")
    keep = rng.random(4000) > 0.3
    ts = base[keep] + pd.to_timedelta(rng.integers(0, 300, keep.sum()), unit="s")
    v = rng.normal(5, 1, len(ts))
    v[::17] = np.nan
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    got = {
        r.season: r
        for r in seasonal_stats(
            spark.createDataFrame(pdf), KEYS, "ts", "value", step_seconds=900.0
        ).collect()
    }

    step = pd.Timedelta(seconds=900)
    df = pdf.set_index("ts")
    season_of = lambda t: {12: "DJF", 1: "DJF", 2: "DJF", 3: "MAM", 4: "MAM",
                           5: "MAM", 6: "JJA", 7: "JJA", 8: "JJA"}.get(t.month, "SON")
    df["season"] = [season_of(t) for t in df.index]
    for s in sorted(set(df["season"])):
        sub = df[df["season"] == s]
        dur = (sub.index[-1] - sub.index[0]).total_seconds() + step.total_seconds()
        exp_pts = max(1, int(round(dur / step.total_seconds())))
        n, nnan = len(sub), int(sub["value"].isna().sum())
        cov = 100.0 * (n - nnan) / max(1, exp_pts)
        assert got[s].coverage_pct == pytest.approx(round(cov, 4), abs=1e-9), s
        assert got[s].nan_pct == pytest.approx(round(100.0 * nnan / n, 4), abs=1e-9), s


def test_decimal_stats_match_reference(spark):
    """A4 (fractional-part histogram + chi-square) and A5 (dominant
    2-decimal mode) vs direct reference reimplementations
    (scripts/ufz_water_qc_pipeline.py:125-127, 239-258), including
    NEGATIVE values where dec_frac's modf%1.0 wraps to [0,1). NaN
    inputs are excluded up front on both sides: the reference's A5
    rounds NaN then casts to int (platform-dependent garbage values) —
    a sanitized divergence, documented here."""
    from wq_data_pipeline_spark.operators.stats import (
        chi_square_uniform,
        decimal_histogram,
        dominant_decimals,
    )

    rng = np.random.default_rng(23)
    n = 2000
    ts = pd.date_range("2024-01-01", periods=n, freq="15min")
    # two-decimal grid with a planted dominant .25 fraction + negatives
    v = np.round(rng.normal(0, 30, n), 2)
    v[: n // 2] = np.floor(v[: n // 2]) + 0.25  # 50% share of .25
    pdf = pd.DataFrame({"station": "s", "variable": "x", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf)

    # reference dec_frac + histogram + chisq fallback
    f = np.modf(v)[0] % 1.0
    h, _ = np.histogram(f, bins=np.linspace(0, 1, 11))
    e = np.full_like(h, h.mean(), dtype=float)
    ref_cs = float(np.sum((h - e) ** 2 / (e + 1e-9)))

    got_bins = {
        r.bin: r.bin_count for r in decimal_histogram(df, KEYS, "value").collect()
    }
    for b in range(10):
        assert got_bins.get(b, 0) == int(h[b]), (b, got_bins.get(b, 0), h[b])
    cs = chi_square_uniform([got_bins.get(b, 0) for b in range(10)])
    assert cs == pytest.approx(ref_cs, rel=1e-6)

    # reference find_long_unique_double_decimals
    fc = np.round(f * 100).astype(int)
    vals, cts = np.unique(fc, return_counts=True)
    j = int(np.argmax(cts))
    ref_dom, ref_frac = int(vals[j]), float(cts[j] / fc.size)

    got = dominant_decimals(df, KEYS, "value").collect()[0]
    assert got.mode_cents == ref_dom
    assert got.mode_frac == pytest.approx(round(ref_frac, 4), abs=1e-9)
    assert bool(got.dominant) == (ref_frac >= 0.6)
