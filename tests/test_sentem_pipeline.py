"""EP3 standalone SentemQC runner vs an independent pandas
re-implementation of the reference flow (apply_sentemqc_to_series,
scripts/sentemqc.py:80-114) on a synthetic two-variable fixture."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixture_long(spark):
    rng = np.random.default_rng(3)
    n = 600
    ts = pd.date_range("2024-05-01", periods=n, freq="15min")
    o2 = rng.normal(9.0, 0.4, n)
    o2[100] = 39.0  # band spike -> flagged
    o2[200:204] = -1.0  # non-positive -> premask
    no3 = rng.normal(8.0, 0.5, n).clip(0.5)  # NO3 units
    no3[300] = 60.0  # spike
    frames = [
        pd.DataFrame({"station": "stn", "variable": "o2", "ts": ts, "value": o2}),
        pd.DataFrame({"station": "stn", "variable": "no3", "ts": ts, "value": no3}),
    ]
    return spark.createDataFrame(pd.concat(frames))


@pytest.fixture(scope="module")
def ep3_out(spark, fixture_long):
    from wq_data_pipeline_spark.plans.sentem_pipeline import (
        SentemVar,
        run_sentemqc_plan,
    )

    vm = [
        SentemVar("o2", code=400),
        SentemVar("no3", code=2477034, is_nitrate=True),
    ]
    return run_sentemqc_plan(fixture_long, vm).cache()


def test_premask_and_masking(ep3_out):
    o2 = ep3_out.filter("variable = 'o2'")
    # non-positive inputs premasked: obs_raw NULL, mask_pre True
    pre = o2.filter("mask_pre")
    assert pre.count() == 4
    assert pre.filter(F.col("obs_raw").isNotNull()).count() == 0
    # flagged rows masked out of value_masked
    assert o2.filter(F.col("is_flagged") & F.col("value_masked").isNotNull()).count() == 0


def test_spikes_flagged_with_reasons(ep3_out):
    o2 = ep3_out.filter("variable = 'o2'").orderBy("ts").collect()
    spike = o2[100]
    assert spike.is_flagged, "39.0 must breach the O2 bands (and the >=40 sensor rule is near)"
    assert "flag_run" in spike.flag_reason or "flag_sensor" in spike.flag_reason
    no3 = ep3_out.filter("variable = 'no3'").orderBy("ts").collect()
    assert no3[300].is_flagged


def test_nitrate_bands_back_in_no3_units(ep3_out):
    """Flags run on N-converted values but exported bands are NO3
    units (x62/14 back, scripts/sentemqc.py:110-111): bands must sit
    near the NO3-scale data, not 4.4x below it."""
    rows = (
        ep3_out.filter("variable = 'no3' AND qcband_top IS NOT NULL")
        .agg(
            F.avg("qcband_top").alias("t"),
            F.avg("obs_raw").alias("v"),
            F.avg("qcband_bottom").alias("b"),
        )
        .first()
    )
    assert rows.b < rows.v < rows.t
    assert rows.t > 8.0 * 0.8, f"band top {rows.t} looks N-scaled, not NO3-scaled"


def test_band_support_masks_sparse_regions(ep3_out):
    """Rows inside the premasked hole have < minp finite neighbors in
    the 5-point window -> bands NULL there (W15)."""
    o2 = ep3_out.filter("variable = 'o2'").orderBy("ts").collect()
    assert o2[201].qcband_top is None
    dense = [r for r in o2[400:500]]
    assert all(r.qcband_top is not None for r in dense)


def test_wide_export_naming(ep3_out):
    from wq_data_pipeline_spark.plans.sentem_pipeline import sentemqc_wide

    wide = sentemqc_wide(ep3_out)
    cols = set(wide.columns)
    for var in ("o2", "no3"):
        for suf in (
            "flag_global", "is_flagged", "flag_reason",
            "qcband_top", "qcband_bottom", "masked",
        ):
            assert f"{var}__{suf}" in cols, cols
    assert wide.count() == 600


def test_matches_pandas_reference_flow(spark, fixture_long, ep3_out):
    """Independent pandas replication of the reference's run-4 band
    pass (mean window 5) for the o2 series: the engine's flag_run4
    decisions must match row-for-row."""
    pdf = (
        fixture_long.filter("variable = 'o2'").orderBy("ts").toPandas().reset_index()
    )
    s = pdf["value"].astype(float)
    s = s.mask(~np.isfinite(s) | (s <= 0), np.nan)
    minp = max(3, math.ceil(5 * 0.3))
    ma = s.rolling(5, center=True, min_periods=minp).mean()
    sd = s.rolling(5, center=True, min_periods=minp).std(ddof=0)
    top = ma + 0.05 + 1.3 * sd
    bot = ma - 0.05 - 1.3 * sd
    hi, lo = s * 1.02, s * 0.98
    flagged = (((hi > top) & (lo > top)) | ((hi < bot) & (lo < bot))).fillna(False)
    eng = (
        ep3_out.filter("variable = 'o2'")
        .orderBy("ts")
        .select("flag_run4")
        .collect()
    )
    eng_flags = [r.flag_run4 == 200 for r in eng]
    mismatches = sum(1 for a, b in zip(flagged.tolist(), eng_flags) if a != b)
    assert mismatches == 0, f"{mismatches} run-4 flag mismatches vs pandas"


def test_ep3_figure_renders(ep3_out, tmp_path):
    """EP3 output feeds the sentemqc combined plot directly
    (reference run_sentemqc_on_dataframe plot_dir path)."""
    import os

    from wq_data_pipeline_spark.report import render_sentemqc_figure

    p = render_sentemqc_figure(
        ep3_out, str(tmp_path), "stn", "no3", value_col="obs_raw", max_points=200
    )
    assert os.path.exists(p) and os.path.getsize(p) > 500
