"""Report-table exporters matching the reference's golden CSV/parquet
contract byte-for-byte on headers and column naming.

Golden files (committed in the reference repo, read by
tests/test_golden_contract.py):

- ``{var}__events.csv``          header ``type,start,end,pre,post,pre_val,post_val,hours``
  (scripts/water_qc_output/reports/tables/Erkenruh_Einruhr/SurfaceWaterpH_pH__events.csv;
  built by events_from_binary/events_from_runs,
  scripts/ufz_water_qc_pipeline.py:642-654 + pd.concat :733)
- ``{var}__seasonal_summary.csv`` header ``season,coverage_pct,nan_pct,flat_values_events,flat_slopes_events``
  (seasonal_stats, scripts/ufz_water_qc_pipeline.py:277-290)
- ``{station}__meta.csv``        header ``station,col,step,sentinel_used,duplicates,wrtds_ok``
  (meta dict, scripts/ufz_water_qc_pipeline.py:738)
- ``{station}__events_all.csv`` / ``{station}__seasonal_all.csv`` —
  the per-variable frames with a trailing ``col`` column
  (scripts/ufz_water_qc_pipeline.py:766-771)
- wide parquet columns ``{sanitize(var)}__{suffix}`` for the 7
  suffixes raw/clean/accepted/saqc_flag/sm_masked/sm_flagged/
  sm_flagreason plus ``timestamp``
  (scripts/ufz_water_qc_pipeline.py:739-744, sentemqc widening
  scripts/sentemqc.py:159-164).

These are thin SELECTs over the long-format pipeline outputs — the
engine computes everything in one lazy plan over (station, variable)
partitions; the reference's per-variable file layout is purely a sink
concern, applied here at export time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENTS_HEADER = ["type", "start", "end", "pre", "post", "pre_val", "post_val", "hours"]
SEASONAL_HEADER = [
    "season",
    "coverage_pct",
    "nan_pct",
    "flat_values_events",
    "flat_slopes_events",
]
META_HEADER = ["station", "col", "step", "sentinel_used", "duplicates", "wrtds_ok"]
WIDE_SUFFIXES = [
    "raw",
    "clean",
    "accepted",
    "saqc_flag",
    "sm_masked",
    "sm_flagged",
    "sm_flagreason",
]

# season file order fixed by the reference (SEASON_ORDER, :91-92)
_SEASON_ORDER = ["DJF", "MAM", "JJA", "SON"]


def _ordered_cols(df: DataFrame, header: list[str]) -> list:
    return [
        F.col(c) if c in df.columns else F.lit(None).alias(c) for c in header
    ]


def events_report(events: DataFrame, variable: str | None = None) -> DataFrame:
    """Golden ``__events.csv`` frame: union of the detector event
    tables with NaN-padded columns in the reference's header order
    (binary events carry pre/post, run events carry hours)."""
    d = events
    if variable is not None:
        d = d.filter(F.col("variable") == variable)
    return d.select(*_ordered_cols(d, EVENTS_HEADER)).orderBy("type", "start")


def events_all_report(events: DataFrame) -> DataFrame:
    """Golden ``__events_all.csv``: events + trailing ``col``."""
    d = events.withColumn("col", F.col("variable"))
    return d.select(*_ordered_cols(d, EVENTS_HEADER), "col").orderBy(
        "col", "type", "start"
    )


def _season_sorted(d: DataFrame):
    order = F.array_position(
        F.array(*[F.lit(s) for s in _SEASON_ORDER]), F.col("season")
    )
    return d.orderBy(order)


def _all_seasons(d: DataFrame, extra_keys: list[str]) -> DataFrame:
    """Left-join the stats onto the full DJF/MAM/JJA/SON grid per key
    combination, zero-filling absent seasons — the reference iterates
    season_order() and emits all four rows even for seasons with no
    data (seasonal_stats, scripts/ufz_water_qc_pipeline.py:283-290)."""
    spark = d.sparkSession
    seasons = spark.createDataFrame([(s,) for s in _SEASON_ORDER], "season STRING")
    grid = (
        d.select(*extra_keys).distinct().crossJoin(seasons)
        if extra_keys
        else seasons
    )
    joined = grid.join(d, on=[*extra_keys, "season"], how="left")
    numeric = [c for c in SEASONAL_HEADER if c != "season"]
    return joined.select(
        *extra_keys,
        "season",
        *[F.coalesce(F.col(c), F.lit(0.0 if "pct" in c else 0)).alias(c) for c in numeric],
    )


def seasonal_report(seasonal: DataFrame, variable: str | None = None) -> DataFrame:
    """Golden ``__seasonal_summary.csv`` frame — always all four
    DJF/MAM/JJA/SON rows in reference order, zero-filled where the
    season has no data."""
    d = seasonal
    if variable is not None:
        d = d.filter(F.col("variable") == variable)
    d = d.select(*_ordered_cols(d, SEASONAL_HEADER))
    return _season_sorted(_all_seasons(d, []))


def seasonal_all_report(seasonal: DataFrame) -> DataFrame:
    """Golden ``__seasonal_all.csv``: seasonal summary + trailing
    ``col``, variables concatenated, four season rows per variable."""
    d = seasonal.withColumn("col", F.col("variable"))
    d = d.select("col", *_ordered_cols(d, SEASONAL_HEADER))
    full = _all_seasons(d, ["col"])
    order = F.array_position(
        F.array(*[F.lit(s) for s in _SEASON_ORDER]), F.col("season")
    )
    return full.select(*SEASONAL_HEADER, "col").orderBy("col", order)


def _timedelta_str(seconds: F.Column) -> F.Column:
    """Format seconds as pandas' Timedelta repr ``D days HH:MM:SS``
    (what the reference's meta.csv stores for ``step``)."""
    s = seconds.cast("long")
    days = (s / 86400).cast("long")
    rem = s - days * 86400
    hh = F.lpad(((rem / 3600).cast("long")).cast("string"), 2, "0")
    mm = F.lpad((((rem % 3600) / 60).cast("long")).cast("string"), 2, "0")
    ss = F.lpad((rem % 60).cast("string"), 2, "0")
    return F.concat(
        days.cast("string"), F.lit(" days "), hh, F.lit(":"), mm, F.lit(":"), ss
    )


def meta_report(meta: DataFrame, wrtds_ok: bool = False) -> DataFrame:
    """Golden ``__meta.csv`` frame. ``col`` is the raw variable name,
    ``step`` the pandas-style Timedelta string, ``sentinel_used`` the
    active-sentinel list, ``wrtds_ok`` whether the WRTDS stage ran."""
    d = (
        meta.withColumn("col", F.col("variable"))
        .withColumn("step", _timedelta_str(F.col("step_seconds")))
        .withColumn(
            "sentinel_used", F.coalesce(F.col("sentinel_used"), F.lit("[]"))
        )
        .withColumn("duplicates", F.coalesce(F.col("duplicates"), F.lit(0)))
        .withColumn("wrtds_ok", F.lit(wrtds_ok))
    )
    return d.select(*_ordered_cols(d, META_HEADER)).orderBy("station", "col")


def wide_column_names(variables: list[str]) -> list[str]:
    """The golden wide-parquet data-column set for a variable list —
    35 columns for the reference's 5 variables."""
    from wq_data_pipeline_spark.functions.scalars import sanitize_name

    return [f"{sanitize_name(v)}__{suf}" for v in variables for suf in WIDE_SUFFIXES]
