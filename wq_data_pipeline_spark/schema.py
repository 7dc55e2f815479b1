"""Explicit StructTypes for the engine's canonical tables.

The engine's spine is the long-format readings table (SURVEY.md §7.0):
one row per (station, variable, ts). Event/seasonal tables are derived
interval/aggregate outputs mirroring the reference's report tables
(reference: scripts/ufz_water_qc_pipeline.py:642-654, 277-290).
"""

from __future__ import annotations

from pyspark.sql import types as T

READINGS = T.StructType(
    [
        T.StructField("station", T.StringType()),
        T.StructField("variable", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# Interval events emitted by the run detectors (reference
# events_from_binary/events_from_runs, scripts/ufz_water_qc_pipeline.py:642-654).
EVENTS = T.StructType(
    [
        T.StructField("station", T.StringType()),
        T.StructField("variable", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("pre", T.TimestampType()),
        T.StructField("post", T.TimestampType()),
        T.StructField("pre_val", T.DoubleType()),
        T.StructField("post_val", T.DoubleType()),
        T.StructField("hours", T.DoubleType()),
    ]
)

SEASONAL = T.StructType(
    [
        T.StructField("station", T.StringType()),
        T.StructField("variable", T.StringType()),
        T.StructField("season", T.StringType()),
        T.StructField("coverage_pct", T.DoubleType()),
        T.StructField("nan_pct", T.DoubleType()),
        T.StructField("flat_values_events", T.LongType()),
        T.StructField("flat_slopes_events", T.LongType()),
    ]
)
