"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference water-quality QC pipeline
(WalterHet/wq_data_pipeline), re-expressed Spark-first.

Canonical data model: long-format readings
``(station string, variable string, ts timestamp, value double)``
(SURVEY.md §7.0). All operators are lazy DataFrame transformations;
per-series logic uses ``Window.partitionBy(station, variable)`` so one
plan serves any number of series and scales horizontally.
"""

__version__ = "0.1.0"
