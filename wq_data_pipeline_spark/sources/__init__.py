from wq_data_pipeline_spark.sources.testdata import TABLES, load_table, load_tables, register_views
from wq_data_pipeline_spark.sources.csv_source import read_wide_csv, melt_wide

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "read_wide_csv", "melt_wide"]
