from wq_data_pipeline_spark.functions.scalars import (
    season_expr,
    frac_part,
    sanitize_name,
    doy_harmonics,
    isfinite,
)

__all__ = ["season_expr", "frac_part", "sanitize_name", "doy_harmonics", "isfinite"]
