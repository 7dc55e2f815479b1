"""S7 figure sinks: the reference emits a per-variable PNG set
(scripts/ufz_water_qc_pipeline.py:706-728) and the sentemqc combined
plot (scripts/sentemqc.py:117-142). This package renders the same
figure set from the engine's aggregate DataFrames.

Scale design: figures are rendered DRIVER-SIDE from already-small
frames — every series is downsampled on the cluster (time-bucket
aggregation bounded by the pixel width) before collect, so the bytes
crossing the driver boundary are O(pixels), never O(rows).

Backend: matplotlib when importable (PNG, like the reference);
otherwise a dependency-free deterministic SVG writer (this container
has no matplotlib). Same figure content either way.
"""

from wq_data_pipeline_spark.report.figures import (  # noqa: F401
    render_qc_figures,
    render_sentemqc_figure,
)
