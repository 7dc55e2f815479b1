"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed from CONSTRUCTION through completion of a
collect-free noop sink (``df.write.format('noop')`` executes the full
plan without collecting rows to the driver, which is what a cluster
deployment would do). Construction is inside the timer because
iterative operators (connected components, k-means) run their
driver-side rounds eagerly at build time — excluding it (the r1/r2
protocol) under-reported exactly the queries most likely to regress.

Drift-proofing (r7 protocol): each query's recorded number is the
MEDIAN of three in-process executions — the first includes plan
construction, the next two re-execute the same DataFrame — so one
machine stall can no longer distort a trivial query's number (the r6
intermediate anchor charged 28 s of drift to a ~1 s query). The
total is the sum of the medians.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wq_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="wq-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # JVM/codegen warmup so the alphabetically-first query doesn't
    # absorb session start-up in its number: exercise the scan, a
    # shuffle + exact-median agg, a window, and the noop sink once
    from pyspark.sql import Window, functions as F

    from wq_data_pipeline_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    load_table(spark, sf_dir, "lineitem").count()
    (
        ev.groupBy("event_type")
        .agg(F.median("value").alias("m"), F.count(F.lit(1)).alias("n"))
        .withColumn("r", F.row_number().over(Window.orderBy("event_type")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in sorted(queries):
        runs: list[float] = []
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "protocol": "median-of-3, construction in run 1",
            }
        )
    )


if __name__ == "__main__":
    main()
