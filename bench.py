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

Drift-proofing (r8 protocol, VERDICT r7 #2): each query's recorded
number is the MEDIAN of three FULL construct+execute runs — the
DataFrame is REBUILT from scratch each run, so driver-side rounds,
localCheckpoint materializations, and plan analysis are counted every
time (the r7 median-of-{construct+exec, exec, exec} reduced to the
warm exec tail and hid a 3-4x construction regression). The three
runs are collected PASS-MAJOR (three sweeps over the whole catalog,
middle sweep in reverse order), not back-to-back per query: the r8
cross-run comparison caught a multi-minute machine stall sitting on
an alphabetically contiguous window of entries, and back-to-back runs
would have fed all three samples of those queries into the same stall
— interleaving makes the median actually reject it. Old references
from a completed run are dropped and gc'd before the next one so
Spark's ContextCleaner can free its checkpoint blocks instead of
letting them pressure later queries' storage memory.

The full per-query JSON is ALSO written to $SPARK_GRAFT_BENCH_OUT
(default BENCH_LOCAL.json next to this file): the driver's recorded
BENCH_rN.json has arrived tail-truncated two rounds running, and the
in-repo copy is the durable record (VERDICT r7 what's-wrong #5).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
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

    order = sorted(queries)
    runs: dict[str, list[float]] = {name: [] for name in order}
    for sweep in range(3):
        seq = list(reversed(order)) if sweep == 1 else order
        for name in seq:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
            # drop the run's plan/checkpoint references before the
            # next rebuild so ContextCleaner can reclaim its blocks
            del df
            gc.collect()
    timings = {name: round(sorted(rs)[1], 3) for name, rs in runs.items()}

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": "median-of-3 full construct+execute runs, pass-major interleaved",
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(here, "BENCH_LOCAL.json")
    )
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # stdout line below is still the contract
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
