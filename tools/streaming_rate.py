"""Stateful-streaming throughput anchor (VERDICT r11 #6): rows/s
through ``stateful.streaming_flat_runs`` at sf0.1, measured from the
engine's own progress metrics, plus the bounded-state check at that
volume.

Protocol: the sf0.1 events table (100k rows) becomes a file stream —
N_BATCHES sequential parquet files in event-time order, one file per
micro-batch (maxFilesPerTrigger=1, availableNow) — keyed
(event_type, user_id % N_VARS) so the state store carries a realistic
few-hundred-key population. Reported:

- rows/s = total input rows / wall across all micro-batches
  (construction included — the number a capacity plan needs);
- max stateOperators[].numRowsTotal across batches, asserted <= the
  key-population bound: flat-run state is ONE row per active key by
  construction, so state NEVER grows with input volume — that is the
  100x-scale claim for this path (contrast: a buffering operator
  would hold rows-in-window).

Usage: python tools/streaming_rate.py  [sf_dir] [n_batches]
Writes only to /tmp. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# runnable from any cwd: the repo root is this file's parent dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_vars = 50

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql import types as T

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("streaming-rate")
        .getOrCreate()
    )
    from wq_data_pipeline_spark.sources.testdata import load_table
    from wq_data_pipeline_spark.streaming.stateful import streaming_flat_runs

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("station"),
        F.pmod(F.col("user_id"), F.lit(n_vars)).cast("string").alias(
            "variable"
        ),
        "ts",
        "value",
    ).filter(F.col("ts").isNotNull())
    total = ev.count()
    n_keys = ev.select("station", "variable").distinct().count()

    tmp = tempfile.mkdtemp(prefix="stream_rate_", dir="/tmp")
    sdir = f"{tmp}/in"
    # event-time-ordered batch files: ntile over ts so every
    # micro-batch advances the clock like a live feed would
    from pyspark.sql import Window

    b = ev.withColumn(
        "_b", F.ntile(n_batches).over(Window.orderBy("ts", "station", "variable"))
    ).persist()  # one global sort, not one per batch file (r12 review)
    for i in range(1, n_batches + 1):
        (
            b.filter(F.col("_b") == i)
            .drop("_b")
            .coalesce(1)
            .write.mode("append")
            .parquet(sdir)
        )
    b.unpersist()

    schema = T.StructType(
        [
            T.StructField("station", T.StringType()),
            T.StructField("variable", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    t0 = time.perf_counter()
    q = (
        streaming_flat_runs(stream)
        .writeStream.format("memory")
        .queryName("rate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # applyInPandasWithState queries do NOT self-terminate under
    # availableNow (the drain_stateful lesson, tests/conftest.py):
    # poll the engine's progress until every input row is accounted
    # for, then stop — wall is measured at that detection, so it is
    # the processing time, not a timeout. Progress is ACCUMULATED by
    # batchId (r12 review): q.recentProgress is capped at the last
    # ~100 updates, so summing it directly would both under-count the
    # drain check past ~100 batches and silently truncate the
    # max-state scan.
    deadline = time.time() + 600
    wall = None
    seen: dict[int, dict] = {}
    while time.time() < deadline:
        for p in q.recentProgress:
            seen[p["batchId"]] = p
        if sum(p["numInputRows"] for p in seen.values()) >= total:
            wall = time.perf_counter() - t0
            break
        time.sleep(0.25)
    if wall is None:
        raise SystemExit("stream did not drain the input within 600 s")
    q.stop()
    q.awaitTermination(30)

    state_rows = [
        so["numRowsTotal"]
        for p in seen.values()
        for so in p.get("stateOperators", [])
    ]
    max_state = max(state_rows) if state_rows else 0
    out_rows = spark.table("rate_out").count()
    shutil.rmtree(tmp, ignore_errors=True)

    ok = max_state <= n_keys
    print(
        json.dumps(
            {
                "metric": "streaming_flat_runs_rate",
                "sf_dir": sf_dir,
                "input_rows": total,
                "n_batches": n_batches,
                "n_keys": n_keys,
                "wall_s": round(wall, 1),
                "rows_per_s": round(total / wall),
                "max_state_rows": max_state,
                "state_bounded_by_keys": ok,
                "run_events_emitted": out_rows,
            }
        )
    )
    if not ok:
        raise SystemExit(f"state grew past key population: {max_state} > {n_keys}")


if __name__ == "__main__":
    main()
