"""Median-of-3 construct+execute timings for a subset of catalog
queries — same protocol as bench.py (noop sink, construction inside
the timer, pass-major interleaved), for quick before/after A/B during
the optimization round."""
import gc, json, os, sys, time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
from wq_data_pipeline_spark.session import get_spark

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="wq-mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()
    names = sys.argv[1:]
    # same warmups as bench.py
    from pyspark.sql import Window, functions as F
    from wq_data_pipeline_spark.sources.testdata import load_table
    ev = load_table(spark, sf_dir, "events")
    load_table(spark, sf_dir, "lineitem").count()
    (ev.groupBy("event_type").agg(F.median("value").alias("m"), F.count(F.lit(1)).alias("n"))
       .withColumn("r", F.row_number().over(Window.orderBy("event_type")))
       .write.format("noop").mode("overwrite").save())
    def _py_warm(batches):
        from wq_data_pipeline_spark.operators import multimodal  # noqa
        yield from batches
    spark.range(0, 64, 1, 32).mapInPandas(_py_warm, "id long").write.format("noop").mode("overwrite").save()

    runs = {n: [] for n in names}
    for sweep in range(3):
        seq = list(reversed(names)) if sweep == 1 else names
        for name in seq:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
            del df; gc.collect()
    med = {n: round(sorted(r)[1], 3) for n, r in runs.items()}
    print(json.dumps({"queries": med, "all": {n: [round(x,3) for x in r] for n, r in runs.items()}}))

if __name__ == "__main__":
    main()
