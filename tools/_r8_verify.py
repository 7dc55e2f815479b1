"""Round-8 verify: drive the driver contract exactly — foreign cwd,
vanilla session (driver-default 200 shuffle partitions), module loaded
by file path. Prints FAIL lines as they happen, rows-only counts, and
a final FAILS list (must be [])."""

import importlib.util
import sys
import time

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[32]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
E = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = E
spec.loader.exec_module(E)
rows = E.entry(spark).collect()
print("entry rows:", len(rows), flush=True)
sys.path.insert(0, "/root/repo/tests")
from oracle_utils import compare  # noqa: E402

q, o = E.queries(), E.oracle_sql()
fails, rowsonly = [], {}
t0 = time.time()
for n, fn in sorted(q.items()):
    df = fn(spark, "/root/testdata/sf0.01")
    if n in o:
        ok, msg = compare(df, o[n], "/root/testdata/sf0.01")
        if not ok:
            fails.append((n, msg))
            print("FAIL", n, msg, flush=True)
    else:
        rowsonly[n] = df.count()
print("elapsed", round(time.time() - t0, 1))
print("rows-only counts:", rowsonly)
print("FAILS:", fails)
