"""Time EVERY registry entry at sf0.1 with the noop sink (round-13 audit).

Build each plan once (untimed — mirrors the bench methodology), then time
min-of-3 noop executions.  Ranks entries by execution time so the
optimization round attacks real hotspots rather than guesses.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-time-registry")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


results = {}
errors = {}
for name, (fn, _) in eq.registry().items():
    try:
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(name)
        run(df)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(df)
            ts.append(time.perf_counter() - t0)
        results[name] = (min(ts), build)
    except Exception as ex:  # noqa: BLE001
        errors[name] = str(ex)[:160]

for name, (t_exec, t_build) in sorted(results.items(), key=lambda kv: -kv[1][0]):
    print(f"{name:38s} exec {t_exec*1e3:8.1f} ms   build {t_build*1e3:8.1f} ms")
for name, err in errors.items():
    print(f"ERROR {name}: {err}")
print(f"\ntotal exec {sum(v[0] for v in results.values()):.2f} s over {len(results)} entries")
