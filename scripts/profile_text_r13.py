"""Time the text/curate-family registry entries at sf0.1 (round-13 A/B)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-text")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import entry_queries as eq

NAMES = [
    "text_fingerprint", "text_langid", "text_quality", "text_repetition",
    "text_gopher_rules", "pipeline_curate", "pipeline_curate_narrow",
    "pipeline_report", "dedup_keep_best",
]

def run(df):
    df.write.format("noop").mode("overwrite").save()

reg = eq.registry()
for name in NAMES:
    df = reg[name][0](spark, SF_DIR)
    spark.sparkContext.setJobDescription(name)
    run(df)  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run(df)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} min {min(ts)*1e3:8.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", flush=True)
