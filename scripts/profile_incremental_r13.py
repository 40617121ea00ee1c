"""Stage-by-stage profile of incremental_dedup (round-13 opt).

dedup_incremental / dedup_extend_loop are among the slowest registry
entries; this isolates which of the pipeline's subtrees pays the bill:
the shard's band_rows, the kept-index probe join, the shingle-set
verification joins, or the shard's own jaccard_pairs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-incr")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark.operators import dedup as dd
from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, df, n=4, warm=1):
    for _ in range(warm):
        run(df)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(df)
        ts.append(time.perf_counter() - t0)
    print(f"{name:48s} min {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


docs = eq.t_wide(spark, SF_DIR, "documents")
new_df = docs.where(F.col("doc_id") % 5 == 2)
kept_df = docs.where(F.col("doc_id") % 5 != 2)

spark.sparkContext.setJobDescription("incremental breakdown")
t("shard scan only", new_df)
nb = dd.band_rows(new_df, "text", "doc_id")
t("band_rows(shard)", nb)
kb = dd.band_rows(kept_df, "text", "doc_id")
t("band_rows(kept)", kb)
cand = (
    kb.withColumnRenamed("doc_id", "kept_id")
    .join(F.broadcast(nb.withColumnRenamed("doc_id", "new_id")), ["bi", "bk"])
    .select("new_id", "kept_id")
    .distinct()
)
t("cand = kept-band join + distinct", cand)
full = dd.incremental_dedup(new_df, kept_df, "text", "doc_id")
t("incremental_dedup FULL", full)
nn = dd.jaccard_pairs(new_df, "text", "doc_id")
t("jaccard_pairs(shard) alone", nn)

# the registry entry's exact frame
entry = eq.registry()["dedup_incremental"][0](spark, SF_DIR)
t("registry dedup_incremental", entry)
print("rows:", entry.count())
