"""Stage-by-stage profile of the benched ops queries (round 13 opt).

Times each prefix of the operator pipeline with the noop sink under the
bench session config, so the increments attribute wall time to pipeline
stages (guide section 1: measure first, isolate with noop).
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
    .appName("xhs-profile-ops")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark.operators import dedup as dd
from xarray_histogram_spark.operators import similarity as sim
from xarray_histogram_spark.operators import text as tx
from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, df, n=5, warm=1):
    for _ in range(warm):
        run(df)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(df)
        times.append(time.perf_counter() - t0)
    print(f"{name:55s} min {min(times)*1e3:7.1f} ms  med {sorted(times)[n//2]*1e3:7.1f} ms", flush=True)
    return min(times)


docs = eq.t_wide(spark, SF_DIR, "documents")
print("documents rows:", docs.count(), "partitions:", docs.rdd.getNumPartitions())

plain = eq.t(spark, SF_DIR, "documents")
print("plain partitions:", plain.rdd.getNumPartitions())

spark.sparkContext.setJobDescription("minhash breakdown")
t("minhash: scan only (plain)", plain)
t("minhash: scan+repartition (t_wide)", docs)
sigs = dd.minhash_signatures(docs, "text", "doc_id")
t("minhash: signatures", sigs)
b = dd.band_rows(docs, "text", "doc_id")
t("minhash: band rows", b)
buckets = (
    b.groupBy("bi", "bk")
    .agg(F.sort_array(F.collect_list(F.col("doc_id"))).alias("ids"))
    .where(F.size("ids") > 1)
)
t("minhash: buckets (groupBy collect_list)", buckets)
full = dd.lsh_candidate_pairs(docs, "text", "doc_id")
t("minhash: full candidate pairs", full)

print()
spark.sparkContext.setJobDescription("simhash breakdown")
t("simhash: full", dd.simhash(docs, "text", "doc_id"))

print()
spark.sparkContext.setJobDescription("ann breakdown")
emb = eq.t(spark, SF_DIR, "embeddings")
print("embeddings rows:", emb.count(), "partitions:", emb.rdd.getNumPartitions())
t("ann_topk: full", sim.ann_topk(emb, query_id=0))
t("ann_batch: full", sim.ann_topk_batch(emb, [0, 7, 13], k=5))

print()
spark.sparkContext.setJobDescription("text_quality breakdown")
t("text_quality: full", tx.quality_score(eq.t_wide(spark, SF_DIR, "documents"), "text", "doc_id"))
