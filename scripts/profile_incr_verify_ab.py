"""Within-session A/B of incremental_dedup's verification stage (r13).

OLD shape: broadcast(cand ⋈ nsh) — every candidate PAIR row carries the
new doc's full shingle set — joined to ksh computed for EVERY kept row.
NEW shape (the round-13 rewrite): broadcast the bare id-pair list and the
per-DOC new sets; kept side ships (id, text) through the probe join and
folds its set once per candidate in a projection.
Both produce identical verified (new_id, kept_id) sets.
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
    .appName("xhs-ab-incr-verify")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark.operators import dedup as dd
from xarray_histogram_spark.functions import hashing as H
from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, make, n=4, warm=1):
    for _ in range(warm):
        run(make())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(make())
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} min {min(ts)*1e3:8.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.1f}", flush=True)


docs = eq.t_wide(spark, SF_DIR, "documents").select("doc_id", "text")
new_df = docs.where(F.col("doc_id") % 5 == 2)
kept_df = docs.where(F.col("doc_id") % 5 != 2)
k = 8
thr = F.lit(0.8)

nb = dd.band_rows(new_df, "text", "doc_id").withColumnRenamed("doc_id", "new_id")
kb = dd.band_rows(kept_df, "text", "doc_id").withColumnRenamed("doc_id", "kept_id")


def cand():
    return kb.join(F.broadcast(nb), ["bi", "bk"]).select("new_id", "kept_id").distinct()


shset = F.array_distinct(H.shingles(F.col("text"), k))


def nsh():
    return new_df.select(
        F.col("doc_id").alias("_nid"), shset.alias("_nset"),
        F.size(shset).alias("_nsz"),
    )


def verified_old():
    ksh = kept_df.select(
        F.col("doc_id").alias("_kid"), shset.alias("_kset"),
        F.size(shset).alias("_ksz"),
    )
    small = F.broadcast(cand().join(nsh(), F.col("new_id") == F.col("_nid")))
    joined = small.join(ksh, small["kept_id"] == ksh["_kid"])
    a_nn = F.filter(F.col("_nset"), lambda x: x.isNotNull())
    inter = F.size(F.array_intersect(a_nn, F.col("_kset")))
    return joined.where(
        F.arrays_overlap(a_nn, F.col("_kset"))
        & (inter.cast("double") / (F.col("_nsz") + F.col("_ksz") - inter).cast("double") >= thr)
    ).select("new_id", "kept_id")


def verified_new():
    ktext = kept_df.select(F.col("doc_id").alias("_kid"), F.col("text").alias("_ktxt"))
    candb = F.broadcast(cand())
    kset = F.array_distinct(H.shingles(F.col("_ktxt"), k))
    kverif = ktext.join(candb, F.col("kept_id") == F.col("_kid")).select(
        "new_id", "kept_id", kset.alias("_kset"), F.size(kset).alias("_ksz")
    )
    joined = kverif.join(F.broadcast(nsh()), F.col("new_id") == F.col("_nid"))
    a_nn = F.filter(F.col("_nset"), lambda x: x.isNotNull())
    inter = F.size(F.array_intersect(a_nn, F.col("_kset")))
    return joined.where(
        F.arrays_overlap(a_nn, F.col("_kset"))
        & (inter.cast("double") / (F.col("_nsz") + F.col("_ksz") - inter).cast("double") >= thr)
    ).select("new_id", "kept_id")


def kdup(v):
    return v.groupBy("new_id").agg(F.min("kept_id").alias("kept_match"))


for rnd in range(2):
    spark.sparkContext.setJobDescription("verify OLD")
    t(f"verify stage OLD (r{rnd})", lambda: kdup(verified_old()))
    spark.sparkContext.setJobDescription("verify NEW")
    t(f"verify stage NEW (r{rnd})", lambda: kdup(verified_new()))

a = sorted(map(tuple, kdup(verified_old()).collect()))
b = sorted(map(tuple, kdup(verified_new()).collect()))
print("values identical:", a == b, f"({len(a)} rows)")
