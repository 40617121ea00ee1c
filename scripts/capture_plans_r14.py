"""Capture .explain("formatted") for registry entries into plans/r14/.

Usage: python scripts/capture_plans_r14.py <suffix> [name1,name2,...]
With no name list, captures the full benched set (9 headline + 11 ops
bench queries + 3 baseline mirrors); with a name list, captures exactly
those registry entries.  Runs under the bench's own session config (AQE
off, 8 shuffle partitions) so the captured plan is the executed shape.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from xarray_histogram_spark import entry_queries as eq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

BENCHED = [
    "hist_regular_1d", "hist_2d", "hist_grouped", "hist_group_month",
    "hist_weighted", "hist_density", "hist_3d_grouped", "stat_median",
    "stat_mean",
    "dedup_minhash_pairs", "dedup_simhash", "sim_ann_topk", "sim_ann_batch",
    "text_quality",
    "sim_ivf_topk", "sim_ann_indexed", "dedup_incremental",
    "dedup_embed_extend_loop", "pipeline_curate_narrow", "text_fingerprint",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("xhs-plan-capture")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = eq.registry()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(outdir, exist_ok=True)

    names = sorted(ONLY) if ONLY is not None else list(BENCHED)
    plans = {}
    for name in names:
        if name in registry:
            plans[name] = registry[name][0](spark, SF_DIR)

    if ONLY is None:
        # the three baseline mirrors (bench.py's synthetic workloads)
        from xarray_histogram_spark import (
            Regular, histogram, histogram2d, histogram_columns,
        )

        spec = Regular(100, -3.0, 3.0)
        flat_in = spark.range(10_000_000, numPartitions=24).select(
            F.randn(1).cast("float").alias("x"))
        two_in = spark.range(10_000_000, numPartitions=24).select(
            F.randn(2).cast("float").alias("x"),
            F.randn(3).cast("float").alias("y"))
        along_in = spark.range(10_000_000, numPartitions=10).select(
            F.randn(4).cast("float").alias("x0"),
            F.randn(5).cast("float").alias("x1"),
            F.randn(6).cast("float").alias("x2"))
        plans["baseline_flat_1d_1e7"] = histogram(flat_in, "x", spec).df
        plans["baseline_two_var_1e7"] = histogram2d(
            two_in, "x", "y", [spec, spec]).df
        plans["baseline_along_dim_3x1e7"] = histogram_columns(
            along_in, ["x0", "x1", "x2"], spec, dim_name="d").df

    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{SUFFIX}.txt")


if __name__ == "__main__":
    main()
