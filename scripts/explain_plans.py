"""Regenerate PLANS.md: formatted physical plans of headline operators with
scale commentary, plus mechanical checks that each plan has the shape the
commentary claims (partial+final HashAggregate, broadcast spine join, no
Python eval in histogram data paths).

Run:  python scripts/explain_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from xarray_histogram_spark import entry_queries as eq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
MAX_LINES = 70

# query -> (claims to grep for, commentary)
SELECTION: dict[str, tuple[list[str], str]] = {
    "hist_regular_1d": (
        ["partial_count", "HashAggregate", "BroadcastExchange",
         "PushedFilters: \\[IsNotNull", "BroadcastHashJoin LeftOuter"],
        "The whole histogram dataflow: the parquet scan reads ONLY the "
        "bucketized column (`ReadSchema`) and the keep filter is a plain "
        "range predicate on the RAW value, so it pushes into the scan "
        "(`PushedFilters`) and the bucketize CASE is evaluated once per row; "
        "bucketize is codegen'd floor arithmetic projected right after the "
        "scan, partial HashAggregate combines map-side (the analog of the "
        "reference's per-chunk boost fill), one shuffle on the bin id (tiny: "
        "≤ n_bins × partitions rows), final HashAggregate. Dense zero-fill "
        "is the literal bin spine (`Generate inline(...)`) LEFT "
        "BroadcastHashJoin-ed to the aggregate + `coalesce(0)` — O(1) per "
        "bin, no second scan. At 100 TB only the scan grows; everything "
        "after the first exchange is bin-bounded.",
    ),
    "hist_weighted_grouped_density": (
        ["HashAggregate", "Window"],
        "Grouped weighted density: same scan→partial→shuffle→final shape with "
        "(group, bin) keys; the density normalization is a Window over the "
        "already-aggregated (tiny) result — the expensive data pass is still "
        "exactly one.",
    ),
    "hist_3d_grouped": (
        ["HashAggregate"],
        "3-variable histogram: bucketize compiles three Column expressions in "
        "one projection; grouping keys are (group, bin_x, bin_y, bin_z). "
        "Output cardinality = groups × extents product — the dense spine is "
        "built from the aggregated side, never by re-scanning raw data.",
    ),
    "stat_median_2d": (
        ["Window"],
        "Distribution statistic over histogram state: int64 cumulative sums "
        "(deterministic under any partitioning) via Window partitioned by "
        "(group keys, other-variable bins), then piecewise-linear "
        "interpolation. Runs on aggregated data only — cost independent of "
        "raw row count.",
    ),
    "dedup_minhash_pairs": (
        ["HashAggregate", "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "MinHash+LSH near-dedup: signatures are a single-pass per-row "
        "aggregate (no shingle explode shuffle); candidate pairs come from a "
        "self-join on LSH band keys only — uniform hash keys, so the join is "
        "skew-resistant and touches collision buckets, not the corpus "
        "cross-product.",
    ),
    "sim_ann_topk": (
        ["BroadcastHashJoin"],
        "Multiprobe LSH ANN: the query's probe bucket ids are enumerated and "
        "broadcast; the corpus side is equi-joined on its bucket id. At scale "
        "(corpus bucketed/partitioned by bucket id) a lookup reads a fixed "
        "number of buckets — never a scan.",
    ),
    "sim_ivf_topk": (
        ["array_max", "BroadcastHashJoin"],
        "IVF ANN: coarse assignment is a ZERO-SHUFFLE per-row fold-argmin "
        "(`array_max` over literal centroid structs — no crossJoin, no "
        "corpus-wide `row_number` window sort); the probe is a broadcast "
        "hash join on the nprobe nearest inverted lists.",
    ),
    "events_session_hist": (
        ["HashAggregate", "collect_list"],
        "Session-window histogram (batch twin of the streaming merge-agg): "
        "ONE stateful aggregation keyed by (session_window, group) collects "
        "the session's bin ids; the dense per-bin counts are a stateless "
        "generate/project after it — the shape that keeps streaming append "
        "mode legal (single stateful operator).  Never key the session "
        "window by the bin id: that would sessionize each bin "
        "independently.",
    ),
    "streaming_window_hist": (
        [],
        "(Batch twin of the streaming plan — the streaming run executes the "
        "same operators behind a StateStore.) Watermarked windowed groupBy: "
        "state is (window, group, bin) → count, bounded by the watermark "
        "horizon; the spine join for labels is stream-static broadcast.",
    ),
}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("xhs-plans")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = eq.registry()

    out = [
        "# PLANS — physical plans of the headline operators",
        "",
        f"Generated by `scripts/explain_plans.py` against `{SF_DIR}` "
        "(re-run it after plan-affecting changes; it greps each plan for the "
        "operators the commentary claims and fails loudly if they are gone).",
        "",
        "What to look for throughout: `WholeStageCodegen` spans covering the "
        "bucketize projections (no `BatchEvalPython`/`ArrowEvalPython` in any "
        "histogram data path), partial+final `HashAggregate` pairs around a "
        "single exchange, every spine/probe join on a `BroadcastExchange` "
        "(ungrouped dense fill = spine LEFT BroadcastHashJoin aggregate; "
        "grouped = per-group packed map broadcast-crossed with the spine), "
        "and parquet `ReadSchema` pruned to the referenced columns plus "
        "`PushedFilters` carrying the raw-value keep range.",
        "",
    ]

    import re

    failures = []
    for name, (claims, commentary) in SELECTION.items():
        if name == "streaming_window_hist":
            # show the batch twin: the registry fn runs a real streaming query;
            # the plan of interest is the windowed agg itself
            from xarray_histogram_spark.streaming.histogram_stream import (
                streaming_histogram,
            )
            from xarray_histogram_spark.binspec import Regular
            from pyspark.sql import functions as F

            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            ev = (
                spark.read.parquet(f"{SF_DIR}/events.parquet")
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                .select("ts", "value")
            )
            df = streaming_histogram(
                ev, "value", Regular(10, 0.0, 500.0), "ts",
                window_duration="1 day",
            )
        else:
            df = registry[name][0](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        for claim in claims:
            if not re.search(claim, plan):
                failures.append(f"{name}: expected /{claim}/ in plan")
        if re.search(r"BatchEvalPython|ArrowEvalPython", plan):
            failures.append(f"{name}: Python eval in data path")
        lines = plan.rstrip().splitlines()
        if len(lines) > MAX_LINES:
            lines = lines[:MAX_LINES] + [f"... ({len(lines) - MAX_LINES} more lines)"]
        out += [
            f"## {name}",
            "",
            commentary,
            "",
            "```",
            *lines,
            "```",
            "",
        ]

    if failures:
        print("PLAN CHECK FAILURES:", *failures, sep="\n  ", file=sys.stderr)
        sys.exit(1)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"PLANS.md written ({len(SELECTION)} plans, all claims verified)")


if __name__ == "__main__":
    main()
