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
        ["partial_count", "HashAggregate", "Union",
         "PushedFilters: \\[IsNotNull"],
        "The whole histogram dataflow: the parquet scan reads ONLY the "
        "bucketized column (`ReadSchema`) and the keep filter is a plain "
        "range predicate on the RAW value, so it pushes into the scan "
        "(`PushedFilters`); because the filter guarantees in-range rows, the "
        "bucketize is the KEPT-fast form — bare `least(floor(...))` "
        "arithmetic with no NULL/NaN/flow CASE wrapper, codegen'd right "
        "after the scan. Unweighted histograms carry NO value column: the "
        "aggregate is COUNT(*) (partial count combines map-side — the "
        "analog of the reference's per-chunk boost fill) and the shuffle "
        "rows are the bare key, one shuffle on the bin id (tiny: ≤ n_bins "
        "× partitions rows), final HashAggregate. Dense zero-fill is BY "
        "CONSTRUCTION: a literal bin spine (`Generate "
        "explode(sequence(...))`) unions in BEFORE the aggregation — every "
        "bin receives exactly one spine row, corrected by the `count(1) - "
        "1` in the final projection — so the single partial+final "
        "aggregate emits every bin with no join, no broadcast of a "
        "computed aggregate, no second scan. Bin labels/widths/centers "
        "attach post-agg as literal-array lookups on the id. At 100 TB "
        "only the scan grows; everything after the first exchange is "
        "bin-bounded.",
    ),
    "hist_2d": (
        ["HashAggregate", "Union", "CASE WHEN"],
        "Multi-axis histogram: the two bin ids fuse into ONE flat bigint "
        "grouping key (Σ (id_i+1)·stride_i — injective) so the aggregate "
        "hashes/compares a single long and the shuffle rows stay one "
        "8-byte slot per extra axis narrower; per-axis ids are recovered "
        "post-agg by div/mod on ≤ extent rows. The Variable axis compiles "
        "to a codegen'd nested-CASE binary search (the `F.aggregate` edge "
        "fold runs in the higher-order-function interpreter — measured ~2× "
        "slower even for 3 edges).",
    ),
    "hist_weighted_grouped_density": (
        ["HashAggregate", "Window"],
        "Grouped weighted density: same scan→partial→shuffle→final shape with "
        "(group, bin) keys; the density normalization is a Window over the "
        "already-aggregated (tiny) result — the expensive data pass is still "
        "exactly one.",
    ),
    "hist_3d_grouped": (
        ["HashAggregate", "ObjectHashAggregate"],
        "3-variable grouped histogram: the three bucketize expressions fuse "
        "into one flat bigint key in a single projection; the first "
        "aggregate groups on (group, flat_id). The dense finish packs each "
        "group's sparse bins into a map (ObjectHashAggregate over "
        "collect_list) and expands it against the broadcast literal spine — "
        "ONE scan of the input, no self-join, output cardinality = groups × "
        "extents product.",
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
        ["ObjectHashAggregate", "Generate", "collect_list"],
        "MinHash+LSH near-dedup: signatures are a single-pass per-row fold "
        "(no shingle explode shuffle); candidate pairs come from ONE "
        "band-key shuffle — each LSH bucket's doc ids are collected "
        "(ObjectHashAggregate over collect_list, bucket populations are "
        "hash-ball-sized) and expanded in-bucket into sorted pairs by a "
        "codegen'd Generate. No self-join anywhere: the signature computes "
        "once, the shuffle carries one row per (band, doc), and the pair "
        "expansion touches collision buckets only, never the corpus "
        "cross-product.",
    ),
    "dedup_simhash": (
        ["aggregate\\(", "transform\\("],
        "SimHash (round-5 shape): a pure map stage — the 16 bit-counters "
        "fold per row over the token array (one `aggregate(transform(...))` "
        "higher-order expression, the same single-aggregate shape as the "
        "MinHash signature fold) and the sign fold packs the bits in the "
        "same projection. NO exchange of any kind in the plan; at 100 TB "
        "this is scan-bounded, embarrassingly parallel work.",
    ),
    "dedup_jaccard": (
        ["BroadcastHashJoin", "array_intersect", "array_distinct",
         "arrays_overlap"],
        "Exact Jaccard on LSH candidates (round-5 shape + round-9 filter "
        "fix): each document's shingle SET is a per-row `array_distinct` "
        "array with its size in the same row — no corpus-wide "
        "explode+distinct relation at all (the old shape evaluated that "
        "shuffle three times: sizes, side a, side b). The output-bounded "
        "candidate pairs broadcast; the two joins probe map-side and the "
        "intersection is a per-pair-row `array_intersect` computed ONCE — "
        "the empty-intersection drop is an early-exit `arrays_overlap` "
        "PRECHECK before the projection, because filtering on a projected "
        "`size(array_intersect)` alias re-inlines the intersect into the "
        "Filter node (PushPredicateThroughNonJoin substitutes aliases even "
        "across a materializing projection — measured 2× intersect/row, "
        "~7% whole-query). Exactly the TWO exchanges of candidate "
        "generation survive (band buckets, pair dedup) — verification adds "
        "zero.",
    ),
    "dedup_simhash_pairs": (
        ["Generate", "bit_count", "collect_list"],
        "SimHash near-dup pairs: 64-bit per-row signatures (zero shuffle), "
        "four 16-bit band keys (bucket ≈ N/65536 under uniform md5 bits — "
        "band width is what keeps the in-bucket m²/2 expansion linear-ish; "
        "complete for hamming ≤ 3 by pigeonhole), in-bucket ordered-pair "
        "expansion via Generate, exact `bit_count(xor)` filter on "
        "signatures carried in the bucket rows. One narrow shuffle, no "
        "join, no corpus re-scan.",
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
    "events_asof_join": (
        ["Window", "Union"],
        "As-of join as union + ONE keys-partitioned window (no join node): "
        "both sides tag themselves, the matched right row travels as one "
        "struct through `last(..., ignorenulls)` ordered by (ts, side, "
        "right-id) — inclusive bound and deterministic tie-break — and the "
        "tolerance check is a post-window projection.  The naive "
        "`r.ts <= l.ts` theta-join would plan BroadcastNestedLoopJoin: "
        "per-key quadratic.",
    ),
    "sim_kmeans_refine": (
        ["HashAggregate", "array_max"],
        "One Lloyd round's plan: literal-centroid argmin as a zero-shuffle "
        "`array_max` projection (same fold as IVF assignment), then ONE "
        "map-combined HashAggregate of int64-quantized component sums — "
        "k·d integers cross the exchange, not vectors.  Rounds before the "
        "last materialize only ≤4k centroid rows to the driver.",
    ),
    "events_funnel": (
        ["Window", "HashAggregate"],
        "Sequential funnel as an ordered min-chain: the three stage mins "
        "are chained Window operators over ONE keys-exchange (depth adds "
        "operators, not shuffles), then an output-bounded per-key "
        "aggregate derives the conversion flag.",
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
    "sample_balanced": (
        ["Filter", "CASE WHEN"],
        "Mixture rebalancing: group counts are ONE k-row aggregate "
        "collected at build time; the main plan is the literal CASE "
        "threshold as a bare Filter over the scan — zero joins, zero "
        "exchanges, pushable with any downstream plan.",
    ),
    "sim_ann_batch": (
        ["BroadcastHashJoin", "WindowGroupLimit"],
        "Batched multiprobe ANN (3 queries, one plan): probe ranking is "
        "a window over the tiny queries×masks frame; the corpus is "
        "touched by ONE BroadcastHashJoin on the bucket key; the "
        "per-query top-k compiles to WindowGroupLimit — per-partition "
        "k-pruning BEFORE the candidate exchange, so at scale only ~k "
        "rows per query per partition cross the wire.",
    ),
    "events_retention": (
        ["Window", "HashAggregate"],
        "Cohort retention with no first-seen join: distinct (user, "
        "period) is the only input-sized exchange; the cohort comes "
        "from a user-partitioned window MIN over the already-small "
        "distinct frame; the final (cohort, offset) count is "
        "output-bounded with a map-side partial. A naive "
        "first-seen-table formulation adds a join and a fourth "
        "exchange.",
    ),
    "dedup_embed_incremental": (
        ["BroadcastHashJoin", "SortMergeJoin LeftAnti"],
        "Incremental semantic dedup, the 100 TB asymmetry made visible: "
        "the kept corpus's persisted bucket-partitioned index appears "
        "ONLY as the probe side of a BroadcastHashJoin whose build side "
        "is the broadcast shard (no kept-side Exchange anywhere in the "
        "plan); every Exchange below the verdict joins is over "
        "shard-sized frames (per-new-id min, the shard's own bucket "
        "self-join, the survivor LeftAnti). The gate runs the REAL "
        "persisted-index path, so the plan includes the metadata-stamped "
        "index scan.",
    ),
    "text_bpe_pair_counts": (
        ["HashAggregate", "Generate"],
        "BPE merge learning's per-step aggregation: the merges fold "
        "appears ONCE (Project → Generate → partial/final HashAggregate "
        "around one Exchange). The explode argument is an INLINE "
        "expression deliberately — exploding a materialized attribute "
        "triggers InferFiltersFromGenerate's `size(a) > 0` filter, which "
        "predicate pushdown inlines below the projection and the whole "
        "fold runs 3× per row in a Filter that cannot CSE with the "
        "Project (plan-found in round 9, pinned in test_plans.py).",
    ),
    "dedup_chunks": (
        ["Window", "Generate"],
        "Chunk-granular exact dedup: the chunk frame is the shuffle-free "
        "chunk_windows projection+Generate; verdicts add exactly ONE "
        "Exchange — a window over chunk_md5 computing min-uid and count "
        "in the same pass (no groupBy + join-back, which would cross the "
        "chunk relation twice). The packed (doc, chunk) uid raises on "
        "both overflow directions rather than colliding ranges.",
    ),
    "dedup_chunks_keep": (
        ["LeftOuter", "HashAggregate"],
        "Chunk-level near-dup KEEP policy: chunk_near_pairs' banded "
        "candidates + exact-Jaccard evidence feeds one DISTINCT over the "
        "flagged uids (the HashAggregate pair) and ONE LeftOuter join of "
        "the chunk frame against that set — no iterative components; the "
        "verdict is `flagged IS NULL`. The flagged set is "
        "pair-output-sized, so at runtime AQE converts the static "
        "sort-merge to a broadcast in the common sparse-duplicate case. "
        "Default path re-chunks the corpus inside the pair machinery "
        "(the documented 3× subtree); materialize=True on the operator "
        "tokenizes once into an atexit-reaped scratch parquet and feeds "
        "BOTH the pairs and the verdict join from it — measured at sf0.1 "
        "the scratch write only pays for itself beyond gate scale "
        "(interleaved A/B: default min 1.63 s vs materialize 2.07 s), so "
        "the gate pins the default and the flag is the 100 TB path.",
    ),
    "pipeline_curate_mixture": (
        ["BroadcastHashJoin", "HashAggregate",
         "PushedFilters: \\[IsNotNull\\(lin_score\\)"],
        "The composed curation loop (score → threshold filter → mixture "
        "rebalance → per-group Bernoulli sample). The hashed-linear fold "
        "runs ONCE EVER — the score pass persists the scored corpus to "
        "parquet (the production pattern: scores kept for audit), so the "
        "two downstream consumers never re-run it and the threshold "
        "filter pushes into the scan (`PushedFilters` on lin_score; "
        "filtering the projected score alias in-plan would re-inline the "
        "whole fold into the pushed Filter — the Catalyst alias-inlining "
        "trap). Group masses are ONE partial+final HashAggregate to k "
        "mixture-sized rows plus a k-row window; the per-group keep_rate "
        "joins back via BroadcastHashJoin and the row draw (an exact "
        "integer via one JVM conv) compares against floor(keep_rate·2³²) "
        "derived IN-PLAN — no rate round-trips through the driver, no "
        "collect anywhere. At 100 TB: one scored-corpus write, one "
        "k-row aggregate scan, one sample scan — all filter-pruned.",
    ),
    "pipeline_curate_temperature": (
        ["BroadcastHashJoin", "HashAggregate", "Window"],
        "The no-dict twin of pipeline_curate_mixture: the per-group "
        "target is derived FROM the data (mass^α via integer-exact "
        "k-fold floor(sqrt(·))), so there is no score pass to persist — "
        "the k-row temperature frame is ONE partial+final HashAggregate "
        "over the corpus plus a k-row window, broadcast back onto a "
        "second plain scan (BroadcastHashJoin). Catalyst folds the "
        "draw-vs-floor(keep_rate·2³²) comparison INTO the join "
        "condition and infers the NULL-keep_rate prune onto the k-row "
        "side before the broadcast, so zero-mass groups never ship. "
        "At 100 TB: one aggregate scan + one sample scan, no collect, "
        "no cartesian, no Python eval — rates never leave the plan.",
    ),
    "sample_epoch_upsample": (
        ["BroadcastHashJoin", "Generate", "HashAggregate"],
        "The epoch-repeat materializer (round 13): temperature_weights "
        "collapses the corpus to k rows in ONE partial+final "
        "HashAggregate + a k-row window, epoch_plan's floor/remainder "
        "and the duplicate-plan-key raise run on that k-row side, and "
        "the plan BROADCASTS onto one corpus scan (BroadcastHashJoin, "
        "BuildRight). The repeat fan-out is a codegen'd "
        "explode(sequence(...)) Generate placed AFTER the join — rows "
        "multiply map-side, so no exchange ever ships repeated bytes "
        "and the only blowup-scaled cost is the output itself, hard- "
        "bounded by max_repeats. At 100 TB: two corpus scans (pruned), "
        "zero corpus-proportional shuffles, no collect, no Python eval.",
    ),
    "pipeline_pretrain_mix": (
        ["BroadcastHashJoin", "Generate", "ObjectHashAggregate",
         "hashpartitioning"],
        "The end-to-end pretraining mix over the persisted curate "
        "scratch stage (dedup window + quality folds + PII scrub run "
        "ONCE at build; both downstream scans read the parquet back "
        "with column pruning — ReadSchema shows lang,n_tokens for the "
        "weights scan and doc_id,lang,text for the corpus scan). "
        "Downstream is the audited mixture shape: k-row weights "
        "aggregate → broadcast join back → map-side explode fan-out → "
        "tokenize projection → pack_sequences' ONE hashpartitioning "
        "(shard) exchange + partial+final ObjectHashAggregate per "
        "(shard, chunk). That single pack window is the only "
        "corpus-proportional shuffle in the whole pipeline — the "
        "corpus-global packing order is the operator's cost floor.",
    ),
    "dedup_embed_extend_loop": (
        ["BroadcastHashJoin", "LeftAnti", "LeftOuter"],
        "The embedding twin of dedup_extend_loop: shard 2's semantic "
        "verdicts against a bucket-PARTITIONED planes-stamped embed "
        "index that extend_embed_index grew with shard 1's admitted "
        "keepers (the append detects the partitioned layout from a data "
        "file's footer and writes into the existing bucket= directories, "
        "preserving partition pruning). The shard's bucketed vectors "
        "broadcast into the index probe (the kept corpus is never "
        "shuffled), exact-cosine verification runs on the pruned "
        "candidates, new-vs-new survivors anti-join the kept-duplicate "
        "set, and verdict assembly is two LeftOuter joins on the shard "
        "spine. Every Exchange is shard-sized; the index stays current "
        "shard-over-shard via the footer-checked append — no rebuild, "
        "no kept-side shuffle.",
    ),
    "dedup_extend_loop": (
        ["BroadcastHashJoin", "LeftAnti", "LeftOuter"],
        "The multi-shard production loop: shard 2's verdicts against a "
        "persisted band index that extend_band_index grew with shard 1's "
        "admitted keepers. The plan is incremental_dedup's audited shape "
        "twice over (the kept-union side embeds shard 1's verdict dag): "
        "the shard's band rows broadcast into the index probe "
        "(BroadcastHashJoin — the kept index is never shuffled), the "
        "candidate kept texts are fetched by a broadcast semi-probe, "
        "new-vs-new survivors anti-join (LeftAnti) the kept-duplicate "
        "set, and the final verdict assembly is two LeftOuter joins on "
        "the shard spine. Every Exchange is shard-sized; the 100 TB "
        "keeper corpus appears only as the probed parquet index + the "
        "candidate-id text fetch, and the index stays current "
        "shard-over-shard via the append — no rebuild, no kept-side "
        "shuffle, no cartesian.",
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
        "single exchange, ungrouped dense fill as a pre-aggregation UNION "
        "with the literal zero spine (one exchange, no join), grouped dense "
        "fill as a per-group packed map broadcast-crossed with the spine, "
        "multi-axis grouping on one flat bigint key, and parquet "
        "`ReadSchema` pruned to the referenced columns plus `PushedFilters` "
        "carrying the raw-value keep range.",
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

            spark.conf.set("spark.sql.session.timeZone", "UTC")
            ev = (
                spark.read.parquet(f"{SF_DIR}/events.parquet")
                .withColumn("ts", F.col("ts").cast("timestamp"))
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
