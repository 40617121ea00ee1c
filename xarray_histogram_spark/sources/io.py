"""Histogram result persistence: parquet + BinSpec JSON sidecar.

The reference round-trips bin metadata through DataArray coordinate attrs so
results survive NetCDF save/load (accessor.py:25-47, changelog.md:2-4); the
Spark analog is the full internal DataFrame (including the exact-int value
and width/center/flow metadata columns) written as parquet with a
``_binspec.json`` sidecar carrying the specs + wrapper state.  A reloaded
result supports the whole accessor surface (normalize, stats, relabels)
without recomputation."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..binspec import BinSpec
from ..plans.result import HistogramResult

SIDECAR = "_binspec.json"


def write_result(result: HistogramResult, path: str, mode: str = "overwrite") -> None:
    result._df.write.mode(mode).parquet(path)
    meta = {
        "variables": result.variables,
        "specs": {v: result.specs[v].to_dict() for v in result.variables},
        "group_by": result.group_by,
        "value_col": result.value_col,
        "density": result.density,
        "flow": result.flow,
        "int_mode": result.int_mode,
        "divisor": result.divisor,
    }
    with open(os.path.join(path, SIDECAR), "w") as f:
        json.dump(meta, f, indent=2)


def read_result(spark: SparkSession, path: str) -> HistogramResult:
    with open(os.path.join(path, SIDECAR)) as f:
        meta = json.load(f)
    df = spark.read.parquet(path)
    return HistogramResult(
        _df=df,
        variables=list(meta["variables"]),
        specs={v: BinSpec.from_dict(d) for v, d in meta["specs"].items()},
        group_by=list(meta["group_by"]),
        value_col=meta["value_col"],
        density=meta["density"],
        flow=meta["flow"],
        int_mode=meta["int_mode"],
        divisor=meta["divisor"],
    )


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict:
    """Convenience loader for the driver's TPC-H-ish parquet tables."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
