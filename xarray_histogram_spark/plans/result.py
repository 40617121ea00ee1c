"""HistogramResult: the histogram-DataFrame wrapper + bin-coordinate algebra.

Reference parity: the ``hist`` accessor
(/root/reference/src/xarray_histogram/accessor.py) — bins/edges/centers/
widths/areas (accessor.py:148-250), remove_flow (278-305), normalize
(252-276), apply_func/scale (355-395).  The reference round-trips schema
through a naming convention + coordinate attrs; here the wrapper carries the
BinSpec objects directly (and ``sources.io`` persists them as a JSON sidecar
next to parquet, the analog of NetCDF attrs).

The wrapped ``_df`` keeps internal ``__<var>_width`` / ``__<var>_is_flow``
columns so normalization and statistics never re-join the spine; the public
``df`` drops them.  All algebra on bin coordinates is metadata-only — no
touch of the aggregated data (matches accessor.py:355-380: transforming a
coordinate relabels it, the counts are untouched).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, replace
from functools import reduce
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..binspec import BinSpec, Variable


@dataclass
class HistogramResult:
    _df: DataFrame
    variables: list[str]
    specs: dict[str, BinSpec]
    group_by: list[str]
    value_col: str
    density: bool
    flow: bool
    # internal value representation: exact int64 (count or scaled-int weighted
    # sum) with a display divisor, or raw double (int_mode=False)
    int_mode: bool = True
    divisor: float = 1.0
    # the sparse pre-dense aggregate (group keys + bin ids + __val) the dense
    # _df was finished from, when available.  Statistics consume it directly:
    # zero-mass bins contribute exactly nothing to every statistic (integer
    # cumulative sums are unchanged; a 0·x term cannot change an IEEE fold),
    # so stats can skip the dense-fill stages (grouped pack-map + spine
    # expansion) entirely.  Invalidated (None) by transforms that change the
    # data rows (slice_bins, merge); metadata-only transforms keep it.
    _sparse: Optional[DataFrame] = None

    # ---- public DataFrame (internal metadata columns dropped) ----
    @property
    def df(self) -> DataFrame:
        return self._df.drop(
            *[c for c in self._df.columns if c.startswith("__")]
        )

    def _one_var(self, variable: Optional[str]) -> str:
        if variable is None:
            if len(self.variables) != 1:
                raise ValueError("multiple variables; specify one")
            return self.variables[0]
        if variable not in self.variables:
            raise ValueError(f"unknown variable {variable!r}")
        return variable

    # ---- coordinate algebra (pure metadata; accessor.py:148-250) ----
    def bins(self, variable: Optional[str] = None, flow: bool = True) -> list:
        v = self._one_var(variable)
        return self.specs[v].labels(flow=flow and self.flow)

    def edges(self, variable: Optional[str] = None, flow: bool = True) -> list[float]:
        """Edges including the rightmost; with ``flow=True`` (the reference's
        default) the flow-bin positions wrap the interior edges exactly as
        ``get_edges`` inserts the right edge before the overflow coordinate
        (accessor.py:164-179, core.py:594-611): ±inf for Regular/Variable,
        the int64 sentinels for Integer."""
        v = self._one_var(variable)
        s = self.specs[v]
        e = s.edges()
        if e is None:
            raise ValueError(f"category axis {v!r} has no edges")
        if flow and self.flow:
            if s.underflow:
                e = [s.flow_under_bin().label] + e
            if s.overflow:
                e = e + [s.flow_over_bin().label]
        return e

    def centers(self, variable: Optional[str] = None, flow: bool = True) -> list[float]:
        v = self._one_var(variable)
        return self.specs[v].centers(flow=flow and self.flow)

    def widths(self, variable: Optional[str] = None, flow: bool = True) -> list[float]:
        v = self._one_var(variable)
        return self.specs[v].widths(flow=flow and self.flow)

    def areas(self, variables: Optional[Sequence[str]] = None, flow: bool = True) -> list:
        """Outer product of per-variable widths, flow cells forced to 1
        (core.py:638-646).  Row-major over the chosen variables."""
        vs = list(variables) if variables is not None else list(self.variables)
        import itertools

        grids = [self.specs[v].bins(flow=flow and self.flow) for v in vs]
        out = []
        for combo in itertools.product(*grids):
            a = 1.0
            for b in combo:
                a *= 1.0 if b.is_flow else b.width
            out.append(a)
        return out

    def is_normalized(self) -> bool:
        return self.density

    # ---- flow removal (accessor.py:278-305) ----
    def remove_flow(self, variables: Optional[Sequence[str]] = None) -> "HistogramResult":
        vs = list(variables) if variables is not None else list(self.variables)
        if not vs:
            raise ValueError("remove_flow: no variables given")
        conds = []
        new_specs = dict(self.specs)
        for v in vs:
            s = self.specs[v]
            conds.append(F.col(f"{v}_bin").between(F.lit(0), F.lit(s.n - 1)))
            fields = {}
            if "underflow" in {f.name for f in dataclasses.fields(s) if f.init}:
                fields["underflow"] = False
            if "overflow" in {f.name for f in dataclasses.fields(s) if f.init}:
                fields["overflow"] = False
            new_specs[v] = replace(s, **fields) if fields else s
        out = self._df.where(reduce(lambda a, b: a & b, conds))
        return replace(self, _df=out, specs=new_specs)

    # ---- normalization (accessor.py:252-276, core.py:649-663) ----
    def normalize(self, variables: Optional[Sequence[str]] = None) -> "HistogramResult":
        if self.density:
            raise ValueError("histogram is already normalized")
        vs = list(variables) if variables is not None else list(self.variables)
        if not vs:
            raise ValueError("normalize: no variables given")
        for v in vs:
            if v not in self.variables:
                raise ValueError(f"unknown variable {v!r}")
        other = [v for v in self.variables if v not in vs]
        part = self.group_by + [f"{v}_bin" for v in other]
        from .histogram import _density_expr

        pdf = _density_expr(vs, part, self.int_mode, self.divisor)
        new_name = (
            self.value_col[: -len("_histogram")] + "_pdf"
            if self.value_col.endswith("_histogram")
            else self.value_col + "_pdf"
        )
        out = (
            self._df.drop(self.value_col)
            .withColumn(new_name, pdf)
        )
        return replace(self, _df=out, value_col=new_name, density=True)

    # ---- coordinate transforms (accessor.py:355-395): metadata-only ----
    def apply_func(
        self,
        func: Callable[..., float],
        variable: Optional[str] = None,
        **kwargs,
    ) -> "HistogramResult":
        """Relabel one variable's bin coordinate by applying ``func`` to its
        edges — equivalent to having histogrammed ``func(x)``.  Data columns
        are untouched; only the label column and the spec change.  ``func``
        must be strictly increasing on the edge range.  Extra ``kwargs`` are
        forwarded to ``func`` (reference accessor.py:354-380 signature:
        ``apply_func(func, variable, **kwargs)``)."""
        v = self._one_var(variable)
        s = self.specs[v]
        old_edges = s.edges()
        if old_edges is None:
            raise ValueError("apply_func needs an interval axis (Regular/Variable)")
        new_edges = [float(func(e, **kwargs)) for e in old_edges]
        if any(b <= a for a, b in zip(new_edges, new_edges[1:])):
            raise ValueError("func must be strictly increasing over the edges")
        new_spec = Variable(
            tuple(new_edges), underflow=s.underflow, overflow=s.overflow
        )
        mapping = {b.id: b for b in new_spec.bins(flow=self.flow)}

        def lit_map(value_of) -> Column:
            kvs: list[Column] = []
            for bid, b in mapping.items():
                kvs.append(F.lit(bid))
                kvs.append(F.lit(value_of(b)))
            return F.create_map(*kvs)

        out = (
            self._df.withColumn(f"{v}_bins", lit_map(lambda b: b.label)[F.col(f"{v}_bin")])
            .withColumn(f"__{v}_width", lit_map(lambda b: float(b.width))[F.col(f"{v}_bin")])
            .withColumn(f"__{v}_center", lit_map(lambda b: float(b.center))[F.col(f"{v}_bin")])
        )
        new_specs = dict(self.specs)
        new_specs[v] = new_spec
        return replace(self, _df=out, specs=new_specs)

    def scale(self, factor: float, variable: Optional[str] = None) -> "HistogramResult":
        """Scale a bin coordinate by a constant factor (accessor.py:382-395)."""
        if factor <= 0:
            raise ValueError("factor must be > 0 (monotonicity)")
        return self.apply_func(lambda e: e * factor, variable)

    # ---- rebin (boost UHI-style adjacent-bin merge) ----
    def rebin(self, factor: int, variable: Optional[str] = None) -> "HistogramResult":
        """Merge ``factor`` adjacent bins along one variable — boost's rebin.
        Runs on the aggregated result only (raw data never re-read): integer
        id remap + re-sum + the shared dense finish.  The new axis is a
        ``Variable`` over every ``factor``-th OLD edge, so the label doubles
        survive EXACTLY (recomputing ``lo + i·span/(n/f)`` could differ in
        the last ulp from the original edge values).  Flow bins pass
        through unchanged.  Rebin before ``normalize`` — merging pdf bins
        is not mass-preserving."""
        from ..binspec import Regular, Variable as _Var
        from .histogram import finish_from_agg

        v = self._one_var(variable)
        if self.density:
            raise ValueError("rebin the histogram, then normalize")
        s = self.specs[v]
        if not isinstance(s, (Regular, _Var)):
            raise TypeError("rebin needs an interval axis (Regular/Variable)")
        f = int(factor)
        if f < 1 or s.n % f != 0:
            raise ValueError(f"factor {f} must divide n={s.n}")
        if f == 1:
            return self
        new_spec = _Var(
            tuple(s.edges()[::f]),
            underflow=getattr(s, "underflow", True),
            overflow=getattr(s, "overflow", True),
        )
        old = F.col(f"{v}_bin")
        new_id = (
            F.when(old < 0, F.lit(-1))
            .when(old >= s.n, F.lit(new_spec.n))
            .otherwise(F.floor(old / F.lit(f)))
            .cast("int")
        )
        ids = [
            (new_id if vv == v else F.col(f"{vv}_bin")).alias(f"{vv}_bin")
            for vv in self.variables
        ]
        agg = (
            self._df.select(*self.group_by, *ids, F.col("__val"))
            .groupBy(*self.group_by, *[f"{vv}_bin" for vv in self.variables])
            .agg(F.sum("__val").alias("__val"))
        )
        storage = (
            "int64"
            if dict(self._df.dtypes).get(self.value_col) == "bigint"
            else "double"
        )
        return finish_from_agg(
            agg,
            self.variables,
            [new_spec if vv == v else self.specs[vv] for vv in self.variables],
            group_by=self.group_by,
            flow=self.flow,
            density=False,
            storage=storage,
            int_mode=self.int_mode,
            divisor=self.divisor,
            weighted=(self.divisor != 1.0) or not self.int_mode,
        )

    # ---- bin-range slicing (boost UHI h[a:b]) ----
    def slice_bins(
        self, lo: int, hi: int, variable: Optional[str] = None
    ) -> "HistogramResult":
        """Keep core bins ``lo <= id < hi`` of one interval axis — boost's
        UHI slice with CROP semantics (``h[bh.loc(a):bh.loc(b):bh.crop]``):
        out-of-slice content is DROPPED, not accumulated into flow.  (The
        boost-histogram DEFAULT slice ``h[a:b]`` accumulates cropped
        content into the flow bins instead — not what this implements.)
        Metadata-only + a filter on the aggregated result: the new axis is
        a ``Variable`` over the original edge doubles (exact labels), ids
        remapped to 0-based.  The result is flow-free, so flow rows of
        EVERY axis are dropped (the sliced axis's flow bins are outside
        any core slice; the other axes' flow rows would otherwise survive
        into a flow=False result and break dense export/re-finish)."""
        from ..binspec import Regular as _Reg, Variable as _Var
        from .histogram import id_col as _id

        v = self._one_var(variable)
        if self.density:
            raise ValueError("slice the histogram, then normalize")
        s = self.specs[v]
        if not isinstance(s, (_Reg, _Var)):
            raise TypeError("slice_bins needs an interval axis")
        if not (0 <= lo < hi <= s.n):
            raise ValueError(f"need 0 <= lo < hi <= {s.n}")
        edges = s.edges()
        new_spec = _Var(tuple(edges[lo : hi + 1]))
        kept = self._df.where(
            F.col(_id(v)).between(F.lit(lo), F.lit(hi - 1))
        )
        for other in self.variables:
            if other != v and self.flow:
                kept = kept.where(
                    F.col(_id(other)).between(
                        F.lit(0), F.lit(self.specs[other].n - 1)
                    )
                )
        out = kept.withColumn(_id(v), (F.col(_id(v)) - F.lit(lo)).cast("int"))
        specs = dict(self.specs)
        specs[v] = new_spec
        return replace(self, _df=out, specs=specs, flow=False, _sparse=None)

    # ---- projection (boost Histogram.project / summing out dims) ----
    def project(self, variables) -> "HistogramResult":
        """Marginalize onto ``variables``: sum the other axes out — boost's
        ``Histogram.project`` / the reference's xarray ``sum`` over bin
        dims.  Runs on the aggregated result only (raw data never re-read):
        drop the projected-out id columns, re-sum, shared dense finish.

        Whatever bins the result HOLDS for the dropped axes collapse into
        the sums: with ``flow=True`` that is the axes' full content (boost
        semantics — the projection equals a direct histogram of the kept
        variables); with ``flow=False`` the dropped axes' keep filters
        remain baked into the data, so the projection equals a histogram of
        the kept variables over rows passing ALL original keep filters.
        Project the histogram, then normalize — a pdf cannot be summed."""
        if isinstance(variables, str):
            variables = [variables]
        want = set(variables)
        unknown = want - set(self.variables)
        if unknown:
            raise ValueError(f"unknown variable(s) {sorted(unknown)}")
        if self.density:
            raise ValueError("project the histogram, then normalize")
        keep = [v for v in self.variables if v in want]
        if len(keep) == len(self.variables):
            return self
        if not keep:
            raise ValueError("project needs at least one kept variable")
        from .histogram import finish_from_agg

        agg = (
            self._df.select(
                *self.group_by, *[f"{v}_bin" for v in keep], F.col("__val")
            )
            .groupBy(*self.group_by, *[f"{v}_bin" for v in keep])
            .agg(F.sum("__val").alias("__val"))
        )
        storage = (
            "int64"
            if dict(self._df.dtypes).get(self.value_col) == "bigint"
            else "double"
        )
        return finish_from_agg(
            agg,
            keep,
            [self.specs[v] for v in keep],
            group_by=self.group_by,
            flow=self.flow,
            density=False,
            storage=storage,
            int_mode=self.int_mode,
            divisor=self.divisor,
            weighted=(self.divisor != 1.0) or not self.int_mode,
        )

    # ---- histogram addition (xarray DataArray arithmetic / boost `+`) ----
    def merge(self, *others: "HistogramResult") -> "HistogramResult":
        """Sum histograms with identical schema (specs, grouping, flow) —
        the reference's DataArray addition; the merge of per-shard or
        incremental histograms.  Exact in int_mode (integer addition)."""
        for o in others:
            if (
                o.variables != self.variables
                or o.specs != self.specs
                or o.group_by != self.group_by
                or o.flow != self.flow
                or o.int_mode != self.int_mode
                or o.divisor != self.divisor
            ):
                raise ValueError("merge needs identical histogram schemas")
            if o.density or self.density:
                raise ValueError("merge normalized histograms before normalize, not after")
        keys = self.group_by + [f"{v}_bin" for v in self.variables]
        keep = keys + [f"{v}_bins" for v in self.variables] + [
            c for c in self._df.columns if c.startswith("__") and c != "__val"
        ]
        unioned = self._df
        for o in others:
            unioned = unioned.unionByName(o._df)
        summed = unioned.groupBy(*keep).agg(F.sum("__val").alias("__val"))
        vis = F.col("__val")
        if self.int_mode and self.value_col.endswith("_histogram"):
            # recompute the visible value like the planner does
            storage_int = dict(self._df.dtypes).get(self.value_col) == "bigint"
            if not storage_int:
                vis = vis.cast("double")
                if self.divisor != 1.0:
                    vis = vis / F.lit(self.divisor)
        out = summed.withColumn(self.value_col, vis)
        return replace(self, _df=out, _sparse=None)

    def __add__(self, other: "HistogramResult") -> "HistogramResult":
        return self.merge(other)

    # ---- distribution statistics (accessor.py:397-573); see plans.stats ----
    def mean(self, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.mean(self, variable)

    def var(self, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.var(self, variable)

    def std(self, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.std(self, variable)

    def moment(self, order: int, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.moment(self, order, variable)

    def median(self, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.median(self, variable)

    def ppf(self, q, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.ppf(self, q, variable)

    def cdf(self, x: float, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.cdf(self, x, variable)

    def interval(self, confidence: float, variable: Optional[str] = None) -> DataFrame:
        from . import stats

        return stats.interval(self, confidence, variable)

    # ---- dense exports (migration surface: the reference RETURNS a dense
    # labelled array; these collect the bin-bounded result — never raw data —
    # and rebuild that exact shape driver-side) ----
    def to_pandas(self):
        """Collect the result ordered by (group keys, bin ids) — flow bins
        first/last like the reference's coordinates (underflow leads,
        overflow trails, core.py:524-587)."""
        order = self.group_by + [f"{v}_bin" for v in self.variables]
        return self.df.orderBy(*order).toPandas()

    def _dense_pivot(self):
        """(values ndarray, dim names, coords dict).  Shape = (sorted
        distinct observed values per group column…, bin extents…); group
        combinations never observed are NaN-filled (the reference cannot
        produce them — its loop dims come from a dense array).  A NULL
        group key (possible when grouping by a nullable column) becomes an
        explicit trailing ``None`` level — observed groups are never
        silently dropped."""
        import numpy as np

        bid = [f"{v}_bin" for v in self.variables]
        pdf = self.df.orderBy(*self.group_by, *bid).toPandas()
        labels = {v: self.specs[v].labels(flow=self.flow) for v in self.variables}
        ids = {
            v: [b.id for b in self.specs[v].bins(self.flow)]
            for v in self.variables
        }
        dims = list(self.group_by) + [f"{v}_bins" for v in self.variables]
        coords: dict = {}
        code_cols: list[np.ndarray] = []
        shape: list[int] = []
        for g in self.group_by:
            col = pdf[g]
            isna = col.isna().to_numpy()
            uniq = sorted(col.dropna().unique().tolist())
            level = uniq + ([None] if isna.any() else [])
            coords[g] = level
            lut = {v: i for i, v in enumerate(uniq)}
            codes = np.array(
                [len(uniq) if na else lut[v] for v, na in zip(col.tolist(), isna)],
                dtype=np.int64,
            )
            code_cols.append(codes)
            shape.append(len(level))
        for v in self.variables:
            coords[f"{v}_bins"] = labels[v]
            lut = {b: i for i, b in enumerate(ids[v])}
            code_cols.append(
                np.array([lut[b] for b in pdf[f"{v}_bin"].tolist()], dtype=np.int64)
            )
            shape.append(len(ids[v]))
        flat = np.full(int(np.prod(shape)), np.nan)
        if len(pdf):
            idx = np.ravel_multi_index(tuple(code_cols), tuple(shape))
            flat[idx] = pdf[self.value_col].to_numpy(dtype="float64")
        return flat.reshape(tuple(shape)), dims, coords

    def to_numpy(self):
        """Dense ndarray shaped (group dims…, bin dims…), reference array
        layout (underflow first, overflow last along each bin dim)."""
        return self._dense_pivot()[0]

    def to_xarray(self):
        """The reference's exact output object: a DataArray named
        ``<vars>_{histogram|pdf}`` with ``<var>_bins`` coordinates carrying
        ``bin_type`` / ``right_edge`` / ``underflow`` / ``overflow`` attrs
        (core.py:524-591, accessor.py:25-47).  Requires xarray (optional
        dependency)."""
        try:
            import xarray as xr
        except ImportError as e:  # pragma: no cover - xarray optional
            raise ImportError(
                "to_xarray() needs the optional xarray package"
            ) from e

        values, dims, coords = self._dense_pivot()
        da = xr.DataArray(
            values, dims=dims, coords=coords, name=self.value_col
        )
        for v in self.variables:
            s = self.specs[v]
            emitted = s.bins(self.flow)
            attrs = {
                "bin_type": type(s).__name__,
                "underflow": int(any(b.id == -1 for b in emitted)),
                "overflow": int(any(b.id == s.n for b in emitted)),
            }
            edges = s.edges()
            if edges is not None and type(s).__name__ in (
                "Regular", "MonotoneRegular", "Variable",
            ):
                attrs["right_edge"] = edges[-1]
            da.coords[f"{v}_bins"].attrs.update(attrs)
        return da


# ---------------------------------------------------------------------------
# foreign-histogram adoption: attach the accessor surface to ANY well-named
# histogram DataFrame, no BinSpec sidecar required
# ---------------------------------------------------------------------------

_VALID_VALUE_TYPES = ("histogram", "pdf")
_ADOPT_MAX_BINS = 100_000


def _validate_value_name(name: str, variables: Sequence[str]) -> str:
    """Name-convention validation, mirroring the reference accessor's
    greedy decomposition (accessor.py:73-105): the value column must end
    in a valid type and be prefixed by every ``_bins`` variable (in some
    order); anything else is malformed.  Returns the type suffix."""
    err = f"Malformed value column name '{name}'. "
    vtype = ""
    for t in _VALID_VALUE_TYPES:
        if name.endswith(f"_{t}") or name == t:
            vtype = t
            break
    if not vtype:
        raise ValueError(
            err + f"Name should end in one of {list(_VALID_VALUE_TYPES)}"
        )
    rest = name
    unaccounted = list(variables)
    for _ in range(len(variables)):
        found = False
        for var in unaccounted:
            # require the separator: bare startswith(var) would let
            # "var1_histogram" satisfy a variable named "var"
            if rest.startswith(var + "_"):
                found = True
                rest = rest.removeprefix(var + "_")
                unaccounted.remove(var)
                break
        if not found:
            raise ValueError(
                err + "Name contains unrecognized variables "
                f"(found variables are {list(variables)})."
            )
    if unaccounted:
        raise ValueError(
            err + f"Variables {unaccounted} are not present in the name."
        )
    if rest != vtype:
        # leftover between the variables and the type suffix, e.g.
        # "var1_junk_histogram"
        raise ValueError(
            err + "Name contains unrecognized variables "
            f"(found variables are {list(variables)})."
        )
    return vtype


def _isclose(a: float, b: float) -> bool:
    # np.allclose's default tolerances (accessor.py:124 uses np.allclose)
    return abs(a - b) <= 1e-8 + 1e-5 * abs(b)


def _infer_axis(var: str, pairs: list, dtype) -> tuple:
    """Infer a BinSpec from one axis's distinct (id, label) pairs.

    The dtype of the label column picks the axis family (the reference's
    "Default is Regular" + right-edge inference, accessor.py:107-130);
    flow bins are recognized by THEIR label encodings (±inf / int64
    min-max / "_flow_bin" — binspec.py:36-38), the same encodings
    ``to_xarray``/NetCDF round-trips use.

    Returns ``(spec, frame_core_labels)``: for double axes,
    ``frame_core_labels`` is the sorted list of the FRAME's actual core
    label values — the inferred Regular recomputes its labels as
    ``lo + i·span/n``, which can drift from the stored labels by an ulp,
    so id/metadata lookups must be keyed by the frame's own values, not
    the recomputation.  ``None`` for exact (int/string/bool) label types,
    whose spec labels are constructed bit-identical from the frame's."""
    from pyspark.sql import types as T

    from ..binspec import (
        FLOW_STR, I64_MAX, I64_MIN, Integer, IntCategory, Regular,
        StrCategory,
    )

    have_ids = all(i is not None for i, _ in pairs)
    if have_ids:
        pairs = sorted(pairs, key=lambda p: p[0])
    labels = [l for _, l in pairs]

    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        labels = sorted(float(l) for l in labels)
        under = any(l == float("-inf") for l in labels)
        over = any(l == float("inf") for l in labels)
        core = [l for l in labels if l not in (float("-inf"), float("inf"))]
        if len(core) < 2:
            raise ValueError(
                f"Cannot infer right edge: bins for {var} need at least "
                "two regular bins."
            )
        diffs = [core[i + 1] - core[i] for i in range(len(core) - 1)]
        if not all(_isclose(d, diffs[0]) for d in diffs):
            raise ValueError(
                f"Cannot infer right edge: bins for {var} are not "
                "regularly spaced."
            )
        return (
            Regular(
                len(core), core[0], core[-1] + diffs[0],
                underflow=under, overflow=over,
            ),
            core,
        )
    if isinstance(dtype, T.BooleanType):
        return (
            Integer(0, 2, underflow=False, overflow=False, bool_labels=True),
            None,
        )
    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        labels = sorted(int(l) for l in labels)
        under = I64_MIN in labels
        over = I64_MAX in labels
        core = [l for l in labels if l not in (I64_MIN, I64_MAX)]
        if not core:
            raise ValueError(f"bins for {var}: no core (non-flow) bins")
        consecutive = core == list(range(core[0], core[-1] + 1))
        if consecutive:
            return (
                Integer(core[0], core[-1] + 1, underflow=under, overflow=over),
                None,
            )
        if under:
            raise ValueError(
                f"bins for {var}: non-consecutive integer labels with an "
                "underflow sentinel cannot be represented (IntCategory "
                "has no underflow)"
            )
        return IntCategory(tuple(core), overflow=over), None
    if isinstance(dtype, T.StringType):
        over = FLOW_STR in labels
        core = [l for l in labels if l != FLOW_STR]
        if not have_ids:
            core = sorted(core)
        if not core:
            raise ValueError(f"bins for {var}: no core (non-flow) bins")
        return StrCategory(tuple(core), overflow=over), None
    raise TypeError(
        f"bins for {var}: unsupported label dtype {dtype.simpleString()}"
    )


def adopt_dataframe(
    df: DataFrame, value_col: Optional[str] = None
) -> HistogramResult:
    """Adopt a FOREIGN histogram DataFrame — one produced by another tool,
    or by this engine with the ``_binspec.json`` sidecar lost — purely
    from the naming convention, the reference accessor's interop story
    (accessor.py:49-130: attach to any well-named DataArray, default the
    bin type to Regular, infer the right edge from the bin coordinate,
    raise when edges are not inferable, accessor.py:123-130).

    Requirements (all by convention, no metadata):

    - one ``<var>_bins`` label column per axis (any of: double Regular
      left edges, int64 Integer/IntCategory labels, string StrCategory
      labels, boolean Integer bool labels — flow bins recognized by the
      ±inf / int64 min-max / ``"_flow_bin"`` encodings);
    - a value column named ``<v1>_..._<vN>_{histogram|pdf}`` (validated
      by the reference's greedy decomposition; pass ``value_col=`` to
      skip discovery when other columns share the suffix);
    - every other column is taken as a group (loop-dim) key — except
      ``__``-prefixed columns, this engine's internal-metadata convention,
      which are DROPPED and rebuilt (so ``read_result``'s lost-sidecar
      fallback adopts this engine's own full ``_df`` parquet cleanly);
    - a ``<var>_bin`` integer id column is OPTIONAL: when present it
      fixes category order; ids are (re)derived from the labels via the
      inferred spec either way, so foreign id conventions cannot corrupt
      the coordinate algebra.

    Plan shape: ONE bounded aggregation job collects each axis's distinct
    labels (bin-bounded — the frame is an aggregated histogram; a
    ``_ADOPT_MAX_BINS`` guard refuses degenerate inputs), then everything
    else is literal-map projection — no join, no extra shuffle.  The
    returned result supports the full accessor surface (normalize, stats,
    rebin, slice, merge, export).
    """
    internal = [c for c in df.columns if c.startswith("__")]
    if internal:
        df = df.drop(*internal)
    cols = df.columns
    variables = [c[: -len("_bins")] for c in cols if c.endswith("_bins")]
    variables = [v for v in variables if v]
    if not variables:
        raise ValueError("No bins coordinates found in DataFrame")
    if value_col is None:
        cands = [
            c
            for c in cols
            if any(c.endswith(f"_{t}") for t in _VALID_VALUE_TYPES)
        ]
        if len(cands) != 1:
            raise ValueError(
                "could not discover the value column (candidates: "
                f"{cands}); pass value_col="
            )
        value_col = cands[0]
    elif value_col not in cols:
        raise ValueError(f"value column {value_col!r} not in DataFrame")
    vtype = _validate_value_name(value_col, variables)
    density = vtype == "pdf"

    # ONE batched job: bounded distinct (id, label) pairs per axis
    schema = df.schema
    aggs = []
    for v in variables:
        lab = F.col(f"{v}_bins")
        if f"{v}_bin" in cols:
            src = F.struct(
                F.col(f"{v}_bin").cast("int").alias("i"), lab.alias("l")
            )
        else:
            src = F.struct(F.lit(None).cast("int").alias("i"), lab.alias("l"))
        aggs.append(
            F.slice(
                F.sort_array(F.collect_set(F.when(lab.isNotNull(), src))),
                1,
                _ADOPT_MAX_BINS + 1,
            ).alias(f"__lab_{v}")
        )
        # same job: a NULL label anywhere is a malformed histogram frame —
        # it would otherwise adopt with silent NULL ids poisoning stats
        aggs.append(F.max(lab.isNull()).alias(f"__null_{v}"))
    row = df.agg(*aggs).first()
    for v in variables:
        if row[f"__null_{v}"]:
            raise ValueError(
                f"bins for {v}: NULL labels present — not a well-formed "
                "histogram frame"
            )

    specs: dict[str, BinSpec] = {}
    frame_core: dict[str, Optional[list]] = {}
    flow = False
    for v in variables:
        pairs = [(r["i"], r["l"]) for r in row[f"__lab_{v}"]]
        if len(pairs) > _ADOPT_MAX_BINS:
            raise ValueError(
                f"bins for {v}: more than {_ADOPT_MAX_BINS} distinct "
                "labels — not a histogram frame?"
            )
        if not pairs:
            raise ValueError(f"bins for {v}: no labels (empty frame?)")
        spec, core_labels = _infer_axis(v, pairs, schema[f"{v}_bins"].dataType)
        specs[v] = spec
        frame_core[v] = core_labels
        flow = flow or any(b.is_flow for b in spec.bins(True))

    consumed = (
        {value_col}
        | {f"{v}_bins" for v in variables}
        | {f"{v}_bin" for v in variables}
    )
    group_by = [c for c in cols if c not in consumed]

    vdt = schema[value_col].dataType
    from pyspark.sql import types as T

    int_mode = vtype == "histogram" and isinstance(
        vdt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )

    def keyed_bins(v: str) -> list:
        """(map_key, Bin) pairs: keys are the FRAME's own label values.
        An inferred Regular recomputes core labels as lo + i·span/n,
        which can drift from the stored labels by an ulp — a float-equal
        map keyed on the recomputation would miss those bins and emit
        NULL ids/metadata.  Core double keys therefore come from the
        collected frame labels (sorted ascending = id order); flow and
        exact-typed labels are bit-identical by construction."""
        s = specs[v]
        core = frame_core[v]
        out = []
        for b in s.bins(flow):
            if b.is_flow or core is None:
                out.append((b.label, b))
            else:
                out.append((core[b.id], b))
        return out

    def lit_map(kb: list, value_of) -> Column:
        kvs: list[Column] = []
        for key, b in kb:
            kvs.append(F.lit(key))
            kvs.append(F.lit(value_of(b)))
        return F.create_map(*kvs)

    proj: list[Column] = [F.col(c) for c in group_by]
    for v in variables:
        kb = keyed_bins(v)
        lab = F.col(f"{v}_bins")
        proj.append(lit_map(kb, lambda b: b.id)[lab].cast("int").alias(f"{v}_bin"))
        proj.append(lab)
        proj.append(lit_map(kb, lambda b: float(b.width))[lab].alias(f"__{v}_width"))
        proj.append(lit_map(kb, lambda b: float(b.center))[lab].alias(f"__{v}_center"))
        proj.append(lit_map(kb, lambda b: bool(b.is_flow))[lab].alias(f"__{v}_is_flow"))
    proj.append(F.col(value_col))
    proj.append(
        F.col(value_col).cast("bigint" if int_mode else "double").alias("__val")
    )
    return HistogramResult(
        _df=df.select(*proj),
        variables=variables,
        specs=specs,
        group_by=group_by,
        value_col=value_col,
        density=density,
        flow=flow,
        int_mode=int_mode,
        divisor=1.0,
    )
