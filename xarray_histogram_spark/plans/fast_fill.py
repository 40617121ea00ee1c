"""Arrow-batched vectorized histogram fill — the "histogram UDAF" execution
path (BASELINE.json: "DataFrame aggregations + histogram UDAFs").

The pure-Column path (plans.histogram) shuffles raw rows into Spark's
HashAggregate; its per-row JVM cost dominates at high selectivity (every row
survives into the aggregate).  This path mirrors the REFERENCE's physical
strategy instead — a vectorized per-chunk fill (core.py:335-408 does it with
boost C++; here numpy does it in C over Arrow batches) followed by a tiny
combine:

  mapInPandas batch kernel:  bucketize (numpy vectorised) → per-batch
  bincount partials (exact int64)  →  groupBy(group, bin).sum of partials
  (rows entering the shuffle: |batches| × |non-empty bins| — thousands, not
  billions)  →  the same dense finish as the Column path.

Bit-exactness is preserved — this path hash-matches the SAME DuckDB oracles:
- bucketize arithmetic is the identical IEEE double expression
  ((x−lo)·n/span, floor) evaluated elementwise by numpy;
- exact-axis/Variable lookup uses searchsorted(side='right') ≡ the edge-scan;
- weighted sums quantise with explicit half-away-from-zero rounding
  (np.floor(|w·s|+0.5)·sign — np.rint would round half-to-even and diverge
  from Spark/DuckDB ROUND);
- partials and their combine are int64 (order-independent).

Measured reality (local[32], cached 1e7 doubles, 100 bins): the Column path
wins (~0.6 s vs ~2.0 s) — Arrow IPC transfer of the value column dominates,
exactly the overhead the reference never pays because its fill runs
in-process.  The Column path therefore stays the DEFAULT everywhere.  This
path earns its keep when the batch is already in Python-land (e.g. fused
into a mapInPandas ingestion/dedup pipeline, where the histogram partials
ride along for free) and as the boost-parity physical strategy
(BASELINE.json's "histogram UDAFs"), kept bit-exact and fully tested.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..binspec import BinSpec, IntCategory, Integer, Regular, StrCategory, Variable
from .histogram import BinsArg, finish_from_agg, id_col, resolve_specs
from .result import HistogramResult

from pyspark.sql import functions as F


def _spec_to_plain(spec: BinSpec) -> dict:
    """Flatten a spec into plain data for the worker-side kernel: the
    mapInPandas closure must be fully self-contained (no references to this
    package, which Python workers cannot import unless the driver's CWD
    happens to be the repo)."""
    from ..binspec import MonotoneRegular

    d = {"n": spec.n}
    if isinstance(spec, MonotoneRegular):
        # custom-transform axes: the exact literal-edge path serializes as
        # plain edge data; the fast path would need the user's Python
        # callable on workers — refuse rather than ship it silently
        if not spec.exact:
            raise TypeError(
                "Arrow fill path supports MonotoneRegular only with "
                "exact=True (literal edges); the fast path keeps the user "
                "callable driver-side"
            )
        d.update(kind="edges", edges=spec.edges())
    elif isinstance(spec, Regular):
        if spec.transform is not None and spec.exact:
            d.update(kind="edges", edges=spec.edges())
        else:
            if spec.transform == "log":
                d.update(
                    kind="linear", pre="log",
                    ylo=math.log(spec.lo), yhi=math.log(spec.hi),
                )
            elif spec.transform == "sqrt":
                d.update(
                    kind="linear", pre="sqrt",
                    ylo=math.sqrt(spec.lo), yhi=math.sqrt(spec.hi),
                )
            elif spec.transform == "pow":
                p = float(spec.power)
                d.update(
                    kind="linear", pre="pow", p=p,
                    ylo=math.pow(spec.lo, p), yhi=math.pow(spec.hi, p),
                )
            else:
                d.update(kind="linear", pre=None, ylo=float(spec.lo), yhi=float(spec.hi))
    elif isinstance(spec, Variable):
        d.update(kind="edges", edges=spec.edges())
    elif isinstance(spec, Integer):
        d.update(kind="integer", lo=int(spec.lo), hi=int(spec.hi))
    elif isinstance(spec, (IntCategory, StrCategory)):
        d.update(kind="category", lookup={c: i for i, c in enumerate(spec.categories)})
    else:
        raise TypeError(f"unsupported spec {type(spec)}")
    return d


def histogramdd_fill(
    df: DataFrame,
    cols: Sequence[str],
    bins: BinsArg = 10,
    *,
    ranges=None,
    weights: Optional[str] = None,
    density: bool = False,
    group_by: Sequence[str] = (),
    flow: bool = False,
    storage: str = "double",
    weight_scale: Optional[int] = 6,
) -> HistogramResult:
    """histogramdd with the vectorized Arrow fill (same semantics, same
    result, same oracles as plans.histogram.histogramdd)."""
    cols = list(cols)
    group_by = list(group_by)
    storage = {"unlimited": "double", "atomicint64": "int64"}.get(
        storage.lower(), storage.lower()
    )
    specs = resolve_specs(df, cols, bins, ranges)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c, s in zip(cols, specs):
        if c not in schema:
            raise ValueError(f"column {c!r} not in DataFrame")
        s.validate_dtype(schema[c], c)
    # same bool-axis relabel as histogramdd (reference core.py:542-543) —
    # the two paths must emit identical labels/flow structure
    from dataclasses import replace as _dcr

    specs = [
        _dcr(s, bool_labels=True)
        if (
            not flow
            and isinstance(s, Integer)
            and not s.bool_labels
            and (s.lo, s.hi) == (0, 2)
            and isinstance(schema[c], T.BooleanType)
        )
        else s
        for c, s in zip(cols, specs)
    ]
    # same dense-extent guard as histogramdd: fail clearly up front
    total_space = 1
    for s in specs:
        total_space *= s.n + 2
    if total_space > 2**31:
        raise ValueError(
            f"dense histogram extent ({total_space} cells per group) is "
            "infeasible to materialize; reduce bin counts or histogram "
            "fewer variables together"
        )

    keep = [s.keep_range(flow) for s in specs]
    int_mode = weights is None or weight_scale is not None
    divisor = float(10**weight_scale) if (weights and weight_scale) else 1.0
    # dedup: a column may serve several roles (e.g. self-weighted
    # histograms) — duplicate names would make pdf[col] a 2-column frame
    needed = list(dict.fromkeys(group_by + cols + ([weights] if weights else [])))
    narrow = df.select(*needed)

    out_fields = [T.StructField(g, schema[g]) for g in group_by]
    out_fields += [T.StructField(id_col(c), T.IntegerType()) for c in cols]
    out_fields.append(
        T.StructField("__val", T.LongType() if int_mode else T.DoubleType())
    )
    out_schema = T.StructType(out_fields)
    idcols = [id_col(c) for c in cols]
    gkeys = list(group_by)
    w_name = weights
    scale = divisor
    plain = [(c, _spec_to_plain(s), kr) for c, s, kr in zip(cols, specs, keep)]
    kernel_int_mode = int_mode

    # NOTE: this closure must stay self-contained — only stdlib/numpy/pandas
    # and the plain-data locals above may be referenced (Python workers
    # cannot import this package).
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def bucketize(d: dict, v: "_pd.Series") -> "_np.ndarray":
            n = d["n"]
            if d["kind"] == "category":
                ids = v.map(d["lookup"]).to_numpy(dtype="float64", na_value=_np.nan)
                return _np.where(_np.isnan(ids), n, ids).astype(_np.int64)
            if d["kind"] == "integer":
                raw = v.to_numpy()
                if raw.dtype.kind in "iub":
                    # null-free long/bool columns arrive as real ints —
                    # keep them exact (a float64 round-trip corrupts
                    # |v| >= 2^53, where the Column path's bigint
                    # comparisons stay exact)
                    bad = _np.zeros(len(raw), dtype=bool)
                    xi = raw.astype(_np.int64)
                else:
                    x = v.to_numpy(dtype="float64", na_value=_np.nan)
                    bad = _np.isnan(x)
                    xi = _np.where(bad, 0, x).astype(_np.int64)
                ids = _np.clip(xi - d["lo"], -1, n)
                ids = _np.where(xi < d["lo"], -1, ids)
                ids = _np.where(xi >= d["hi"], n, ids)
                ids[bad] = n
                return ids.astype(_np.int64)
            x = v.to_numpy(dtype=_np.float64, na_value=_np.nan)
            bad = _np.isnan(x)
            if d["kind"] == "edges":
                edges = _np.asarray(d["edges"], dtype=_np.float64)
                ids = _np.searchsorted(edges, x, side="right").astype(_np.int64) - 1
                ids = _np.minimum(ids, n)
                ids[bad] = n
                return ids
            # linear (optionally pre-transformed): same IEEE ops as the JVM
            if d["pre"] == "log":
                with _np.errstate(divide="ignore", invalid="ignore"):
                    y = _np.log(x)
                bad = bad | (x <= 0.0)
            elif d["pre"] == "sqrt":
                with _np.errstate(invalid="ignore"):
                    y = _np.sqrt(x)
                # sqrt(negative) = NaN: Spark/DuckDB NaN-ordering makes
                # y >= yhi true → overflow; mirror that, don't let the NaN
                # fall through numpy's always-False comparisons into mid
                bad = bad | _np.isnan(y)
            elif d["pre"] == "pow":
                with _np.errstate(invalid="ignore"):
                    y = _np.power(x, d["p"])
                # x < 0 → underflow (the Column path's domain guard):
                # -inf sends it through the y < ylo branch below
                y = _np.where((~bad) & (x < 0.0), -_np.inf, y)
            else:
                y = x
            ylo, yhi = d["ylo"], d["yhi"]
            span = yhi - ylo
            with _np.errstate(invalid="ignore"):
                core = _np.minimum(
                    _np.floor((y - ylo) * float(n) / span), float(n - 1)
                )
            ids = _np.full(x.shape, n, dtype=_np.int64)
            ok = ~bad
            under = ok & (y < ylo)
            over = ok & (y >= yhi)
            mid = ok & ~under & ~over
            ids[under] = -1
            ids[mid] = core[mid].astype(_np.int64)
            ids[bad] = n
            return ids

        def round_half_away(x: "_np.ndarray") -> "_np.ndarray":
            # mirrors Spark/DuckDB ROUND (rint would round half-to-even)
            return _np.where(
                x >= 0, _np.floor(x + 0.5), _np.ceil(x - 0.5)
            ).astype(_np.int64)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = _np.ones(len(pdf), dtype=bool)
            id_arrays = {}
            for c, d, (klo, khi) in plain:
                ids = bucketize(d, pdf[c])
                id_arrays[c + "_bin"] = ids
                mask &= (ids >= klo) & (ids <= khi)
            if not mask.any():
                continue
            data = {g: pdf[g].to_numpy()[mask] for g in gkeys}
            for name, ids in id_arrays.items():
                data[name] = ids[mask].astype(_np.int32)
            if w_name is not None:
                w = pdf[w_name].to_numpy(dtype=_np.float64, na_value=_np.nan)[mask]
                if kernel_int_mode:
                    # null weights contribute 0 ≡ Spark's sum() skipping nulls
                    data["__val"] = _np.where(
                        _np.isnan(w), 0, round_half_away(_np.nan_to_num(w) * scale)
                    )
                else:
                    # raw-double mode: NULL weights arrive as NaN through
                    # Arrow and cannot be told apart from true NaN, so
                    # BOTH are skipped here; the Column path skips NULLs
                    # but lets a true NaN poison the bin sum (IEEE).  Raw
                    # mode never promised cross-path bit-equality — that
                    # is what quantized mode (the default) is for.
                    data["__val"] = _np.nan_to_num(w, nan=0.0)
            else:
                data["__val"] = _np.ones(int(mask.sum()), dtype=_np.int64)
            t = _pd.DataFrame(data)
            # per-batch partial fill: C-speed groupby-sum (the boost-fill analog)
            part = t.groupby(
                list(gkeys) + list(id_arrays.keys()),
                as_index=False, sort=False, dropna=False,
            )["__val"].sum()
            yield part

    partials = narrow.mapInPandas(kernel, out_schema)
    val = F.sum("__val")
    agg = partials.groupBy(*(gkeys + idcols)).agg(val.alias("__val"))
    return finish_from_agg(
        agg, cols, specs, group_by=group_by, flow=flow, density=density,
        storage=storage, int_mode=int_mode, divisor=divisor,
        weighted=weights is not None,
    )
