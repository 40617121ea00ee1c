"""Histogram-derived distribution statistics as Spark window/fold queries.

Reference parity: the accessor's scipy ``rv_histogram``-backed statistics
(/root/reference/src/xarray_histogram/accessor.py:397-573): mean/var/std/
moment are moments of the piecewise-uniform distribution (the width²/12 term
in the variance is the within-bin uniform contribution, matching continuous
``rv_histogram``); cdf/ppf/median/interval are the piecewise-linear CDF and
its inverse.  Flow bins are stripped first (accessor.py:415-417); the other
histogram variables and any group keys act as the "loop dims" the statistic
is vectorised over (accessor.py:428-437) — here simply extra grouping keys.

Determinism design (the oracle hash-compares floats bit-for-bit):
- cdf/ppf run on the exact-int64 ``__val`` representation: running and total
  sums are integer (order-independent); only the final interpolation is
  double arithmetic on int64→double casts — identical in Spark and DuckDB.
- moments need Σ mass·f(center) over non-integer doubles, where sum order
  matters.  Each group's (tiny, dense) bin list is collected, sorted by bin
  id, and folded sequentially with an explicit 0.0 seed — a strict
  left-to-right reduction that DuckDB mirrors with
  ``list_reduce(list_prepend(0.0, list_transform(...)))``.  Per-group lists
  are ≤ axis extent (hundreds), so collect_list here is cheap and stays
  fully distributed across groups.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..binspec import IntCategory, StrCategory
from .histogram import axis_meta_exprs, id_col, label_col
from .result import HistogramResult


def _prep(result: HistogramResult, variable: Optional[str]):
    """Strip flow rows (all variables), resolve target var + partition keys.

    When the result still carries its sparse pre-dense aggregate
    (``_sparse``: group keys + bin ids + ``__val``), the statistic reads
    THAT instead of the densely-filled ``_df``: zero-mass bins contribute
    exactly nothing to any statistic here (integer cumulative/total sums
    are unchanged; a ``0·x`` term cannot change an IEEE fold), so the
    dense-fill stages — the grouped pack-map aggregation + spine expansion
    — drop out of the statistic's plan entirely.  The target variable's
    label/width/center attach as O(1) literal-array lookups on the bin id
    (same doubles the dense path carries, from the same BinSpec)."""
    v = result._one_var(variable)
    spec = result.specs[v]
    if isinstance(spec, (IntCategory, StrCategory)):
        raise ValueError(f"statistics need an interval axis, {v!r} is categorical")
    df = result._sparse if result._sparse is not None else result._df
    # core-bin filter FIRST (accessor.py:415-417 flow strip); on the sparse
    # path it also guards the literal-array meta lookup below
    for c in result.variables:
        n = result.specs[c].n
        df = df.where(F.col(id_col(c)).between(F.lit(0), F.lit(n - 1)))
    if result._sparse is not None:
        df = df.selectExpr("*", *axis_meta_exprs(v, spec, False))
    part = result.group_by + [id_col(c) for c in result.variables if c != v]
    return v, part, df


def _fold(arr: Column, term) -> Column:
    """Strict sequential left fold with 0.0 seed — deterministic sum order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + term(x))


def _moment_fold_df(result: HistogramResult, variable: Optional[str]):
    v, part, df = _prep(result, variable)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(id_col(v)).alias("i"),
                F.col("__val").cast("double").alias("m"),
                F.col(f"__{v}_center").alias("c"),
                F.col(f"__{v}_width").alias("w"),
            )
        )
    )
    g = df.groupBy(*part).agg(arr.alias("__a"))
    return v, part, g


def _ratio(num: Column, tot: Column) -> Column:
    return num / F.nullif(tot, F.lit(0.0))


def mean(result: HistogramResult, variable: Optional[str] = None) -> DataFrame:
    """Distribution mean Σ mass·center (accessor.py:473-484)."""
    v, part, g = _moment_fold_df(result, variable)
    a = F.col("__a")
    tot = _fold(a, lambda x: x["m"])
    num = _fold(a, lambda x: x["m"] * x["c"])
    return g.select(*part, _ratio(num, tot).alias(f"{v}_mean"))


def _var_expr(a) -> "F.Column":
    """Σ mass·(c² + w²/12)/Σmass − mean² — shared by var and std so the
    piecewise-uniform formula lives in exactly one place."""
    tot = _fold(a, lambda x: x["m"])
    e1 = _ratio(_fold(a, lambda x: x["m"] * x["c"]), tot)
    e2 = _ratio(
        _fold(a, lambda x: x["m"] * (x["c"] * x["c"] + x["w"] * x["w"] / F.lit(12.0))),
        tot,
    )
    return e2 - e1 * e1


def var(result: HistogramResult, variable: Optional[str] = None) -> DataFrame:
    """Variance of the piecewise-uniform distribution:
    Σ mass·(c² + w²/12) − mean²  (accessor.py:501-512)."""
    v, part, g = _moment_fold_df(result, variable)
    return g.select(*part, _var_expr(F.col("__a")).alias(f"{v}_var"))


def std(result: HistogramResult, variable: Optional[str] = None) -> DataFrame:
    """Standard deviation (accessor.py:514-525)."""
    v, part, g = _moment_fold_df(result, variable)
    return g.select(*part, F.sqrt(_var_expr(F.col("__a"))).alias(f"{v}_std"))


def moment(
    result: HistogramResult, order: int, variable: Optional[str] = None
) -> DataFrame:
    """Raw n-th moment Σ mass·centerⁿ (accessor.py:527-540; bin-center
    approximation, within the reference's half-bin-width test tolerance)."""
    if order < 1:
        raise ValueError("order must be >= 1")
    v, part, g = _moment_fold_df(result, variable)
    a = F.col("__a")
    tot = _fold(a, lambda x: x["m"])

    def powk(x):
        e = x["c"]
        for _ in range(order - 1):
            e = e * x["c"]
        return x["m"] * e

    num = _fold(a, powk)
    return g.select(*part, _ratio(num, tot).alias(f"{v}_moment{order}"))


def _cum_df(result: HistogramResult, variable: Optional[str]):
    v, part, df = _prep(result, variable)
    word = Window.partitionBy(*part).orderBy(id_col(v))
    wpart = Window.partitionBy(*part)
    cum = F.sum("__val").over(word)
    tot = F.sum("__val").over(wpart)
    df = df.select(
        *part,
        F.col(id_col(v)),
        F.col(label_col(v)).cast("double").alias("__left"),
        F.col(f"__{v}_width").alias("__w"),
        F.col("__val"),
        cum.alias("__cum"),
        tot.alias("__tot"),
    )
    return v, part, df


def ppf(
    result: HistogramResult,
    q,
    variable: Optional[str] = None,
    names: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Percent-point (inverse CDF) by piecewise-linear interpolation within
    the bracketing bin (accessor.py:443-458).  ``q`` may be a float or a list
    of floats (one output column each).  All running sums are exact int64;
    only the final interpolation is float."""
    qs = [q] if isinstance(q, (int, float)) else list(q)
    for qq in qs:
        if not (0.0 < qq < 1.0):
            raise ValueError("q must be in (0, 1)")
    v, part, df = _cum_df(result, variable)
    names = list(names) if names else [
        f"{v}_ppf" if len(qs) == 1 else f"{v}_ppf_{i}" for i, _ in enumerate(qs)
    ]
    sels = []
    for name, qq in zip(names, qs):
        qt = F.lit(float(qq)) * F.col("__tot").cast("double")
        cumb = (F.col("__cum") - F.col("__val")).cast("double")
        cross = (F.col("__cum").cast("double") >= qt) & (cumb < qt)
        interp = (
            F.col("__left")
            + (qt - cumb) / F.col("__val").cast("double") * F.col("__w")
        )
        sels.append(F.max(F.when(cross, interp)).alias(name))
    return df.groupBy(*part).agg(*sels)


def median(result: HistogramResult, variable: Optional[str] = None) -> DataFrame:
    """ppf(0.5) (accessor.py:460-471)."""
    v = result._one_var(variable)
    return ppf(result, 0.5, variable, names=[f"{v}_median"])


def interval(
    result: HistogramResult, confidence: float, variable: Optional[str] = None
) -> DataFrame:
    """Equal-tailed confidence interval [ppf(α), ppf(1−α)], α=(1−conf)/2
    (accessor.py:542-573)."""
    if not (0.0 < confidence < 1.0):
        raise ValueError("confidence must be in (0, 1)")
    v = result._one_var(variable)
    alpha = (1.0 - confidence) / 2.0
    return ppf(
        result, [alpha, 1.0 - alpha], variable, names=[f"{v}_low", f"{v}_high"]
    )


def cdf(result: HistogramResult, x: float, variable: Optional[str] = None) -> DataFrame:
    """CDF at scalar ``x``: mass below the bracketing bin plus the linear
    within-bin fraction (accessor.py:486-499).  The bracketing bin and the
    fraction are resolved Python-side from the BinSpec (x is a literal)."""
    v, part, df = _prep(result, variable)
    spec = result.specs[v]
    bins = spec.core_bins()
    x = float(x)
    if math.isnan(x):
        # NaN passes neither range guard and would fall through to a bare
        # StopIteration from the bin search
        raise ValueError("cdf: x must not be NaN")
    if x < bins[0].left:
        j, frac = -1, 0.0
    elif x >= bins[-1].right:
        j, frac = spec.n, 0.0
    else:
        j = next(i for i, b in enumerate(bins) if b.left <= x < b.right)
        b = bins[j]
        frac = (x - b.left) / (b.right - b.left)
    below = F.sum(
        F.when(F.col(id_col(v)) < F.lit(j), F.col("__val")).otherwise(F.lit(0))
    )
    at = F.sum(
        F.when(F.col(id_col(v)) == F.lit(j), F.col("__val")).otherwise(F.lit(0))
    )
    tot = F.sum(F.col("__val"))
    expr = (
        below.cast("double") + at.cast("double") * F.lit(frac)
    ) / F.nullif(tot.cast("double"), F.lit(0.0))
    return df.groupBy(*part).agg(expr.alias(f"{v}_cdf"))
