"""DuckDB oracle-SQL generation mirroring the Spark histogram planner.

The driver's correctness gate runs each Spark query AND an ANSI-SQL oracle in
DuckDB side-by-side and hash-compares values.  Floating-point results only
hash-match if both engines execute the *same IEEE-754 operations in the same
order*, so this module generates SQL from the very same BinSpec objects the
Spark planner compiles, mirroring:

- the bucketize arithmetic (``BinSpec.raw_id_sql`` — identical literals via
  ``repr``, identical op order, no runtime transcendentals on the exact path);
- DECIMAL(38,10)-routed weighted sums (order-independent exact addition —
  a distributed Spark sum and a DuckDB sum otherwise disagree in the last
  ulps because double addition is not associative);
- the dense spine join with groups derived from the aggregated output;
- the density window (flow-excluded total, flow cells untouched).

Spine VALUES literals are explicitly CAST — DuckDB parses ``0.5`` as DECIMAL,
which would silently change the column type vs Spark's DOUBLE.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .binspec import BinSpec, flit
from .plans.histogram import id_col, label_col, value_col_name

_LABEL_SQL_TYPE = {"double": "DOUBLE", "bigint": "BIGINT", "string": "VARCHAR"}


def _spine_values(var: str, spec: BinSpec, flow: bool) -> str:
    rows = []
    for b in spec.bins(flow):
        if spec.label_type == "double":
            lab = f"CAST({flit(b.label)} AS DOUBLE)"
        elif spec.label_type == "bigint":
            lab = f"CAST({int(b.label)} AS BIGINT)"
        else:
            lab = spec.label_sql_lit(b.label)
        rows.append(
            f"({b.id}, {lab}, CAST({flit(b.width)} AS DOUBLE), {'TRUE' if b.is_flow else 'FALSE'})"
        )
    cols = f"{id_col(var)}, {label_col(var)}, __{var}_width, __{var}_is_flow"
    return f"(VALUES {', '.join(rows)}) AS sp_{var}({cols})"


def histogram_oracle_sql(
    table: str,
    cols: Sequence[str],
    specs: Sequence[BinSpec],
    *,
    weights: Optional[str] = None,
    density: bool = False,
    group_by: Sequence[str] = (),
    group_exprs: Optional[dict] = None,
    flow: bool = False,
    storage: str = "double",
    exact_sums: bool = True,
    where: Optional[str] = None,
    value_name: Optional[str] = None,
) -> str:
    """DuckDB SQL equivalent of ``plans.histogram.histogramdd``.

    ``group_exprs`` maps a group column name to the SQL expression computing
    it (for Spark-side ``withColumn`` groups like a truncated date); plain
    table columns need no entry.  ``where`` mirrors any pre-filter the Spark
    side applied to the input DataFrame.
    """
    cols = list(cols)
    specs = list(specs)
    group_by = list(group_by)
    group_exprs = dict(group_exprs or {})
    vname = value_name or value_col_name(cols, density)

    gsel = ", ".join(
        f"{group_exprs.get(g, g)} AS {g}" for g in group_by
    )
    idsel = ", ".join(
        f"{s.raw_id_sql(c)} AS {id_col(c)}" for c, s in zip(cols, specs)
    )
    wsel = f", {weights} AS __w" if weights is not None else ""
    inner = f"SELECT {gsel + ', ' if gsel else ''}{idsel}{wsel} FROM {table}"
    if where:
        inner += f" WHERE {where}"
    keeps = []
    for c, s in zip(cols, specs):
        lo, hi = s.keep_range(flow)
        keeps.append(f"{id_col(c)} BETWEEN {lo} AND {hi}")
    base = f"SELECT * FROM ({inner}) AS raw WHERE {' AND '.join(keeps)}"

    if weights is not None:
        val = (
            "CAST(SUM(CAST(__w AS DECIMAL(38,10))) AS DOUBLE)"
            if exact_sums
            else "SUM(CAST(__w AS DOUBLE))"
        )
        zero = "CAST(0.0 AS DOUBLE)"
    elif storage == "int64":
        val, zero = "CAST(COUNT(*) AS BIGINT)", "CAST(0 AS BIGINT)"
    else:
        val, zero = "CAST(COUNT(*) AS DOUBLE)", "CAST(0.0 AS DOUBLE)"
    keys = group_by + [id_col(c) for c in cols]
    agg = (
        f"SELECT {', '.join(keys)}, {val} AS __val FROM base "
        f"GROUP BY {', '.join(keys)}"
    )

    spine = " CROSS JOIN ".join(_spine_values(c, s, flow) for c, s in zip(cols, specs))
    if group_by:
        grp = f"SELECT DISTINCT {', '.join(group_by)} FROM agg"
        dense = f"SELECT * FROM grp CROSS JOIN ({f'SELECT * FROM {spine}'}) AS spine"
    else:
        dense = f"SELECT * FROM {spine}"

    join_conds = [
        f"d.{g} IS NOT DISTINCT FROM a.{g}" for g in group_by
    ] + [f"d.{id_col(c)} = a.{id_col(c)}" for c in cols]
    filled_sel = (
        [f"d.{g} AS {g}" for g in group_by]
        + [f"d.{id_col(c)} AS {id_col(c)}" for c in cols]
        + [f"d.{label_col(c)} AS {label_col(c)}" for c in cols]
        + [f"COALESCE(a.__val, {zero}) AS __val"]
        + [f"d.__{c}_width AS __{c}_width" for c in cols]
        + [f"d.__{c}_is_flow AS __{c}_is_flow" for c in cols]
    )
    filled = (
        f"SELECT {', '.join(filled_sel)} FROM dense d LEFT JOIN agg a "
        f"ON {' AND '.join(join_conds)}"
    )

    out_cols = (
        [g for g in group_by]
        + [id_col(c) for c in cols]
        + [label_col(c) for c in cols]
    )
    if density:
        any_flow = " OR ".join(f"__{c}_is_flow" for c in cols)
        area = " * ".join(f"__{c}_width" for c in cols)
        part = f"PARTITION BY {', '.join(group_by)}" if group_by else ""
        total = (
            f"SUM(CASE WHEN {any_flow} THEN CAST(0.0 AS DOUBLE) ELSE __val END) "
            f"OVER ({part})"
        )
        vexpr = (
            f"CASE WHEN {any_flow} THEN __val "
            f"ELSE __val / ({area}) / NULLIF({total}, CAST(0.0 AS DOUBLE)) END"
        )
    else:
        vexpr = "__val"
    final = f"SELECT {', '.join(out_cols)}, {vexpr} AS {vname} FROM filled"

    ctes = [f"base AS ({base})", f"agg AS ({agg})"]
    if group_by:
        ctes.append(f"grp AS ({grp})")
    ctes.append(f"dense AS ({dense})")
    ctes.append(f"filled AS ({filled})")
    return "WITH " + ", ".join(ctes) + " " + final
