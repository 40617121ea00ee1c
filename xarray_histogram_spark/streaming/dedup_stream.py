"""Streaming deduplication: content-fingerprint state over a document stream.

A 100 TB ingestion pipeline dedups INCREMENTALLY — a new batch must be
checked against everything already ingested without rescanning it.  Two
streaming shapes cover this:

- ``streaming_dedup_state``: a stateful fingerprint aggregation
  (``groupBy(md5(text)).agg(count, min(id))``).  The state is one row per
  DISTINCT fingerprint (count + keeper id) — far smaller than the corpus —
  and both aggregates are order/arrival-independent, so the converged
  result is deterministic and equals the batch oracle exactly: the gated
  query runs this as a REAL multi-micro-batch streaming execution and
  hash-compares the final state.
- ``streaming_drop_duplicates``: pass-through filtering
  (``dropDuplicatesWithinWatermark`` on the fingerprint): emits the FIRST
  arrival per fingerprint inside the watermark horizon and drops later
  ones; which duplicate survives depends on arrival order, so it is
  checked structurally (rows-only), not by value hash.

Scale notes: the only shuffle is the hash partition on the fingerprint
(uniform by construction — md5); state store size is |distinct docs| rows
for the aggregation, watermark-bounded for the pass-through variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H


def fingerprint_col(text: F.Column) -> F.Column:
    """Content fingerprint — THE canonical md5 text fingerprint
    (functions.hashing.md5_hex), shared with the batch curation pipeline
    so batch and streaming dedup agree byte-for-byte."""
    return H.md5_hex(text)


def streaming_dedup_state(
    sdf: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Duplicate-group state per content fingerprint: (fp, n_dups,
    keep_id=min id).  Works identically on batch and streaming input
    (streaming: complete/update mode, state = one row per distinct fp);
    count and min are arrival-order independent, so the converged
    streaming state is bit-equal to the batch aggregate.
    """
    return (
        sdf.select(
            fingerprint_col(F.col(text_col)).alias("fp"),
            F.col(id_col).cast("bigint").alias("__id"),
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("__id").alias("keep_id"),
        )
    )


def streaming_dedup_state_sql(table: str, text_expr: str, id_expr: str) -> str:
    """DuckDB mirror of ``streaming_dedup_state``'s converged state."""
    return (
        f"SELECT md5({text_expr}) AS fp, COUNT(*) AS n_dups, "
        f"CAST(MIN({id_expr}) AS BIGINT) AS keep_id FROM {table} "
        f"GROUP BY md5({text_expr})"
    )


def streaming_drop_duplicates(
    sdf: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival pass-through dedup: keep one row per fingerprint
    within the watermark horizon (``dropDuplicatesWithinWatermark`` —
    state evicts as the watermark advances, so unbounded streams stay
    bounded).  Batch input falls back to plain ``dropDuplicates``."""
    with_fp = sdf.withColumn("__fp", fingerprint_col(F.col(text_col)))
    if not sdf.isStreaming:
        return with_fp.dropDuplicates(["__fp"]).drop("__fp")
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
