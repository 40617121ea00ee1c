"""JSONL corpus ingestion/export — the interchange format most text
corpora actually ship in (one JSON object per line, usually gzipped).

Design rules for 100 TB ingestion:

- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a FULL extra pass over the data just to infer types, and
  the inferred schema drifts with corpus content (a shard where every
  ``id`` happens to be small infers INT and overflows later).  The
  schema is a required argument here.
- **PERMISSIVE + captured corrupt records.**  At corpus scale some lines
  are always broken (truncated uploads, encoding damage).  FAILFAST
  would kill a day-long job on row one; DROPMALFORMED silently loses
  data.  Malformed lines land in ``corrupt_col`` with every data column
  explicitly NULLED (PERMISSIVE alone keeps partial parses — see
  ``read_jsonl_corpus``), so ``corrupt_col IS NULL`` is THE trust test.
- JSON decode is JVM-side (no Python), columns prune through the parser,
  and gzip-per-file parallelism is whatever the file layout gives —
  standard corpus sharding (many ~100 MB .jsonl.gz files) parallelises
  perfectly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl_corpus(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export as JSON-lines (Spark's json writer is already line-delimited;
    one file per partition — repartition upstream to control shard size)."""
    df.write.mode(mode).format("json").save(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema; malformed lines are
    kept, with the raw line in ``corrupt_col`` and data columns NULL.

    Spark's PERMISSIVE mode on its own keeps PARTIAL parses for
    type-mismatch lines (``{"doc_id": "x", "text": "hi"}`` yields
    doc_id NULL but text "hi" alongside the corrupt record), which makes
    "corrupt" ambiguous for downstream filters — so this explicitly
    nulls every data column on quarantined rows.  The contract is then
    clean: ``corrupt_col IS NULL`` ⇔ trust the data columns."""
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field"
        )
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    ok = F.col(corrupt_col).isNull()
    return raw.select(
        *[F.when(ok, F.col(f.name)).alias(f.name) for f in schema.fields],
        F.col(corrupt_col),
    )


def corrupt_line_stats(df: DataFrame, corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """One-row quarantine summary: total lines, malformed lines — the
    ingestion health check a pipeline gates on before trusting a shard.

    Spark refuses corrupt-col-only queries on the raw JSON source
    (SPARK-21610: the parser would need a second full pass), and the
    zero-effect-probe tricks constant-fold away — the SUPPORTED pattern
    is materializing the parse first, so this caches ``df`` (Spark's own
    documented workaround).  That is the right cost model for a
    health check: the same cached parse is what the subsequent
    quarantine filter / ingest read consumes, so the parse runs once.
    For a check-only pass over a corpus too large to cache, compare
    ``spark.read.text(path).count()`` against a DROPMALFORMED read
    count instead (two scans, zero cache)."""
    df = df.cache()
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.col(corrupt_col)).alias("n_corrupt"),
    )


def write_csv_corpus(
    df: DataFrame, path: str, mode: str = "error", sep: str = ","
) -> None:
    """Export as headered CSV with RFC-4180 quoting.

    Two non-default options are LOAD-BEARING for losslessness and must
    match the reader's: ``escape='"'`` (Spark's default is backslash
    escaping, which standard CSV tools mis-read; the double-quote escape
    is the RFC form) and ``nullValue='\\N'`` (by default Spark writes
    NULL as an empty field, which reads back indistinguishable from the
    empty STRING — the classic silent NULL/'' conflation)."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("sep", sep)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Read a CSV corpus with an EXPLICIT schema and the same quarantine
    contract as :func:`read_jsonl_corpus`: malformed lines kept with the
    raw line in ``corrupt_col`` and every data column NULLed, so
    ``corrupt_col IS NULL`` ⇔ trust the data columns.

    ``multi_line=False`` (default) keeps the file SPLITTABLE — each
    ~128 MB block parses in parallel.  Only set ``multi_line=True`` when
    fields genuinely contain newlines: Spark must then parse each file
    as one unsplittable unit, so a 100 TB ingest degrades to
    one-task-per-file parallelism (re-shard small or ban embedded
    newlines upstream)."""
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field"
        )
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("header", True)
        .option("sep", sep)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )
    ok = F.col(corrupt_col).isNull()
    return raw.select(
        *[F.when(ok, F.col(f.name)).alias(f.name) for f in schema.fields],
        F.col(corrupt_col),
    )
