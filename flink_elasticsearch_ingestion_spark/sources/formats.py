"""File-format connectors beyond parquet: JSON-lines and CSV.

The reference's documents ARE JSON (the emitter JSON-encodes every
record body before indexing, core.clj:59-60), so JSON-lines is the
natural file analog of its ES document stream — an export of the same
bytes the bulk sink would send. CSV covers the interchange format every
ingestion edge eventually meets.

Scale rules encoded here:
- **Schemas are explicit.** ``inferSchema``/sampling reads the whole
  input once before the real job — a full extra pass at 100 TB. Every
  reader takes a schema (or a DDL string); the documents/events tables
  get theirs from the engine's canonical shapes.
- **JSONL/CSV are ingestion edges, not working storage.** Both are
  row-major text: no column pruning, no predicate pushdown, no row-group
  statistics. ``to_parquet_layout`` is the one-pass conversion into the
  engine's working format; run queries against THAT.
- PERMISSIVE parse mode with a ``_corrupt_record`` column keeps bad
  rows visible (count them with ``corrupt_count``) instead of failing
  the whole 100 TB job on one malformed line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical document-export schema: what the reference's sink emits
#: (doc_id + target index + JSON-encoded source body)
DOC_EXPORT_SCHEMA = "doc_id string, index_id string, source string"

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str, *, keep_corrupt: bool = True
) -> DataFrame:
    """JSON-lines reader with an explicit schema (no inference pass).

    One task per file split — JSONL is splittable on newlines, so a
    large export still fans out across the cluster; compression should
    be a splittable codec (or many files) for that to hold.
    """
    full_schema = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    reader = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Write as JSON-lines (one object per line, file-per-partition —
    writers never funnel through one node)."""
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    keep_corrupt: bool = True,
) -> DataFrame:
    """CSV reader with explicit schema; PERMISSIVE + corrupt-record
    column, header validated against the schema rather than trusted."""
    full_schema = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    return (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).csv(path)


def corrupt_count(df: DataFrame) -> int:
    """How many rows failed to parse (PERMISSIVE mode keeps them).

    Spark refuses raw-file scans whose referenced columns are ONLY the
    internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    column pruning would otherwise skip the very parse that populates
    it), and its documented recipe is to cache the parsed frame first.
    That cache is also what an ingestion audit wants anyway: parse
    once, then both count the rejects and convert the clean rows
    (``to_parquet_layout``) from the same materialized parse.
    """
    if CORRUPT_COL not in df.columns:
        return 0
    cached_here = not df.is_cached
    if cached_here:
        df = df.cache()
    try:
        row = df.agg(
            F.sum(F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)).alias("n")
        ).first()
        return int(row["n"] or 0)
    finally:
        if cached_here:
            df.unpersist()


def drop_corrupt(df: DataFrame) -> DataFrame:
    """Clean rows only. Cached for the same reason as ``corrupt_count``:
    a count()/agg over the filtered frame would otherwise prune the scan
    down to the corrupt column alone, which Spark rejects on raw files.

    Cache ownership: if the caller already cached the frame (the
    audit+convert pair should — see ``audit_and_convert``) no second
    cache is taken; otherwise the cache taken here lives until the
    caller unpersists or LRU evicts, because the returned frame still
    reads through it."""
    if CORRUPT_COL not in df.columns:
        return df
    if not df.is_cached:
        df = df.cache()
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def audit_and_convert(df: DataFrame, path: str, *, mode: str = "overwrite") -> int:
    """The one-cache ingestion edge: parse once (single cache), count the
    rejects, convert the clean rows to parquet, unpersist. Returns the
    corrupt-row count. Prefer this over separate ``corrupt_count`` +
    ``to_parquet_layout`` calls, which would otherwise cache the parse
    twice under two plan identities and leak both."""
    if CORRUPT_COL not in df.columns:
        df.write.mode(mode).parquet(path)
        return 0
    df = df.cache()
    try:
        n_bad = corrupt_count(df)
        df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL).write.mode(
            mode
        ).parquet(path)
        return n_bad
    finally:
        df.unpersist()


def export_documents_jsonl(documents: DataFrame, path: str) -> None:
    """Export shaped documents (doc_id, index_id, source) as JSONL —
    byte-parity with what the reference's bulk emitter would send to
    ES, one action object per line."""
    write_jsonl(documents.select("doc_id", "index_id", "source"), path)


def import_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a document export back; corrupt lines surface in
    ``_corrupt_record`` rather than killing the job."""
    return read_jsonl(spark, path, DOC_EXPORT_SCHEMA)


def to_parquet_layout(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """One-pass conversion of an ingestion-edge frame into the engine's
    working format (parquet: columnar pruning + pushdown + stats).
    Cache-neutral: the parse cache lives only for the write."""
    audit_and_convert(df, path, mode=mode)


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: ``mergeSchema`` unions
    every file's schema, so rows written before a column existed read
    as null for it. Cost model at 100 TB: one footer read per file at
    planning time — bound it with partition pruning, or freeze the
    union into an explicit contract (``cast_to_contract``) once the
    schema settles."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def cast_to_contract(df: DataFrame, ddl: str) -> DataFrame:
    """Align any frame to a target schema contract: missing columns
    materialize as typed nulls, present columns cast to the contract
    type, extra columns drop. The enforcement step between a
    schema-drifting ingestion edge and the engine's typed tables —
    pure projection, no shuffle, and the SAME projection every batch
    regardless of which drift variant produced it."""
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(ddl)
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC export (file-per-partition, zlib default): the columnar
    interchange format Hive/Trino deployments expect alongside parquet.
    Same layout discipline as ``to_parquet_layout``."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader. ORC carries its own schema and (like parquet)
    supports predicate pushdown + column pruning in Spark's vectorized
    reader, so downstream plans keep the same PushedFilters/ReadSchema
    shape the parquet edges are plan-audited for."""
    return spark.read.orc(path)
