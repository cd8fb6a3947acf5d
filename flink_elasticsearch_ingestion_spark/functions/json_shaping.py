"""JSON document shaping.

The reference JSON-encodes each record body at the sink
(json/json-str, core.clj:59-60) and hands ES arbitrary nested JSON.
Spark-side: ``to_json(struct(...))`` for encode, ``from_json`` /
``get_json_object`` for decode — all codegen'd built-ins. Schema
inference for fully-dynamic bodies via ``schema_of_json`` on a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_body(df: DataFrame, body_cols: tuple[str, ...], out_col: str = "source") -> DataFrame:
    """Pack body columns into one JSON string column (the emitter's
    json/json-str step, core.clj:59-60)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in body_cols])))


def decode_body(df: DataFrame, json_col: str, schema: str, out_col: str = "body") -> DataFrame:
    """Parse a JSON string column with an explicit schema (DDL string)."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), schema))


def json_get(df: DataFrame, json_col: str, path: str, out_col: str) -> DataFrame:
    """Extract a single JSON path without full parsing."""
    return df.withColumn(out_col, F.get_json_object(F.col(json_col), path))


def infer_body_schema(df: DataFrame, json_col: str) -> str:
    """Infer a DDL schema from one sample body (driver-side, one row)."""
    sample = df.select(json_col).filter(F.col(json_col).isNotNull()).first()
    if sample is None:
        raise ValueError(f"no non-null rows in {json_col!r}")
    spark = df.sparkSession
    return spark.range(1).select(
        F.schema_of_json(F.lit(sample[0])).alias("s")
    ).first()["s"]
