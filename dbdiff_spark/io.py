"""Table loaders for the driver-generated testdata (TESTDATA.md) and
generic Parquet sources.

One quirk: ``events.ts`` is written as parquet ``TIMESTAMP(NANOS)``,
which Spark reads only as an epoch-nanos BIGINT
(``spark.sql.legacy.parquet.nanosAsLong=true`` — set by
:func:`dbdiff_spark.session.get_spark`).  ``load_table`` converts it to a
proper microsecond TimestampType so downstream operators see a timestamp,
matching what DuckDB/pyarrow readers see (ns truncated toward -inf to µs).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as parquet TIMESTAMP(NANOS) per table (read back as long).
_NANOS_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            # floor-div matches DuckDB/pyarrow ns→µs truncation
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
