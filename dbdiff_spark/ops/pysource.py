"""Python DataSource API coverage (Spark 4's ``pyspark.sql.datasource``)
— the engine's "bring your own source" surface, sibling to the JDBC and
file catalogs in ``dbdiff_spark.catalog``.

``SyntheticEventsDataSource`` is a deterministic generated table: row i
carries ``bucket`` and ``amount`` derived from ``md5(str(i))`` — pure
arithmetic, no files, so the SAME rows are derivable in DuckDB from
``generate_series`` and the query over the custom source oracle-checks
bit-for-bit like every other registry entry.

Scale shape: the reader exposes ``partitions()`` as contiguous row
ranges, so Spark schedules one task per range and generation is
embarrassingly parallel — the same contract a real external source
(REST shards, message-queue offsets, key ranges) would implement.  The
md5 derivation is in Python (this API's readers run Python-side by
design); the downstream aggregate is JVM expressions.

Reference parity note: the reference tool reads only JDBC sources
(`dbutil.go`); this demonstrates the Spark-idiomatic extension point a
user would implement to diff a NON-JDBC system (the catalog/snapshot
machinery consumes any DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PYDS_ROWS = 50_000
PYDS_PARTITIONS = 16
PYDS_BUCKETS = 16


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("dbdiff_synth").option("rows", N)`` — a
    deterministic generated table of (row_id, bucket, amount)."""

    @classmethod
    def name(cls) -> str:
        return "dbdiff_synth"

    def schema(self) -> str:
        return "row_id bigint, bucket int, amount bigint"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticReader(self.options)


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", PYDS_ROWS))
        self.parts = int(options.get("partitions", PYDS_PARTITIONS))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        import hashlib

        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, int(h[:2], 16) % PYDS_BUCKETS, int(h[2:6], 16))


def _ensure_registered(spark: SparkSession) -> None:
    # registration is session-global and idempotent-by-overwrite; the
    # except guards older sessions where re-register raises
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass


def pyds_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket row counts and amount sums over the custom Python
    data source (fixed ``PYDS_ROWS`` rows — the source is generated,
    not file-backed, so ``sf_dir`` is unused)."""
    _ensure_registered(spark)
    src = (
        spark.read.format("dbdiff_synth")
        .option("rows", PYDS_ROWS)
        .option("partitions", PYDS_PARTITIONS)
        .load()
    )
    return (
        src.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("amount").cast("bigint").alias("total_amount"),
            F.min("row_id").cast("bigint").alias("first_row"),
        )
    )


PYDS_SOURCE_SQL = f"""
WITH gen AS (
  SELECT i AS row_id, md5(CAST(i AS VARCHAR)) AS h
  FROM generate_series(0, {PYDS_ROWS - 1}) AS t(i)
),
rows_ AS (
  SELECT row_id,
         CAST(('0x' || substr(h, 1, 2))::INT % {PYDS_BUCKETS} AS INT) AS bucket,
         CAST(('0x' || substr(h, 3, 4))::INT AS BIGINT) AS amount
  FROM gen
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(amount) AS BIGINT) AS total_amount,
       CAST(min(row_id) AS BIGINT) AS first_row
FROM rows_ GROUP BY bucket
"""


QUERIES = {
    "pyds_source_stats": (pyds_source_stats, PYDS_SOURCE_SQL),
}
