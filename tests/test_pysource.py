"""Python DataSource API surface (Spark 4): deterministic generated
source, partition-parallel, oracle-parity via pure arithmetic."""

from pyspark.sql import functions as F

from dbdiff_spark.ops.pysource import (
    PYDS_BUCKETS,
    PYDS_ROWS,
    pyds_source_stats,
    _ensure_registered,
)


def test_pyds_totals_conserve_rows(spark, sf_dir):
    out = pyds_source_stats(spark, sf_dir).collect()
    assert sum(r.n_rows for r in out) == PYDS_ROWS
    assert {r.bucket for r in out} <= set(range(PYDS_BUCKETS))
    assert min(r.first_row for r in out) == 0


def test_pyds_reader_partitions_cover_disjointly(spark, sf_dir):
    """The custom reader's range partitions must tile [0, rows) with no
    overlap — row_id is unique and dense."""
    _ensure_registered(spark)
    src = (
        spark.read.format("dbdiff_synth")
        .option("rows", 1000).option("partitions", 7).load()
    )
    stats = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("row_id").alias("nd"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
    ).collect()[0]
    assert (stats.n, stats.nd, stats.lo, stats.hi) == (1000, 1000, 0, 999)
