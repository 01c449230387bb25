"""Sketch operators — approximate structures whose CONSTRUCTION is
exact and deterministic, so they distribute trivially and oracle-check
bit-for-bit (unlike engine-native HLL sketches, which are
implementation-specific).

Count-min sketch over the document token stream:

* depth 4 × width 256; row hashes are the first hex byte of
  ``md5('<d>:' || token)`` — independent uniform hashes, identical in
  every engine.
* Construction is one grouped count per (depth, bucket) — map-side
  combinable, one shuffle of at most depth×width rows per partition:
  the classic mergeable-summary shape (sketches merge by cell-wise add,
  which is how a 1000-executor build combines partial sketches for
  free).
* Point queries lower-bound nothing and over-count by at most
  n/width per row; taking the min over rows is the CM estimate.

``cms_token_counts`` builds the sketch AND evaluates five fixed probe
tokens against their true counts in one result — construction,
estimation, and error visible to the oracle in a single query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table
from dbdiff_spark.ops.text import _D_TOKENS, _TOKENS

CMS_DEPTH = 4
CMS_WIDTH = 256  # one hex byte

PROBE_TOKENS = ("the", "spark", "table", "row", "zzz-absent")


def _bucket_spark(depth: int, token_col: str) -> str:
    # first hex byte of md5 → 0..255
    return (
        f"CAST(conv(substr(md5(concat('{depth}:', {token_col})), 1, 2), 16, 10) AS INT)"
    )


def _bucket_duck(depth: int, token_col: str) -> str:
    h = f"substr(md5(concat('{depth}:', {token_col})), 1, 2)"
    hi = f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    return f"CAST(16 * {hi} + {lo} AS INT)"


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4×256 count-min sketch of the corpus token stream and
    evaluate the probe tokens: per (token, depth) the sketch cell count,
    the CM estimate (min over depths), and the true count."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.selectExpr(f"explode({_TOKENS}) AS token")
    # sketch cells touched by any probe's buckets; counts come from the
    # FULL stream (that's what makes it a sketch, not a filter)
    cells = None
    for d in range(CMS_DEPTH):
        layer = tokens.selectExpr(
            f"{d} AS depth", f"{_bucket_spark(d, 'token')} AS bucket"
        ).groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cell_count"))
        cells = layer if cells is None else cells.unionByName(layer)
    probes = spark.createDataFrame(
        [(t,) for t in PROBE_TOKENS], "probe_token string"
    )
    probe_cells = None
    for d in range(CMS_DEPTH):
        pl = probes.selectExpr(
            "probe_token",
            f"{d} AS depth",
            f"{_bucket_spark(d, 'probe_token')} AS bucket",
        )
        probe_cells = pl if probe_cells is None else probe_cells.unionByName(pl)
    looked_up = probe_cells.join(cells, on=["depth", "bucket"], how="left").select(
        "probe_token",
        "depth",
        F.coalesce(F.col("cell_count"), F.lit(0)).alias("cell_count"),
    )
    estimates = looked_up.groupBy("probe_token").agg(
        F.min("cell_count").alias("cm_estimate")
    )
    truth = tokens.groupBy(F.col("token").alias("probe_token")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    return estimates.join(truth, on="probe_token", how="left").select(
        "probe_token",
        "cm_estimate",
        F.coalesce(F.col("true_count"), F.lit(0)).alias("true_count"),
    )


def _cms_sql() -> str:
    layers = "\nUNION ALL\n".join(
        f"SELECT {d} AS depth, {_bucket_duck(d, 'token')} AS bucket, "
        f"CAST(count(*) AS BIGINT) AS cell_count FROM tokens GROUP BY 1, 2"
        for d in range(CMS_DEPTH)
    )
    probe_rows = ", ".join(f"('{t}')" for t in PROBE_TOKENS)
    probe_layers = "\nUNION ALL\n".join(
        f"SELECT probe_token, {d} AS depth, {_bucket_duck(d, 'probe_token')} AS bucket FROM probes"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH tokens AS (
  SELECT unnest({_D_TOKENS}) AS token FROM documents
),
cells AS (
  {layers}
),
probes AS (SELECT * FROM (VALUES {probe_rows}) AS v(probe_token)),
probe_cells AS (
  {probe_layers}
),
looked_up AS (
  SELECT probe_token, p.depth, coalesce(cell_count, 0) AS cell_count
  FROM probe_cells p LEFT JOIN cells c ON p.depth = c.depth AND p.bucket = c.bucket
),
estimates AS (
  SELECT probe_token, min(cell_count) AS cm_estimate FROM looked_up GROUP BY probe_token
),
truth AS (
  SELECT token AS probe_token, CAST(count(*) AS BIGINT) AS true_count
  FROM tokens GROUP BY token
)
SELECT e.probe_token, cm_estimate, coalesce(true_count, 0) AS true_count
FROM estimates e LEFT JOIN truth t ON e.probe_token = t.probe_token
"""


CMS_SQL = _cms_sql()

QUERIES = {
    "cms_token_counts": (cms_token_counts, CMS_SQL),
}
