"""Z-order (Morton-curve) clustered storage layout.

Snapshot diffs, incremental re-diffs and analytics all win when a scan
can skip files, and parquet min/max pruning only skips on dimensions the
layout actually clusters.  A linear sort clusters ONE dimension — file
spans on every other column cover the whole domain.  Interleaving the
bits of two bucketized dimensions into a Morton z-value and range-
partitioning on it bounds every file's span on BOTH dimensions, so
predicates on either column (or both) prune files.

Scale shape of the write path (:func:`cluster_by_zorder`):

* one map-side-combinable ``agg(min, max)`` per dimension (a metadata
  read for parquet sources) to fix the scaling,
* a narrow projection computing the z-value,
* ``repartitionByRange(z)`` — Spark samples range boundaries, no global
  sort, no single-partition window — then a within-partition sort so
  parquet row groups inherit the clustering.

Nothing here is driver-resident; the same code lays out 16 files at
sf0.001 or 100k files at 100 TB.

The driver query (:func:`zorder_layout_stats`) demonstrates the
clustering property itself in pure SQL (rank both dimensions, z-
interleave, carve equal-width z-ranges as file surrogates, report each
"file's" per-dimension span) so the DuckDB oracle verifies the curve
math bit-for-bit.  The per-dimension NTILE is computed DISTRIBUTED
(:func:`_exact_ntile`: value-range bucketing + a ≤4096-row offset
table, the same bounded-offset pattern as ``corpus_shuffle_index``) —
bit-identical to the oracle's global NTILE window, without the
corpus-sized single-reducer window that a literal NTILE costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark import testkit
from dbdiff_spark.io import load_table

BITS = 8  # 256 buckets per dimension -> z in [0, 65536)


def _interleave_sql(xv: str, yv: str, bits: int = BITS) -> str:
    """Bit interleave via integer arithmetic only (portable: Spark SQL
    and DuckDB share FLOOR / CAST / %, unlike shift operators)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(FLOOR(({xv}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"(CAST(FLOOR(({yv}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
    return " + ".join(terms)


def zorder_value(
    x: Column, y: Column, x_min, x_max, y_min, y_max, bits: int = BITS
) -> Column:
    """Morton z-value of two numeric columns, scaled into ``bits``-bit
    buckets from their [min, max] ranges."""
    n = 1 << bits

    def bucket(col: Column, lo, hi) -> Column:
        span = float(hi) - float(lo) + 1.0
        return F.least(
            F.floor((col.cast("double") - F.lit(float(lo))) * n / span),
            F.lit(n - 1),
        ).cast("bigint")

    xb, yb = bucket(x, x_min, x_max), bucket(y, y_min, y_max)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + (F.floor(xb / (1 << i)) % 2) * (1 << (2 * i))
            + (F.floor(yb / (1 << i)) % 2) * (1 << (2 * i + 1))
        )
    return z.cast("bigint")


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, num_partitions: int, bits: int = BITS
) -> DataFrame:
    """Return ``df`` re-arranged so a write produces z-clustered files:
    ``repartitionByRange`` on the z-value (sampled boundaries — fully
    distributed) plus a within-partition sort for row-group locality.
    The helper z column is dropped; only the physical order changes."""
    lo_hi = df.agg(
        F.min(x).alias("xlo"), F.max(x).alias("xhi"),
        F.min(y).alias("ylo"), F.max(y).alias("yhi"),
    ).first()
    z = zorder_value(
        F.col(x), F.col(y), lo_hi.xlo, lo_hi.xhi, lo_hi.ylo, lo_hi.yhi, bits
    )
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


# --- driver query: clustering quality report (oracle-checked) --------------

_N_FILES = 32  # z-domain 65536 / 2048


RANGE_BUCKETS = 4096


def _exact_ntile(
    df: DataFrame,
    val: str,
    tiebreak: str,
    n: int,
    total: int,
    out: str,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact distributed ``NTILE(n) OVER (ORDER BY val, tiebreak)``.

    A literal NTILE window has no PARTITION BY, so Spark funnels the
    whole input through ONE reducer — corpus-sized, the single-reducer
    anti-pattern.  Instead: the global rank is derived from value-range
    buckets (rows bucket by ``(val - lo) div width`` — value-aligned,
    so ordering across buckets is preserved), a per-bucket row_number,
    and a running-sum offset table bounded at ``RANGE_BUCKETS`` rows
    (only THAT table crosses one reducer).  The NTILE bucket then falls
    out of the rank arithmetically (first ``total % n`` tiles hold one
    extra row — the standard NTILE split, matching Spark and DuckDB),
    so the result is bit-identical to the window formulation at any
    scale.  Requires a unique (val, tiebreak) total order (ranks must
    be unambiguous) and integral ``val``.
    """
    # ``bounds`` = caller-precomputed (min, max): the three RFM axes
    # (and z-order's two) are independent columns of the SAME input, so
    # one fused agg job replaces one min/max job per axis — and chained
    # calls stop re-evaluating the previous axis's join just to scan
    # an untouched column (r12, guide §1.2: fewer passes)
    lo, hi = bounds if bounds is not None else df.agg(
        F.min(val), F.max(val)
    ).first()
    if lo is None:  # empty input: schema-only result, no rows to rank
        return df.withColumn(out, F.lit(None).cast("bigint"))
    width = max(1, (int(hi) - int(lo)) // RANGE_BUCKETS + 1)
    g = df.withColumn(
        "__gb", ((F.col(val) - F.lit(int(lo))).cast("bigint") / width).cast("bigint")
    )
    from pyspark.sql import Window

    local = F.row_number().over(
        Window.partitionBy("__gb").orderBy(F.col(val), F.col(tiebreak))
    )
    offsets = (
        g.groupBy("__gb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .selectExpr(
            "__gb",
            "coalesce(sum(__n) OVER (ORDER BY __gb"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off",
        )
    )
    q, rem = divmod(total, n)
    thresh = rem * (q + 1)
    rank = F.col("__off") + local

    def iceil(col, d: int):  # exact for ranks < 2^53 (double-exact ints)
        return F.floor((col + (d - 1)) / d).cast("bigint")

    if q == 0:  # fewer rows than tiles: tile == rank
        bucket = rank
    else:
        bucket = F.when(rank <= thresh, iceil(rank, q + 1)).otherwise(
            rem + iceil(rank - thresh, q)
        )
    return (
        g.join(F.broadcast(offsets), "__gb")
        .withColumn(out, bucket.cast("bigint"))
        .drop("__gb", "__off")
    )


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per z-range "file": row count and the span each file covers on
    each dimension — the numbers a pruning planner consumes.  With
    z-ordering both spans stay bounded (~1/sqrt(files) of the domain);
    a linear sort would show span ~= full domain on the second dim."""
    spec = testkit.SPECS["orders"]
    orders = testkit.prep(load_table(spark, sf_dir, "orders"), spec)
    # one fused job for the count and both axes' min/max (r12 — was
    # three sequential scans of the same input)
    s = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_custkey").alias("x_lo"), F.max("o_custkey").alias("x_hi"),
        F.min("o_orderdate").alias("y_lo"), F.max("o_orderdate").alias("y_hi"),
    ).first()
    total = int(s["n"])
    ranked = _exact_ntile(
        _exact_ntile(
            orders, "o_custkey", "o_orderkey", 256, total, "xb",
            bounds=(s["x_lo"], s["x_hi"]),
        ),
        "o_orderdate",
        "o_orderkey",
        256,
        total,
        "yb",
        bounds=(s["y_lo"], s["y_hi"]),
    ).select((F.col("xb") - 1).alias("xb"), (F.col("yb") - 1).alias("yb"))
    z = ranked.select(
        "xb", "yb", F.expr(_interleave_sql("xb", "yb")).alias("z")
    )
    return (
        z.withColumn("file_id", F.expr(f"CAST(FLOOR(z / {65536 // _N_FILES}) AS BIGINT)"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("xb") - F.min("xb")).alias("x_span"),
            (F.max("yb") - F.min("yb")).alias("y_span"),
        )
    )


def _zorder_layout_stats_sql() -> str:
    spec = testkit.SPECS["orders"]
    return f"""
WITH before AS ({testkit._prep_sql(spec)}),
ranked AS (
  SELECT NTILE(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS xb,
         NTILE(256) OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS yb
  FROM before
),
zed AS (SELECT xb, yb, {_interleave_sql("xb", "yb")} AS z FROM ranked)
SELECT CAST(FLOOR(z / {65536 // _N_FILES}) AS BIGINT) AS file_id,
       count(*) AS n_rows,
       MAX(xb) - MIN(xb) AS x_span,
       MAX(yb) - MIN(yb) AS y_span
FROM zed
GROUP BY 1
"""


QUERIES = {
    "zorder_layout_stats": (zorder_layout_stats, _zorder_layout_stats_sql()),
}
