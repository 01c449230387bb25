"""Z-order layout: a clustered write bounds every file's span on BOTH
dimensions, so single-dimension predicates prune files that a linear
sort on the other dimension could never skip."""

import shutil
import tempfile

import pyspark.sql.functions as F

from dbdiff_spark import testkit
from dbdiff_spark.io import load_table
from dbdiff_spark.ops import layout

N_FILES = 16


def _file_stats(spark, path, dims):
    df = spark.read.parquet(path)
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"{d}_min"), F.max(d).alias(f"{d}_max")]
    return (
        df.groupBy(F.col("_metadata.file_path").alias("f")).agg(*aggs).collect()
    )


def _files_hit(stats, dim, lo, hi):
    return sum(
        1 for r in stats if r[f"{dim}_max"] >= lo and r[f"{dim}_min"] <= hi
    )


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    spec = testkit.SPECS["orders"]
    orders = testkit.prep(load_table(spark, sf_dir, "orders"), spec)
    dom = orders.agg(
        F.min("o_custkey").alias("xlo"), F.max("o_custkey").alias("xhi"),
        F.min("o_orderdate").alias("ylo"), F.max("o_orderdate").alias("yhi"),
    ).first()

    zdir = tempfile.mkdtemp(prefix="zorder_")
    ldir = tempfile.mkdtemp(prefix="linear_")
    try:
        layout.cluster_by_zorder(
            orders, "o_custkey", "o_orderdate", N_FILES
        ).write.mode("overwrite").parquet(zdir)
        # baseline: linear sort on custkey only
        orders.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
            "o_custkey"
        ).write.mode("overwrite").parquet(ldir)

        zstats = _file_stats(spark, zdir, ["o_custkey", "o_orderdate"])
        lstats = _file_stats(spark, ldir, ["o_custkey", "o_orderdate"])
        assert len(zstats) == N_FILES and len(lstats) == N_FILES

        # a 10%-of-domain range predicate on EACH dimension
        xw = (dom.xhi - dom.xlo) // 10
        yw = (dom.yhi - dom.ylo) // 10
        x_pred = (dom.xlo + 4 * xw, dom.xlo + 5 * xw)
        y_pred = (dom.ylo + 4 * yw, dom.ylo + 5 * yw)

        # linear layout: custkey prunes hard, orderdate prunes nothing
        assert _files_hit(lstats, "o_custkey", *x_pred) <= 3
        assert _files_hit(lstats, "o_orderdate", *y_pred) >= N_FILES - 1

        # z-order: BOTH dimensions prune.  16 files over a 256x256 grid
        # gives each file a 25-50% span per dimension (z-ranges are not
        # perfect squares), so a 10% slice hits roughly half the files —
        # the win is that the OTHER dimension keeps pruning too, where
        # the linear layout scans everything.
        zx = _files_hit(zstats, "o_custkey", *x_pred)
        zy = _files_hit(zstats, "o_orderdate", *y_pred)
        assert zx <= 11, f"custkey pruning lost: {zx}/{N_FILES}"
        assert zy <= 11, f"orderdate pruning lost: {zy}/{N_FILES}"
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(ldir, ignore_errors=True)


def test_exact_ntile_matches_window_ntile_and_handles_empty(spark):
    """_exact_ntile must be bit-identical to NTILE(n) OVER (ORDER BY
    val, tiebreak) — including the first-tiles-get-the-extra-row split
    when n does not divide the row count — and survive empty input."""
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.layout import _exact_ntile

    df = spark.createDataFrame(
        [(i * 7 % 101, i) for i in range(103)], "v long, id long"
    )
    got = _exact_ntile(df, "v", "id", 8, 103, "tile")
    want = df.select(
        "v", "id", F.expr("ntile(8) OVER (ORDER BY v, id)").alias("tile")
    )
    assert got.select("v", "id", "tile").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("v", "id", "tile")).count() == 0
    # fewer rows than tiles: tile == rank
    small = spark.createDataFrame([(5, 1), (3, 2)], "v long, id long")
    got_small = {
        (r["v"], r["tile"])
        for r in _exact_ntile(small, "v", "id", 8, 2, "tile").collect()
    }
    assert got_small == {(3, 1), (5, 2)}
    empty = spark.createDataFrame([], "v long, id long")
    assert _exact_ntile(empty, "v", "id", 8, 0, "tile").count() == 0
