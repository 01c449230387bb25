"""MV maintenance law: folding a diff's signed deltas into a stored
SUM/COUNT view is row-for-row identical to recomputing the view over the
after snapshot — including group birth (insert into a new date bucket),
group death (all rows of a group deleted), and group migration (an
UPDATED row whose group key changed)."""

import pyspark.sql.functions as F

from dbdiff_spark import testkit
from dbdiff_spark.diff import DiffMode, diff_tables
from dbdiff_spark.io import load_table
from dbdiff_spark.ops import incremental


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_mv_equals_recompute(spark, sf_dir):
    maintained = incremental.mv_maintain_orders(spark, sf_dir)
    spec, mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    base = testkit.prep(load_table(spark, sf_dir, "orders"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    recomputed = incremental._orders_mv(after)
    assert _rows(maintained) == _rows(recomputed)
    # the mutation must actually exercise the interesting transitions
    assert maintained.count() > 0


def test_group_birth_death_and_migration(spark):
    base = spark.createDataFrame(
        [
            # group g1: two rows; g2: one row (will die); g3 row migrates
            (1, "g1", 100),
            (2, "g1", 200),
            (3, "g2", 300),
            (4, "g3", 400),
        ],
        "id int, grp string, amount_cents long",
    )
    after = spark.createDataFrame(
        [
            (1, "g1", 150),   # in-place update
            (2, "g1", 200),   # untouched
            (4, "g4", 400),   # migrated g3 -> g4 (group birth + death)
            (5, "g5", 500),   # brand-new group
        ],
        "id int, grp string, amount_cents long",
    )
    mv = base.groupBy("grp").agg(
        F.sum("amount_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    d = diff_tables(base, after, ["id"], mode=DiffMode.TYPED)
    maintained = incremental.maintain_aggregate(
        mv,
        d.df,
        group_cols={"grp": F.col("grp")},
        measures={"total_cents": F.col("amount_cents")},
    )
    expected = after.groupBy("grp").agg(
        F.sum("amount_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    assert _rows(maintained) == _rows(expected)
    grps = {r.grp for r in maintained.collect()}
    assert "g2" not in grps and "g3" not in grps  # deaths pruned
    assert {"g4", "g5"} <= grps  # births appear
