"""Planted-skew posture of the diff tier (VERDICT r8 #5).

Two pinned facts:

* every non-unique-key diff shape routes through GROUPED aggregation —
  a planted hot key holding 50% of the table is collapsed by map-side
  partial combine, never window-serialized into one task;
* AQE's skew-join split fires for inner/left/right sort-merge joins but
  NOT for a FULL OUTER join (splitting a FOJ side would duplicate
  unmatched rows) — measured here so the diff.py scale notes stay
  honest, and so a future Spark that learns FOJ skew-split shows up as
  a test failure inviting the claim to be upgraded.
"""

from pyspark.sql import functions as F

from dbdiff_spark.diff import DiffMode, UPDATED, diff_tables


def _hot_key_frames(spark):
    """Coarse-keyed frame where key 7 holds half the table (5k rows)
    and 100 unique cold keys hold the rest; after-side changes exactly
    one cold key's payload."""
    base = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(1000 + F.col("id"))
        .alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") % 97).cast("long").alias("v"),
    )
    after = base.withColumn(
        "v", F.when(F.col("k") == 1001, F.col("v") + 100).otherwise(F.col("v"))
    )
    return base, after


def test_grouped_dedup_absorbs_planted_hot_key(spark):
    """Coarse-key diff with dedup_keys under a 50%-hot key must take
    the grouped form: no Window in the plan (a window would serialize
    the 5k-row hot group into one task at any scale), one union-shuffle
    aggregation, and the hot key must not leak spurious diff rows —
    only the genuinely-changed cold key reports."""
    base, after = _hot_key_frames(spark)
    res = diff_tables(
        base, after, ["k"], mode=DiffMode.TYPED, dedup_keys=True
    )
    plan = res.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "hot-key dedup must not window-serialize"
    rows = res.df.collect()
    assert {r["k"] for r in rows} == {1001}
    assert [r["diff_status"] for r in rows] == [UPDATED, UPDATED]


def test_identical_hot_key_snapshots_diff_empty(spark):
    base, _ = _hot_key_frames(spark)
    res = diff_tables(
        base, base, ["k"], mode=DiffMode.TYPED, dedup_keys=True
    )
    assert res.df.count() == 0


def test_aqe_skew_split_fires_for_inner_but_not_full_outer(spark):
    """The measured constraint behind diff.py's skew note: with
    aggressive skew thresholds and a 50%-hot join key, AQE marks the
    inner SMJ skew=true but leaves the FULL OUTER SMJ unsplit.  If this
    ever starts failing on the full_outer arm, Spark learned FOJ
    skew-split and the diff.py scale notes should be upgraded."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(500_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") % 50_000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        fired = {}
        for jt in ("inner", "full_outer"):
            agg = left.join(right, "k", jt).groupBy().count()
            agg.collect()  # same QueryExecution → final adaptive plan
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            fired[jt] = "skew=true" in plan
        assert fired["inner"], "AQE skew-split should fire for inner SMJ"
        assert not fired["full_outer"], (
            "AQE split a FULL OUTER SMJ — upgrade the diff.py skew notes"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
