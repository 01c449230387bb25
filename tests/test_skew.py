"""salted_join: result parity with the plain equi-join, and the salt
actually changing the shuffle distribution (the whole point)."""

import pytest
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table
from dbdiff_spark.ops.skew import SALT_COL, salted_join


def _sides(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return events, cust


def test_salted_inner_join_equals_plain_join(spark, sf_dir):
    events, cust = _sides(spark, sf_dir)
    salted = salted_join(events, cust, "user_id", "c_custkey", num_salts=4)
    plain = events.join(cust, events.user_id == cust.c_custkey).select(
        "user_id", "value", "c_custkey", "c_mktsegment"
    )
    assert salted.columns == plain.columns
    # multiset equality both directions (exceptAll is bag difference)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched_rows(spark, sf_dir):
    events, cust = _sides(spark, sf_dir)
    # shrink the dim so some users have no match
    small = cust.filter(F.col("c_custkey") % 2 == 0)
    salted = salted_join(events, small, "user_id", "c_custkey", num_salts=4, how="left")
    plain = events.join(small, events.user_id == small.c_custkey, "left").select(
        "user_id", "value", "c_custkey", "c_mktsegment"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_reaches_the_exchange(spark, sf_dir):
    events, cust = _sides(spark, sf_dir)
    # force a shuffled join so the salt is visible in the partitioning
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(events, cust, "user_id", "c_custkey", num_salts=4)
        plan = salted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert exchanges and all(SALT_COL in l for l in exchanges)


def test_reserved_salt_column_and_bad_how_raise(spark, sf_dir):
    events, cust = _sides(spark, sf_dir)
    with pytest.raises(ValueError):
        salted_join(events.withColumn(SALT_COL, F.lit(1)), cust, "user_id", "c_custkey")
    with pytest.raises(ValueError):
        salted_join(events, cust, "user_id", "c_custkey", how="full")
    with pytest.raises(ValueError):
        # overlapping output columns (self-join without rename)
        salted_join(events, events, "user_id", "user_id")


def test_hot_key_diff_has_no_straggler_partition(spark):
    """Skewed-key diff hardening (VERDICT r3 item 5): a no-PK table
    where ONE row value carries 20% of the rows.  The all-columns-key
    diff is a grouped symmetric difference with map-side combine, so
    the hot group must collapse to ≤ one partial row per map task
    BEFORE the exchange — no reducer can become a straggler no matter
    how hot the key.  Asserted two ways: the executed plan shows the
    partial aggregate below the exchange, and the exact post-combine
    shuffle distribution (pmod(hash(row), P) IS Spark's hash
    partitioning) has max ≤ 4× median rows per reduce partition."""
    from dbdiff_spark.diff import DELETED, INSERTED, diff_tables

    n, n_hot = 50_000, 10_000
    base = spark.range(n).selectExpr(
        f"CASE WHEN id < {n_hot} THEN 'HOT' ELSE CAST(id AS STRING) END AS k",
        f"CASE WHEN id < {n_hot} THEN 0 ELSE CAST(id % 7 AS INT) END AS v",
    )
    # after: hot rows untouched; 100 unique rows deleted, 100 inserted
    after = base.filter(
        f"NOT (k <> 'HOT' AND CAST(k AS BIGINT) BETWEEN {n_hot} AND {n_hot + 99})"
    ).unionByName(
        spark.range(n, n + 100).selectExpr("CAST(id AS STRING) AS k", "CAST(9 AS INT) AS v")
    )

    res = diff_tables(base, after, ["k", "v"]).df
    by_status = {r["diff_status"]: r["n"] for r in
                 res.groupBy("diff_status").agg(F.count("*").alias("n")).collect()}
    assert by_status == {DELETED: 100, INSERTED: 100}

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan  # map-side combine below the exchange

    # exact shuffle model: rows crossing the wire = distinct (map
    # partition, row value); bucket them like hashpartitioning does
    union = base.unionByName(after)
    n_parts = 32
    model = union.select(
        F.spark_partition_id().alias("mp"), "k", "v"
    ).distinct()
    hot_rows = model.filter("k = 'HOT'").count()
    assert hot_rows <= union.rdd.getNumPartitions()  # hot group collapsed
    sizes = sorted(
        r["n"] for r in model.groupBy(
            F.pmod(F.hash("k", "v"), F.lit(n_parts)).alias("b")
        ).agg(F.count("*").alias("n")).collect()
    )
    median = sizes[len(sizes) // 2]
    assert sizes[-1] <= 4 * median, (sizes[-1], median)
