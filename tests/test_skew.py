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
