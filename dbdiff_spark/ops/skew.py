"""Skew-resilient salted equi-join.

The reference engine is single-process, so join-key skew cannot hurt it
(one goroutine does everything — ``extract_data.go:33``).  On a
1000-executor shuffle the cost model inverts: a hot key sends every
matching row to ONE reducer, and that straggler is the job's wall clock.
This engine has two answers:

* AQE skew-join splitting (on by default in ``session.py``) fixes
  skewed sort-merge joins at runtime by splitting oversized partitions —
  zero code, the first thing to reach for.
* ``salted_join`` is the explicit form for when AQE can't help (e.g. the
  skew is in the *build* of a shuffled-hash join, or the operator feeds
  a further co-partitioned stage): a deterministic salt spreads each hot
  key over ``num_salts`` reducers, and the dimension side is replicated
  ``num_salts``× so every (key, salt) bucket still finds its match.

Cost model: the fact side shuffles once (unchanged bytes, wider key);
the dimension side shuffles ``num_salts``× its size.  Worth it exactly
when ``num_salts × |dim|`` ≪ the straggler time the hot key would cost —
the classic replicated-fragment join trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table
from dbdiff_spark.ops.analytics import _dsum

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (large, possibly skew-keyed) to ``right`` (a
    dimension too big to broadcast, small enough to replicate) on
    ``left_key = right_key``, salted over ``num_salts`` buckets.

    The salt is derived by hashing the whole left row (``xxhash64`` —
    deterministic, so retried tasks re-derive the same salt; no
    ``rand()`` in the plan), which spreads duplicate hot-key rows as long
    as any other column varies.  The join result is EXACTLY the plain
    equi-join's — salting only changes the shuffle distribution.

    ``how`` may be ``inner`` or ``left`` (every left row keeps exactly
    one salt, so left-outer semantics survive salting; right-outer would
    not — each right row exists ``num_salts`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in left.columns or SALT_COL in right.columns:
        raise ValueError(f"{SALT_COL} column name is reserved")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        # the output carries both sides' columns flat — require the
        # caller to rename (a self-join MUST alias anyway)
        raise ValueError(f"column names overlap across sides: {sorted(overlap)}")
    salt = F.pmod(
        F.xxhash64(*[F.col(f"`{c}`") for c in left.columns]), F.lit(num_salts)
    ).cast("int")
    l = left.withColumn(SALT_COL, salt).alias("l")
    r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    ).alias("r")
    cond = (F.col(f"l.`{left_key}`") == F.col(f"r.`{right_key}`")) & (
        F.col(f"l.{SALT_COL}") == F.col(f"r.{SALT_COL}")
    )
    joined = l.join(r, cond, how)
    return joined.select(
        *[F.col(f"l.`{c}`").alias(c) for c in left.columns],
        *[F.col(f"r.`{c}`").alias(c) for c in right.columns],
    )


def skew_join_user_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: events (fact, user_id-keyed) salted-joined to
    customer (dimension) and aggregated per market segment.  The result
    is identical to the plain join — the oracle asserts exactly that."""
    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(events, cust, "user_id", "c_custkey", num_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(_dsum("value")).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


SKEW_JOIN_SQL = f"""
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
       {_dsum('value')} AS total_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


SKEW_TOP_N = 10


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = SKEW_TOP_N,
) -> DataFrame:
    """Pre-join skew diagnostic: the ``top_n`` join keys by estimated
    inner-join fan-out (``n_left × n_right``) with both sides' counts —
    the report that decides between plain join / AQE / ``salted_join``
    BEFORE burning a cluster-day on a straggler.

    Scale shape: one map-side-combinable count per side (shuffle
    carries distinct keys only, never rows), an outer join of the two
    key-count tables, and a top-n rank over that (distinct-key-sized)
    table.  Nothing in the plan touches full fact rows.
    """
    from pyspark.sql import Window

    lc = left.groupBy(F.col(f"`{left_key}`").alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(f"`{right_key}`").alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    keys = (
        lc.join(rc, "join_key", "full_outer")
        .select(
            "join_key",
            F.coalesce("n_left", F.lit(0)).cast("bigint").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("bigint").alias("n_right"),
        )
        .withColumn("est_pairs", (F.col("n_left") * F.col("n_right")).cast("bigint"))
    )
    # orderBy().limit() plans TakeOrderedAndProject — a distributed
    # top-k (per-partition heaps + driver merge), NOT a global sort; the
    # rank window then runs over only the surviving top_n rows.  A bare
    # row_number() over the full key table would funnel every distinct
    # key through one reducer.
    top = keys.orderBy(F.col("est_pairs").desc(), F.col("join_key")).limit(top_n)
    w = Window.orderBy(F.col("est_pairs").desc(), F.col("join_key"))
    return top.withColumn("rank", F.row_number().over(w))


def skew_report_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return join_skew_report(events, cust, "user_id", "c_custkey")


SKEW_REPORT_SQL = f"""
WITH lc AS (SELECT user_id AS join_key, CAST(count(*) AS BIGINT) AS n_left
            FROM events GROUP BY user_id),
rc AS (SELECT c_custkey AS join_key, CAST(count(*) AS BIGINT) AS n_right
       FROM customer GROUP BY c_custkey),
keys AS (
  SELECT coalesce(lc.join_key, rc.join_key) AS join_key,
         CAST(coalesce(n_left, 0) AS BIGINT) AS n_left,
         CAST(coalesce(n_right, 0) AS BIGINT) AS n_right,
         CAST(coalesce(n_left, 0) * coalesce(n_right, 0) AS BIGINT) AS est_pairs
  FROM lc FULL OUTER JOIN rc ON lc.join_key = rc.join_key
)
SELECT join_key, n_left, n_right, est_pairs, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY est_pairs DESC, join_key) AS rank
  FROM keys
)
WHERE rank <= {SKEW_TOP_N}
"""


QUERIES = {
    "skew_join_user_segment": (skew_join_user_segment, SKEW_JOIN_SQL),
    "join_skew_report": (skew_report_events_customer, SKEW_REPORT_SQL),
}
