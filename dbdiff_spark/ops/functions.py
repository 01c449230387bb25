"""Scalar-function and set-operation coverage — the taxonomy rows the
reference has none of (SURVEY §2.1: scalar functions "none", set ops
"none as named ops").  Each query exercises a function family through
the same oracle gate as every operator.

Portability constraints honored here (see ARCHITECTURE.md):
* no libm-divergent functions in outputs (exp/ln differ in last ulp
  across platforms); sqrt/abs/round/floor/ceil are IEEE-exact
* date parts extracted from timestamps (identical integer results)
* JSON path extraction via each engine's string-path form
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over the (returnflag, linestatus) pairs of two
    deterministic halves of lineitem — named set operators end-to-end."""
    li = load_table(spark, sf_dir, "lineitem")
    even = li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_returnflag", "l_linestatus"
    )
    odd = li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_returnflag", "l_linestatus"
    )
    inter = even.intersect(odd).withColumn("set_op", F.lit("intersect"))
    # subtract = EXCEPT DISTINCT (exceptAll would be bag difference)
    minus = even.subtract(odd).withColumn("set_op", F.lit("except"))
    return inter.unionByName(minus)


SET_OPS_SQL = """
SELECT l_returnflag, l_linestatus, 'intersect' AS set_op FROM (
  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 0
  INTERSECT
  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 1
)
UNION ALL
SELECT l_returnflag, l_linestatus, 'except' AS set_op FROM (
  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 0
  EXCEPT
  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 1
)
"""


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar-function showcase over orders."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("prio_snake"),
        F.length(F.col("o_orderpriority")).cast("long").alias("prio_len"),
        F.year(ts).alias("o_year"),
        F.month(ts).alias("o_month"),
        F.dayofmonth(ts).alias("o_day"),
        F.quarter(ts).alias("o_quarter"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dev"),
        F.round(F.col("o_totalprice"), 0).alias("price_round"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        F.ceil(F.col("o_totalprice")).cast("long").alias("price_ceil"),
        F.sqrt(F.col("o_totalprice")).alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderpriority, 1, 1) AS prio_code,
       concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
       lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
       replace(o_orderpriority, '-', '_') AS prio_snake,
       CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       dayofmonth(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       abs(o_totalprice - 100000.0) AS price_dev,
       round(o_totalprice, 0) AS price_round,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       sqrt(o_totalprice) AS price_sqrt,
       o_orderkey % 7 AS key_mod7
FROM orders
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column + aggregation
    over the extracted value."""
    ev = load_table(spark, sf_dir, "events")
    extracted = ev.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return extracted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


JSON_EXTRACT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (sort-based; the approximate sibling
    ``approx_percentile`` is the at-scale default but is sketch-based and
    engine-specific, so the oracle pins the exact one)."""
    ev = load_table(spark, sf_dir, "events")
    # one array-percentile (single per-group buffer), not three scalar
    # ones — see ops/quality.outlier_report for the measurement
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("__ps"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    ).selectExpr(
        "event_type",
        "__ps[0] AS p50",
        "__ps[1] AS p90",
        "__ps[2] AS p99",
        "v_min",
        "v_max",
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       min(value) AS v_min,
       max(value) AS v_max
FROM events
GROUP BY event_type
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all 4 grouping combinations in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000"
        ).alias("total_price"),
    )


CUBE_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# Correlated subquery through the SQL API — Catalyst decorrelates it into
# the same join+agg plan the DataFrame formulation would produce; the avg
# is grid-exact so both engines compare against identical thresholds.
_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(ROUND(o2.o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000
         / count(*)
  FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SQL API surface): orders 1.5× above
    their customer's average order value."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ABOVE_AVG_SQL)


def orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): the priority-count pivot melted back to
    (status, priority, n) rows via stack()."""
    from dbdiff_spark.ops.analytics import _PRIORITIES, orders_priority_pivot

    piv = orders_priority_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{p}', n_{p[0]}" for p in _PRIORITIES)
    return piv.selectExpr(
        "o_orderstatus",
        f"stack({len(_PRIORITIES)}, {stack_args}) AS (priority, n_orders)",
    ).filter(F.col("n_orders") > 0)


# the IN filter keeps the oracle symmetric with the Spark side, which
# stacks exactly the fixed priority list (a value outside it would
# appear here but be dropped by stack())
ORDERS_UNPIVOT_SQL = """
SELECT o_orderstatus, o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
GROUP BY o_orderstatus, o_orderpriority
HAVING count(*) > 0
"""


def agg_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: per user the SORTED distinct event types
    (collect_set order is nondeterministic — array_sort pins it) and the
    csv rendering."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("array_join(array_sort(collect_set(event_type)), ',')").alias(
            "event_types_csv"
        ),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


AGG_COLLECTIONS_SQL = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types_csv,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY user_id
"""


# --- pandas UDAF (GROUPED_AGG) -----------------------------------------------
#
# Completes the Python-function surface matrix: scalar/batch
# (mapInPandas, ops/multimodal.py), grouped-map (applyInPandas),
# stateful-streaming (applyInPandasWithState), table function (UDTF,
# ops/text.py chunk_documents) — and here the GROUPED AGGREGATE form:
# an Arrow-batched pandas Series → scalar reduction usable directly in
# ``groupBy().agg(...)``.
#
# Scale honesty: GROUPED_AGG has NO partial aggregation — every group's
# rows ship to one aggregator (fine for per-source stats where groups
# are source-sized; for corpus-scale groups use the relational
# ``percentile_approx``/``approx_percentile`` with the same plan shape
# and sketch accuracy).  Exactness: every interpolated quantile here is
# a multiple of 0.25 of integer char counts — exactly representable in
# double — so pandas' linear interpolation and DuckDB's
# ``quantile_cont`` agree bit-for-bit with no grid rounding.


def udaf_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_chars(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("double")
    def iqr_chars(v: pd.Series) -> float:
        return float(v.quantile(0.75) - v.quantile(0.25))

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg(), so the count is a pandas UDAF too.
    @pandas_udf("long")
    def n_docs(v: pd.Series) -> int:
        return int(len(v))

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "source", "CAST(n_chars AS DOUBLE) AS nc"
    )
    return (
        docs.groupBy("source")
        .agg(
            median_chars("nc").alias("median_chars"),
            iqr_chars("nc").alias("iqr_chars"),
            n_docs("nc").alias("n_docs"),
        )
        .orderBy("source")
    )


UDAF_SOURCE_STATS_SQL = """
SELECT source,
       median(CAST(n_chars AS DOUBLE)) AS median_chars,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
       - quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS iqr_chars,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


QUERIES = {
    "orders_unpivot": (orders_unpivot, ORDERS_UNPIVOT_SQL),
    "udaf_source_stats": (udaf_source_stats, UDAF_SOURCE_STATS_SQL),
    "agg_collections": (agg_collections, AGG_COLLECTIONS_SQL),
    "set_ops": (set_ops, SET_OPS_SQL),
    "scalar_functions": (scalar_functions, SCALAR_FUNCTIONS_SQL),
    "json_extract_props": (json_extract_props, JSON_EXTRACT_SQL),
    "value_percentiles": (value_percentiles, VALUE_PERCENTILES_SQL),
    "cube_orders": (cube_orders, CUBE_ORDERS_SQL),
    "orders_above_customer_avg": (orders_above_customer_avg, _ABOVE_AVG_SQL),
}
