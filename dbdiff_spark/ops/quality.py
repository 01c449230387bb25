"""Data-quality operators over snapshots — the monitoring layer a
diff engine grows once "what rows changed" is answered: "did the
DISTRIBUTION drift" and "are the integrity rules still true".

Complements `snapshot.schema_changes` (structural drift) and
`diff_column_stats` (which columns changed).  Everything is exact
integer arithmetic so the oracle comparison is bit-for-bit: drift is
reported as an L1 histogram distance in parts-per-million (integer
div), NOT a PSI/KL score (both need ln — libm-dependent; memory rule
from r1: transcendentals never reach oracle-compared output).

Scale shape:

* drift report: the measured columns stack into (column, cell, side)
  rows via one generated-expression explode — ONE corpus scan and ONE
  map-side-combinable aggregation, then per-column roll-up of the
  (small) histogram table.  Histograms merge by cell-wise add, the
  same mergeable-summary property as the CMS/KMV/quantile sketches.
* integrity audit: each rule is a broadcast-able or keyed anti-join
  count; rules union into one report.  At 100 TB each rule is one
  shuffle (or zero when the dimension side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark import testkit
from dbdiff_spark.io import load_table
from dbdiff_spark.testkit import MUTATIONS, SPECS, _after_sql, _prep_sql

# (column, histogram cell width) — widths chosen so each histogram has
# O(100) cells at any data size (cells scale with VALUE RANGE, not rows).
DRIFT_COLS = (
    ("l_quantity", 5),
    ("l_extendedprice", 5000),
    ("l_discount", 1),  # 0.00-0.10 → effectively null-vs-value + coarse cells
)


def drift_report(
    before: DataFrame, after: DataFrame, cols: tuple[tuple[str, int], ...]
) -> DataFrame:
    """Per-column distribution drift between two snapshots.

    Output per measured column: row counts, null counts, and the L1
    distance between fixed-grid histograms as an integer ppm of total
    mass — 0 for identical distributions, 2_000_000 for disjoint ones.
    """

    def stacked(df: DataFrame, side: int) -> DataFrame:
        cells = ", ".join(
            f"struct('{c}' AS col, CAST(floor(CAST({c} AS DOUBLE) / {w}.0) AS BIGINT)"
            f" AS cell)"
            for c, w in cols
        )
        return df.selectExpr(f"explode(array({cells})) AS e").select(
            F.col("e.col").alias("col"),
            F.col("e.cell").alias("cell"),  # NULL value → NULL cell
            F.lit(side).alias("side"),
        )

    hist = (
        stacked(before, 0)
        .unionByName(stacked(after, 1))
        .groupBy("col", "cell")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("na"),
        )
    )
    return hist.groupBy("col").agg(
        F.expr("CAST(sum(nb) AS BIGINT) AS n_before"),
        F.expr("CAST(sum(na) AS BIGINT) AS n_after"),
        F.expr(
            "CAST(sum(CASE WHEN cell IS NULL THEN nb ELSE 0 END) AS BIGINT)"
            " AS null_before"
        ),
        F.expr(
            "CAST(sum(CASE WHEN cell IS NULL THEN na ELSE 0 END) AS BIGINT)"
            " AS null_after"
        ),
        F.expr("CAST(sum(abs(nb - na)) AS BIGINT) AS l1_distance"),
        F.expr(
            "CAST((sum(abs(nb - na)) * 1000000) div (sum(nb) + sum(na)) AS BIGINT)"
            " AS drift_ppm"
        ),
    )


def column_drift_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift between lineitem and its mutated snapshot (quantity bumped
    on one key class, rows deleted/inserted on others)."""
    spec, mut = SPECS["lineitem"], MUTATIONS["lineitem"]
    base = testkit.prep(load_table(spark, sf_dir, "lineitem"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    return drift_report(base, after, DRIFT_COLS)


def _drift_sql() -> str:
    spec, mut = SPECS["lineitem"], MUTATIONS["lineitem"]
    layers_b = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, CAST(floor(CAST(\"{c}\" AS DOUBLE) / {w}.0) AS BIGINT)"
        " AS cell, 0 AS side FROM before"
        for c, w in DRIFT_COLS
    )
    layers_a = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, CAST(floor(CAST(\"{c}\" AS DOUBLE) / {w}.0) AS BIGINT)"
        " AS cell, 1 AS side FROM after"
        for c, w in DRIFT_COLS
    )
    return f"""
WITH before AS ({_prep_sql(spec)}),
after AS ({_after_sql(spec, mut)}),
stacked AS (
{layers_b}
UNION ALL
{layers_a}
),
hist AS (
  SELECT col, cell,
         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS na
  FROM stacked GROUP BY col, cell
)
SELECT col,
       CAST(sum(nb) AS BIGINT) AS n_before,
       CAST(sum(na) AS BIGINT) AS n_after,
       CAST(sum(CASE WHEN cell IS NULL THEN nb ELSE 0 END) AS BIGINT) AS null_before,
       CAST(sum(CASE WHEN cell IS NULL THEN na ELSE 0 END) AS BIGINT) AS null_after,
       CAST(sum(abs(nb - na)) AS BIGINT) AS l1_distance,
       CAST((sum(abs(nb - na)) * 1000000) // (sum(nb) + sum(na)) AS BIGINT) AS drift_ppm
FROM hist
GROUP BY col
"""


COLUMN_DRIFT_SQL = _drift_sql()


# --- referential-integrity audit --------------------------------------------


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity rules evaluated on the AFTER state of the mutated
    snapshots — deletes sever foreign keys, so the audit reports real
    orphans: orders referencing deleted customers, inserted orders
    whose synthetic keys match no customer, plus PK-duplicate and
    null-key checks.  Each rule is one anti-join/aggregation; the
    report unions rule results."""
    cust_spec, cust_mut = SPECS["customer"], MUTATIONS["customer"]
    ord_spec, ord_mut = SPECS["orders"], MUTATIONS["orders"]
    cust = testkit.apply_mutation(
        testkit.prep(load_table(spark, sf_dir, "customer"), cust_spec),
        cust_spec,
        cust_mut,
    )
    orders = testkit.apply_mutation(
        testkit.prep(load_table(spark, sf_dir, "orders"), ord_spec),
        ord_spec,
        ord_mut,
    )
    li = testkit.prep(
        load_table(spark, sf_dir, "lineitem"), SPECS["lineitem"]
    )

    orphan_orders = (
        orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("fk_orphan").alias("check_name"),
            F.lit("orders->customer").alias("target"),
            F.col("violations"),
        )
    )
    orphan_lineitem = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("fk_orphan").alias("check_name"),
            F.lit("lineitem->orders").alias("target"),
            F.col("violations"),
        )
    )
    dup_pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("pk_duplicate").alias("check_name"),
            F.lit("lineitem").alias("target"),
            F.col("violations"),
        )
    )
    null_key = (
        cust.filter(F.col("c_custkey").isNull())
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("pk_null").alias("check_name"),
            F.lit("customer").alias("target"),
            F.col("violations"),
        )
    )
    return (
        orphan_orders.unionByName(orphan_lineitem)
        .unionByName(dup_pk)
        .unionByName(null_key)
    )


def _integrity_sql() -> str:
    cust_spec, cust_mut = SPECS["customer"], MUTATIONS["customer"]
    ord_spec, ord_mut = SPECS["orders"], MUTATIONS["orders"]
    li_spec = SPECS["lineitem"]
    return f"""
WITH cust_before AS ({_prep_sql(cust_spec)}),
cust_after AS ({_after_sql(cust_spec, cust_mut, src="cust_before")}),
ord_before AS ({_prep_sql(ord_spec)}),
ord_after AS ({_after_sql(ord_spec, ord_mut, src="ord_before")}),
li AS ({_prep_sql(li_spec)})
SELECT 'fk_orphan' AS check_name, 'orders->customer' AS target,
       CAST(count(*) AS BIGINT) AS violations
FROM ord_after o WHERE NOT EXISTS (SELECT 1 FROM cust_after c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'fk_orphan', 'lineitem->orders', CAST(count(*) AS BIGINT)
FROM li WHERE NOT EXISTS (SELECT 1 FROM ord_after o WHERE o.o_orderkey = li.l_orderkey)
UNION ALL
SELECT 'pk_duplicate', 'lineitem', CAST(count(*) AS BIGINT)
FROM (
  SELECT l_orderkey, l_linenumber FROM li
  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
)
UNION ALL
SELECT 'pk_null', 'customer', CAST(count(*) AS BIGINT)
FROM cust_after WHERE c_custkey IS NULL
"""


INTEGRITY_AUDIT_SQL = _integrity_sql()

QUERIES = {
    "column_drift_lineitem": (column_drift_lineitem, COLUMN_DRIFT_SQL),
    "integrity_audit": (integrity_audit, INTEGRITY_AUDIT_SQL),
}
