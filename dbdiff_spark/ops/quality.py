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


# --- per-column table profile -----------------------------------------------
#
# The "DESCRIBE my data" operator every governance layer grows: one row
# per column with row/null/distinct counts and type-appropriate extrema.
# The reference has no analogue (it answers "what changed", not "what is
# here"); this is the pre-diff triage step.


def profile_table(
    df: DataFrame, exact_distinct: bool = True
) -> DataFrame:
    """Per-column profile: ``n_rows, n_nulls, n_distinct``, numeric
    min/max (as DOUBLE), string min/max and total length.

    Scale shape: ONE aggregation job.  With ``exact_distinct`` the
    multi-column COUNT(DISTINCT) is planned through Spark's Expand
    (input duplicated once per profiled column before the partial agg —
    exact, and the oracle-comparable default).  At 100 TB pass
    ``exact_distinct=False``: ``approx_count_distinct`` (HLL++) keeps
    the plan a plain single-pass partial/final agg with no Expand, the
    same accuracy trade every warehouse's profiler makes.  Everything
    else map-side combines either way.  The final unpivot explodes ONE
    driver-sized row — no second scan.

    BIGINT extrema are reported through DOUBLE (53-bit mantissa) —
    exact for keys < 2^53, documented rather than silently assumed.
    """
    num_types = ("byte", "short", "integer", "long", "float", "double")
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c, t = f.name, f.dataType.typeName()
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(nd(c).alias(f"{c}__nd"))
        if t in num_types:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        if t == "string":
            aggs.append(F.min(c).alias(f"{c}__min_str"))
            aggs.append(F.max(c).alias(f"{c}__max_str"))
            aggs.append(
                F.sum(F.length(F.col(c))).cast("bigint").alias(f"{c}__len")
            )
    row = df.agg(*aggs)
    structs = []
    for f in df.schema.fields:
        c, t = f.name, f.dataType.typeName()
        has_num = t in num_types
        has_str = t == "string"
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("bigint").alias("n_nulls"),
                F.col(f"{c}__nd").cast("bigint").alias("n_distinct"),
                (
                    F.col(f"{c}__min_num")
                    if has_num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max_num")
                    if has_num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"{c}__min_str")
                    if has_str
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"{c}__max_str")
                    if has_str
                    else F.lit(None).cast("string")
                ).alias("max_str"),
                (
                    F.col(f"{c}__len") if has_str else F.lit(None).cast("bigint")
                ).alias("total_len"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the raw customer table (mixed bigint/int/double/string
    columns — every branch of the profiler exercised)."""
    return profile_table(load_table(spark, sf_dir, "customer"))


def _profile_sql() -> str:
    cols = [
        ("c_custkey", "num"),
        ("c_name", "str"),
        ("c_nationkey", "num"),
        ("c_acctbal", "num"),
        ("c_mktsegment", "str"),
    ]
    parts = []
    for c, kind in cols:
        min_num = f"CAST(min({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(max({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        min_str = f"min({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        max_str = f"max({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        tlen = (
            f"CAST(sum(length({c})) AS BIGINT)"
            if kind == "str"
            else "CAST(NULL AS BIGINT)"
        )
        parts.append(
            f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,\n"
            f"       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,\n"
            f"       {min_num} AS min_num, {max_num} AS max_num,\n"
            f"       {min_str} AS min_str, {max_str} AS max_str,\n"
            f"       {tlen} AS total_len\n"
            "FROM customer"
        )
    return "\nUNION ALL\n".join(parts)


PROFILE_CUSTOMER_SQL = _profile_sql()


# --- right-to-erasure cascade -----------------------------------------------
#
# Given a forget-set of root-entity keys, propagate the deletion through
# the foreign-key graph and report per-table impact — the GDPR/CCPA
# "delete this user everywhere" primitive a training-data pipeline must
# answer before it may retrain.


def cascade_delete(
    frames: dict[str, DataFrame],
    root: str,
    root_condition,
    edges: list[tuple[str, str, str, str]],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Propagate a root-table deletion through FK ``edges`` (processed
    in order; each: ``(child, child_fk, parent, parent_key)``).

    Returns ``(kept_frames, report)``: the per-table retained rows and a
    per-table ``(table_name, n_deleted, n_remaining)`` report.

    Scale shape: per edge, ONE left-semi join of the child against the
    (projected, deleted-keys-only) parent — the forget-set is typically
    a tiny fraction of each table, so AQE broadcasts the key side and
    the child is never shuffled; worst case it degrades to a keyed semi
    join.  No collect anywhere — key sets stay distributed frames.
    """
    cond = F.coalesce(root_condition, F.lit(False))  # NULL ⇒ keep
    deleted: dict[str, DataFrame] = {root: frames[root].filter(cond)}
    # tables outside the cascade pass through untouched — the caller
    # gets a complete post-erasure view of every frame it handed in
    kept: dict[str, DataFrame] = dict(frames)
    kept[root] = frames[root].filter(~cond)
    for child, child_fk, parent, parent_key in edges:
        if parent not in deleted:
            raise ValueError(
                f"edge {child}->{parent} processed before {parent} had a"
                " deletion set; order edges parent-first"
            )
        keys = deleted[parent].select(F.col(parent_key).alias(child_fk))
        deleted[child] = frames[child].join(keys, child_fk, "leftsemi")
        kept[child] = frames[child].join(keys, child_fk, "left_anti")
    # report from counts computed relationally (one agg per table,
    # unioned — a handful of rows)
    parts = []
    for name, df in frames.items():
        if name not in deleted:
            continue
        n_del = deleted[name].agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("table_name"),
            F.col("n").cast("bigint").alias("n_deleted"),
        )
        n_tot = df.agg(F.count(F.lit(1)).alias("t"))
        parts.append(
            n_del.crossJoin(n_tot).select(
                "table_name",
                "n_deleted",
                (F.col("t") - F.col("n_deleted")).cast("bigint").alias("n_remaining"),
            )
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return kept, report


FORGET_MOD = 97  # c_custkey % 97 == 0 → the demo forget-set (~1%)


def delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-cascade impact report: forget ~1% of customers, propagate
    through orders → lineitem, report per-table deleted/remaining."""
    frames = {
        "customer": load_table(spark, sf_dir, "customer"),
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
    }
    _, report = cascade_delete(
        frames,
        root="customer",
        root_condition=F.col("c_custkey") % FORGET_MOD == 0,
        edges=[
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    return report


DELETE_CASCADE_SQL = f"""
WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0),
del_o AS (SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM del_c)),
del_l AS (SELECT 1 AS x FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM del_c) AS BIGINT) AS n_deleted,
       CAST((SELECT count(*) FROM customer) - (SELECT count(*) FROM del_c) AS BIGINT)
         AS n_remaining
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM del_o) AS BIGINT),
       CAST((SELECT count(*) FROM orders) - (SELECT count(*) FROM del_o) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM del_l) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) - (SELECT count(*) FROM del_l) AS BIGINT)
"""


# --- IQR outlier report -------------------------------------------------------


def outlier_report(
    df: DataFrame, value_col: str, group_col: str, k_tenths: int = 15
) -> DataFrame:
    """Per-group Tukey fences (Q1 − k·IQR, Q3 + k·IQR; k = 1.5 by
    default) and the count of rows outside them — the distributional
    companion to ``integrity_audit``'s rule checks.

    Scale shape: exact per-group quartiles are one sort-based
    aggregation (grouped, so no global sort); the fence table is
    group-count-sized and broadcasts back onto a second scan for the
    outside-fence counts — no row ever shuffles with its payload.
    (At 100 TB swap ``percentile`` for ``approx_percentile`` — same
    plan, sketch accuracy; the oracle pins the exact form.)
    """
    k = k_tenths  # fences use exact decimal arithmetic: k/10
    # ONE array-percentile, not two scalar ones: each percentile
    # expression keeps its own per-group value buffer in the
    # ObjectHashAggregate, so the scalar pair doubles the buffering and
    # the sort — the array form measured 1.8x faster, identical values
    fences = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array(0.25D, 0.75D))").alias("__qs")
    ).selectExpr(group_col, "__qs[0] AS q1", "__qs[1] AS q3")
    fences = fences.select(
        group_col,
        "q1",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - (F.col("q3") - F.col("q1")) * k / 10).alias("lo_fence"),
        (F.col("q3") + (F.col("q3") - F.col("q1")) * k / 10).alias("hi_fence"),
    )
    return (
        df.join(F.broadcast(fences), group_col)
        .groupBy(group_col, "q1", "q3", "iqr", "lo_fence", "hi_fence")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col(value_col) < F.col("lo_fence")).alias("n_below"),
            F.count_if(F.col(value_col) > F.col("hi_fence")).alias("n_above"),
        )
    )


def outlier_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return outlier_report(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", "l_returnflag"
    )


OUTLIER_REPORT_SQL = """
WITH fences AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem GROUP BY l_returnflag
),
f AS (
  SELECT l_returnflag, q1, q3, q3 - q1 AS iqr,
         q1 - (q3 - q1) * 15 / 10 AS lo_fence,
         q3 + (q3 - q1) * 15 / 10 AS hi_fence
  FROM fences
)
SELECT f.l_returnflag, q1, q3, iqr, lo_fence, hi_fence,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE l_extendedprice < lo_fence) AS BIGINT) AS n_below,
       CAST(count(*) FILTER (WHERE l_extendedprice > hi_fence) AS BIGINT) AS n_above
FROM lineitem JOIN f ON lineitem.l_returnflag = f.l_returnflag
GROUP BY f.l_returnflag, q1, q3, iqr, lo_fence, hi_fence
"""


# --- expectation rules --------------------------------------------------------


def validate_rules(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate row-local expectation rules (name, boolean SQL predicate)
    in ONE scan: every rule becomes a ``count_if(NOT coalesce(pred,
    FALSE))`` in a single aggregation (NULL predicate = violation — an
    expectation that cannot be evaluated on a row has not been met),
    then the one driver-sized result row unpivots to a row per rule.
    The contract-testing primitive: N rules never cost N passes."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.expr(f"count_if(NOT coalesce(({pred}), FALSE))").alias(f"v__{name}")
        )
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule_name"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col(f"v__{name}").cast("bigint").alias("n_violations"),
            (F.col(f"v__{name}") == 0).alias("passed"),
        )
        for name, _ in rules
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


ORDER_RULES = [
    ("orderkey_not_null", "o_orderkey IS NOT NULL"),
    ("totalprice_positive", "o_totalprice > 0"),
    ("status_known", "o_orderstatus IN ('F', 'O', 'P')"),
    ("date_in_range", "o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'"),
    ("priority_prefixed", "o_orderpriority LIKE '%-%'"),
]


def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate_rules(load_table(spark, sf_dir, "orders"), ORDER_RULES)


def _validate_sql() -> str:
    parts = []
    for name, pred in ORDER_RULES:
        parts.append(
            f"SELECT '{name}' AS rule_name, CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"       CAST(count(*) FILTER (WHERE NOT coalesce(({pred}), FALSE))"
            " AS BIGINT) AS n_violations,\n"
            f"       count(*) FILTER (WHERE NOT coalesce(({pred}), FALSE)) = 0"
            " AS passed\n"
            "FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


VALIDATE_ORDERS_SQL = _validate_sql()


# --- Benford first-digit audit ----------------------------------------------
#
# Data-forensics screen on a money column: naturally-grown magnitudes
# follow Benford's law; fabricated or truncated data usually don't.
# The first digit comes from the DECIMAL STRING of the integer cents
# value (never log10 — transcendentals don't reach oracle-compared
# output; integer→string is identical in both engines), the expected
# shares are log10(1+1/d) precomputed as PPM literals, and the report
# is the integer PPM deviation per digit.  One scan, one 9-group
# aggregation — trivially scale-safe.

_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    exp_arr = "array({})".format(", ".join(str(v) for v in _BENFORD_PPM))
    digits = orders.selectExpr(
        "CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING),"
        " 1, 1) AS INT) AS digit"
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .selectExpr(
            "digit",
            "n",
            "CAST(n * 1000000 div total AS BIGINT) AS observed_ppm",
            f"CAST(element_at({exp_arr}, digit) AS BIGINT) AS expected_ppm",
            f"CAST(n * 1000000 div total - element_at({exp_arr}, digit)"
            " AS BIGINT) AS deviation_ppm",
        )
        .orderBy("digit")
    )


BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM counts)
SELECT digit, n,
       CAST(n * 1000000 // total AS BIGINT) AS observed_ppm,
       CAST([{", ".join(str(v) for v in _BENFORD_PPM)}][digit] AS BIGINT)
         AS expected_ppm,
       CAST(n * 1000000 // total
            - [{", ".join(str(v) for v in _BENFORD_PPM)}][digit] AS BIGINT)
         AS deviation_ppm
FROM counts CROSS JOIN t
ORDER BY digit
"""


# --- k-anonymity audit ------------------------------------------------------
#
# Privacy governance screen before a table feeds a training corpus:
# group by the quasi-identifier columns and report how much of the
# population sits in groups smaller than k (re-identifiable under the
# k-anonymity model, Sweeney 2002).  One map-side-combinable
# aggregation to group sizes (quasi-identifier-cardinality-sized), then
# a single-row rollup — trivially scale-safe, and the same mergeable-
# histogram property as the drift report.

K_ANON_K = 5
_K_ANON_QI = ("c_nationkey", "c_mktsegment")


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy(*[F.col(c) for c in _K_ANON_QI]).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(F.col("n") < K_ANON_K).alias("n_groups_below_k"),
        F.coalesce(
            F.sum(F.when(F.col("n") < K_ANON_K, F.col("n"))), F.lit(0)
        ).alias("n_rows_at_risk"),
        F.min("n").alias("min_group_size"),
    )


K_ANONYMITY_SQL = f"""
WITH groups AS (
  SELECT {', '.join(_K_ANON_QI)}, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY {', '.join(_K_ANON_QI)}
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE n < {K_ANON_K}) AS BIGINT) AS n_groups_below_k,
       CAST(coalesce(sum(n) FILTER (WHERE n < {K_ANON_K}), 0) AS BIGINT)
         AS n_rows_at_risk,
       min(n) AS min_group_size
FROM groups
"""


# --- cross-column correlation ------------------------------------------------
#
# Pearson correlations across lineitem's small-domain numeric columns
# (quantity, discount ppm, tax ppm), computed from INTEGER moments so
# the parallel aggregation is exact: inputs quantize to bounded grids
# (quantity ≤ 50, ppm ≤ 10⁶), every SUM is a BIGINT (Σd² ≈ 2×10¹⁴ at
# sf0.01 — inside int64; a 100 TB run promotes the moments to
# DECIMAL(38) / HUGEINT, same plan).  The n·Σ combinations exceed
# int64, so the FINAL step evaluates one fixed textual double
# expression per pair (deterministic: identical two-operand IEEE tree
# in both engines), ppm-quantized.  One corpus scan, one map-side-
# combined aggregate row.

_CORR_MOMS = {
    "q": "CAST(ROUND(l_quantity) AS BIGINT)",
    "d": "CAST(ROUND(l_discount * 1000000) AS BIGINT)",
    "t": "CAST(ROUND(l_tax * 1000000) AS BIGINT)",
}


def _corr_expr(a: str, b: str) -> str:
    """corr(a, b) in ppm from the integer moments — identical text in
    both engines (each step one correctly-rounded IEEE double op).
    The n·Σ products combine as DOUBLES: n·Σd² exceeds int64 already at
    sf0.01, and the double product/difference is deterministic because
    both engines evaluate the same two-operand expression tree."""
    d = "CAST({} AS DOUBLE)"
    n, sa, sb = d.format("n"), d.format(f"s_{a}"), d.format(f"s_{b}")
    sab, saa, sbb = (
        d.format(f"s_{a}{b}"), d.format(f"s_{a}{a}"), d.format(f"s_{b}{b}")
    )
    return (
        f"CAST(ROUND(((({n} * {sab}) - ({sa} * {sb})) / "
        f"(sqrt(({n} * {saa}) - ({sa} * {sa})) * "
        f"sqrt(({n} * {sbb}) - ({sb} * {sb})))) "
        f"* CAST(1000000 AS DOUBLE)) AS BIGINT)"
    )


def _corr_moment_exprs() -> list:
    keys = list(_CORR_MOMS)
    out = ["CAST(count(*) AS BIGINT) AS n"]
    for k, expr in _CORR_MOMS.items():
        out.append(f"CAST(sum({expr}) AS BIGINT) AS s_{k}")
    for i, a in enumerate(keys):
        for b in keys[i:]:
            out.append(
                f"CAST(sum(({_CORR_MOMS[a]}) * ({_CORR_MOMS[b]})) AS BIGINT)"
                f" AS s_{a}{b}"
            )
    return out


def numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Pearson-correlation report over lineitem's
    (quantity, discount, tax) in exact integer-moment form."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.selectExpr(*_corr_moment_exprs())
    return moments.selectExpr(
        "n AS n_rows",
        f"{_corr_expr('q', 'd')} AS corr_qty_disc_ppm",
        f"{_corr_expr('q', 't')} AS corr_qty_tax_ppm",
        f"{_corr_expr('d', 't')} AS corr_disc_tax_ppm",
    )


NUMERIC_CORRELATIONS_SQL = f"""
WITH moments AS (
  SELECT {', '.join(_corr_moment_exprs())}
  FROM lineitem
)
SELECT n AS n_rows,
       {_corr_expr('q', 'd')} AS corr_qty_disc_ppm,
       {_corr_expr('q', 't')} AS corr_qty_tax_ppm,
       {_corr_expr('d', 't')} AS corr_disc_tax_ppm
FROM moments
"""


QUERIES = {
    "numeric_correlations": (numeric_correlations, NUMERIC_CORRELATIONS_SQL),
    "column_drift_lineitem": (column_drift_lineitem, COLUMN_DRIFT_SQL),
    "benford_audit": (benford_audit, BENFORD_SQL),
    "k_anonymity_audit": (k_anonymity_audit, K_ANONYMITY_SQL),
    "outlier_report_lineitem": (outlier_report_lineitem, OUTLIER_REPORT_SQL),
    "validate_orders": (validate_orders, VALIDATE_ORDERS_SQL),
    "integrity_audit": (integrity_audit, INTEGRITY_AUDIT_SQL),
    "profile_customer": (profile_customer, PROFILE_CUSTOMER_SQL),
    "delete_cascade": (delete_cascade, DELETE_CASCADE_SQL),
}
