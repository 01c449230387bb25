"""Incremental materialized-view maintenance driven by snapshot diffs.

The reference engine stops at *reporting* a diff (extract_data.go:196-246
classifies rows, cmd/dbdiff/main.go:108-270 renders them).  The natural
at-scale completion — alongside ``diff.apply_diff`` (row materialization)
— is **aggregate maintenance**: a stored GROUP-BY materialized view is
brought up to date by folding in the signed deltas of the changeset,
never rescanning the base table.

Classic self-maintenance theory: SUM and COUNT are self-maintainable
under inserts, deletes and updates (each diff row contributes a signed
delta); MIN/MAX are not under deletes (a retracted minimum needs a
re-scan of its group) and are deliberately not offered here — at 100 TB
"re-aggregate the touched groups" is a different operator with a
different cost model.

Scale shape:

* The diff is orders of magnitude smaller than the base; the delta
  aggregation shuffles ONLY diff rows (map-side combine applies).
* The merge is a full-outer join of the MV with the per-group deltas.
  The MV has one row per *group* — already ~10^3-10^6× smaller than the
  base — so this join is cheap; store the MV bucketed by group key and
  the MV-side exchange disappears exactly as for bucketed diffs.
* A group update whose key expression changes (e.g. an order moved to a
  different date bucket) is handled for free: the UPDATED-before row
  subtracts from the old group, the UPDATED-after row adds to the new.

Measures must be exact-typed (BIGINT / DECIMAL): floating-point sums are
not associative, so a float MV maintained incrementally would drift from
a recompute.  Scaled-integer money (cents) is the canonical encoding.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark import testkit
from dbdiff_spark.diff import DELETED, INSERTED, UPDATED, DiffMode, diff_tables
from dbdiff_spark.io import load_table


def maintain_aggregate(
    mv: DataFrame,
    diff_df: DataFrame,
    group_cols: dict[str, Column],
    measures: dict[str, Column],
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold a row-level diff (``diff.diff_tables`` output) into a stored
    SUM/COUNT materialized view.

    ``mv`` schema: one column per ``group_cols`` key, one per
    ``measures`` key (exact-typed sums), plus ``count_col`` (BIGINT).
    ``group_cols`` / ``measures`` map output names to expressions
    evaluated on *diff rows* — the same expressions that defined the MV.

    Every diff row carries a sign: before-images (DELETED, UPDATED
    before) subtract, after-images (INSERTED, UPDATED after) add.
    Groups whose maintained count reaches zero are dropped, groups first
    seen in the delta appear — so the result is row-for-row the MV that
    a full recompute over the after-snapshot would produce (the law
    ``tests/test_incremental.py`` pins down).
    """
    sign = F.when(F.col("is_before"), F.lit(-1)).otherwise(F.lit(1))
    deltas = (
        diff_df.filter(F.col("diff_status").isin(INSERTED, DELETED, UPDATED))
        .select(
            *[expr.alias(name) for name, expr in group_cols.items()],
            *[
                (sign * expr).alias(f"__d_{name}")
                for name, expr in measures.items()
            ],
            sign.alias("__d_n"),
        )
        .groupBy(*group_cols)
        .agg(
            *[F.sum(f"__d_{name}").alias(f"__d_{name}") for name in measures],
            F.sum("__d_n").alias("__d_n"),
        )
    )
    keys = list(group_cols)
    m = mv.alias("__mv")
    d = deltas.alias("__d")
    cond = reduce(
        lambda acc, c: acc & c,
        [
            F.col(f"__mv.`{k}`").eqNullSafe(F.col(f"__d.`{k}`"))
            for k in keys
        ],
    )
    merged = m.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__mv.`{k}`"), F.col(f"__d.`{k}`")).alias(k)
            for k in keys
        ],
        *[
            (
                F.coalesce(F.col(f"__mv.`{name}`"), F.lit(0))
                + F.coalesce(F.col(f"__d.`__d_{name}`"), F.lit(0))
            ).alias(name)
            for name in measures
        ],
        (
            F.coalesce(F.col(f"__mv.`{count_col}`"), F.lit(0))
            + F.coalesce(F.col("__d.`__d_n`"), F.lit(0))
        ).alias(count_col),
    )
    return merged.filter(F.col(count_col) > 0)


# --- driver query: maintain an orders revenue MV through a mutation --------

# 30-day bucket over the epoch-micros o_orderdate projection shared with
# the oracle (testkit.prep).  The orders mutation moves some orders by a
# day — enough to migrate rows across bucket boundaries.
_BUCKET_US = 86_400_000_000 * 30

_GROUP_SQL = {
    "o_orderpriority": "o_orderpriority",
    "date_bucket": f"CAST(FLOOR(o_orderdate / {_BUCKET_US}) AS BIGINT)",
}
# Scaled-integer cents: exact, associative, identical in both engines.
_MEASURE_SQL = {
    "revenue_cents": "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
}


def _orders_mv(base: DataFrame) -> DataFrame:
    return base.groupBy(
        *[F.expr(sql).alias(name) for name, sql in _GROUP_SQL.items()]
    ).agg(
        *[
            F.sum(F.expr(sql)).alias(name)
            for name, sql in _MEASURE_SQL.items()
        ],
        F.count(F.lit(1)).alias("n_rows"),
    )


def mv_maintain_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained revenue MV == recomputed MV, demonstrated through the
    standard orders mutation (deletes, price updates, date-bucket
    migrations, inserts).  The maintained path aggregates ONLY the diff
    and merges it with the stored MV."""
    spec, mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    base = testkit.prep(load_table(spark, sf_dir, "orders"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    mv = _orders_mv(base)
    d = diff_tables(base, after, list(spec.key), mode=DiffMode.TYPED)
    return maintain_aggregate(
        mv,
        d.df,
        group_cols={k: F.expr(sql) for k, sql in _GROUP_SQL.items()},
        measures={k: F.expr(sql) for k, sql in _MEASURE_SQL.items()},
    )


def _mv_maintain_orders_sql() -> str:
    group_exprs = ", ".join(
        f"{sql} AS {name}" for name, sql in _GROUP_SQL.items()
    )
    # CAST the sum: DuckDB SUM(BIGINT) widens to HUGEINT
    measure_exprs = ", ".join(
        f"CAST(SUM({sql}) AS BIGINT) AS {name}" for name, sql in _MEASURE_SQL.items()
    )
    spec, mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    return f"""
WITH before AS ({testkit._prep_sql(spec)}),
after AS ({testkit._after_sql(spec, mut)})
SELECT {group_exprs}, {measure_exprs}, count(*) AS n_rows
FROM after
GROUP BY 1, 2
"""




# --- join-view maintenance (delta-keyed recompute) ---------------------------
#
# The second classic MV shape: V = A ⋈ B, keyed by A's key.  Algebraic
# delta joins (ΔA⋈B + A⋈ΔB + ΔA⋈ΔB) maintain it, but the clean keyed
# formulation — and the one whose cost is provably delta-bounded — is
# RECOMPUTE THE TOUCHED KEYS: every view row whose A-key changed, or
# whose B-side row changed, is re-derived from the new snapshots; all
# other view rows are carried over untouched.
#
# Scale shape: the touched-key set is diff-sized, so every step is a
# broadcast semi/anti join against it — the stored view is never
# rescanned beyond one anti-join pass, the A-side recompute scan is
# key-pruned, and the B side joins only delta-many rows.  MIN/MAX-style
# non-self-maintainable aggregates don't arise (a join view stores
# rows, not folds), which is why this composes with maintain_aggregate
# stacked on top rather than replacing it.


def maintain_join(
    view_old: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    a_diff: DataFrame,
    b_diff: DataFrame,
    a_key: str,
    fk: str,
    b_key: str,
) -> DataFrame:
    """Bring ``view_old`` (= old A ⋈ old B on ``fk = b_key``, unique
    per ``a_key``) up to date from the two snapshot diffs.

    ``a_diff``/``b_diff`` are ``DiffResult.df`` frames for A and B.
    Law (pinned by the driver query): the result is row-for-row equal
    to ``a_new ⋈ b_new``."""
    changed_a = a_diff.select(a_key).distinct()
    changed_b_keys = b_diff.select(b_key).distinct()
    # orders referencing a changed B row (fk join, delta-sized output);
    # rows of A that themselves changed are covered by changed_a
    via_b = (
        a_new.join(
            F.broadcast(changed_b_keys), a_new[fk] == changed_b_keys[b_key]
        )
        .select(a_key)
    )
    affected = changed_a.unionByName(via_b).distinct()
    carried = view_old.join(F.broadcast(affected), a_key, "left_anti")
    recomputed = (
        a_new.join(F.broadcast(affected), a_key, "left_semi")
        .join(b_new, a_new[fk] == b_new[b_key])
    )
    return carried.unionByName(recomputed.select(*view_old.columns))


_JOIN_VIEW_COLS = [
    "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
    "c_name", "c_acctbal", "c_nationkey",
]


def mv_maintain_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained orders⋈customer view == recomputed view, with BOTH
    sides mutating (order deletes/price/date updates/inserts; customer
    balance updates/inserts/deletes).  Only the touched keys are
    re-derived."""
    o_spec, o_mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    c_spec, c_mut = testkit.SPECS["customer"], testkit.MUTATIONS["customer"]
    o_base = testkit.prep(load_table(spark, sf_dir, "orders"), o_spec)
    o_after = testkit.apply_mutation(o_base, o_spec, o_mut)
    c_base = testkit.prep(load_table(spark, sf_dir, "customer"), c_spec)
    c_after = testkit.apply_mutation(c_base, c_spec, c_mut)
    view_old = o_base.join(
        c_base, o_base.o_custkey == c_base.c_custkey
    ).select(*_JOIN_VIEW_COLS)
    d_o = diff_tables(o_base, o_after, list(o_spec.key), mode=DiffMode.TYPED)
    d_c = diff_tables(c_base, c_after, list(c_spec.key), mode=DiffMode.TYPED)
    maintained = maintain_join(
        view_old,
        o_after,
        c_after,
        d_o.df,
        d_c.df,
        a_key="o_orderkey",
        fk="o_custkey",
        b_key="c_custkey",
    )
    return maintained


def _mv_maintain_join_sql() -> str:
    o_spec, o_mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    c_spec, c_mut = testkit.SPECS["customer"], testkit.MUTATIONS["customer"]
    cols = ", ".join(f'"{c}"' for c in _JOIN_VIEW_COLS)
    return f"""
WITH o_before AS ({testkit._prep_sql(o_spec)}),
o_after AS ({testkit._after_sql(o_spec, o_mut, src='o_before')}),
c_before AS ({testkit._prep_sql(c_spec)}),
c_after AS ({testkit._after_sql(c_spec, c_mut, src='c_before')})
SELECT {cols}
FROM o_after JOIN c_after ON o_custkey = c_custkey
"""


QUERIES = {
    "mv_maintain_orders": (mv_maintain_orders, _mv_maintain_orders_sql()),
    "mv_maintain_join_orders": (mv_maintain_join_orders, _mv_maintain_join_sql()),
}
