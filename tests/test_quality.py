"""Data-quality tier invariants (oracle parity covers exact values)."""

from dbdiff_spark import testkit
from dbdiff_spark.io import load_table
from dbdiff_spark.ops.quality import DRIFT_COLS, drift_report, integrity_audit


def test_drift_is_zero_for_identical_snapshots(spark, sf_dir):
    spec = testkit.SPECS["lineitem"]
    base = testkit.prep(load_table(spark, sf_dir, "lineitem"), spec)
    res = drift_report(base, base, DRIFT_COLS).collect()
    assert len(res) == len(DRIFT_COLS)
    for r in res:
        assert r.l1_distance == 0 and r.drift_ppm == 0
        assert r.n_before == r.n_after


def test_drift_bounded_by_total_mass(spark, sf_dir):
    spec, mut = testkit.SPECS["lineitem"], testkit.MUTATIONS["lineitem"]
    base = testkit.prep(load_table(spark, sf_dir, "lineitem"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    for r in drift_report(base, after, DRIFT_COLS).collect():
        assert 0 <= r.drift_ppm <= 2_000_000
        assert r.l1_distance <= r.n_before + r.n_after


def test_integrity_audit_reports_real_orphans(spark, sf_dir):
    res = {(r.check_name, r.target): r.violations
           for r in integrity_audit(spark, sf_dir).collect()}
    # customer deletes (%10=7) sever orders FKs → real orphans
    assert res[("fk_orphan", "orders->customer")] > 0
    # orders deletes (%11=4) orphan their lineitems
    assert res[("fk_orphan", "lineitem->orders")] > 0
    # base lineitem keys are non-null; duplicates possible in the
    # synthetic data (composite key not unique) — just present
    assert ("pk_duplicate", "lineitem") in res
    assert res[("pk_null", "customer")] == 0


def test_funnel_stage_counts_monotone(spark, sf_dir):
    from dbdiff_spark.ops.temporal import funnel_conversion

    rows = sorted(funnel_conversion(spark, sf_dir).collect(),
                  key=lambda r: r.stage_ord)
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True)  # each stage loses users
    assert rows[0].conv_ppm == 1_000_000
    for r in rows[1:]:
        assert 0 <= r.conv_ppm <= 1_000_000


def test_retention_offset_zero_is_cohort_size(spark, sf_dir):
    from dbdiff_spark.ops.temporal import retention_cohorts

    rows = retention_cohorts(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, {})[r.offset] = r.n_users
    for cohort, offs in by_cohort.items():
        assert 0 in offs  # every cohort has its founding day
        assert all(n <= offs[0] for n in offs.values())


def test_profile_table_per_type_branches(spark):
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.quality import profile_table

    df = spark.createDataFrame(
        [(1, "aa", 1.5), (2, None, None), (2, "b", 2.5)],
        "k bigint, s string, x double",
    )
    prof = {r.column_name: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "x"}
    k = prof["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 0, 2)
    assert (k.min_num, k.max_num) == (1.0, 2.0)
    assert k.min_str is None and k.total_len is None
    s = prof["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert (s.min_str, s.max_str, s.total_len) == ("aa", "b", 3)
    assert s.min_num is None
    x = prof["x"]
    assert (x.n_nulls, x.min_num, x.max_num) == (1, 1.5, 2.5)
    # approx path keeps the same shape (values may differ on distinct)
    approx = {r.column_name: r for r in profile_table(df, exact_distinct=False).collect()}
    assert set(approx) == {"k", "s", "x"}
    assert approx["k"].n_nulls == 0


def test_cascade_delete_conservation_and_no_orphans(spark, sf_dir):
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.quality import FORGET_MOD, cascade_delete

    frames = {
        "customer": load_table(spark, sf_dir, "customer"),
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
    }
    kept, report = cascade_delete(
        frames,
        root="customer",
        root_condition=F.col("c_custkey") % FORGET_MOD == 0,
        edges=[
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    rep = {r.table_name: r for r in report.collect()}
    for name, df in frames.items():
        # conservation: deleted + remaining == total
        assert rep[name].n_deleted + rep[name].n_remaining == df.count()
        assert kept[name].count() == rep[name].n_remaining
    # the point of the cascade: kept orders reference only kept customers
    orphans = kept["orders"].join(
        kept["customer"].selectExpr("c_custkey AS o_custkey"),
        "o_custkey",
        "left_anti",
    )
    assert orphans.count() == 0


def test_outlier_fences_order_and_bounds(spark, sf_dir):
    from dbdiff_spark.ops.quality import outlier_report_lineitem

    for r in outlier_report_lineitem(spark, sf_dir).collect():
        assert r.lo_fence <= r.q1 <= r.q3 <= r.hi_fence
        assert r.iqr == r.q3 - r.q1 >= 0
        assert 0 <= r.n_below + r.n_above <= r.n_rows


def test_sequence_gaps_exceed_threshold_and_peak_sane(spark, sf_dir):
    from dbdiff_spark.ops.temporal import (
        GAP_US,
        peak_concurrency,
        sequence_gaps,
    )

    gaps = sequence_gaps(spark, sf_dir).collect()
    assert all(r.gap_us == r.gap_end_us - r.gap_start_us > GAP_US for r in gaps)
    peaks = peak_concurrency(spark, sf_dir).collect()
    assert peaks
    for r in peaks:
        assert r.peak_concurrent >= 1


def test_validate_rules_null_predicate_is_violation_one_scan(spark):
    from dbdiff_spark.ops.quality import validate_rules

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5)], "id int, amount int"
    )
    res = {r.rule_name: r for r in validate_rules(
        df,
        [("amount_positive", "amount > 0"), ("id_small", "id < 100")],
    ).collect()}
    # NULL amount fails the expectation (cannot be shown to hold)
    assert res["amount_positive"].n_violations == 2
    assert not res["amount_positive"].passed
    assert res["id_small"].n_violations == 0 and res["id_small"].passed
    assert all(r.n_rows == 3 for r in res.values())
    plan = validate_rules(df, [("p", "id > 0")])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1  # all rules in one pass


def test_cascade_delete_passes_through_uncascaded_tables(spark, sf_dir):
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.quality import cascade_delete

    frames = {
        "customer": load_table(spark, sf_dir, "customer"),
        "region": load_table(spark, sf_dir, "region"),  # no edge touches it
    }
    kept, report = cascade_delete(
        frames,
        root="customer",
        root_condition=F.col("c_custkey") % 2 == 0,
        edges=[],
    )
    assert kept["region"].count() == frames["region"].count()
    assert {r.table_name for r in report.collect()} == {"customer"}


def test_event_transitions_conserve_and_normalize(spark, sf_dir):
    """Markov-statistics laws: total transitions equal Σ_user
    (n_events − 1) over timestamped events, and each prev-type's ppm
    row sums to 1e6 within the floor-division slack (one unit per
    outgoing edge)."""
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.temporal import event_transitions

    out = event_transitions(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    expected = (
        ev.groupBy("user_id").agg((F.count(F.lit(1)) - 1).alias("m"))
        .agg(F.sum("m")).collect()[0][0]
    )
    assert sum(r.n_transitions for r in out) == expected

    by_prev: dict = {}
    for r in out:
        by_prev.setdefault(r.prev_type, []).append(r.p_ppm)
    for prev, ppms in by_prev.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000, prev


def test_numeric_correlations_match_numpy_and_bounds(spark, sf_dir):
    """The integer-moment Pearson formula must agree with a direct
    numpy recompute on the same quantized grids (to the ppm unit) and
    stay inside [-1e6, 1e6]."""
    import numpy as np

    from dbdiff_spark.ops.quality import numeric_correlations

    row = numeric_correlations(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(ROUND(l_quantity) AS BIGINT) AS q",
            "CAST(ROUND(l_discount * 1000000) AS BIGINT) AS d",
            "CAST(ROUND(l_tax * 1000000) AS BIGINT) AS t",
        )
        .toPandas()
    )
    assert row.n_rows == len(pdf)
    for col_a, col_b, got in (
        ("q", "d", row.corr_qty_disc_ppm),
        ("q", "t", row.corr_qty_tax_ppm),
        ("d", "t", row.corr_disc_tax_ppm),
    ):
        expect = np.corrcoef(pdf[col_a], pdf[col_b])[0, 1] * 1_000_000
        assert abs(got - expect) <= 1, (col_a, col_b, got, expect)
        assert -1_000_000 <= got <= 1_000_000


def test_rfm_segments_partition_customers(spark, sf_dir):
    """RFM laws: segment counts partition the customer base exactly;
    every label is three digits in 1..4; monetary mass conserves."""
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.analytics import rfm_segments

    rows = rfm_segments(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    total_cents = orders.agg(
        F.expr("sum(CAST(ROUND(o_totalprice * 100) AS BIGINT))")
    ).collect()[0][0]
    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.total_cents for r in rows) == total_cents
    for r in rows:
        assert len(r.segment) == 3
        assert all(c in "1234" for c in r.segment)


def test_wilson_bound_shrinks_small_samples(spark, tmp_path):
    """A 2/2-returns supplier must rank BELOW a 90/100 one: the Wilson
    lower bound discounts small samples even at a perfect raw rate."""
    rows = [(1, "R")] * 90 + [(1, "N")] * 10 + [(2, "R")] * 2
    df = spark.createDataFrame(
        [(i, k, f) for i, (k, f) in enumerate(rows)],
        "l_orderkey bigint, l_suppkey bigint, l_returnflag string",
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    from dbdiff_spark.ops.analytics import supplier_return_quality

    out = supplier_return_quality(spark, str(tmp_path)).collect()
    assert [r.l_suppkey for r in out] == [1, 2]
    assert out[0].wilson_lb_ppm > out[1].wilson_lb_ppm
    assert out[1].n_returns == 2 and out[1].n_lines == 2
