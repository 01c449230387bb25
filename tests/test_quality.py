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
