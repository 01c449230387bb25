"""Property tests for the governance tier: the cascade-delete laws and
the skew-report ranking hold for ANY generated FK graph / key multiset
(hypothesis), not just the TPC-H fixtures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbdiff_spark.ops.quality import cascade_delete
from dbdiff_spark.ops.skew import join_skew_report


@st.composite
def fk_universe(draw):
    roots = sorted(draw(st.sets(st.integers(0, 30), min_size=1, max_size=12)))
    # children reference real roots, dangling keys, or NULL
    refs = st.one_of(
        st.sampled_from(roots), st.integers(100, 110), st.none()
    )
    children = draw(st.lists(refs, min_size=0, max_size=30))
    mod = draw(st.integers(2, 5))
    return roots, children, mod


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(u=fk_universe())
def test_cascade_laws_hold_for_any_fk_graph(spark, u):
    roots, children, mod = u
    parent = spark.createDataFrame([(k,) for k in roots], "pk int")
    child = spark.createDataFrame(
        [(i, fk) for i, fk in enumerate(children)] or [(None, None)],
        "cid int, fk int",
    ).filter("cid IS NOT NULL")
    kept, report = cascade_delete(
        {"parent": parent, "child": child},
        root="parent",
        root_condition=F.col("pk") % mod == 0,
        edges=[("child", "fk", "parent", "pk")],
    )
    rep = {r.table_name: r for r in report.collect()}
    # conservation per table
    assert rep["parent"].n_deleted + rep["parent"].n_remaining == parent.count()
    assert rep["child"].n_deleted + rep["child"].n_remaining == child.count()
    kept_parent = {r.pk for r in kept["parent"].collect()}
    kept_child = kept["child"].collect()
    # no kept child references a deleted root; NULL/dangling fks survive
    deleted_roots = {k for k in roots if k % mod == 0}
    for r in kept_child:
        assert r.fk not in deleted_roots
    # exact deletion semantics: a child is deleted iff fk in deleted roots
    expected_child_deleted = sum(1 for fk in children if fk in deleted_roots)
    assert rep["child"].n_deleted == expected_child_deleted
    assert kept_parent == set(roots) - deleted_roots


@st.composite
def key_multisets(draw):
    left = draw(st.lists(st.integers(0, 8), min_size=0, max_size=40))
    right = draw(st.lists(st.integers(0, 8), min_size=0, max_size=40))
    return left, right


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ks=key_multisets())
def test_skew_report_matches_brute_force(spark, ks):
    left_keys, right_keys = ks
    from collections import Counter

    lc, rc = Counter(left_keys), Counter(right_keys)
    expect = {
        k: (lc.get(k, 0), rc.get(k, 0), lc.get(k, 0) * rc.get(k, 0))
        for k in set(lc) | set(rc)
    }
    if not expect:
        return
    left = spark.createDataFrame([(k,) for k in left_keys] or [(None,)], "k int").filter(
        "k IS NOT NULL"
    )
    right = spark.createDataFrame([(k,) for k in right_keys] or [(None,)], "k int").filter(
        "k IS NOT NULL"
    )
    rows = join_skew_report(left, right, "k", "k", top_n=100).collect()
    got = {r.join_key: (r.n_left, r.n_right, r.est_pairs) for r in rows}
    assert got == expect
    # ranking: est_pairs non-increasing, key ascending within ties
    ordered = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.est_pairs, -a.join_key) >= (b.est_pairs, -b.join_key)
