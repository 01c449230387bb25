"""SCD2 snapshot-history operator — interval semantics pinned on a
hand-built lineage that exercises every transition: stable row, update,
double update, delete-after-update, late insert, and delete-then-
reappear (which must open a NEW version, not extend the old one)."""

from dbdiff_spark.ops.history import scd2_history


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_scd2_intervals(spark):
    s0 = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (5, "e")])
    s1 = _snap(spark, [(1, "a"), (2, "B"), (4, "d"), (5, "e2")])  # 3 deleted
    s2 = _snap(spark, [(1, "a"), (2, "B2"), (3, "c9"), (4, "d")])  # 5 deleted, 3 back
    out = scd2_history(spark, [s0, s1, s2], ["k"], ["v"])
    rows = {
        (r.k, r.valid_from): (r.v, r.valid_to, r.is_current)
        for r in out.collect()
    }
    # stable key: one open interval from s0
    assert rows[(1, 0)] == ("a", None, True)
    # double update: three versions, two closed
    assert rows[(2, 0)] == ("b", 1, False)
    assert rows[(2, 1)] == ("B", 2, False)
    assert rows[(2, 2)] == ("B2", None, True)
    # delete then reappear: first version CLOSED at s1, fresh version at s2
    assert rows[(3, 0)] == ("c", 1, False)
    assert rows[(3, 2)] == ("c9", None, True)
    # late insert: opens at s1
    assert rows[(4, 1)] == ("d", None, True)
    # update then delete: final version closed at s2, nothing current
    assert rows[(5, 0)] == ("e", 1, False)
    assert rows[(5, 1)] == ("e2", 2, False)
    assert len(rows) == 9


def test_scd2_null_attrs_are_versions(spark):
    """NULL attribute values are real states: NULL→'x'→NULL is three
    versions (null-safe comparison, not IS NULL blindness)."""
    s0 = spark.createDataFrame([(1, None)], "k int, v string")
    s1 = spark.createDataFrame([(1, "x")], "k int, v string")
    s2 = spark.createDataFrame([(1, None)], "k int, v string")
    out = scd2_history(spark, [s0, s1, s2], ["k"], ["v"])
    got = sorted(
        (r.valid_from, r.v, r.valid_to, r.is_current) for r in out.collect()
    )
    assert got == [(0, None, 1, False), (1, "x", 2, False), (2, None, None, True)]


def test_scd2_apply_matches_batch_fold(spark):
    """apply(scd2(s0,s1), s2) == scd2(s0,s1,s2) on the hand-built
    lineage (incl. delete-then-reappear, where the key has NO open row
    in the history being extended)."""
    from dbdiff_spark.ops.history import scd2_apply

    s0 = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (5, "e")])
    s1 = _snap(spark, [(1, "a"), (2, "B"), (4, "d"), (5, "e2")])
    s2 = _snap(spark, [(1, "a"), (2, "B2"), (3, "c9"), (4, "d")])
    batch = scd2_history(spark, [s0, s1, s2], ["k"], ["v"])
    incr = scd2_apply(
        scd2_history(spark, [s0, s1], ["k"], ["v"]), s2, ["k"], ["v"], 2
    )
    key = lambda r: (r.k, r.valid_from, r.v, r.valid_to, r.is_current)
    assert sorted(map(key, batch.collect())) == sorted(map(key, incr.collect()))


def test_pit_join_picks_exactly_one_version_per_fact(spark, sf_dir):
    """Validity intervals partition time per key, so a PIT join must
    preserve fact cardinality (no duplicate matches) and never pick a
    version opened after the as-of ordinal."""
    from dbdiff_spark.io import load_table
    from dbdiff_spark.ops.history import scd2_pit_orders

    out = scd2_pit_orders(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert out.count() == n_orders
    assert out.filter("valid_from > as_of").count() == 0
    assert out.groupBy("o_orderkey").count().filter("count > 1").count() == 0


# --- property: SCD2 reconstruction law ---------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def snapshot_chain(draw):
    """3 snapshots as dicts key -> value, with arbitrary inserts,
    updates, deletes (incl. delete-then-reappear) between them."""
    keys = st.integers(min_value=0, max_value=20)
    vals = st.integers(min_value=0, max_value=5)
    snaps = []
    for _ in range(3):
        snaps.append(dict(draw(st.dictionaries(keys, vals, max_size=12))))
    return snaps


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=snapshot_chain())
def test_scd2_reconstruction_property(spark, snaps):
    """For ANY snapshot chain: slicing the SCD2 history at ordinal k
    (valid_from <= k < valid_to) reconstructs snapshot k exactly, and
    the incremental fold equals the batch fold."""
    from dbdiff_spark.ops.history import scd2_apply

    dfs = [
        spark.createDataFrame(
            list(s.items()) or [(None, None)], "k int, v int"
        ).filter("k IS NOT NULL")
        for s in snaps
    ]
    hist = scd2_history(spark, dfs, ["k"], ["v"])
    rows = hist.collect()
    for ord_k, snap in enumerate(snaps):
        got = {
            r.k: r.v
            for r in rows
            if r.valid_from <= ord_k and (r.valid_to is None or r.valid_to > ord_k)
        }
        assert got == snap, (ord_k, got, snap)
    # incremental == batch
    incr = scd2_apply(
        scd2_history(spark, dfs[:2], ["k"], ["v"]), dfs[2], ["k"], ["v"], 2
    )
    key = lambda r: (r.k, r.valid_from, r.v, r.valid_to, r.is_current)
    assert sorted(map(key, rows)) == sorted(map(key, incr.collect()))
