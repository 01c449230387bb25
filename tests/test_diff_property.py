"""Property-based diff test (SURVEY §5.2 item 4, via hypothesis):
for ANY base table and ANY disjoint mutation plan (inserts with fresh
keys, updates, deletes), the diff recovers exactly the mutated keys with
exactly the touched columns."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbdiff_spark.diff import DELETED, INSERTED, UPDATED, DiffMode, diff_tables

KEYS = st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=25)


@st.composite
def mutation_plan(draw):
    base_keys = sorted(draw(KEYS))
    n = len(base_keys)
    deletes = set(draw(st.sets(st.sampled_from(base_keys), max_size=n)))
    updatable = [k for k in base_keys if k not in deletes]
    if updatable:
        upd_a = set(draw(st.sets(st.sampled_from(updatable), max_size=len(updatable))))
        upd_b = set(draw(st.sets(st.sampled_from(updatable), max_size=len(updatable))))
    else:
        upd_a, upd_b = set(), set()
    inserts = set(draw(st.sets(st.integers(min_value=100, max_value=160), max_size=10)))
    return base_keys, deletes, upd_a, upd_b, inserts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=mutation_plan())
def test_diff_recovers_any_mutation_exactly(spark, plan):
    base_keys, deletes, upd_a, upd_b, inserts = plan
    before = spark.createDataFrame(
        [(k, f"a{k}", f"b{k}") for k in base_keys], "id int, a string, b string"
    )
    after_rows = [
        (
            k,
            f"A{k}" if k in upd_a else f"a{k}",
            f"B{k}" if k in upd_b else f"b{k}",
        )
        for k in base_keys
        if k not in deletes
    ] + [(k, f"a{k}", f"b{k}") for k in sorted(inserts)]
    after = spark.createDataFrame(after_rows, "id int, a string, b string")

    res = diff_tables(before, after, ["id"], mode=DiffMode.TYPED)
    rows = res.df.collect()

    got = {}
    for r in rows:
        got.setdefault((r["id"], r["diff_status"]), []).append(r)

    expect_updated = {k for k in (upd_a | upd_b) if k not in deletes}
    assert {k for (k, s) in got if s == DELETED} == deletes
    assert {k for (k, s) in got if s == INSERTED} == inserts
    assert {k for (k, s) in got if s == UPDATED} == expect_updated
    for k in expect_updated:
        pair = got[(k, UPDATED)]
        assert len(pair) == 2
        expect_cols = (["a"] if k in upd_a else []) + (["b"] if k in upd_b else [])
        for r in pair:
            assert r["modified_columns"] == expect_cols


ROWS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.sampled_from(["x", "y"])),
    max_size=20,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b_rows=ROWS, a_rows=ROWS)
def test_all_columns_key_equals_foj_formulation(spark, b_rows, a_rows):
    """The one-shuffle all-columns-key rewrite must emit exactly what the
    full-outer-join formulation emits, for ANY multisets on either side
    (duplicates exercise the m×n match/m-exclusive expansion cases).
    include_unchanged=True forces the generic FOJ path, giving the
    reference behavior to compare against."""
    from pyspark.sql import functions as F

    schema = "id int, s string"
    before = spark.createDataFrame(b_rows, schema)
    after = spark.createDataFrame(a_rows, schema)
    fast = diff_tables(before, after, ["id", "s"], mode=DiffMode.TYPED)
    foj = diff_tables(
        before, after, ["id", "s"], mode=DiffMode.TYPED, include_unchanged=True
    )
    fast_rows = sorted(
        (r["diff_status"], r["is_before"], r["id"], r["s"])
        for r in fast.df.collect()
    )
    foj_rows = sorted(
        (r["diff_status"], r["is_before"], r["id"], r["s"])
        for r in foj.df.filter(F.col("diff_status") != "NOT_MODIFIED").collect()
    )
    assert fast_rows == foj_rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=mutation_plan())
def test_apply_diff_roundtrip_any_mutation(spark, plan):
    """For ANY base and ANY mutation plan: apply(b, diff(b, a)) == a,
    and re-applying is idempotent."""
    from dbdiff_spark.diff import apply_diff

    base_keys, deletes, upd_a, upd_b, inserts = plan
    before = spark.createDataFrame(
        [(k, f"a{k}", f"b{k}") for k in base_keys], "id int, a string, b string"
    )
    after_rows = [
        (
            k,
            f"A{k}" if k in upd_a else f"a{k}",
            f"B{k}" if k in upd_b else f"b{k}",
        )
        for k in base_keys
        if k not in deletes
    ] + [(k, f"a{k}", f"b{k}") for k in sorted(inserts)]
    after = spark.createDataFrame(after_rows, "id int, a string, b string")

    d = diff_tables(before, after, ["id"], mode=DiffMode.TYPED).df
    rebuilt = apply_diff(before, d, ["id"])
    assert rebuilt.exceptAll(after).count() == 0
    assert after.exceptAll(rebuilt).count() == 0
    again = apply_diff(rebuilt, d, ["id"])
    assert again.exceptAll(after).count() == 0
    assert after.exceptAll(again).count() == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b_rows=ROWS, a_rows=ROWS)
def test_multiset_strategies_agree_on_any_multisets(spark, b_rows, a_rows):
    """All three diff_multiset strategies (hash_first / one_pass /
    full_row) must produce the identical changed-row multiset for ANY
    pair of input multisets — duplicates, NULL-free small domains, and
    empty sides included."""
    from dbdiff_spark.diff import diff_multiset

    schema = "id int, s string"
    before = spark.createDataFrame(b_rows, schema)
    after = spark.createDataFrame(a_rows, schema)
    outs = [
        sorted(tuple(r) for r in diff_multiset(before, after, strategy=s).collect())
        for s in ("hash_first", "one_pass", "full_row")
    ]
    assert outs[0] == outs[1] == outs[2]


@st.composite
def numeric_mutation(draw):
    keys = sorted(draw(st.sets(st.integers(0, 40), min_size=1, max_size=20)))
    deltas = {
        k: draw(
            st.floats(
                min_value=-100.0, max_value=100.0,
                allow_nan=False, allow_infinity=False,
            )
        )
        for k in keys
        if draw(st.booleans())
    }
    eps = draw(st.floats(min_value=0.0, max_value=50.0, allow_nan=False))
    return keys, deltas, eps


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=numeric_mutation())
def test_tolerance_laws_on_any_numeric_mutation(spark, plan):
    """Laws for any numeric mutation: (1) eps=0 behaves exactly like the
    exact diff; (2) with eps>0, the flagged key set is precisely the
    keys whose |delta| exceeds eps (tolerance masks, never invents)."""
    keys, deltas, eps = plan
    before = spark.createDataFrame(
        [(k, float(k)) for k in keys], "id int, v double"
    )
    after = spark.createDataFrame(
        [(k, float(k) + deltas.get(k, 0.0)) for k in keys], "id int, v double"
    )

    def flagged(tol):
        df = diff_tables(
            before, after, ["id"], mode=DiffMode.TYPED,
            tolerance={"v": tol} if tol is not None else None,
        ).df
        return {r["id"] for r in df.filter("is_before").collect()}

    exact = flagged(None)
    assert flagged(0.0) == exact
    # Expectation derived from the STORED difference fl(k+d) - k (what
    # the engine actually compares), not the drawn delta d — a draw
    # within a ulp of eps would otherwise flip the comparison and flake.
    expect = {
        k for k, d in deltas.items() if abs((float(k) + d) - float(k)) > eps
    }
    assert flagged(eps) == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=numeric_mutation())
def test_ignore_column_law(spark, plan):
    """Law: the flagged key set under ignore_columns=[c] equals the
    flagged key set of the diff with column c projected away entirely —
    ignoring is exactly 'the comparator never saw it' (outputs aside)."""
    keys, deltas, _eps = plan
    before = spark.createDataFrame(
        [(k, float(k), str(k % 3)) for k in keys], "id int, v double, churn string"
    )
    after = spark.createDataFrame(
        [(k, float(k) + deltas.get(k, 0.0), str((k + 1) % 3)) for k in keys],
        "id int, v double, churn string",
    )

    def flagged(df):
        return {r["id"] for r in df.filter("is_before").collect()}

    with_ignore = flagged(
        diff_tables(
            before, after, ["id"], mode=DiffMode.TYPED,
            ignore_columns=["churn"],
        ).df
    )
    projected = flagged(
        diff_tables(
            before.drop("churn"), after.drop("churn"), ["id"],
            mode=DiffMode.TYPED,
        ).df
    )
    assert with_ignore == projected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    profile=st.lists(
        # (n distinct tokens, n repeats of one token) per doc — spans
        # zero-weight (empty), flat, and max-distinctness docs
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.integers(min_value=0, max_value=30)),
        min_size=1,
        max_size=25,
    ),
    step=st.sampled_from([100_000, 300_000, 1_000_000]),
)
def test_importance_resample_telescoping_law_any_corpus(
    spark, tmp_path_factory, profile, step
):
    """Σ n_copies == total_weight div step for EVERY corpus and step —
    the systematic-sampling law is arithmetic, not distributional."""
    from dbdiff_spark.ops import corpus as corpus_mod

    tmp = tmp_path_factory.mktemp("resample")
    rows = []
    for i, (nd, nr) in enumerate(profile):
        toks = [f"w{i}x{j}" for j in range(nd)] + ["rep"] * nr
        rows.append((i, " ".join(toks)))
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp / "documents.parquet")
    )
    out = corpus_mod.importance_resample(spark, str(tmp), step=step).collect()
    total_w = 0
    for i, (nd, nr) in enumerate(profile):
        n_tok = nd + nr
        n_dist = nd + (1 if nr else 0)
        total_w += (1_000_000 * n_dist) // n_tok if n_tok else 0
    assert sum(r.n_copies for r in out) == total_w // step
