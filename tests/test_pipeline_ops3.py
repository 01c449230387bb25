"""Law-based tests for the third round-3 wave of pipeline operators —
each asserts a semantic invariant the DuckDB value-hash comparison
cannot express (cross-representation equivalence, guaranteed-drop
counts, geometric normalization)."""

import math

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dbdiff_spark.io import load_table
from dbdiff_spark.ops.similarity import pca_power_iteration, semdedup_prune
from dbdiff_spark.ops.text import PHRASE, _TOKENS, phrase_search


def test_phrase_search_matches_direct_text_scan(spark, sf_dir):
    """Index-answered phrase search ≡ a direct adjacent-token scan of
    the text: the position-posting intersection must find exactly the
    occurrences a zip_with sweep over the raw token arrays finds."""
    w1, w2 = PHRASE
    via_index = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_search(spark, sf_dir).collect()
    }
    direct = {
        (r["doc_id"], r["n_matches"])
        for r in load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_TOKENS} AS t")
        .selectExpr(
            "doc_id",
            "CAST(size(filter(zip_with("
            " slice(t, 1, greatest(size(t) - 1, 0)),"
            " slice(t, 2, greatest(size(t) - 1, 0)),"
            f" (a, b) -> a = '{w1}' AND b = '{w2}'), x -> x)) AS BIGINT)"
            " AS n_matches",
        )
        .filter(F.col("n_matches") > 0)
        .collect()
    }
    assert via_index == direct and direct


def test_semdedup_drops_every_injected_copy(spark, sf_dir):
    """The op unions an exact copy of every vector (shifted ids): each
    copy shares its original's cluster with cosine exactly 1 ≥ τ, so the
    drop count must cover at least all copies — and members must total
    exactly 2× the corpus."""
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = semdedup_prune(spark, sf_dir).collect()
    assert sum(r["n_vectors"] for r in rows) == 2 * n_vecs
    assert sum(r["n_dropped"] for r in rows) >= n_vecs
    assert all(r["n_dropped"] < r["n_vectors"] for r in rows)


def test_semdedup_copies_land_in_their_originals_cell(spark, sf_dir):
    """The mechanism, not just the counts: a copy has the same embedding
    as its original, hence the same argmin cell — so every cell's
    membership must be even (originals and copies pair up)."""
    rows = semdedup_prune(spark, sf_dir).collect()
    assert rows and all(r["n_vectors"] % 2 == 0 for r in rows)


def test_pca_direction_is_unit_norm(spark, sf_dir):
    rows = pca_power_iteration(spark, sf_dir).collect()
    assert len(rows) == 64
    norm = math.sqrt(sum(r["loading"] ** 2 for r in rows))
    assert abs(norm - 1.0) < 1e-12


def test_tolerance_masks_only_within_epsilon(spark, sf_dir):
    """Epsilon-tolerant diff: changes within |eps| disappear entirely
    (row drops from the diff), larger changes keep reporting, and the
    modified-column set reflects the tolerant comparator."""
    from dbdiff_spark import DiffMode, diff_tables
    from dbdiff_spark import testkit
    from dbdiff_spark.io import load_table

    spec, mut = testkit.SPECS["orders"], testkit.MUTATIONS["orders"]
    base = testkit.prep(load_table(spark, sf_dir, "orders"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    plain = diff_tables(base, after, list(spec.key), mode=DiffMode.TYPED).df
    tol = diff_tables(
        base, after, list(spec.key), mode=DiffMode.TYPED,
        tolerance={"o_totalprice": 100000.0},
    ).df
    # doubled price ⇒ delta == old price: every masked row had price <= eps
    masked = (
        plain.filter("diff_status = 'UPDATED' AND is_before")
        .join(
            tol.filter("diff_status = 'UPDATED' AND is_before")
            .select("o_orderkey"),
            "o_orderkey",
            "left_anti",
        )
    )
    assert masked.count() > 0
    assert masked.filter("o_totalprice > 100000.0").count() == 0
    kept = tol.filter(
        "diff_status = 'UPDATED' AND is_before"
        " AND array_contains(modified_columns, 'o_totalprice')"
    )
    assert kept.filter("o_totalprice <= 100000.0").count() == 0
    assert kept.count() > 0


def test_tolerance_never_flips_nan_pairs_to_changed(spark):
    """NaN≡NaN is unchanged under the exact comparator; a tolerance must
    only MASK changes, never create one — so a NaN-vs-NaN row stays out
    of the diff, and NaN-vs-number stays in."""
    from dbdiff_spark import DiffMode, diff_tables

    rows = [(1, float("nan")), (2, float("nan")), (3, 5.0)]
    before = spark.createDataFrame(rows, "k int, v double")
    after = spark.createDataFrame(
        [(1, float("nan")), (2, 7.0), (3, 5.0)], "k int, v double"
    )
    exact = diff_tables(before, after, ["k"], mode=DiffMode.TYPED).df
    tol = diff_tables(
        before, after, ["k"], mode=DiffMode.TYPED, tolerance={"v": 0.5}
    ).df
    assert {r["k"] for r in exact.collect()} == {2}
    assert {r["k"] for r in tol.collect()} == {2}


def test_estimate_zero_on_identical_inputs_with_duplicate_keys(spark, sf_dir):
    """Identical inputs must estimate ZERO changes even when the declared
    key is not unique (lineitem's fixture key has ~1k duplicate pairs):
    the estimator collapses duplicates last-wins exactly like
    diff_snapshots — without that, cross-matching duplicates fabricated
    thousands of phantom updates (caught by a CLI drive)."""
    from dbdiff_spark import estimate_diff_counts
    from dbdiff_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = estimate_diff_counts(
        li, li, ["l_orderkey", "l_linenumber"], rate_inv=8
    ).collect()[0]
    assert (
        row["n_sample_changes"],
        row["est_inserted"],
        row["est_deleted"],
        row["est_updated"],
    ) == (0, 0, 0, 0)
