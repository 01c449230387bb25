"""Meta-tests of the oracle comparator itself: a 191-green signal is
only as trustworthy as the comparator's ability to FAIL.  Each planted
divergence class must be detected."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import canon_frame, canon_value  # noqa: E402

import pandas as pd  # noqa: E402


def test_canon_detects_value_row_and_column_divergence():
    base = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert canon_frame(base) == canon_frame(base.iloc[::-1])  # order-free

    changed_value = pd.DataFrame({"a": [1, 3], "b": ["x", "y"]})
    assert canon_frame(base)[1] != canon_frame(changed_value)[1]

    extra_row = pd.DataFrame({"a": [1, 2, 2], "b": ["x", "y", "y"]})
    assert len(canon_frame(extra_row)[1]) != len(canon_frame(base)[1])

    renamed = base.rename(columns={"b": "c"})
    assert canon_frame(base)[0] != canon_frame(renamed)[0]


def test_canon_value_distinguishes_near_misses():
    """The canonical form must NOT collapse genuinely different values:
    float vs its neighbor, int vs string digits are distinct; but the
    engine-boundary equivalences (None/NaN) do collapse."""
    assert canon_value(1.0000000000000002) != canon_value(1.0)
    assert canon_value(None) == canon_value(float("nan")) == "NULL"
    assert canon_value(True) == "True"
    assert canon_value([1, 2]) == "[1,2]"
    assert canon_value(b"\x01\xff") == "01ff"


def test_comparator_flags_a_planted_query_divergence(spark, sf_dir):
    """End-to-end: run _check_one with a deliberately wrong oracle and
    assert it FAILS (and passes with the right one)."""
    from check_oracle import _check_one

    import duckdb

    qs = {"probe": lambda s, d: s.range(3).selectExpr("id AS n")}
    good = {"probe": "SELECT * FROM (VALUES (0), (1), (2)) t(n)"}
    bad = {"probe": "SELECT * FROM (VALUES (0), (1), (99)) t(n)"}

    ok, rep = _check_one("probe", qs, good, sf_dir, spark, duckdb.connect)
    assert ok, rep
    ok, rep = _check_one("probe", qs, bad, sf_dir, spark, duckdb.connect)
    assert not ok and "values differ" in rep


def test_driver_window_spans_every_extension_family():
    """VERDICT r9 #2: the driver's correctness gate samples the FIRST
    50 ``queries()`` entries — that window must contain at least one
    oracle-backed entry from every extension family, or whole tiers
    (dedup, ANN, streaming, …) never appear in a CORRECTNESS_r*.json.
    Guards the SHOWCASE_QUERIES ordering against module/rename drift."""
    import __spark_entry__ as entry
    from dbdiff_spark.ops import (
        analytics, corpus, dedup, functions, graph, history, incremental,
        layout, multimodal, pysource, quality, retrieval, similarity,
        sketch, skew, temporal, text, tpch,
    )
    from dbdiff_spark.streaming import cdc

    q = entry.queries()
    o = entry.oracle_sql()
    window = list(q)[:50]
    assert all(n in o for n in window), [n for n in window if n not in o]
    for mod in (
        analytics, tpch, text, dedup, similarity, multimodal, functions,
        temporal, sketch, skew, corpus, incremental, layout, history,
        graph, quality, retrieval, pysource, cdc,
    ):
        fam = set(mod.QUERIES)
        hit = fam & set(window)
        assert hit, f"no {mod.__name__} entry in the driver's 50-query window"
    # the serve-only ANN entry is itself showcased: the gate exercises
    # the standing-index path, not only the rebuild twins
    assert "ann_ivf_serve" in window
