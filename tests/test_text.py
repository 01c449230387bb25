"""Semantic tests for text-analysis operators (beyond the oracle-parity
sweep, which pins Spark==DuckDB but not that both match the SPEC)."""

from dbdiff_spark.ops.text import gopher_repetition


def test_gopher_repetition_known_values(spark, tmp_path):
    """Hand-computed Gopher repetition stats: a maximally repetitive
    doc, an empty doc, and a repetition-free doc."""
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),
            (1, ""),
            (2, " ".join(f"w{i}" for i in range(30))),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in gopher_repetition(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1, 2}

    # doc 0: tokens [a b a b a b] → bigram "a b"×3, "b a"×2; top = "a b",
    # chars("ab")=2 → top2_chars 6 over 6 token chars = 1.0;
    # trigrams "a b a"×2 + "b a b"×2, 3 chars each → dup3 = 12
    r0 = rows[0]
    assert r0.top_bigram == "a b"
    assert (r0.n_token_chars, r0.top2_chars, r0.dup3_chars) == (6, 6, 12)
    assert r0.top2_char_frac == 1.0 and r0.dup3_char_frac == 2.0
    assert not r0.keep

    # doc 1: empty → zero everywhere, kept (fractions defined as 0)
    r1 = rows[1]
    assert (r1.n_token_chars, r1.top2_chars, r1.dup3_chars) == (0, 0, 0)
    assert r1.top_bigram == "" and r1.keep

    # doc 2: 30 distinct tokens → no duplicate trigram, every bigram
    # count 1, tiny top fraction → kept
    r2 = rows[2]
    assert r2.dup3_chars == 0 and r2.keep
