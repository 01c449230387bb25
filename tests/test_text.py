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


def test_vocab_coverage_cut_and_tiebreak(spark, tmp_path):
    """VOCAB_SIZE most frequent tokens with (count DESC, token ASC)
    tie-break; OOV = everything past the cut."""
    import dbdiff_spark.ops.text as text

    # 20 distinct tokens: z00..z19, token z_i appears (20 - i) times,
    # so ranks are unambiguous except we also pin the tie path below
    rows = []
    did = 0
    for i in range(20):
        for _ in range(20 - i):
            rows.append((did, f"z{i:02d}"))
            did += 1
    # one doc holding every token once: its OOV count = tokens past the cut
    rows.append((did, " ".join(f"z{i:02d}" for i in range(20))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in text.vocab_coverage(spark, str(tmp_path)).collect()}
    probe = out[did]
    # vocab = z00..z15 (top 16 by count); z16..z19 are OOV
    assert probe.n_tokens == 20 and probe.n_oov == 4
    assert abs(probe.oov_rate - 0.2) < 1e-12
    # single-token docs: in-vocab ones report 0 OOV, tail ones 1
    assert out[0].n_oov == 0          # z00, rank 1
    assert out[len(rows) - 2].n_oov == 1  # the last z19 doc, past the cut


def test_gopher_oracle_matches_engine_on_token_free_docs(spark, tmp_path):
    """Empty and punctuation-only docs: the engine reports 0 chars /
    keep=true; the DuckDB twin must agree (list_sum([]) is NULL in
    DuckDB — regression for the missing coalesce)."""
    import duckdb

    from dbdiff_spark.ops.text import GOPHER_REPETITION_SQL

    docs = spark.createDataFrame(
        [(0, ""), (1, "!!! ... ???"), (2, "real words appear here twice twice")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    engine = {
        r.doc_id: (r.n_token_chars, r.keep)
        for r in gopher_repetition(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    oracle = {
        row[0]: (row[1], row[7])
        for row in con.execute(GOPHER_REPETITION_SQL).fetchall()
    }
    assert engine == oracle
    assert engine[0] == (0, True) and engine[1] == (0, True)


def test_vocab_growth_curve_laws(spark, sf_dir):
    """The curve's last point must equal the corpus totals (vocab ==
    global distinct tokens, tokens_cum == total token count), both
    cumulative columns must be non-decreasing, and each checkpoint's
    vocab gain equals its n_new_tokens."""
    from pyspark.sql import functions as F

    from dbdiff_spark.io import load_table
    from dbdiff_spark.ops.text import _TOKENS, vocab_growth_curve

    rows = sorted(
        vocab_growth_curve(spark, sf_dir).collect(), key=lambda r: r.checkpoint
    )
    toks = (
        load_table(spark, sf_dir, "documents")
        .selectExpr(f"explode({_TOKENS}) AS t")
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("t").alias("v")
    ).collect()[0]
    assert rows[-1].tokens_cum == totals.n
    assert rows[-1].vocab_size == totals.v
    prev_tok = prev_voc = 0
    for r in rows:
        assert r.tokens_cum >= prev_tok and r.vocab_size >= prev_voc
        assert r.vocab_size - prev_voc == r.n_new_tokens
        prev_tok, prev_voc = r.tokens_cum, r.vocab_size
