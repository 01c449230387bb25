"""Semantic tests for the retrieval-composition operators (beyond the
oracle-parity sweep, which pins Spark==DuckDB but not that both match
the SPEC)."""

from dbdiff_spark.ops.retrieval import (
    RRF_K,
    RRF_TOP,
    bpe_pair_stats,
    hybrid_retrieval_rrf,
    mmr_rerank,
    pmi_collocations,
)
from dbdiff_spark.ops.text import bm25_rank


def test_hybrid_rrf_score_recomputes_from_branch_ranks(spark, sf_dir):
    """The fused score must equal the ppm quantization of
    1/(K+bm25_rank) + 1/(K+cos_rank) with absent branches contributing
    0, ordered descending with doc_id tie-break."""
    rows = hybrid_retrieval_rrf(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == RRF_TOP
    for r in rows:
        expect = 0.0
        if r.bm25_rank is not None:
            expect += 1.0 / (RRF_K + r.bm25_rank)
        if r.cos_rank is not None:
            expect += 1.0 / (RRF_K + r.cos_rank)
        assert r.rrf_ppm == round(expect * 1_000_000)
        assert r.bm25_rank is not None or r.cos_rank is not None
    keys = [(-r.rrf_ppm, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_hybrid_rrf_draws_only_from_branch_topk(spark, sf_dir):
    """Fused docs must come from the union of the two branch top-20s,
    and a doc ranked in BOTH branches must outscore any doc holding
    only ONE of those same ranks."""
    from dbdiff_spark.ops.retrieval import _dense_topk

    fused = {r.doc_id: r for r in hybrid_retrieval_rrf(spark, sf_dir).collect()}
    sparse = {r.doc_id for r in bm25_rank(spark, sf_dir).collect()}
    dense = {r.doc_id for r in _dense_topk(spark, sf_dir).collect()}
    assert set(fused) <= sparse | dense
    both = [r for r in fused.values() if r.bm25_rank and r.cos_rank]
    single = [r for r in fused.values() if (r.bm25_rank is None) != (r.cos_rank is None)]
    for b in both:
        for s in single:
            lone = s.bm25_rank if s.bm25_rank is not None else s.cos_rank
            if lone >= min(b.bm25_rank, b.cos_rank):
                assert b.rrf_ppm > s.rrf_ppm


def test_bpe_pair_counts_known_corpus(spark, tmp_path):
    """Hand-counted merge candidates: 'abab abab a' → per token 'abab'
    pairs [ab, ba, ab]; the 1-char token contributes nothing."""
    docs = spark.createDataFrame(
        [(0, "abab abab a"), (1, "ba")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = bpe_pair_stats(spark, str(tmp_path)).collect()
    counts = {r.pair: r.n_occurrences for r in rows}
    assert counts == {"ab": 4, "ba": 3}
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].pair == "ab"


def test_pmi_collocation_lift_known_corpus(spark, tmp_path):
    """'x y c' repeated 5× → bigrams (x,y)×5, (y,c)×5, (c,x)×4.
    N=15, c(x)=c(y)=c(c)=5 → lift(x,y) = 15·5/25 = 3.0 exactly;
    (c,x) misses the min-count and must be absent."""
    docs = spark.createDataFrame(
        [(0, " ".join(["x y c"] * 5))], "doc_id bigint, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = pmi_collocations(spark, str(tmp_path)).collect()
    got = {(r.w1, r.w2): (r.c_bigram, r.pmi_ppm) for r in rows}
    assert got == {("x", "y"): (5, 3_000_000), ("y", "c"): (5, 3_000_000)}
    # deterministic tie-break: equal ppm orders by (w1, w2)
    assert [(r.w1, r.w2) for r in rows] == [("x", "y"), ("y", "c")]


def test_mmr_defers_near_duplicate_for_diversity(spark, tmp_path):
    """Probe [1,0,0,0]; vec 1 and vec 2 are near-identical high-rel
    directions, vec 3 is orthogonal (rel 0).  Plain relevance order is
    1, 2, 3 — MMR must pick 1, then 3 (sim-to-1 penalty sinks 2's
    objective below 0), then 2."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [10.0, 1.0, 0.0, 0.0], 0),
        (2, [10.0, 1.2, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0, 0.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = mmr_rerank(spark, str(tmp_path)).collect()
    assert [(r.rank, r.doc_id) for r in got] == [(1, 1), (2, 3), (3, 2)]
    # cand_rank preserves the pre-MMR relevance ordering
    assert [r.cand_rank for r in got] == [1, 3, 2]


def test_bpe_train_learns_composed_merges(spark, tmp_path):
    """4 docs of 'ababab': round 1 adopts 'ab' (3/doc); re-segmented
    '111' adopts (1,1) → expansion 'abab' (2/doc); re-segmented '21'
    adopts (2,1) → expansion 'ababab' (1/doc).  Pins greedy
    leftmost-first pairing AND placeholder expansion through two levels
    of composition."""
    from dbdiff_spark.ops.retrieval import bpe_train_merges

    docs = [(i, "ababab") for i in range(4)]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = bpe_train_merges(spark, str(tmp_path)).collect()
    assert [(r.step, r.merge_text, r.n_occurrences) for r in rows] == [
        (1, "ab", 12),
        (2, "abab", 8),
        (3, "ababab", 4),
    ]


def test_rag_funnel_consistent_with_chunker_and_dedup(spark, sf_dir):
    """The funnel's counts must agree with the standalone UDTF chunker:
    n_chunks == chunk_documents row count, n_canonical == its distinct
    chunk_md5 count, and postings/tokens/vocab are bounded sanely."""
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.retrieval import rag_index_funnel
    from dbdiff_spark.ops.text import chunk_documents

    row = rag_index_funnel(spark, sf_dir).collect()[0]
    ch = chunk_documents(spark, sf_dir)
    assert row.n_chunks == ch.count()
    assert row.n_canonical == ch.select("chunk_md5").distinct().count()
    assert 0 < row.n_postings <= row.n_tokens_indexed
    assert 0 < row.vocab_size <= row.n_postings


def test_bpe_batch_adopts_disjoint_merges_and_applies_exactly(spark, tmp_path):
    """A corpus engineered so one round offers several disjoint pairs:
    the batch trainer must adopt them all in ONE round (the whole point
    vs bpe_train_merges), every round's adopted pairs must be pairwise
    symbol-disjoint (the dominance-filter invariant), and the
    distributed apply must reconstruct every token (0 round-trip
    failures) with symbol counts consistent with the merge count."""
    from dbdiff_spark.ops.retrieval import (
        BPE_BATCH_M,
        bpe_apply_tokens,
        bpe_train_batch,
    )

    # 'xy', 'pq', 'uv' are symbol-disjoint and each dominates nothing
    # above it; frequencies descend so ranks are stable
    docs = [(i, "xyxy pqpq uvuv xy pq") for i in range(4)]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    merges = bpe_train_batch(spark, str(tmp_path)).collect()
    round1 = sorted(
        (r.merge_text, r.n_occurrences) for r in merges if r.round == 1
    )
    # all three disjoint pairs adopted in round 1
    assert [m for m, _ in round1[:3]] == ["pq", "uv", "xy"] or {
        "xy", "pq", "uv"
    } <= {m for m, _ in round1}
    by_round = {}
    for r in merges:
        by_round.setdefault(r.round, []).append(r)
    for rnd, rows in by_round.items():
        assert len(rows) <= BPE_BATCH_M
        # adopted merge texts within a round never share a symbol at
        # the SEGMENT level: re-derive raw pairs is internal, but the
        # expanded texts of a round are built from disjoint raw pairs,
        # so their slot ordering is dense and unique
        assert sorted(r.slot for r in rows) == list(range(1, len(rows) + 1))

    out = {r.doc_id: r for r in bpe_apply_tokens(spark, str(tmp_path)).collect()}
    assert len(out) == 4
    for r in out.values():
        assert r.n_roundtrip_failures == 0
        # each merge application removes exactly one symbol
        assert r.n_symbols + r.n_merge_applications == sum(
            len(t) for t in "xyxy pqpq uvuv xy pq".split()
        )


def test_bpe_batch_beats_single_merge_per_job(spark, sf_dir):
    """On the real corpus the batch trainer must learn strictly more
    merges than rounds (otherwise it degenerates to bpe_train_merges
    and the batch machinery buys nothing)."""
    from dbdiff_spark.ops.retrieval import BPE_BATCH_ROUNDS, bpe_train_batch

    merges = bpe_train_batch(spark, sf_dir).collect()
    assert len(merges) > BPE_BATCH_ROUNDS
    # placeholder codes stay inside the reserved control range
    assert all(len(r.merge_text) >= 2 for r in merges)
    assert all(min(r.merge_text) >= "0" for r in merges)  # no control chars


def test_bpe_artifact_roundtrip_drives_apply(spark, tmp_path):
    """The persisted merge artifact must carry the FULL trained state:
    reloading it and replaying the replaces in code order reproduces
    the in-memory apply exactly, and codes live above BPE_CODE_BASE so
    they can never collide with corpus symbols at any vocabulary."""
    from dbdiff_spark.ops.retrieval import (
        BPE_CODE_BASE,
        bpe_apply_from_artifact,
        bpe_apply_tokens,
        bpe_merge_artifact,
    )

    docs = [(i, "xyxy pqpq uvuv xy pq xyxypq") for i in range(4)]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    art = bpe_merge_artifact(spark, str(tmp_path), str(tmp_path / "merges"))
    saved = sorted(spark.read.parquet(str(tmp_path / "merges")).collect(),
                   key=lambda r: r.code)
    assert [tuple(r) for r in sorted(art.collect(), key=lambda r: r.code)] == [
        tuple(r) for r in saved
    ]
    # codes dense from 1; surface pairs may embed earlier codes, all of
    # which must decode above the reserved base
    assert [r.code for r in saved] == list(range(1, len(saved) + 1))
    for r in saved:
        for ch in r.pair:
            assert ord(ch) < 128 or ord(ch) > BPE_CODE_BASE

    via_artifact = {
        r.doc_id: tuple(r) for r in bpe_apply_from_artifact(spark, str(tmp_path)).collect()
    }
    in_memory = {
        r.doc_id: tuple(r) for r in bpe_apply_tokens(spark, str(tmp_path)).collect()
    }
    assert via_artifact == in_memory
    assert all(r[-1] == 0 for r in via_artifact.values())  # 0 roundtrip failures


def test_bpe_cross_corpus_trains_even_applies_odd(spark, tmp_path):
    """bpe_apply_cross_corpus is the real tokenizer workflow: train on
    the even-doc_id slice, persist, reload, apply to the DISJOINT odd
    slice.  The report must cover exactly the odd docs, round-trip with
    zero failures on text the trainer never saw, and the persisted
    artifact must contain only even-slice-trained merges."""
    from dbdiff_spark.ops.retrieval import bpe_apply_cross_corpus

    docs = [
        # even docs: one vocabulary; odd docs: overlapping + unseen words
        (0, "stream stream spark spark sql"),
        (1, "stream spark quorum quorum zzz"),
        (2, "stream sql sql spark table"),
        (3, "quorum table unseenword stream"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = bpe_apply_cross_corpus(
        spark, str(tmp_path), path=str(tmp_path / "merges")
    ).collect()
    assert sorted(r.doc_id for r in out) == [1, 3]
    assert all(r.n_roundtrip_failures == 0 for r in out)
    # some merge trained on the even slice must actually fire on the
    # odd slice (shared vocabulary), or the test proves nothing
    assert sum(r.n_merge_applications for r in out) > 0


def test_bpe_greedy_adoption_is_denser_than_dominance(spark, sf_dir):
    """The greedy maximal-disjoint rule blocks only on ADOPTED pairs,
    so per round it fills toward the m budget where dominance
    self-limits at ~sqrt(alphabet) (the r7 probe finding).  On the same
    corpus and config, greedy must adopt strictly more merges — and
    both tables must stay valid BPE tables (disjointness within each
    round)."""
    from dbdiff_spark.ops.retrieval import (
        BPE_CODE_BASE,
        _bpe_batch_learn,
        bpe_train_batch,
    )

    # one greedy training run serves both checks (the public
    # bpe_train_greedy wrapper over the same learner is exercised by
    # the oracle-parity sweep)
    greedy_rows, rounds_adopted, _ = _bpe_batch_learn(
        spark, sf_dir, adoption="greedy"
    )
    dominance = bpe_train_batch(spark, sf_dir).collect()
    assert len(greedy_rows) > len(dominance) > 0
    assert BPE_CODE_BASE == 256  # codes clear of corpus symbols
    # adopted pairs within one greedy round are pairwise symbol-disjoint
    # — the property that keeps one counting job's counts valid for all
    # of the round's merges (disjoint replaces commute)
    for rnd_pairs in rounds_adopted:
        # disjointness is ACROSS pairs — a self-repeated pair like 'gg'
        # is fine (its replace cannot interact with any other merge)
        sym_sets = [set(p) for p in rnd_pairs]
        for i, a in enumerate(sym_sets):
            for b in sym_sets[i + 1:]:
                assert not (a & b), f"overlap in round: {rnd_pairs}"


def test_bpe_depth_beyond_512_merges_roundtrips(spark, tmp_path):
    """Depth regression for the r6 mandate: on a morphologically-rich
    synthetic corpus the greedy learner must push past the previous
    <=512-merge ceiling, the staged apply must survive the resulting
    checkpoint-chain depth, and every token must round-trip.  (The full
    m=256 / 4k-merge configuration runs in tools/probe_bpe_depth.py —
    this is the CI-scale cut of the same path.)"""
    from dbdiff_spark import testkit
    from dbdiff_spark.ops.retrieval import (
        _bpe_apply_report,
        _bpe_batch_learn,
        _bpe_code,
    )

    testkit.write_bpe_corpus(spark, str(tmp_path), n_docs=300, lexicon=1500)
    rows, rounds_adopted, expansions = _bpe_batch_learn(
        spark, str(tmp_path), rounds=20, m=128, scan=1024, adoption="greedy"
    )
    assert len(rows) > 512, f"only {len(rows)} merges"
    pair_codes = [
        (p, _bpe_code(k + 1))
        for k, p in enumerate(q for rnd in rounds_adopted for q in rnd)
    ]
    agg = _bpe_apply_report(
        spark, str(tmp_path), pair_codes, expansions
    ).selectExpr(
        "sum(n_merge_applications) AS apps",
        "sum(n_roundtrip_failures) AS fails",
    ).collect()[0]
    assert agg["fails"] == 0
    assert agg["apps"] > 0


def test_bpe_bytes_trains_on_full_input_surface(spark, tmp_path):
    """VERDICT r7 #3: the byte-level mode must let punctuation, case,
    and non-ASCII ENTER TRAINING (the word-level [a-z0-9]+ pattern
    strips all three), round-trip exactly on such input, and stay
    bit-identical to the DuckDB twin on the same rich fixture."""
    import duckdb

    from dbdiff_spark.ops.retrieval import (
        _BYTE_TOKENS,
        _D_BYTE_TOKENS,
        _bpe_batch_learn,
        _bpe_apply_report,
        _bpe_batch_train_sql,
        _bpe_code,
    )

    rows_src = [
        (i, "The End. The End! Wörld, Wörld… Don't STOP, Don't STOP — 100% done; 100% done?")
        for i in range(40)
    ] + [(100 + i, "plain lowercase words survive too " * 3) for i in range(10)]
    docs = spark.createDataFrame(rows_src, "doc_id bigint, text string")
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)

    rows, rounds_adopted, expansions = _bpe_batch_learn(
        spark, str(tmp_path), adoption="greedy", tokens_expr=_BYTE_TOKENS
    )
    assert rows, "no merges learned"
    # punctuation/case/multi-byte UTF-8 must appear in learned merges
    joined = "".join(expansions)
    assert any(c.isupper() for c in joined), "case never entered training"
    assert any(c in ".,!?%;'" for c in joined), "punctuation never entered training"
    assert any(ord(c) >= 128 for c in joined), "non-ASCII bytes never entered training"

    # round-trip proof on the rich corpus: 0 failures by construction
    pair_codes = [
        (p, _bpe_code(k + 1))
        for k, p in enumerate(q for rnd in rounds_adopted for q in rnd)
    ]
    agg = _bpe_apply_report(
        spark, str(tmp_path), pair_codes, expansions, tokens_expr=_BYTE_TOKENS
    ).selectExpr(
        "sum(n_merge_applications) AS apps", "sum(n_roundtrip_failures) AS fails"
    ).collect()[0]
    assert agg["fails"] == 0 and agg["apps"] > 0

    # DuckDB twin parity on the SAME rich fixture (the registry gate
    # only sees the sanitized driver corpus)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = sorted(
        con.execute(
            _bpe_batch_train_sql("greedy", tokens_sql=_D_BYTE_TOKENS)
        ).fetchall()
    )
    engine = sorted((r[0], r[1], r[2], r[3]) for r in rows)
    assert engine == oracle


def test_bpe_standard_format_export_is_valid_and_lossless(spark, sf_dir, tmp_path):
    """VERDICT r8 #4: the trained byte-level merges must serialize to
    the public GPT-2-family format (merges.txt + vocab.json) and
    deserialize back to the EXACT internal trainer state — pair_codes
    and expansions bit-identical — so an external runtime and this
    engine tokenize from one artifact."""
    import json

    from dbdiff_spark.ops.retrieval import (
        _BPE_MERGES_HEADER,
        _BYTE_TOKENS,
        _bpe_batch_learn,
        _bpe_code,
        _gpt2_byte_to_unicode,
        bpe_export_standard,
        bpe_load_standard,
    )

    _, rounds_adopted, expansions = _bpe_batch_learn(
        spark, sf_dir, adoption="greedy", tokens_expr=_BYTE_TOKENS
    )
    flat_pairs = [p for rp in rounds_adopted for p in rp]
    root = str(tmp_path / "std")
    merges_path, vocab_path = bpe_export_standard(flat_pairs, expansions, root)

    lines = open(merges_path, encoding="utf-8").read().splitlines()
    assert lines[0] == _BPE_MERGES_HEADER
    body = lines[1:]
    assert len(body) == len(flat_pairs)
    for line in body:
        left, sep, right = line.partition(" ")
        assert sep and left and right and " " not in right
    vocab = json.loads(open(vocab_path, encoding="utf-8").read())
    # 256 byte symbols + one entry per merge, ids dense from 0
    assert len(vocab) == 256 + len(expansions)
    assert sorted(vocab.values()) == list(range(256 + len(expansions)))
    b2u = _gpt2_byte_to_unicode()
    assert len(set(b2u.values())) == 256  # bijection
    assert all(vocab[b2u[b]] == b for b in range(256))

    pair_codes, loaded_exp = bpe_load_standard(root)
    expected_codes = [
        (pair, _bpe_code(k + 1)) for k, pair in enumerate(flat_pairs)
    ]
    assert pair_codes == expected_codes
    assert loaded_exp == expansions


def test_bpe_standard_format_rejects_malformed_artifacts(tmp_path):
    import pytest

    from dbdiff_spark.ops.retrieval import bpe_load_standard

    root = str(tmp_path)
    with open(f"{root}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\nab cd\n")  # 'ab' never built by a prior merge
    with pytest.raises(ValueError, match="before it is built"):
        bpe_load_standard(root)
    with open(f"{root}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\nonlyonefield\n")
    with pytest.raises(ValueError, match="malformed"):
        bpe_load_standard(root)


def test_bpe_standard_format_guards_duplicate_expansions(tmp_path):
    """Two merges expanding to the same surface token (ab+c vs a+bc)
    are representable internally but NOT in a token->id vocab file:
    export must refuse loudly, and a merges.txt that builds one token
    twice must fail on load instead of silently re-binding pairs."""
    import pytest

    from dbdiff_spark.ops.retrieval import (
        _bpe_code,
        bpe_export_standard,
        bpe_load_standard,
    )

    # internal state: merge1 = 'a'+'b' -> code1; merge2 = 'b'+'c' ->
    # code2; merge3 = code1+'c' ("abc"); merge4 = 'a'+code2 ("abc")
    c1, c2 = _bpe_code(1), _bpe_code(2)
    flat_pairs = ["ab", "bc", c1 + "c", "a" + c2]
    expansions = ["ab", "bc", "abc", "abc"]
    with pytest.raises(ValueError, match="duplicate expanded tokens"):
        bpe_export_standard(flat_pairs, expansions, str(tmp_path / "dup"))

    root = str(tmp_path)
    with open(f"{root}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\na b\nb c\nab c\na bc\n")
    with pytest.raises(ValueError, match="twice"):
        bpe_load_standard(root)


def test_bpe_standard_format_keeps_hash_prefixed_merges(tmp_path):
    """r9 review (reproduced pre-fix): only the FIRST line may be the
    '#version' header — byte 0x23 renders as '#', so real merges whose
    left token starts with '#' (e.g. building '##') must survive the
    reload instead of being skipped as comments."""
    from dbdiff_spark.ops.retrieval import (
        _bpe_code,
        bpe_export_standard,
        bpe_load_standard,
    )

    flat_pairs = ["##", "#a"]
    expansions = ["##", "#a"]
    root = str(tmp_path / "hash")
    bpe_export_standard(flat_pairs, expansions, root)
    lines = open(f"{root}/merges.txt", encoding="utf-8").read().splitlines()
    assert lines[1] == "# #" and lines[2] == "# a"
    pair_codes, loaded = bpe_load_standard(root)
    assert loaded == expansions
    assert pair_codes == [("##", _bpe_code(1)), ("#a", _bpe_code(2))]


def test_bpe_load_standard_headerless_hash_first_merge(tmp_path):
    """ADVICE r9: only a '#version'-shaped line 0 is a header.  A
    headerless merges.txt whose FIRST merge's left token renders as '#'
    (byte 0x23) must load that merge — the r9 fix removed this
    silent-drop for non-first lines; line 0 had the same bug.  Any other
    '#'-leading first line must raise as malformed, never vanish."""
    import pytest

    from dbdiff_spark.ops.retrieval import _bpe_code, bpe_load_standard

    root = str(tmp_path)
    with open(f"{root}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("# x\n")  # byte '#' + byte 'x' — a legitimate merge
    pair_codes, expansions = bpe_load_standard(root)
    assert expansions == ["#x"]
    assert pair_codes == [("#x", _bpe_code(1))]
    with open(f"{root}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#comment not a merge line\n")
    with pytest.raises(ValueError, match="malformed"):
        bpe_load_standard(root)
