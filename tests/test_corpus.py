"""Invariant tests for the corpus-preparation operators (ops/corpus.py).

Exactness vs. DuckDB is the oracle harness's job (tools/check_oracle.py);
these tests pin the semantic invariants each operator promises.
"""

import pyspark.sql.functions as F
import pytest

from dbdiff_spark.io import load_table
from dbdiff_spark.ops import corpus


def test_decontam_covers_all_train_docs_and_flags_consistent(spark, sf_dir):
    res = corpus.decontam_ngram_overlap(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    n_train = docs.filter(~F.expr(corpus.BENCH_PRED)).count()
    assert res.count() == n_train
    bad = res.filter(
        (F.col("is_contaminated") & (F.col("n_shingle_hits") == 0))
        | (~F.col("is_contaminated") & (F.col("n_shingle_hits") > 0))
    )
    assert bad.count() == 0
    # An exact duplicate of a benchmark doc in the train slice must be
    # flagged (if the data contains one crossing the slice boundary).
    dup = (
        docs.filter(F.expr(corpus.BENCH_PRED))
        .select("text")
        .join(docs.filter(~F.expr(corpus.BENCH_PRED)), "text")
        .select("doc_id")
    )
    n_dup = dup.count()
    if n_dup:
        flagged = res.join(dup, "doc_id").filter("is_contaminated").count()
        assert flagged == n_dup
    res.unpersist()


def test_pack_sequences_conserves_tokens_and_is_contiguous(spark, sf_dir):
    packs = corpus.pack_sequences(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.selectExpr(
        f"CAST(size({corpus._TOKENS}) AS BIGINT) AS n"
    ).agg(F.sum("n")).collect()[0][0]
    assert packs.agg(F.sum("total_tokens")).collect()[0][0] == total
    # pack ids are contiguous from 0 within each lang shard
    per_lang = packs.groupBy("lang").agg(
        F.min("pack_id").alias("lo"),
        F.max("pack_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in per_lang.collect():
        assert r.lo == 0 and r.n == r.hi + 1
    # contiguous fill: every pack except a shard's last holds >= budget
    # tokens only when a doc straddles INTO it; but its START is always
    # below the next boundary — equivalently no pack is empty.
    assert packs.filter("n_docs <= 0").count() == 0
    packs.unpersist()


def test_domain_cap_keeps_exactly_min_cap_groupsize(spark, sf_dir):
    res = corpus.domain_cap(spark, sf_dir).cache()
    per_src = res.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CASE WHEN is_kept THEN 1 ELSE 0 END")).alias("kept"),
        F.countDistinct("cap_rank").alias("distinct_ranks"),
        F.max("cap_rank").alias("max_rank"),
    )
    for r in per_src.collect():
        assert r.kept == min(corpus.DOMAIN_CAP, r.n)
        assert r.distinct_ranks == r.n and r.max_rank == r.n  # ranks 1..n unique
    res.unpersist()


def test_bloom_has_no_false_negatives(spark, sf_dir):
    res = corpus.bloom_join_prune(spark, sf_dir).cache()
    rows = res.collect()
    assert rows, "bloom result empty"
    for r in rows:
        # every true match passes the bloom (no false negatives) …
        assert r.n_bloom_pass >= r.n_true_match
        # … and the accounting is exact
        assert r.n_false_pos == r.n_bloom_pass - r.n_true_match
        assert r.n_orders >= r.n_bloom_pass
    res.unpersist()


def test_bloom_prunes_probe_side(spark, sf_dir):
    """The filter must actually prune: survivors are a strict subset at
    this selectivity (~20% of customers selected)."""
    res = corpus.bloom_join_prune(spark, sf_dir)
    agg = res.agg(F.sum("n_orders").alias("n"), F.sum("n_bloom_pass").alias("p")).collect()[0]
    assert agg.p < agg.n


def test_shuffle_index_is_permutation(spark, sf_dir):
    res = corpus.corpus_shuffle_index(spark, sf_dir).cache()
    n = res.count()
    stats = res.agg(
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
        F.countDistinct("shuffle_pos").alias("d"),
    ).collect()[0]
    assert stats.lo == 0 and stats.hi == n - 1 and stats.d == n
    # deterministic: recompute equals itself
    again = corpus.corpus_shuffle_index(spark, sf_dir)
    assert res.exceptAll(again).count() == 0
    res.unpersist()


def test_rollup_cascade_merges_losslessly(spark, sf_dir):
    # daily stats re-aggregated from hourly partials must equal a direct
    # raw->daily aggregation (mergeability law for the quantized grid)
    from pyspark.sql import functions as F

    from dbdiff_spark.io import load_table
    from dbdiff_spark.ops.temporal import _VQ, events_rollup_cascade

    cascade = {
        (r.event_type, r.day): (r.n_events, r.total_value, r.min_value, r.max_value)
        for r in events_rollup_cascade(spark, sf_dir).collect()
    }
    direct = {
        (r.event_type, r.day): (r.n_events, r.total_value, r.min_value, r.max_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .selectExpr(
                "event_type",
                "CAST(FLOOR(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) / 24) AS BIGINT) AS day",
                f"{_VQ} AS vq",
            )
            .groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum("vq") / 10000).alias("total_value"),
                (F.min("vq") / 10000).alias("min_value"),
                (F.max("vq") / 10000).alias("max_value"),
            )
            .collect()
        )
    }
    assert cascade == direct


def test_importance_resample_count_telescopes_exactly(spark, sf_dir):
    """Σ n_copies must equal total_weight div STEP exactly (the
    floor-division intervals telescope) — the sample size is pinned by
    arithmetic, independent of the hash ordering."""
    out = corpus.importance_resample(spark, sf_dir)
    got = out.agg(F.sum("n_copies")).collect()[0][0]
    total_w = (
        load_table(spark, sf_dir, "documents")
        .selectExpr(
            f"CAST(size({corpus._TOKENS}) AS BIGINT) AS n_tokens",
            f"CAST(size(array_distinct({corpus._TOKENS})) AS BIGINT) AS n_distinct",
        )
        .selectExpr(
            "CASE WHEN n_tokens = 0 THEN 0"
            " ELSE (1000000 * n_distinct) div n_tokens END AS w"
        )
        .agg(F.sum("w"))
        .collect()[0][0]
    )
    assert got == total_w // corpus.RESAMPLE_STEP
    # every copy count is positive and bounded by ceil(w/STEP)
    for r in out.collect():
        assert 1 <= r.n_copies <= r.weight // corpus.RESAMPLE_STEP + 1


def test_importance_resample_replicates_heavy_docs(spark, tmp_path):
    """With step below the max ppm weight, an all-distinct doc
    (weight 1e6) must be emitted multiple times: n_copies in
    {3, 4} for step=300k (interval of length 1e6 covers 3 or 4 grid
    points depending on phase), and Σ n_copies still telescopes."""
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(20))) for i in range(8)]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = corpus.importance_resample(spark, str(tmp_path), step=300_000).collect()
    assert sum(r.n_copies for r in out) == (8 * 1_000_000) // 300_000
    assert all(r.weight == 1_000_000 for r in out)
    assert {r.n_copies for r in out} <= {3, 4}
    assert any(r.n_copies >= 3 for r in out)


def test_mixture_temperature_upsamples_scarce_sources(spark, tmp_path):
    """α=1/2 temperature mixing: sources smaller than the mix's
    effective mean get epochs > 1 (up-sampled), larger get < 1, and the
    expected replica volume (Σ w_i·rate_i) telescopes back to the total
    corpus volume — the volume-preservation law of p_i ∝ w_i^α
    normalization.  Built on a skewed fixture (the driver corpus is
    near-uniform across sources)."""
    from pyspark.sql import functions as F

    from dbdiff_spark.ops.corpus import MIX_GRID, mixture_temperature

    rows = []
    did = 0
    for src, n_docs, chars in (
        ("bulk", 200, 500),
        ("mid", 40, 500),
        ("rare", 5, 500),
        ("void", 3, 0),  # zero-volume source: 0/0 rate — must be dropped
    ):
        for _ in range(n_docs):
            rows.append((did, "word " * 10, src, chars))
            did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.source: r for r in mixture_temperature(spark, str(tmp_path)).collect()}
    assert set(out) == {"bulk", "mid", "rare"}
    # monotone: scarcer source → higher epochs
    assert out["rare"].epochs_64k > out["mid"].epochs_64k > out["bulk"].epochs_64k
    assert out["rare"].epochs_64k > MIX_GRID  # up-sampled past 1 epoch
    assert out["bulk"].epochs_64k < MIX_GRID  # down-sampled below 1
    # volume preservation: Σ w_i · rate_i == Σ w_i on the 1/64Ki grid
    # (α-normalized rates are exactly volume-preserving by construction)
    total_w = sum(r.w for r in out.values())
    mixed_w = sum(r.w * r.epochs_64k for r in out.values()) / MIX_GRID
    assert abs(mixed_w - total_w) / total_w < 0.001
    # replica counts obey the exact per-doc law: every doc gets
    # floor(epochs) or ceil(epochs) copies (md5 fraction decides)
    for r in out.values():
        lo = r.n_docs * (r.epochs_64k // MIX_GRID)
        hi = r.n_docs * (r.epochs_64k // MIX_GRID + 1)
        assert lo <= r.n_copies <= hi
