"""Headline benchmark — run the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with the no-op sink (full plan runs,
nothing collected to the driver — measures engine throughput, not
driver serialization).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dbdiff_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The queries that define this engine: snapshot diff (the reference's
# whole purpose) at the biggest table, the analytics suite, and the
# pipeline extensions (dedup/similarity added as they land).
HEADLINE = [
    "diff_lineitem",
    "diff_lineitem_multiset",
    "diff_customer",
    "diff_events",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q8_market_share",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "q21_sole_return_supplier",
    "top_events_per_user",
    "user_sessions",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ingest_full",
    "lsh_pair_calibration",
    "dedup_simhash",
    "dedup_simhash_neardup",
    "text_quality",
    "knn_bruteforce",
    "ann_lsh_bitsample",
    "ann_ivf",
    "ann_ivf_recall_report",
    "ann_ivf_trained",
    "ann_ivf_filtered",
    "ann_ivf_filtered_serve",
    "ann_ivfpq_filtered_serve",
    "ann_ivf_full_trained",
    "ann_ivf_index_persist",
    "ann_ivf_serve",
    "ann_ivfpq_serve",
    "ann_ivf_delete_serve",
    "ann_ivf_upsert_serve",
    "ann_ivf_compact_serve",
    "ann_ivfpq_delete_serve",
    "ann_ivfpq_upsert_serve",
    "ann_ivf_pq_residual",
    "ann_ivfpq_trained_codebook",
    "ann_ivfpq_ingest",
    "ann_ivfpq_recall_report",
    "ann_ivf_nprobe_curve",
    "ann_ivf_ingest",
    "ann_ivf_cells_scaled",
    "kmeans_lloyd",
    "fuzzy_part_match",
    "passage_dedup",
    "decontam_ngram_overlap",
    "bloom_join_prune",
    "mv_maintain_orders",
    "merge3_customer",
    "scd2_customer",
    "scd2_incremental_customer",
    "bm25_rank",
    "pagerank_copurchase",
    "hll_distinct",
    "column_drift_lineitem",
    "integrity_audit",
    "funnel_conversion",
    "retention_cohorts",
    "ngram_lm_counts",
    "scd2_pit_orders",
    "profile_customer",
    "delete_cascade",
    "repeated_spans",
    "repeated_span_runs",
    "ann_pq",
    "ann_ivf_pq",
    "join_skew_report",
    "outlier_report_lineitem",
    "peak_concurrency",
    "label_propagation",
    "frequent_itemsets",
    "validate_orders",
    "dedup_ingest_incremental",
    "classifier_score",
    "lm_doc_score",
    "semdedup_prune",
    "jl_project",
    "pca_power_iteration",
    "positional_index",
    "phrase_search",
    "join_size_estimate",
    "cusum_anomalies",
    "benford_audit",
    "kcore_peeling",
    "diff_orders_tolerance",
    "diff_estimate_orders",
    "k_anonymity_audit",
    "ohlc_bars",
    "prepare_corpus_funnel",
    "mixture_temperature",
    "gopher_repetition",
    "multimodal_decode",
    "hybrid_retrieval_rrf",
    "bpe_pair_stats",
    "pmi_collocations",
    "mmr_rerank",
    "importance_resample",
    "bpe_train_merges",
    "bpe_train_batch",
    "bpe_apply_tokens",
    "bpe_apply_from_artifact",
    "bpe_apply_cross_corpus",
    "bpe_train_greedy",
    "bpe_train_bytes",
    "bpe_apply_bytes",
    "bpe_apply_standard_format",
    "event_transitions",
    "rag_index_funnel",
    "pyds_source_stats",
    "numeric_correlations",
    "vocab_growth_curve",
    "entity_resolution_parts",
    "rfm_segments",
    "supplier_return_quality",
    "diff_revenue_impact",
    "multimodal_dhash_dedup",
    "multimodal_dhash_neardup",
    "multimodal_dhash128_neardup",
]


# Report-tier entries (VERDICT r8 #3): A/B harnesses and recall
# reports, not serving paths — they run every variant they compare
# (ann_ivf_recall_report is six pipelines) and absorb every new
# variant added, so counting them in the headline total makes the
# serving-path trend unreadable.  Still timed min-of-3 and recorded in
# "queries", but totaled separately as "report_total"; "value" tracks
# serving queries only from r9 on.
REPORT_TIER = {
    "ann_ivf_recall_report",
    "ann_ivf_full_trained",
    "ann_ivfpq_recall_report",
    "ann_ivf_nprobe_curve",
}


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_bucketed_diff(spark) -> float:
    """The 100 TB posture measured: lineitem diffed from two snapshots
    bucketed+sorted by key — zero-exchange plan (see ARCHITECTURE.md).
    Snapshot writes are setup, not part of the timed diff."""
    import shutil
    import tempfile

    from dbdiff_spark import testkit
    from dbdiff_spark.diff import DiffMode
    from dbdiff_spark.io import load_table
    from dbdiff_spark.snapshot import SnapshotStore, diff_snapshots

    spec, mut = testkit.SPECS["lineitem"], testkit.MUTATIONS["lineitem"]
    base = testkit.prep(load_table(spark, SF_DIR, "lineitem"), spec)
    after_df = testkit.apply_mutation(base, spec, mut)
    root = tempfile.mkdtemp(prefix="bench_bucketed_")
    store = SnapshotStore(spark)
    keys = {"lineitem": list(spec.key)}
    before = store.collect({"lineitem": base}, keys, f"{root}/b", buckets=32)
    after = store.collect({"lineitem": after_df}, keys, f"{root}/a", buckets=32)
    t0 = time.time()
    res = diff_snapshots(spark, before, after, mode=DiffMode.TYPED)["lineitem"]
    run_query(res.df)
    dt = round(time.time() - t0, 3)
    for ident in list(before.catalog_tables.values()) + list(after.catalog_tables.values()):
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
    shutil.rmtree(root, ignore_errors=True)
    return dt


def bench_incremental_diff(spark) -> float:
    """The re-diff posture: both snapshots change-tracked AND bucketed,
    the mutation a point update (~6 order keys, a few dozen rows — the
    "poll again after small drift" case re-diffing exists for), so >99%
    of the hash-groups are pruned from the match and the bucket files
    holding only unchanged groups are never read at all (scan-level
    pruning).  Snapshot writes are setup, not part of the timed diff."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dbdiff_spark import testkit
    from dbdiff_spark.diff import DiffMode
    from dbdiff_spark.io import load_table
    from dbdiff_spark.snapshot import SnapshotStore, diff_snapshots

    spec = testkit.SPECS["lineitem"]
    base = testkit.prep(load_table(spark, SF_DIR, "lineitem"), spec)
    after_df = base.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 100_000 == 7, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    root = tempfile.mkdtemp(prefix="bench_incr_")
    store = SnapshotStore(spark)
    keys = {"lineitem": list(spec.key)}
    before = store.collect(
        {"lineitem": base}, keys, f"{root}/b", track_changes=True, buckets=32
    )
    after = store.collect(
        {"lineitem": after_df}, keys, f"{root}/a", track_changes=True, buckets=32
    )
    t0 = time.time()
    res = diff_snapshots(spark, before, after, mode=DiffMode.TYPED, incremental=True)[
        "lineitem"
    ]
    run_query(res.df)
    dt = round(time.time() - t0, 3)
    for ident in list(before.catalog_tables.values()) + list(after.catalog_tables.values()):
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
    shutil.rmtree(root, ignore_errors=True)
    return dt


def bench_format_diff(spark, fmt: str) -> float:
    """Storage-format overhead, measured like-for-like: the SAME
    unbucketed snapshot→diff of lineitem, with both snapshots stored as
    ``fmt`` — run for parquet and orc, the delta between the two entries
    is the format's scan-side cost.  Snapshot writes are setup, not part
    of the timed diff."""
    import shutil
    import tempfile

    from dbdiff_spark import testkit
    from dbdiff_spark.diff import DiffMode
    from dbdiff_spark.io import load_table
    from dbdiff_spark.snapshot import SnapshotStore, diff_snapshots

    spec, mut = testkit.SPECS["lineitem"], testkit.MUTATIONS["lineitem"]
    base = testkit.prep(load_table(spark, SF_DIR, "lineitem"), spec)
    after_df = testkit.apply_mutation(base, spec, mut)
    root = tempfile.mkdtemp(prefix=f"bench_fmt_{fmt}_")
    store = SnapshotStore(spark)
    keys = {"lineitem": list(spec.key)}
    before = store.collect(
        {"lineitem": base}, keys, f"{root}/b", count_rows=False, format=fmt
    )
    after = store.collect(
        {"lineitem": after_df}, keys, f"{root}/a", count_rows=False, format=fmt
    )
    t0 = time.time()
    res = diff_snapshots(spark, before, after, mode=DiffMode.TYPED)["lineitem"]
    run_query(res.df)
    dt = round(time.time() - t0, 3)
    shutil.rmtree(root, ignore_errors=True)
    return dt


# Pinned r2 quiet-host minimums for the three stable control queries
# (sf0.1) — every inflation measurement in this file divides by these.
CONTROL_REF = {
    "dedup_exact": 0.232, "text_quality": 0.331, "knn_bruteforce": 0.536,
}


def measure_controls(spark, qs, sf: str) -> float | None:
    """One inflation sample: the control trio timed min-of-2 against the
    pinned r2 quiet-host minimums.  Called at segment boundaries
    (start / mid / end) because ambient load on this host drifts WITHIN
    a multi-minute suite — a single whole-suite factor cannot
    adjudicate a per-query delta measured twenty minutes away from the
    controls (VERDICT r6 #3)."""
    if sf != "0.1":
        return None  # reference minimums are pinned at sf0.1
    ratios = []
    for name, ref in CONTROL_REF.items():
        if name not in qs:
            return None
        best = None
        for _ in range(2):
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ratios.append(best / ref)
    return round(sum(ratios) / len(ratios), 2)


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dbdiff_spark_bench")
    qs = entrymod.queries()
    # Per-plan warmup at sf0.001: whole-stage codegen compiles per plan
    # shape and is cached by generated source, so one tiny-SF run of each
    # query pays the JIT cost up front and the timed sf0.1 runs measure
    # engine throughput, not first-compilation.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        if name in qs:
            try:
                run_query(qs[name](spark, warm_dir))
            except Exception as exc:  # warmup must never sink the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    inflation_segments: dict[str, float | None] = {}
    # Fixed-STRIDE inflation sampling (VERDICT r9 #4): ambient load on
    # this host drifts within a multi-minute suite, and the three
    # boundary segments (start/mid/end) proved too sparse to adjudicate
    # per-query deltas — both r9 closing runs showed segment spreads to
    # 1.44 with nothing in between.  The control trio now ALSO runs at
    # fixed strides through both tiers (every CONTROL_STRIDE timed
    # entries), giving a time series whose spread (max/min) is reported
    # so a round-over-round delta can be matched against the ambient
    # state at the minute it was measured.
    CONTROL_STRIDE = 25
    inflation_strides: dict[str, float | None] = {}
    # one UNTIMED sf0.1 pass of the controls first: the start segment
    # otherwise measures cold sf0.1 state (only sf0.001 warmup has run)
    # while mid/end run on a warm suite, conflating cache warmth with
    # ambient load (ADVICE r7) — warm all three, then sample
    if sf == "0.1":
        for _name in CONTROL_REF:
            if _name in qs:
                run_query(qs[_name](spark, SF_DIR))
    inflation_segments["start"] = measure_controls(spark, qs, sf)
    print(f"# host_inflation[start]: {inflation_segments['start']}", file=sys.stderr)
    times: dict[str, float] = {}
    total = 0.0
    report_total = 0.0
    n_report = 0
    n_timed = 0

    def stride_sample(label: str) -> None:
        # Discharge the suite's own wake before sampling: the stride
        # fires right after a timed query, and the JVM's deferred GC
        # debt from that query inflates the control read by 10-25%
        # (measured r11: x-strides 1.1-1.24 vs an h-floor of 0.92 in
        # the same run; a bare 3 s sleep only narrowed the spread to
        # ~1.16).  The instrument exists to measure AMBIENT host load,
        # so ask the shared local-mode JVM for a full collection, drop
        # Python-side garbage, and give the collector a moment before
        # timing the controls.  Segment samples stay raw on purpose —
        # they keep their historical meaning as phase-boundary reads.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        gc.collect()
        time.sleep(2)
        inflation_strides[label] = measure_controls(spark, qs, sf)
        print(
            f"# host_inflation[{label}]: {inflation_strides[label]}",
            file=sys.stderr,
        )

    for name in HEADLINE:
        if name not in qs:
            continue
        # min of three runs: this host shows 3-10x run-to-run noise from
        # outside interference; min is the engine's actual cost
        best = None
        for _ in range(3):
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        times[name] = best
        if name in REPORT_TIER:
            report_total += best
            n_report += 1
        else:
            total += best
        print(f"# {name}: {best:.3f}s"
              + (" [report]" if name in REPORT_TIER else ""), file=sys.stderr)
        n_timed += 1
        if n_timed % CONTROL_STRIDE == 0:
            stride_sample(f"h{n_timed}")
    times["diff_lineitem_bucketed"] = min(
        bench_bucketed_diff(spark), bench_bucketed_diff(spark)
    )
    total += times["diff_lineitem_bucketed"]
    print(f"# diff_lineitem_bucketed: {times['diff_lineitem_bucketed']:.3f}s", file=sys.stderr)
    times["diff_lineitem_incremental"] = min(
        bench_incremental_diff(spark), bench_incremental_diff(spark)
    )
    total += times["diff_lineitem_incremental"]
    print(
        f"# diff_lineitem_incremental: {times['diff_lineitem_incremental']:.3f}s",
        file=sys.stderr,
    )
    for fmt in ("parquet", "orc"):
        key = f"diff_lineitem_snap_{fmt}"
        times[key] = min(bench_format_diff(spark, fmt), bench_format_diff(spark, fmt))
        total += times[key]
        print(f"# {key}: {times[key]:.3f}s", file=sys.stderr)
    # Round-over-round comparability: the headline set GROWS each round
    # (r2 had 20 entries, r3 has 50+), so the raw total is not
    # comparable across rounds.  The r2-subset total is the
    # like-for-like number to trend against BENCH_r02's 19.05 s.
    r2_set = [
        "diff_lineitem", "diff_lineitem_multiset", "diff_customer",
        "diff_events", "q1_pricing_summary", "q3_top_revenue_orders",
        "q5_regional_revenue", "top_events_per_user", "user_sessions",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "text_quality", "knn_bruteforce", "ann_lsh_bitsample",
        "decontam_ngram_overlap", "bloom_join_prune", "mv_maintain_orders",
        "diff_lineitem_bucketed", "diff_lineitem_incremental",
    ]
    r2_total = round(sum(times.get(k, 0.0) for k in r2_set), 3)
    # Host-noise calibration: this box shows 1.2-1.4× cross-round drift
    # from outside load (ARCHITECTURE.md r4 adjudication), so every
    # bench run self-reports its inflation against three stable control
    # queries' pinned quiet-host r2 minimums.  Cross-round comparisons
    # should divide by this factor before calling anything a
    # regression.
    ratios = [times[c] / v for c, v in CONTROL_REF.items() if c in times]
    # reference minimums are pinned at sf0.1 — at any other SF_DIR the
    # ratio is meaningless, so emit null rather than a bogus factor
    host_inflation = (
        round(sum(ratios) / len(ratios), 2) if ratios and sf == "0.1" else None
    )
    print(f"# host_inflation vs r2 controls: {host_inflation}", file=sys.stderr)
    inflation_segments["mid"] = measure_controls(spark, qs, sf)
    print(f"# host_inflation[mid]: {inflation_segments['mid']}", file=sys.stderr)
    # Extended tier (VERDICT r5 #7): every non-stream registry query not
    # in HEADLINE runs ONCE (no warmup, no min-of-3) so a perf
    # regression anywhere in the registry shows in the artifact.  These
    # are coverage-tracking numbers — noisier than the headline tier by
    # design — and are kept OUT of "value"/r2_subset so the headline
    # metric stays comparable across rounds.  --headline-only skips.
    extended_total = 0.0
    n_extended = 0
    if "--headline-only" not in sys.argv[1:]:
        skipped = []
        extended_names = []
        for name in sorted(qs):
            if name in times or name.startswith("stream_"):
                continue
            try:
                t0 = time.time()
                run_query(qs[name](spark, SF_DIR))
                dt = round(time.time() - t0, 3)
            except Exception as exc:  # one bad query must not sink the artifact
                skipped.append(name)
                print(f"# extended {name} FAILED: {exc}", file=sys.stderr)
                continue
            times[name] = dt
            extended_names.append(name)
            print(f"# extended {name}: {dt:.3f}s", file=sys.stderr)
            if len(extended_names) % CONTROL_STRIDE == 0:
                stride_sample(f"x{len(extended_names)}")
        # The 10 most expensive extended entries get a second run (min
        # kept): their first run is cold (plan compile + ambient load),
        # and a one-shot number cannot distinguish regression from
        # noise on this host (VERDICT r6 #5).  The cheap tail stays
        # one-shot — its absolute noise is bounded by its cost.
        for name in sorted(extended_names, key=lambda n: -times[n])[:10]:
            try:
                t0 = time.time()
                run_query(qs[name](spark, SF_DIR))
                dt = round(time.time() - t0, 3)
            except Exception as exc:  # keep the first-run time; never sink the artifact
                print(f"# extended rerun {name} FAILED: {exc}", file=sys.stderr)
                continue
            if dt < times[name]:
                times[name] = dt
            print(f"# extended rerun {name}: {dt:.3f}s -> {times[name]:.3f}s",
                  file=sys.stderr)
        extended_total = round(sum(times[n] for n in extended_names), 3)
        n_extended = len(extended_names)
        if skipped:
            print(f"# extended tier skipped: {skipped}", file=sys.stderr)
    inflation_segments["end"] = measure_controls(spark, qs, sf)
    print(f"# host_inflation[end]: {inflation_segments['end']}", file=sys.stderr)
    # stride_spread reads the FIXED-STRIDE series alone — that series
    # is the instrument r9 #4 asked for (evenly spaced, so an ambient
    # oscillation shows up regardless of where the suite's phase
    # boundaries fall); pooling in the start/mid/end segment samples
    # muddied it (a segment-only spike read as stride noise — r10
    # ADVICE).  The pooled number survives as control_spread.
    stride_samples = [v for v in inflation_strides.values() if v]
    stride_spread = (
        round(max(stride_samples) / min(stride_samples), 2)
        if stride_samples
        else None
    )
    all_samples = [
        v
        for v in list(inflation_segments.values())
        + list(inflation_strides.values())
        if v
    ]
    control_spread = (
        round(max(all_samples) / min(all_samples), 2) if all_samples else None
    )
    print(
        f"# stride_spread: {stride_spread} control_spread: {control_spread}",
        file=sys.stderr,
    )
    payload = json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                # bench_schema 2 (r11): stride_spread reads the
                # fixed-stride series ALONE (the pooled value moved to
                # control_spread) and strides GC+sleep before sampling —
                # r10-and-earlier artifacts report a different quantity
                # under the same stride_spread key (r11 ADVICE #5).
                "bench_schema": 2,
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "n_queries": len(times),
                "n_report": n_report,
                "report_total": round(report_total, 3),
                "n_extended": n_extended,
                "extended_total": round(extended_total, 3),
                "r2_subset_total": r2_total,
                "host_inflation": host_inflation,
                "host_inflation_segments": inflation_segments,
                "host_inflation_strides": inflation_strides,
                "stride_spread": stride_spread,
                "control_spread": control_spread,
            }
    )
    # Artifact-capture hardening (r12 VERDICT #2: BENCH_r11's one-line
    # JSON was truncated in the driver's capture, nulling the whole
    # round-over-round PERF layer).  The JSON line stays the ONLY stdout
    # line (everything else goes to stderr), is explicitly flushed, and
    # is ALSO written to BENCH_OUT.json beside this file so a clipped
    # stdout capture still leaves a parseable artifact on disk.
    try:
        (Path(__file__).resolve().parent / "BENCH_OUT.json").write_text(
            payload + "\n"
        )
    except OSError as exc:  # the stdout line is still the contract
        print(f"# BENCH_OUT.json write failed: {exc}", file=sys.stderr)
    print(payload, flush=True)


if __name__ == "__main__":
    main()
