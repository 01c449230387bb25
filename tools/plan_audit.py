"""Physical-plan audit: for each headline query, count the plan features
that matter at 100 TB and write PLANS.md.

What is counted and why:

* **Exchange** nodes — every one is a cluster-wide shuffle; the fewer,
  and the smaller their inputs, the better the plan scales.
* **BroadcastExchange / BroadcastHashJoin** — small sides shipped to
  executors instead of shuffling the big side; the expected shape for
  dim-table joins.
* **WholeStageCodegen** spans — expressions fused into generated JVM
  code; Python (ArrowEvalPython / BatchEvalPython) nodes mark the slow
  path and should appear only where semantics force them.
* **PushedFilters / partition pruning** on parquet scans — predicates
  that reached the reader.

Run:  python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AUDITED = [
    "diff_lineitem",
    "diff_lineitem_multiset",
    "diff_roundtrip_apply",
    "diff_roundtrip_apply_drift",
    "mv_maintain_orders",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q8_market_share",
    "top_events_per_user",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "kmeans_lloyd",
    "fuzzy_part_match",
    "decontam_ngram_overlap",
    "bloom_join_prune",
    "mixture_epochs",
    "mixture_temperature",
    "customer_value_trend",
    "zorder_layout_stats",
    "corpus_clean_stats",
    "scd2_customer",
    "scd2_incremental_customer",
    "merge3_customer",
    "bm25_rank",
    "hll_distinct",
    "pagerank_copurchase",
    "column_drift_lineitem",
    "integrity_audit",
    "funnel_conversion",
    "retention_cohorts",
    "ngram_lm_counts",
    "scd2_pit_orders",
    "triangle_count",
    "stratified_sample",
    "profile_customer",
    "delete_cascade",
    "repeated_spans",
    "ann_pq",
    "ann_ivf_pq",
    "ann_ivf_recall_report",
    "ann_ivf_trained",
    "ann_ivf_full_trained",
    "ann_ivf_index_persist",
    "ann_ivf_ingest",
    "ann_ivf_cells_scaled",
    "ann_ivf_pq_residual",
    "ann_ivfpq_trained_codebook",
    "ann_ivf_serve",
    "ann_ivfpq_serve",
    "ann_ivf_delete_serve",
    "ann_ivfpq_delete_serve",
    "ann_ivf_upsert_serve",
    "ann_ivfpq_upsert_serve",
    "ann_ivf_compact_serve",
    "ann_ivf_filtered_serve",
    "ann_ivfpq_filtered_serve",
    "dedup_minhash_bbit",
    "embedding_truncation_recall",
    "repeated_span_cut",
    "repeated_span_cut_occ",
    "repeated_span_runs",
    "join_skew_report",
    "outlier_report_lineitem",
    "peak_concurrency",
    "sequence_gaps",
    "label_propagation",
    "frequent_itemsets",
    "validate_orders",
    "dedup_ingest_incremental",
    "dedup_ingest_full",
    "dedup_simhash_neardup",
    "lsh_pair_calibration",
    # round 3 additions
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
    "select_token_budget",
    "mv_maintain_join_orders",
    "multimodal_resize",
    "chunk_documents",
    # round 3, second session
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "q21_sole_return_supplier",
    "classifier_score",
    "lm_doc_score",
    "jl_project",
    "join_size_estimate",
    "cusum_anomalies",
    "benford_audit",
    "kcore_peeling",
    "positional_index",
    "phrase_search",
    "diff_orders_tolerance",
    "diff_estimate_orders",
    "k_anonymity_audit",
    "ohlc_bars",
    "semdedup_prune",
    "gopher_repetition",
    "multimodal_decode",
    "multimodal_audio_decode",
    "vocab_coverage",
    "embedding_drift",
    "cross_source_dup_matrix",
    "udaf_source_stats",
    "diff_customer_ignorecols",
    "leakage_safe_split",
    # round 4, second session
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


def audit_plan(plan: str, simple: str) -> dict[str, object]:
    return {
        # formatted mode: one "(n) NodeName" line per physical node
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)),
        "codegen_spans": int(
            (re.search(r"Found (\d+) WholeStageCodegen", simple) or [0, 0])[1]
        ),
        "python_nodes": len(
            re.findall(
                r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
                r"|MapInPandas|AggregateInPandas|ArrowAggregatePython)",
                plan,
            )
        ),
        "pushed_filters": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "PLANS.md"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from dbdiff_spark.session import get_spark

    # AQE wraps every plan in AdaptiveSparkPlan and hides codegen
    # subtrees until execution; the audit reads the static plan, so
    # disable it here (the engine itself runs with AQE on).
    spark = get_spark(
        app_name="plan_audit",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = entrymod.queries()
    # prefer the lazy plan overrides (eagerly-materializing and
    # iterative queries): the audit reads the inspectable distributed
    # plan, not a post-materialization LocalTableScan, and never runs
    # a convergence loop
    frames = getattr(entrymod, "explain_frames", dict)()

    rows = []
    for name in AUDITED:
        if name not in qs:
            continue
        try:
            df = frames.get(name, qs[name])(spark, args.sf_dir)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
            plan = qe.explainString(mode.fromString("formatted"))
            # "Found N WholeStageCodegen subtrees" — no execution needed
            simple = qe.explainString(mode.fromString("codegen")).split("\n")[0]
        except Exception as exc:
            rows.append((name, {"error": str(exc)[:100]}))
            continue
        rows.append((name, audit_plan(plan, simple)))

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/plan_audit.py` at `{args.sf_dir}`.  Counts from",
        '`explain("formatted")`; "py" nodes are Arrow/Pandas evaluation (the',
        "deliberate Python islands — multimodal feature UDFs, stateful CDC).",
        "",
        "| query | exchanges | broadcasts | codegen spans | py nodes | pushed filters | sorts |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | error: {a['error']} | | | | | |")
            continue
        lines.append(
            f"| {name} | {a['exchanges']} | {a['broadcasts']} | "
            f"{a['codegen_spans']} | {a['python_nodes']} | "
            f"{'yes' if a['pushed_filters'] else 'no'} | {a['sorts']} |"
        )
    lines += [
        "",
        "Reading guide: `diff_*` shows one exchange per side feeding the",
        "sort-merge diff join (zero when snapshots are bucketed — see",
        "`tests/test_bucketed.py`, which asserts the Exchange-free plan).",
        "`q3`/`q5` broadcast their dimension sides.  `mv_maintain_orders`",
        "shuffles only diff rows plus the group-count-sized MV merge.",
        "Python nodes are expected ONLY in multimodal/stateful-streaming/",
        "UDF-surface queries (here: the mapInPandas islands —",
        "multimodal_resize and the real-codec multimodal_decode /",
        "multimodal_audio_decode — the Arrow-batched chunking UDTF, and",
        "udaf_source_stats' grouped-aggregate pandas UDAF); every other",
        "query is JVM-only.",
        "`scd2_customer`/`merge3_customer` are the grouped single-exchange",
        "folds (no joins, no windows).  `hll_distinct`'s extra exchanges are",
        "the exact-distinct CALIBRATION column, not the sketch (registers",
        "build in one mergeable aggregation).  `pagerank_copurchase` is",
        "iterative: its exchange count is 3 rounds of keyed join+agg over",
        "the edge list, with the edge side cached pre-partitioned.",
        "Queries with explain_frames overrides (q11, the iterative",
        "neardup/leakage pair) are audited via their LAZY plan frames:",
        "q11's row shows the uncached two-scan inspection plan (the cache",
        "reuse is pinned by tests/test_plans.py via _q11_frames), and the",
        "iterative rows show ONE propagation round — every round shares",
        "that shape.",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
