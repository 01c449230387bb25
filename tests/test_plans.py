"""Physical-plan regression tests — the scale properties ARCHITECTURE.md
claims, asserted so a future change can't silently degrade them."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(entry.queries()["q3_top_revenue_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_q3_prunes_lineitem_columns(spark, sf_dir):
    plan = _plan(entry.queries()["q3_top_revenue_orders"](spark, sf_dir))
    # the lineitem scan must read only the 3 needed columns
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "l_orderkey" in l)
    assert "l_quantity" not in scan and "l_shipdate" not in scan


def test_diff_is_equi_join_not_nested_loop(spark, sf_dir):
    plan = _plan(entry.queries()["diff_customer"](spark, sf_dir))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_diff_pushes_mutation_filters_to_scan(spark, sf_dir):
    plan = _plan(entry.queries()["diff_customer"](spark, sf_dir))
    # the delete-mutation predicate must reach a parquet scan filter
    assert "PushedFilters" in plan or "DataFilters" in plan


def test_knn_broadcasts_query_set(spark, sf_dir):
    plan = _plan(entry.queries()["knn_bruteforce"](spark, sf_dir))
    assert "Broadcast" in plan  # corpus never shuffles for brute force


def test_query_set_broadcast_guard(spark, sf_dir):
    """Regression (VERDICT r2 #4): the ANN/KNN query-set broadcast is
    bounded.  Below the bound the plan broadcasts (existing tests);
    forcing the bound to 0 must yield a fully distributed fallback —
    partition-wise replicated NL for the non-equi brute-force join,
    sort-merge for the bucket equi-join — with no broadcast of the
    query side anywhere."""
    from dbdiff_spark.ops.similarity import ann_lsh_bitsample, knn_bruteforce

    plan = _plan(knn_bruteforce(spark, sf_dir, max_broadcast_queries=0))
    assert "CartesianProduct" in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    plan2 = _plan(ann_lsh_bitsample(spark, sf_dir, max_broadcast_queries=0))
    assert "SortMergeJoin" in plan2, plan2
    assert "BroadcastHashJoin" not in plan2, plan2


def test_kmeans_final_plan_is_joinless_single_exchange(spark, sf_dir):
    """Regression (VERDICT r2 #3): k-means assignment must be a literal
    argmin PROJECTION fused into the scan — no corpus×K join, no per-row
    window — leaving exactly one REQUIRED exchange (the per-cell
    aggregation) in the returned plan.  The r12 ``spread`` rebalance in
    ``_vectors`` may add one deliberate REPARTITION_BY_NUM exchange when
    the input scan is narrower than the core count (the local-mode
    one-file case); it is a no-op at real scale and must never be
    counted as a requirement the aggregation imposed."""
    plan = _plan(entry.queries()["kmeans_lloyd"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan, plan
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
    assert plan.count("REPARTITION_BY_NUM") <= 1, plan


def test_merge3_and_scd2_are_single_exchange_grouped(spark, sf_dir):
    """diff3 and the SCD2 fold both use the grouped max(struct) pattern:
    ONE exchange, no joins, no windows, no Python in the plan."""
    for name in ("merge3_customer", "scd2_customer"):
        plan = _plan(entry.queries()[name](spark, sf_dir))
        assert plan.count("Exchange") == 1, (name, plan)
        assert "Join" not in plan, name
        assert "Window" not in plan, name


def test_bm25_is_one_scan_takeordered(spark, sf_dir):
    """BM25: stats side broadcasts; top-k plans as TakeOrdered (no
    single-partition sort of the corpus)."""
    plan = _plan(entry.queries()["bm25_rank"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q8_broadcasts_all_dimensions(spark, sf_dir):
    """7-way join: every dimension side broadcasts; the only shuffled
    join is lineitem-orders; no nested loops."""
    plan = _plan(entry.queries()["q8_market_share"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    """Q6 is a pure scan-aggregate: the date RANGE (not just null
    checks) plus discount/quantity bounds must all appear as
    PushedFilters, and the plan must contain no join."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = _plan(entry.queries()["q6_forecast_revenue"](spark, sf_dir))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "Join" not in plan, plan
    scan = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(l_shipdate" in scan, scan
    assert "LessThan(l_shipdate" in scan, scan
    assert "LessThan(l_quantity,24.0)" in scan, scan


def test_q10_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(entry.queries()["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_q18_topk_and_no_window(spark, sf_dir):
    """Q18's having-set aggregates BEFORE joining orders/customer; the
    top-k must be TakeOrderedAndProject and no window anywhere."""
    plan = _plan(entry.queries()["q18_large_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_q15_max_is_broadcast_not_window(spark, sf_dir):
    """Q15's scalar max joins back as a one-row broadcast — never a
    global window over the revenue set."""
    plan = _plan(entry.queries()["q15_top_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "Window" not in plan, plan


def test_registry_wide_plan_governance(spark, sf_dir):
    """Sweep EVERY registry query's physical plan for the two absolute
    anti-patterns: CartesianProduct (unbounded pair blow-up) and
    row-at-a-time Python evaluation (BatchEvalPython — the only
    sanctioned Python islands are Arrow-batched mapInPandas /
    applyInPandas).  BroadcastNestedLoopJoin is allowed only because
    every occurrence in this registry is a one-row scalar broadcast
    (audited; the knn guard test covers the bounded-query-set case) —
    a new unbounded BNLJ would surface here as a cartesian once AQE
    cannot build-side it, and in review via this comment."""
    qs = entry.queries()

    def _audit(item):
        name, fn = item
        plan = _plan(fn(spark, sf_dir))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython")
        return name, flags

    # thread pool (r13): each audit is independent — the eager entries
    # (ANN builds) execute real jobs and the rest is driver-side
    # analysis behind py4j, both of which overlap across threads.  Same
    # per-query assertions, ~3x less wall time (the suite's
    # second-largest entry; r12 VERDICT #1).
    from concurrent.futures import ThreadPoolExecutor

    bad = {}
    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, flags in pool.map(_audit, sorted(qs.items())):
            if flags:
                bad[name] = flags
    assert not bad, bad


def test_q21_q20_correlated_rewrites_scan_facts_once(spark, sf_dir):
    """The Q20/Q21 adapted correlated subqueries are set-based rewrites:
    the per-part / per-order totals come from windows over the pair-level
    aggregate, so each fact table is scanned exactly once (no pair-frame
    self-join that would re-read lineitem+orders)."""
    for name, n_tables in (
        ("q21_sole_return_supplier", 3),  # lineitem, orders, supplier
        ("q20_excess_suppliers", 3),      # lineitem, part, supplier
    ):
        plan = _plan(entry.queries()[name](spark, sf_dir))
        assert plan.count("Scan parquet") == n_tables, name
        assert "Window" in plan, name


def test_q2_argmin_is_aggregate_not_window(spark, sf_dir):
    """Q2's correlated-min picks the cheapest supplier per part with a
    partial-aggregable min(struct) — no window, no sort over the offer
    frame, each base table scanned once."""
    plan = _plan(entry.queries()["q2_min_cost_supplier"](spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 4  # lineitem, part, supplier, nation


def test_q11_share_filter_reuses_cached_values(spark, sf_dir):
    """Q11's scalar-subquery total and the share filter both read the
    persisted per-part aggregate: the executed plan shows the cache, not
    a second lineitem scan."""
    from dbdiff_spark.ops.tpch import _q11_frames

    values, df = _q11_frames(spark, sf_dir)
    try:
        df.write.format("noop").mode("overwrite").save()
        plan = _plan(df)
        assert plan.count("InMemoryTableScan") == 2
        assert not [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "InMemory" not in ln
        ]
    finally:
        values.unpersist()
    # the public query releases the per-part cache before returning.
    # The localCheckpoint that replaced the collect→createDataFrame
    # round trip (r4 bench regression) pins the BOUNDED result
    # (<5000 rows by the 1/frac argument) for as long as the caller
    # holds it — so the map may grow by exactly that one checkpoint,
    # never by the unbounded per-part aggregate.
    jsc = spark.sparkContext._jsc  # type: ignore[attr-defined]
    before_n = jsc.getPersistentRDDs().size()
    out = entry.queries()["q11_important_parts"](spark, sf_dir)
    assert jsc.getPersistentRDDs().size() <= before_n + 1
    # collecting the result must NOT re-run the distributed job: the
    # executed plan reads the checkpointed rows, not parquet
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan


def test_positional_index_is_single_exchange(spark, sf_dir):
    """The exploded (doc,pos,term) stream repartitions on term ONCE; the
    (term,doc) aggregation and both per-term windows must reuse that
    partitioning (hash(term) satisfies the (term,doc) clustering)."""
    plan = _plan(entry.queries()["positional_index"](spark, sf_dir))
    assert plan.count("Exchange") == 1


def test_ohlc_open_close_are_aggregates_not_windows(spark, sf_dir):
    plan = _plan(entry.queries()["ohlc_bars"](spark, sf_dir))
    assert "Window" not in plan


def test_cusum_windows_share_one_user_shuffle(spark, sf_dir):
    """Both stacked window functions (prefix sum, running min) and the
    final per-user aggregation run off the same user-keyed exchange —
    only the presentation orderBy adds a second."""
    plan = _plan(entry.queries()["cusum_anomalies"](spark, sf_dir))
    assert plan.count("Exchange") <= 2


def test_diff_estimate_samples_before_classification(spark, sf_dir):
    """The key-hash sample filters must sit below the diff classification
    — the whole point is classifying 1/16 of the keys, not all of them.
    With dedup_keys (the diff_snapshots semantics the estimator adopted
    after the phantom-duplicate fix) the classifier is the one-shuffle
    grouped-dedup form: tagged union + grouped max(struct), no
    full-outer join."""
    plan = _plan(entry.queries()["diff_estimate_orders"](spark, sf_dir))
    # both side scans feed through a Filter containing the hash threshold
    assert plan.count("17592186044416") >= 2
    assert "Union" in plan and "FullOuter" not in plan


def test_explain_frames_are_lazy_and_distributed(spark, sf_dir):
    """The --explain override for eagerly-materializing queries must
    (a) expose the DISTRIBUTED plan (parquet scans, not a local
    result) and (b) not leave a cache behind (review regression:
    --explain used to execute q11 and print a LocalTableScan)."""
    frames = entry.explain_frames()
    assert "q11_important_parts" in frames
    jsc = spark.sparkContext._jsc  # type: ignore[attr-defined]
    before_n = jsc.getPersistentRDDs().size()
    df = frames["q11_important_parts"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan and "LocalTableScan" not in plan
    assert jsc.getPersistentRDDs().size() <= before_n
