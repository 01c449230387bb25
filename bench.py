"""Headline benchmark — run the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with the no-op sink (full plan runs,
nothing collected to the driver — measures engine throughput, not
driver serialization).
"""

from __future__ import annotations

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
    "top_events_per_user",
    "user_sessions",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "knn_bruteforce",
    "ann_lsh_bitsample",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dbdiff_spark_bench")
    qs = entrymod.queries()
    # JVM/codegen/shuffle warmup so the first query doesn't pay one-time
    # startup cost (exercises codegen, exchange, sort-merge join paths)
    a = spark.range(500_000).selectExpr("id", "id % 1000 AS k")
    b = spark.range(500_000).selectExpr("id AS id2", "id % 1000 AS k")
    a.join(b, "k").groupBy("k").count().write.format("noop").mode("overwrite").save()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        run_query(qs[name](spark, SF_DIR))
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
