"""Time a subset of registry queries with the bench's exact methodology
(per-plan sf0.001 warmup, min-of-3 noop-sink runs at $SPARK_GRAFT_SF_DIR)
— the quick before/after instrument for single-operator optimization
work, so a 30-second measurement does not require the 35-minute full
suite.  Prints one JSON line {"queries": {name: sec}}.

Usage::

    python tools/time_subset.py ann_ivf_serve dedup_simhash_neardup
    python tools/time_subset.py --runs 5 gopher_repetition
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    from dbdiff_spark.session import get_spark

    spark = get_spark(app_name="dbdiff_time_subset")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run_query(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        try:
            run_query(qs[name](spark, "/root/testdata/sf0.001"))
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        out[name] = best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": SF_DIR, "runs": runs}))


if __name__ == "__main__":
    main()
