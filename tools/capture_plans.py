"""Capture ``.explain("formatted")`` output for named registry queries
into ``plans/r12/<query>_<tag>.txt`` — the before/after plan evidence
the optimization round commits alongside each change.

Usage::

    python tools/capture_plans.py --tag before q1 q2 ...
    python tools/capture_plans.py --tag after --sf-dir /root/testdata/sf0.1 q1

Queries whose public form materializes eagerly use their registered
``EXPLAIN_FRAMES`` override (the CLI ``--explain`` convention).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=str(Path(__file__).resolve().parent.parent / "plans" / "r12"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from dbdiff_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dbdiff_plan_capture")
    qs = entrymod.queries()
    overrides = entrymod.explain_frames()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        fn = overrides.get(name) or qs.get(name)
        if fn is None:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
