"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and order-insensitive
canonicalized values.  Usage::

    python tools/check_oracle.py            # all queries
    python tools/check_oracle.py diff_customer snapshot_counts
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v) -> str:
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def main(names: list[str], sf_dir: str = SF_DIR, spark=None) -> int:
    import __spark_entry__ as entrymod

    if spark is None:
        from dbdiff_spark.session import get_spark

        spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW \"{t}\" AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if not names:
        names = list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures.append(name)
            continue
        s_cols, s_rows = canon_frame(spark_pdf)
        d_cols, d_rows = canon_frame(duck_pdf)
        ok = True
        if s_cols != d_cols:
            print(f"[FAIL] {name}: columns differ\n  spark: {s_cols}\n  duck:  {d_cols}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"[FAIL] {name}: row counts differ spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        elif s_rows != d_rows:
            diff_idx = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(
                f"[FAIL] {name}: values differ at sorted row {diff_idx}\n"
                f"  spark: {s_rows[diff_idx]}\n  duck:  {d_rows[diff_idx]}"
            )
            ok = False
        if ok:
            print(f"[ok] {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    sf_dir = SF_DIR
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    raise SystemExit(main(argv, sf_dir=sf_dir))
