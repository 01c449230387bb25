"""Sketch-tier invariants (CMS/KMV are covered via oracle + plan tests;
here: the quantile grid sketch's error bound)."""

import pyspark.sql.functions as F

from dbdiff_spark.io import load_table
from dbdiff_spark.ops import sketch


def test_quantile_histogram_bounds_exact_percentiles(spark, sf_dir):
    res = {r.grp: r for r in sketch.quantile_histogram(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )
    w = sketch.QUANTILE_CELL_WIDTH
    for r in exact.collect():
        s = res[r.grp]
        # sketch upper bound is >= the exact quantile and within one cell
        for pct, ex in (("p50", r.p50), ("p95", r.p95), ("p99", r.p99)):
            up = s[f"{pct}_upper"]
            assert ex <= up <= ex + 2 * w, (r.grp, pct, ex, up)
