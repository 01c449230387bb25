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


def test_hll_estimate_within_expected_error(spark, sf_dir):
    """m=256 registers → relative standard error ~1.04/sqrt(256) = 6.5%;
    assert within 4σ after applying the linear-counting small-range
    correction the query intentionally leaves to the caller (it exports
    zero_registers because ln is libm-dependent and would break the
    bit-exact oracle — this test IS that caller)."""
    import math

    from dbdiff_spark.ops.sketch import HLL_M

    res = sketch.hll_distinct(spark, sf_dir).collect()
    assert len(res) > 0
    for r in res:
        assert r.exact_distinct > 0
        est = r.hll_estimate
        if est < 2.5 * HLL_M and r.zero_registers > 0:
            est = HLL_M * math.log(HLL_M / r.zero_registers)
        rel = abs(est - r.exact_distinct) / r.exact_distinct
        assert rel < 0.26, (r.grp, est, r.hll_estimate, r.exact_distinct)


def test_hll_rho_string_math(spark):
    """The hex-string leading-zero rho against direct bit arithmetic."""
    from dbdiff_spark.ops.sketch import _rho_exprs, _HLL_RHO_HEX

    cases = ["000000000000", "0000000000001".rjust(12, "0")[:12],
             "800000000000", "1fffffffffff", "0423abcdef12", "00000000000f"]
    df = spark.createDataFrame([(h,) for h in cases], "tail string")
    _, rho = _rho_exprs("tail")
    got = {r.tail: r.rho for r in df.selectExpr("tail", f"{rho} AS rho").collect()}
    for h in cases:
        v = int(h, 16)
        expected = 49 if v == 0 else (48 - v.bit_length()) + 1
        assert got[h] == expected, (h, got[h], expected)
