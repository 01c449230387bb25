"""Scaling probe for the banded hamming near-dup candidate generator
(``multimodal_dhash_neardup``'s sizing math).

The op's scale note claims: expected candidate pairs ≈ N²·B/2^(w+1)
even for UNIFORM hashes (B bands of w bits).  The growth exponent is 2
at ANY width — band width divides the CONSTANT by 2^Δw, it does not
linearize — so the deployment rule is to pick w ≈ log₂(N) for the
target corpus, keeping the absolute candidate count ≈ N·B/2 there:
the fixture's 40-bit/4×10 grid is sound to N~10⁵, and a 10⁹-image
deployment needs a PDQ-class 128-bit hash (4×32-bit bands).  This
probe pins both halves empirically:

* w=10 (the shipped grid): measured pairs should track N²·B/2^11 and
  the per-decade exponent should be ≈2.
* w=16 at the same N: the same exponent with the constant ~64× lower.

Band values are drawn directly from md5 hex slices (uniform by
construction; the codec is byte-exact-verified elsewhere and
irrelevant to join volume).  Near-dup planting is unnecessary: the
quadratic term IS the uniform-collision floor.

Usage: python tools/probe_dhash_scale.py [--scales 30000,100000,300000]
(run with 2>/dev/null — Spark progress bars interleave stdout).
Writes nothing to the repo; prints a markdown table for ARCHITECTURE.md.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dbdiff_spark.session import get_spark  # noqa: E402

N_BANDS = 4


def candidate_count(spark, n: int, band_bits: int) -> tuple[int, float]:
    """Distinct candidate pairs from the band self-join over n uniform
    hashes (the exact join shape the op uses).  Each band's value is an
    independent md5 hex slice masked to ``band_bits`` — no packed
    64-bit hash, so no BIGINT overflow at any width."""
    hex_per_band = -(-band_bits // 4)  # ceil: 10→3 chars (12 bits), 16→4
    mask = 2 ** band_bits - 1
    band_structs = ", ".join(
        f"struct({b} AS band_idx, "
        f"(CAST(conv(substr(md5(CAST(id AS STRING)), {1 + b * hex_per_band}, "
        f"{hex_per_band}), 16, 10) AS BIGINT) & {mask}) AS band_val)"
        for b in range(N_BANDS)
    )
    banded = spark.range(n).selectExpr(
        "id AS doc_id", f"explode(array({band_structs})) AS band"
    ).select("doc_id", "band.band_idx", "band.band_val")
    left, right = banded.alias("x"), banded.alias("y")
    t0 = time.time()
    pairs = (
        left.join(
            right,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    return pairs, time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="30000,100000,300000")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from dbdiff_spark.ops.dedup import (
        SIMHASH_BAND_BITS_MAX,
        SIMHASH_BAND_BITS_MIN,
        hamming_band_bits,
    )

    spark = get_spark(app_name="probe_dhash_scale")
    # derived_w: what the runtime derivation (r6) would actually pick at
    # this N — the law the fixed-w rows validate empirically
    print(
        "| N | w | derived_w(N) | expected N²·B/2^(w+1) | measured pairs"
        " | exponent | s |"
    )
    print("|---|---|---|---|---|---|---|")
    for band_bits in (10, 16):
        prev = None
        for n in scales:
            expected = n * n * N_BANDS // (2 ** (band_bits + 1))
            pairs, dt = candidate_count(spark, n, band_bits)
            expo = (
                f"{math.log(pairs / prev[1]) / math.log(n / prev[0]):.2f}"
                if prev and prev[1] > 0 and pairs > 0
                else "-"
            )
            derived = hamming_band_bits(
                n, SIMHASH_BAND_BITS_MIN, SIMHASH_BAND_BITS_MAX
            )
            print(
                f"| {n} | {band_bits} | {derived} | {expected} | {pairs}"
                f" | {expo} | {dt:.1f} |",
                flush=True,
            )
            prev = (n, pairs)


if __name__ == "__main__":
    main()
