"""End-to-end parity of every declared driver query against the DuckDB
oracle at sf0.001 (the driver's real t2 gate runs the same comparison at
sf0.01 — SURVEY §5.2 item 3)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import main as check_main


def test_all_queries_match_oracle(spark, sf_dir):
    # jobs=4: the tool's thread pool overlaps Spark job submission,
    # driver-side planning and the DuckDB replays of independent
    # queries — same 241-query coverage, ~3x less wall time (the
    # suite's single largest entry; r12 VERDICT #1 asks for the whole
    # run to fit the driver's budget)
    assert check_main([], sf_dir=sf_dir, spark=spark, jobs=4) == 0
