"""End-to-end parity of every declared driver query against the DuckDB
oracle at sf0.001 (the driver's real t2 gate runs the same comparison at
sf0.01 — SURVEY §5.2 item 3)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import main as check_main


def test_all_queries_match_oracle(spark, sf_dir):
    assert check_main([], sf_dir=sf_dir, spark=spark) == 0
