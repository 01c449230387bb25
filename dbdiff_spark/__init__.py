"""dbdiff_spark — a PySpark-native snapshot-diff + data-pipeline engine.

Re-implements the capabilities of the reference engine (jparound30/dbdiff,
a Go CLI that diffs two point-in-time snapshots of a relational database
keyed on primary key — see /root/reference/extract_data.go) as an
idiomatic, horizontally-scalable Spark DataFrame library, and extends it
with the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the reference lacks.

Design stance (vs. the reference):

* the reference materializes every row of every table in driver heap
  (``extract_data.go:12-17``); we keep everything as distributed
  DataFrames backed by Parquet/JDBC — nothing driver-resident.
* the reference's diff is a single-threaded hash full-outer join
  (``extract_data.go:196-246``); ours is a Catalyst-planned full-outer
  join that scales to any cluster, with null-safe key comparison and no
  key-concatenation collision bug (``extract_data.go:149-160``).
"""

from dbdiff_spark.diff import (
    DiffMode,
    DiffResult,
    apply_diff,
    diff3_tables,
    diff_multiset,
    diff_summary,
    diff_tables,
    estimate_diff_counts,
)
from dbdiff_spark.ops.history import pit_join, scd2_apply, scd2_history
from dbdiff_spark.ops.quality import (
    cascade_delete,
    outlier_report,
    profile_table,
    validate_rules,
)
from dbdiff_spark.ops.skew import join_skew_report, salted_join
from dbdiff_spark.normalize import normalize_to_strings, presentation_view
from dbdiff_spark.snapshot import (
    Snapshot,
    SnapshotStore,
    compact_table,
    diff_snapshots,
    diff_timeline,
    estimate_changes,
    list_generations,
    snapshot_file_stats,
    vacuum_generations,
)
from dbdiff_spark.config import Configuration, DbConfig, load_configuration
from dbdiff_spark.io import IngestLedger
from dbdiff_spark.sinks.corpus import write_training_shards
from dbdiff_spark.session import get_spark

__all__ = [
    "DiffMode",
    "DiffResult",
    "apply_diff",
    "diff3_tables",
    "diff_multiset",
    "diff_tables",
    "diff_summary",
    "estimate_diff_counts",
    "scd2_history",
    "scd2_apply",
    "pit_join",
    "normalize_to_strings",
    "presentation_view",
    "Snapshot",
    "SnapshotStore",
    "diff_snapshots",
    "diff_timeline",
    "estimate_changes",
    "list_generations",
    "vacuum_generations",
    "snapshot_file_stats",
    "compact_table",
    "profile_table",
    "cascade_delete",
    "outlier_report",
    "validate_rules",
    "salted_join",
    "join_skew_report",
    "Configuration",
    "DbConfig",
    "load_configuration",
    "get_spark",
    "IngestLedger",
    "write_training_shards",
]

__version__ = "0.1.0"
