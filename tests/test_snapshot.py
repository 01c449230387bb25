"""Snapshot store + multi-table diff tests (SURVEY §2 ops #4/#9, §1.5.3
table-added/dropped handling, packed union sink shape)."""

from pyspark.sql import functions as F

from dbdiff_spark.catalog import FileCatalog, TESTDATA_KEYS
from dbdiff_spark.diff import DELETED, INSERTED, UPDATED, DiffMode
from dbdiff_spark.snapshot import (
    Snapshot,
    SnapshotStore,
    TABLE_ADDED,
    TABLE_DROPPED,
    diff_snapshots,
    packed_diff,
)


def make_snapshots(spark, tmp_path):
    store = SnapshotStore(spark)
    t1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    t2 = spark.createDataFrame([(1, 1.5)], "id int, v double")
    before = store.collect(
        {"t1": t1, "t2": t2}, {"t1": ["id"], "t2": ["id"]}, str(tmp_path / "before")
    )
    t1b = spark.createDataFrame([(1, "a"), (2, "B")], "id int, s string")
    t3 = spark.createDataFrame([(9, "x")], "id int, s string")
    after = store.collect(
        {"t1": t1b, "t3": t3}, {"t1": ["id"], "t3": ["id"]}, str(tmp_path / "after")
    )
    return before, after


def test_snapshot_roundtrip_and_counts(spark, tmp_path):
    before, _ = make_snapshots(spark, tmp_path)
    assert before.total_count == 3  # TotalDataCount analogue
    assert set(before.tables) == {"t1", "t2"}
    assert before.columns["t1"] == ["id", "s"]
    loaded = Snapshot.load_manifest(str(tmp_path / "before"))
    assert loaded.keys == before.keys
    assert loaded.total_count == 3


def test_diff_union_of_table_sets(spark, tmp_path):
    before, after = make_snapshots(spark, tmp_path)
    results = diff_snapshots(spark, before, after, mode=DiffMode.TYPED)
    assert set(results) == {"t1", "t2", "t3"}
    t1_rows = results["t1"].df.collect()
    assert sorted(r["diff_status"] for r in t1_rows) == [UPDATED, UPDATED]
    # dropped table: all rows DELETED; added table: all rows INSERTED
    assert [r["diff_status"] for r in results["t2"].df.collect()] == [DELETED]
    assert [r["diff_status"] for r in results["t3"].df.collect()] == [INSERTED]


def test_packed_diff_labels_table_add_drop(spark, tmp_path):
    before, after = make_snapshots(spark, tmp_path)
    packed = packed_diff(spark, before, after, mode=DiffMode.TYPED)
    rows = packed.collect()
    by_table = {}
    for r in rows:
        by_table.setdefault(r["table_name"], []).append(r)
    assert [r["diff_status"] for r in by_table["t2"]] == [TABLE_DROPPED]
    assert [r["diff_status"] for r in by_table["t3"]] == [TABLE_ADDED]
    t1_upd = [r for r in by_table["t1"] if not r["is_before"]][0]
    assert t1_upd["row"]["s"] == "B"
    assert t1_upd["key"] == {"id": "2"}


def test_file_catalog_testdata(spark, sf_dir):
    cat = FileCatalog(spark, sf_dir, TESTDATA_KEYS)
    tables = cat.list_tables()
    assert "customer" in tables and "lineitem" in tables
    keys = cat.primary_keys(["customer", "lineitem", "events"])
    assert keys["customer"] == ["c_custkey"]
    assert keys["lineitem"] == ["l_orderkey", "l_linenumber"]
    # no declared key -> all columns fallback (dbutil.go:136-141)
    assert keys["events"] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
