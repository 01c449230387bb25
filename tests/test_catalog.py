"""Catalog unit tests: dialect SQL presence, JDBC option construction
(no live database in this environment — the option-building logic is the
testable seam; the reader itself is exercised only syntactically)."""

import pytest

from dbdiff_spark.catalog import (
    PK_SQL,
    TABLE_LIST_SQL,
    jdbc_read_options,
    quote_ident,
)
from dbdiff_spark.config import DbConfig


def _db():
    return DbConfig(
        type="postgresql", host="h", port=5432, user="u", password="p",
        name="d", schema="s.",
    )


def test_dialect_sql_covers_reference_dialects():
    # reference supports exactly these three (db_impl.go:28-48)
    assert set(TABLE_LIST_SQL) == {"postgresql", "mysql", "sqlserver"}
    assert set(PK_SQL) == {"postgresql", "mysql", "sqlserver"}


def test_jdbc_options_plain():
    opts = jdbc_read_options(_db(), "orders")
    assert opts["url"] == "jdbc:postgresql://h:5432/d"
    # raw schema prefix contract (README.md:28) + quoted table name
    assert opts["dbtable"] == 's."orders"'
    assert opts["user"] == "u" and opts["password"] == "p"
    assert "partitionColumn" not in opts


def test_quote_ident_escapes_per_dialect():
    assert quote_ident("postgresql", 'odd "name"') == '"odd ""name"""'
    assert quote_ident("mysql", "back`tick") == "`back``tick`"
    assert quote_ident("sqlserver", "br]acket") == "[br]]acket]"
    # generic-JDBC dialects fall back to SQL-standard double quotes
    assert quote_ident("oracle", 'o"dd') == '"o""dd"'
    assert quote_ident("derby", "t") == '"t"'


def test_jdbc_options_partitioned():
    opts = jdbc_read_options(
        _db(), "orders", partition_column="o_orderkey",
        num_partitions=32, lower_bound=1, upper_bound=1_000_000,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "1000000"


def test_jdbc_options_partitioned_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_read_options(_db(), "orders", partition_column="o_orderkey")


def _auto(monkeypatch, spark, sf_dir, key_cols, bounds_row):
    """Drive jdbc_table_auto with the JDBC seams stubbed: the table read
    returns a local parquet frame, the bounds query returns a canned row."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.io import load_table

    calls = {}

    def fake_jdbc_table(spark_, db_, table_, **kwargs):
        calls.update(kwargs)
        return load_table(spark_, sf_dir, "orders")

    class _Bounds:
        def collect(self):
            return [bounds_row]

    def fake_read_query(spark_, db_, sql_):
        calls["bounds_sql"] = sql_
        return _Bounds()

    monkeypatch.setattr(cat, "jdbc_table", fake_jdbc_table)
    monkeypatch.setattr(cat, "_read_query", fake_read_query)
    cat.jdbc_table_auto(spark, _db(), "orders", key_cols)
    return calls


def test_jdbc_auto_partitions_on_integral_key(monkeypatch, spark, sf_dir):
    calls = _auto(
        monkeypatch, spark, sf_dir, ["o_orderkey"], (1, 60_000)
    )
    assert calls["partition_column"] == "o_orderkey"
    assert calls["lower_bound"] == 1 and calls["upper_bound"] == 60_000
    # the bounds round-trip quotes the column per dialect
    assert '"o_orderkey"' in calls["bounds_sql"]


def test_jdbc_auto_partitions_on_datetime_key(monkeypatch, spark, sf_dir):
    # no integral key → first date/timestamp key ranges the scan, with
    # literal string bounds (Spark's JDBC datetime partitioning contract)
    import datetime

    calls = _auto(
        monkeypatch,
        spark,
        sf_dir,
        ["o_orderstatus", "o_orderdate"],
        (datetime.date(1995, 1, 1), datetime.date(1998, 8, 2)),
    )
    assert calls["partition_column"] == "o_orderdate"
    assert calls["lower_bound"] == "1995-01-01"
    assert calls["upper_bound"] == "1998-08-02"
    # probe SQL quotes both the column and the table identifier
    assert '"o_orderdate"' in calls["bounds_sql"]
    assert 's."orders"' in calls["bounds_sql"]


def test_jdbc_auto_routes_string_key_to_partitioned_scan(
    monkeypatch, spark, sf_dir
):
    # r6: a string key no longer silently falls back to the
    # single-connection scan (the r5 VERDICT gap) — it routes to the
    # boundary-sampled string partitioner, whose first probe is COUNT(*)
    import dbdiff_spark.catalog as cat

    routed = {}

    def fake_string_part(spark_, db_, table_, col_, n_):
        routed["col"] = col_
        return "sentinel"

    monkeypatch.setattr(
        cat, "jdbc_table_string_partitioned", fake_string_part
    )
    monkeypatch.setattr(
        cat, "jdbc_table",
        lambda spark_, db_, table_, **kw: __import__(
            "dbdiff_spark.io", fromlist=["load_table"]
        ).load_table(spark_, sf_dir, "orders"),
    )
    out = cat.jdbc_table_auto(spark, _db(), "orders", ["o_orderstatus"])
    assert out == "sentinel" and routed["col"] == "o_orderstatus"


def test_jdbc_auto_falls_back_without_any_rangeable_key(
    monkeypatch, spark, sf_dir
):
    # a double column is neither integral, datetime, nor string →
    # genuine single-scan fallback, no probes of any kind
    calls = _auto(monkeypatch, spark, sf_dir, ["o_totalprice"], (1, 2))
    assert "bounds_sql" not in calls
    assert "partition_column" not in calls and "partitionColumn" not in calls


def test_jdbc_auto_falls_back_on_empty_bounds(monkeypatch, spark, sf_dir):
    calls = _auto(
        monkeypatch, spark, sf_dir, ["o_orderkey"], (None, None)
    )
    assert "bounds_sql" in calls  # probed, then declined
    assert "partition_column" not in calls and "partitionColumn" not in calls


def test_file_catalog_multi_format(spark, tmp_path):
    """CSV/JSON/ORC tables are listed and loadable next to parquet;
    parquet wins when the same name exists twice."""
    from dbdiff_spark.catalog import FileCatalog
    from dbdiff_spark.io import load_table, read_source

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").limit(50)
    cust.write.option("header", "true").csv(str(tmp_path / "c_csv.csv"))
    cust.write.json(str(tmp_path / "c_json.json"))
    cust.write.orc(str(tmp_path / "c_orc.orc"))
    cust.write.parquet(str(tmp_path / "c_orc.parquet"))  # name collision

    cat = FileCatalog(spark, str(tmp_path), {"c_csv": ["c_custkey"]})
    assert cat.list_tables() == ["c_csv", "c_json", "c_orc"]
    assert cat.load("c_csv").count() == 50
    assert cat.load("c_json").count() == 50
    # collision resolved to parquet
    assert dict(cat.load("c_orc").dtypes)["c_custkey"] == "bigint"
    assert cat.primary_keys(["c_csv", "c_json"]) == {
        "c_csv": ["c_custkey"],
        "c_json": sorted(cat.load("c_json").columns, key=cat.load("c_json").columns.index),
    }
    # read_source format inference
    assert read_source(spark, str(tmp_path / "c_csv.csv")).count() == 50


def test_file_catalog_discovers_directory_tables(spark, tmp_path):
    """Lake layout: a table is a DIRECTORY of part files (optionally
    hive-partitioned); the catalog lists it, loads it whole, and single
    files still win their formats."""
    from dbdiff_spark.catalog import FileCatalog

    base = tmp_path / "lake"
    base.mkdir()
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], "id int, v string, p string")
    df.write.partitionBy("p").parquet(str(base / "events_dir"))
    spark.createDataFrame([(9, "z")], "id int, v string").write.parquet(
        str(base / "flat_dir")
    )
    (base / "plain.csv").write_text("id,v\n5,q\n")
    (base / "_hidden_dir").mkdir()
    (base / "_hidden_dir" / "x.parquet").write_text("not data")

    cat = FileCatalog(spark, str(base), {"events_dir": ["id"]})
    assert cat.list_tables() == ["events_dir", "flat_dir", "plain"]
    ev = cat.load("events_dir")
    assert ev.count() == 2 and set(ev.columns) == {"id", "v", "p"}
    assert cat.load("flat_dir").count() == 1
    assert cat.load("plain").count() == 1
    assert cat.primary_keys(["events_dir"])["events_dir"] == ["id"]


def test_ingest_ledger_exactly_once_and_rewrite_detection(spark, tmp_path):
    from dbdiff_spark.io import IngestLedger

    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.csv").write_text(f"id\n{i}\n")
    led = IngestLedger(spark, str(tmp_path / "ledger"))
    first = led.pending(str(src))
    assert len(first) == 3
    led.commit(first[:2])
    second = led.pending(str(src))
    assert len(second) == 1 and second[0].endswith("f2.csv")
    led.commit(second)
    assert led.pending(str(src)) == []
    # in-place rewrite (same name, different bytes) becomes pending again
    (src / "f0.csv").write_text("id\n999999\n")
    again = led.pending(str(src))
    assert len(again) == 1 and again[0].endswith("f0.csv")
    # hidden and non-data files never surface
    (src / "_SUCCESS").write_text("")
    (src / "notes.txt").write_text("x")
    assert len(led.pending(str(src))) == 1
    # the claim check is a distributed anti join — the ledger history
    # is read as a scan feeding a LeftAnti join, never collected to a
    # driver-side set (r3 regression guard)
    plan = led.pending_df(str(src))._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "Scan parquet" in plan


def test_string_literal_escapes_per_dialect():
    """Partition-predicate literals use quote doubling ONLY — the one
    escape every dialect and session mode interprets identically.
    Backslash-bearing boundaries never reach literal rendering (the
    partitioner falls back instead: rendering them is wrong under one
    of MySQL's / legacy PG's session modes either way)."""
    from dbdiff_spark.catalog import _string_literal

    assert _string_literal("postgresql", "o'brien") == "'o''brien'"
    assert _string_literal("sqlserver", "a\\zz") == "'a\\zz'"
    assert _string_literal("mysql", "o'b") == "'o''b'"


def test_backslash_boundary_forces_single_scan_on_ambiguous_dialects(
    monkeypatch, spark
):
    """MySQL/PG backslash rendering is session-mode-dependent, so a
    sampled boundary containing a backslash must force the single-scan
    fallback rather than ship an ambiguous literal predicate."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig

    class _Count:
        def collect(self):
            from pyspark.sql import Row

            return [Row(c=1000)]

    monkeypatch.setattr(cat, "_read_query", lambda s, d, q: _Count())
    monkeypatch.setattr(
        cat, "_sample_boundaries",
        lambda s, d, t, c, n, p: ["aaa", "k\\mid", "zzz"],
    )
    monkeypatch.setattr(
        cat, "jdbc_table", lambda s, d, t, **kw: "single-scan"
    )
    monkeypatch.setattr(
        cat, "jdbc_table_predicates",
        lambda s, d, t, preds: ("predicates", preds),
    )
    out = cat.jdbc_table_string_partitioned(
        spark, DbConfig(type="mysql", url="jdbc:mysql://h/d"), "t", "uid", 4
    )
    assert out == "single-scan"
    # a backslash-free boundary set on the same dialect partitions fine
    monkeypatch.setattr(
        cat, "_sample_boundaries",
        lambda s, d, t, c, n, p: ["aaa", "kmid", "zzz"],
    )
    out2 = cat.jdbc_table_string_partitioned(
        spark, DbConfig(type="mysql", url="jdbc:mysql://h/d"), "t", "uid", 4
    )
    assert out2[0] == "predicates" and len(out2[1]) == 4


def test_string_partitioner_falls_back_on_probe_failure(monkeypatch, spark):
    """A dialect whose probe SQL errors (no OFFSET/FETCH, no window
    functions) must degrade to the single-connection scan, never abort
    the snapshot."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig

    def boom(spark_, db_, sql_):
        raise RuntimeError("syntax error near OFFSET")

    monkeypatch.setattr(cat, "_read_query", boom)
    monkeypatch.setattr(
        cat, "jdbc_table", lambda spark_, db_, table_, **kw: "single-scan"
    )
    out = cat.jdbc_table_string_partitioned(
        spark, DbConfig(type="postgresql"), "t", "uid", 4
    )
    assert out == "single-scan"


def test_boundary_sampling_uses_one_round_trip_on_window_dialects(
    monkeypatch, spark
):
    """pg/mysql/mssql boundary sampling is ONE ordered ROW_NUMBER query
    (single index scan server-side), not N-1 O(offset) OFFSET walks."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig

    from pyspark.sql import Row

    calls = []

    class _Rows:
        def collect(self):
            # deliberately misordered: result-set order is unguaranteed
            # (Spark wraps the query in a subquery), so the sampler must
            # sort client-side by the rank it selects alongside
            return [
                Row(b="b2", rn=500),
                Row(b="b3", rn=750),
                Row(b="b1", rn=250),
            ]

    def fake_read_query(spark_, db_, sql_):
        calls.append(sql_)
        return _Rows()

    monkeypatch.setattr(cat, "_read_query", fake_read_query)
    got = cat._sample_boundaries(
        spark, DbConfig(type="postgresql"), "t", "uid", 1000, 4
    )
    assert got == ["b1", "b2", "b3"]  # rn-sorted despite arrival order
    assert len(calls) == 1
    assert "ROW_NUMBER() OVER (ORDER BY" in calls[0]
    assert "rn IN (250, 500, 750)" in calls[0]


def test_boundary_sampling_degrades_window_failure_to_offset_probes(
    monkeypatch, spark
):
    """MySQL < 8 / MariaDB without window functions: the ROW_NUMBER
    query errors, and the sampler must degrade to the OFFSET probe walk
    — NOT to the single-connection scan."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig

    calls = []

    def fake_read_query(spark_, db_, sql_):
        calls.append(sql_)
        if "ROW_NUMBER" in sql_:
            raise RuntimeError("1064: syntax error near 'OVER'")

        class _R:
            def collect(self_inner):
                return [(f"b{len(calls)}",)]

        return _R()

    monkeypatch.setattr(cat, "_read_query", fake_read_query)
    got = cat._sample_boundaries(
        spark, DbConfig(type="mysql"), "t", "uid", 1000, 4
    )
    assert len(got) == 3
    offset_probes = [c for c in calls if "LIMIT 1 OFFSET" in c]
    assert len(offset_probes) == 3  # the mysql OFFSET dialect branch


def test_non_monotone_offset_probe_boundaries_force_single_scan(
    monkeypatch, spark
):
    """The OFFSET-probe walk issues N-1 queries at different times:
    concurrent writes can return out-of-order boundaries, whose range
    predicates then OVERLAP (rows silently duplicate in the snapshot).
    A non-monotone walk sequence must warn and degrade to the
    single-connection scan (ADVICE r6).  The windowed path is exempt by
    construction (one snapshot-consistent rn-sorted statement) — a
    byte-order check there would wrongly single-scan valid
    locale-collated boundaries."""
    import warnings

    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig

    class _One:
        def __init__(self, v):
            self.v = v

        def collect(self):
            return [(self.v,)]

    # derby takes the OFFSET walk (no windowed-boundary support);
    # simulate a race: the rank-2 probe sees newly-inserted low keys
    walk = iter([_One(1000), _One("mmm"), _One("aaa"), _One("zzz")])
    monkeypatch.setattr(cat, "_read_query", lambda s, d, q: next(walk))
    monkeypatch.setattr(
        cat, "jdbc_table", lambda s, d, t, **kw: "single-scan"
    )
    monkeypatch.setattr(
        cat, "jdbc_table_predicates",
        lambda s, d, t, preds: ("predicates", preds),
    )
    db = DbConfig(type="derby")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = cat.jdbc_table_string_partitioned(spark, db, "t", "uid", 4)
    assert out == "single-scan"
    assert any("non-monotone" in str(w.message) for w in caught)
    # the same boundaries in order partition fine
    walk2 = iter([_One(1000), _One("aaa"), _One("mmm"), _One("zzz")])
    monkeypatch.setattr(cat, "_read_query", lambda s, d, q: next(walk2))
    out2 = cat.jdbc_table_string_partitioned(spark, db, "t", "uid", 4)
    assert out2[0] == "predicates" and len(out2[1]) == 4


def test_jdbc_table_predicates_sets_fetchsize(monkeypatch, spark):
    """Predicate-partitioned reads must stream results like every other
    JDBC path: without fetchsize, pgjdbc (default 0) buffers the whole
    per-partition result set in executor memory — on exactly the large
    string-keyed tables this path exists for (ADVICE r6)."""
    import dbdiff_spark.catalog as cat
    from dbdiff_spark.config import DbConfig
    from pyspark.sql.readwriter import DataFrameReader

    seen = {}

    def fake_jdbc(self, url, table, *args, **kwargs):
        seen.update(kwargs)
        return "df"

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    out = cat.jdbc_table_predicates(
        spark, DbConfig(type="postgresql"), "t", ["uid < 'm'", "uid >= 'm'"]
    )
    assert out == "df"
    assert seen["properties"]["fetchsize"] == "10000"


def test_read_source_infers_format_through_compression_suffix(spark, tmp_path):
    """Lake files routinely arrive as data.csv.gz / events.jsonl.gz —
    Spark's text sources decompress them transparently by extension,
    but format inference must look THROUGH the compression suffix: a
    bare suffix lookup saw '.gz', fell back to parquet, and the read
    exploded (r7 gap).  Exercised with REAL gzip bytes, not mocks."""
    import gzip

    from dbdiff_spark.io import infer_format, read_source

    csv_gz = tmp_path / "people.csv.gz"
    with gzip.open(csv_gz, "wt") as f:
        f.write("id,name\n1,ada\n2,grace\n")
    jsonl_gz = tmp_path / "events.jsonl.gz"
    with gzip.open(jsonl_gz, "wt") as f:
        f.write('{"id": 1, "kind": "x"}\n{"id": 2, "kind": "y"}\n')

    assert infer_format(str(csv_gz)) == "csv"
    assert infer_format(str(jsonl_gz)) == "json"
    assert infer_format("a/b/t.parquet") == "parquet"
    assert infer_format("a/b/t.unknownext") is None

    got = read_source(spark, str(csv_gz))
    assert sorted(r["name"] for r in got.collect()) == ["ada", "grace"]
    ev = read_source(spark, str(jsonl_gz))
    assert ev.count() == 2 and set(ev.columns) == {"id", "kind"}


def test_file_catalog_lists_compressed_tables_by_bare_stem(spark, tmp_path):
    """A gzip'd CSV in the catalog directory is table 'people', not
    'people.csv' — both the format and the compression extension strip
    from the table name, and the load round-trips the real bytes."""
    import gzip

    from dbdiff_spark.catalog import FileCatalog

    with gzip.open(tmp_path / "people.csv.gz", "wt") as f:
        f.write("id,name\n1,ada\n2,grace\n")
    cat = FileCatalog(spark, str(tmp_path), {"people": ["id"]})
    assert cat.list_tables() == ["people"]
    assert sorted(r["name"] for r in cat.load("people").collect()) == [
        "ada", "grace",
    ]
    assert cat.primary_keys(["people"]) == {"people": ["id"]}


def test_compression_strip_is_text_only_and_codec_gated(spark, tmp_path):
    """Binary formats carry compression INSIDE the file — a whole-file
    gzip of a parquet (backup.parquet.gz) is NOT transparently readable
    and must stay a non-table; .xz has no Hadoop codec at all (it would
    parse as garbage text) and .zst needs native libhadoop, so neither
    surfaces as a table.  bzip2 — the other pure-JVM codec — round
    trips like gzip."""
    import bz2
    import gzip

    from dbdiff_spark.catalog import FileCatalog
    from dbdiff_spark.io import infer_format, table_stem

    assert infer_format("backup.parquet.gz") is None
    assert infer_format("t.orc.gz") is None
    assert infer_format("people.csv.xz") is None
    assert infer_format("people.csv.zst") is None
    assert infer_format("people.csv.bz2") == "csv"
    assert table_stem("backup.parquet.gz") == "backup.parquet"

    with bz2.open(tmp_path / "b.csv.bz2", "wt") as f:
        f.write("id,v\n1,aa\n")
    # a gzipped parquet next to it must not become a table
    with gzip.open(tmp_path / "backup.parquet.gz", "wb") as f:
        f.write(b"PAR1 not really a parquet stream")
    cat = FileCatalog(spark, str(tmp_path), {})
    assert cat.list_tables() == ["b"]
    assert cat.load("b").count() == 1


def test_file_catalog_warns_on_same_format_shadowing(spark, tmp_path):
    """people.csv next to people.csv.gz (mid-recompression lake state):
    the catalog keeps the uncompressed file and WARNS about the
    shadowed copy — silently diffing the wrong snapshot is the failure
    mode this guards."""
    import gzip
    import warnings

    from dbdiff_spark.catalog import FileCatalog

    (tmp_path / "people.csv").write_text("id,name\n1,ada\n")
    with gzip.open(tmp_path / "people.csv.gz", "wt") as f:
        f.write("id,name\n1,ada\n2,grace\n")
    cat = FileCatalog(spark, str(tmp_path), {})
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tables = cat.list_tables()
    assert tables == ["people"]
    assert any("shadowed" in str(w.message) for w in caught)
    assert cat.load("people").count() == 1  # the uncompressed copy wins


def test_file_catalog_warns_on_cross_format_shadowing(spark, tmp_path):
    """people.csv next to people.json (ADVICE r7): neither is parquet,
    so the parquet-wins rule does not adjudicate — the sorted-first file
    wins and the catalog must WARN, same hazard as the same-format tie.
    A parquet-vs-other collision stays silent: that one the documented
    rule DOES adjudicate."""
    import warnings

    from dbdiff_spark.catalog import FileCatalog

    (tmp_path / "people.csv").write_text("id,name\n1,ada\n")
    (tmp_path / "people.json").write_text('{"id": 1, "name": "ada"}\n{"id": 2, "name": "grace"}\n')
    cat = FileCatalog(spark, str(tmp_path), {})
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tables = cat.list_tables()
    assert tables == ["people"]
    assert any(
        "cross-format" in str(w.message) and "people.json" in str(w.message)
        for w in caught
    )
    assert cat.load("people").count() == 1  # sorted-first (csv) wins

    # parquet-wins collisions are adjudicated — no warning, even when
    # the parquet sibling sorts AFTER a csv-vs-json pair (the r8 review
    # caught a mid-scan warning firing before the winner was known)
    spark.createDataFrame([(1, "ada"), (2, "grace")], "id int, name string").write.parquet(
        str(tmp_path / "staff.parquet")
    )
    (tmp_path / "staff.csv").write_text("id,name\n1,ada\n")
    (tmp_path / "staff.json").write_text('{"id": 1, "name": "ada"}\n')
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        cat2 = FileCatalog(spark, str(tmp_path), {})
        cat2.list_tables()
    assert not any("staff" in str(w.message) for w in caught2)
    assert cat2.load("staff").count() == 2  # parquet wins
