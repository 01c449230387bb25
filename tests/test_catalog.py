"""Catalog unit tests: dialect SQL presence, JDBC option construction
(no live database in this environment — the option-building logic is the
testable seam; the reader itself is exercised only syntactically)."""

import pytest

from dbdiff_spark.catalog import (
    PK_SQL,
    TABLE_LIST_SQL,
    jdbc_read_options,
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
    assert opts["dbtable"] == "s.orders"  # schema prefix contract (README.md:28)
    assert opts["user"] == "u" and opts["password"] == "p"
    assert "partitionColumn" not in opts


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
