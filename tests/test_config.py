"""Config-surface tests mirroring the reference's only test file
(configuration_test.go:11-29 normal/missing/invalid/empty cases and
:31-147 singleton semantics)."""

import pytest

from dbdiff_spark.config import (
    Configuration,
    ConfigurationError,
    get_configuration,
    load_configuration,
    load_configuration_once,
    reset_configuration,
)

NORMAL = """\
db:
  type: postgresql
  host: localhost
  port: 5432
  user: user1
  password: pswd2
  name: dbname
  schema: "schema."
"""

INVALID = """\
this is not yaml
{{{{
  - [
"""


@pytest.fixture(autouse=True)
def _reset():
    reset_configuration()
    yield
    reset_configuration()


def test_load_normal(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text(NORMAL)
    conf = load_configuration(p)
    assert conf.db.type == "postgresql"
    assert conf.db.host == "localhost"
    assert conf.db.port == 5432
    assert conf.db.user == "user1"
    assert conf.db.password == "pswd2"
    assert conf.db.name == "dbname"
    assert conf.db.schema == "schema."
    assert conf.db.jdbc_url() == "jdbc:postgresql://localhost:5432/dbname"


def test_missing_file(tmp_path):
    with pytest.raises(ConfigurationError):
        load_configuration(tmp_path / "nope.yaml")


def test_invalid_yaml(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(INVALID)
    with pytest.raises(ConfigurationError):
        load_configuration(p)


def test_empty_path():
    with pytest.raises(ConfigurationError):
        load_configuration("")


def test_singleton_get_before_load_is_empty():
    conf = get_configuration()
    assert isinstance(conf, Configuration)
    assert conf.db.type == ""


def test_load_once_memoizes(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text(NORMAL)
    c1 = load_configuration_once(p)
    c2 = load_configuration_once(tmp_path / "other-ignored.yaml")
    assert c1 is c2
    assert get_configuration() is c1


def test_jdbc_urls():
    from dbdiff_spark.config import DbConfig

    assert (
        DbConfig(type="mysql", host="h", port=3306, name="d").jdbc_url()
        == "jdbc:mysql://h:3306/d"
    )
    assert (
        DbConfig(type="sqlserver", host="h", port=1433, name="d").jdbc_url()
        == "jdbc:sqlserver://h:1433;databaseName=d"
    )
    with pytest.raises(ValueError):
        DbConfig(type="oracle").jdbc_url()
