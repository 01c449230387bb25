"""End-to-end CLI drive (reference REPL lifecycle, main.go:23-98):
collect before → Enter → collect after → diff → report → swap → quit."""

import io

from dbdiff_spark import cli


def test_cli_fixture_mode_incremental_roundtrip(spark, tmp_path, monkeypatch, capsys):
    # fixture "database" with two tiny tables
    src = tmp_path / "db"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.parquet(
        str(src / "t1.parquet")
    )
    spark.createDataFrame([(7, 1.5)], "k int, v double").write.parquet(
        str(src / "t2.parquet")
    )
    out = str(tmp_path / "diff_out.xlsx")
    monkeypatch.setattr("sys.stdin", io.StringIO("\nq\n"))
    rc = cli.main(
        [
            "--parquet-dir", str(src),
            "--snapshot-dir", str(tmp_path / "snaps"),
            "--mode", "typed",
            "--incremental",
            "-o", out,
        ]
    )
    assert rc == 0
    text = capsys.readouterr().out
    # identical before/after -> diff prints no change rows, xlsx written
    assert "total record count: 3" in text
    assert f"See {out}" in text
    import os

    assert os.path.exists(out)
