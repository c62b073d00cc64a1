"""CLI verb tests (in-process main())."""

import json

import pytest

from syncmaven_spark import cli


def test_streams_verb(capsys):
    assert cli.main(["streams", "hubspot"]) == 0
    out = capsys.readouterr().out
    assert "stream: contacts" in out and "stream: companies" in out
    assert "* email" in out  # required marker


def test_streams_unknown_package():
    with pytest.raises(KeyError):
        cli.main(["streams", "nope"])


def test_ad_hoc_sync_and_preview(tmp_path, capsys, spark):
    out_file = tmp_path / "out.ndjson"
    rc = cli.main(
        [
            "sync",
            "--model-sql",
            "select event_id, event_type from events where event_id < 5 order by event_id",
            "--package",
            "file",
            "--credentials",
            json.dumps({"filename": str(out_file)}),
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    assert len(out_file.read_text().splitlines()) == 5
    assert "received" in capsys.readouterr().out


def test_project_sync_via_cli(tmp_path, capsys, spark):
    (tmp_path / "models").mkdir()
    (tmp_path / "syncs").mkdir()
    out_file = tmp_path / "cli_out.ndjson"
    (tmp_path / "models" / "ev.sql").write_text(
        "select event_id from events where event_id < 3 order by event_id"
    )
    (tmp_path / "syncs" / "s.yaml").write_text(
        f"model: ev\ndestination:\n  package: file\n  credentials:\n"
        f"    filename: {out_file}\n"
    )
    rc = cli.main(
        ["sync", str(tmp_path), "--sf-dir", "/root/testdata/sf0.001",
         "--state", str(tmp_path / ".state")]
    )
    assert rc == 0
    assert len(out_file.read_text().splitlines()) == 3

    rc2 = cli.main(["sync", str(tmp_path), "--select", "nonexistent"])
    assert rc2 == 1


def test_sync_failure_isolated_nonzero_exit(tmp_path, capsys, spark):
    (tmp_path / "models").mkdir()
    (tmp_path / "syncs").mkdir()
    (tmp_path / "models" / "bad.sql").write_text("select * from no_such_table")
    (tmp_path / "syncs" / "s.yaml").write_text(
        "model: bad\ndestination:\n  package: file\n  credentials:\n    filename: /tmp/x.ndjson\n"
    )
    rc = cli.main(["sync", str(tmp_path), "--state", "memory://"])
    assert rc == 1
    assert "FAILED" in capsys.readouterr().out


def test_explain_catalog_query(capsys, spark):
    rc = cli.main(
        ["explain", "q:rel_pricing_summary", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "PushedFilters" in out  # the filter reached the parquet scan

    assert cli.main(["explain", "q:no_such_query"]) == 1


def test_explain_project_model(tmp_path, capsys, spark):
    (tmp_path / "models").mkdir()
    (tmp_path / "syncs").mkdir()
    (tmp_path / "models" / "ev.sql").write_text(
        "select event_id, ts from events where event_id >= 10"
    )
    rc = cli.main(
        ["explain", str(tmp_path), "ev", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out
