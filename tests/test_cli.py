"""CLI surface (reference parity: the three typer apps —
crawler/metadata.py:358-431, pre_processing/process_all.py:894-941,
alignment/aeneas_batch_align.py:593-723 — re-expressed as catalog-query
launchers)."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_DIR
from tts_data_pipeline_spark import cli


def test_list_names_every_catalog_query(capsys):
    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    from tts_data_pipeline_spark.plans import catalog

    assert len(out) == len(catalog.queries())
    assert any(line.startswith("q1_pricing_summary\toracle") for line in out)


def test_list_family_filter_and_rows_only(capsys):
    assert cli.main(["list", "--family", "dedup_", "--no-oracle"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "expected at least one rows-only dedup entry"
    assert all(l.startswith("dedup_") and l.endswith("rows-only") for l in out)


def test_oracle_prints_runnable_sql(capsys):
    assert cli.main(["oracle", "q1_pricing_summary"]) == 0
    sql = capsys.readouterr().out
    assert "l_returnflag" in sql and "SELECT" in sql


def test_oracle_rejects_rows_only_entry():
    with pytest.raises(SystemExit):
        cli.main(["oracle", "dedup_minhash_xx64"])


def test_unknown_query_suggests_near_names(capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["run", "q1_pricing_sumary", "--sf-dir", SF_DIR])
    assert "did you mean" in str(e.value)


def test_run_show_and_limit(spark, capsys):
    assert (
        cli.main(
            ["run", "q1_pricing_summary", "--sf-dir", SF_DIR, "--limit", "2"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "l_returnflag" in out


def test_run_explain_prints_physical_plan(spark, capsys):
    assert (
        cli.main(["run", "q6_forecast_revenue", "--sf-dir", SF_DIR, "--explain"])
        == 0
    )
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_run_writes_parquet(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    assert (
        cli.main(
            [
                "run",
                "q1_pricing_summary",
                "--sf-dir",
                SF_DIR,
                "--out",
                out_dir,
                "--format",
                "parquet",
            ]
        )
        == 0
    )
    assert spark.read.parquet(out_dir).count() > 0


def test_pipeline_stage_maps_to_e2e_lineage(spark, capsys):
    assert (
        cli.main(
            ["pipeline", "preprocess", "--sf-dir", SF_DIR, "--limit", "1"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "doc_id" in out


def test_create_config_and_config_precedence(spark, tmp_path, capsys):
    cfg = tmp_path / "cfg.json"
    assert cli.main(["create-config", "--output", str(cfg)]) == 0
    loaded = json.loads(cfg.read_text())
    assert set(loaded) == set(cli._CONFIG_DEFAULTS)
    # config sets sf_dir + limit; CLI flag overrides limit (reference
    # precedence: file first, option wins — process_all.py:917-935)
    loaded["sf_dir"] = SF_DIR
    loaded["limit"] = 1
    cfg.write_text(json.dumps(loaded))
    assert (
        cli.main(["run", "q1_pricing_summary", "--config", str(cfg)]) == 0
    )
    assert "l_returnflag" in capsys.readouterr().out


def test_config_rejects_unknown_keys(tmp_path):
    cfg = tmp_path / "bad.json"
    cfg.write_text('{"sf_di": "/nope"}')
    with pytest.raises(SystemExit) as e:
        cli.main(["run", "q1_pricing_summary", "--config", str(cfg)])
    assert "unknown config keys" in str(e.value)
