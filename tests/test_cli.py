"""End-to-end CLI integration: subprocess drive of
python -m data_validator_spark.cli (reference Main.scala surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "data_validator_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


@pytest.fixture(scope="module")
def config_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    p = str(d / "t.parquet")
    spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, None)], "id int, v double, s string"
    ).write.parquet(p)
    cfg = d / "config.yaml"
    cfg.write_text(
        f"""
numErrorsToReport: 3
tables:
  - parquetFile: {p}
    keyColumns: [id]
    checks:
      - type: negativeCheck
        column: v
      - type: nullCheck
        column: s
"""
    )
    return str(cfg), str(d)


def test_cli_fail_exit_code_and_reports(config_path):
    cfg, d = config_path
    jr, hr = f"{d}/report.json", f"{d}/report.html"
    r = run_cli("--config", cfg, "--jsonReport", jr, "--htmlReport", hr, "--exitErrorOnFail", "true")
    assert "DATA_VALIDATOR_STATUS=FAIL" in r.stdout
    assert r.returncode == 1
    rep = json.load(open(jr))
    assert rep["failed"] is True
    types = {c["type"]: c["failed"] for c in rep["tables"][0]["checks"]}
    assert types == {"negativeCheck": True, "nullCheck": True}
    assert "FAIL" in open(hr).read()


def test_cli_no_exit_error_flag(config_path):
    cfg, _ = config_path
    r = run_cli("--config", cfg, "--exitErrorOnFail", "false")
    assert "DATA_VALIDATOR_STATUS=FAIL" in r.stdout
    assert r.returncode == 0


def test_cli_vars_substitution(config_path, tmp_path):
    cfg_text = open(config_path[0]).read().replace("negativeCheck", "negativeCheck")
    # config referencing an undefined var must fail loudly
    p = tmp_path / "bad.yaml"
    p.write_text("tables:\n  - parquetFile: $missing/x.parquet\n    checks: []\n")
    r = run_cli("--config", str(p))
    assert r.returncode != 0
