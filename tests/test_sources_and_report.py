"""Table sources (parquet/orc/hive/format+options, condition
pushdown) and report outputs (JSON/HTML/file/pipe). Mirrors reference
ValidatorTableSpec source cases + IO/Reports specs."""

from __future__ import annotations

import json

import pytest

from data_validator_spark.config import OutputSpec, TableConfig, ValidatorConfig
from data_validator_spark.report import (
    check_output_target,
    render_email,
    report_html,
    report_json,
    write_output,
)
from data_validator_spark.runner import run_config
from data_validator_spark.sources import (
    HiveTable,
    OrcFile,
    ParquetFile,
    SpecifiedFormatLoader,
    source_from_dict,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "id int, s string")


def test_parquet_source(spark, small, tmp_path):
    p = str(tmp_path / "t.parquet")
    small.write.parquet(p)
    src = ParquetFile(p)
    assert src.open(spark).count() == 3


def test_orc_source(spark, small, tmp_path):
    p = str(tmp_path / "t.orc")
    small.write.orc(p)
    assert OrcFile(p).open(spark).count() == 3


def test_hive_table_source(spark, small):
    small.createOrReplaceTempView("dv_test_view")
    assert HiveTable("", "dv_test_view").open(spark).count() == 3


def test_csv_via_format_loader(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("id,s\n1,a\n2,b\n")
    src = SpecifiedFormatLoader("csv", {"header": True}, [p])
    df = src.open(spark)
    assert df.count() == 2 and df.columns == ["id", "s"]


def test_json_via_format_loader(spark, tmp_path):
    """Mirrors the reference's format_test.jsonl fixture (src/test/
    resources): newline-delimited JSON through the generic loader."""
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        f.write('{"name": "Mal", "age": 49}\n{"name": "Zoe", "age": 33}\n')
    src = SpecifiedFormatLoader("json", None, [p])
    df = src.open(spark)
    assert df.count() == 2 and sorted(df.columns) == ["age", "name"]


def test_condition_is_applied_at_load(spark, small, tmp_path):
    p = str(tmp_path / "c.parquet")
    small.write.parquet(p)
    src = ParquetFile(p, condition="id < 3")
    df = src.open(spark)
    assert df.count() == 2
    # predicate must reach the parquet scan (PushedFilters)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]


def test_source_from_dict_dispatch():
    assert isinstance(source_from_dict({"parquetFile": "/x"}), ParquetFile)
    assert isinstance(source_from_dict({"orcFile": "/x"}), OrcFile)
    assert isinstance(source_from_dict({"table": "t", "db": "d"}), HiveTable)
    assert isinstance(source_from_dict({"format": "csv"}), SpecifiedFormatLoader)
    with pytest.raises(ValueError):
        source_from_dict({"bogus": 1})


# -- reports ---------------------------------------------------------------
@pytest.fixture(scope="module")
def report(spark, small, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rep") / "t.parquet")
    small.write.parquet(p)
    cfg = ValidatorConfig(
        tables=[TableConfig({"parquetFile": p}, [{"type": "nullCheck", "column": "s"}])]
    )
    return run_config(spark, cfg)


def test_json_report_roundtrip(report):
    d = json.loads(report_json(report))
    assert d["failed"] is True  # one null in s
    assert d["tables"][0]["checks"][0]["type"] == "nullCheck"
    events = d["tables"][0]["checks"][0]["events"]
    assert any(e["type"] == "checkEvent" for e in events)
    # QuickCheckError serializes raw values, not repr() strings
    qce = [e for e in events if e["type"] == "quickCheckError"]
    assert qce and qce[0]["value"] is None


def test_html_report_contains_status_and_table(report):
    h = report_html(report)
    assert "<html>" in h and "nullCheck" in h
    # HTMLBits-parity colored status spans + structured check table
    assert 'background-color:tomato">FAIL</span>' in h
    assert "<table>" in h and "<th>check</th>" in h
    assert "Failed events" in h


def test_write_output_file_and_append(report, tmp_path):
    f = str(tmp_path / "out.json")
    write_output(OutputSpec(filename=f), report)
    write_output(OutputSpec(filename=f, append=True), report)
    text = open(f).read()
    assert text.count('"buildInfo"') == 2


def test_write_output_pipe(report, tmp_path):
    # pipe to a program; non-zero exit raises unless ignoreError
    write_output(OutputSpec(pipe="grep -q data_validator_spark"), report)
    with pytest.raises(IOError):
        write_output(OutputSpec(pipe="false"), report)
    write_output(OutputSpec(pipe="false", ignore_error=True), report)


def test_write_output_local_prefix_strips_scheme(report, tmp_path):
    # local:///path forces the local FS (reference IO.scala semantics)
    f = str(tmp_path / "local_out.json")
    write_output(OutputSpec(filename=f"local://{f}"), report)
    assert json.load(open(f))["name"] == "data_validator_spark"


def test_write_output_hadoop_scheme(spark, report, tmp_path):
    # file:// exercises the same Hadoop FileSystem path hdfs:// takes
    f = str(tmp_path / "hdfs_style.json")
    write_output(OutputSpec(filename=f"file://{f}"), report, spark)
    assert json.load(open(f))["name"] == "data_validator_spark"
    # append on a local FS falls back to read+rewrite
    write_output(OutputSpec(filename=f"file://{f}", append=True), report, spark)
    assert open(f).read().count('"buildInfo"') == 2


def test_write_output_hadoop_scheme_requires_spark(report):
    with pytest.raises(IOError):
        write_output(OutputSpec(filename="hdfs://nn/out.json"), report, None)


def test_check_output_target_rejects_unwritable():
    with pytest.raises(IOError):
        check_output_target(OutputSpec(filename="/proc/definitely/not/writable.json"))
    with pytest.raises(IOError):
        check_output_target(OutputSpec(pipe="/no/such/program"))


def test_render_email(report):
    cfg = ValidatorConfig()
    assert render_email(cfg, report) == {}
    from data_validator_spark.config import EmailConfig

    cfg.email = EmailConfig(subject="s", from_addr="f@x", to=["t@x"])
    msg = render_email(cfg, report)
    assert msg["subject"] == "s" and "<html>" in msg["body"]


def test_lakehouse_sources_parse_and_fail_actionably(spark):
    from data_validator_spark.sources import TableFormatSource

    src = source_from_dict({"deltaTable": "/tmp/nope", "condition": "x > 1"})
    assert isinstance(src, TableFormatSource)
    assert src.label == "TableFormatSource:delta:/tmp/nope"
    assert src.condition == "x > 1"
    # connector jars are not bundled: reading degrades to a clear error
    with pytest.raises(IOError, match="delta-spark connector"):
        src.open(spark)
    ice = source_from_dict({"icebergTable": "db.t"})
    with pytest.raises(IOError, match="iceberg-spark-runtime connector"):
        ice.open(spark)


def test_report_envelope_matches_reference_keys(spark, small, tmp_path):
    """Top-level JSON keys parity with the reference's genJsonReport
    (ValidatorConfig.scala:76-89)."""
    p = str(tmp_path / "env.parquet")
    small.write.parquet(p)
    cfg = ValidatorConfig(
        tables=[TableConfig({"parquetFile": p}, [{"type": "nullCheck", "column": "s"}])]
    )
    cfg.var_sub_dict = {"foo": "bar"}
    rep = run_config(spark, cfg)
    for key in (
        "numKeyCols", "numErrorsToReport", "email", "detailedErrors",
        "vars", "varSubDict", "failed", "buildInfo", "runtimeInfo",
        "outputs", "tables", "events",
    ):
        assert key in rep, key
    assert rep["varSubDict"] == {"foo": "bar"}
    assert rep["runtimeInfo"]["sparkVersion"] == spark.version
    assert rep["buildInfo"]["name"] == "data_validator_spark"


def test_table_entries_carry_source_identity_keys(report):
    """Reference tableEncoder parity: a parquet table's report entry
    leads with parquetFile, not just a generic label."""
    t = report["tables"][0]
    assert "parquetFile" in t and t["parquetFile"].endswith("t.parquet")
