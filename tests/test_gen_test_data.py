"""Parity: GenTestData.scala — spelled-digit labels, div7 NULL rule,
100 rows, ORC round-trip through the orcFile source."""

from __future__ import annotations

from data_validator_spark.gen_test_data import gen_data


def test_gen_data_matches_reference_semantics(spark):
    rows = {r["id"]: r for r in gen_data(spark).collect()}
    assert len(rows) == 100
    assert rows[0]["label"] == ""
    assert rows[7]["label"] == "seven"
    assert rows[42]["label"] == "four two"
    assert rows[100 - 1]["label"] == "nine nine"
    for i, r in rows.items():
        assert (r["div7"] is None) == (i % 7 == 0)


def test_gen_data_orc_roundtrip_through_source(spark, tmp_path):
    out = str(tmp_path / "testData.orc")
    gen_data(spark).coalesce(1).write.orc(out)
    back = spark.read.orc(out)
    assert back.count() == 100
    assert [f.name for f in back.schema.fields] == ["id", "label", "div7"]
    assert back.where("div7 IS NULL").count() == 15  # 0,7,...,98
