"""Partitioned-sink tests: layout shape, file-count bounding, and the
scale property that justifies the layout — static partition pruning
visible in the physical plan (PartitionFilters, not PushedFilters)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_validator_spark.queries import load
from data_validator_spark.sources.sinks import read_partitioned, write_partitioned

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_layout_and_file_bound(spark, tmp_path):
    docs = load(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])
    langs = sorted(
        d.split("=")[1]
        for d in os.listdir(out)
        if d.startswith("lang=")
    )
    assert langs == [r["lang"] for r in docs.select("lang").distinct().orderBy("lang").collect()]
    # repartition-on-key first => one shuffle task feeds each directory:
    # a handful of files per partition, not one per upstream task
    for lang in langs:
        files = glob.glob(f"{out}/lang={lang}/*.parquet")
        assert 1 <= len(files) <= 2, (lang, files)


def test_partition_filter_prunes_directories(spark, tmp_path):
    docs = load(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])
    back = read_partitioned(spark, out).where(F.col("lang") == "en")
    plan = _plan(back)
    # the lang predicate lands in PartitionFilters (directory pruning,
    # before any file opens), not in the data-filter/PushedFilters path
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    en_rows = read_partitioned(spark, out).where(F.col("lang") == "en").count()
    src_rows = load(spark, SF, "documents").where(F.col("lang") == "en").count()
    assert en_rows == src_rows > 0


def test_roundtrip_preserves_rows(spark, tmp_path):
    docs = load(spark, SF, "documents")
    out = str(tmp_path / "docs_by_src")
    write_partitioned(docs, out, ["source"])
    back = read_partitioned(spark, out)
    assert back.count() == docs.count()
    a = {r["doc_id"] for r in back.select("doc_id").collect()}
    b = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert a == b


def test_streaming_partitioned_sink(spark, tmp_path):
    """Streams land in the same hive-partitioned layout batch writes
    use: writeStream.partitionBy + checkpoint, then the batch reader
    gets the same static pruning."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "en", 10.0), (2, "de", 20.0), (3, "en", 30.0)],
        "id long, lang string, value double",
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("id long, lang string, value double").parquet(src)
    q = (
        stream.writeStream.format("parquet")
        .partitionBy("lang")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os

    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == [
        "lang=de",
        "lang=en",
    ]
    back = read_partitioned(spark, out).where(F.col("lang") == "en")
    assert "PartitionFilters" in _plan(back)
    assert back.count() == 2


def test_zorder_write_narrows_per_file_spans_on_both_columns(spark, tmp_path):
    """Z-order vs single-column sort: the sorted layout clusters only
    its sort column — the second column spans ~the whole domain in
    every file — while the z-layout keeps BOTH columns' per-file
    min/max ranges narrow, which is exactly what parquet/Delta file
    stats need to skip on predicates over either column."""
    import glob

    from data_validator_spark.sources.sinks import write_zordered

    n = 4096
    side = 64  # (u, w) sweep a full 64x64 grid — truly independent
    df = spark.range(n).select(
        (F.col("id") % side).alias("u"),
        (F.expr("id div 64") % side).alias("w"),
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zdir, ["u", "w"], bits=6, n_files=16)
    # comparison layout: same file count, sorted by u only
    (
        df.repartitionByRange(16, "u")
        .sortWithinPartitions("u")
        .write.parquet(sdir)
    )

    def avg_span(d, col):
        spans = []
        for f in glob.glob(f"{d}/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                F.min(col).alias("mn"), F.max(col).alias("mx")
            ).first()
            spans.append((r["mx"] - r["mn"]) / (side - 1))
        return sum(spans) / len(spans)

    # sorted layout: u tight, w unclustered (~full range per file)
    assert avg_span(sdir, "u") < 0.3
    assert avg_span(sdir, "w") > 0.8
    # z-layout: BOTH dimensions narrow enough to skip on
    assert avg_span(zdir, "u") < 0.6
    assert avg_span(zdir, "w") < 0.6
    # same rows survive the round-trip
    assert spark.read.parquet(zdir).count() == n
