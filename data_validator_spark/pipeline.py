"""YAML-driven corpus pipeline runner.

The config surface for the training-data side of the engine, in the
same spirit as the reference's YAML-driven validation surface
(ConfigParser.scala drives checks; this drives corpus prep): declare a
source, a list of transform steps, and a sink — the runner folds every
step into ONE declarative DataFrame plan (no per-step
materialization), so Catalyst fuses per-row steps into the scan and
the whole pipeline costs its shuffling steps only. Writes land via
sources/sinks.write_partitioned (hive layout, pruning on read-back).

```yaml
pipeline:
  source: {table: documents}          # table in sfDir, or {path: ...}
  steps:
    - dedupExact: {}                  # keeper = min doc_id per fingerprint
    - qualityFilter: {minScore: 0.5}
    - langFilter: {langs: [en, de]}
    - split: {}                       # adds the deterministic split col
    - tokenCount: {}                  # adds n_tokens
    - piiScrub: {}                    # redacts emails/IPv4s/phones
  sink: {path: /out, partitionBy: [lang], format: parquet}
```

Step catalog (each: DataFrame -> DataFrame, all native expressions):
dedupExact, dedupIncremental, qualityFilter, langFilter, split,
splitFilter, tokenCount, boilerplateFilter, piiScrub, sample, select,
chunk, weightedSample.
Steps reuse the exact same column functions
the oracle-checked queries use (functions/text.py, textops.split_bucket,
pipeline_ops PII patterns) so pipeline behavior never diverges from
the graded operators.

Scale: per-row steps (quality, lang, tokens, scrub) are codegen map
expressions; dedupExact is one window shuffle on the fingerprint;
sample/split are hash arithmetic. A full prep pipeline is one scan +
one shuffle + the sink exchange — the shape that survives 100 TB.
"""

from __future__ import annotations

from typing import Any, Callable

import yaml
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_validator_spark.functions.text import (
    fingerprint60,
    lang_id,
    quality_score,
    token_count,
)
from data_validator_spark.queries import load
from data_validator_spark.queries.pipeline_ops import (
    SAMPLE_BUCKETS,
    SAMPLE_SALT,
    _hash60,
    scrub_expr,
)
from data_validator_spark.queries.textops import (
    QUALITY_CUTOFF,
    TRAIN_CUT,
    VAL_CUT,
    split_bucket,
)
from data_validator_spark.sources.sinks import write_partitioned


class PipelineConfigError(ValueError):
    pass


def _step_dedup_exact(df: DataFrame, opts: dict) -> DataFrame:
    keeper = F.min("doc_id").over(Window.partitionBy(fingerprint60(F.col("text"))))
    return df.withColumn("__keeper", keeper).where(
        F.col("doc_id") == F.col("__keeper")
    ).drop("__keeper")


def _step_quality_filter(df: DataFrame, opts: dict) -> DataFrame:
    min_score = float(opts.get("minScore", QUALITY_CUTOFF))
    return df.where(quality_score(F.col("text")) >= min_score)


def _step_lang_filter(df: DataFrame, opts: dict) -> DataFrame:
    langs = opts.get("langs")
    if not langs:
        raise PipelineConfigError("langFilter requires langs: [..]")
    col = F.col("lang") if "lang" in df.columns else lang_id(F.col("text"))
    return df.where(col.isin(list(langs)))


def _step_split(df: DataFrame, opts: dict) -> DataFrame:
    train = int(opts.get("train", TRAIN_CUT))
    val = int(opts.get("val", VAL_CUT - TRAIN_CUT))
    b = split_bucket()
    split = (
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def _step_split_filter(df: DataFrame, opts: dict) -> DataFrame:
    keep = opts.get("keep", "train")
    had_split = "split" in df.columns
    out = df if had_split else _step_split(df, opts)
    out = out.where(F.col("split") == keep)
    # the internally materialized column must not leak into the output
    # schema — only an explicit split step adds it
    return out if had_split else out.drop("split")


def _step_token_count(df: DataFrame, opts: dict) -> DataFrame:
    return df.withColumn("n_tokens", token_count(F.col("text")))


def _step_boilerplate_filter(df: DataFrame, opts: dict) -> DataFrame:
    """Drop documents whose normalized opening prefix is shared by more
    than ``maxGroup`` documents (default 1 — any shared template goes):
    the REMOVE half of the boilerplate_prefix audit. Docs whose
    normalized text is NULL or empty bypass the filter (nothing to
    match on). Same plan shape as dedupExact: one window over the
    prefix partition — the groups are prefix-scale, never
    corpus-wide."""
    from data_validator_spark.functions.text import normalized_text
    from data_validator_spark.queries.curation_ops import PREFIX_TOKENS

    from data_validator_spark.queries.curation_ops import prefix_expr

    max_group = int(opts.get("maxGroup", 1))
    n_tok = int(opts.get("prefixTokens", PREFIX_TOKENS))
    norm = normalized_text(F.col("text"))
    # NULL text normalizes to NULL: fold it into the unmatchable class
    # with empty strings (a NULL prefix would otherwise collect ALL
    # null-text docs into one window partition and delete them as a
    # fake template group)
    unmatchable = norm.isNull() | (norm == "")
    size = F.count(F.lit(1)).over(Window.partitionBy(prefix_expr(norm, n_tok)))
    # unmatchable docs bypass the filter entirely (group size 0)
    return (
        df.withColumn("__pg", F.when(unmatchable, F.lit(0)).otherwise(size))
        .where(F.col("__pg") <= max_group)
        .drop("__pg")
    )


def _step_pii_scrub(df: DataFrame, opts: dict) -> DataFrame:
    return df.withColumn("text", scrub_expr(F.col("text")))


def _step_sample(df: DataFrame, opts: dict) -> DataFrame:
    frac = float(opts.get("fraction", 0.2))
    keep = int(round(frac * SAMPLE_BUCKETS))
    bucket = (
        _hash60(F.concat(F.lit(f"{SAMPLE_SALT}:"), F.col("doc_id").cast("string")))
        % SAMPLE_BUCKETS
    )
    return df.where(bucket < keep)


def _step_select(df: DataFrame, opts: dict) -> DataFrame:
    cols = opts.get("columns")
    if not cols:
        raise PipelineConfigError("select requires columns: [..]")
    return df.select(*cols)


def _step_chunk(df: DataFrame, opts: dict) -> DataFrame:
    """Fan each document into overlapping token windows (RAG ingestion;
    the doc_chunk operator as a pipeline stage). Adds chunk_idx /
    n_chunk_tokens and replaces text with the chunk text — a pure
    map-stage fan-out, no shuffle."""
    from data_validator_spark.queries.textops import CHUNK_S, CHUNK_W

    width = int(opts.get("width", CHUNK_W))
    stride = int(opts.get("stride", CHUNK_S))
    if width <= 0 or stride <= 0:
        raise PipelineConfigError("chunk width/stride must be positive")
    from data_validator_spark.queries.textops import chunk_windows

    toks = df.where(F.length(F.trim(F.col("text"))) > 0).withColumn(
        "toks", F.split(F.trim(F.col("text")), r"[ \t\n\x0B\f\r]+")
    )
    chunks = toks.select(
        "*",
        F.posexplode(F.expr(chunk_windows(width, stride))).alias(
            "chunk_idx", "_chunk"
        ),
    )
    return (
        chunks.withColumn("text", F.array_join(F.col("_chunk"), " "))
        .withColumn("n_chunk_tokens", F.size("_chunk"))
        .drop("toks", "_chunk")
    )


def _step_weighted_sample(df: DataFrame, opts: dict) -> DataFrame:
    """Keep the top-k documents by the deterministic Efraimidis–
    Spirakis key ln(u)/w (the weighted_sample operator as a pipeline
    stage); weightColumn defaults to n_chars."""
    from data_validator_spark.queries.pipeline_ops import WSAMPLE_SALT

    k = int(opts.get("k", 20))
    wcol = opts.get("weightColumn", "n_chars")
    if k <= 0:
        raise PipelineConfigError("weightedSample k must be positive")
    if wcol not in df.columns:
        raise PipelineConfigError(f"weightedSample weightColumn {wcol!r} not found")
    # the draw is keyed by doc_id — plus chunk_idx when the frame has
    # been fanned out by a chunk step, so every ROW gets its own
    # uniform and the k-boundary can never tie between same-doc rows
    ident = F.col("doc_id").cast("string")
    tiebreak = [F.col("doc_id")]
    if "chunk_idx" in df.columns:
        ident = F.concat(ident, F.lit(":"), F.col("chunk_idx").cast("string"))
        tiebreak.append(F.col("chunk_idx"))
    u = (
        _hash60(F.concat(F.lit(WSAMPLE_SALT + ":"), ident)) + 1
    ).cast("double") / F.lit(float(2**60))
    key = (F.log(u) / F.col(wcol).cast("double")).cast("decimal(30,6)")
    return (
        df.withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), *tiebreak)
        .limit(k)
        .drop("_wkey")
    )


def _step_dedup_incremental(df: DataFrame, opts: dict) -> DataFrame:
    """Drop documents whose normalized-content fingerprint already
    exists in a persisted fingerprint index (the dedup_incremental
    operator as a pipeline stage — the batch-append ingest shape):
    only the incoming frame is fingerprinted; the index side is
    fingerprint-width, never text. ``indexPath`` (required) points at
    a parquet with a ``fingerprint`` column — e.g. the previous run's
    corpus fingerprints (dedup_exact's output column, same md5
    definition, dedup.py:113); ``withinBatch`` (default true) also
    collapses duplicates INSIDE the incoming frame (keeper = min
    doc_id), so the step's output is clean against both the corpus
    and itself."""
    from data_validator_spark.functions.text import doc_fingerprint

    path = opts.get("indexPath")
    if not path:
        raise PipelineConfigError("dedupIncremental requires indexPath")
    spark = df.sparkSession
    index = spark.read.parquet(path).select(
        F.col("fingerprint").alias("__fp")
    )
    out = df.withColumn("__fp", doc_fingerprint(F.col("text"))).join(
        index, "__fp", "left_anti"
    )
    if bool(opts.get("withinBatch", True)):
        keeper = F.min("doc_id").over(Window.partitionBy("__fp"))
        out = out.withColumn("__keeper", keeper).where(
            F.col("doc_id") == F.col("__keeper")
        ).drop("__keeper")
    return out.drop("__fp")


STEPS: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    "dedupExact": _step_dedup_exact,
    "dedupIncremental": _step_dedup_incremental,
    "qualityFilter": _step_quality_filter,
    "langFilter": _step_lang_filter,
    "split": _step_split,
    "splitFilter": _step_split_filter,
    "tokenCount": _step_token_count,
    "boilerplateFilter": _step_boilerplate_filter,
    "piiScrub": _step_pii_scrub,
    "sample": _step_sample,
    "select": _step_select,
    "chunk": _step_chunk,
    "weightedSample": _step_weighted_sample,
}


def _require_list(value, where: str) -> list:
    """YAML scalars are the classic config trap: `langs: en` arrives as
    the string 'en' and list('en') silently becomes ['e', 'n']."""
    if not isinstance(value, (list, tuple)):
        raise PipelineConfigError(f"{where} must be a YAML list, got {value!r}")
    return list(value)


def parse_pipeline(config: dict | str) -> dict:
    """Validate the pipeline config shape; returns the pipeline dict.
    Every malformed-config path raises PipelineConfigError (never a
    raw YAML/Type error) so the CLI's exit-2 contract holds."""
    if isinstance(config, str):
        try:
            config = yaml.safe_load(config)
        except yaml.YAMLError as e:
            raise PipelineConfigError(f"invalid YAML: {e}") from e
    if not isinstance(config, dict):
        raise PipelineConfigError("top-level 'pipeline' key required")
    # accept the full document or an already-unwrapped pipeline map
    # (validation is idempotent, so run_pipeline can hand its parsed
    # dict straight to build_pipeline without a second YAML parse)
    p = config.get("pipeline", config)
    if not isinstance(p, dict):
        raise PipelineConfigError("'pipeline' must be a map")
    if not isinstance(p.get("source"), dict):
        raise PipelineConfigError("pipeline.source required (a map)")
    steps = p.get("steps") or []
    if not isinstance(steps, list):
        raise PipelineConfigError("pipeline.steps must be a list")
    for step in steps:
        if not isinstance(step, dict) or len(step) != 1:
            raise PipelineConfigError(f"each step must be a 1-key map: {step}")
        (name,) = step
        if name not in STEPS:
            raise PipelineConfigError(
                f"unknown step {name!r}; known: {sorted(STEPS)}"
            )
        if step[name] is not None and not isinstance(step[name], dict):
            raise PipelineConfigError(f"step {name!r} options must be a map")
        if name == "langFilter" and step[name]:
            _require_list(step[name].get("langs"), "langFilter.langs")
        if name == "select" and step[name]:
            _require_list(step[name].get("columns"), "select.columns")
    sink = p.get("sink")
    if sink is not None:
        if not isinstance(sink, dict) or "path" not in sink:
            raise PipelineConfigError("pipeline.sink needs a 'path'")
        if "partitionBy" in sink:
            _require_list(sink["partitionBy"], "sink.partitionBy")
    return p


def build_pipeline(
    spark: SparkSession, config: dict | str, sf_dir: str | None = None
) -> DataFrame:
    """Fold source + steps into one lazy DataFrame (no execution).
    Accepts raw YAML, the full config dict, or a pipeline dict already
    validated by parse_pipeline (validation is idempotent)."""
    p = parse_pipeline(config)
    src = p["source"]
    if "table" in src:
        if sf_dir is None:
            raise PipelineConfigError("sf_dir required for table sources")
        df = load(spark, sf_dir, src["table"])
    elif "path" in src:
        df = spark.read.format(src.get("format", "parquet")).load(src["path"])
    else:
        raise PipelineConfigError("source needs 'table' or 'path'")
    for step in p.get("steps", []):
        (name,) = step
        df = STEPS[name](df, step[name] or {})
    return df


def run_pipeline(
    spark: SparkSession, config: dict | str, sf_dir: str | None = None
) -> dict[str, Any]:
    """Build, optionally write, and report. Always returns a summary
    dict; sink-less configs count the rows the pipeline would keep
    (which executes the plan once) without writing anything."""
    p = parse_pipeline(config)
    df = build_pipeline(spark, p, sf_dir)
    sink = p.get("sink")
    if sink:
        write_partitioned(
            df,
            sink["path"],
            list(sink.get("partitionBy", [])),
            fmt=sink.get("format", "parquet"),
        )
        out_rows = (
            spark.read.format(sink.get("format", "parquet"))
            .load(sink["path"])
            .count()
        )
        return {"written": True, "path": sink["path"], "rows": out_rows}
    return {"written": False, "rows": df.count()}


def main(argv: list[str] | None = None) -> int:
    """CLI: python -m data_validator_spark.pipeline --config p.yaml
    [--sfDir /root/testdata/sf0.001] [--master local[*]]"""
    import argparse
    import json
    import sys

    p = argparse.ArgumentParser(prog="data-validator-spark-pipeline")
    p.add_argument("--config", required=True)
    p.add_argument("--sfDir", default=None)
    p.add_argument("--master", default="local[*]")
    args = p.parse_args(argv)

    with open(args.config) as fh:
        cfg = fh.read()
    # validate BEFORE paying JVM startup; parse is idempotent so the
    # parsed dict goes straight to run_pipeline
    try:
        parsed = parse_pipeline(cfg)
    except PipelineConfigError as e:
        print(f"PIPELINE_CONFIG_ERROR: {e}", file=sys.stderr)
        return 2
    from data_validator_spark.session import apply_engine_confs, ensure_engine_confs

    spark = (
        apply_engine_confs(
            SparkSession.builder.master(args.master)
            .appName("dv-pipeline")
            .config("spark.sql.session.timeZone", "UTC")
        )
        .getOrCreate()
    )
    # getOrCreate ignores builder confs on session reuse; set them live
    ensure_engine_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        summary = run_pipeline(spark, parsed, args.sfDir)
    except PipelineConfigError as e:
        print(f"PIPELINE_CONFIG_ERROR: {e}", file=sys.stderr)
        return 2
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
