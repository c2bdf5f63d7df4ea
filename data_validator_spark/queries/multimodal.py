"""Multimodal column plumbing (SURVEY §2: multimodal_meta, rows-only).

Treats media as opaque `binary` payloads with a typed metadata struct,
and runs the decode/feature-extract stage through mapInPandas — the
real 100 TB shape: Arrow-batched Python workers, one pass, no
shuffle. The actual image/audio decode is STUBBED (decode libraries
are not in this container) behind `fake_decode`, which produces a
deterministic fake so the pipeline is testable end-to-end; swap it for
PIL/torchaudio in production. The Spark-side plumbing — schema,
binary column, batch iteration, output contract — is real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from data_validator_spark.queries import load, spread

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, fake_width int, fake_height int"
)


def fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB for a real image decode (PIL.Image.open(...).size).
    Deterministic fake dims derived from the payload length so tests
    and the rows-only correctness check are stable."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        dims = pdf["payload"].map(lambda b: fake_decode(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "fake_width": dims.map(lambda t: t[0]).astype("int32"),
                "fake_height": dims.map(lambda t: t[1]).astype("int32"),
            }
        )


def media_table(spark, sf):
    """documents re-shaped as a multimodal table: (doc_id, media_type,
    payload: binary, meta: struct). Payload is the utf-8 text bytes —
    a stand-in for image/audio bytes with identical plumbing."""
    df = spread(load(spark, sf, "documents"))
    return df.select(
        "doc_id",
        F.lit("text/fake-image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length(F.col("text")).alias("n_chars"),
        ).alias("meta"),
    )


def q_multimodal_meta(spark, sf):
    """Binary payload → mapInPandas decode stub → typed features.
    Rows-only check (mapInPandas is the point; no SQL equivalent)."""
    media = media_table(spark, sf)
    decoded = media.select("doc_id", "media_type", "payload").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )
    return decoded.orderBy("doc_id")


QUERIES = {"multimodal_meta": q_multimodal_meta}
ORACLES: dict[str, str] = {}
