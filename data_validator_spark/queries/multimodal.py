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

from data_validator_spark.queries import _sql_hash60, load_documents_by_id

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
    a stand-in for image/audio bytes with identical plumbing.

    Reads the doc_id-bucketed copy (r18): the Arrow decode kernels
    downstream run on the scan's bucket splits, and the family's
    doc_id groupBys/joins inherit HashPartitioning(doc_id) for free."""
    df = load_documents_by_id(spark, sf)
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

    The decode stub's outputs are deterministic arithmetic over the
    payload length, so despite running through mapInPandas the result
    IS SQL-expressible — the oracle replays the same arithmetic in
    DuckDB, giving this op a full hash check instead of rows-only."""
    media = media_table(spark, sf)
    # No output sort: the driver hash is order-insensitive and a global
    # orderBy is a full range-partition exchange on a corpus-sized
    # relation (r10 verdict item 3).
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )


SQL_MULTIMODAL_META = """
SELECT doc_id,
       'text/fake-image' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) % 640) + 1 AS fake_width,
       (octet_length(encode(text)) % 480) + 1 AS fake_height
FROM documents
ORDER BY doc_id
"""


# -- resize: aspect-fit dims computed in the Python worker ------------------
RESIZED_SCHEMA = (
    "doc_id bigint, src_width int, src_height int, dst_width int, dst_height int, "
    "scale double"
)

FIT = 256  # resize target box (FIT×FIT, aspect preserved, never upscale)


def fake_resize(w: int, h: int) -> tuple[int, int, float]:
    """STUB for a real resample (PIL Image.resize / cv2.resize).
    Pure IEEE-double arithmetic so the DuckDB oracle reproduces it
    bit-for-bit; a real implementation would also re-encode payload."""
    import math

    scale = min(FIT / w, FIT / h, 1.0)
    return max(1, math.floor(w * scale)), max(1, math.floor(h * scale)), scale


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        dims = pdf["payload"].map(lambda b: fake_decode(bytes(b)))
        w = dims.map(lambda t: t[0])
        h = dims.map(lambda t: t[1])
        fit = [fake_resize(a, b) for a, b in zip(w, h)]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_width": w.astype("int32"),
                "src_height": h.astype("int32"),
                "dst_width": pd.Series([t[0] for t in fit], index=pdf.index, dtype="int32"),
                "dst_height": pd.Series([t[1] for t in fit], index=pdf.index, dtype="int32"),
                "scale": pd.Series([t[2] for t in fit], index=pdf.index, dtype="float64"),
            }
        )


def q_multimodal_resize(spark, sf):
    """decode → aspect-fit resize inside one mapInPandas pass (one
    Arrow round-trip for the whole decode+transform stage — at 100 TB
    you never materialize the intermediate decoded batch)."""
    media = media_table(spark, sf)
    return media.select("doc_id", "payload").mapInPandas(
        _resize_batches, schema=RESIZED_SCHEMA
    )


SQL_MULTIMODAL_RESIZE = f"""
WITH d AS (
  SELECT doc_id,
         (octet_length(encode(text)) % 640) + 1 AS w,
         (octet_length(encode(text)) % 480) + 1 AS h
  FROM documents
), s AS (
  SELECT doc_id, w, h, LEAST({FIT}.0 / w, {FIT}.0 / h, 1.0) AS scale FROM d
)
SELECT doc_id, w AS src_width, h AS src_height,
       GREATEST(1, CAST(floor(w * scale) AS INT)) AS dst_width,
       GREATEST(1, CAST(floor(h * scale) AS INT)) AS dst_height,
       scale
FROM s
ORDER BY doc_id
"""


# -- frame sampling: 1→N row fan-out through mapInPandas --------------------
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int, frame_len int, frame_hash bigint"

N_FRAMES = 4


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB for video frame sampling (ffmpeg/PyAV keyframe extraction).
    Treats the payload as N_FRAMES evenly-spaced byte slices and emits
    one output row per sampled frame — the 1→N fan-out shape a real
    frame sampler has. frame_hash is the package 60-bit md5 rule over
    the UPPERCASE HEX encoding of the slice: hashing the hex (not the
    raw bytes) is what makes a SQL oracle possible — DuckDB's md5 is
    VARCHAR-only and cannot slice BLOBs, but hex(blob) is byte-aligned
    (byte i ↔ hex chars 2i+1..2i+2), so both engines hash the
    identical string."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_offset", "frame_len", "frame_hash")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n = len(raw)
            step = max(1, n // N_FRAMES)
            for i in range(N_FRAMES):
                off = min(i * step, n)
                chunk = raw[off : off + step]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame_len"].append(len(chunk))
                out["frame_hash"].append(
                    int(hashlib.md5(chunk.hex().upper().encode()).hexdigest()[:15], 16)
                )
        yield pd.DataFrame(out)


SQL_MULTIMODAL_FRAME_SAMPLE = f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents),
f AS (
  SELECT doc_id, hx, n, GREATEST(n // {N_FRAMES}, 1) AS step,
         unnest(range(0, {N_FRAMES})) AS fi
  FROM m),
s AS (
  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         CAST(LEAST(fi * step, n) AS INT) AS frame_offset,
         substr(hx, CAST(LEAST(fi * step, n) AS INT) * 2 + 1,
                CAST(step AS INT) * 2) AS chunk_hex
  FROM f)
SELECT doc_id, frame_idx, frame_offset,
       CAST(length(chunk_hex) // 2 AS INT) AS frame_len,
       {_sql_hash60("chunk_hex")} AS frame_hash
FROM s ORDER BY doc_id, frame_idx
"""


def q_multimodal_frame_sample(spark, sf):
    """Video-shaped fan-out: each payload yields N_FRAMES rows.
    Oracle-checked: offsets/lengths are deterministic arithmetic and
    the per-frame content hash goes through the hex-string equivalence
    (see _frame_sample_batches) so DuckDB reproduces it exactly."""
    media = media_table(spark, sf)
    return media.select("doc_id", "payload").mapInPandas(
        _frame_sample_batches, schema=FRAMES_SCHEMA
    )


# -- feature extraction: array<float> through Arrow -------------------------
FEATURES_SCHEMA = "doc_id bigint, features array<float>"

N_FEATURES = 8


def fake_features(raw: bytes) -> list[float]:
    """STUB for an embedding model / mel-spectrogram featurizer.
    Deterministic byte-bucket histogram (L1-normalized) so downstream
    similarity ops can consume it and tests can pin exact values."""
    counts = [0] * N_FEATURES
    for b in raw:
        counts[b % N_FEATURES] += 1
    total = max(1, len(raw))
    return [c / total for c in counts]


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized twin of fake_features (r10, the r9-verdict perf
    item): one np.bincount over (doc_index * N_FEATURES + byte %
    N_FEATURES) replaces the per-row per-byte Python loop — same
    integer counts, and the same float64 division c / max(1, n)
    (np true-divide ≡ Python '/'), so the Arrow float32 cast sees
    bit-identical doubles. tests pin batch output == fake_features."""
    import numpy as np

    for pdf in batches:
        payloads = [bytes(b) for b in pdf["payload"]]
        n_docs = len(payloads)
        lengths = np.fromiter(
            (len(b) for b in payloads), dtype=np.int64, count=n_docs
        )
        buckets = (
            np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            % N_FEATURES
        )
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        counts = np.bincount(
            doc_idx * N_FEATURES + buckets, minlength=n_docs * N_FEATURES
        ).reshape(n_docs, N_FEATURES)
        feats = counts / np.maximum(lengths, 1)[:, None]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "features": [row.tolist() for row in feats],
            }
        )


def features_table(spark, sf):
    """Binary → fixed-width float vector via mapInPandas; the output
    column is a proper array<float> so it plugs straight into the
    similarity operators (cosine top-k over extracted features)."""
    media = media_table(spark, sf)
    return media.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURES_SCHEMA
    )


# Oracle for the featurizer: the per-byte histogram is re-derived in
# SQL from hex pairs (same equivalence as the frame oracle), and the
# float32 quantization the Arrow array<float> schema imposes is
# reproduced with CAST(.. AS FLOAT). Emission is fixed-point
# floor(x*1e6 + 0.5) micro-units — identical IEEE doubles through an
# identical floor in both engines — because the values are dyadic
# rationals (count/2^k) that CAN sit exactly on a 6-decimal midpoint,
# where decimal-formatting rounding modes disagree (observed:
# 17/128 -> 0.132813 Java HALF_UP vs 0.132812 printf half-even).
SQL_MULTIMODAL_FEATURES = f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents),
by AS (
  SELECT doc_id,
         CAST(('0x' || substr(hx, CAST(i AS INT) * 2 + 1, 2)) AS INT)
           % {N_FEATURES} AS bucket
  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM m WHERE n > 0)),
cnt AS (
  SELECT doc_id, bucket, count(*) AS c FROM by GROUP BY doc_id, bucket),
grid AS (
  SELECT m.doc_id, GREATEST(m.n, 1) AS total, g.bucket
  FROM m CROSS JOIN (SELECT unnest(range(0, {N_FEATURES})) AS bucket) g),
feat AS (
  SELECT grid.doc_id, grid.bucket,
         CAST(CAST(CAST(COALESCE(cnt.c, 0) AS DOUBLE) / grid.total AS FLOAT)
              AS DOUBLE) AS f
  FROM grid LEFT JOIN cnt
    ON cnt.doc_id = grid.doc_id AND cnt.bucket = grid.bucket),
vecs AS (
  SELECT doc_id, list(f ORDER BY bucket) AS v FROM feat GROUP BY doc_id)
SELECT doc_id, CAST({N_FEATURES} AS INT) AS n_features,
       CAST(floor(list_sum(v) * 1000000 + 0.5) AS BIGINT) AS l1_sum_q6,
       array_to_string(
         list_transform(v, x -> CAST(CAST(floor(x * 1000000 + 0.5) AS BIGINT)
                                     AS VARCHAR)), ',')
         AS features_q6_csv
FROM vecs ORDER BY doc_id
"""


def q_multimodal_features(spark, sf):
    """Registered (driver-facing) view of features_table: the vector is
    serialized to a fixed 6-decimal CSV string — list-typed columns
    crash pandas-side canonicalizers, so arrays never cross the
    comparator boundary. Similarity ops consume features_table().
    Oracle-checked via the hex-pair byte histogram + explicit float32
    quantization (SQL_MULTIMODAL_FEATURES above)."""
    ft = features_table(spark, sf)

    def q6(x):
        # fixed-point micro-units: floor(x*1e6 + 0.5) — the package's
        # engine-identical rounding rule (embedding_norm_quant). %.6f
        # strings are NOT safe here: feature values are dyadic
        # (count/2^k) and can sit exactly on the 6-decimal midpoint,
        # where Java's HALF_UP and printf's half-even disagree.
        return F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast("long")

    # no cosmetic orderBy: the output is corpus-sized and the driver
    # hash compare is order-insensitive — a global sort here is a
    # range-partitioning exchange for nothing (the knn r9 rule)
    return ft.select(
        "doc_id",
        F.size("features").alias("n_features"),
        q6(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x.cast("double"))
        ).alias("l1_sum_q6"),
        F.concat_ws(
            ",", F.transform("features", lambda x: q6(x).cast("string"))
        ).alias("features_q6_csv"),
    )


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_features": q_multimodal_features,
}
ORACLES: dict[str, str] = {
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
}
