"""Structured Streaming validation + windowed aggregation.

Parity intent (SURVEY §2 streaming rows): the reference is batch-only;
this extends the same check semantics to streams the Spark-first way —
``readStream`` → ``foreachBatch`` running the SAME fused single-pass
aggregate per micro-batch (check expressions are reused verbatim from
the batch validators), and an event-time tumbling-window aggregation
with a watermark for late data.

Scale notes: foreachBatch validation inherits the batch design's
one-scan-per-table property per micro-batch; the windowed aggregation
is a standard streaming state-store aggregation whose watermark bounds
state size — both are the shapes that survive a 1000-executor cluster.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.validators.base import CheapCheck, Check


class StreamingValidator:
    """Runs the fused validator scan on every micro-batch.

    ``check_factory`` builds a FRESH list of checks per batch (checks
    accumulate events, so instances must not be shared across batches).
    Per-batch reports accumulate in ``batches`` and are forwarded to
    ``on_batch`` when given.
    """

    def __init__(
        self,
        check_factory: Callable[[], Sequence[Check]],
        on_batch: Optional[Callable[[dict[str, Any]], None]] = None,
    ):
        self.check_factory = check_factory
        self.on_batch = on_batch
        self.batches: list[dict[str, Any]] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict[str, Any]:
        checks = [c for c in self.check_factory() if isinstance(c, CheapCheck)]
        aggs = [F.count(F.lit(1)).alias("dv_count")]
        for i, chk in enumerate(checks):
            aggs.extend(chk.agg_exprs(batch_df, f"qc{i}"))
        row = batch_df.agg(*aggs).collect()[0].asDict()
        count = int(row["dv_count"])

        failed = False
        for chk in checks:
            failed = chk.evaluate(row, count) or failed
        report = {
            "batchId": batch_id,
            "rowCount": count,
            "failed": failed,
            "checks": [c.to_result().to_dict() for c in checks],
        }
        self.batches.append(report)
        if self.on_batch:
            self.on_batch(report)
        return report

    def start(self, stream_df: DataFrame, **options: Any):
        """Attach to a streaming DataFrame and start the query."""
        writer = stream_df.writeStream.foreachBatch(self.process_batch)
        if options:
            writer = writer.options(**options)
        return writer.start()


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Tumbling-window event aggregation with late-data handling.

    Works on both batch and streaming frames; on a stream the watermark
    bounds state (rows later than `watermark` behind the max event time
    are dropped) and lets append-mode sinks finalize windows.
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return src.groupBy(F.window(ts_col, window_duration).alias("win"), *group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
