"""Exact distributed quantiles via iterative histogram refinement.

Spark's exact ``percentile`` aggregate (the reference profiling
semantics — quantile_cont's sorted-linear-interpolation definition)
buffers every value of the column into a per-partition hash map and
merges the full multiset in ONE final task: correct, but a
memory/straggler killer on a 10^12-row column, and ~1.5 s per pass
even on a 600 k-row bench column because the per-row map update and
the single-task merge+sort sit outside whole-stage codegen.

This module computes the *same bit-exact order statistics* with only
bounded state anywhere:

1. one fused count/min/max aggregate over all requested columns;
2. a histogram round: each unresolved rank's enclosing value interval
   is split into B in-row buckets and aggregated to
   ``(count, min, max)`` per bucket — a map-side-combined shuffle of
   at most ``targets x B`` rows, never row-scale;
   exact cumulative counts locate each rank's bucket (its per-bucket
   min/max snap the interval to actual values, so a bucket whose
   min == max resolves its ranks immediately);
3. once a rank's interval holds <= ``cap`` values, a single bounded
   window (``row_number`` over that interval only — the same
   bounded-relation window rule as pareto_skyline/drift_ks) selects
   the order statistics, and the driver interpolates neighbouring
   statistics with the exact formula both Spark's ``percentile`` and
   DuckDB's ``quantile_cont`` share (``lo*(1-f) + hi*f``, verified
   bit-for-bit in tests/test_exact_quantile.py).

Scale shape: rounds grow as log_B(n / cap) — two histogram rounds
cover 10^13 rows at the defaults — and the driver only ever sees the
bounded histogram (<= targets x B rows) plus the <= 2-per-quantile
selected statistics; executors never hold more than ``cap`` values in
any single task. Every scan is a plain columnar pass with the range
predicate pushed down, so the whole procedure stays inside
whole-stage codegen.

Quantile definition: Spark's exact ``percentile`` aggregate / DuckDB's
``quantile_cont`` — the sorted-linear-interpolation order statistic
both engines share (the reference's own stats pass,
SecondPassStatsAggregator.scala, computes stddev + a 10-bin histogram
and has no quantile statistic; this operator extends that profiling
surface). This module only changes the physical strategy, not the
statistic.

NaN contract (documented deviation): NaN inputs are scrubbed to NULL
before selection (the count/min/max pass, the histogram and the
selection window all skip them), whereas Spark's ``percentile`` and
DuckDB's ``quantile_cont`` order NaN as greater than every number —
on a NaN-containing column their result can be NaN-interpolated while
this module returns the quantiles of the numeric sub-multiset. The
pipeline's numeric columns are NaN-free (parquet decimals/doubles from
the generator), and the NULL treatment is what every validator check
in the package applies to non-values; test_exact_quantile pins the
scrub (test_nan_scrubbed_like_null).
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class QuantileSpec:
    """One column (or derived numeric expression) and the quantiles
    wanted from it. ``bounds`` optionally supplies already-known
    ``(n_non_null, lower, upper)`` so the count/min/max pass can be
    skipped (the caller may know them from a previous aggregate —
    mad_outliers derives |x - median| bounds from the median pass)."""

    name: str
    expr: Column
    quantiles: Sequence[float]
    bounds: Optional[tuple[int, float, float]] = None


@dataclass
class QuantileResult:
    """Interpolated quantile values plus the stats-pass scalars (handy
    for callers that chain passes — mad_outliers derives the deviation
    column's bounds from the median pass's min/max)."""

    values: list[Optional[float]]
    n: int
    mn: Optional[float]
    mx: Optional[float]


@dataclass
class _Target:
    """One unresolved value-interval holding one or more global ranks
    of one column. ``offset`` = exact number of that column's values
    strictly below the interval; ``count`` = values inside it."""

    col: str
    lo: float
    hi: float
    offset: int
    count: int
    ranks: list[int] = field(default_factory=list)


def _interp(lo: float, hi: float, frac: float) -> float:
    # the shared Spark-percentile / DuckDB-quantile_cont interpolation.
    # Exact ranks short-circuit so an infinite neighbor can't poison
    # the arithmetic (inf * 0.0 is NaN, not 0).
    if frac == 0.0:
        return lo
    if frac == 1.0:
        return hi
    return lo * (1.0 - frac) + hi * frac


def exact_quantiles(
    df: DataFrame,
    specs: Sequence[QuantileSpec],
    *,
    buckets: int = 2048,
    cap: int = 8192,
    max_rounds: int = 8,
) -> dict[str, QuantileResult]:
    """Exact quantile_cont values for every spec, computed with the
    bounded multi-pass strategy documented in the module docstring.

    Returns ``{spec.name: QuantileResult}`` (values are None when the
    column has no non-null values). Runs 2–3 Spark jobs total for
    typical inputs: the fused stats pass (skipped when every spec
    carries ``bounds``), one histogram round, and the bounded
    selection window."""
    base = df.select(
        *[
            F.when(~F.isnan(s.expr.cast("double")), s.expr.cast("double")).alias(
                s.name
            )
            for s in specs
        ]
    )

    # -- pass A: fused count/min/max for specs without known bounds --
    stats: dict[str, tuple[int, float, float]] = {}
    need = [s for s in specs if s.bounds is None]
    if need:
        aggs = []
        for s in need:
            aggs += [
                F.count(s.name).alias(f"{s.name}__n"),
                F.min(s.name).alias(f"{s.name}__mn"),
                F.max(s.name).alias(f"{s.name}__mx"),
            ]
        row = base.agg(*aggs).collect()[0]
        for s in need:
            stats[s.name] = (
                row[f"{s.name}__n"],
                row[f"{s.name}__mn"],
                row[f"{s.name}__mx"],
            )
    for s in specs:
        if s.bounds is not None:
            stats[s.name] = s.bounds

    # -- plan the integer order statistics each quantile needs --
    resolved: dict[str, dict[int, float]] = {s.name: {} for s in specs}
    targets: list[_Target] = []
    for s in specs:
        n, mn, mx = stats[s.name]
        if n == 0:
            continue
        ranks: set[int] = set()
        for q in s.quantiles:
            r = (n - 1) * float(q)
            ranks.add(int(math.floor(r)))
            ranks.add(int(math.ceil(r)))
        if mn == mx:
            for k in ranks:
                resolved[s.name][k] = mn
            continue
        targets.append(
            _Target(col=s.name, lo=mn, hi=mx, offset=0, count=n, ranks=sorted(ranks))
        )

    # -- histogram refinement rounds --
    rounds = 0
    while rounds < max_rounds and any(t.count > cap for t in targets):
        rounds += 1
        active = [t for t in targets if t.count > cap]
        inactive = [t for t in targets if t.count <= cap]
        # in-row fan-out: every active target contributes (tid, bucket, x)
        arms = []
        for tid, t in enumerate(active):
            x = F.col(t.col)
            # ±inf VALUES would poison the bucket arithmetic (inf/2 -
            # inf/2 is NaN; any width involving an infinite endpoint
            # is inf or NaN), degenerating every row into bucket 0 so
            # no round could narrow (ADVICE r9). Bucket on a proxy
            # clamped to ±DBL_MAX instead: clamping is monotone, so
            # -inf rows land in bucket 0 and +inf rows in the top
            # bucket, while range predicates and per-bucket min/max
            # still see the raw value (a span holding only infinities
            # resolves via its exact mn==mx).
            flo = max(t.lo, -sys.float_info.max)
            fhi = min(t.hi, sys.float_info.max)
            xb = F.least(F.lit(fhi), F.greatest(F.lit(flo), x))
            # Halved arithmetic keeps every intermediate finite for
            # ANY representable finite pair: |fhi/2 - flo/2| and
            # |xb/2 - flo/2| are both <= DBL_MAX by construction.
            # Bucket boundaries shift by at most an ulp vs the
            # unhalved formula — irrelevant, since per-bucket
            # counts/min/max come from the actual data.
            half_w = fhi / 2 - flo / 2
            if half_w == 0:
                # the finite part of the range is a single point
                # (possible only with an infinite endpoint, e.g.
                # [DBL_MAX, +inf]): split infinities from the point so
                # the round still narrows.
                b = (
                    F.when(x < F.lit(flo), F.lit(0))
                    .when(x > F.lit(fhi), F.lit(buckets - 1))
                    .otherwise(F.lit(1))
                )
            else:
                b = F.floor(
                    (xb / 2 - F.lit(flo / 2)) / F.lit(half_w) * F.lit(buckets)
                )
            b = F.least(F.lit(buckets - 1), F.greatest(F.lit(0), b)).cast("int")
            arms.append(
                F.when(
                    x.isNotNull() & (x >= F.lit(t.lo)) & (x <= F.lit(t.hi)),
                    F.struct(
                        F.lit(tid).alias("tid"), b.alias("bucket"), x.alias("x")
                    ),
                )
            )
        hist = (
            base.select(F.explode(F.array(*arms)).alias("s"))
            .where(F.col("s").isNotNull())
            .groupBy("s.tid", "s.bucket")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("s.x").alias("mn"),
                F.max("s.x").alias("mx"),
            )
            .collect()
        )
        by_tid: dict[int, list] = {}
        for r in hist:
            by_tid.setdefault(r["tid"], []).append(r)
        new_targets: list[_Target] = list(inactive)
        for tid, t in enumerate(active):
            rows = sorted(by_tid.get(tid, []), key=lambda r: r["bucket"])
            # exact cumulative bucket counts locate each rank
            cum = 0
            spans = []  # (cum_before, count, mn, mx)
            for r in rows:
                spans.append((cum, r["c"], r["mn"], r["mx"]))
                cum += r["c"]
            regroup: dict[tuple[float, float], _Target] = {}
            for k in t.ranks:
                local = k - t.offset
                # binary-search the span holding local rank
                lo_i, hi_i = 0, len(spans) - 1
                while lo_i < hi_i:
                    mid = (lo_i + hi_i) // 2
                    if spans[mid][0] + spans[mid][1] <= local:
                        lo_i = mid + 1
                    else:
                        hi_i = mid
                cb, cc, bmn, bmx = spans[lo_i]
                if bmn == bmx:
                    resolved[t.col][k] = bmn
                    continue
                key = (bmn, bmx)
                nt = regroup.get(key)
                if nt is None:
                    nt = _Target(
                        col=t.col,
                        lo=bmn,
                        hi=bmx,
                        offset=t.offset + cb,
                        count=cc,
                        ranks=[],
                    )
                    regroup[key] = nt
                    new_targets.append(nt)
                nt.ranks.append(k)
        targets = [t for t in new_targets if t.ranks]

    # -- bounded selection window for the remaining targets --
    if targets:
        arms = []
        for tid, t in enumerate(targets):
            x = F.col(t.col)
            arms.append(
                F.when(
                    x.isNotNull() & (x >= F.lit(t.lo)) & (x <= F.lit(t.hi)),
                    F.struct(F.lit(tid).alias("tid"), x.alias("x")),
                )
            )
        w = Window.partitionBy("s.tid").orderBy("s.x")
        wanted = {
            (tid, k - t.offset) for tid, t in enumerate(targets) for k in t.ranks
        }
        locals_by_tid: dict[int, list[int]] = {}
        for tid, lk in wanted:
            locals_by_tid.setdefault(tid, []).append(lk)
        cond = None
        for tid, lks in locals_by_tid.items():
            c = (F.col("s.tid") == tid) & F.col("rk").isin([lk + 1 for lk in lks])
            cond = c if cond is None else (cond | c)
        sel = (
            base.select(F.explode(F.array(*arms)).alias("s"))
            .where(F.col("s").isNotNull())
            .withColumn("rk", F.row_number().over(w))
            .where(cond)
            .select("s.tid", "rk", "s.x")
            .collect()
        )
        for r in sel:
            t = targets[r["tid"]]
            resolved[t.col][t.offset + r["rk"] - 1] = r["x"]

    # -- interpolate --
    out: dict[str, QuantileResult] = {}
    for s in specs:
        n, mn, mx = stats[s.name]
        vals: list[Optional[float]] = []
        for q in s.quantiles:
            if n == 0:
                vals.append(None)
                continue
            r = (n - 1) * float(q)
            k_lo, k_hi = int(math.floor(r)), int(math.ceil(r))
            v_lo = resolved[s.name][k_lo]
            v_hi = resolved[s.name][k_hi]
            vals.append(_interp(v_lo, v_hi, r - k_lo))
        out[s.name] = QuantileResult(values=vals, n=n, mn=mn, mx=mx)
    return out
