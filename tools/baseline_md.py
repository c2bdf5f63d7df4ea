"""Regenerate the measured table inside BASELINE.md from the two
bench artifacts:

    python bench.py                      > bench.json   # run 2+ times
    python tools/baseline_duckdb.py ...  > baseline.json
    python tools/baseline_md.py bench1.json[,bench2.json,...] baseline.json

Multiple comma-separated bench JSONs merge as per-query minimums
(best-of-N — the DuckDB side is already best-of-2 inside
baseline_duckdb.py). Only the block between the `| query | DuckDB |`
header and the first blank line after the totals rows is replaced; the
surrounding prose is kept. Streaming rows are labeled completeness
rows (a full readStream→micro-batch→sink cycle vs a DuckDB batch
query), excluded from the ratio-comparable totals.
"""

from __future__ import annotations

import json
import re
import sys
from datetime import date

STREAMING_PREFIX = "streaming_"


def build_table(bench: dict, base: dict) -> str:
    bq, dq = bench["queries"], base["queries"]
    names = sorted(set(bq) & set(dq))
    missing = sorted(set(bq) ^ set(dq))
    if missing:
        print(f"warning: only in one artifact, skipped: {missing}", file=sys.stderr)
    lines = [
        "| query | DuckDB | Spark (this repo) | ratio |",
        "|---|---|---|---|",
    ]
    tot_d = tot_s = 0.0
    ctot_d = ctot_s = 0.0
    n_stream = 0
    for n in names:
        d, s = dq[n], bq[n]
        if d < 0 or s < 0:
            print(f"warning: errored row skipped: {n}", file=sys.stderr)
            continue
        tot_d += d
        tot_s += s
        if n.startswith(STREAMING_PREFIX):
            n_stream += 1
            ratio = "(full stream cycle vs batch — completeness row)"
        else:
            ctot_d += d
            ctot_s += s
            r = s / d if d > 0 else float("inf")
            ratio = f"**{r:.2f}×**" if r < 1.0 else f"{r:.2f}×"
        lines.append(f"| {n} | {d:.3f} | {s:.2f} | {ratio} |")
    n_all = len([n for n in names if dq[n] >= 0 and bq[n] >= 0])
    n_cmp = n_all - n_stream
    lines.append(
        f"| **total ({n_all} oracle-comparable)** | **{tot_d:.1f}** "
        f"| **{tot_s:.1f}** | **{tot_s / tot_d:.2f}×** |"
    )
    lines.append(
        f"| **total excl. {n_stream} streaming completeness rows "
        f"({n_cmp} queries)** | **{ctot_d:.1f}** | **{ctot_s:.1f}** "
        f"| **{ctot_s / ctot_d:.2f}×** |"
    )
    return "\n".join(lines)


def main() -> int:
    benches = [json.load(open(p)) for p in sys.argv[1].split(",")]
    bench = benches[0]
    for b in benches[1:]:
        for k, v in b["queries"].items():
            prev = bench["queries"].get(k)
            if prev is None or (0 <= v < prev) or prev < 0:
                bench["queries"][k] = v
    base = json.load(open(sys.argv[2]))
    md_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE.md"
    text = open(md_path).read()
    table = build_table(bench, base)
    runs = len(benches)
    stamp = (
        f"Numbers from {date.today().isoformat()} "
        f"(best-of-{runs} per query, seconds, both columns same boot):"
    )
    # the stamp may be a multi-line paragraph (hand-expanded in r8) —
    # match lazily from "Numbers from" through the table to its
    # trailing blank line
    pattern = re.compile(
        r"Numbers from .*?\| query \| DuckDB \|.*?\n\n", re.DOTALL
    )
    if not pattern.search(text):
        print("table block not found in BASELINE.md", file=sys.stderr)
        return 1
    text = pattern.sub(stamp + "\n\n" + table + "\n\n", text, count=1)
    open(md_path, "w").write(text)
    print(f"rewrote table: {md_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
