"""JSON + HTML reports and output sinks.

Parity: reference Reports.scala (JSON envelope), HTMLBits.scala/
ValidatorConfig.generateHTMLReport (HTML), IO.scala (filename with
append / pipe-to-program outputs), Emailer.scala (rendered, not
sent — SMTP is out of scope; the rendered message is returned/saved
so callers can deliver it however they like).
"""

from __future__ import annotations

import html
import json
import os
import subprocess
import time
from typing import Any

from data_validator_spark.config import OutputSpec, ValidatorConfig


def build_report(config: ValidatorConfig, runners: list, failed: bool) -> dict[str, Any]:
    return {
        "name": "data_validator_spark",
        "failed": failed,
        "timestamp": int(time.time() * 1000),
        "numKeyCols": config.num_key_cols,
        "numErrorsToReport": config.num_errors_to_report,
        "detailedErrors": config.detailed_errors,
        "tables": [r.to_dict() for r in runners],
    }


def report_json(report: dict[str, Any]) -> str:
    return json.dumps(report, indent=2, default=str)


def report_html(report: dict[str, Any]) -> str:
    """Minimal HTML render: per-table pass/fail plus failed events."""
    parts = ["<html><head><title>Validator Report</title></head><body>"]
    status = "FAILED" if report["failed"] else "PASSED"
    parts.append(f"<h1>Data Validator: {status}</h1>")
    for t in report["tables"]:
        tstat = "FAIL" if t["failed"] else "PASS"
        parts.append(f"<h2>{html.escape(str(t['table']))} — {tstat}</h2><ul>")
        for c in t["checks"]:
            cls = "fail" if c["failed"] else "pass"
            label = html.escape(json.dumps({k: v for k, v in c.items() if k != "events"}, default=str))
            parts.append(f'<li class="{cls}">{label}')
            if c["failed"]:
                parts.append("<ul>")
                for e in c["events"]:
                    if e.get("failed"):
                        parts.append(f"<li>{html.escape(json.dumps(e, default=str))}</li>")
                parts.append("</ul>")
            parts.append("</li>")
        parts.append("</ul>")
    parts.append("</body></html>")
    return "".join(parts)


def check_output_target(out: OutputSpec) -> None:
    """Pre-flight check before any processing (reference IO.scala:
    verify writability / executability up front)."""
    if out.filename:
        d = os.path.dirname(os.path.abspath(out.filename)) or "."
        if not os.access(d, os.W_OK):
            raise IOError(f"Cannot write to output file: {out.filename}")
    elif out.pipe:
        prog = out.pipe.split()[0]
        if not (os.path.isfile(prog) and os.access(prog, os.X_OK)):
            raise IOError(f"Pipe program not executable: {out.pipe}")


def write_output(out: OutputSpec, report: dict[str, Any]) -> None:
    text = report_json(report)
    if out.filename:
        mode = "a" if out.append else "w"
        with open(out.filename, mode) as f:
            f.write(text)
            f.write("\n")
    elif out.pipe:
        proc = subprocess.run(out.pipe, shell=True, input=text, text=True)
        if proc.returncode != 0 and not out.ignore_error:
            raise IOError(f"Pipe program failed with {proc.returncode}: {out.pipe}")


def render_email(config: ValidatorConfig, report: dict[str, Any]) -> dict[str, str]:
    """Render the message the reference would email (Emailer.scala).
    Returns headers+body; transport is the caller's concern."""
    e = config.email
    if e is None:
        return {}
    return {
        "from": e.from_addr,
        "to": ", ".join(e.to),
        "cc": ", ".join(e.cc),
        "bcc": ", ".join(e.bcc),
        "subject": e.subject,
        "body": report_html(report),
    }
