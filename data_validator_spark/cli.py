"""CLI entry point.

Parity: reference CliOptionParser.scala / Main.scala:
  --config (required), --jsonReport, --htmlReport, --vars k1=v1,...,
  --exitErrorOnFail true|false, --emailOnPass true|false, --verbose.
Plus --checkConfig: the parse-only mode of the reference's separate
ConfigParser entrypoint (README 'Configuration parser check').
Run as: python -m data_validator_spark.cli --config config.yaml
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Optional

from pyspark.sql import SparkSession

from data_validator_spark import report as report_mod
from data_validator_spark.config import load_config
from data_validator_spark.runner import run_config


def parse_vars(s: Optional[str]) -> dict[str, str]:
    if not s:
        return {}
    out = {}
    for pair in s.split(","):
        if "=" not in pair:
            raise ValueError(f"Bad --vars entry: {pair!r}")
        k, v = pair.split("=", 1)
        out[k.strip()] = v
    return out


def str2bool(s: str) -> bool:
    return s.strip().lower() in ("true", "1", "yes")


def main(argv: Optional[list[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="data-validator-spark")
    p.add_argument("--config", required=True)
    p.add_argument("--jsonReport")
    p.add_argument("--htmlReport")
    p.add_argument("--vars", help="k1=v1,k2=v2,...")
    p.add_argument("--exitErrorOnFail", type=str2bool, default=True)
    p.add_argument("--emailOnPass", type=str2bool, default=False)
    p.add_argument(
        "--checkConfig",
        action="store_true",
        help="parse-only config check: no Spark session, no variable "
        "resolution, no checks run (reference ConfigParser entrypoint); "
        "exit 0 if the config decodes, 1 otherwise",
    )
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--version", action="version", version="data-validator-spark 0.1.0")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)

    if args.checkConfig:
        from data_validator_spark.config import check_config_file

        errs = check_config_file(args.config)
        for e in errs:
            print(f"CONFIG ERROR: {e}", file=sys.stderr)
        print(f"DATA_VALIDATOR_CONFIG={'INVALID' if errs else 'OK'}")
        return 1 if errs else 0

    from data_validator_spark.session import apply_engine_confs, ensure_engine_confs

    spark = (
        apply_engine_confs(
            SparkSession.builder.appName("data-validator-spark").config(
                "spark.sql.adaptive.enabled", "true"
            )
        )
        .getOrCreate()
    )
    # getOrCreate ignores builder confs on session reuse; set them live
    ensure_engine_confs(spark)
    try:
        config = load_config(args.config, spark, parse_vars(args.vars))
        for out in config.outputs:
            report_mod.check_output_target(out, spark)

        report = run_config(spark, config)
        failed = report["failed"]

        if args.jsonReport:
            with open(args.jsonReport, "w") as f:
                f.write(report_mod.report_json(report))
        if args.htmlReport:
            with open(args.htmlReport, "w") as f:
                f.write(report_mod.report_html(report))
        for out in config.outputs:
            report_mod.write_output(out, report, spark)

        if config.email and (failed or args.emailOnPass):
            msg = report_mod.render_email(config, report)
            if config.email.deliver:
                from data_validator_spark.emailer import send_report_email

                if send_report_email(config, msg):
                    # parity: a send failure is logged, never fatal
                    # (Emailer.sendMessage's boolean flag); the
                    # rendered message stays available via the report
                    logging.error(
                        "email delivery failed; rendered message retained: subject=%s",
                        msg.get("subject"),
                    )
                else:
                    logging.info("email delivered: subject=%s", msg.get("subject"))
            else:
                logging.info(
                    "email rendered (delivery disabled; set email.deliver): subject=%s",
                    msg.get("subject"),
                )

        # Parity: Main.scala exit semantics.
        print(f"DATA_VALIDATOR_STATUS={'FAIL' if failed else 'PASS'}")
        if failed and args.exitErrorOnFail:
            return 1
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
