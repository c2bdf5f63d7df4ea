"""YAML config model.

Parity: reference ConfigParser.scala + ValidatorConfig.scala. Global
settings (numKeyCols, numErrorsToReport, detailedErrors, vars, email,
outputs) + `tables:` each with a source, keyColumns, condition and a
`checks:` list.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import yaml

from data_validator_spark.sources import TableSource, source_from_dict
from data_validator_spark.substitution import VarSubstitution, build_dict
from data_validator_spark.validators import CHECK_TYPES, Check, check_from_dict


@dataclass
class OutputSpec:
    """`outputs:` entry — filename (with append) or pipe. Parity:
    ValidatorOutput in IO.scala."""

    filename: Optional[str] = None
    append: bool = False
    pipe: Optional[str] = None
    ignore_error: bool = False


@dataclass
class EmailConfig:
    smtp_host: str = ""
    subject: str = ""
    from_addr: str = ""
    to: list[str] = field(default_factory=list)
    cc: list[str] = field(default_factory=list)
    bcc: list[str] = field(default_factory=list)
    # Rebuild extensions (reference EmailConfig has neither field:
    # javax.mail defaults the port to 25 and the reference always
    # delivers when an email block exists — Emailer.scala:34. Here
    # delivery is opt-in so the render-only default stays safe in
    # environments without an SMTP relay).
    smtp_port: int = 25
    deliver: bool = False


@dataclass
class TableConfig:
    source_dict: dict[str, Any]
    checks_dicts: list[dict[str, Any]]

    def build(self) -> tuple[TableSource, list[Check]]:
        return source_from_dict(self.source_dict), [check_from_dict(c) for c in self.checks_dicts]


@dataclass
class ValidatorConfig:
    num_key_cols: int = 2
    num_errors_to_report: int = 5
    detailed_errors: bool = True
    tables: list[TableConfig] = field(default_factory=list)
    outputs: list[OutputSpec] = field(default_factory=list)
    email: Optional[EmailConfig] = None
    var_specs: list[dict[str, Any]] = field(default_factory=list)
    var_sub_dict: dict[str, Any] = field(default_factory=dict)

    def build_runners(self) -> list["ValidatorTableRunner"]:
        from data_validator_spark.runner import ValidatorTableRunner

        runners = []
        for t in self.tables:
            src, checks = t.build()
            runners.append(
                ValidatorTableRunner(
                    src,
                    checks,
                    num_key_cols=self.num_key_cols,
                    num_errors_to_report=self.num_errors_to_report,
                    detailed_errors=self.detailed_errors,
                )
            )
        return runners


def parse_config(
    text: str,
    spark: Optional[Any] = None,
    cli_vars: Optional[dict[str, str]] = None,
) -> ValidatorConfig:
    """Parse YAML, resolving variables first. CLI --vars override the
    config's own `vars:` by the reference's actual mechanism
    (Main.scala): the dict is SEEDED with the CLI vars, and adding a
    name twice keeps the first value, so the config's re-definition of
    a CLI-supplied name is a logged no-op."""
    raw = yaml.safe_load(text) or {}
    dict_ = build_dict(raw.get("vars"), spark, seed=cli_vars)

    def sub(v: Any) -> Any:
        return dict_.replace(v)

    tables = []
    for t in raw.get("tables", []) or []:
        t = sub(t)
        checks = t.pop("checks", []) or []
        tables.append(TableConfig(source_dict=t, checks_dicts=checks))

    outputs = []
    for o in raw.get("outputs", []) or []:
        o = sub(o)
        outputs.append(
            OutputSpec(
                filename=o.get("filename"),
                append=bool(o.get("append", False)),
                pipe=o.get("pipe"),
                ignore_error=bool(o.get("ignoreError", False)),
            )
        )

    email = None
    if raw.get("email"):
        e = sub(raw["email"])
        email = EmailConfig(
            smtp_host=e.get("smtpHost", ""),
            subject=e.get("subject", ""),
            from_addr=e.get("from", ""),
            to=list(e.get("to", []) or []),
            cc=list(e.get("cc", []) or []),
            bcc=list(e.get("bcc", []) or []),
            smtp_port=int(e.get("smtpPort", 25)),
            deliver=bool(e.get("deliver", False)),
        )

    return ValidatorConfig(
        num_key_cols=int(raw.get("numKeyCols", 2)),
        num_errors_to_report=int(raw.get("numErrorsToReport", 5)),
        detailed_errors=bool(raw.get("detailedErrors", True)),
        tables=tables,
        outputs=outputs,
        email=email,
        var_specs=raw.get("vars") or [],
        var_sub_dict=dict(dict_.vars),
    )


def load_config(path: str, spark: Optional[Any] = None, cli_vars: Optional[dict[str, str]] = None) -> ValidatorConfig:
    with open(path) as f:
        return parse_config(f.read(), spark, cli_vars)


def check_config_text(text: str) -> list[str]:
    """Parse-only configuration check — no SparkSession, no variable
    resolution, no table reads. Parity: the reference ships a
    config-check entrypoint (ConfigParser.scala:68 main; README
    'Configuration parser check') that verifies the YAML decodes into
    the config model and explicitly does NOT resolve variables
    ('those have runtime implications'). Returns a list of error
    strings (empty = config OK).

    Beyond raw decoding, each table's source and checks are
    trial-constructed to catch type-key typos early — but an entry
    whose fields still contain unresolved ``$var`` / ``${var}``
    placeholders only gets the structural pass (its deep validation
    needs runtime values, same caveat as the reference). Placeholder
    detection matches the actual substitution token syntax
    (VarSubstitution.scala:141 ``\\$\\{?[A-Za-z]\\w*\\}?``) against
    string leaves only, and suppression is scoped to the specific
    entry carrying the placeholder — a literal ``$`` in e.g. a regex
    anchor (``abc$``) does not defer validation, and a placeholder in
    one check does not mask errors in its siblings or the source.
    """
    from data_validator_spark.substitution import _VAR_RE

    def _has_placeholder(value: Any) -> bool:
        if isinstance(value, str):
            return _VAR_RE.search(value) is not None
        if isinstance(value, dict):
            return any(_has_placeholder(v) for v in value.values())
        if isinstance(value, (list, tuple)):
            return any(_has_placeholder(v) for v in value)
        return False

    errors: list[str] = []
    try:
        raw = yaml.safe_load(text) or {}
    except yaml.YAMLError as e:
        return [f"YAML parse error: {e}"]
    if not isinstance(raw, dict):
        return [f"Config root must be a mapping, got {type(raw).__name__}"]

    for spec in raw.get("vars") or []:
        if not isinstance(spec, dict) or "name" not in spec:
            errors.append(f"vars entry missing 'name': {spec!r}")
        elif not any(k in spec for k in ("value", "env", "shell", "sql")):
            errors.append(
                f"Variable '{spec['name']}' has no value/env/shell/sql source"
            )

    for i, t in enumerate(raw.get("tables") or []):
        if not isinstance(t, dict):
            errors.append(f"tables[{i}] must be a mapping, got {type(t).__name__}")
            continue
        label = f"tables[{i}]"
        try:
            t = dict(t)
            checks = t.pop("checks", []) or []
            try:
                source_from_dict(t)
            except Exception as e:
                # deep source validation is deferred only when the
                # source entry itself carries a placeholder
                if not _has_placeholder(t):
                    errors.append(f"{label}: {e}")
            if not isinstance(checks, list):
                errors.append(f"{label}.checks must be a list, got {type(checks).__name__}")
                continue
            for j, c in enumerate(checks):
                if not isinstance(c, dict):
                    errors.append(f"{label}.checks[{j}] must be a mapping")
                    continue
                try:
                    check_from_dict(c)
                except Exception as e:
                    # an unknown `type:` is a hard error even with
                    # placeholders present; parameter errors are
                    # deferred only for the check that needs variable
                    # resolution, never for its siblings
                    if not _has_placeholder(c) or c.get("type") not in CHECK_TYPES:
                        errors.append(f"{label}.checks[{j}]: {e}")
        except Exception as e:  # any unexpected failure = config error, not a crash
            errors.append(f"{label}: unexpected error during config check: {e!r}")
    return errors


def check_config_file(path: str) -> list[str]:
    try:
        with open(path) as f:
            text = f.read()
    except OSError as e:
        return [f"Cannot read config file: {e}"]
    return check_config_text(text)


def main(argv: Optional[list] = None) -> int:
    """``python -m data_validator_spark.config config.yaml`` — the
    standalone config-check entrypoint (reference ConfigParser main:
    print a message and exit non-zero on error)."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 1:
        print("usage: python -m data_validator_spark.config <config.yaml>", file=sys.stderr)
        return 2
    errs = check_config_file(args[0])
    if errs:
        for e in errs:
            print(f"CONFIG ERROR: {e}", file=sys.stderr)
        print("DATA_VALIDATOR_CONFIG=INVALID")
        return 1
    print("DATA_VALIDATOR_CONFIG=OK")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
