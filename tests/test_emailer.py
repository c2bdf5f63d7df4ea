"""SMTP delivery (emailer.py) against a local debug SMTP server:
unit-level reference-parity checks (recipient/from validation, HTML
body, bcc on the envelope only, graceful transport failure) plus the
end-to-end emailOnPass/emailOnFail CLI semantics (Emailer.scala /
Main.scala: send on failure always, on pass only with --emailOnPass;
never send when the email block is absent or delivery is off)."""

from __future__ import annotations

import os
import socketserver
import subprocess
import sys
import threading

import pytest

from data_validator_spark.config import EmailConfig, ValidatorConfig
from data_validator_spark.emailer import send_report_email

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _SmtpHandler(socketserver.StreamRequestHandler):
    """Just enough RFC 5321 to satisfy smtplib: EHLO/MAIL/RCPT/DATA/
    QUIT, recording (mail_from, rcpt_tos, data) per message."""

    def handle(self):
        self.wfile.write(b"220 test-smtp ready\r\n")
        mail_from, rcpts = None, []
        while True:
            line = self.rfile.readline()
            if not line:
                break
            cmd = line.decode("latin-1").strip()
            u = cmd.upper()
            if u.startswith(("EHLO", "HELO")):
                self.wfile.write(b"250 test-smtp\r\n")
            elif u.startswith("MAIL FROM"):
                mail_from = cmd.split(":", 1)[1].strip().strip("<>")
                self.wfile.write(b"250 ok\r\n")
            elif u.startswith("RCPT TO"):
                rcpts.append(cmd.split(":", 1)[1].strip().strip("<>"))
                self.wfile.write(b"250 ok\r\n")
            elif u == "DATA":
                self.wfile.write(b"354 end with .\r\n")
                buf = []
                while True:
                    dl = self.rfile.readline()
                    if dl in (b".\r\n", b".\n") or not dl:
                        break
                    buf.append(dl)
                self.server.messages.append(
                    (mail_from, list(rcpts), b"".join(buf).decode("latin-1"))
                )
                mail_from, rcpts = None, []
                self.wfile.write(b"250 accepted\r\n")
            elif u == "QUIT":
                self.wfile.write(b"221 bye\r\n")
                break
            else:  # RSET / NOOP / anything else
                self.wfile.write(b"250 ok\r\n")


@pytest.fixture
def smtp_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _SmtpHandler)
    srv.messages = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


def _cfg(port, **kw) -> ValidatorConfig:
    email = EmailConfig(
        smtp_host="127.0.0.1",
        smtp_port=port,
        subject=kw.get("subject", "validator report"),
        from_addr=kw.get("from_addr", "dv@example.com"),
        to=kw.get("to", ["alice@example.com"]),
        cc=kw.get("cc", []),
        bcc=kw.get("bcc", []),
        deliver=True,
    )
    return ValidatorConfig(
        num_key_cols=2, num_errors_to_report=5, detailed_errors=True,
        tables=[], outputs=[], email=email, var_specs=[], var_sub_dict={},
    )


RENDERED = {"subject": "validator report", "body": "<h1>report</h1>"}


def test_send_html_with_bcc_on_envelope_only(smtp_server):
    srv, port = smtp_server
    cfg = _cfg(
        port,
        to=["alice@example.com"],
        cc=["bob@example.com"],
        bcc=["carol@example.com"],
    )
    assert send_report_email(cfg, RENDERED) is False
    assert len(srv.messages) == 1
    mail_from, rcpts, data = srv.messages[0]
    assert mail_from == "dv@example.com"
    assert set(rcpts) == {
        "alice@example.com", "bob@example.com", "carol@example.com"
    }
    assert "Subject: validator report" in data
    assert "text/html" in data and "&lt;h1&gt;" not in data
    assert "carol@example.com" not in data  # bcc never in headers


def test_invalid_recipients_dropped_but_send_proceeds(smtp_server):
    srv, port = smtp_server
    cfg = _cfg(port, to=["not-an-address", "alice@example.com"])
    assert send_report_email(cfg, RENDERED) is False
    assert srv.messages[0][1] == ["alice@example.com"]


def test_no_valid_recipient_is_error_without_send(smtp_server):
    srv, port = smtp_server
    cfg = _cfg(port, to=["nope"], cc=[], bcc=[])
    assert send_report_email(cfg, RENDERED) is True
    assert srv.messages == []


def test_invalid_from_is_error_without_send(smtp_server):
    srv, port = smtp_server
    cfg = _cfg(port, from_addr="broken")
    assert send_report_email(cfg, RENDERED) is True
    assert srv.messages == []


def test_transport_failure_is_logged_not_raised():
    # connect to a port nothing listens on -> OSError path -> True
    cfg = _cfg(1)  # port 1: connection refused
    assert send_report_email(cfg, RENDERED) is True


def test_rfc_violating_specs_rejected_pre_send(smtp_server):
    """ADVICE r9: parseaddr alone accepts specs with embedded spaces
    or separators; strict validation must drop them BEFORE the SMTP
    envelope (the reference's per-address InternetAddress.parse
    rejection), not surface them as transport errors."""
    srv, port = smtp_server
    bad = [
        "al ice@example.com",          # embedded space in local part
        "alice@exam ple.com",          # embedded space in domain
        "alice@.example.com",          # leading-dot domain
        "alice@example.com.",          # trailing-dot domain
        "alice@exa..mple.com",         # empty label
        "a,b@example.com",             # bare comma
        "<alice@example.com",          # stray angle bracket in spec
        "@example.com",                # empty local part
        "alice@",                      # empty domain
    ]
    cfg = _cfg(port, to=bad + ["ok@example.com"])
    assert send_report_email(cfg, RENDERED) is False
    assert srv.messages[0][1] == ["ok@example.com"]
    # user@localhost stays valid (Jakarta Mail strict allows dotless)
    cfg2 = _cfg(port, to=["user@localhost"])
    assert send_report_email(cfg2, RENDERED) is False
    assert srv.messages[1][1] == ["user@localhost"]


def test_double_at_from_address_is_error(smtp_server):
    # EmailerSpec:40 'should return true with bad from address'
    # (collin@@bad.com): the addr-spec parses to a @-prefixed remainder
    srv, port = smtp_server
    cfg = _cfg(port, from_addr="collin@@bad.com")
    assert send_report_email(cfg, RENDERED) is True
    assert srv.messages == []


def test_email_config_variable_substitution():
    """EmailerSpec's substituteVariables group: every EmailConfig field
    (smtpHost/subject/from/to/cc/bcc) resolves config vars."""
    from data_validator_spark.config import parse_config

    cfg = parse_config(
        """
vars:
  - name: host
    value: smtp.example.com
  - name: team
    value: ops
tables: []
email:
  smtpHost: $host
  subject: "report for $team"
  from: $team@example.com
  to: ["$team@example.com"]
  cc: ["cc-$team@example.com"]
  bcc: ["bcc-$team@example.com"]
"""
    )
    e = cfg.email
    assert e.smtp_host == "smtp.example.com"
    assert e.subject == "report for ops"
    assert e.from_addr == "ops@example.com"
    assert e.to == ["ops@example.com"]
    assert e.cc == ["cc-ops@example.com"]
    assert e.bcc == ["bcc-ops@example.com"]


# -- end-to-end CLI semantics (subprocess; reference Main.scala) -----------

@pytest.fixture(scope="module")
def e2e_smtp():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _SmtpHandler)
    srv.messages = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture(scope="module")
def e2e_data(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("emailer_cli")
    p = str(d / "t.parquet")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0)], "id int, v double"
    ).write.parquet(p)
    return d, p


def _write_cfg(d, p, port, check):
    cfg = d / f"cfg_{check}.yaml"
    cfg.write_text(
        f"""
tables:
  - parquetFile: {p}
    keyColumns: [id]
    checks:
      - type: {check}
        column: v
email:
  smtpHost: 127.0.0.1
  smtpPort: {port}
  deliver: true
  subject: dv e2e
  from: dv@example.com
  to: [ops@example.com]
"""
    )
    return str(cfg)


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "data_validator_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )


def test_cli_emails_on_fail_and_respects_email_on_pass(e2e_smtp, e2e_data):
    srv, port = e2e_smtp
    d, p = e2e_data
    # 1) failing run (negativeCheck trips on v=-1) -> email sent
    r = _run_cli("--config", _write_cfg(d, p, port, "negativeCheck"))
    assert "DATA_VALIDATOR_STATUS=FAIL" in r.stdout
    assert len(srv.messages) == 1
    mail_from, rcpts, data = srv.messages[0]
    assert rcpts == ["ops@example.com"] and "Subject: dv e2e" in data
    # 2) passing run (nullCheck: no nulls) without --emailOnPass -> none
    r = _run_cli("--config", _write_cfg(d, p, port, "nullCheck"))
    assert "DATA_VALIDATOR_STATUS=PASS" in r.stdout
    assert len(srv.messages) == 1
    # 3) passing run WITH --emailOnPass true -> email sent
    r = _run_cli(
        "--config", _write_cfg(d, p, port, "nullCheck"), "--emailOnPass", "true"
    )
    assert "DATA_VALIDATOR_STATUS=PASS" in r.stdout
    assert len(srv.messages) == 2
