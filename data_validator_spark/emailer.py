"""Real SMTP delivery of the validator report email.

Parity: reference Emailer.scala:1 —
- createEmptyMessage (Emailer.scala:73) requires at least ONE
  parseable recipient across to/cc/bcc and a parseable `from`;
  otherwise it logs an error and nothing is sent;
- sendHtmlMessage (Emailer.scala:176) delivers the HTML report body
  as text/html;
- every failure (bad addresses, transport errors) is LOGGED and
  reported as a boolean error flag — never raised (Main.scala treats
  a send failure as a run event, not a crash).

Delivery is OPT-IN via ``email.deliver: true`` in the YAML (a rebuild
extension: the reference always sends when an email block exists, but
the safe default here is render-only — the CLI logs the rendered
message and moves on). ``smtpPort`` is likewise an extension
(javax.mail reads mail.smtp.port from session properties; the
reference never sets it, so it defaults to 25 — as does this module).
"""

from __future__ import annotations

import logging
import re
import smtplib
from email.message import EmailMessage
from email.utils import formatdate, parseaddr
from typing import Any

logger = logging.getLogger(__name__)

SMTP_TIMEOUT_S = 30.0

# Strict-ish addr-spec: exactly one '@', non-empty local and domain,
# no whitespace/control/grouping characters anywhere — parseaddr alone
# accepts RFC-violating specs (embedded spaces, bare commas) as long
# as one '@' is present, which let malformed addresses reach the SMTP
# envelope raw instead of being rejected pre-send like the reference's
# strict InternetAddress.parse (ADVICE r9). A dotless domain stays
# valid (user@localhost passes Jakarta Mail's strict checkAddress).
_ADDR_SPEC_RE = re.compile(r"^[^\s@,;<>()\[\]\\\"]+@[^\s@,;<>()\[\]\\\"]+$")


def _valid(addr: str) -> bool:
    """InternetAddress.parse(strict) stand-in. Invalid entries are
    dropped with an error log, like the reference's per-address
    partition (Emailer.scala:42)."""
    raw = (addr or "").strip()
    _, spec = parseaddr(raw)
    if not _ADDR_SPEC_RE.match(spec):
        return False
    # parseaddr REPAIRS some malformed inputs (strips embedded spaces,
    # recovers the addr after a stray '<') — but the raw string is
    # what reaches the SMTP envelope, so strict parse means the raw
    # form must BE the spec or a well-formed name-addr wrapping it.
    if raw != spec and not re.fullmatch(
        rf"[^<>]*<{re.escape(spec)}>", raw
    ):
        return False
    domain = spec.rsplit("@", 1)[1]
    return not (domain.startswith(".") or domain.endswith(".") or ".." in domain)


def _partition(addrs: list[str], kind: str) -> list[str]:
    good = []
    for a in addrs:
        if _valid(a):
            good.append(a)
        else:
            logger.error("EmailAddress from %s failed to parse: %r", kind, a)
    return good


def send_report_email(config: Any, rendered: dict[str, str]) -> bool:
    """Deliver the rendered message (report.render_email output) via
    config.email's SMTP host. Returns True on ERROR (the reference's
    flag convention — sendMessage, Emailer.scala:110), False on
    success. Never raises."""
    e = config.email
    if e is None or not rendered:
        logger.error("send_report_email called without an email config")
        return True
    to = _partition(e.to, "To")
    cc = _partition(e.cc, "Cc")
    bcc = _partition(e.bcc, "Bcc")
    if not (to or cc or bcc):
        logger.error("Must specify at least 1 valid email address in TO, CC, or BCC")
        return True
    if not _valid(e.from_addr):
        logger.error("setFrom(%s) failed!", e.from_addr)
        return True
    msg = EmailMessage()
    msg["From"] = e.from_addr
    if to:
        msg["To"] = ", ".join(to)
    if cc:
        msg["Cc"] = ", ".join(cc)
    msg["Subject"] = e.subject
    msg["Date"] = formatdate()
    msg.set_content(rendered.get("body", ""), subtype="html")
    try:
        logger.info(
            "Sending email [%s] to [%s]", e.subject, ", ".join(to + cc + bcc)
        )
        with smtplib.SMTP(e.smtp_host, e.smtp_port, timeout=SMTP_TIMEOUT_S) as s:
            # bcc recipients go on the envelope only, never in headers
            s.send_message(msg, to_addrs=to + cc + bcc)
        logger.info("Email sent successfully to all recipients.")
        return False
    except (OSError, smtplib.SMTPException) as exc:
        logger.error("Failure to send email: %s", exc)
        return True
