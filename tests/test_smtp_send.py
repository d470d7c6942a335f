"""Full send-path coverage for the SMTP sink (reference run_reports.py:132-165).

A minimal threaded plaintext SMTP server (stdlib sockets, no aiosmtpd in
this container) accepts one real smtplib session — EHLO, AUTH PLAIN,
MAIL/RCPT/DATA, QUIT — and records the submitted message, so the test
asserts the actual wire artifact: multipart/alternative structure,
plain+HTML bodies, base64 xlsx attachment bytes, and To/CC headers.
"""

from __future__ import annotations

import base64
import socket
import socketserver
import threading
from email import message_from_bytes

from funnel_report_etl_pipeline__spark.config import SmtpConfig
from funnel_report_etl_pipeline__spark.report import send_report_mail


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        srv = self.server

        def send(line: str) -> None:
            self.wfile.write((line + "\r\n").encode())

        send("220 localhost stub SMTP")
        while True:
            raw = self.rfile.readline()
            if not raw:
                return
            line = raw.decode().rstrip("\r\n")
            verb = line.split(" ", 1)[0].upper()
            if verb in ("EHLO", "HELO"):
                send("250-localhost")
                send("250 AUTH PLAIN")
            elif verb == "AUTH":
                srv.auth_line = line
                send("235 2.7.0 Authentication successful")
            elif verb in ("MAIL", "RCPT"):
                srv.envelope.append(line)
                send("250 OK")
            elif verb == "DATA":
                send("354 End data with <CR><LF>.<CR><LF>")
                chunks = []
                while True:
                    dl = self.rfile.readline()
                    if dl in (b".\r\n", b".\n", b""):
                        break
                    # SMTP dot-stuffing: leading '..' on the wire is '.'
                    chunks.append(dl[1:] if dl.startswith(b"..") else dl)
                srv.message = b"".join(chunks)
                send("250 OK: queued")
            elif verb == "QUIT":
                send("221 Bye")
                return
            else:
                send("250 OK")


class _StubServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.auth_line: str | None = None
        self.envelope: list[str] = []
        self.message: bytes | None = None


def test_send_report_mail_over_socket_stub(tmp_path):
    fake_xlsx = b"PK\x03\x04 not a real workbook, but real bytes"
    att = tmp_path / "funnel-report.xlsx"
    att.write_bytes(fake_xlsx)

    server = _StubServer()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address
        ok = send_report_mail(
            ["to1@x.com", "to2@x.com"],
            "Funnel Report 15_02_2026",
            "Hi<br><b>report attached</b>",
            attachments=[str(att), str(tmp_path / "missing.xlsx")],
            cc_addrs=["cc@x.com"],
            smtp=SmtpConfig(
                from_addr="reports@x.com", host=host, port=port,
                user="u", password="p", use_tls=False,
            ),
        )
    finally:
        server.shutdown()
        server.server_close()
    assert ok is True

    # Envelope: every To and Cc became an RCPT (smtplib sends lowercase verbs)
    env = [l.lower() for l in server.envelope]
    assert any(l.startswith("mail") and "from:<reports@x.com>" in l for l in env)
    rcpts = {l.split(":", 1)[1].strip() for l in env if l.startswith("rcpt")}
    assert rcpts == {"<to1@x.com>", "<to2@x.com>", "<cc@x.com>"}
    # AUTH PLAIN carried the configured credentials
    cred = base64.b64decode(server.auth_line.split()[-1])
    assert cred == b"\x00u\x00p"

    msg = message_from_bytes(server.message)
    assert msg["From"] == "reports@x.com"
    assert msg["To"] == "to1@x.com, to2@x.com"
    assert msg["Cc"] == "cc@x.com"
    assert msg["Subject"] == "Funnel Report 15_02_2026"
    assert msg.get_content_type() == "multipart/alternative"

    parts = msg.get_payload()
    assert [p.get_content_type() for p in parts] == [
        "text/plain", "text/html", "application/octet-stream",
    ]
    # T4 plain twin of the HTML body (SMTP DATA normalizes line ends to CRLF)
    def body(p):
        return p.get_payload(decode=True).decode().replace("\r\n", "\n")

    assert body(parts[0]) == "Hi\nreport attached"
    assert body(parts[1]) == "Hi<br><b>report attached</b>"
    # Attachment: base64 on the wire, byte-identical after decode; the
    # missing file was skipped without failing the send
    att_part = parts[2]
    assert att_part["Content-Transfer-Encoding"] == "base64"
    assert 'filename="funnel-report.xlsx"' in att_part["Content-Disposition"]
    assert att_part.get_payload(decode=True) == fake_xlsx


def test_send_failure_returns_false_not_raise():
    """Sink fault isolation: a dead server yields False + log, never an
    exception into the report loop (reference swallows sink errors)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]  # bound but not listening → refused
    ok = send_report_mail(
        ["a@x.com"], "s", "b",
        smtp=SmtpConfig(host="127.0.0.1", port=port, user="u", password="p", use_tls=False),
    )
    assert ok is False
