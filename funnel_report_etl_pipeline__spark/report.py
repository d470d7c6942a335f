"""Presentation sinks (reference K1/K2/K3, U2, T3/T4).

The engine's source of truth is the typed funnel DataFrame
(operators/funnel.py); this module is the driver-side presentation layer:

* ``presentation_table`` — the reference's 24-row mixed-type layout
  (report_engine.py:293-319) built from one collected metrics row.
* ``write_funnel_excel`` — the formatted one-sheet workbook
  (run_reports.py:64-125: column widths, merged stage cells, gray/green/
  brown formats, spacer row). Requires ``xlsxwriter``; when absent (as in
  this container) ``write_funnel_report`` degrades to a deterministic CSV
  with identical cell values so the pipeline remains runnable and testable.
* ``send_report_mail`` — MIME multipart (plain+HTML) + base64 attachments
  over SMTP (run_reports.py:132-165); skips quietly when unconfigured.

Presentation is deliberately NOT distributed work: by the time data reaches
this module it is one metrics row per entity (the 100 TB reduction already
happened executor-side).
"""

from __future__ import annotations

import csv
import logging
import os
import smtplib
from email import encoders
from email.mime.base import MIMEBase
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from funnel_report_etl_pipeline__spark.config import SmtpConfig
from funnel_report_etl_pipeline__spark.functions.core import pct_py

log = logging.getLogger(__name__)

Cell = object  # str | int | float — the reference's mixed-type layout

# xlsxwriter is optional in this environment; the layout code is real and
# runs whenever the library is present.
try:  # pragma: no cover - exercised only where xlsxwriter is installed
    import xlsxwriter  # noqa: F401

    HAS_XLSX = True
except ImportError:
    HAS_XLSX = False


def safe_filename(entity_id: str, date_spec: str) -> str:
    """T3/K3: ``{entity(@→-)}-{date_spec(' -> '→'-')}.xlsx`` naming
    (reference run_reports.py:214-215)."""
    return f"{entity_id.replace('@', '-')}-{date_spec.replace(' -> ', '-')}.xlsx"


def html_to_plain(body_html: str) -> str:
    """T4: the reference's minimal HTML→plain conversion for the MIME
    plain part (run_reports.py:147)."""
    return body_html.replace("<br>", "\n").replace("<b>", "").replace("</b>", "")


def presentation_table(metrics: dict) -> list[list[Cell]]:
    """The reference's positional 24-row layout (report_engine.py:293-319)
    from a collected funnel-metrics row (operators/funnel.py::_metrics_columns
    keys). Cell-for-cell identical, including the blank strings, the literal
    0 dropoff on row 1, and the '' pair on the 'no action' subcause row."""
    m = metrics
    total = m["total_users"]
    pct = lambda v: pct_py(v, total)  # noqa: E731

    return [
        ["Summary", "% of initial users", "", "Note", "", "", ""],
        ["Percentage of initial users who approved the consent", pct(m["appr"]), "",
         "Please note that this funnel describes the journey of a user and not a consent request.",
         "", "", ""],
        ["Percentage of initial users who shared their data", pct(m["fetch_ok"]), "", "", "", "", ""],
        ["", "", "", "", "", "", ""],
        ["", "", "Successful Users", "", "", "Dropped off Users", ""],
        ["Stage", "Positive Action", "Count", "% of initial users", "Dropoff Cause", "Count", "% of initial users"],
        ["Consent Initiated", "AA successfully received a consent handle", m["n_consent"], pct(m["n_consent"]),
         "AA did not receive a consent handle", 0, pct(0)],
        ["FIU initiated AA Client", "AA client was successfully initiated", m["n_after_init"], pct(m["n_after_init"]),
         "AA client was not successfully initiated", m["d1"], pct(m["d1"])],
        ["Registration/Login", "User was authenticated", m["n_after_auth"], pct(m["n_after_auth"]),
         "User was not authenticated", m["auth_drop"], pct(m["auth_drop"])],
        ["", "", "", "", "↳Incorrect OTP entered", m["otp_wrong"], pct(m["otp_wrong"])],
        ["", "", "", "", "↳OTP not received back", m["otp_miss"], pct(m["otp_miss"])],
        ["", "", "", "", "↳Correct OTP entered but user dropped off", m["otp_ok_drop"], pct(m["otp_ok_drop"])],
        ["Account Discovery", "User was able to find accounts", m["n_after_disc"], pct(m["n_after_disc"]),
         "User was not able to find accounts", m["d3"], pct(m["d3"])],
        ["", "", "", "", "↳FIP returned 'No Records Found'", m["no_rec"], pct(m["no_rec"])],
        ["", "", "", "", "↳FIP failed to send records", m["fip_fail"], pct(m["fip_fail"])],
        ["", "", "", "", "↳Some FIP returned 'No Records Found' and some failed to send records",
         m["some_fail"], pct(m["some_fail"])],
        ["", "", "", "", "↳FIP returned accounts, but user did not link any accounts",
         m["found_not_linked"], pct(m["found_not_linked"])],
        ["Account Linking", "User was able to link accounts", m["n_after_link"], pct(m["n_after_link"]),
         "User was not able to link accounts", m["d4"], pct(m["d4"])],
        ["Consent Request Review", "User approved the consent request", m["appr"], pct(m["appr"]),
         "User did not approve the consent request", m["rej"], pct(m["rej"])],
        ["", "", "", "", "↳User rejected the consent", m["rej"], pct(m["rej"])],
        ["", "", "", "", "↳User did not take any action", "", ""],
        ["Consent Artefact Delivery", "FIP accepted the consent artefact", m["fip_ok"], pct(m["fip_ok"]),
         "FIP rejected the consent artefact", m["fip_rej"], pct(m["fip_rej"])],
        ["FI Request", "FIU successfully requested the data", m["fi_req_ok"], pct(m["fi_req_ok"]),
         "FIU did not request the data", m["not_attempted"], pct(m["not_attempted"])],
        ["FI Fetch", "FIU successfully received the data", m["fetch_ok"], pct(m["fetch_ok"]),
         "FIU did not received the data", m["fi_fetch_drop"], pct(m["fi_fetch_drop"])],
    ]


def write_funnel_excel(table: list[list[Cell]], filepath: str) -> None:
    """K1: formatted one-sheet workbook — widths, merged cells, gray/green/
    brown formats, 1 blank spacer row prepended (U2)
    (reference run_reports.py:64-125). Requires xlsxwriter."""
    if not HAS_XLSX:
        raise NotImplementedError(
            "xlsxwriter is not installed in this environment; "
            "use write_funnel_report() for the CSV fallback"
        )
    out = [[""] * 7] + table  # U2: spacer row → reference row indices align

    wb = xlsxwriter.Workbook(filepath)
    sheet = wb.add_worksheet("Funnel Dashboard")
    widths = [45, 45, 14, 15, 55, 14, 16]
    for c, wdt in enumerate(widths):
        sheet.set_column(c, c, wdt)

    base = {"border": 1, "align": "left", "valign": "vcenter"}
    gray = wb.add_format({**base, "bg_color": "#d9d9d9"})
    green = wb.add_format({**base, "bg_color": "#aaecc6"})
    dark = wb.add_format({**base, "bg_color": "#f5c8a7"})
    light = wb.add_format({**base, "bg_color": "#fae4d3"})
    border = wb.add_format(base)
    note_g = wb.add_format({**base, "text_wrap": True, "bg_color": "#d9d9d9"})
    note_w = wb.add_format({**base, "text_wrap": True})
    stage_fmt = wb.add_format({**base, "text_wrap": True, "bg_color": "#d9d9d9"})

    sheet.merge_range(1, 3, 1, 4, out[1][3], note_g)
    sheet.merge_range(2, 3, 2, 4, out[2][3], note_w)
    sheet.merge_range(5, 2, 5, 3, out[5][2], gray)
    sheet.merge_range(5, 5, 5, 6, out[5][5], gray)

    colored_main = {7, 8, 9, 13, 18, 19, 22, 23, 24}
    drop_sub = {10, 11, 12, 14, 15, 16, 17, 20, 21}

    for r in range(6, 25):
        for c in range(7):
            fmt = border
            if r == 6 or c == 0:
                fmt = gray
            if c in (1, 2, 3) and r in colored_main:
                fmt = green
            if c == 4:
                fmt = dark if r in colored_main else (light if r in drop_sub else border)
            if c in (5, 6) and r in colored_main:
                fmt = dark
            val = out[r][c]
            if val is None or val == "":
                sheet.write_blank(r, c, None, fmt)
            else:
                sheet.write(r, c, val, fmt)

    sheet.write(1, 0, out[1][0], gray)
    sheet.write(1, 1, out[1][1], gray)
    for r in range(2, 4):
        for c in range(2):
            val = out[r][c]
            if val is None or val == "":
                sheet.write_blank(r, c, None, border)
            else:
                sheet.write(r, c, val, border)

    sheet.merge_range("A10:A13", out[9][0], stage_fmt)
    sheet.merge_range("A14:A18", out[13][0], stage_fmt)
    sheet.merge_range("A20:A22", out[19][0], stage_fmt)
    wb.close()


def write_funnel_csv(table: list[list[Cell]], filepath: str) -> None:
    """Deterministic unformatted fallback: same cells (incl. the U2 spacer
    row), CSV instead of xlsx. Keeps the pipeline runnable where
    xlsxwriter is absent."""
    with open(filepath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] * 7)
        w.writerows(table)


def write_funnel_report(table: list[list[Cell]], filepath: str) -> str:
    """Write the report at ``filepath`` (xlsx when possible, else the CSV
    twin next to it). Returns the path actually written."""
    if HAS_XLSX:
        write_funnel_excel(table, filepath)
        return filepath
    csv_path = os.path.splitext(filepath)[0] + ".csv"
    write_funnel_csv(table, csv_path)
    return csv_path


def send_report_mail(
    to_addrs: list[str],
    subject: str,
    body_html: str,
    attachments: list[str] | None = None,
    cc_addrs: list[str] | None = None,
    smtp: SmtpConfig | None = None,
) -> bool:
    """K2: multipart (plain+HTML) mail with base64 attachments
    (reference run_reports.py:132-165). Returns False (and logs) instead of
    raising; skips when SMTP is unconfigured."""
    attachments = attachments or []
    cc_addrs = cc_addrs or []
    smtp = smtp or SmtpConfig()
    if not smtp.configured:
        log.warning("SMTP not configured; skipping send.")
        return False
    try:
        msg = MIMEMultipart("alternative")
        msg["From"] = smtp.from_addr or smtp.user
        msg["To"] = ", ".join(to_addrs)
        if cc_addrs:
            msg["Cc"] = ", ".join(cc_addrs)
        msg["Subject"] = subject
        msg.attach(MIMEText(html_to_plain(body_html), "plain"))
        msg.attach(MIMEText(body_html, "html"))
        for path in attachments:
            if os.path.isfile(path):
                with open(path, "rb") as f:
                    part = MIMEBase("application", "octet-stream")
                    part.set_payload(f.read())
                encoders.encode_base64(part)
                part.add_header(
                    "Content-Disposition",
                    f'attachment; filename="{os.path.basename(path)}"',
                )
                msg.attach(part)
        with smtplib.SMTP(smtp.host, smtp.port) as srv:
            srv.starttls()
            srv.login(smtp.user, smtp.password)
            srv.send_message(msg)
        return True
    except Exception as e:  # noqa: BLE001 — sink fault isolation, as reference
        log.error("Mail send failed: %s", e)
        return False
