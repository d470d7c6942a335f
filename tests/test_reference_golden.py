"""Cell-for-cell check of the demo report against the REFERENCE's own
committed workbook artifact.

The reference repo ships the workbook its demo run produced
(``output/demo_funnel_report-15_02_2026.xlsx``, written by
run_reports.py:64-125). This test parses that xlsx with the stdlib (an
xlsx is a zip of XML — no openpyxl in this container) and compares every
cell of our demo run's presentation table against the reference's actual
numbers — the parity evidence is the reference ARTIFACT, not our own mock
math.
"""

from __future__ import annotations

import csv
import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET

import pytest

REFERENCE_XLSX = Path(
    "/root/reference/Funnel Report ETL Pipeline /output/demo_funnel_report-15_02_2026.xlsx"
)

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_xlsx_cells(path: Path) -> dict[tuple[int, int], str]:
    """(1-based row, 0-based col) -> cell value, shared strings resolved."""
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    cells: dict[tuple[int, int], str] = {}
    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    for c in sheet.iter(f"{_NS}c"):
        ref = c.get("r")  # e.g. "B9"
        m = re.fullmatch(r"([A-Z]+)(\d+)", ref)
        col = 0
        for ch in m.group(1):
            col = col * 26 + (ord(ch) - ord("A") + 1)
        v = c.find(f"{_NS}v")
        if v is None or v.text is None:
            continue
        val = shared[int(v.text)] if c.get("t") == "s" else v.text
        cells[(int(m.group(2)), col - 1)] = val
    return cells


def _read_xlsx_merges(path: Path) -> set[str]:
    z = zipfile.ZipFile(path)
    sheet = z.read("xl/worksheets/sheet1.xml").decode()
    return set(re.findall(r'<mergeCell ref="([^"]+)"', sheet))


def _cells_equal(ours: str, ref: str | None) -> bool:
    if ref is None:
        return ours == ""
    try:
        return float(ours) == float(ref)
    except ValueError:
        return ours == ref


@pytest.mark.skipif(not REFERENCE_XLSX.exists(), reason="reference artifact absent")
def test_demo_report_matches_reference_workbook(spark, tmp_path):
    from funnel_report_etl_pipeline__spark.cli import run
    from funnel_report_etl_pipeline__spark.config import EngineConfig

    cfg = EngineConfig(output_dir=str(tmp_path))
    written = run(spark, demo=True, date_spec="15_02_2026", cfg=cfg)
    with open(written[0]) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 25  # U2 spacer + 24 layout rows

    ref = _read_xlsx_cells(REFERENCE_XLSX)
    # our CSV row i (i >= 1; row 0 is the spacer) ≙ workbook row i + 1
    mismatches = []
    for i in range(1, 25):
        for col in range(7):
            ours = rows[i][col] if col < len(rows[i]) else ""
            theirs = ref.get((i + 1, col))
            if not _cells_equal(ours, theirs):
                mismatches.append((i + 1, col, ours, theirs))
    assert not mismatches, f"cells differing from the reference workbook: {mismatches}"
    # the workbook must not contain anything we did not reproduce
    data_cells = {k for k in ref if k[0] >= 2}
    covered = {(i + 1, c) for i in range(1, 25) for c in range(7)}
    assert data_cells <= covered


@pytest.mark.skipif(not REFERENCE_XLSX.exists(), reason="reference artifact absent")
def test_stdlib_xlsx_roundtrip_matches_reference_workbook(spark, tmp_path):
    """The formatted Excel WRITER executes in-container (stdlib zip+xml
    backend when xlsxwriter is absent) and its output, re-parsed with the
    same stdlib reader, matches the reference's committed workbook cell
    for cell — plus the exact same merged-cell ranges."""
    from funnel_report_etl_pipeline__spark.cli import run
    from funnel_report_etl_pipeline__spark.config import EngineConfig

    cfg = EngineConfig(output_dir=str(tmp_path))
    written = run(spark, demo=True, date_spec="15_02_2026", cfg=cfg)
    ours_path = Path(written[0]).with_suffix(".xlsx")
    assert ours_path.exists(), "write_funnel_excel did not execute"

    ours = _read_xlsx_cells(ours_path)
    ref = _read_xlsx_cells(REFERENCE_XLSX)
    mismatches = []
    for r in range(2, 26):  # workbook rows 2..25 (row 1 is the U2 spacer)
        for c in range(7):
            a, b = ours.get((r, c)), ref.get((r, c))
            if a == b:
                continue
            if not _cells_equal(a or "", b):
                mismatches.append((r, c, a, b))
    assert not mismatches, f"cells differing from the reference workbook: {mismatches}"
    assert _read_xlsx_merges(ours_path) == _read_xlsx_merges(REFERENCE_XLSX)


def test_stdlib_xlsx_writer_is_deterministic(tmp_path):
    """Byte-identical output for identical tables (fixed zip timestamps,
    first-use shared-string interning) — the single-day == degenerate-range
    guarantee the CSV twin gives must hold for the xlsx twin too."""
    from funnel_report_etl_pipeline__spark.report import HAS_XLSX, write_funnel_excel

    if HAS_XLSX:
        pytest.skip("xlsxwriter present; stdlib backend not in play")
    table = [[f"r{r}c{c}" if c else r * 10 for c in range(7)] for r in range(24)]
    a, b = tmp_path / "a.xlsx", tmp_path / "b.xlsx"
    write_funnel_excel(table, str(a))
    write_funnel_excel(table, str(b))
    assert a.read_bytes() == b.read_bytes()
