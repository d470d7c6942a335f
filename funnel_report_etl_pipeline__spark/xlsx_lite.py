"""Minimal stdlib xlsx writer (zip + XML) — no xlsxwriter required.

An .xlsx file is a zip of XML parts. This module writes the small subset
the funnel report needs — one worksheet, column widths, merged cells,
solid-fill / border / wrap cell formats, shared strings — so the
formatted Excel sink (report.py::write_funnel_excel, mirroring reference
run_reports.py:64-125) executes in containers without xlsxwriter and the
output can be round-tripped against the reference's committed workbook.

Output is deterministic: shared strings are interned in first-use order
and every zip entry gets a fixed timestamp, so identical tables produce
byte-identical files (the CLI's single-day == degenerate-range test
relies on this for the CSV twin; the xlsx twin now holds it too).

Scope intentionally excludes formulas, charts, dates, and rich text —
presentation here is a driver-side sink for one collected metrics row,
never a data path.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

# Format spec keys: bg_color (hex str or None), wrap (bool). All formats
# carry the reference's thin border + left/vcenter alignment.
FormatSpec = dict


def _col_letter(c: int) -> str:
    """0-based column index -> A1-style letters."""
    s = ""
    c += 1
    while c:
        c, rem = divmod(c - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _cell_ref(r: int, c: int) -> str:
    """0-based (row, col) -> e.g. 'B9'."""
    return f"{_col_letter(c)}{r + 1}"


def _styles_xml(formats: dict[str, FormatSpec], order: list[str]) -> str:
    # Excel convention: fill 0 = none, fill 1 = gray125 (both required);
    # custom solid fills start at index 2.
    fills = ['<fill><patternFill patternType="none"/></fill>',
             '<fill><patternFill patternType="gray125"/></fill>']
    fill_idx: dict[str, int] = {}
    for name in order:
        bg = formats[name].get("bg_color")
        if bg and bg not in fill_idx:
            fill_idx[bg] = len(fills)
            rgb = "FF" + bg.lstrip("#").upper()
            fills.append(
                f'<fill><patternFill patternType="solid">'
                f'<fgColor rgb="{rgb}"/><bgColor indexed="64"/></patternFill></fill>'
            )
    borders = [
        "<border><left/><right/><top/><bottom/><diagonal/></border>",
        '<border><left style="thin"/><right style="thin"/>'
        '<top style="thin"/><bottom style="thin"/><diagonal/></border>',
    ]
    # xf 0 is the default style; named formats follow in `order`.
    xfs = ['<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>']
    for name in order:
        f = formats[name]
        fid = fill_idx.get(f.get("bg_color"), 0)
        wrap = ' wrapText="1"' if f.get("wrap") else ""
        xfs.append(
            f'<xf numFmtId="0" fontId="0" fillId="{fid}" borderId="1" xfId="0" '
            f'applyFill="1" applyBorder="1" applyAlignment="1">'
            f'<alignment horizontal="left" vertical="center"{wrap}/></xf>'
        )
    return (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_NS}">'
        f'<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        f'<fills count="{len(fills)}">{"".join(fills)}</fills>'
        f'<borders count="{len(borders)}">{"".join(borders)}</borders>'
        f'<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
        f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
        f"</styleSheet>"
    )


def write_xlsx(
    path: str,
    cells: dict[tuple[int, int], tuple[object, str | None]],
    merges: list[tuple[int, int, int, int]],
    widths: list[float],
    formats: dict[str, FormatSpec],
    sheet_name: str = "Sheet1",
) -> None:
    """Write ``cells`` ({(row, col) 0-based: (value, format_name)}) as a
    valid single-sheet xlsx. ``merges`` are (r1, c1, r2, c2) inclusive
    ranges; the top-left cell carries the value. Strings go through
    sharedStrings (first-use interning); ints/floats are numeric cells;
    ``""``/None values produce styled blanks.
    """
    fmt_order = sorted(formats)
    style_of = {name: i + 1 for i, name in enumerate(fmt_order)}

    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sstr(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    rows: dict[int, list[str]] = {}
    for (r, c) in sorted(cells):
        val, fmt = cells[(r, c)]
        s_attr = f' s="{style_of[fmt]}"' if fmt else ""
        if val is None or val == "":
            xml = f'<c r="{_cell_ref(r, c)}"{s_attr}/>'
        elif isinstance(val, bool) or not isinstance(val, (int, float)):
            xml = (
                f'<c r="{_cell_ref(r, c)}"{s_attr} t="s">'
                f"<v>{sstr(str(val))}</v></c>"
            )
        else:
            xml = f'<c r="{_cell_ref(r, c)}"{s_attr}><v>{val!r}</v></c>'
        rows.setdefault(r, []).append(xml)

    col_xml = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
        for i, w in enumerate(widths)
    )
    row_xml = "".join(
        f'<row r="{r + 1}">{"".join(cs)}</row>' for r, cs in sorted(rows.items())
    )
    merge_xml = ""
    if merges:
        refs = "".join(
            f'<mergeCell ref="{_cell_ref(r1, c1)}:{_cell_ref(r2, c2)}"/>'
            for r1, c1, r2, c2 in merges
        )
        merge_xml = f'<mergeCells count="{len(merges)}">{refs}</mergeCells>'
    sheet_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}">'
        f"<cols>{col_xml}</cols><sheetData>{row_xml}</sheetData>{merge_xml}"
        f"</worksheet>"
    )

    sst_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f'<si><t xml:space="preserve">{escape(s)}</t></si>' for s in shared)
        + "</sst>"
    )

    rels_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
            '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{rels_ns}">'
            f'<Relationship Id="rId1" Type="{doc_rel}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS}" '
            f'xmlns:r="{doc_rel}">'
            f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{rels_ns}">'
            f'<Relationship Id="rId1" Type="{doc_rel}/worksheet" Target="worksheets/sheet1.xml"/>'
            f'<Relationship Id="rId2" Type="{doc_rel}/styles" Target="styles.xml"/>'
            f'<Relationship Id="rId3" Type="{doc_rel}/sharedStrings" Target="sharedStrings.xml"/>'
            "</Relationships>"
        ),
        "xl/styles.xml": _styles_xml(formats, fmt_order),
        "xl/sharedStrings.xml": sst_xml,
        "xl/worksheets/sheet1.xml": sheet_xml,
    }

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in parts.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, content)
