"""Minimal pure-stdlib XLSX reader/writer (zipfile + xml.etree).

The reference loads each Excel sheet into its own table
(reference: cli/core/data_validator.py:339-350, 482-551) via pandas +
openpyxl. This environment ships neither openpyxl nor xlrd, but XLSX is
just a zip of XML — so the scan is implemented directly: workbook →
sheet relationships → shared strings → per-sheet cell matrix. Enough of
the spec for data tables (shared/inline/formula-cached strings,
numbers, booleans, blanks); no styles, dates stay raw serial numbers.

Excel files are small by construction (a 100 TB pipeline never feeds
from xlsx), so parsing on the driver and parallelizing the resulting
rows is the right shape.

``write_xlsx`` is the matching minimal writer (inline strings only) so
tests can round-trip without any external library.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any, Optional
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_PKG_REL = ("{http://schemas.openxmlformats.org/package/2006/"
            "relationships}")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'BC7' → 54: column letters to 0-based index."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(el.text or "" for el in
                       is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):  # formula cached string / error literal
        return v.text
    # numeric: int when exact, else float
    f = float(v.text)
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx(path: str,
              sheet_name: Optional[str] = None
              ) -> dict[str, tuple[list[str], list[list[Any]]]]:
    """Parse an xlsx file → {sheet: (header_row, data_rows)}.

    The first row of each sheet is the header (matching the reference's
    pandas ``read_excel`` default); missing cells are None; rows are
    padded to the header width. ``sheet_name`` restricts to one sheet."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        # sheet name → worksheet target via the workbook relationships
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {r.get("Id"): r.get("Target")
                      for r in rels.iter(f"{_PKG_REL}Relationship")}
        out: dict[str, tuple[list[str], list[list[Any]]]] = {}
        for sh in wb.iter(f"{_NS}sheet"):
            name = sh.get("name")
            if sheet_name is not None and name != sheet_name:
                continue
            target = rid_target[sh.get(f"{_NS_REL}id")].lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            matrix: list[list[Any]] = []
            for row in ws.iter(f"{_NS}row"):
                cells: dict[int, Any] = {}
                for c in row.iter(f"{_NS}c"):
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else len(cells)
                    cells[idx] = _cell_value(c, shared)
                width = max(cells) + 1 if cells else 0
                matrix.append([cells.get(i) for i in range(width)])
            if not matrix:
                out[name] = ([], [])
                continue
            header = [str(h) if h is not None else f"col{i}"
                      for i, h in enumerate(matrix[0])]
            width = len(header)
            rows = [r[:width] + [None] * (width - len(r))
                    for r in matrix[1:]]
            out[name] = (header, rows)
        if sheet_name is not None and sheet_name not in out:
            raise KeyError(f"sheet {sheet_name!r} not in workbook")
        return out


_XLSX_STATIC = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "{sheet_overrides}</Types>"),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'),
}


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def write_xlsx(path: str,
               sheets: dict[str, tuple[list[str], list[list[Any]]]]) -> None:
    """Write {sheet: (header, rows)} as a minimal xlsx (inline strings,
    plain numbers/bools). Test/data-gen counterpart of read_xlsx."""
    def cell_xml(ref: str, v: Any) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>'
                f"{_xml_escape(str(v))}</t></is></c>")

    def col_ref(i: int) -> str:
        ref = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            ref = chr(65 + rem) + ref
        return ref

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        names = list(sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>' for i in range(len(names)))
        z.writestr("[Content_Types].xml",
                   _XLSX_STATIC["[Content_Types].xml"].format(
                       sheet_overrides=overrides))
        z.writestr("_rels/.rels", _XLSX_STATIC["_rels/.rels"])
        sheet_tags = "".join(
            f'<sheet name="{_xml_escape(n)}" sheetId="{i+1}" '
            f'r:id="rId{i+1}"/>' for i, n in enumerate(names))
        z.writestr("xl/workbook.xml", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>"))
        rels = "".join(
            f'<Relationship Id="rId{i+1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            f'worksheet" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(names)))
        z.writestr("xl/_rels/workbook.xml.rels", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>'))
        for i, name in enumerate(names):
            header, rows = sheets[name]
            all_rows = [header] + list(rows)
            body = "".join(
                f'<row r="{ri+1}">' + "".join(
                    cell_xml(f"{col_ref(ci)}{ri+1}", v)
                    for ci, v in enumerate(row)) + "</row>"
                for ri, row in enumerate(all_rows))
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main">'
                f"<sheetData>{body}</sheetData></worksheet>"))
