"""Minimal XLSX codec — pure stdlib (zipfile + xml.etree).

S3 in the reference is ``pd.read_excel`` over job-posting workbooks
(src/data_extract.py:58, :64). Neither openpyxl nor spark-excel ships
in this environment, but XLSX is only a ZIP of SpreadsheetML XML parts
(ECMA-376, publicly specified), so the subset the ingest edge needs —
one rectangular sheet of strings/numbers/booleans, shared or inline
strings — parses fine with the standard library. The distributed read
path lives in ``readers.excel_source`` (binaryFile source →
mapInPandas over these bytes); this module is the per-file codec plus
a writer used by tests and the round-trip query.

Out of scope (documented): formulas (cached values are read), styles,
dates-as-serials (come back as their numeric string), multiple panes.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 bijective column letters)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _local(tag: str) -> str:
    """Strip the XML namespace — parts may use the transitional or
    strict OOXML namespace; tag local-names are identical."""
    return tag.rsplit("}", 1)[-1]


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Workbook sheet order → part paths, via the workbook rels."""
    rels = {}
    try:
        root = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in root:
            target = rel.get("Target", "")
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            rels[rel.get("Id")] = target
    except KeyError:
        pass
    paths = []
    root = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    for el in root.iter():
        if _local(el.tag) == "sheet":
            rid = next(
                (v for k, v in el.attrib.items() if _local(k) == "id"), None
            )
            paths.append(rels.get(rid, "xl/worksheets/sheet1.xml"))
    return paths or ["xl/worksheets/sheet1.xml"]


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ElementTree.fromstring(data):
        # a shared string is one <t> or rich-text runs of <r><t>
        out.append(
            "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
        )
    return out


def _cell_value(cell, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in cell.iter() if _local(el.tag) == "t"
        )
    v = next((el for el in cell if _local(el.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "true" if v.text.strip() == "1" else "false"
    return v.text  # n / str / e — the raw lexical value


def parse_xlsx_bytes(
    content: bytes, sheet: int = 0
) -> tuple[list[list[str | None]], int]:
    """Parse one workbook's bytes → (rows as string cells, max_width).
    Cell refs place values, so sparse rows keep their column gaps."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    shared = _shared_strings(zf)
    path = _sheet_paths(zf)[sheet]
    rows: list[list[str | None]] = []
    width = 0
    for el in ElementTree.fromstring(zf.read(path)).iter():
        if _local(el.tag) != "row":
            continue
        row: list[str | None] = []
        for cell in el:
            if _local(cell.tag) != "c":
                continue
            ref = cell.get("r")
            idx = len(row)
            if ref:
                m = _CELL_REF.match(ref)
                if m:
                    idx = _col_index(m.group(1))
            while len(row) < idx:
                row.append(None)
            row.append(_cell_value(cell, shared))
        rows.append(row)
        width = max(width, len(row))
    return rows, width


def rows_to_table(
    rows: list[list[str | None]], width: int, header: bool = True
) -> tuple[list[str], list[list[str | None]]]:
    """Rectangularize + split the header row (reference workbooks carry
    one). Missing header cells get positional c{i} names."""
    body = [r + [None] * (width - len(r)) for r in rows]
    if header and body:
        head, body = body[0], body[1:]
        cols = [
            h if h not in (None, "") else f"c{i}"
            for i, h in enumerate(head)
        ]
    else:
        cols = [f"c{i}" for i in range(width)]
    return cols, body


# --------------------------------------------------------------- writer

_XML_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    for k, v in _XML_ESCAPES.items():
        s = s.replace(k, v)
    return s


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def build_xlsx_bytes(
    cols: list[str],
    rows: list[tuple],
    shared_strings: bool = False,
) -> bytes:
    """Assemble a minimal single-sheet workbook. ``shared_strings``
    switches string cells from inline to the sharedStrings table so
    tests cover both encodings real producers emit."""
    strings: dict[str, int] = {}

    def cell_xml(ref: str, value) -> str:
        if value is not None and hasattr(value, "item") and not isinstance(
            value, (bytes, str)
        ):
            value = value.item()  # numpy scalar → builtin (repr-stable)
        if value is None or value != value:  # None / NaN cells are absent
            return ""
        if isinstance(value, bool):
            return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
        if isinstance(value, (int, float)):
            return f'<c r="{ref}"><v>{value!r}</v></c>'
        s = _esc(str(value))
        if shared_strings:
            i = strings.setdefault(s, len(strings))
            return f'<c r="{ref}" t="s"><v>{i}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'

    lines = ["<sheetData>"]
    for rix, row in enumerate([tuple(cols)] + list(rows), start=1):
        cells = "".join(
            cell_xml(f"{_col_letters(cix)}{rix}", v)
            for cix, v in enumerate(row)
        )
        lines.append(f'<row r="{rix}">{cells}</row>')
    lines.append("</sheetData>")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f'<?xml version="1.0"?><worksheet xmlns="{ns}">' + "".join(
        lines
    ) + "</worksheet>"

    sst = ""
    if shared_strings:
        items = "".join(
            f"<si><t>{s}</t></si>"
            for s, _ in sorted(strings.items(), key=lambda kv: kv[1])
        )
        sst = (
            f'<?xml version="1.0"?><sst xmlns="{ns}" '
            f'count="{len(strings)}" uniqueCount="{len(strings)}">'
            f"{items}</sst>"
        )

    ct_ns = "http://schemas.openxmlformats.org/package/2006/content-types"
    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_rel = (
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    )
    content_types = (
        f'<?xml version="1.0"?><Types xmlns="{ct_ns}">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        + (
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sharedStrings+xml"/>'
            if sst
            else ""
        )
        + "</Types>"
    )
    root_rels = (
        f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}" '
        f'xmlns:r="{doc_rel}"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        + (
            f'<Relationship Id="rId2" Type="{doc_rel}/sharedStrings" '
            'Target="sharedStrings.xml"/>'
            if sst
            else ""
        )
        + "</Relationships>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        if sst:
            zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()


def write_xlsx(path: str, cols: list[str], rows: list[tuple],
               shared_strings: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(build_xlsx_bytes(cols, rows, shared_strings))
