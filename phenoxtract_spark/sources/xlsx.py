"""Minimal pure-stdlib .xlsx parser (S2).

No openpyxl in this container, so the reader walks the OOXML zip directly:
``xl/workbook.xml`` (sheet registry) → ``xl/worksheets/sheetN.xml`` (cells)
with ``xl/sharedStrings.xml`` and ``xl/styles.xml`` for string and
date/duration resolution.  Implements the typed-cell decode matrix of the
reference (~ extract/excel_range_reader.rs:68-154):

- Empty / Error cells → null (errors warn)
- Bool → bool
- Numbers → float64 (calamine reads xlsx integers as floats too)
- Date-styled numbers → datetime (epoch 1899-12-30 serial)
- Duration-styled numbers ([h]/[m]/[s] formats) → timedelta
- Strings (shared, inline, formula) → null if empty else str
- A column mixing types is stringified wholesale
  (~ excel_range_reader.rs:144-154)

Driver-side by design: spreadsheets are config-scale inputs; 100 TB data
arrives as CSV/parquet (SURVEY §2.1).
"""

from __future__ import annotations

import datetime as _dt
import re
import warnings
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)

#: built-in numFmtIds that render as dates/datetimes
_BUILTIN_DATE_IDS = set(range(14, 23)) | set(range(27, 37)) | set(range(50, 59))
#: built-in numFmtIds that render as elapsed durations
_BUILTIN_DURATION_IDS = {45, 46, 47}

_EPOCH = _dt.datetime(1899, 12, 30)


def _cell_col(ref: str) -> int:
    """'BC12' → 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _strip_quoted(fmt: str) -> str:
    # drop quoted literals and color/condition brackets before token sniffing
    return re.sub(r'"[^"]*"|\[(?![hms])[^\]]*\]', "", fmt, flags=re.IGNORECASE)


def _fmt_kind(fmt: str) -> str | None:
    """'date', 'duration', or None for a number format code."""
    if re.search(r"\[(h+|m+|s+)\]", fmt, flags=re.IGNORECASE):
        return "duration"
    if re.search(r"[ymdhs]", _strip_quoted(fmt), flags=re.IGNORECASE):
        return "date"
    return None


def _load_styles(zf: zipfile.ZipFile) -> list[str | None]:
    """Per style index (cellXfs order): 'date' | 'duration' | None."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return []
    custom: dict[int, str | None] = {}
    for nf in root.findall(".//m:numFmts/m:numFmt", _NS):
        custom[int(nf.get("numFmtId"))] = _fmt_kind(nf.get("formatCode") or "")
    kinds: list[str | None] = []
    for xf in root.findall(".//m:cellXfs/m:xf", _NS):
        fmt_id = int(xf.get("numFmtId") or 0)
        if fmt_id in custom:
            kinds.append(custom[fmt_id])
        elif fmt_id in _BUILTIN_DURATION_IDS:
            kinds.append("duration")
        elif fmt_id in _BUILTIN_DATE_IDS:
            kinds.append("date")
        else:
            kinds.append(None)
    return kinds


def _load_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    sheets = []
    for sh in wb.findall(".//m:sheets/m:sheet", _NS):
        target = target_by_rid[sh.get(_RID_ATTR)]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")
        sheets.append((sh.get("name"), target))
    return sheets


def _decode_cell(c, shared: list[str], style_kinds: list[str | None],
                 sheet_name: str):
    t = c.get("t", "n")
    v_el = c.find("m:v", _NS)
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        s = "".join(tt.text or "" for tt in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else ""
        return s if s else None
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if t == "s":
        s = shared[int(raw)]
        return s if s else None
    if t == "str":
        return raw if raw else None
    if t == "b":
        return raw not in ("0", "false", "FALSE")
    if t == "e":
        warnings.warn(
            f"Excel error cell {c.get('r')} in worksheet {sheet_name} → null",
            stacklevel=2,
        )
        return None
    # numeric: style decides date/duration/plain
    serial = float(raw)
    style_idx = int(c.get("s") or 0)
    kind = style_kinds[style_idx] if style_idx < len(style_kinds) else None
    if kind == "date":
        try:
            return _EPOCH + _dt.timedelta(days=serial)
        except OverflowError:
            warnings.warn(
                f"uninterpretable Excel date at {c.get('r')} in {sheet_name}; kept as float",
                stacklevel=2,
            )
            return serial
    if kind == "duration":
        return _dt.timedelta(days=serial)
    return serial


def parse_xlsx(path: str, sheet: str | int = 0) -> list[list]:
    """Parse one worksheet into a dense row-major grid of Python values
    (None / float / bool / str / datetime / timedelta).  Sparse cells and
    ragged rows are filled with None."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_paths(zf)
        if isinstance(sheet, int):
            name, target = sheets[sheet]
        else:
            matches = [s for s in sheets if s[0] == sheet]
            if not matches:
                raise KeyError(f"worksheet {sheet!r} not in {[s[0] for s in sheets]}")
            name, target = matches[0]
        shared = _load_shared_strings(zf)
        style_kinds = _load_styles(zf)
        root = ET.fromstring(zf.read(target))
        rows: list[dict[int, object]] = []
        width = 0
        for row_el in root.findall(".//m:sheetData/m:row", _NS):
            cells: dict[int, object] = {}
            next_col = 0
            for c in row_el.findall("m:c", _NS):
                ref = c.get("r")
                col = _cell_col(ref) if ref else next_col
                next_col = col + 1
                cells[col] = _decode_cell(c, shared, style_kinds, name)
            rows.append(cells)
            if cells:
                width = max(width, max(cells) + 1)
        grid = [[row.get(i) for i in range(width)] for row in rows]
        # used-range trim: styled-but-empty trailing rows/columns parse as
        # all-None — calamine's Range excludes them, so do we
        while grid and all(v is None for v in grid[-1]):
            grid.pop()
        while grid and all(row[-1] is None for row in grid):
            grid = [row[:-1] for row in grid]
        return grid
