"""Multi-format document parsers (S5-S11) — bytes in, text out.

Pure-stdlib Python re-implementations of the reference's per-format
extraction behavior (internal/parser/{pdf,docx,excel,html,email,
text}.go). Each takes raw file bytes (the ``binaryFile`` source's
``content`` column) and returns extracted text, so they run inside
Arrow-batched pandas UDFs without any executor-side file access.

Format notes / conscious deviations:
- XLSX (excel.go:13-85): identical "markdownification" layout —
  per sheet ``Sheet: <name>``, row 1 = headers, then
  ``Row N: Header: value, ...`` lines skipping empty cells with a
  ``Column %d`` fallback header; sheets joined by a blank line.
- EML (email.go:15-74): identical Subject/Sender/Date header block
  (RFC3339 date) + text body, HTML body as fallback.
- HTML (html.go:13-39): script/style/noscript removed, text nodes
  concatenated.
- DOCX (docx.go:14-31): the reference's Go library returns raw
  document XML; we extract actual paragraph text instead (strictly
  more useful; not a byte-parity surface).
- PDF (pdf.go:16-44): pypdf when importable; otherwise a minimal
  extractor that inflates FlateDecode content streams and reads
  Tj/TJ/' text-show operators — enough for simple generated PDFs.
  Real MuPDF-grade extraction is an optional dependency, not a
  hard one.
"""

from __future__ import annotations

import re
import zipfile
import zlib
from email import policy
from email.parser import BytesParser
from html.parser import HTMLParser
from io import BytesIO
from xml.etree import ElementTree

# ---------------------------------------------------------------- text / md


def parse_text(data: bytes) -> str:
    """S11: raw read (parser/text.go:10-24)."""
    return data.decode("utf-8", errors="replace")


# --------------------------------------------------------------------- html


class _TextExtractor(HTMLParser):
    _SKIP = {"script", "style", "noscript"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth_skipped = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._depth_skipped += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._depth_skipped:
            self._depth_skipped -= 1

    def handle_data(self, data):
        if not self._depth_skipped:
            self.parts.append(data)


def parse_html(data: bytes) -> str:
    """S9: drop script/style/noscript, concatenate text (html.go:13-39)."""
    p = _TextExtractor()
    p.feed(data.decode("utf-8", errors="replace"))
    text = "".join(p.parts)
    if not text.strip():
        raise ValueError("no text extracted from HTML")
    return text


# ---------------------------------------------------------------------- eml


def parse_eml(data: bytes) -> str:
    """S10: Subject/Sender/Date header block + text body (email.go:15-74)."""
    msg = BytesParser(policy=policy.default).parsebytes(data)
    lines: list[str] = []
    subject = msg.get("Subject")
    if subject:
        lines.append(f"Subject: {subject}")
    from_addrs = msg.get("From")
    if from_addrs:
        addresses = getattr(msg["from"], "addresses", ())
        if addresses:
            a = addresses[0]
            sender = f"{a.display_name} <{a.addr_spec}>" if a.display_name else a.addr_spec
        else:
            sender = str(from_addrs)
        lines.append(f"Sender: {sender}")
    date = msg["Date"]
    if date is not None and getattr(date, "datetime", None) is not None:
        lines.append(f"Date: {date.datetime.isoformat()}")

    body = ""
    text_part = msg.get_body(preferencelist=("plain",))
    if text_part is not None:
        body = text_part.get_content()
    else:
        html_part = msg.get_body(preferencelist=("html",))
        if html_part is not None:
            # reference passes raw HTML through (email.go:62-66)
            body = html_part.get_content()

    result = ("\n".join(lines) + "\n\n" + body).strip()
    if not result:
        raise ValueError("no content extracted from EML")
    return result


# --------------------------------------------------------------------- docx

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def parse_docx(data: bytes) -> str:
    """S7: paragraph text from word/document.xml (docx.go:14-31)."""
    with zipfile.ZipFile(BytesIO(data)) as zf:
        xml = zf.read("word/document.xml")
    root = ElementTree.fromstring(xml)
    paragraphs: list[str] = []
    for p in root.iter(f"{_W_NS}p"):
        runs: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t" and node.text:
                runs.append(node.text)
            elif node.tag == f"{_W_NS}tab":
                runs.append("\t")
            elif node.tag == f"{_W_NS}br":
                runs.append("\n")
        paragraphs.append("".join(runs))
    text = "\n".join(paragraphs).strip()
    if not text:
        raise ValueError("no content extracted from DOCX")
    return text


# --------------------------------------------------------------------- xlsx

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _fmt_number(raw: str) -> str:
    """General-format rendering: integral floats print without '.0'."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and "e" not in raw.lower():
        return str(int(f))
    return raw


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        xml = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(xml)
    out = []
    for si in root.iter(f"{_MAIN_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t")))
    return out


def _sheet_rows(zf: zipfile.ZipFile, target: str, shared: list[str]) -> list[list[str]]:
    root = ElementTree.fromstring(zf.read(target))
    rows: list[list[str]] = []
    for row in root.iter(f"{_MAIN_NS}row"):
        cells: list[str] = []
        for i, c in enumerate(row.findall(f"{_MAIN_NS}c")):
            ref = c.get("r")
            col = _col_index(ref) if ref else i
            while len(cells) <= col:
                cells.append("")
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(f"{_MAIN_NS}is")
                val = (
                    "".join(t.text or "" for t in is_el.iter(f"{_MAIN_NS}t"))
                    if is_el is not None
                    else ""
                )
            else:
                v = c.find(f"{_MAIN_NS}v")
                raw = v.text if v is not None and v.text else ""
                if ctype == "s" and raw:
                    val = shared[int(raw)]
                elif ctype == "n" and raw:
                    val = _fmt_number(raw)
                elif ctype == "b" and raw:
                    val = "TRUE" if raw == "1" else "FALSE"
                else:
                    val = raw
            cells[col] = val
        rows.append(cells)
    return rows


def _sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(name, zip path) per sheet in workbook order."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels_root = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rels = {
        r.get("Id"): r.get("Target")
        for r in rels_root.iter(f"{_PKG_REL_NS}Relationship")
    }
    out = []
    for sheet in wb.iter(f"{_MAIN_NS}sheet"):
        target = rels.get(sheet.get(f"{_REL_NS}id"), "")
        if target and not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        out.append((sheet.get("name", ""), target))
    return out


def parse_xlsx(data: bytes) -> str:
    """S8 markdownification — exact layout of excel.go:13-85."""
    with zipfile.ZipFile(BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        sheets = _sheets(zf)
        if not sheets:
            raise ValueError("no sheets found in Excel file")
        parts: list[str] = []
        for sheet_idx, (name, target) in enumerate(sheets):
            if sheet_idx > 0:
                parts.append("\n\n")
            parts.append(f"Sheet: {name}\n")
            try:
                rows = _sheet_rows(zf, target, shared)
            except Exception as exc:  # unreadable sheet: note and move on
                parts.append(f"(Unable to read sheet {name}: {exc})\n")
                continue
            if not rows or not rows[0]:
                continue
            headers = rows[0]
            for row_idx in range(1, len(rows)):
                row = rows[row_idx]
                row_parts = []
                for col_idx, header in enumerate(headers):
                    if col_idx < len(row) and row[col_idx] != "":
                        value = row[col_idx].strip()
                        if value:
                            header_name = header.strip() or f"Column {col_idx + 1}"
                            row_parts.append(f"{header_name}: {value}")
                if row_parts:
                    parts.append(f"Row {row_idx + 1}: {', '.join(row_parts)}\n")
    result = "".join(parts).strip()
    if not result:
        raise ValueError("no content extracted from Excel file")
    return result


# ---------------------------------------------------------------------- pdf

_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# literal strings shown by Tj / ' / TJ-array operators
_PDF_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]]*)\]\s*TJ")
_PDF_LITERAL_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    body = lit[1:-1]
    while i < len(body):
        ch = body[i : i + 1]
        if ch == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape
                oct_digits = body[i + 1 : i + 4]
                j = 1
                while j <= 3 and body[i + j : i + j + 1].isdigit():
                    j += 1
                out.append(int(oct_digits[: j - 1], 8) & 0xFF)
                i += j
                continue
        out += ch
        i += 1
    return bytes(out)


def parse_pdf(data: bytes) -> str:
    """S6: per-page text joined by blank lines (pdf.go:16-44).

    pypdf when available; else the minimal Tj/TJ extractor below.
    """
    try:
        from pypdf import PdfReader  # optional dependency

        reader = PdfReader(BytesIO(data))
        pages = [p.extract_text() or "" for p in reader.pages]
        text = "\n\n".join(pages).strip()
        if text:
            return text
    except ImportError:
        pass

    pieces: list[str] = []
    for m in _PDF_STREAM_RE.finditer(data):
        payload = m.group(1)
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            pass  # uncompressed stream
        for tm in _PDF_TJ_RE.finditer(payload):
            for lit in _PDF_LITERAL_RE.finditer(tm.group(0)):
                decoded = _pdf_unescape(lit.group(0)).decode(
                    "latin-1", errors="replace"
                )
                if decoded:
                    pieces.append(decoded)
    text = " ".join(pieces).strip()
    if not text:
        raise ValueError("no text extracted from PDF")
    return text
