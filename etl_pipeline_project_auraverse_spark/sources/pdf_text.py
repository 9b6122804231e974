"""Pure-stdlib PDF text extraction (S2 backend).

The reference extracts PDF text with pdfplumber, falling back to
PyPDF2, and raises if nothing is extractable (reference
``backend/etl_pipeline.py:27-48``). Neither library ships in this
container, so this module implements the common-case subset those
libraries cover for digitally-authored PDFs, from the PDF 1.7 spec
(ISO 32000-1, public):

- object parsing (``N G obj ... endobj``), including streams with
  ``/FlateDecode`` (zlib) or no filter;
- page discovery via the document catalog's ``/Pages`` tree (``/Kids``
  recursion), falling back to document-order ``/Type /Page`` objects;
- content-stream tokenization and the text-showing operators
  ``Tj``, ``'``, ``"``, and ``TJ`` (array form, kerning numbers
  ignored), with ``(...)`` literal-string escapes (``\\n \\r \\t \\b
  \\f \\( \\) \\\\`` and octal) and ``<...>`` hex strings;
- line-break heuristics: ``Td``/``TD``/``T*``/``ET`` start a new line,
  matching how pdfplumber lays out simple single-column text.

Deliberate limits (documented divergence from pdfplumber): no
encryption, no CID/Type0 composite fonts (2-byte codes), no object
streams (``/ObjStm``), no layout analysis — glyph bytes are decoded as
Latin-1, which matches the Standard/WinAnsi encodings for ASCII text.
Scanned/image-only PDFs yield no text, which the caller must treat as
the reference's "No extractable text" failure.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

# PDF delimiters end a dictionary value; used when scanning name values
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Map object number -> raw object body (between obj/endobj)."""
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _object_dict(body: bytes) -> bytes:
    """The top-level ``<< ... >>`` dictionary of an object body
    (balanced-delimiter scan; nested dicts stay inside)."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth, i = 0, start
    while i < len(body) - 1:
        pair = body[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _stream_bytes(body: bytes) -> bytes | None:
    """Decoded stream content of an object, honoring /FlateDecode."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    raw = m.group(1)
    d = _object_dict(body)
    if b"/FlateDecode" in d:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            # tolerate trailing-whitespace slicing differences
            try:
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    if b"/Filter" in d:
        return None  # unsupported filter (DCT, LZW, ...)
    return raw


def _dict_refs(d: bytes, key: bytes) -> list[int]:
    """Object numbers referenced by ``key`` (single ref or array)."""
    m = re.search(re.escape(key) + rb"\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _page_objects(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in tree order (catalog -> /Pages -> /Kids),
    falling back to document order of /Type /Page objects."""
    catalog = next(
        (n for n, b in objs.items() if re.search(rb"/Type\s*/Catalog\b", b)), None
    )
    pages: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b", body) and not re.search(
            rb"/Type\s*/Pages\b", body
        ):
            pages.append(num)
        else:
            for kid in _dict_refs(_object_dict(body), b"/Kids"):
                walk(kid, seen)

    if catalog is not None:
        for root in _dict_refs(_object_dict(objs[catalog]), b"/Pages"):
            walk(root, set())
    if not pages:
        pages = [
            n
            for n, b in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", b)
            and not re.search(rb"/Type\s*/Pages\b", b)
        ]
    return pages


def _literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at ``data[i] == '('``.
    Returns (decoded text, index after the closing paren)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \d{1,3}
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(chr(int(oct_digits.decode(), 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _hex_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``<...>`` hex string starting at ``data[i] == '<'``."""
    end = data.find(b">", i)
    if end < 0:
        return "", len(data)
    hx = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode()).decode("latin-1"), end + 1
    except ValueError:
        return "", end + 1


TJ_WORD_SPACE = -180  # kern (1/1000 em) at/below which TJ implies a space


def _content_text(content: bytes) -> str:
    """Text shown by a content stream: Tj / ' / " / TJ strings in
    order, newline on Td/TD/T*/ET. Inside a TJ array, a kerning number
    <= TJ_WORD_SPACE between fragments renders as a word space (the
    same heuristic pypdf-class extractors use for producers that kern
    instead of emitting space glyphs)."""
    lines: list[str] = []
    cur: list[str] = []
    # tokens since the last operator: ("s", text) or ("n", number)
    pending: list[tuple[str, object]] = []
    i, n = 0, len(content)

    def flush_line() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def pending_strings() -> list[str]:
        return [v for k, v in pending if k == "s"]  # type: ignore[misc]

    def tj_join() -> str:
        out: list[str] = []
        kern_gap = False
        for kind, val in pending:
            if kind == "n":
                if isinstance(val, float) and val <= TJ_WORD_SPACE and out:
                    kern_gap = True
            else:
                if kern_gap and out and not out[-1].endswith(" "):
                    out.append(" ")
                kern_gap = False
                out.append(val)  # type: ignore[arg-type]
        return "".join(out)

    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _literal_string(content, i)
            pending.append(("s", s))
        elif c == 0x3C and not content.startswith(b"<<", i):  # <
            s, i = _hex_string(content, i)
            pending.append(("s", s))
        elif c == 0x25:  # % comment to EOL
            nl = content.find(b"\n", i)
            i = n if nl < 0 else nl + 1
        else:
            m = re.match(rb"[-+.0-9]+", content[i : i + 24])
            if m and re.match(rb"[-+]?(\d+\.?\d*|\.\d+)$", m.group(0)):
                pending.append(("n", float(m.group(0))))
                i += len(m.group(0))
                continue
            m = re.match(rb"[A-Za-z'\"*]+", content[i : i + 8])
            if m:
                op = m.group(0)
                if op == b"TJ":
                    cur.append(tj_join())
                elif op == b"Tj":
                    cur.extend(pending_strings())
                elif op in (b"'", b'"'):
                    flush_line()
                    cur.extend(pending_strings())
                elif op in (b"Td", b"TD", b"T*", b"ET"):
                    flush_line()
                pending.clear()
                i += len(op)
            else:
                i += 1
    flush_line()
    return "\n".join(line for line in lines if line.strip())


def extract_pdf_text(data: bytes) -> str:
    """All page text of a PDF, pages joined by newlines. Returns ""
    when nothing is extractable (encrypted / image-only / unsupported),
    mirroring pdfplumber's ``extract_text() or ''`` per page."""
    if not data.startswith(b"%PDF"):
        return ""
    objs = _parse_objects(data)
    page_texts: list[str] = []
    for page_num in _page_objects(objs):
        d = _object_dict(objs[page_num])
        parts: list[str] = []
        for ref in _dict_refs(d, b"/Contents"):
            body = objs.get(ref)
            if body is None:
                continue
            stream = _stream_bytes(body)
            if stream:
                parts.append(_content_text(stream))
        page_texts.append("\n".join(p for p in parts if p))
    return "\n".join(page_texts)
