"""Minimal valid-PDF builder for fixtures (writing a simple PDF is a
few dozen lines; the parser under test is `sources/pdf_text.py`).

Produces spec-conformant PDF 1.4 files: catalog -> pages tree -> page
objects with Helvetica and a content stream per page, optionally
Flate-compressed, with a correct xref table. Text is laid out one
``Tj`` (or ``TJ`` array) per line separated by ``Td`` moves — the
shape every common PDF producer emits for simple text.
"""

from __future__ import annotations

import zlib


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def content_stream_for(lines: list[str], use_tj_array: bool = False) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        if use_tj_array:
            # split into fragments with kerning numbers, as real
            # producers do: [(frag) -250 (frag)] TJ
            words = line.split(" ")
            frags = " -250 ".join(f"({_escape(w)})" for w in words)
            ops.append(f"[{frags}] TJ")
        else:
            ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(
    pages: list[list[str]], compress: bool = False, use_tj_array: bool = False
) -> bytes:
    """A PDF with one content stream per page of the given text lines."""
    objects: list[bytes] = []  # 1-indexed object bodies (without N 0 obj)
    n_pages = len(pages)
    # obj 1: catalog, obj 2: pages, objs 3..2+n: page, then contents, font
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_num = 3 + 2 * n_pages
    for i in range(n_pages):
        content_num = 3 + n_pages + i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
    for lines in pages:
        data = content_stream_for(lines, use_tj_array)
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
