"""S7 — PDF → text extraction (SURVEY.md §2.1).

The reference extracts book text from PDFs with pymupdf
(``pre_processing/process_all.py:265-279``: per-page ``get_text`` then
join).  That library isn't in this image, so alongside the pymupdf hook
there is a REAL pure-Python extractor for the common simple case: PDFs
whose content streams are uncompressed or FlateDecode (zlib, stdlib) and
whose text is shown with literal-string ``Tj``/``'``/``TJ`` operators in
a standard 8-bit encoding.  That covers text-first PDFs produced by most
generators without font subsetting; PDFs using hex-CID strings + embedded
CMaps (scanned/press-optimized files) still need the pymupdf path.

Everything here is a plain bytes→str function — the Spark side wraps it
in an Arrow-batched ``mapInPandas`` (see ``multimodal/audio.py:
extract_pdf_text``), so the distribution story is identical for the fake,
the pure parser, and pymupdf.
"""

from __future__ import annotations

import re
import zlib

# <<dict>> stream ... endstream — non-greedy, DOTALL; the dict tells us
# the filter chain.
_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
# BT/ET operators OR a literal string — scanning with one alternation
# means an "ET" shown *inside* a string (e.g. ``(ET) Tj``) is consumed as
# string content and can never terminate the block (PDF 32000-1 §7.8.2)
_BTET_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|\b(BT|ET)\b", re.S)
# (literal string) tokens inside a TJ array
_LIT_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    """PDF literal-string unescaping: named escapes, octal \\ddd, and
    line-continuation backslash (PDF 32000-1 §7.3.4.2)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2  # escaped newline = continuation, emits nothing
        else:
            out += nxt
            i += 2
    return bytes(out)


def _content_streams(data: bytes):
    for m in _STREAM_RE.finditer(data):
        head, body = m.group(1), m.group(2)
        if b"/Image" in head:
            continue
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body.strip(b"\r\n"))
            except zlib.error:
                continue
        elif re.search(rb"/Filter", head):
            continue  # other filters (DCT, LZW, ...) need a real codec
        yield body


def _text_blocks(stream: bytes):
    """Yield the bodies of BT..ET text blocks, tokenizing literal strings
    so operator lookalikes inside shown text don't split blocks."""
    start = None
    for m in _BTET_RE.finditer(stream):
        tok = m.group(1)
        if tok is None:
            continue  # literal string — opaque to block structure
        if tok == b"BT" and start is None:
            start = m.end()
        elif tok == b"ET" and start is not None:
            yield stream[start : m.start()]
            start = None


def pdf_text(payload: bytes) -> str:
    """Extract shown text from a simple PDF's content streams.

    Each BT..ET block becomes one line (mirroring pymupdf's block
    granularity closely enough for line-per-sentence corpora); strings in
    ``TJ`` arrays are concatenated without the kerning offsets."""
    def _dec(b: bytes) -> str:
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    lines: list[str] = []
    for stream in _content_streams(payload):
        for chunk in _text_blocks(stream):
            frags: list[bytes] = []
            # single ordered scan so Tj/'/TJ fragments interleave in show
            # order; T* and the ' operator both advance to the next line
            for m in re.finditer(
                rb"\(((?:\\.|[^\\()])*)\)\s*(Tj|')"
                rb"|\[((?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ"
                rb"|T\*",
                chunk,
                re.S,
            ):
                if m.group(0) == b"T*":
                    frags.append(b"\n")
                elif m.group(1) is not None:
                    if m.group(2) == b"'":
                        frags.append(b"\n")
                    frags.append(_unescape(m.group(1)))
                else:
                    for lit in _LIT_RE.finditer(m.group(3)):
                        frags.append(_unescape(lit.group(1)))
            if frags:
                lines.append(_dec(b"".join(frags)).strip("\n"))
    return "\n".join(lines)


def make_minimal_pdf(text: str) -> bytes:
    """Build a minimal single-page PDF showing ``text`` with one Tj per
    line — the synthesis half of the S7 round-trip (tests + the
    ``s7_pdf_text_extract`` catalog query).  Parens/backslashes are
    escaped to keep the literal strings well-formed."""
    esc = (
        text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )
    shows = "\n".join(f"({line}) Tj T*" for line in esc.split("\n"))
    # UTF-8 bytes in the literal strings: PDF literals are byte strings,
    # and the extractor decodes utf-8-first — so Vietnamese text
    # round-trips without a latin-1 bottleneck
    content = f"BT /F1 12 Tf 14 TL 72 720 Td\n{shows}\nET".encode("utf-8")
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 5 0 R>>>>/Contents 4 0 R>>",
        b"<</Length %d>>stream\n%s\nendstream" % (len(content), content),
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, start=1):
        out += b"%d 0 obj" % i + o + b"endobj\n"
    out += b"trailer<</Root 1 0 R>>\n%%EOF"
    return bytes(out)
