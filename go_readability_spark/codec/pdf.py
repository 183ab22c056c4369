"""Minimal PDF text-layer extraction (stdlib-only).

The north rule's extraction surface includes "PDF/layout parse" alongside
HTML boilerplate stripping.  This module handles the common simple case
end-to-end with no third-party dependency: uncompressed or FlateDecode
content streams, BT..ET text blocks, ``Tj`` / ``'`` / ``TJ`` show-text
operators over both literal ``(...)`` strings (with PDF escapes) and hex
``<...>`` strings (one-byte character codes), page-ordered.  Anything
richer (CID-keyed/Type0 fonts whose hex strings are 2-byte CIDs needing a
ToUnicode CMap, encrypted files, object streams) is out of scope here — pass a production extractor (pypdf/pdfminer) through the
``real_extract`` hook of ``spark.corpus.ingest_pdf_documents`` and the
Spark-side plumbing is unchanged.

Layout model: one output line per show-text operator in stream order —
the text layer's native reading order for simple generators.  This mirrors
how the HTML side treats the DOM's document order as layout order.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# (string) Tj   |   (string) '   |   [ ...(s1)...(s2)... ] TJ
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")
# <hexdigits> Tj — one-byte character codes (simple fonts); CID-keyed
# two-byte codes need a ToUnicode CMap and go through ``real_extract``
_TJ_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>\s*(?:Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_STR_IN_ARRAY_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_HEX_IN_ARRAY_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # \ddd octal (1-3 OCTAL digits; \8, \9
                # are not octal — bytes.isdigit would accept them and blow
                # up int(..., 8), so scan 0-7 only)
                j = i + 1
                while j < min(i + 4, n) and raw[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in b"\r\n":  # \<EOL> is a LINE CONTINUATION (PDF 32000
                # §7.3.4.2): both the backslash AND the EOL drop; \r\n is
                # one EOL marker
                i += 2
                if nxt == b"\r" and raw[i : i + 1] == b"\n":
                    i += 1
                continue
            i += 1  # lone backslash before any other char: dropped
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _unhex(raw: bytes) -> str:
    """<...> hex string → text, one byte per 2 hex digits (whitespace
    ignored, odd trailing digit padded with 0 per the PDF spec §7.3.4.3).
    Latin-1 byte decode — correct for simple (1-byte-code) fonts only."""
    digits = re.sub(rb"\s+", b"", raw)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def page_pieces_from_lines(lines: list[str]) -> list[str]:
    """Text-layer lines → the <p>-scaffold page pieces both ingest paths
    share (spark.corpus._pdf_batches builds spans from the pieces, the CLI
    joins them).  Lines are HTML-escaped: PDF text is data, not markup —
    '<', '>', '&' in a line (e.g. "a < b", "AT&T") must survive the kernel
    parse verbatim instead of being read as tags."""
    from html import escape

    return ["<html><body>", *(f"<p>{escape(line)}</p>" for line in lines), "</body></html>"]


def _content_streams(pdf: bytes) -> list[bytes]:
    streams = []
    for m in _STREAM_RE.finditer(pdf):
        head, data = m.group(1), m.group(2)
        # stream data runs to the last newline before endstream
        data = data.rstrip(b"\r\n")
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        streams.append(data)
    return streams


def pdf_to_text_lines(pdf: bytes) -> list[str]:
    """Extract the text layer: one entry per show-text operator, in
    stream order.  Returns [] for PDFs with no extractable simple text."""
    lines: list[str] = []
    for stream in _content_streams(pdf):
        for block in _TEXT_BLOCK_RE.finditer(stream):
            body = block.group(1)
            # array TJ first (so its inner strings aren't double-counted),
            # tracked by span to preserve operator order
            taken: list[tuple[int, str]] = []
            consumed: list[tuple[int, int]] = []
            for m in _TJ_ARRAY_RE.finditer(body):
                lits = list(_STR_IN_ARRAY_RE.finditer(m.group(1)))
                lit_spans = [(s.start(), s.end()) for s in lits]
                parts = [(s.start(), _unescape(s.group(1))) for s in lits] + [
                    (s.start(), _unhex(s.group(1)))
                    for s in _HEX_IN_ARRAY_RE.finditer(m.group(1))
                    # a literal like (a<b>) must not double-count its
                    # hex-digit-only angle text as a hex string
                    if not any(a <= s.start() < b for a, b in lit_spans)
                ]
                taken.append((m.start(), "".join(t for _, t in sorted(parts))))
                consumed.append((m.start(), m.end()))
            for m in _TJ_RE.finditer(body):
                if any(a <= m.start() < b for a, b in consumed):
                    continue
                taken.append((m.start(), _unescape(m.group(1))))
                # record the literal span so hex-lookalike text INSIDE it
                # (e.g. "(see <41> Tj)") isn't re-emitted by the hex scan
                consumed.append((m.start(), m.end()))
            for m in _TJ_HEX_RE.finditer(body):
                if any(a <= m.start() < b for a, b in consumed):
                    continue
                taken.append((m.start(), _unhex(m.group(1))))
            for _, text in sorted(taken):
                if text:
                    lines.append(text)
    return lines
