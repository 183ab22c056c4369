"""Minimal PDF text-layer extraction (stdlib-only).

The north rule's extraction surface includes "PDF/layout parse" alongside
HTML boilerplate stripping.  This module handles the common simple case
end-to-end with no third-party dependency: uncompressed or FlateDecode
content streams, BT..ET text blocks, ``Tj`` / ``'`` / ``TJ`` show-text
operators over both literal ``(...)`` strings (with PDF escapes) and hex
``<...>`` strings, page-ordered.

CID-keyed (Type0/Identity-H) text — the common real-crawl case — is
handled for the single-consistent-CMap envelope: when the document's
ToUnicode CMap streams (``beginbfchar``/``beginbfrange`` sections,
PDF 32000 §9.10.3) merge without conflicting mappings, hex show-text
strings decode as 2-byte character codes through the merged map
(destinations are UTF-16BE).  Documents whose CMaps conflict (several
fonts reusing the same CID space differently) need per-font resource
resolution and fall back to the 1-byte latin-1 interpretation; encrypted
files and object streams stay out of scope — pass a production extractor
(pypdf/pdfminer) through the ``real_extract`` hook of
``spark.corpus.ingest_pdf_documents`` and the Spark-side plumbing is
unchanged.

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


def _hex_bytes(raw: bytes) -> bytes:
    """Hex-string payload → bytes (whitespace ignored, odd trailing digit
    padded with 0 per the PDF spec §7.3.4.3)."""
    digits = re.sub(rb"\s+", b"", raw)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return b""


def _unhex(raw: bytes, cmap: dict[int, str] | None = None) -> str:
    """<...> hex string → text.  With no ``cmap``: one byte per 2 hex
    digits, latin-1 (simple 1-byte-code fonts).  With a ToUnicode
    ``cmap``: 2-byte character codes mapped through it (Identity-H
    Type0 fonts; a trailing odd byte — malformed for 2-byte codes — and
    unmapped codes are dropped).  A string NONE of whose 2-byte codes
    exist in the document CMap falls back to 1-byte latin-1: in a
    mixed-font document that is a simple font's hex string, not CID
    text (partially-mapped strings stay CID-decoded — resolving those
    needs per-font resources, the ``real_extract`` envelope)."""
    bs = _hex_bytes(raw)
    if cmap is None:
        return bs.decode("latin-1")
    out: list[str] = []
    mapped = 0
    for i in range(0, len(bs) - 1, 2):
        v = cmap.get(int.from_bytes(bs[i : i + 2], "big"))
        if v is not None:
            mapped += 1
            out.append(v)
    if mapped == 0 and bs:
        return bs.decode("latin-1")
    return "".join(out)


# -- ToUnicode CMap (PDF 32000 §9.10.3) ---------------------------------------
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
# <lo> <hi> [<dst1> <dst2> ...]  (array form: one destination per code)
_BFRANGE_ARRAY_RE = re.compile(
    rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*\[((?:\s*<[0-9A-Fa-f\s]*>)*)\s*\]"
)
# <lo> <hi> <dstStart>  (incrementing form)
_BFRANGE_INCR_RE = re.compile(
    rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>"
)
_MAX_BFRANGE = 1 << 16  # CID space bound: reject absurd ranges in garbage


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """bfchar/bfrange sections → {char code → unicode str} (destinations
    are UTF-16BE per §9.10.3; undecodable destinations are skipped)."""
    cmap: dict[int, str] = {}

    def dst_str(tok: bytes) -> str:
        return _hex_bytes(tok).decode("utf-16-be", errors="ignore")

    for m in _BFCHAR_RE.finditer(data):
        toks = _HEXTOK_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            sb = _hex_bytes(src)
            if sb:
                cmap[int.from_bytes(sb, "big")] = dst_str(dst)
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        consumed: list[tuple[int, int]] = []
        for am in _BFRANGE_ARRAY_RE.finditer(body):
            lo = int.from_bytes(_hex_bytes(am.group(1)), "big")
            hi = int.from_bytes(_hex_bytes(am.group(2)), "big")
            if hi - lo >= _MAX_BFRANGE:
                continue
            for k, d in enumerate(_HEXTOK_RE.findall(am.group(3))):
                if lo + k <= hi:
                    cmap[lo + k] = dst_str(d)
            consumed.append((am.start(), am.end()))
        for rm in _BFRANGE_INCR_RE.finditer(body):
            if any(a <= rm.start() < b for a, b in consumed):
                continue
            lo = int.from_bytes(_hex_bytes(rm.group(1)), "big")
            hi = int.from_bytes(_hex_bytes(rm.group(2)), "big")
            dst = _hex_bytes(rm.group(3))
            if not dst or hi - lo >= _MAX_BFRANGE:
                continue
            base = int.from_bytes(dst, "big")
            width = max(len(dst), 2)
            for k in range(hi - lo + 1):
                try:
                    cmap[lo + k] = (
                        (base + k).to_bytes(width, "big").decode(
                            "utf-16-be", errors="ignore"
                        )
                    )
                except OverflowError:
                    break
    return cmap


def _is_cmap_resource(s: bytes) -> bool:
    """A standalone ToUnicode CMap stream: carries bfchar/bfrange
    sections and NO BT…ET text block.  Page content quoting the literal
    text 'beginbfchar' inside a Tj string has text blocks, so it is
    neither skipped as a resource nor merged into the document CMap."""
    return (
        (b"beginbfchar" in s or b"beginbfrange" in s)
        and _TEXT_BLOCK_RE.search(s) is None
    )


def _document_cmap(streams: list[bytes]) -> dict[int, str] | None:
    """The document's merged ToUnicode map, or None when out of envelope:
    no CMap streams at all, or several CMaps that disagree on a code
    (distinct fonts reusing the same CID space — needs per-font resource
    resolution, i.e. the ``real_extract`` hook)."""
    merged: dict[int, str] | None = None
    for s in streams:
        if not _is_cmap_resource(s):
            continue
        part = parse_tounicode_cmap(s)
        if not part:
            continue
        if merged is None:
            merged = dict(part)
            continue
        for k, v in part.items():
            if merged.setdefault(k, v) != v:
                return None  # conflicting CMaps: out of envelope
    return merged


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
    stream order.  Returns [] for PDFs with no extractable simple text.
    Hex strings decode as 2-byte CIDs through the document's ToUnicode
    CMap when one consistent map exists (Identity-H envelope), else as
    1-byte latin-1 codes (simple fonts)."""
    lines: list[str] = []
    streams = _content_streams(pdf)
    cmap = _document_cmap(streams)
    for stream in streams:
        if _is_cmap_resource(stream):
            continue  # a CMap resource, not page content
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
                    (s.start(), _unhex(s.group(1), cmap))
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
                taken.append((m.start(), _unhex(m.group(1), cmap)))
            for _, text in sorted(taken):
                if text:
                    lines.append(text)
    return lines
