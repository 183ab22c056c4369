"""Minimal PDF text-layer extraction (stdlib-only).

The north rule's extraction surface includes "PDF/layout parse" alongside
HTML boilerplate stripping.  This module handles the common simple case
end-to-end with no third-party dependency: uncompressed or FlateDecode
content streams, BT..ET text blocks, ``Tj`` / ``'`` / ``TJ`` show-text
operators over both literal ``(...)`` strings (with PDF escapes) and hex
``<...>`` strings, page-ordered.

CID-keyed (Type0/Identity-H) text — the common real-crawl case — is
handled two ways.  When the file carries a usable cross-reference
structure, fonts are resolved PER PAGE (``/Resources`` → ``/Font`` →
``/ToUnicode``, inherited down the page tree per PDF 32000 §7.7.3.4)
and ``Tf`` operators select the active font, so several fonts reusing
the same CID space with different ToUnicode maps each decode through
their own CMap (§9.10.3; destinations are UTF-16BE).  Without usable
structure, the fallback is the single-consistent-CMap envelope: the
document's CMap streams merge, and documents whose CMaps conflict fall
back to the 1-byte latin-1 interpretation.  Encrypted files stay out of
scope — pass a production extractor (pypdf/pdfminer) through the
``real_extract`` hook of ``spark.corpus.ingest_pdf_documents`` and the
Spark-side plumbing is unchanged.

Object-stream PDFs (the common PDF 1.5+ real-crawl class) are parsed
structurally: cross-reference tables AND cross-reference streams
(PDF 32000 §7.5.4/§7.5.8, incl. /Prev chains, hybrid /XRefStm, and PNG
predictors on the stream data) locate objects, ``/Type /ObjStm`` object
streams (§7.5.7) are unpacked for the catalog/page dictionaries packed
inside them, and the page tree is walked so ``/Contents`` streams extract
in TRUE PAGE ORDER.  When no usable structure exists (fixture-grade or
damaged files) the extractor falls back to scanning every top-level
stream in physical order, the previous behavior.

Layout model: one output line per show-text operator, pages in page-tree
order (physical stream order under the fallback).  This mirrors how the
HTML side treats the DOM's document order as layout order.
"""

from __future__ import annotations

import bisect
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


def _unescape_bytes(raw: bytes) -> bytes:
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
    return bytes(out)


def _unescape(raw: bytes) -> str:
    return _unescape_bytes(raw).decode("latin-1")


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


# -- Document structure: xref tables/streams, ObjStm, page tree ---------------
# (PDF 32000 §7.5; reference surface: the "PDF/layout parse" arm of the
# north rule's extraction tier.)  Everything here is best-effort: any
# structural inconsistency makes the caller fall back to the raw stream
# scan rather than raising.

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_OBJ_AT_RE = re.compile(rb"\s*(\d+)\s+(\d+)\s+obj")
_STREAM_KW_RE = re.compile(rb"\s*stream(\r\n|\n|\r)")
_XREF_ROW_RE = re.compile(rb"\s*(\d{10})\s+(\d{5})\s+([nf])")
_XREF_SUBSEC_RE = re.compile(rb"\s*(\d+)\s+(\d+)[ \t]*\r?\n")
_INT_TOK_RE = re.compile(rb"[-+]?\d+")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_MAX_OBJECTS = 200_000  # structural walk bound: plenty for any real file


def _balanced(buf: bytes, start: int, open_tok: bytes, close_tok: bytes) -> int:
    """End index (exclusive) of the balanced ``open_tok``…``close_tok``
    region beginning at ``start``, skipping literal strings; -1 if
    unbalanced.  Token length 1 or 2 (``[``/``]`` and ``<<``/``>>``)."""
    depth = 0
    i, n, w = start, len(buf), len(open_tok)
    while i < n:
        c = buf[i : i + 1]
        if buf[i : i + w] == open_tok:
            depth += 1
            i += w
            continue
        if buf[i : i + w] == close_tok:
            depth -= 1
            i += w
            if depth == 0:
                return i
            continue
        if c == b"(":  # literal string: ignore delimiters inside
            j, d, esc = i + 1, 1, False
            while j < n and d:
                cc = buf[j : j + 1]
                if esc:
                    esc = False
                elif cc == b"\\":
                    esc = True
                elif cc == b"(":
                    d += 1
                elif cc == b")":
                    d -= 1
                j += 1
            i = j
            continue
        i += 1
    return -1


def _dict_int(d: bytes, key: bytes) -> int | None:
    """Direct integer value of ``/key`` (None for refs/absent)."""
    m = re.search(rb"/" + key + rb"\s+(\d+)(?!\s+\d+\s+R)", d)
    return int(m.group(1)) if m else None


def _dict_ref(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R\b", d)
    return int(m.group(1)) if m else None


def _dict_array(d: bytes, key: bytes) -> bytes | None:
    m = re.search(rb"/" + key + rb"\s*\[", d)
    if not m:
        return None
    end = _balanced(d, m.end() - 1, b"[", b"]")
    return d[m.end() : end - 1] if end > 0 else None


def _dict_subdict(d: bytes, key: bytes) -> bytes | None:
    m = re.search(rb"/" + key + rb"\s*<<", d)
    if not m:
        return None
    end = _balanced(d, m.end() - 2, b"<<", b">>")
    return d[m.end() - 2 : end] if end > 0 else None


def _png_unpredict(data: bytes, predictor: int, columns: int, colors: int, bpc: int) -> bytes | None:
    """Undo PNG row predictors 10-15 (§7.4.4.4); None on malformed input.
    Predictor 1/None passes through; TIFF predictor 2 is out of envelope."""
    if predictor <= 1:
        return data
    if predictor < 10:
        return None
    bpp = max(1, (colors * bpc) // 8)
    stride = max(1, (columns * colors * bpc + 7) // 8)
    row_len = stride + 1
    if len(data) % row_len:
        data = data[: len(data) - (len(data) % row_len)]
    out = bytearray()
    prev = bytearray(stride)
    for r in range(0, len(data), row_len):
        tag = data[r]
        row = bytearray(data[r + 1 : r + row_len])
        if tag == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif tag != 0:
            return None
        out += row
        prev = row
    return bytes(out)


def _decode_stream(head: bytes, raw: bytes) -> bytes | None:
    """Apply the stream's filter chain; None when out of envelope (only
    FlateDecode, optionally PNG-predicted, is supported — which is what
    xref/ObjStm/content streams use in practice)."""
    named = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", head)
    if named is None:
        return raw
    if named.group(1) != b"FlateDecode":
        return None
    try:
        data = zlib.decompress(raw)
    except zlib.error:
        return None
    parms = _dict_subdict(head, b"DecodeParms") or _dict_subdict(head, b"DP")
    if parms:
        predictor = _dict_int(parms, b"Predictor") or 1
        columns = _dict_int(parms, b"Columns") or 1
        colors = _dict_int(parms, b"Colors") or 1
        bpc = _dict_int(parms, b"BitsPerComponent") or 8
        data = _png_unpredict(data, predictor, columns, colors, bpc)
    return data


class _Doc:
    """Random-access object loader over a parsed cross-reference map.
    Entries: obj num → ("o", byte offset) | ("c", objstm num, index)."""

    def __init__(self, pdf: bytes, entries: dict[int, tuple]):
        self.pdf = pdf
        self.entries = entries
        self._objstm: dict[int, list[tuple[int, bytes]]] = {}

    def object(self, num: int, depth: int = 0) -> tuple[bytes | None, bytes | None]:
        """→ (body bytes, decoded stream data or None).  For packed
        objects the body is the slice out of its object stream."""
        if depth > 8:
            return None, None
        e = self.entries.get(num)
        if e is None:
            return None, None
        if e[0] == "o":
            return self._object_at(e[1], depth)
        packed = self._objstm_objects(e[1], depth)
        idx = e[2]  # xref type-2 field 3 = index WITHIN the object stream
        if 0 <= idx < len(packed) and packed[idx][0] == num:
            return packed[idx][1], None
        for onum, body in packed:  # writer disagreement: trust the header
            if onum == num:
                return body, None
        return None, None

    def _object_at(self, offset: int, depth: int) -> tuple[bytes | None, bytes | None]:
        pdf = self.pdf
        m = _OBJ_AT_RE.match(pdf, offset)
        if not m:
            return None, None
        i = m.end()
        while i < len(pdf) and pdf[i : i + 1] in b" \t\r\n":
            i += 1
        if pdf[i : i + 2] == b"<<":
            end = _balanced(pdf, i, b"<<", b">>")
            if end < 0:
                return None, None
            head = pdf[i:end]
            sm = _STREAM_KW_RE.match(pdf, end)
            if not sm:
                return head, None
            dstart = sm.end()
            length = _dict_int(head, b"Length")
            if length is None:
                ref = _dict_ref(head, b"Length")
                if ref is not None:
                    body, _ = self.object(ref, depth + 1)
                    if body is not None:
                        lm = _INT_TOK_RE.search(body)
                        length = int(lm.group()) if lm else None
            if length is not None and dstart + length <= len(pdf):
                raw = pdf[dstart : dstart + length]
            else:
                em = pdf.find(b"endstream", dstart)
                if em < 0:
                    return head, None
                raw = pdf[dstart:em].rstrip(b"\r\n")
            return head, _decode_stream(head, raw)
        em = pdf.find(b"endobj", i)
        return (pdf[i:em] if em >= 0 else None), None

    def _objstm_objects(self, num: int, depth: int) -> list[tuple[int, bytes]]:
        """Ordered (object number, body) pairs packed in ObjStm ``num`` —
        ordered because xref type-2 entries address by in-stream index."""
        cached = self._objstm.get(num)
        if cached is not None:
            return cached
        self._objstm[num] = []  # break reference cycles while parsing
        head, data = self.object(num, depth + 1)
        if head is None or data is None:
            return self._objstm[num]
        n = _dict_int(head, b"N")
        first = _dict_int(head, b"First")
        if not n or first is None or first > len(data):
            return self._objstm[num]
        ints = [int(t) for t in _INT_TOK_RE.findall(data[:first])][: 2 * n]
        pairs = list(zip(ints[0::2], ints[1::2]))
        body = data[first:]
        out: list[tuple[int, bytes]] = []
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(body)
            if 0 <= off <= end <= len(body):
                out.append((onum, body[off:end]))
        self._objstm[num] = out
        return out


def _parse_xref_table(pdf: bytes, offset: int, entries: dict[int, tuple]):
    """Classic §7.5.4 table at ``offset`` → (trailer dict bytes, [next
    offsets to follow]); (None, []) if malformed."""
    i = offset + 4  # past "xref"
    while True:
        m = _XREF_SUBSEC_RE.match(pdf, i)
        if not m:
            break
        start, count = int(m.group(1)), int(m.group(2))
        i = m.end()
        if count > _MAX_OBJECTS:
            return None, []
        for k in range(count):
            rm = _XREF_ROW_RE.match(pdf, i)
            if not rm:
                return None, []
            i = rm.end()
            if rm.group(3) == b"n":
                entries.setdefault(start + k, ("o", int(rm.group(1))))
    tm = re.compile(rb"\s*trailer\s*<<").match(pdf, i)
    if not tm:
        return None, []
    end = _balanced(pdf, tm.end() - 2, b"<<", b">>")
    if end < 0:
        return None, []
    trailer = pdf[tm.end() - 2 : end]
    nxt = []
    hybrid = _dict_int(trailer, b"XRefStm")  # hybrid-reference (§7.5.8.4)
    if hybrid is not None:
        nxt.append(hybrid)
    prev = _dict_int(trailer, b"Prev")
    if prev is not None:
        nxt.append(prev)
    return trailer, nxt


def _parse_xref_stream(pdf: bytes, offset: int, entries: dict[int, tuple]):
    """§7.5.8 cross-reference stream at ``offset`` → (stream dict bytes
    as the trailer, [next offsets]); (None, []) if malformed."""
    head, data = _Doc(pdf, {})._object_at(offset, 0)
    if head is None or data is None or b"/XRef" not in head:
        return None, []
    w = _dict_array(head, b"W")
    if w is None:
        return None, []
    widths = [int(t) for t in _INT_TOK_RE.findall(w)]
    if len(widths) < 3 or sum(widths) == 0:
        return None, []
    w1, w2, w3 = widths[:3]
    rec = w1 + w2 + w3
    size = _dict_int(head, b"Size") or 0
    idx = _dict_array(head, b"Index")
    if idx is not None:
        nums = [int(t) for t in _INT_TOK_RE.findall(idx)]
        sections = list(zip(nums[0::2], nums[1::2]))
    else:
        sections = [(0, size)]
    pos = 0
    for start, count in sections:
        if count > _MAX_OBJECTS:
            return None, []
        for k in range(count):
            row = data[pos : pos + rec]
            pos += rec
            if len(row) < rec:
                return None, []
            f1 = int.from_bytes(row[:w1], "big") if w1 else 1
            f2 = int.from_bytes(row[w1 : w1 + w2], "big")
            f3 = int.from_bytes(row[w1 + w2 :], "big")
            num = start + k
            if f1 == 1:
                entries.setdefault(num, ("o", f2))
            elif f1 == 2:
                entries.setdefault(num, ("c", f2, f3))
    prev = _dict_int(head, b"Prev")
    return head, [prev] if prev is not None else []


def _parse_xref(pdf: bytes) -> tuple[dict[int, tuple], bytes] | None:
    """Follow ``startxref`` and the /Prev chain across classic tables,
    xref streams, and hybrid files → (entries, newest trailer dict)."""
    last = None
    for last in _STARTXREF_RE.finditer(pdf):
        pass
    if last is None:
        return None
    entries: dict[int, tuple] = {}
    trailer: bytes | None = None
    stack = [int(last.group(1))]
    seen: set[int] = set()
    while stack:
        offset = stack.pop(0)
        if offset in seen or not 0 <= offset < len(pdf):
            continue
        seen.add(offset)
        if pdf[offset : offset + 4] == b"xref":
            t, nxt = _parse_xref_table(pdf, offset, entries)
        else:
            t, nxt = _parse_xref_stream(pdf, offset, entries)
        if t is None:
            continue
        if trailer is None:
            trailer = t
        stack.extend(nxt)
    if trailer is None or not entries:
        return None
    return entries, trailer


class _Font:
    """Per-page font face: ``two_byte`` (Type0/CID — 2-byte character
    codes) and its own ToUnicode ``cmap`` (None when the font embeds
    none)."""

    __slots__ = ("two_byte", "cmap")

    def __init__(self, two_byte: bool, cmap: dict[int, str] | None):
        self.two_byte = two_byte
        self.cmap = cmap


# PDF name token after '/': anything up to a delimiter (§7.3.5)
_FONT_REF_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R\b")
_TF_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+[-+0-9.]+\s+Tf\b")


def _resolve_dict(doc: _Doc, body: bytes, key: bytes) -> bytes | None:
    """``/key`` value as dict bytes: a direct ``<<…>>`` or a reference."""
    sub = _dict_subdict(body, key)
    if sub is not None:
        return sub
    ref = _dict_ref(body, key)
    if ref is None:
        return None
    rbody, _ = doc.object(ref)
    return rbody


def _fonts_from_resources(doc: _Doc, res: bytes) -> dict[bytes, _Font]:
    """``/Font`` entries of a resource dict → {name → _Font}.  Entries
    must be references (the universal writer practice); inline font
    dicts are skipped (their Tf falls back to the document CMap)."""
    fonts: dict[bytes, _Font] = {}
    fdict = _resolve_dict(doc, res, b"Font")
    if fdict is None:
        return fonts
    for m in _FONT_REF_RE.finditer(fdict):
        body, _ = doc.object(int(m.group(2)))
        if body is None:
            continue
        sub = re.search(rb"/Subtype\s*/(\w+)", body)
        two_byte = bool(sub and sub.group(1) == b"Type0")
        cmap: dict[int, str] | None = None
        tu = _dict_ref(body, b"ToUnicode")
        if tu is not None:
            _, data = doc.object(tu)
            if data:
                cmap = parse_tounicode_cmap(data) or None
        fonts[m.group(1)] = _Font(two_byte, cmap)
    return fonts


def structured_pages(pdf: bytes) -> list[tuple[bytes, dict[bytes, _Font]]] | None:
    """(page content bytes, fonts) per page in page-tree order, resolving
    objects through the cross-reference map (incl. objects packed in
    ObjStm).  Multiple ``/Contents`` streams of one page concatenate
    (§7.8.2 treats them as a single stream).  ``/Resources`` inherit down
    the page tree (§7.7.3.4).  None when the file has no usable structure
    or any page content stream fails to decode — callers then fall back
    to the raw physical scan."""
    parsed = _parse_xref(pdf)
    if parsed is None:
        return None
    entries, trailer = parsed
    doc = _Doc(pdf, entries)
    root = _dict_ref(trailer, b"Root")
    if root is None:
        return None
    root_body, _ = doc.object(root)
    if root_body is None:
        return None
    pages = _dict_ref(root_body, b"Pages")
    if pages is None:
        return None
    out: list[tuple[bytes, dict[bytes, _Font]]] = []
    stack: list[tuple[int, bytes | None]] = [(pages, None)]
    visited: set[int] = set()
    while stack:
        if len(visited) > _MAX_OBJECTS:
            return None
        num, inherited_res = stack.pop()
        if num in visited:
            continue
        visited.add(num)
        body, _ = doc.object(num)
        if body is None:
            continue
        res = _resolve_dict(doc, body, b"Resources") or inherited_res
        kids = _dict_array(body, b"Kids")
        if kids is not None:
            refs = [int(m.group(1)) for m in _REF_RE.finditer(kids)]
            stack.extend(reversed([(r, res) for r in refs]))  # DFS, Kids order
            continue
        contents = _dict_array(body, b"Contents")
        if contents is not None:
            refs = [int(m.group(1)) for m in _REF_RE.finditer(contents)]
        else:
            ref = _dict_ref(body, b"Contents")
            refs = [ref] if ref is not None else []
        datas: list[bytes] = []
        for r in refs:
            _, data = doc.object(r)
            if data is None:
                return None  # undecodable page content: whole path falls back
            datas.append(data)
        if datas:
            fonts = _fonts_from_resources(doc, res) if res is not None else {}
            out.append((b"\n".join(datas), fonts))
    return out or None


def structured_page_streams(pdf: bytes) -> list[bytes] | None:
    """Decoded page content in page-tree order (one entry per page); see
    ``structured_pages``."""
    pages = structured_pages(pdf)
    if pages is None:
        return None
    return [content for content, _ in pages]


def _decode_codes(bs: bytes, font: _Font) -> str:
    """Character-code bytes → text through a RESOLVED font.  Type0: 2-byte
    codes through the font's own CMap (unmapped codes and a trailing odd
    byte drop; no ToUnicode at all degrades to the raw-byte latin-1 read,
    the pre-resolution behavior; a string NONE of whose codes map reads
    as latin-1 — on real crawls that is writer junk like an ASCII
    literal shown under a CID font, and readable text must survive).
    Simple fonts: 1-byte codes, mapped when a ToUnicode exists, else
    latin-1."""
    if font.two_byte:
        if font.cmap is None:
            return bs.decode("latin-1")
        out: list[str] = []
        mapped = 0
        for i in range(0, len(bs) - 1, 2):
            v = font.cmap.get(int.from_bytes(bs[i : i + 2], "big"))
            if v is not None:
                mapped += 1
                out.append(v)
        if mapped == 0 and bs:
            return bs.decode("latin-1")
        return "".join(out)
    if font.cmap:
        return "".join(font.cmap.get(b, chr(b)) for b in bs)
    return bs.decode("latin-1")


def _hex_text(raw: bytes, font: _Font | None, doc_cmap: dict[int, str] | None) -> str:
    return _unhex(raw, doc_cmap) if font is None else _decode_codes(_hex_bytes(raw), font)


def _lit_text(raw: bytes, font: _Font | None, doc_cmap: dict[int, str] | None) -> str:
    del doc_cmap  # literal strings never went through the document CMap
    return _unescape(raw) if font is None else _decode_codes(_unescape_bytes(raw), font)


def _tf_events(stream: bytes) -> list[tuple[int, bytes]]:
    """(absolute position, font name) per ``Tf`` operator, skipping
    matches inside literal strings (text data quoting ' /F1 12 Tf' must
    not switch fonts)."""
    lit_spans = [(m.start(), m.end()) for m in _STR_IN_ARRAY_RE.finditer(stream)]
    starts = [a for a, _ in lit_spans]
    events: list[tuple[int, bytes]] = []
    for m in _TF_RE.finditer(stream):
        i = bisect.bisect_right(starts, m.start()) - 1
        if i >= 0 and m.start() < lit_spans[i][1]:
            continue
        events.append((m.start(), m.group(1)))
    return events


def _stream_text(
    stream: bytes,
    fonts: dict[bytes, _Font] | None,
    doc_cmap: dict[int, str] | None,
    lines: list[str],
) -> None:
    """Append one line per show-text operator.  With a non-empty per-page
    ``fonts`` map, ``Tf`` operators select the decode per font; operators
    before any Tf (or naming an unresolved font) use the document-CMap
    fallback."""
    events = _tf_events(stream) if fonts else []
    positions = [p for p, _ in events]
    names = [n for _, n in events]

    def font_at(pos: int) -> _Font | None:
        i = bisect.bisect_right(positions, pos) - 1
        return fonts.get(names[i]) if i >= 0 else None

    for block in _TEXT_BLOCK_RE.finditer(stream):
        body = block.group(1)
        base = block.start(1)
        # array TJ first (so its inner strings aren't double-counted),
        # tracked by span to preserve operator order
        taken: list[tuple[int, str]] = []
        consumed: list[tuple[int, int]] = []
        for m in _TJ_ARRAY_RE.finditer(body):
            f = font_at(base + m.start())
            lits = list(_STR_IN_ARRAY_RE.finditer(m.group(1)))
            lit_spans = [(s.start(), s.end()) for s in lits]
            parts = [(s.start(), _lit_text(s.group(1), f, doc_cmap)) for s in lits] + [
                (s.start(), _hex_text(s.group(1), f, doc_cmap))
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
            taken.append((m.start(), _lit_text(m.group(1), font_at(base + m.start()), doc_cmap)))
            # record the literal span so hex-lookalike text INSIDE it
            # (e.g. "(see <41> Tj)") isn't re-emitted by the hex scan
            consumed.append((m.start(), m.end()))
        for m in _TJ_HEX_RE.finditer(body):
            if any(a <= m.start() < b for a, b in consumed):
                continue
            taken.append((m.start(), _hex_text(m.group(1), font_at(base + m.start()), doc_cmap)))
        for _, text in sorted(taken):
            if text:
                lines.append(text)


def pdf_to_text_lines(pdf: bytes) -> list[str]:
    """Extract the text layer: one entry per show-text operator, pages in
    page-tree order when the file carries a usable cross-reference
    structure (xref table or stream, incl. ObjStm-packed page dicts),
    else all top-level streams in physical order.  Returns [] for PDFs
    with no extractable simple text.  Under the structural path, fonts
    resolve per page and ``Tf`` selects each operator's decode (so
    conflicting per-font ToUnicode CMaps each apply correctly); under the
    fallback, hex strings decode as 2-byte CIDs through the document's
    merged ToUnicode CMap when one consistent map exists (Identity-H
    envelope), else as 1-byte latin-1 codes (simple fonts)."""
    lines: list[str] = []
    streams = _content_streams(pdf)
    doc_cmap = _document_cmap(streams)
    try:
        pages = structured_pages(pdf)
    except Exception:
        pages = None
    if pages:
        for content, fonts in pages:
            _stream_text(content, fonts, doc_cmap, lines)
    else:
        for s in streams:
            if not _is_cmap_resource(s):
                _stream_text(s, None, doc_cmap, lines)
    return lines
