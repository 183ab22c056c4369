"""Span codec: the interleaved text+media document representation.

The engine's corpus tables store each document as an ordered
``array<struct<kind, text, media_ref, offset>>`` (BASELINE.json
``input_hint``).  Two codecs live here:

**Input codec** (``html_to_spans`` / ``spans_to_html``): byte-preserving
decomposition of raw HTML.  Media-anchor opening tags (img / video / audio /
source / embed / iframe -- the media set the reference rewrites,
readability.go:376-378 plus the embed tags it allowlists,
readability.go:1769-1790) become media spans carrying their ``src`` as
``media_ref``; everything between is ``markup`` spans.  Concatenating span
text in offset order reproduces the original HTML byte-for-byte
(round-trip property, FIXTURES.md section 1).

**Output codec** (``dom_to_spans``): normalized document-order walk of a
final article DOM, emitting open/close markup spans with *sorted* attribute
serialization, whitespace-collapsed non-empty text spans, and media spans
anchored at their surviving DOM positions with absolutized ``media_ref``.
Span-sequence equality ``(kind, text, media_ref, order)`` over this encoding
subsumes the reference test's DOM comparison (readability_test.go:115-160:
node descriptor + attribute set + collapsed text, empty text skipped).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..kernel.dom import (
    CDATA_CONTENT_ELEMENTS,
    ELEMENT_NODE,
    TEXT_NODE,
    Node,
    parse_html,
)
from ..kernel.regexps import MULTIPLE_WHITESPACES

MEDIA_TAGS = ("img", "video", "audio", "source", "embed", "iframe")

# Quote-aware tag body: '>' is legal inside quoted attribute values
# (<img alt="a>b" src=...>), so a bare [^>]* would split the tag at the
# first '>' and lose its src — but quoted values only open after '=',
# so a bare value may CONTAIN quote chars (<img alt=it's src=x.png>,
# which html.parser accepts as [^>\s]* — ADVICE r3).  Attr-name runs
# exclude '/' like attrfind_tolerant's name class, so a trailing '/'
# reaches the self-closing capture group instead of being eaten as a
# name char.  Possessive quantifiers: no backtracking on unclosed tags.
_TAG_BODY = (
    r"(?:\s(?:[^>\s=/\"']++"    # attr-name run (no '=' '/' quotes ws)
    r"|=\s*+\"[^\"]*+\""        # ="quoted" ('>' legal inside)
    r"|=\s*+'[^']*+'"           # ='quoted'
    r"|=\s*+(?![\"'])[^>\s]*+"  # =bare — may contain quotes and '/'
    r"|/(?!>)"                  # stray-slash separator between attrs
    r"|[\"'\s])*+)?+"           # stray quote / whitespace
)
_MEDIA_TAG_RE = re.compile(
    r"<(img|video|audio|source|embed|iframe)(" + _TAG_BODY + r")(/?+)>",
    re.IGNORECASE,
)
# raw-text (CDATA) element opening tags: these park the DOM parser in
# cdata mode (kernel/dom.py set_cdata_mode), making their CONTENT plain
# text — group(3) distinguishes <style/> (startendtag: no cdata mode)
_CDATA_OPEN_RE = re.compile(
    r"<(" + "|".join(CDATA_CONTENT_ELEMENTS) + r")(" + _TAG_BODY + r")(/?+)>",
    re.IGNORECASE,
)
# identical to the DOM parser's set_cdata_mode close pattern
_CDATA_CLOSE_RES = {
    elem: re.compile(rf"</\s*{elem}\s*>", re.IGNORECASE)
    for elem in CDATA_CONTENT_ELEMENTS
}
# comment close per the DOM parser (_markupbase): '--' + optional ws + '>'
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")
# attr tokenizer for src extraction: left-to-right name[=value] pairs, so
# 'src=' TEXT inside an earlier quoted value (<img alt="src=evil"
# src=real>) is consumed as that value, never misread as the attribute
_ATTR_SCAN_RE = re.compile(
    r"([^\s=/>]++)"
    r"(?:\s*+=\s*+(\"[^\"]*+\"|'[^']*+'|(?![\"'])[^>\s]*+))?+"
)


@dataclass(frozen=True)
class Span:
    kind: str
    text: str
    media_ref: str
    offset: int

    def as_tuple(self) -> tuple[str, str, str, int]:
        return (self.kind, self.text, self.media_ref, self.offset)

    def as_row(self) -> dict:
        return {
            "kind": self.kind,
            "text": self.text,
            "media_ref": self.media_ref,
            "offset": self.offset,
        }


def _extract_src(tag_text: str) -> str:
    """The tag's ``src`` value as the DOM parser would store it: attrs
    tokenized left-to-right (a quoted value containing ``src=`` text is
    that value, not the attribute), the LAST src value winning on
    duplicates (set_attribute is first-position last-value-wins,
    domparser.go:762-770), entities unescaped like handle_starttag's
    attr decode."""
    src = ""
    for m in _ATTR_SCAN_RE.finditer(tag_text):
        if m.group(1).lower() == "src" and m.group(2) is not None:
            v = m.group(2)
            src = v[1:-1] if v[:1] in "\"'" else v
    if "&" in src:
        from html import unescape

        src = unescape(src)
    return src


# marked-section closers, identical to _markupbase.parse_marked_section:
# ]]> for CDATA-family sections, ]> for MS conditionals (if/else/endif)
_MARKED_CLOSE_RE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE_RE = re.compile(r"]\s*>")
_DECLNAME_MATCH = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*").match
_ASCII_WS = " \t\n\r\f"


# run of chars that are neither a tag close nor a quote — lets _tag_end
# advance at C speed instead of per-char Python
_TAG_CHUNK_RE = re.compile(r"[^>\"']*")


def _tag_end(html: str, j: int) -> int | None:
    """End index (exclusive) of the tag starting at ``j``, with
    html.parser's tolerant quote rule (locatestarttagend_tolerant):
    quoted attribute values — and only values, i.e. quotes that follow
    ``=`` plus optional whitespace — may contain ``>``.  None when the
    tag never closes (the parser parks waiting for more data and the
    tail is never tokenized)."""
    i, n = j + 1, len(html)
    while i < n:
        i = _TAG_CHUNK_RE.match(html, i).end()
        if i >= n:
            return None
        ch = html[i]
        if ch == ">":
            return i + 1
        # quote: opens a value only when it follows '=' (+ optional ws)
        k = i - 1
        while k > j and html[k] in _ASCII_WS:
            k -= 1
        if html[k] == "=":
            close = html.find(ch, i + 1)
            if close < 0:
                return None  # unterminated quoted value
            i = close + 1
        else:
            i += 1
    return None


def html_to_spans(html: str) -> list[Span]:
    """Decompose raw HTML into interleaved markup/media spans
    (byte-preserving) via a forward CONSTRUCT walk mirroring the DOM
    tokenizer: a media tag becomes a media span only where the parser
    would actually emit a start-tag token.  Media-looking text inside a
    comment, raw-text (CDATA) element content, a marked section
    (``<![CDATA[…]]>``), a processing instruction, a declaration, an end
    tag's extent, or ANOTHER TAG'S quoted attribute value
    (``<p title="<img src=x>">``) stays markup — the DOM never sees an
    element there, so classifying it would fabricate a media_ref no
    parse ever emits (ADVICE r3/r4 class).  Raw-text content inside
    ``<script>`` IS tokenized (the reference opts script out of raw-text
    mode, domparser.go:1102-1104), so media tags there classify —
    matching the DOM's own quirk."""
    spans: list[Span] = []
    out_pos = 0
    offset = 0

    def emit_markup(upto: int) -> None:
        nonlocal out_pos, offset
        if upto > out_pos:
            spans.append(Span("markup", html[out_pos:upto], "", offset))
            offset += 1
            out_pos = upto

    def skip_cdata_content(elem: str, from_i: int) -> int:
        em = _CDATA_CLOSE_RES[elem].search(html, from_i)
        # unterminated raw text swallows the tail (goahead parks in
        # cdata mode and never emits it)
        return em.end() if em else len(html)

    i, n = 0, len(html)
    while i < n:
        j = html.find("<", i)
        if j < 0:
            break
        c = html[j + 1 : j + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            mm = _MEDIA_TAG_RE.match(html, j)
            if mm is not None:
                emit_markup(j)
                tag_text = mm.group(0)
                kind = mm.group(1).lower()
                spans.append(Span(kind, tag_text, _extract_src(tag_text), offset))
                offset += 1
                out_pos = i = mm.end()
                if kind in _CDATA_CLOSE_RES and not mm.group(3):
                    i = skip_cdata_content(kind, i)  # iframe raw text
                continue
            cm = _CDATA_OPEN_RE.match(html, j)
            if cm is not None and not cm.group(3):
                i = skip_cdata_content(cm.group(1).lower(), cm.end())
                continue
            e = _tag_end(html, j)
            if e is None:
                break  # truncated tag: the tail is data, no more tokens
            i = e
        elif c == "/":
            # endtagfind or the bogus-comment fallback: both end at '>'
            g = html.find(">", j)
            i = g + 1 if g >= 0 else n
        elif c == "!":
            if html.startswith("<!--", j):
                cmm = _COMMENT_CLOSE_RE.search(html, j + 4)
                if cmm is None:
                    break  # unterminated comment swallows the tail
                i = cmm.end()
            elif html.startswith("<![", j):
                # _markupbase.parse_marked_section: content is
                # unknown_decl, never elements; the closer depends on the
                # section name (MS conditionals close at ]>, the rest at
                # ]]>; a nameless <![ is a stock-parser parse error —
                # coarse ]]> extent is fine for classification there)
                nm = _DECLNAME_MATCH(html, j + 3)
                sect = nm.group().strip().lower() if nm else ""
                closer = (
                    _MS_MARKED_CLOSE_RE
                    if sect in ("if", "else", "endif")
                    else _MARKED_CLOSE_RE
                )
                m = closer.search(html, j + 3)
                if m is None:
                    break
                i = m.end()
            else:
                # doctype / bogus declaration: to the next '>'
                g = html.find(">", j)
                i = g + 1 if g >= 0 else n
        elif c == "?":
            g = html.find(">", j)  # parse_pi ends at '>'
            i = g + 1 if g >= 0 else n
        else:
            i = j + 1  # literal '<' data
    emit_markup(n)
    return spans


def spans_to_html(spans: list[Span]) -> str:
    """Reassemble a document from ordered spans (inverse of html_to_spans)."""
    return "".join(s.text for s in sorted(spans, key=lambda s: s.offset))


def rows_to_html(rows) -> str:
    """Same as spans_to_html but over plain dict/Row-like records."""
    ordered = sorted(rows, key=lambda r: r["offset"] if isinstance(r, dict) else r.offset)
    return "".join((r["text"] if isinstance(r, dict) else r.text) or "" for r in ordered)


def _open_tag_repr(n: Node) -> str:
    attrs = sorted((name, value) for name, value in n.attributes)
    inner = "".join(f' {name}="{value}"' for name, value in attrs)
    return f"<{n.local_name}{inner}>"


def dom_to_spans(container: Node) -> list[Span]:
    """Normalized output-span encoding of a (sub)tree's children.

    Normalization matches the reference test harness: whitespace collapsed
    (htmlTransform, readability_test.go:281-283), whitespace-only text nodes
    skipped (readability_test.go:252-258), attribute *sets* compared
    (readability_test.go:134-151) via sorted serialization.
    """
    spans: list[Span] = []
    offset = 0

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        nonlocal offset
        spans.append(Span(kind, text, media_ref, offset))
        offset += 1

    stack: list[object] = list(reversed(container.child_nodes))
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            emit("markup", item)
            continue
        n = item
        if n.node_type == TEXT_NODE:
            text = MULTIPLE_WHITESPACES.sub(" ", n.get_text_content()).strip()
            if text:
                emit("text", text)
        elif n.node_type == ELEMENT_NODE:
            if n.local_name in MEDIA_TAGS:
                emit(n.local_name, _open_tag_repr(n), n.get_attribute("src"))
            else:
                emit("markup", _open_tag_repr(n))
            if n.child_nodes:
                stack.append(f"</{n.local_name}>")
                stack.extend(reversed(n.child_nodes))
            elif n.local_name not in MEDIA_TAGS:
                emit("markup", f"</{n.local_name}>")
    return spans


def html_fragment_to_normalized_spans(html: str) -> list[Span]:
    """Parse an HTML fragment with the kernel DOM and emit normalized spans.

    Used for both sides of the golden comparison: the engine's serialized
    article and the fixture's expected.html go through the same parser and
    the same normalization, mirroring how the reference re-parses both sides
    before comparing (readability_test.go:113-114).
    """
    return dom_to_spans(parse_html(html, ""))
