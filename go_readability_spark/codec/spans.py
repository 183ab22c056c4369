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

from ..kernel.dom import ELEMENT_NODE, TEXT_NODE, Node, parse_html
from ..kernel.regexps import MULTIPLE_WHITESPACES

MEDIA_TAGS = ("img", "video", "audio", "source", "embed", "iframe")

# Quote-aware tag body: '>' is legal inside quoted attribute values
# (<img alt="a>b" src=...>), so a bare [^>]* would split the tag at the
# first '>' and lose its src.  Possessive quantifiers: no backtracking
# on unclosed tags.
_MEDIA_TAG_RE = re.compile(
    r"<(img|video|audio|source|embed|iframe)"
    r"((?:\s(?:[^>\"']++|\"[^\"]*+\"|'[^']*+')*+)?+)/?+>",
    re.IGNORECASE,
)
# comment close per the DOM parser (_markupbase): '--' + optional ws + '>'
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")
_SRC_ATTR_RE = re.compile(
    r"""\bsrc\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
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
    m = _SRC_ATTR_RE.search(tag_text)
    if not m:
        return ""
    return m.group(2) or m.group(3) or m.group(4) or ""


def _comment_ranges(html: str) -> list[tuple[int, int]]:
    """[start, end) of every ``<!--`` comment, using the DOM parser's
    close rule; an unterminated comment swallows the rest of the doc
    (matching the parser, which never emits its content)."""
    out: list[tuple[int, int]] = []
    i = 0
    while True:
        s = html.find("<!--", i)
        if s < 0:
            return out
        m = _COMMENT_CLOSE_RE.search(html, s + 4)
        if m is None:
            out.append((s, len(html)))
            return out
        out.append((s, m.end()))
        i = m.end()


def html_to_spans(html: str) -> list[Span]:
    """Decompose raw HTML into interleaved markup/media spans
    (byte-preserving).  Media tags inside comments stay markup: the DOM
    discards comments, so classifying ``<!-- <img src=x> -->`` as media
    would fabricate a media_ref no parse ever sees."""
    comments = _comment_ranges(html)
    ci = 0
    spans: list[Span] = []
    pos = 0
    offset = 0
    for m in _MEDIA_TAG_RE.finditer(html):
        while ci < len(comments) and comments[ci][1] <= m.start():
            ci += 1
        if ci < len(comments) and comments[ci][0] <= m.start() < comments[ci][1]:
            continue  # commented out — stays part of the markup run
        if m.start() > pos:
            spans.append(Span("markup", html[pos:m.start()], "", offset))
            offset += 1
        tag_text = m.group(0)
        spans.append(Span(m.group(1).lower(), tag_text, _extract_src(tag_text), offset))
        offset += 1
        pos = m.end()
    if pos < len(html):
        spans.append(Span("markup", html[pos:], "", offset))
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
