"""Pathological nesting envelope: crawl pages nest thousands of elements
deep, and the Go reference's growable goroutine stack handles that for
free — the kernel must not fail where the reference would extract.
Every per-depth walk in the kernel and codec is iterative; this pins it
(a regression to recursion fails here with RecursionError → parse_error
long before Python's default limit meets a real crawl page).
"""

from go_readability_spark.codec.spans import html_to_spans, spans_to_html
from go_readability_spark.kernel.options import Options
from go_readability_spark.kernel.readability import parse_document
from go_readability_spark.kernel.readerable import is_probably_readerable

DEPTH = 3000


def _deep_doc(depth: int = DEPTH) -> str:
    return (
        "<html><body><article>"
        + "<div>" * depth
        + "<p>" + ("word " * 120) + "</p>"
        + "</div>" * depth
        + "<p>" + ("more text here. " * 60) + "</p></article></body></html>"
    )


def test_deep_nesting_extracts():
    res, art, status = parse_document(_deep_doc(), "http://x/", Options())
    assert status == "ok"
    assert res is not None and res.length > 500


def test_deep_nesting_retry_path():
    # short text forces the retry sieve (pristine clone + re-grab) on the
    # deep tree — the other depth-sensitive kernel path
    depth = DEPTH
    html = (
        "<html><body>" + "<div>" * depth + "<p>tiny</p>" + "</div>" * depth
        + "</body></html>"
    )
    _, _, status = parse_document(html, "http://x/", Options())
    assert status in ("ok", "no_article")  # anything but parse_error


def test_deep_nesting_readerable_and_codec():
    html = _deep_doc()
    assert is_probably_readerable(html) is True
    assert spans_to_html(html_to_spans(html)) == html


def test_deep_nesting_predicate_shapes():
    """Shapes that drive each formerly-recursive predicate to full depth:
    phrasing chains (_has_child_block_element / _is_phrasing_content via
    div->p conversion), A/DEL chains (_is_phrasing_content's recursive
    arm), a single-child chain inside noscript (_is_single_image), and a
    classed chain through postProcess (_clean_classes)."""
    tail = "<p>" + ("more text here. " * 60) + "</p>"
    d = DEPTH
    shapes = {
        "span": "<html><body><div>" + "<span>" * d + "word" + "</span>" * d
                + tail + "</div></body></html>",
        "a": "<html><body><div>" + "<a>" * d + "x" + "</a>" * d
             + tail + "</div></body></html>",
        "del": "<html><body><div>" + "<del>" * d + "x" + "</del>" * d
               + tail + "</div></body></html>",
        "noscript": "<html><body><p>t</p><img src=a.png><noscript>"
                    + "<div>" * d + "<img src='b.png'>" + "</div>" * d
                    + "</noscript>" + tail + "</body></html>",
        "classed": "<html><body><article>" + '<div class="page x">' * d
                   + "<p>" + ("word " * 120) + "</p>" + "</div>" * d
                   + tail + "</article></body></html>",
    }
    for tag, html in shapes.items():
        _, _, status = parse_document(
            html, "http://x/", Options(classes_to_preserve=("page",))
        )
        assert status == "ok", tag
