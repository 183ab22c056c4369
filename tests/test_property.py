"""Property-based tests (SURVEY.md §7 step 6): codec round-trip under
random span permutations, kernel robustness on adversarial inputs, and
the maxElemsToParse guard."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from go_readability_spark.codec.spans import Span, html_to_spans, spans_to_html
from go_readability_spark.kernel.options import Options
from go_readability_spark.kernel.readability import parse_document
from go_readability_spark.spark.extract import extract_one

OPTS = Options(classes_to_preserve=["page", "caption"])


# ------------------------------------------------------------------ codec
@given(st.text(max_size=2000))
@settings(max_examples=80, deadline=None)
def test_codec_roundtrip_arbitrary_text(html):
    assert spans_to_html(html_to_spans(html)) == html


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["markup", "text", "img"]),
            st.text(max_size=50),
        ),
        max_size=30,
    ),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_reassembly_invariant_under_permutation(pieces, rnd):
    """spans_to_html sorts by offset: any storage order reassembles the
    same document (the engine never relies on array order on disk)."""
    spans = [Span(k, t, "", i) for i, (k, t) in enumerate(pieces)]
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    assert spans_to_html(shuffled) == spans_to_html(spans)


@given(st.text(alphabet="<>/ab cp&;=\"'!-", max_size=300))
@settings(max_examples=100, deadline=None, suppress_health_check=[HealthCheck.filter_too_much])
def test_kernel_never_crashes_on_tag_soup(soup):
    result, _art, status = parse_document(soup, "http://x/")
    assert status in ("ok", "no_article", "parse_error")


@pytest.mark.parametrize(
    "probe",
    [
        "",
        "<div><p>deep" * 500,
        "&#xZZ; &#x41; &amp garbage &unknown;",
        "<script>while(1){'</div>'}</script><p>" + "body text. " * 60 + "</p>",
        "﻿<html><body><p>" + "bom text. " * 60 + "</p></body></html>",
    ],
)
def test_kernel_probe_inputs(probe):
    result, _art, status = parse_document(probe, "http://x/")
    assert status in ("ok", "no_article", "parse_error")


# -------------------------------------------------------- too_large guard
def test_max_elems_guard_yields_too_large_row():
    big = "<html><body>" + "<p>word</p>" * 200 + "</body></html>"
    row = extract_one("d1", big, None, Options(max_elems_to_parse=50))
    assert row["status"] == "too_large"
    assert row["spans"] is None
    ok = extract_one("d2", big, None, OPTS)
    assert ok["status"] == "ok"


@given(st.text(alphabet="<>/ab cp&;=\"'!-x", max_size=300))
@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.filter_too_much])
def test_clone_deep_equals_parse(soup):
    """clone_deep(parse(html)) must be indistinguishable from parse(html):
    identical serialization, identical topology link-sets, and fully
    detached from the source tree (the grabArticle retry-restore contract)."""
    from go_readability_spark.kernel.dom import clone_deep, parse_html

    orig = parse_html(soup, "")
    copy = clone_deep(orig)
    assert copy.get_inner_html() == orig.get_inner_html()

    def walk(a, b):
        assert a is not b
        assert a.node_type == b.node_type
        assert a.local_name == b.local_name
        assert a.tag_name == b.tag_name
        assert a.attributes == b.attributes
        assert a.get_text_content() == b.get_text_content()
        assert len(a.child_nodes) == len(b.child_nodes)
        assert len(a.children) == len(b.children)
        for i, (ca, cb) in enumerate(zip(a.child_nodes, b.child_nodes)):
            assert cb.parent_node is b
            assert cb.previous_sibling is (b.child_nodes[i - 1] if i else None)
            walk(ca, cb)

    walk(orig, copy)
