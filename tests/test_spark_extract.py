"""Spark-level extraction tests: the mapInPandas operator must reproduce the
pure-Python kernel's golden results through the full codec round-trip
(FIXTURES.md §2: span-sequence equality (kind, text, media_ref, order))."""

import os

import pytest

from go_readability_spark.codec.spans import html_fragment_to_normalized_spans
from go_readability_spark.spark.corpus import FIXTURES_DIR, fixture_documents
from go_readability_spark.spark.extract import (
    extract_articles,
    route_and_extract,
    with_doc_bytes,
    with_doc_stats,
)

# A diverse probe subset (full 119-fixture parity is covered Spark-free by
# test_golden.py; here we verify the Spark boundary preserves it).
PROBE_FIXTURES = [
    "001",
    "base-url",
    "keep-images",
    "lazy-image-1",
    "embedded-videos",
    "rtl-1",
    "qq",
    "replace-brs",
    "remove-script-tags",
    "nytimes-1",
    "svg-parsing",
    "social-buttons",
]


@pytest.fixture(scope="module")
def fixture_articles(spark):
    docs = fixture_documents(spark)
    docs = docs.filter(docs.doc_id.isin(PROBE_FIXTURES))
    return {r.doc_id: r for r in extract_articles(docs).collect()}


def _expected_spans(name):
    with open(
        os.path.join(FIXTURES_DIR, name, "expected.html"), encoding="utf-8"
    ) as f:
        return [s.as_tuple() for s in html_fragment_to_normalized_spans(f.read())]


@pytest.mark.parametrize("name", PROBE_FIXTURES)
def test_span_equality_through_spark(fixture_articles, name):
    row = fixture_articles[name]
    assert row.status == "ok"
    got = [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans]
    assert got == _expected_spans(name)


def test_all_probe_statuses_ok(fixture_articles):
    assert all(r.status == "ok" for r in fixture_articles.values())


def test_media_refs_absolutized(fixture_articles):
    imgs = [
        s for s in fixture_articles["keep-images"].spans if s.kind == "img"
    ]
    assert imgs and all(s.media_ref.startswith("http") for s in imgs)


def test_emit_chunking_preserves_rows(spark):
    docs = fixture_documents(spark).limit(10)
    small = extract_articles(docs, emit_every=1).count()
    big = extract_articles(docs, emit_every=1000).count()
    assert small == big == 10


def test_with_doc_bytes_matches_python(spark):
    docs = fixture_documents(spark).limit(5)
    rows = with_doc_bytes(docs).collect()
    for r in rows:
        assert r.doc_bytes == sum(len(s.text or "") for s in r.spans)


def test_route_and_extract_covers_both_branches(spark):
    docs = fixture_documents(spark).limit(20)
    # threshold small enough that some fixtures route through the mega branch
    out = route_and_extract(docs, mega_doc_bytes=50_000, num_partitions=4)
    rows = out.collect()
    assert len(rows) == 20
    assert {r.doc_id for r in rows} == {r.doc_id for r in docs.select("doc_id").collect()}


def test_with_doc_stats_matches_python(spark):
    docs = fixture_documents(spark).limit(5)
    for r in with_doc_stats(docs).collect():
        assert r.doc_bytes == sum(len(s.text or "") for s in r.spans)
        assert r.doc_tags == sum((s.text or "").count("<") for s in r.spans)


def test_partial_doc_stats_are_reused_not_recomputed(spark):
    """A caller that pre-materialized only doc_bytes (the pre-density
    contract) must keep that column — route_and_extract computes only the
    missing doc_tags, so the fused two-stat aggregate (named_struct) never
    appears in the plan and results are unchanged."""
    docs = fixture_documents(spark).limit(6)
    base = {r.doc_id: (r.status, r.length) for r in route_and_extract(docs).collect()}
    pre = with_doc_bytes(docs)
    routed_df = route_and_extract(pre, mega_doc_bytes=50_000)
    plan = routed_df._jdf.queryExecution().executedPlan().toString()
    assert "named_struct" not in plan  # fused recompute path not taken
    routed = {r.doc_id: (r.status, r.length) for r in routed_df.collect()}
    assert routed == base


def test_dense_doc_routes_through_density_arm(spark):
    """A small-bytes, element-dense doc must take the mega route (kernel
    memory scales with node count, not bytes) and still extract exactly:
    with mega_doc_tags low enough, the dense doc is the ONLY row in the
    mega branch and the result set is unchanged."""
    docs = fixture_documents(spark).limit(6)
    base = {r.doc_id: (r.status, r.length) for r in route_and_extract(docs).collect()}
    routed = {
        r.doc_id: (r.status, r.length)
        for r in route_and_extract(docs, mega_doc_tags=500).collect()
    }
    assert routed == base  # density routing changes placement, never results


def test_malformed_spans_become_error_rows(spark):
    from go_readability_spark.spark.schema import DOCUMENTS_SCHEMA

    docs = spark.createDataFrame(
        [
            {"doc_id": "empty", "uri": None, "spans": []},
            {
                "doc_id": "just-text",
                "uri": None,
                "spans": [
                    {"kind": "markup", "text": "<p>hi</p>", "media_ref": "", "offset": 0}
                ],
            },
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    rows = {r.doc_id: r for r in extract_articles(docs).collect()}
    assert rows["empty"].status in ("no_article", "parse_error")
    # a tiny page has no article content → kernel's retry sieve gives best
    # attempt or no_article; both are data, not task failures
    assert rows["just-text"].status in ("ok", "no_article")


def test_null_and_garbage_spans_degrade_gracefully(spark):
    """Corruption shapes real 100 TB tables produce: null spans array,
    null text inside a span, negative/duplicate offsets, null doc_id text.
    All must yield status rows, never task failures."""
    from go_readability_spark.spark.extract import extract_articles
    from go_readability_spark.spark.schema import DOCUMENTS_SCHEMA

    docs = spark.createDataFrame(
        [
            {"doc_id": "null-spans", "uri": None, "spans": None},
            {
                "doc_id": "null-text-span",
                "uri": None,
                "spans": [
                    {"kind": "text", "text": None, "media_ref": None, "offset": 0},
                    {"kind": "text", "text": "<p>ok</p>", "media_ref": "", "offset": 1},
                ],
            },
            {
                "doc_id": "negative-offsets",
                "uri": None,
                "spans": [
                    {"kind": "text", "text": "<p>b</p>", "media_ref": "", "offset": -1},
                    {"kind": "text", "text": "<p>a</p>", "media_ref": "", "offset": -2},
                ],
            },
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    rows = {r.doc_id: r for r in extract_articles(docs).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.status in ("ok", "no_article", "parse_error")


def test_prescreen_gates_through_readerable(spark):
    """The reference's check-before-parse workflow through the Spark
    surface: with prescreen=True, every document the kernel's
    IsProbablyReaderable rejects lands as a status='not_readerable' row
    (no grab-loop output), and every readerable document extracts
    IDENTICALLY to the ungated path."""
    import os

    from go_readability_spark.codec.spans import spans_to_html, Span
    from go_readability_spark.kernel.options import Options
    from go_readability_spark.kernel.readerable import is_probably_readerable

    from pyspark.sql import functions as F

    # include the four known non-readerable fixtures plus a readerable slice
    non_readerable = ("js-link-replacement", "lazy-image-3", "mozilla-2",
                      "remove-aria-hidden")
    docs = fixture_documents(spark).filter(
        F.col("doc_id").isin(*non_readerable) | F.col("doc_id").startswith("0")
    )
    opts = Options(classes_to_preserve=["page", "caption"])
    gated = {r.doc_id: r for r in extract_articles(docs, opts, prescreen=True).collect()}
    plain = {r.doc_id: r for r in extract_articles(docs, opts).collect()}
    assert set(gated) == set(plain)
    n_skipped = 0
    for name, row in gated.items():
        src = open(
            os.path.join(FIXTURES_DIR, name, "source.html"), encoding="utf-8"
        ).read()
        truth = is_probably_readerable(src, opts)
        if truth:
            assert row.status == plain[name].status, name
            assert row.text_content == plain[name].text_content, name
            assert row.title == plain[name].title, name
        else:
            n_skipped += 1
            assert row.status == "not_readerable", name
            assert row.spans is None and row.text_content is None, name
    # the golden corpus contains deliberately non-readerable fixtures, so
    # the gate must actually fire
    assert n_skipped > 0
