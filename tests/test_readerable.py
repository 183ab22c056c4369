"""Readerable pre-check unit tests (reference readerable.go:33-103).

Go ``len(string)`` counts UTF-8 BYTES, so the 140-char minimum-content
threshold (readerable.go:94) is a byte threshold — non-ASCII text crosses
it earlier than its code-point count suggests.  These cases sit inside the
byte/rune divergence window to pin that semantic.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_readability_spark.kernel.readerable import is_probably_readerable


def _page(body: str) -> str:
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def test_non_ascii_single_paragraph_counts_bytes():
    # 300 runes of 'é' = 600 UTF-8 bytes: sqrt(600-140) ≈ 21.4 > minScore 20
    # under byte counting; sqrt(300-140) ≈ 12.6 under rune counting.
    assert is_probably_readerable(_page(f"<p>{'é' * 300}</p>")) is True


def test_non_ascii_paragraphs_below_rune_threshold_still_count():
    # Each paragraph is 80 runes (<140) but 160 bytes (≥140): rune counting
    # would skip every one (length below minimum); byte counting accumulates
    # sqrt(160-140) ≈ 4.47 per paragraph → crosses minScore 20 at the 5th.
    body = "".join(f"<p>{'é' * 80}</p>" for _ in range(6))
    assert is_probably_readerable(_page(body)) is True


def test_non_ascii_below_byte_threshold_not_counted():
    # 60 runes = 120 bytes < 140: under the minimum either way.
    body = "".join(f"<p>{'é' * 60}</p>" for _ in range(6))
    assert is_probably_readerable(_page(body)) is False


def test_ascii_semantics_unchanged():
    assert is_probably_readerable(_page(f"<p>{'a' * 600}</p>")) is True
    assert is_probably_readerable(_page(f"<p>{'a' * 100}</p>")) is False


def test_entities_count_decoded_bytes_near_threshold():
    """x/net/html decodes the full HTML5 entity table before the byte
    count (readerable.go:94): ten &nbsp; are 20 bytes, not 60 — a padded
    short paragraph must not cross min_content_length."""
    from go_readability_spark.kernel.readerable import is_probably_readerable

    pad = "&nbsp;" * 10
    # 118 + 10×2 = 138 decoded bytes (< 140); raw spelling would be 178
    short = "<html><body><p>" + "x" * 118 + pad + "</p></body></html>"
    assert not is_probably_readerable(short)
    # the same pattern with enough real text still qualifies
    long = ("<html><body>" + ("<p>" + "y z " * 60 + pad + "</p>") * 4
            + "</body></html>")
    assert is_probably_readerable(long)
