"""Extended differential fuzz over the input codec and fast-path tokenizer.

Reuses the two strongest invariants in the suite, at open-ended volume:

* fast-scan equivalence: ``_fast_scan`` must build the exact tree the
  stock ``html.parser`` feed path builds, or abort to it
  (tests/test_fastscan.py::_assert_equivalent);
* codec soundness: ``html_to_spans`` must byte-preserve on re-serialize
  and its media spans must equal the DOM parse's media-element sequence
  (tests/test_codec.py::_assert_media_subseq).

Inputs: random fragment soup over an adversarial alphabet plus mutated
slices of the real golden pages.  Usage::

    python tools/fuzz_differential.py [seconds=600] [seed=20260818]

Prints ``N cases, F failures`` and any failing input.  The r4 closing
session ran 5,461,164 cases with 0 failures (~15 min).
"""

from __future__ import annotations

import glob
import importlib.util
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FRAGS = [
    "<img src=a.png>", '<img src="b>c.png">', "<p title=\"<img src=e.png>\">",
    "<!-- <img src=f.png> -->", "<![CDATA[<img src=g.png>]]>", "<style>", "</style>",
    "<title>", "</title>", "<script>", "</script>", "<textarea>", "</textarea>",
    "<xmp>", "</xmp>", "<iframe>", "</iframe>", "<noembed>", "</noembed>",
    "<?pi <img src=h.png> ?>", "</p onx=\"<img src=i.png>\">", "text ", "<", ">",
    '"', "'", "=", "/", "!", "-", "--", "<!--", "-->", "<!", "<![if x]>", "<![endif]>",
    "<!doctype html>", "<div a=\"1\"b=\"2\">", "<img src=o.png src>", "<img src==p.png>",
    '<img altsrc/=a&amp;b=">', "<!--unterminated <img src=q.png>", '<p a="bx> ',
    "<a0:img src=ns.png>", "src=", ",", "&amp;", "&#x2713;", "&bogus;", "&#65;",
    "<video src='k.mp4'>", "<audio src=s.ogg>", "<source srcset='x 2x'>",
    "<picture>", "</picture>", "<figure>", "</figure>", "<embed src=e.swf>",
    "<br/>", "<br />", "<hr/>", "<div =bare>", "<a b==c>", "<a b=>", "<div/ >",
    "<span attr = \"v\" >", "<div a='1' a='2'>", "über ✓ 漢字 ", "\x00", "\r\n", "\t",
    "<p CLASS=UPPER>", "</P>", "<DIV>", "</DIV>", "<ns:tag>", "</ns:tag>",
    "<my-tag x=1>", "</my-tag>", "<noscript>", "</noscript>", "<a href=/rel>",
    "<a href=\"?a=1&amp;b=2\">", "<meta charset=utf-8/>", "<link rel=icon>",
    "<base href=http://x/>", "<input value='<img src=v.png>'>", "]]>", "?>",
    "<p data-x=\"unterminated", "<td colspan=2>", "<table>", "</table>",
    # r4 ADVICE recall classes, kept in the alphabet so long runs keep
    # exploring them (pinned cases: tests/test_codec.py CDATA-comment and
    # quote-in-bare-value): comment markers inside raw-text content, and
    # quote characters inside unquoted attribute values
    "<style>/* <!-- */</style>", "<!--\"<video></video>", "<![CDATA[ x <p></p>",
    "<img alt=it's src=l.png>", "<img alt=he\"said src=m.png>",
    "<script><!-- '</script>' --></script>", "<style><!--", "<a b=c'd>",
    "<img alt=\"x src=bare'quote.png>",
]

# structural wrappers: embed ANY generated soup inside a comment, CDATA
# section, raw-text element, or an unquoted attribute value — the two r4
# recall classes generalized to generators rather than fixed strings
_RAW_TEXT_TAGS = ["style", "script", "title", "textarea", "xmp", "iframe"]


def _wrap(rng: random.Random, s: str) -> str:
    mode = rng.randrange(5)
    if mode == 0:
        return f"<!--{s}-->"
    if mode == 1:
        return f"<![CDATA[{s}]]>"
    if mode == 2:
        t = rng.choice(_RAW_TEXT_TAGS)
        return f"<{t}>{s}</{t}>"
    if mode == 3:  # quote-in-bare-value: soup becomes an unquoted attr value
        payload = s.replace(" ", "").replace(">", "")[:40] or "x'y"
        return f"<img alt={payload} src=wrapped.png>"
    return f"<!--{s}"  # unterminated comment swallowing the soup


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260818

    fs = _load("_fuzz_fastscan", os.path.join(REPO, "tests", "test_fastscan.py"))
    tc = _load("_fuzz_codec", os.path.join(REPO, "tests", "test_codec.py"))

    pages = []
    for d in sorted(glob.glob("/root/reference/testdata/test-pages/*"))[:25]:
        src = os.path.join(d, "source.html")
        if os.path.exists(src):
            pages.append(open(src, encoding="utf-8", errors="replace").read())

    rng = random.Random(seed)
    deadline = time.time() + seconds
    n = fails = 0
    while time.time() < deadline:
        n += 1
        mode = rng.random()
        if mode < 0.6 or not pages:
            s = "".join(rng.choice(FRAGS) for _ in range(rng.randint(0, 14)))
        elif mode < 0.85:
            p = rng.choice(pages)
            a = rng.randrange(0, max(1, len(p) - 400))
            s = p[a : a + rng.randint(10, 400)]
            if rng.random() < 0.5:
                s += rng.choice(FRAGS)
        else:
            # big slices keep enough real document structure (doctype +
            # <html> roots, raw-text elements with their closers) to reach
            # tree-level interactions the 400-char windows miss — this mode
            # found the root-cleanup false-failure class the smaller modes
            # ran 11M cases without touching
            p = rng.choice(pages)
            a = rng.randrange(0, max(1, len(p) - 2500))
            s = p[a : a + rng.randint(500, 2500)]
            if rng.random() < 0.4 and s:
                i = rng.randrange(len(s))
                s = s[:i] + rng.choice(FRAGS) + s[i:]
        if rng.random() < 0.2 and s:
            i = rng.randrange(len(s))
            s = s[:i] + rng.choice("<>\"'=&;!-/ ") + s[i:]
        if rng.random() < 0.12:
            s = _wrap(rng, s) + (rng.choice(FRAGS) if rng.random() < 0.5 else "")
        for check in (fs._assert_equivalent, tc._assert_media_subseq):
            try:
                check(s)
            except AssertionError as e:
                fails += 1
                print("FAIL:", repr(s[:200]))
                print(e)
        if fails >= 5:
            break
    print(f"{n} cases, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
