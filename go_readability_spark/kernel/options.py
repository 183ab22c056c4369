"""Extraction options + result record (reference: options.go:9-40, readability.go:130-151)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Callable, Optional

from .regexps import VIDEOS

if TYPE_CHECKING:  # pragma: no cover - import cycle guard (dom imports options-free)
    from .dom import Node

# Flag bitmask driving the retry sieve (readability.go:37-39).
FLAG_STRIP_UNLIKELYS = 0x1
FLAG_WEIGHT_CLASSES = 0x2
FLAG_CLEAN_CONDITIONALLY = 0x4

DEFAULT_MAX_ELEMS_TO_PARSE = 0
DEFAULT_N_TOP_CANDIDATES = 5
DEFAULT_CHAR_THRESHOLD = 500

# Classes readability itself sets (readability.go:76).
CLASSES_TO_PRESERVE = ("page",)


@dataclass
class Options:
    max_elems_to_parse: int = DEFAULT_MAX_ELEMS_TO_PARSE
    nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES
    char_threshold: int = DEFAULT_CHAR_THRESHOLD
    classes_to_preserve: list[str] = field(default_factory=lambda: list(CLASSES_TO_PRESERVE))
    keep_classes: bool = False
    disable_jsonld: bool = False
    allowed_video_regex: re.Pattern = VIDEOS
    min_content_length: int = 140
    min_score: float = 20.0
    # Pluggable hooks (options.go:14-22, defaults options.go:26-40):
    # serializer: article Node → HTML string; None = Node.get_inner_html()
    # (the reference default, options.go:33-35).
    serializer: Optional[Callable[["Node"], str]] = None
    # html2text: HTML string → text content; None = article
    # GetTextContent (readability.go:2222-2226).
    html2text: Optional[Callable[[str], str]] = None
    # visibility_checker: Node → bool, consulted by is_probably_readerable
    # (readerable.go:80); None = the built-in isNodeVisible equivalent.
    visibility_checker: Optional[Callable[["Node"], bool]] = None


@dataclass
class Result:
    """One output row per document (readability.go:130-151)."""

    title: str = ""
    html_content: str = ""
    text_content: str = ""
    length: int = 0
    excerpt: str = ""
    byline: str = ""
    dir: str = ""
    site_name: str = ""
    lang: str = ""
    published_time: str = ""
