"""Relative->absolute URI conversion with the reference's exact quirks.

Re-derivation of the closure in fixRelativeUris (readability.go:269-341):
the output is NOT a standards-normalized URL -- it is rebuilt by hand with
a lowercased host, a decoded path (except when the input contains '%',
where the raw pre-query/pre-fragment text is substituted), a raw query,
percent-preserving fragments, Windows-drive `/C|/` -> `/C:/` repair, and
trailing `#`/`?` preservation.  Golden outputs depend on each of these.
"""

from __future__ import annotations

from urllib.parse import unquote, urljoin, urlsplit

from .regexps import DOUBLE_FORWARD_SLASHES


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 5.2.4, applied by Go's ResolveReference even to absolute refs."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # Preserve trailing slash semantics for '.'/'..' enders.
    if path.endswith(("/.", "/..")) and output and output[-1] != "":
        output.append("")
    return "/".join(output)


def to_absolute_uri(uri: str, base_uri: str, document_uri: str) -> str:
    uri = uri.strip()
    if not uri:
        return uri
    # Leave hash links alone if the base URI matches the document URI
    # (readability.go:271-274).
    if base_uri == document_uri and uri[0] == "#":
        return uri
    try:
        ref = urlsplit(uri)
        resolved = urlsplit(urljoin(base_uri, uri))
    except ValueError:
        return uri

    path = resolved.path
    # Go's ResolveReference resolvePath-normalizes whenever the ref is
    # absolute OR protocol-relative (ref.Scheme != "" || ref.Host != ""),
    # so //cdn.example.com/a/../img.png must also lose its dot segments.
    if ref.scheme or ref.netloc:
        path = _remove_dot_segments(path)

    out = ""
    if resolved.scheme:
        out += resolved.scheme
        out += "://" if resolved.scheme.startswith("http") else ":"
    host = resolved.netloc.rpartition("@")[2]
    out += host.lower()

    # b = uri up to '?', or up to '#'; a = raw fragment (only when no '?').
    b, a = uri, ""
    if "?" in uri:
        b = uri.split("?", 1)[0]
    elif "#" in uri:
        b, a = uri.split("#", 1)

    opaque = ""
    if resolved.scheme and not resolved.netloc and not path.startswith("/"):
        opaque, path = path, ""

    if path:
        p = unquote(path)
        if "%" in uri:
            if uri.startswith("//"):
                p = DOUBLE_FORWARD_SLASHES.sub("", b)
            else:
                p = b.replace(out, "")
        out += p.replace("/C|/", "/C:/")
    elif opaque:
        out += opaque
    else:
        out += "/"

    if resolved.query:
        out += "?" + resolved.query
    if resolved.fragment:
        if "%" in a:
            out += "#" + a
        else:
            out += "#" + unquote(resolved.fragment)
    if uri.endswith("#") and not out.endswith("#"):
        out += "#"
    if uri.endswith("?") and not out.endswith("?"):
        out += "?"
    return out
