"""URL canonicalization and absolutization.

Mirrors the behavior of the reference's URL handling (rust `url` crate):

- parse/normalize: lowercase scheme+host, elide default ports, empty path
  becomes "/", dot segments removed (reference: `url::Url::parse`, used for
  identity in the seen set — /root/reference/src/workload.rs:28);
- absolutize: absolute URLs pass through, scheme-less hrefs join against
  the base page URL, unparseable hrefs are dropped
  (reference: make_absolute_url, /root/reference/src/engine.rs:59-68).

Only http/https URLs are considered fetchable here (the synthetic corpus
emits nothing else).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 (the rust url crate applies this on parse)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize(url: str) -> str | None:
    """Normalize an absolute http(s) URL; None if unparseable."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(parts.path) if parts.path else "/"
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        p = urlsplit(url).path
    except ValueError:
        return "/"
    return p or "/"


def make_absolute(base: str, href: str) -> str | None:
    """Reference semantics (engine.rs:59-68): absolute parse first; a
    scheme-less href joins against the base; anything else drops."""
    href = href.strip()
    if not href:
        return None
    try:
        parts = urlsplit(href)
    except ValueError:
        return None
    if parts.scheme:
        # absolute (or unsupported scheme / broken host → drop)
        return canonicalize(href)
    try:
        return canonicalize(urljoin(base, href))
    except ValueError:
        return None
