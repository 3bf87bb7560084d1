"""Real-web fetch backend — STUB with real Ray-side plumbing.

This container has no network, so the HTTP/WebDriver backend of the
reference (engine_builder.rs:76-136, backend.rs:84-111) is represented
by a class with the exact same batch contract as
``doonop_ray.stages.fetch.Fetcher`` (in: url/attempt/depth Arrow batch;
out: url/depth/status/data/links/image_id/latency_ms) whose transport
raises NotImplementedError. Swap ``_transport`` for an HTTP client or a
WebDriver session to crawl the live web; everything downstream
(validator, router, frontier, checkpoints) is transport-agnostic.

Proxy configuration mirrors the reference's proxy string format
(cfg.rs:300-328): ``"sock;address=HOST:PORT;version=5"`` or
``"http;address=HOST:PORT"``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..filters import FilterSpec


@dataclass
class ProxyConfig:
    """Parsed proxy spec (reference M9, cfg.rs:300-328)."""

    kind: str  # "sock" | "http"
    address: str
    version: int | None = None  # SOCKS version (4/5); None for http


def parse_proxy(spec: str) -> ProxyConfig:
    """Parse ``kind;key=value;...`` proxy strings.

    >>> parse_proxy("sock;address=127.0.0.1:9050;version=5")
    ProxyConfig(kind='sock', address='127.0.0.1:9050', version=5)
    """
    parts = [p.strip() for p in spec.split(";") if p.strip()]
    if not parts:
        raise ValueError("empty proxy spec")
    kind = parts[0].lower()
    if kind not in ("sock", "http"):
        raise ValueError(f"unknown proxy kind {kind!r}")
    kv = {}
    for p in parts[1:]:
        k, _, v = p.partition("=")
        kv[k.strip().lower()] = v.strip()
    if "address" not in kv:
        raise ValueError("proxy spec missing address=")
    version = None
    if kind == "sock":
        version = int(kv.get("version", "5"))
        if version not in (4, 5):
            raise ValueError(f"unsupported SOCKS version {version}")
    return ProxyConfig(kind=kind, address=kv["address"], version=version)


class HttpFetcher:
    """Actor-pool fetch stage for the live web (STUB transport).

    ``__init__`` is the once-per-actor session construction seam
    (engine_builder.rs:93-136): build the HTTP client / browser session,
    compile the extractor, configure the proxy. ``__call__`` fetches one
    Arrow batch of URLs.
    """

    def __init__(self, filters: FilterSpec, proxy: str | None = None,
                 page_load_timeout_s: float = 10.0, user_agent: str = "DoonopRobot"):
        self.filters = filters
        self.proxy = parse_proxy(proxy) if proxy else None
        self.timeout = page_load_timeout_s
        self.user_agent = user_agent
        # real impl: self.session = build_http_session(proxy=..., ua=...)

    def _transport(self, url: str) -> tuple[bytes, list[str]]:
        raise NotImplementedError(
            "no network in this environment; plug an HTTP client or "
            "WebDriver session here (returns (body_bytes, hrefs))"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "HttpFetcher is a transport stub; use stages.fetch.Fetcher "
            "against a pages table, or implement _transport()"
        )
