"""Real HTTP fetch backend (stdlib urllib transport).

The reference fetches through a WebDriver session and harvests every
``<a href>`` in DOM order (engine_builder.rs:76-136, backend.rs:84-111).
This backend implements the same per-page contract over plain HTTP with
``urllib`` + an ``html.parser`` link harvester: fetch the page body,
collect ``<a href>`` in document order (missing hrefs skipped —
backend.rs:97-104), absolutize against the page URL and filter
(engine.rs:44-68). The batch contract is identical to
``doonop_ray.stages.fetch.Fetcher`` (in: url/attempt/depth Arrow batch;
out: url/attempt/depth/status/data/links/image_id/latency_ms), so the
whole downstream engine (validator, router, frontier, checkpoints) is
transport-agnostic — the loopback integration test runs the reference's
own fixture pattern (``python3 -m http.server`` serving tests/www,
docker-compose.yml:9-16) against this class end-to-end.

This container has no external network, so tests bind 127.0.0.1; the
code itself is host-agnostic. The timeout maps to the reference's
page-load timeout (cfg.rs:22,245-248): a socket timeout reports status
"timeout" (retryable, backend.rs:60-65), every other failure "error".

Proxy configuration mirrors the reference's proxy string format
(cfg.rs:300-328): ``"sock;address=HOST:PORT;version=5"`` or
``"http;address=HOST:PORT"``. An ``http`` proxy is applied to the
urllib opener (engine_builder.rs:113-120 parity); SOCKS needs a
library this environment doesn't ship and raises loudly at session
build.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from html.parser import HTMLParser

import pyarrow as pa

from ..filters import FilterSpec
from ..url import make_absolute


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


class _LinkHarvester(HTMLParser):
    """Collect ``<a href>`` values in document order; anchors without an
    href are skipped (backend.rs:97-104 skips None-href elements)."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break


def harvest_links(html_text: str) -> list[str]:
    p = _LinkHarvester()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass  # malformed tail: keep what parsed (browsers are lenient)
    return p.hrefs


class HttpFetcher:
    """Actor-pool fetch stage over real HTTP (stdlib urllib transport).

    ``__init__`` is the once-per-actor session construction seam
    (engine_builder.rs:93-136): build the opener (with the parsed proxy
    applied — :113-120), set UA and timeout. ``__call__`` fetches one
    Arrow batch of URLs sequentially (I/O-bound; parallelism comes from
    the actor pool / task fan-out, mirroring one engine per reference
    task, workload.rs:281-305).

    ``data`` is the decoded page text (the ``document.body.innerText``
    feed for the check-file UDFs); an ``extractor`` replaces it per OK
    page exactly like the synthetic Fetcher. ``image_id`` is null —
    payload validation is a synthetic-world notion.
    """

    def __init__(self, filters: FilterSpec, proxy: str | None = None,
                 page_load_timeout_s: float = 10.0,
                 user_agent: str = "DoonopRobot", extractor=None):
        import urllib.request

        self.filters = filters
        self.proxy = parse_proxy(proxy) if proxy else None
        self.timeout = page_load_timeout_s
        self.user_agent = user_agent
        self.extractor = extractor
        handlers = []
        if self.proxy is not None:
            if self.proxy.kind != "http":
                raise NotImplementedError(
                    "SOCKS proxying needs a SOCKS client library; this "
                    "environment ships none (http proxies are supported)"
                )
            addr = self.proxy.address
            if "://" not in addr:
                addr = "http://" + addr
            handlers.append(urllib.request.ProxyHandler(
                {"http": addr, "https": addr}))
        self.opener = urllib.request.build_opener(*handlers)
        self.opener.addheaders = [("User-Agent", self.user_agent)]

    def _transport(self, url: str) -> tuple[str, list[str]]:
        """Fetch one page; returns (page_text, raw hrefs in doc order,
        final post-redirect URL — the base a browser would resolve
        relative hrefs against). Raises socket.timeout/URLError upward
        for status mapping."""
        with self.opener.open(url, timeout=self.timeout) as resp:
            body = resp.read()
            final_url = resp.geturl() or url
        text = body.decode("utf-8", "replace")
        return text, harvest_links(text), final_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        import socket
        import urllib.error

        import numpy as np
        import pyarrow.compute as pc

        urls = batch.column("url").to_pylist()
        n = len(urls)
        statuses: list[str] = ["error"] * n
        datas: list[str | None] = [None] * n
        links_out: list[list[str]] = [[] for _ in range(n)]
        latency = np.ones(n, dtype=np.int32)
        for i, url in enumerate(urls):
            t0 = time.monotonic()
            try:
                text, hrefs, base_url = self._transport(url)
            except (socket.timeout, TimeoutError):
                statuses[i] = "timeout"  # retryable (backend.rs:60-65)
                continue
            except urllib.error.URLError as e:
                # a timeout may also surface wrapped in URLError
                if isinstance(getattr(e, "reason", None),
                              (socket.timeout, TimeoutError)):
                    statuses[i] = "timeout"
                else:
                    statuses[i] = "error"
                continue
            except Exception:
                statuses[i] = "error"
                continue
            finally:
                latency[i] = max(1, int((time.monotonic() - t0) * 1000))
            statuses[i] = "ok"
            datas[i] = text
            # absolutize + filter (engine.rs:44-68): drop unparseable,
            # drop if any filter ignores. The base is the POST-redirect
            # URL — urllib followed redirects, and a browser (the
            # reference's WebDriver backend) resolves relative hrefs
            # against the final location, not the requested one
            absd = [a for a in (make_absolute(base_url, h) for h in hrefs)
                    if a is not None]
            if absd:
                keep = ~self.filters.ignored_mask(absd)
                absd = [a for a, k in zip(absd, keep) if k]
            links_out[i] = absd

        if self.extractor is not None:
            ok_idx = [i for i, s in enumerate(statuses) if s == "ok"]
            if ok_idx:
                page_rows = pa.table({
                    "url": pa.array([urls[i] for i in ok_idx], pa.string()),
                    "data": pa.array([datas[i] for i in ok_idx], pa.string()),
                    "links": pa.array([links_out[i] for i in ok_idx],
                                      pa.list_(pa.string())),
                    "image_id": pa.nulls(len(ok_idx), pa.string()),
                })
                from .fetch import apply_extractor

                ex, failed = apply_extractor(self.extractor, page_rows)
                for k, i in enumerate(ok_idx):
                    datas[i] = ex[k]
                for k in failed:
                    # per-URL error lane (workload.rs:145-148): a failed
                    # script run errors THAT page, the crawl continues
                    i = ok_idx[k]
                    statuses[i] = "error"
                    datas[i] = None
                    links_out[i] = []

        return pa.table({
            "url": batch.column("url"),
            "attempt": pc.cast(batch.column("attempt"), pa.int32()),
            "depth": pc.cast(batch.column("depth"), pa.int32()),
            "status": pa.array(statuses, pa.string()),
            "data": pa.array(datas, pa.string()),
            "links": pa.array(links_out, pa.list_(pa.string())),
            "image_id": pa.nulls(n, pa.string()),
            "latency_ms": pa.array(latency, pa.int32()),
        })
