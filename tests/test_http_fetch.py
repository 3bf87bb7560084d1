"""Loopback-HTTP integration: the reference's own fixture pattern
(docker-compose.yml:9-16 serves tests/www with ``python3 -m
http.server``; the 2-page graph of tests/www/basic) stood up on
127.0.0.1, driven end-to-end through HttpFetcher + the real crawl
engine. Mirrors tests/crawling.rs:13-23's asserted stats
(``visited 2, collected 2, errors 0, retries 0``).
"""

import json
import subprocess
import sys
import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import pytest

from doonop_ray.filters import FilterSpec
from doonop_ray.stages.http_fetch import HttpFetcher, harvest_links

INDEX_HTML = """<!DOCTYPE html>
<html><head><title>Index</title></head>
<body><a href="./about.html">About</a></body></html>
"""
ABOUT_HTML = """<!DOCTYPE html>
<html><head><title>About</title></head>
<body><p>Nothing is here</p></body></html>
"""


@pytest.fixture(scope="module")
def www(tmp_path_factory):
    """Fixture site + loopback server; yields (base_url, root_dir)."""
    root = tmp_path_factory.mktemp("www")
    basic = root / "basic"
    basic.mkdir()
    (basic / "index.html").write_text(INDEX_HTML)
    (basic / "about.html").write_text(ABOUT_HTML)
    # extra pages for the filter/error tests
    (basic / "deep.html").write_text(
        '<a href="index.html">i</a><a name="no-href">skip</a>'
        '<a href="sub/page.html">p</a>')
    sub = basic / "sub"
    sub.mkdir()
    (sub / "page.html").write_text("<p>leaf</p>")
    # directory index for the redirect-base test (GET /basic/sub is a
    # 301 to /basic/sub/ under SimpleHTTPRequestHandler)
    (sub / "index.html").write_text('<a href="page.html">leaf</a>')

    handler = partial(SimpleHTTPRequestHandler, directory=str(root))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, root
    srv.shutdown()


def test_harvest_links_document_order_skips_missing_href():
    html = ('<a href="/a">A</a><div><a name="x">no href</a></div>'
            '<a href="b.html">B</a><a href="">empty</a>')
    assert harvest_links(html) == ["/a", "b.html", ""]


def test_http_fetcher_batch_contract(www):
    import pyarrow as pa

    base, _ = www
    f = HttpFetcher(FilterSpec((), None))
    batch = pa.table({
        "url": [f"{base}/basic/index.html", f"{base}/basic/missing.html"],
        "attempt": pa.array([0, 0], pa.int32()),
        "depth": pa.array([0, 0], pa.int32()),
    })
    out = f(batch)
    assert out.column("status").to_pylist() == ["ok", "error"]
    links = out.column("links").to_pylist()
    assert links[0] == [f"{base}/basic/about.html"]  # absolutized
    assert links[1] == []
    assert "About" in out.column("data")[0].as_py()  # body text as data
    assert out.column("latency_ms")[0].as_py() >= 1


def test_http_fetcher_redirect_base(www):
    """Relative hrefs absolutize against the POST-redirect URL — a
    browser resolves against the final location. GET /basic/sub is a
    301 to /basic/sub/; its index links 'page.html', which must become
    /basic/sub/page.html (not /basic/page.html)."""
    import pyarrow as pa

    base, _ = www
    f = HttpFetcher(FilterSpec((), None))
    batch = pa.table({
        "url": [f"{base}/basic/sub"],
        "attempt": pa.array([0], pa.int32()),
        "depth": pa.array([0], pa.int32()),
    })
    out = f(batch)
    assert out.column("status").to_pylist() == ["ok"]
    assert out.column("links").to_pylist()[0] == [
        f"{base}/basic/sub/page.html"]


def test_http_fetcher_timeout_status():
    """A connect timeout to a non-routable address reports 'timeout'
    (retryable) — reference maps only timeouts to the retry lane."""
    f = HttpFetcher(FilterSpec((), None), page_load_timeout_s=0.2)
    import pyarrow as pa

    batch = pa.table({
        # RFC 5737 TEST-NET: guaranteed unrouted → connect timeout
        "url": ["http://192.0.2.1:9/x"],
        "attempt": pa.array([0], pa.int32()),
        "depth": pa.array([0], pa.int32()),
    })
    out = f(batch)
    assert out.column("status").to_pylist()[0] in ("timeout", "error")


def test_http_fetch_loopback_conformance(www):
    """crawling.rs:13-23 over a real socket: crawl the 2-page fixture
    graph, assert order, stats and the default-UDF data values."""
    from doonop_ray.config import CrawlConfig
    from doonop_ray.functions.checkfile import default_extractor
    from doonop_ray.pipelines.crawler import run_conformance

    base, _ = www
    seed = f"{base}/basic/index.html"
    filters = FilterSpec((), None)
    cfg = CrawlConfig(seeds=[seed], use_robots=True, retry_policy="first")
    from urllib.parse import urlsplit

    from doonop_ray.robots import make_http_robots_fetcher

    robots_backend = partial(make_http_robots_fetcher,
                             port=urlsplit(base).port)
    res = run_conformance(
        cfg, None, None, robots_backend,
        fetch_backend=partial(HttpFetcher, filters,
                              extractor=default_extractor()),
    )
    assert res["order"] == [seed, f"{base}/basic/about.html"]
    assert res["stats"] == {"visited": 2, "collected": 2,
                            "errors": 0, "retries": 0}
    # default UDF: "return window.location.href" → the page URL
    assert json.loads(res["collected"][0]["data"]) == seed
    assert res["seen"] == {seed, f"{base}/basic/about.html"}


def test_http_fetch_loopback_scaled(ray_session, www, tmp_path):
    """The scaled engine (frontier/seen shards + wave pipeline) over the
    real socket: same visited/collected set as conformance."""
    from doonop_ray.config import CrawlConfig
    from doonop_ray.pipelines.crawler import RayCrawler

    base, _ = www
    seed = f"{base}/basic/deep.html"
    filters = FilterSpec((), None)
    cfg = CrawlConfig(seeds=[seed], use_robots=True, engines=2,
                      num_seen_shards=2, num_frontier_shards=2,
                      wave_budget=8)
    from urllib.parse import urlsplit

    from doonop_ray.robots import make_http_robots_fetcher

    crawler = RayCrawler(
        cfg, None, None,
        partial(make_http_robots_fetcher, port=urlsplit(base).port),
        str(tmp_path / "out"),
        fetch_backend=partial(HttpFetcher, filters),
    )
    stats = crawler.run()
    # deep → index, sub/page; index → about; about → ∅  (4 pages)
    assert stats.visited == 4
    assert stats.collected == 4
    assert stats.errors == 0
    assert crawler.seen_sets() == {
        seed,
        f"{base}/basic/index.html",
        f"{base}/basic/about.html",
        f"{base}/basic/sub/page.html",
    }


def test_http_ignore_filter_applied(www):
    """-i regex filters drop matching links at harvest (engine.rs:51-57)."""
    import pyarrow as pa

    base, _ = www
    f = HttpFetcher(FilterSpec((r".*sub.*",), None))
    batch = pa.table({
        "url": [f"{base}/basic/deep.html"],
        "attempt": pa.array([0], pa.int32()),
        "depth": pa.array([0], pa.int32()),
    })
    out = f(batch)
    assert out.column("links").to_pylist()[0] == [
        f"{base}/basic/index.html"]


def test_http_robots_fetcher_paths(www):
    """404 body compiles as robots (reqwest parity: HTTP status is not
    an error); IP-literal hosts skip robots (url.domain() None)."""
    from doonop_ray.robots import (RobotsCache, RobotsFetchError,
                                   make_http_robots_fetcher)

    base, root = www
    port = int(base.rsplit(":", 1)[1])
    fetch = make_http_robots_fetcher(port=port)
    assert fetch("127.0.0.1") == ""  # IP host: robots skipped
    # no robots.txt on the server → 404 body returned, compiles to
    # allow-all
    body_404 = fetch("localhost")
    cache = RobotsCache(lambda h: body_404)
    assert cache.is_allowed("DoonopRobot", "localhost", "/basic/x") is True
    # now serve a real robots.txt denying /basic/sub/
    (root / "robots.txt").write_text(
        "User-agent: *\nDisallow: /basic/sub/\n")
    cache2 = RobotsCache(make_http_robots_fetcher(port=port))
    assert cache2.is_allowed("DoonopRobot", "localhost",
                             "/basic/sub/page.html") is False
    assert cache2.is_allowed("DoonopRobot", "localhost",
                             "/basic/index.html") is True
    # transport error (unresolvable host) → RobotsFetchError → cached
    # None (drop); must be a NAME — IP literals skip robots entirely
    bad = make_http_robots_fetcher(timeout=0.2, port=9)
    with pytest.raises(RobotsFetchError):
        bad("doonop-nonexistent.invalid")


def test_http_fetcher_concurrent_batch_wall_time(www):
    """Intra-actor fan-out: a batch's wall time ≈ the slowest page, not
    the sum — one slow host must not stall a whole batch for
    batch_size × timeout (round-5 VERDICT #3)."""
    import time

    import pyarrow as pa

    base, root = www
    delay = 0.4

    class SlowHandler(SimpleHTTPRequestHandler):
        def do_GET(self):
            if "slowpage" in self.path:
                time.sleep(delay)
            super().do_GET()

        def log_message(self, *a):  # quiet
            pass

    basic = root / "basic"
    for i in range(6):
        (basic / f"slowpage{i}.html").write_text(f"<p>slow {i}</p>")
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(SlowHandler, directory=str(root)))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sbase = f"http://127.0.0.1:{srv.server_address[1]}"
        f = HttpFetcher(FilterSpec((), None), max_concurrency=8)
        batch = pa.table({
            "url": [f"{sbase}/basic/slowpage{i}.html" for i in range(6)],
            "attempt": pa.array([0] * 6, pa.int32()),
            "depth": pa.array([0] * 6, pa.int32()),
        })
        t0 = time.monotonic()
        out = f(batch)
        wall = time.monotonic() - t0
        assert out.column("status").to_pylist() == ["ok"] * 6
        # sequential would be ≥ 6 × 0.4 = 2.4 s; concurrent ≈ 0.4 s
        assert wall < 3 * delay, f"batch wall {wall:.2f}s — not concurrent"
        # per-row mapping survives out-of-order completion
        assert [f"slow {i}" in d for i, d in
                enumerate(out.column("data").to_pylist())] == [True] * 6
    finally:
        srv.shutdown()


def test_http_politeness_budget(ray_session, tmp_path):
    """Per-host politeness on the REAL transport: one host's releases
    are rate-limited by its token bucket while the other host proceeds
    in the same window (round-5 VERDICT #4). localhost and 127.0.0.1
    are distinct hosts to the engine but one loopback server."""
    import time
    from urllib.parse import urlsplit

    from doonop_ray.config import CrawlConfig
    from doonop_ray.pipelines.crawler import RayCrawler

    root = tmp_path / "polwww"
    pol = root / "pol"
    pol.mkdir(parents=True)
    # star shape per host: the root links every leaf, so after one fetch
    # all 5 leaves are frontier-ready — only politeness spaces them
    # (a chain would space requests by dependency and prove nothing)
    for h in ("a", "b"):
        (pol / f"{h}0.html").write_text(
            "".join(f'<a href="{h}{i}.html">x</a>' for i in range(1, 6)))
        for i in range(1, 6):
            (pol / f"{h}{i}.html").write_text(f"<p>{h}{i}</p>")

    requests: list[tuple[float, str, str]] = []  # (t, host_header, path)

    class RecordingHandler(SimpleHTTPRequestHandler):
        def do_GET(self):
            requests.append((time.monotonic(),
                             (self.headers.get("Host") or "").split(":")[0],
                             self.path))
            super().do_GET()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(RecordingHandler, directory=str(root)))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        rate = 10.0  # tokens/sec/host → 5 leaves need ≥ ~0.4 s per host
        seeds = [f"http://localhost:{port}/pol/a0.html",
                 f"http://127.0.0.1:{port}/pol/b0.html"]
        cfg = CrawlConfig(seeds=seeds, use_robots=False, engines=2,
                          num_seen_shards=2, num_frontier_shards=2,
                          wave_budget=16, host_rate_per_sec=rate,
                          host_burst=1.0)
        crawler = RayCrawler(
            cfg, None, None, {}, str(tmp_path / "out"),
            fetch_backend=partial(HttpFetcher, FilterSpec((), None)),
        )
        stats = crawler.run()
        assert stats.visited == 12 and stats.errors == 0

        by_host: dict[str, list[float]] = {}
        for t0, host, _ in requests:
            by_host.setdefault(host, []).append(t0)
        assert set(by_host) == {"localhost", "127.0.0.1"}
        spans = {}
        for host, ts in by_host.items():
            ts.sort()
            assert len(ts) == 6
            spans[host] = (ts[0], ts[-1])
            # 6 requests, burst 1 → 5 token refills ≥ 5/rate nominal;
            # allow generous slop for drain-poll timing
            assert ts[-1] - ts[0] >= 0.6 * 5 / rate, (
                f"{host} span {ts[-1] - ts[0]:.3f}s — bucket not applied")
        # the two hosts' windows overlap: one host's budget never
        # serializes the other (politeness is per-host, not global)
        (a0, a1), (b0, b1) = spans.values()
        assert max(a0, b0) < min(a1, b1), f"no overlap: {spans}"
    finally:
        srv.shutdown()


def test_socks5_proxy_loopback(www):
    """SOCKS5 transport (RFC 1928 CONNECT, pure stdlib): the fetch goes
    through a loopback SOCKS5 stub — the stub records the CONNECT
    target, proving the page bytes actually traversed the tunnel."""
    import socket
    import struct

    import pyarrow as pa

    base, _ = www
    http_port = int(base.rsplit(":", 1)[1])
    connects: list[tuple[str, int]] = []

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(4)
    socks_port = lsock.getsockname()[1]
    stop = threading.Event()

    def pump(a, b):
        try:
            while True:
                d = a.recv(65536)
                if not d:
                    break
                b.sendall(d)
        except OSError:
            pass
        finally:
            for s in (a, b):
                try:
                    s.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass

    def serve():
        while not stop.is_set():
            try:
                conn, _addr = lsock.accept()
            except OSError:
                return
            # greeting: VER NMETHODS METHODS...
            hdr = conn.recv(2)
            conn.recv(hdr[1])
            conn.sendall(b"\x05\x00")  # no-auth
            req = conn.recv(4)
            assert req[:2] == b"\x05\x01" and req[3] == 3  # CONNECT, domain
            n = conn.recv(1)[0]
            host = conn.recv(n).decode()
            port = struct.unpack(">H", conn.recv(2))[0]
            connects.append((host, port))
            upstream = socket.create_connection((host, port), 5)
            conn.sendall(b"\x05\x00\x00\x01" + b"\x00" * 4
                         + struct.pack(">H", 0))
            threading.Thread(target=pump, args=(conn, upstream),
                             daemon=True).start()
            threading.Thread(target=pump, args=(upstream, conn),
                             daemon=True).start()

    threading.Thread(target=serve, daemon=True).start()
    try:
        f = HttpFetcher(
            FilterSpec((), None),
            proxy=f"sock;address=127.0.0.1:{socks_port};version=5")
        batch = pa.table({
            "url": [f"http://localhost:{http_port}/basic/index.html"],
            "attempt": pa.array([0], pa.int32()),
            "depth": pa.array([0], pa.int32()),
        })
        out = f(batch)
        assert out.column("status").to_pylist() == ["ok"]
        assert "About" in out.column("data")[0].as_py()
        assert ("localhost", http_port) in connects  # tunnel was used
        # https through the SOCKS handler refuses loudly (no TLS wrap),
        # it must NOT silently bypass the proxy
        batch2 = pa.table({
            "url": [f"https://localhost:{http_port}/basic/index.html"],
            "attempt": pa.array([0], pa.int32()),
            "depth": pa.array([0], pa.int32()),
        })
        assert f(batch2).column("status").to_pylist() == ["error"]
    finally:
        stop.set()
        lsock.close()


def test_cli_stats_line_over_socket(www):
    """The CLI stats contract (crawling.rs:13-23) over a real socket:
    ``--http --conformance`` prints the exact reference stats line."""
    base, _ = www
    proc = subprocess.run(
        [sys.executable, "-m", "doonop_ray", "--http", "--conformance",
         "--json", f"{base}/basic/index.html"],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stderr.rstrip().endswith(
        "Statistics: visited 2, collected 2, errors 0, retries 0")
    # default UDF output: one JSON line per collected page (main.rs:36-38)
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert lines == [f"{base}/basic/index.html", f"{base}/basic/about.html"]


def test_cli_named_host_robots_port(www):
    """Named-host crawl on a non-default port: the CLI's robots-backend
    factory carries the seed's port, so robots.txt is fetched from the
    same authority the pages live on (a portless fetch would hit :80,
    get connection-refused, and silently drop every URL)."""
    base, _ = www
    port = base.rsplit(":", 1)[1]
    seed = f"http://localhost:{port}/basic/index.html"
    proc = subprocess.run(
        [sys.executable, "-m", "doonop_ray", "--http", "--conformance",
         "--json", seed],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stderr.rstrip().endswith(
        "Statistics: visited 2, collected 2, errors 0, retries 0")
