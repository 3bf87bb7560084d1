"""Oracle conformance against the reference's own pinned test cases."""

import json

from doonop_ray.config import CrawlConfig
from doonop_ray.oracle import clean_seeds, run_oracle
from doonop_ray.filters import FilterSpec
from doonop_ray.synth import WorldParams, build_world


def _page(url, links, data="null", fail_mode="", fail_count=0, latency=1, image_id=None):
    return {
        "url": url,
        "links": links,
        "data": data,
        "fail_mode": fail_mode,
        "fail_count": fail_count,
        "latency_ms": latency,
        "image_id": image_id,
    }


def _world(pages):
    return {p["url"]: p for p in pages}


def test_basic_two_page_fixture():
    # mirrors /root/reference/tests/www/basic + tests/crawling.rs:13-23:
    # index.html links to about.html; expect visited 2 collected 2
    pages = _world([
        _page("https://site.com/index.html", ["about.html"], data='"idx"'),
        _page("https://site.com/about.html", [], data='"about"'),
    ])
    res = run_oracle(CrawlConfig(seeds=["https://site.com/index.html"]), pages, {})
    assert res.stats() == {"visited": 2, "collected": 2, "errors": 0, "retries": 0}
    assert res.order == ["https://site.com/index.html", "https://site.com/about.html"]


def test_mock_single_chain_order():
    # mirrors /root/reference/src/lib.rs:117-134: data order [d1, d2, null]
    pages = _world([
        _page("https://a.com/1", ["https://a.com/2"], data='"d1"'),
        _page("https://a.com/2", ["https://a.com/3"], data='"d2"'),
        _page("https://a.com/3", [], data="null"),
    ])
    res = run_oracle(CrawlConfig(seeds=["https://a.com/1"]), pages, {})
    assert [json.loads(d) for d in res.collected] == ["d1", "d2", None]


def test_lifo_order_last_link_first_and_seed_sort():
    # LIFO pop (workload.rs:230): lexicographically greatest seed first;
    # the LAST link of the newest page is crawled next.
    pages = _world([
        _page("https://s.com/a", ["/x", "/y"]),
        _page("https://s.com/b", []),
        _page("https://s.com/x", []),
        _page("https://s.com/y", []),
    ])
    cfg = CrawlConfig(seeds=["https://s.com/a", "https://s.com/b", "https://s.com/a"])
    res = run_oracle(cfg, pages, {})
    assert res.order == [
        "https://s.com/b",  # greatest seed popped first
        "https://s.com/a",
        "https://s.com/y",  # last link of newest page next
        "https://s.com/x",
    ]


def test_discovery_time_dedup_first_wins():
    pages = _world([
        _page("https://s.com/a", ["/c", "/b"]),
        _page("https://s.com/b", ["/c"]),  # /c already discovered
        _page("https://s.com/c", []),
    ])
    res = run_oracle(CrawlConfig(seeds=["https://s.com/a"]), pages, {})
    assert res.order.count("https://s.com/c") == 1
    assert res.stats()["visited"] == 3


def test_limit_zero_quirk_still_collects_one():
    # workload.rs:213-222: Some(0) closes AFTER the first push
    pages = _world([
        _page("https://s.com/a", ["/b"]),
        _page("https://s.com/b", []),
    ])
    res = run_oracle(CrawlConfig(seeds=["https://s.com/a"], limit=0), pages, {})
    assert res.stats()["collected"] == 1
    # links of the closing page still enter the seen set (workload.rs:133)
    assert "https://s.com/b" in res.seen


def test_limit_counts_only_successes():
    pages = _world([
        _page("https://s.com/a", ["/b", "/e"]),
        _page("https://s.com/e", [], fail_mode="error", fail_count=1),
        _page("https://s.com/b", ["/c"]),
        _page("https://s.com/c", []),
    ])
    # LIFO: a → e (error, not counted) → b → c collected → limit closes
    res = run_oracle(CrawlConfig(seeds=["https://s.com/a"], limit=3), pages, {})
    assert res.stats()["collected"] == 3
    assert res.stats()["errors"] == 1


def test_retry_timeout_then_success():
    pages = _world([
        _page("https://s.com/a", ["/t"]),
        _page("https://s.com/t", [], fail_mode="timeout", fail_count=1, data='"late"'),
    ])
    cfg = CrawlConfig(seeds=["https://s.com/a"], retry_policy="first",
                      retry_threshold_ms=0, retry_count=3)
    res = run_oracle(cfg, pages, {})
    assert res.stats() == {"visited": 3, "collected": 2, "errors": 0, "retries": 1}
    assert res.order == ["https://s.com/a", "https://s.com/t", "https://s.com/t"]


def test_retry_give_up_at_retry_count():
    pages = _world([
        _page("https://s.com/t", [], fail_mode="timeout", fail_count=99),
    ])
    cfg = CrawlConfig(seeds=["https://s.com/t"], retry_policy="first",
                      retry_threshold_ms=0, retry_count=3)
    res = run_oracle(cfg, pages, {})
    # keep_retry increments then compares: 3 fetches total, 3 retries counted
    assert res.stats() == {"visited": 3, "collected": 0, "errors": 0, "retries": 3}


def test_retry_policy_no_counts_timeouts_as_errors():
    pages = _world([
        _page("https://s.com/t", [], fail_mode="timeout", fail_count=1),
    ])
    res = run_oracle(CrawlConfig(seeds=["https://s.com/t"], retry_policy="no"), pages, {})
    assert res.stats() == {"visited": 1, "collected": 0, "errors": 1, "retries": 0}


def test_retry_last_defers_until_pool_empty():
    pages = _world([
        _page("https://s.com/a", ["/t", "/b"]),
        _page("https://s.com/b", []),
        _page("https://s.com/t", [], fail_mode="timeout", fail_count=1),
    ])
    cfg = CrawlConfig(seeds=["https://s.com/a"], retry_policy="last",
                      retry_threshold_ms=10_000_000, retry_count=3)
    res = run_oracle(cfg, pages, {})
    # /t timeouts, then /b (wait, /b popped first — LIFO: links [/t, /b] →
    # pop /b first, then /t timeouts, pool empty → force retry /t)
    assert res.order == [
        "https://s.com/a", "https://s.com/b", "https://s.com/t", "https://s.com/t",
    ]
    assert res.stats()["collected"] == 3


def test_robots_blocked_urls_dropped_silently_and_stay_seen():
    pages = _world([
        _page("https://s.com/a", ["/blocked/x", "/b"]),
        _page("https://s.com/b", []),
        _page("https://s.com/blocked/x", []),
    ])
    robots = {"s.com": "User-agent: *\nDisallow: /blocked\n"}
    cfg = CrawlConfig(seeds=["https://s.com/a"], use_robots=True)
    res = run_oracle(cfg, pages, robots)
    assert "https://s.com/blocked/x" not in res.order
    assert "https://s.com/blocked/x" in res.seen
    assert res.stats()["visited"] == 2  # robots drops don't count as visits


def test_robots_fetch_error_drops_whole_host():
    from doonop_ray.robots import FETCH_ERROR_MARKER

    pages = _world([
        _page("https://s.com/a", ["https://err.com/x", "/b"]),
        _page("https://s.com/b", []),
        _page("https://err.com/x", []),
    ])
    robots = {"err.com": FETCH_ERROR_MARKER}
    res = run_oracle(CrawlConfig(seeds=["https://s.com/a"], use_robots=True), pages, robots)
    assert "https://err.com/x" not in res.order
    assert res.stats()["visited"] == 2


def test_filters_applied_to_links_and_seeds():
    pages = _world([
        _page("https://s.com/a", ["/pic.jpg", "/b", "https://other.com/x"]),
        _page("https://s.com/b", []),
        _page("https://s.com/pic.jpg", []),
        _page("https://other.com/x", []),
    ])
    cfg = CrawlConfig(
        seeds=["https://s.com/a", "https://other.com/seed"],
        ignore_regexes=(r"\.jpg$",),
        allow_domains=("s.com",),
    )
    res = run_oracle(cfg, pages, {})
    assert set(res.order) == {"https://s.com/a", "https://s.com/b"}


def test_clean_seeds_sort_dedup_filter():
    f = FilterSpec(ignore_regexes=("skip",))
    out = clean_seeds(
        ["https://b.com", "https://a.com", "https://b.com", "https://skip.com", "nonsense"],
        f,
    )
    assert out == ["https://a.com/", "https://b.com/"]


def test_synth_world_runs_end_to_end():
    w = build_world(WorldParams(seed=7, n_hosts=3, pages_per_host=6))
    pages = w.pages_by_url()
    cfg = CrawlConfig(
        seeds=w.seeds.column("url").to_pylist(),
        retry_threshold_ms=0,
        use_robots=True,
    )
    res = run_oracle(cfg, pages, w.robots_map())
    assert res.stats()["visited"] > 0
    assert res.stats()["collected"] > 0
    # every visited URL is in seen, and seen ⊇ order
    assert set(res.order) <= res.seen
    # determinism
    res2 = run_oracle(cfg, pages, w.robots_map())
    assert res2.order == res.order and res2.seen == res.seen
