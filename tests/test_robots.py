from doonop_ray.robots import (
    FETCH_ERROR_MARKER,
    RobotsCache,
    RobotsVerifier,
    make_table_fetcher,
)

BODY = """
User-agent: DoonopRobot
Disallow: /p/3$
Disallow: /blocked
Allow: /blocked/ok

User-agent: *
Disallow: /private
"""


def test_named_group_selected():
    v = RobotsVerifier("DoonopRobot", BODY)
    assert not v.is_allowed("/p/3")
    assert v.is_allowed("/p/33")  # $ anchor
    assert not v.is_allowed("/blocked/x")
    assert v.is_allowed("/blocked/ok")  # longest rule wins, Allow beats tie
    assert v.is_allowed("/private")  # named group shadows *


def test_wildcard_group_for_unknown_robot():
    v = RobotsVerifier("OtherBot", BODY)
    assert not v.is_allowed("/private")
    assert v.is_allowed("/p/3")


def test_empty_body_allows_all():
    v = RobotsVerifier("AnyBot", "")
    assert v.is_allowed("/anything")


def test_star_rules():
    v = RobotsVerifier("X", "User-agent: *\nDisallow: /*.jpg$\n")
    assert not v.is_allowed("/a/b.jpg")
    assert v.is_allowed("/a/b.jpgx")


def test_cache_and_fetch_error_semantics():
    fetched = []

    def fetch(host):
        fetched.append(host)
        return {"a.com": BODY, "err.com": FETCH_ERROR_MARKER}.get(host, "")

    cache = RobotsCache(fetch)
    assert cache.is_allowed("DoonopRobot", "a.com", "/p/3") is False
    assert cache.is_allowed("DoonopRobot", "a.com", "/x") is True
    assert fetched.count("a.com") == 1  # cached per (host, robot)
    # fetch error → None → caller drops silently (workload.rs:100-105)
    assert cache.is_allowed("DoonopRobot", "err.com", "/x") is None
    # missing host = 404 = allow all
    assert cache.is_allowed("DoonopRobot", "gone.com", "/x") is True
    # URL without host is allowed (robots.rs:16-19)
    assert cache.is_allowed("DoonopRobot", "", "/x") is True


def test_table_fetcher():
    f = make_table_fetcher({"a.com": "User-agent: *\nDisallow: /"})
    assert f("a.com").startswith("User-agent")
    assert f("other.com") == ""
