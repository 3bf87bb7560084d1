"""Engine-vs-oracle conformance: the Ray engine's operators must
reproduce the reference scheduler semantics exactly in single-lane mode
(reference j=1 order is deterministic, lib.rs:117-134) and match on
sets/stats in scaled mode (reference N>1 interleave is nondeterministic,
lib.rs:136-155)."""

import pytest

from doonop_ray.config import CrawlConfig
from doonop_ray.oracle import run_oracle
from doonop_ray.pipelines.crawler import RayCrawler, run_conformance
from doonop_ray.synth import WorldParams, build_world

WORLDS = [
    WorldParams(seed=7, n_hosts=3, pages_per_host=6),
    WorldParams(seed=21, n_hosts=5, pages_per_host=12, fanout=4, p_cross=0.4),
    WorldParams(seed=99, n_hosts=2, pages_per_host=20, fanout=5,
                p_timeout=0.15, p_error=0.08),
]

CONFIGS = [
    dict(),
    dict(use_robots=True),
    dict(retry_policy="no"),
    dict(retry_policy="last", retry_threshold_ms=0),
    dict(limit=5),
    dict(limit=0),
    dict(ignore_regexes=(r"/p/1$",)),
    dict(allow_domains=("h000.example.com", "h001.example.com")),
]


def _cfg(world, **kw):
    base = dict(seeds=world.seeds.column("url").to_pylist(), retry_threshold_ms=0)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.mark.parametrize("wi", range(len(WORLDS)))
@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_conformance_mode_matches_oracle(wi, ci):
    w = build_world(WORLDS[wi])
    cfg = _cfg(w, **CONFIGS[ci])
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    engine = run_conformance(cfg, w.pages, w.images, w.robots_map(), WORLDS[wi].seed)
    assert engine["order"] == oracle.order
    assert engine["seen"] == oracle.seen
    assert engine["stats"] == oracle.stats()
    assert [c["data"] for c in engine["collected"]] == oracle.collected
    # per-row image invariant holds for every collected payload
    for c in engine["collected"]:
        if c["image_id"] is not None:
            assert c["caption_ok"] and c["pixel_ok"]


def test_conformance_deep_retry_world():
    w = build_world(WorldParams(seed=5, n_hosts=4, pages_per_host=15,
                                fanout=4, p_timeout=0.25, max_fail=4))
    cfg = _cfg(w, retry_policy="first", retry_threshold_ms=30, retry_count=3)
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    engine = run_conformance(cfg, w.pages, w.images, w.robots_map(), 5)
    assert engine["order"] == oracle.order
    assert engine["stats"] == oracle.stats()


@pytest.mark.parametrize("shards", [(1, 1), (2, 3)])
def test_scaled_mode_set_equality(ray_session, tmp_path, shards):
    ns, nf = shards
    w = build_world(WORLDS[1])
    cfg = _cfg(
        w,
        use_robots=True,
        engines=2,
        num_seen_shards=ns,
        num_frontier_shards=nf,
        wave_budget=16,
        fetch_batch_size=8,
    )
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                         str(tmp_path / "out"), world_seed=WORLDS[1].seed)
    stats = crawler.run()
    assert stats.as_dict() == oracle.stats()
    assert crawler.seen_sets() == oracle.seen

    # wave artifacts: visited set equality + per-row invariants
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "out"))
    assert set(t.column("url").to_pylist()) == set(oracle.order)
    ok = t.filter(__import__("pyarrow").compute.equal(t.column("status"), "ok"))
    for row in ok.to_pylist():
        if row["image_id"] is not None:
            assert row["caption_ok"] and row["pixel_ok"]


def test_scaled_mode_with_politeness_and_limit(ray_session, tmp_path):
    w = build_world(WORLDS[1])
    cfg = _cfg(
        w,
        engines=2,
        wave_budget=8,
        max_per_host_per_wave=2,
        limit=10,
        fetch_batch_size=4,
    )
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                         str(tmp_path / "out"), world_seed=WORLDS[1].seed)
    stats = crawler.run()
    # limit semantics: dispatch stops at the first wave boundary at/after
    # the limit; overshoot is bounded by one wave (reference overshoots by
    # in-flight count, workload.rs:127-131)
    assert 10 <= stats.collected <= 10 + cfg.wave_budget


def test_scaled_resume_from_checkpoint(ray_session, tmp_path):
    w = build_world(WORLDS[1])

    def mk(tag):
        cfg = _cfg(
            w,
            use_robots=True,
            engines=2,
            wave_budget=8,
            fetch_batch_size=4,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        return RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                          str(tmp_path / f"out_{tag}"), world_seed=WORLDS[1].seed)

    # full run for the golden final state
    golden = mk("full")
    golden_stats = golden.run()
    golden_seen = golden.seen_sets()

    import shutil

    shutil.rmtree(tmp_path / "ckpt")

    # partial run killed after 2 waves, then resumed
    part = mk("part")
    part.run(max_waves=2)
    resumed = mk("part")  # same out dir: stale waves >= restore point are redone
    stats = resumed.run(resume=True)
    assert stats.as_dict() == golden_stats.as_dict()
    assert resumed.seen_sets() == golden_seen


def test_wave_metrics_lineage_written(ray_session, tmp_path):
    import pyarrow.parquet as pq

    w = build_world(WORLDS[0])
    cfg = _cfg(w, engines=2, wave_budget=16, fetch_batch_size=8)
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                         str(tmp_path / "out"), world_seed=WORLDS[0].seed)
    stats = crawler.run()
    m = pq.read_table(str(tmp_path / "out" / "_wave_metrics.parquet"))
    assert {"wave", "visited", "collected", "timeouts", "errors",
            "links_routed", "wall_sec", "wave_dir"} <= set(m.column_names)
    assert sum(m.column("visited").to_pylist()) == stats.visited
    assert sum(m.column("collected").to_pylist()) == stats.collected


def _failing_side_extractor(w):
    """A .side script whose assertText passes on exactly ONE page (page
    data embeds the URL, so it is unique per page): every other OK page
    must land in the per-URL error lane (workload.rs:145-148), not abort
    the crawl. The passing page is the first OK-fetched one — frontier
    evolution is identical up to it, since earlier fetch-errors/timeouts
    contribute no links in either run."""
    import json as _json

    from doonop_ray.functions.checkfile import SideCheck

    base = run_oracle(_cfg(w), w.pages_by_url(), w.robots_map())
    keep_data = base.collected[0]
    side = _json.dumps({"tests": [{"commands": [
        {"command": "assertText", "target": "css=body", "value": keep_data},
        {"command": "executeScript",
         "target": "return document.body.innerText", "value": "RESULT"},
    ]}]})
    return SideCheck(side)


def test_side_assert_failure_is_per_page_error_lane():
    """ADVICE r4 (medium): a SideAssertError must error THAT page and
    continue crawling — reference stats.count_errors semantics — with
    engine and oracle in exact agreement (order, stats, collected)."""
    w = build_world(WORLDS[0])
    cfg = _cfg(w, extractor=_failing_side_extractor(w))
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    engine = run_conformance(cfg, w.pages, w.images, w.robots_map(),
                             WORLDS[0].seed)
    assert engine["order"] == oracle.order
    assert engine["seen"] == oracle.seen
    assert engine["stats"] == oracle.stats()
    assert [c["data"] for c in engine["collected"]] == oracle.collected
    st = oracle.stats()
    assert st["collected"] >= 1      # the passing page was collected
    assert st["errors"] >= 1         # failing pages errored, crawl went on


def test_side_assert_failure_scaled_engine(ray_session, tmp_path):
    """Same per-page error lane through the scaled Ray engine: a batch
    containing a failing page must not abort its map_batches task."""
    w = build_world(WORLDS[0])
    cfg = _cfg(w, extractor=_failing_side_extractor(w), engines=2,
               wave_budget=16, fetch_batch_size=8)
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                         str(tmp_path / "out"), world_seed=WORLDS[0].seed)
    stats = crawler.run()
    assert stats.as_dict() == oracle.stats()
    assert crawler.seen_sets() == oracle.seen


# ---------------------------------------------------------------------------
# streaming mode (round-2): one long-lived chunk-task loop, no per-wave
# dataset startup — must preserve the wave loop's set/stats guarantees
# ---------------------------------------------------------------------------


def test_streaming_matches_oracle_sets(ray_session, tmp_path):
    import pyarrow.parquet as pq

    w = build_world(WORLDS[2])  # timeout/error-heavy world exercises retries
    cfg = _cfg(
        w,
        use_robots=True,
        retry_threshold_ms=5,
        streaming=True,
        engines=4,
        wave_budget=32,
        num_seen_shards=2,
        num_frontier_shards=2,
    )
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                         str(tmp_path / "out"), world_seed=WORLDS[2].seed)
    stats = crawler.run()
    assert stats.as_dict() == oracle.stats()
    assert crawler.seen_sets() == oracle.seen
    t = pq.read_table(str(tmp_path / "out"), columns=["url", "status"])
    assert set(t.column("url").to_pylist()) == set(oracle.order)
    ok = {u for u, s in zip(t.column("url").to_pylist(),
                            t.column("status").to_pylist()) if s == "ok"}
    assert len(ok) == oracle.stats()["collected"]


def test_streaming_resume_from_checkpoint(ray_session, tmp_path):
    import threading
    import time as _time

    w = build_world(WORLDS[1])

    def mk(tag, **kw):
        cfg = _cfg(
            w,
            use_robots=True,
            streaming=True,
            engines=2,
            wave_budget=8,
            num_frontier_shards=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
            checkpoint_every_sec=0.05,
            # throttle so the graceful stop lands mid-crawl
            host_rate_per_sec=kw.pop("rate", None),
            **kw,
        )
        return RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                          str(tmp_path / f"out_{tag}"),
                          world_seed=WORLDS[1].seed)

    golden = mk("full")
    golden_stats = golden.run()
    golden_seen = golden.seen_sets()

    import shutil

    shutil.rmtree(tmp_path / "ckpt")

    part = mk("part", rate=40.0)
    threading.Timer(1.0, part.request_stop).start()
    part.run()

    resumed = mk("part")  # same out dir; manifest prunes post-cut files
    stats = resumed.run(resume=True)
    assert stats.as_dict() == golden_stats.as_dict()
    assert resumed.seen_sets() == golden_seen

    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "out_part"), columns=["url"])
    urls = t.column("url").to_pylist()
    # one artifact row per visit (retried URLs legitimately repeat, one
    # row per attempt): the manifest pruning must leave exactly the
    # counted rows — nothing lost, nothing double-written
    assert len(urls) == stats.as_dict()["visited"]
    t_full = pq.read_table(str(tmp_path / "out_full"), columns=["url"])
    assert set(urls) == set(t_full.column("url").to_pylist())


def test_streaming_survives_object_store_pressure(tmp_path):
    """Memory-aware robustness: the same crawl with a deliberately tiny
    object store (256 MB — the broadcast tables + in-flight chunks
    exceed it, so plasma must spill) completes with EXACT stats. Runs in
    a subprocess so the constrained Ray session doesn't touch the shared
    test fixture's session."""
    import json
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import json, sys
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR", object_store_memory=80 * 1024 * 1024)
        from doonop_ray.synth import build_world, WorldParams
        from doonop_ray.oracle import run_oracle
        from doonop_ray.config import CrawlConfig
        from doonop_ray.pipelines.crawler import RayCrawler
        # broadcast tables + in-flight chunk payloads comfortably exceed
        # the 80 MB store, so plasma MUST spill to finish
        w = build_world(WorldParams(seed=31, n_hosts=6, pages_per_host=250,
                                    img_min=128, img_max=192))
        cfg = CrawlConfig(seeds=w.seeds.column("url").to_pylist(),
                          use_robots=True, retry_threshold_ms=0,
                          streaming=True, engines=4, wave_budget=64,
                          num_seen_shards=2, num_frontier_shards=2)
        oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
        c = RayCrawler(cfg, w.pages, w.images, w.robots_map(), sys.argv[1])
        stats = c.run()
        import glob, os
        session = ray._private.worker.global_worker.node.get_session_dir_path()
        spill_dirs = glob.glob(os.path.join(session, "ray_spilled_objects*"))
        spill_files = glob.glob(os.path.join(session, "ray_spilled_objects*", "*"))
        spilled = bool(spill_dirs) and bool(spill_files)
        print(json.dumps({"stats": stats.as_dict(),
                          "oracle": oracle.stats(),
                          "spilled": spilled}))
        ray.shutdown()
    """)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "out")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["stats"] == res["oracle"]
    assert res["spilled"], "object store never spilled — test not binding"

def test_streaming_token_bucket_rate_matches_wave_mode(ray_session, tmp_path):
    """VERDICT round-2 #6: time-based politeness must behave identically
    in wave and streaming mode. Both modes crawl the same world under the
    same (rate, burst); each must be rate-bound to at least
    (pages_per_host - burst) / rate seconds, visit the same url set, and
    never drop a page."""
    import time as _time

    import pyarrow.parquet as pq

    w = build_world(WORLDS[0])  # 3 hosts x 6 pages
    rate, burst = 6.0, 2.0
    per_host = WORLDS[0].pages_per_host
    floor_sec = (per_host - burst) / rate

    stats, elapsed = {}, {}
    for mode, streaming in (("wave", False), ("stream", True)):
        cfg = _cfg(w, use_robots=True, streaming=streaming, engines=2,
                   wave_budget=32, num_frontier_shards=2,
                   host_rate_per_sec=rate, host_burst=burst)
        c = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                       str(tmp_path / f"out_{mode}"), world_seed=WORLDS[0].seed)
        t0 = _time.monotonic()
        stats[mode] = c.run().as_dict()
        elapsed[mode] = _time.monotonic() - t0

    assert stats["wave"] == stats["stream"]
    u_wave = set(pq.read_table(str(tmp_path / "out_wave"),
                               columns=["url"]).column("url").to_pylist())
    u_stream = set(pq.read_table(str(tmp_path / "out_stream"),
                                 columns=["url"]).column("url").to_pylist())
    assert u_wave == u_stream
    # both modes are bound by the same token-refill floor
    assert elapsed["wave"] >= floor_sec * 0.9, elapsed
    assert elapsed["stream"] >= floor_sec * 0.9, elapsed


def test_streaming_warns_on_per_wave_cap(ray_session, tmp_path):
    import warnings

    w = build_world(WORLDS[0])
    cfg = _cfg(w, streaming=True, engines=2, max_per_host_per_wave=4)
    c = RayCrawler(cfg, w.pages, w.images, w.robots_map(),
                   str(tmp_path / "out_capwarn"), world_seed=WORLDS[0].seed)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        c.run()
    assert any("PER-POLL cap" in str(r.message) for r in rec)


def test_hot_host_world_conformance():
    """Skew-adversarial world (hot_host_frac): host 0 holds the pinned
    share of pages, and the engine still matches the oracle exactly —
    the correctness side of the bench.py --skew evidence."""
    p = WorldParams(seed=31, n_hosts=6, pages_per_host=20, fanout=4,
                    p_cross=0.4, hot_host_frac=0.6)
    w = build_world(p)
    hosts = w.pages.column("host").to_pylist()
    frac = hosts.count("h000.example.com") / len(hosts)
    assert 0.55 <= frac <= 0.65
    cfg = _cfg(w, use_robots=True)
    oracle = run_oracle(cfg, w.pages_by_url(), w.robots_map())
    engine = run_conformance(cfg, w.pages, w.images, w.robots_map(), p.seed)
    assert engine["order"] == oracle.order
    assert engine["seen"] == oracle.seen
    assert engine["stats"] == oracle.stats()
