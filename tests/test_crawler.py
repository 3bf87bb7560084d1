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
