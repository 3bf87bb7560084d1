"""The wave-loop crawl driver — the reference's dispatch/completion loop
(/root/reference/src/workload.rs:79-200) re-expressed as repeated
streaming ray.data pipelines over frontier waves.

Two execution modes share the same operator implementations:

- ``run_conformance()`` — single in-flight lane, virtual clock: byte-
  exact reproduction of the reference's deterministic j=1 crawl order
  (pinned by /root/reference/src/lib.rs:117-134). Uses the SAME
  Fetcher/Validator batch callables, applied inline on 1-row batches.
- ``run()`` — scaled mode: frontier + seen state sharded across actors,
  each wave drained with per-host politeness, fetched/validated by an
  actor-pool `map_batches` pipeline, links routed back to the seen /
  frontier shards from inside the tasks (no driver bottleneck), wave
  artifacts written to partitioned parquet (resumable layout: one
  directory per wave). Guarantees set-equality of visited/collected/
  seen with the reference (whose own N>1 interleave is nondeterministic,
  lib.rs:136-155) plus identical stats counters.

Checkpointing (north_rule): after each wave the frontier shards, seen
shards and per-wave metrics snapshot to ``checkpoint_dir``; ``resume()``
restores the newest complete wave and continues — a killed job repeats
at most one wave's fetches (artifacts are re-written per wave dir, so
the output stays exact).
"""

from __future__ import annotations

import json
import os
import pickle
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..filters import FilterSpec
from ..oracle import clean_seeds
from ..robots import RobotsCache, make_table_fetcher
from ..stages.fetch import Fetcher, Validator, make_fetch_fn, make_validate_fn
from ..state.frontier import FrontierCore, FrontierShard
from ..state.seen import SeenCore, shard_of

WAVE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("attempt", pa.int32()),
        ("depth", pa.int32()),
    ]
)


def _wave_table(entries: list[tuple[str, int, int]]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([e[0] for e in entries], pa.string()),
            "attempt": pa.array([e[1] for e in entries], pa.int32()),
            "depth": pa.array([e[2] for e in entries], pa.int32()),
        }
    )


class CrawlStats:
    def __init__(self):
        self.visited = 0
        self.collected = 0
        self.errors = 0
        self.retries = 0

    def as_dict(self) -> dict[str, int]:
        return {
            "visited": self.visited,
            "collected": self.collected,
            "errors": self.errors,
            "retries": self.retries,
        }


def make_link_router(seen_handles, frontier_handles, retry_policy: str,
                     num_seen: int, num_frontier: int, now_ms: float):
    """Stateless map_batches fn: dedup new links against the sharded seen
    set (hash-partitioned anti-join shape) and push survivors + retries
    to the frontier shards — all from inside the task, so link traffic
    never funnels through the driver. Returns light per-row columns for
    the sink (drops the links payload)."""
    import ray

    def route(batch: pa.Table) -> pa.Table:
        statuses = batch.column("status").to_pylist()
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_numpy()
        links_col = batch.column("links").to_pylist()

        # ---- candidate links → seen shards (first discovery wins) ----
        per_seen: list[list[tuple[str, int]]] = [[] for _ in range(num_seen)]
        for st, links, d in zip(statuses, links_col, depths):
            if st != "ok":
                continue
            nd = int(d) + 1
            for u in links:
                per_seen[shard_of(u, num_seen)].append((u, nd))
        futs = {
            s: seen_handles[s].check_and_add.remote([u for u, _ in items])
            for s, items in enumerate(per_seen)
            if items
        }
        fresh: list[tuple[str, int]] = []
        for s, fut in futs.items():
            mask = ray.get(fut)
            fresh.extend(it for it, new in zip(per_seen[s], mask) if new)

        # ---- fresh links → frontier shards ----
        per_frontier: list[list[tuple[str, int]]] = [[] for _ in range(num_frontier)]
        for u, d in fresh:
            per_frontier[shard_of(u, num_frontier)].append((u, d))
        push_futs = [
            frontier_handles[f].push.remote(items)
            for f, items in enumerate(per_frontier)
            if items
        ]

        # ---- timeouts → retry lanes (retry.rs:24-36 accounting) ----
        retry_futs = []
        if retry_policy != "no":
            per_retry: list[list[tuple[str, int]]] = [[] for _ in range(num_frontier)]
            for st, u, d in zip(statuses, urls, depths):
                if st == "timeout":
                    per_retry[shard_of(u, num_frontier)].append((u, int(d)))
            retry_futs = [
                frontier_handles[f].keep_retry_batch.remote(items, now_ms)
                for f, items in enumerate(per_retry)
                if items
            ]
        ray.get(push_futs + retry_futs)
        return batch.drop_columns(["links"])

    return route


class RayCrawler:
    """Scaled crawl over a synthetic world stored as Arrow tables."""

    def __init__(self, cfg: CrawlConfig, pages: pa.Table, images: pa.Table,
                 robots_map: dict[str, str], out_dir: str, world_seed: int = 42):
        self.cfg = cfg
        self.pages = pages
        self.images = images
        self.robots_map = robots_map
        self.out_dir = out_dir
        self.world_seed = world_seed
        self.filters = FilterSpec(tuple(cfg.ignore_regexes), cfg.allow_domains)
        self.stats = CrawlStats()
        self.wave = 0

    # ------------------------------------------------------------------
    def _spawn_state(self, ray):
        cfg = self.cfg
        seen_cls = ray.remote(SeenCore)
        frontier_cls = ray.remote(FrontierShard)
        self.seen = [
            seen_cls.remote(
                "exact" if cfg.seen_mode != "cuckoo" else "cuckoo",
                1 << 18,
                i,
            )
            for i in range(cfg.num_seen_shards)
        ]
        self.frontier = [
            frontier_cls.remote(
                i,
                cfg.retry_policy,
                cfg.retry_threshold_ms,
                cfg.retry_count,
                "lifo",
                self.robots_map if cfg.use_robots else None,
                cfg.robot,
                cfg.use_robots,
            )
            for i in range(cfg.num_frontier_shards)
        ]

    def _seed_frontier(self, ray, seeds: list[str]):
        cfg = self.cfg
        per_seen = [[] for _ in range(cfg.num_seen_shards)]
        for u in seeds:
            per_seen[shard_of(u, cfg.num_seen_shards)].append(u)
        masks = ray.get(
            [self.seen[s].check_and_add.remote(us) for s, us in enumerate(per_seen)]
        )
        fresh = []
        for us, mask in zip(per_seen, masks):
            fresh.extend(u for u, new in zip(us, mask) if new)
        # preserve sorted seed order for LIFO parity: push in sorted order
        fresh.sort()
        per_frontier = [[] for _ in range(cfg.num_frontier_shards)]
        for u in fresh:
            per_frontier[shard_of(u, cfg.num_frontier_shards)].append((u, 0))
        ray.get(
            [self.frontier[f].push.remote(it) for f, it in enumerate(per_frontier) if it]
        )

    # ------------------------------------------------------------------
    def run(self, max_waves: int | None = None, resume: bool = False):
        import ray
        import ray.data as rd

        cfg = self.cfg
        os.makedirs(self.out_dir, exist_ok=True)
        self._spawn_state(ray)

        start_wave = 0
        if resume and cfg.checkpoint_dir:
            start_wave = self._restore_checkpoint(ray)
            # a killed run may have half-written the next wave's dir:
            # drop any wave output newer than the checkpoint, then redo it
            for d in os.listdir(self.out_dir):
                if d.startswith("wave=") and int(d.split("=")[1]) >= start_wave:
                    import shutil

                    shutil.rmtree(os.path.join(self.out_dir, d))
        if start_wave == 0:
            seeds = clean_seeds(cfg.seeds, self.filters)
            if not seeds:
                return self.stats
            self._seed_frontier(ray, seeds)

        pages_ref = ray.put(self.pages)
        images_ref = ray.put(self.images)
        self.wave = start_wave

        while True:
            if max_waves is not None and self.wave >= max_waves:
                break
            if cfg.limit is not None and self.stats.collected > 0 \
                    and self.stats.collected >= cfg.limit:
                break  # dispatch stops; prior waves already drained (T8)

            budget = cfg.wave_size()
            if cfg.limit is not None:
                budget = max(1, min(budget, cfg.limit - self.stats.collected))
            per_shard = max(1, budget // cfg.num_frontier_shards)
            now_ms = time.monotonic() * 1000.0
            drains = ray.get(
                [
                    f.drain.remote(per_shard, now_ms, cfg.max_per_host_per_wave)
                    for f in self.frontier
                ]
            )
            entries = [e for d in drains for e in d]
            if not entries:
                if all(ray.get([f.is_empty.remote() for f in self.frontier])):
                    break
                continue  # politeness deferred everything; next wave serves it

            wave_dir = os.path.join(self.out_dir, f"wave={self.wave:05d}")
            router = make_link_router(
                self.seen, self.frontier, cfg.retry_policy,
                cfg.num_seen_shards, cfg.num_frontier_shards, now_ms,
            )
            # split the wave into >=engines blocks so the fetch stage fans
            # out across workers (a single from_arrow block would serialize)
            wave_t = _wave_table(entries)
            n_blocks = max(
                1, min(cfg.engines * 2, -(-len(entries) // cfg.fetch_batch_size))
            )
            step = -(-len(entries) // n_blocks)
            blocks = [wave_t.slice(i, step) for i in range(0, len(entries), step)]
            if cfg.use_actor_pools:
                ds = (
                    rd.from_arrow(blocks)
                    .map_batches(
                        Fetcher,
                        fn_constructor_args=(pages_ref, self.filters),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                        concurrency=(1, cfg.engines),
                        num_cpus=1,
                    )
                    .map_batches(
                        Validator,
                        fn_constructor_args=(images_ref, self.world_seed),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                        concurrency=(1, cfg.engines),
                        num_cpus=1,
                    )
                )
            else:
                # stateless tasks + per-worker-process broadcast-state cache:
                # worker procs persist across waves, so the page/image index
                # builds once per worker for the whole crawl
                ds = (
                    rd.from_arrow(blocks)
                    .map_batches(
                        make_fetch_fn(pages_ref, self.filters),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    )
                    .map_batches(
                        make_validate_fn(images_ref, self.world_seed),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    )
                )
            ds = ds.map_batches(router, batch_format="pyarrow",
                                batch_size=cfg.fetch_batch_size)
            ds.write_parquet(wave_dir)

            # light read-back of one column for the wave's stats
            st = pq.read_table(wave_dir, columns=["status"]).column("status").to_pylist()
            n_ok = sum(s == "ok" for s in st)
            n_to = sum(s == "timeout" for s in st)
            n_err = sum(s == "error" for s in st)
            self.stats.visited += len(st)
            self.stats.collected += n_ok
            if cfg.retry_policy != "no":
                self.stats.retries += n_to
            else:
                self.stats.errors += n_to
            self.stats.errors += n_err

            if cfg.checkpoint_dir and (self.wave % cfg.checkpoint_every_waves == 0):
                self._write_checkpoint(ray, wave_done=self.wave)
            self.wave += 1

        return self.stats

    # ------------------------------------------------------------------
    def seen_sets(self):
        import ray

        out: set[str] = set()
        for s in self.seen:
            blob = ray.get(s.snapshot.remote())
            out.update(pickle.loads(blob)["exact"])
        return out

    # ------------------------------------------------------------------
    def _write_checkpoint(self, ray, wave_done: int):
        ckpt = os.path.join(self.cfg.checkpoint_dir, f"wave={wave_done:05d}")
        os.makedirs(ckpt, exist_ok=True)
        f_blobs = ray.get([f.snapshot.remote() for f in self.frontier])
        s_blobs = ray.get([s.snapshot.remote() for s in self.seen])
        for i, b in enumerate(f_blobs):
            with open(os.path.join(ckpt, f"frontier_{i:03d}.pkl"), "wb") as fh:
                fh.write(b)
        for i, b in enumerate(s_blobs):
            with open(os.path.join(ckpt, f"seen_{i:03d}.pkl"), "wb") as fh:
                fh.write(b)
        manifest = {
            "wave_done": wave_done,
            "stats": self.stats.as_dict(),
            "num_frontier_shards": self.cfg.num_frontier_shards,
            "num_seen_shards": self.cfg.num_seen_shards,
        }
        tmp = os.path.join(ckpt, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(ckpt, "manifest.json"))  # atomic commit

    def _restore_checkpoint(self, ray) -> int:
        root = self.cfg.checkpoint_dir
        waves = sorted(
            d for d in os.listdir(root)
            if d.startswith("wave=")
            and os.path.exists(os.path.join(root, d, "manifest.json"))
        )
        if not waves:
            return 0
        ckpt = os.path.join(root, waves[-1])
        with open(os.path.join(ckpt, "manifest.json")) as fh:
            manifest = json.load(fh)
        futs = []
        for i, f in enumerate(self.frontier):
            with open(os.path.join(ckpt, f"frontier_{i:03d}.pkl"), "rb") as fh:
                futs.append(f.restore.remote(fh.read()))
        for i, s in enumerate(self.seen):
            with open(os.path.join(ckpt, f"seen_{i:03d}.pkl"), "rb") as fh:
                futs.append(s.restore.remote(fh.read()))
        ray.get(futs)
        st = manifest["stats"]
        self.stats.visited = st["visited"]
        self.stats.collected = st["collected"]
        self.stats.errors = st["errors"]
        self.stats.retries = st["retries"]
        return manifest["wave_done"] + 1


# ---------------------------------------------------------------------------
# Conformance mode: single lane, virtual clock, exact reference order
# ---------------------------------------------------------------------------


def run_conformance(cfg: CrawlConfig, pages: pa.Table, images: pa.Table,
                    robots_map: dict[str, str], world_seed: int = 42):
    """Single-in-flight crawl using the engine's own operator classes
    (FrontierCore + SeenCore + RobotsCache + Fetcher + Validator batch
    fns applied inline) — produces the reference's exact j=1 order."""
    filters = FilterSpec(tuple(cfg.ignore_regexes), cfg.allow_domains)
    fetcher = Fetcher(pages, filters)
    validator = Validator(images, world_seed)
    frontier = FrontierCore(
        cfg.retry_policy, cfg.retry_threshold_ms, cfg.retry_count, "lifo"
    )
    seen = SeenCore("exact" if cfg.seen_mode != "cuckoo" else "cuckoo")
    robots = RobotsCache(make_table_fetcher(robots_map)) if cfg.use_robots else None

    stats = CrawlStats()
    order: list[str] = []
    collected: list[dict] = []
    clock_ms = 0.0
    limit_left = cfg.limit
    closed = False

    seeds = clean_seeds(cfg.seeds, filters)
    if seeds:
        fresh = [u for u, new in zip(seeds, seen.check_and_add(seeds)) if new]
        frontier.push([(u, 0) for u in fresh])

    while not closed:
        got = frontier.drain(1, clock_ms, None, robots, cfg.robot)
        if not got:
            break
        url, attempt, depth = got[0]
        order.append(url)
        stats.visited += 1
        row = fetcher(
            _wave_table([(url, attempt, depth)])
        )
        status = row.column("status")[0].as_py()
        clock_ms += row.column("latency_ms")[0].as_py()
        if status == "timeout" and cfg.retry_policy != "no":
            stats.retries += 1
            frontier.keep_retry(url, depth, clock_ms)
            continue
        if status != "ok":
            stats.errors += 1
            continue
        v = validator(row)
        collected.append(
            {
                "url": url,
                "data": v.column("data")[0].as_py(),
                "image_id": v.column("image_id")[0].as_py(),
                "caption_ok": v.column("caption_ok")[0].as_py(),
                "pixel_ok": v.column("pixel_ok")[0].as_py(),
            }
        )
        stats.collected += 1
        if limit_left is not None:
            if limit_left == 0:
                closed = True
            else:
                limit_left -= 1
                if limit_left == 0:
                    closed = True
        links = v.column("links")[0].as_py()
        fresh = [u for u, new in zip(links, seen.check_and_add(links)) if new]
        frontier.push([(u, depth + 1) for u in fresh])

    return {
        "order": order,
        "collected": collected,
        "seen": set(seen.exact) if seen.mode == "exact" else None,
        "stats": stats.as_dict(),
    }
