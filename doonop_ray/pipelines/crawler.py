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

def _stub_fsspec_http_once():
    """aiohttp is absent here, so ``fsspec.implementations.http`` can
    never import. Ray Data's path resolution re-attempts that import on
    every read/write (failed imports aren't cached), and two concurrent
    wave threads racing the import surface as flaky ``ImportError:
    cannot import name 'HTTPFileSystem'``. Register a minimal stub once,
    single-threaded, so the import succeeds and is cached; no HTTP
    filesystem is ever used in this sandbox."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ImportError:
        pass

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder type; never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


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


class SeenRouterShard(SeenCore):
    """Seen-set shard that also forwards first-discovery URLs to the
    frontier shards itself (actor→actor), so data-plane tasks never
    block on membership answers. ``n_ingested`` + ``flush`` implement
    the settlement protocol the driver uses at termination."""

    def __init__(self, mode, capacity, seed, frontier_handles, num_frontier):
        super().__init__(mode, capacity, seed)
        self.frontier_handles = frontier_handles
        self.num_frontier = num_frontier
        self.n_ingested = 0
        self._push_futs: list = []

    def ingest(self, items: list[tuple[str, int]]) -> None:
        import ray

        self.n_ingested += len(items)
        mask = self.check_and_add([u for u, _ in items])
        per: dict[int, list[tuple[str, int]]] = {}
        for it, new in zip(items, mask):
            if new:
                per.setdefault(shard_of(it[0], self.num_frontier), []).append(it)
        for f, it in per.items():
            self._push_futs.append(self.frontier_handles[f].push.remote(it))
        if len(self._push_futs) >= 64:  # bound the outstanding-push queue
            ray.get(self._push_futs)
            self._push_futs = []

    def flush(self) -> int:
        """Await outstanding frontier pushes; returns total ingested
        (ingest forwards immediately, so settlement == futures landed)."""
        import ray

        if self._push_futs:
            ray.get(self._push_futs)
            self._push_futs = []
        return self.n_ingested


def make_link_router(seen_handles, frontier_handles, retry_policy: str,
                     num_seen: int, num_frontier: int, now_ms: float):
    """Stateless map_batches fn: candidate links hash-partition to the
    seen/router shards and timeouts to the frontier retry lanes — all
    FIRE-AND-FORGET from inside the task (a blocking ray.get in a task
    pins its CPU slot and makes Ray spawn extra workers, silently
    oversubscribing the node). Emits per-row ``n_links`` so the driver
    can settle counters against the shards at termination."""

    def route(batch: pa.Table) -> pa.Table:
        statuses = batch.column("status").to_pylist()
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_numpy()
        links_col = batch.column("links").to_pylist()
        n_links = np.zeros(len(batch), dtype=np.int32)

        # ---- candidate links → seen/router shards (first discovery wins)
        per_seen: list[list[tuple[str, int]]] = [[] for _ in range(num_seen)]
        for i, (st, links, d) in enumerate(zip(statuses, links_col, depths)):
            if st != "ok":
                continue
            nd = int(d) + 1
            n_links[i] = len(links)
            for u in links:
                per_seen[shard_of(u, num_seen)].append((u, nd))
        for s, items in enumerate(per_seen):
            if items:
                seen_handles[s].ingest.remote(items)

        # ---- timeouts → retry lanes (retry.rs:24-36 accounting); the
        # attempt number rides along so redelivered batches (Ray task
        # retry) are recognized as stale and ignored — exactly-once
        # retry accounting without coordination ----
        if retry_policy != "no":
            attempts = batch.column("attempt").to_numpy()
            per_retry: list[list[tuple[str, int, int]]] = [
                [] for _ in range(num_frontier)
            ]
            for st, u, d, at in zip(statuses, urls, depths, attempts):
                if st == "timeout":
                    per_retry[shard_of(u, num_frontier)].append(
                        (u, int(d), int(at))
                    )
            for f, items in enumerate(per_retry):
                if items:
                    frontier_handles[f].keep_retry_batch.remote(items, now_ms)

        return batch.drop_columns(["links"]).append_column(
            "n_links", pa.array(n_links, pa.int32())
        )

    return route


class RayCrawler:
    """Scaled crawl over a synthetic world stored as Arrow tables."""

    def __init__(self, cfg: CrawlConfig, pages: pa.Table, images: pa.Table,
                 robots_map: dict[str, str], out_dir: str, world_seed: int = 42,
                 img_bounds: tuple[int, int] = (16, 40),
                 pages_ref=None, images_ref=None):
        self.cfg = cfg
        self.img_bounds = img_bounds
        # combine chunks ONCE here (no-op when the caller pre-combined):
        # a worker-side combine_chunks would copy the whole broadcast
        # table in every worker (O(workers x table) memory traffic)
        self.pages = pages.combine_chunks()
        self.images = images.combine_chunks()
        # callers may pass session-cached broadcast refs so repeated
        # crawls don't re-put multi-GB tables into the object store
        self._pages_ref = pages_ref
        self._images_ref = images_ref
        self.robots_map = robots_map
        self.out_dir = out_dir
        self.world_seed = world_seed
        self.filters = FilterSpec(tuple(cfg.ignore_regexes), cfg.allow_domains)
        self.stats = CrawlStats()
        self.wave = 0
        self._stop_requested = False

    # ------------------------------------------------------------------
    def _spawn_state(self, ray):
        cfg = self.cfg
        seen_cls = ray.remote(SeenRouterShard)
        frontier_cls = ray.remote(FrontierShard)
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
                cfg.host_rate_per_sec,
                cfg.host_burst,
            )
            for i in range(cfg.num_frontier_shards)
        ]
        self.seen = [
            seen_cls.remote(
                "exact" if cfg.seen_mode != "cuckoo" else "cuckoo",
                1 << 18,
                i,
                self.frontier,
                cfg.num_frontier_shards,
            )
            for i in range(cfg.num_seen_shards)
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
        """Continuous-dispatch crawl: up to ``max_inflight_waves`` wave
        pipelines run concurrently (mirrors the reference's re-dispatch-
        on-completion loop, workload.rs:151-176, rather than a global
        barrier per wave); the frontier shards absorb pushes from running
        waves while the next wave drains. Limit runs fall back to one
        in-flight wave so the overshoot stays bounded by one wave."""
        from concurrent.futures import FIRST_COMPLETED
        from concurrent.futures import ThreadPoolExecutor
        from concurrent.futures import wait as fwait

        import ray
        import ray.data as rd

        _stub_fsspec_http_once()
        cfg = self.cfg
        if not (resume and cfg.checkpoint_dir) and os.path.isdir(self.out_dir):
            import shutil

            shutil.rmtree(self.out_dir)  # fresh run: drop stale wave dirs
        os.makedirs(self.out_dir, exist_ok=True)
        self._spawn_state(ray)

        start_wave = 0
        if resume and cfg.checkpoint_dir:
            start_wave = self._restore_checkpoint(ray)
            # a killed run may have half-written newer wave dirs: drop any
            # wave output past the checkpoint, then redo it
            for d in os.listdir(self.out_dir):
                if d.startswith("wave=") and int(d.split("=")[1]) >= start_wave:
                    import shutil

                    shutil.rmtree(os.path.join(self.out_dir, d))
        if start_wave == 0:
            if (cfg.seeds_canonical and not cfg.ignore_regexes
                    and cfg.allow_domains is None):
                seeds = sorted(set(cfg.seeds))  # cfg.rs:338-342 minus the
                # canonicalize pass (inputs already canonical)
            else:
                seeds = clean_seeds(cfg.seeds, self.filters)
            if not seeds:
                return self.stats
            self._seed_frontier(ray, seeds)

        pages_ref = self._pages_ref or ray.put(self.pages)
        images_ref = self._images_ref or ray.put(self.images)
        self.wave = start_wave
        n_inflight = 1 if cfg.limit is not None else max(1, cfg.max_inflight_waves)
        executor = ThreadPoolExecutor(max_workers=n_inflight)
        inflight: dict = {}

        def build_wave_ds(entries):
            # split the wave into blocks so the fetch stage fans out (a
            # single from_arrow block would serialize on one worker)
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
                        fn_constructor_args=(pages_ref, self.filters,
                                             cfg.extractor),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                        concurrency=(1, cfg.engines),
                        num_cpus=1,
                    )
                    .map_batches(
                        Validator,
                        fn_constructor_args=(images_ref, self.world_seed),
                        fn_constructor_kwargs={
                            "img_min": self.img_bounds[0],
                            "img_max": self.img_bounds[1],
                        },
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                        concurrency=(1, cfg.engines),
                        num_cpus=1,
                    )
                )
            else:
                # stateless tasks + per-worker-process broadcast-state
                # cache: the page/image index builds once per worker for
                # the whole crawl, not per wave
                ds = (
                    rd.from_arrow(blocks)
                    .map_batches(
                        make_fetch_fn(pages_ref, self.filters, cfg.extractor),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    )
                    .map_batches(
                        make_validate_fn(images_ref, self.world_seed,
                                         img_min=self.img_bounds[0],
                                         img_max=self.img_bounds[1]),
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    )
                )
            return ds, len(blocks)

        def run_wave(entries, wave_idx, now_ms):
            wave_dir = os.path.join(self.out_dir, f"wave={wave_idx:05d}")
            router = make_link_router(
                self.seen, self.frontier, cfg.retry_policy,
                cfg.num_seen_shards, cfg.num_frontier_shards, now_ms,
            )
            ds, n_blocks = build_wave_ds(entries)
            ds = ds.map_batches(router, batch_format="pyarrow",
                                batch_size=max(2048, cfg.fetch_batch_size))
            t0 = time.monotonic()
            ds.write_parquet(wave_dir)
            if wave_idx == 0:
                # keep the big wave's per-stage breakdown for tuning
                try:
                    with open(os.path.join(self.out_dir,
                                           "_wave0_stats.txt"), "w") as fh:
                        fh.write(ds.stats())
                except Exception:
                    pass
            if os.environ.get("DOONOP_WAVE_TIMING"):
                print(
                    f"wave={wave_idx} n={len(entries)} blocks={n_blocks} "
                    f"pipe={time.monotonic() - t0:.2f}s",
                    flush=True,
                )
            # light read-back of one column for the wave's stats
            wt = pq.read_table(wave_dir, columns=["status", "n_links"])
            st = wt.column("status").to_pylist()
            return {
                "wave": wave_idx,
                "visited": len(st),
                "ok": sum(s == "ok" for s in st),
                "timeout": sum(s == "timeout" for s in st),
                "error": sum(s == "error" for s in st),
                "links": int(pa.compute.sum(wt.column("n_links")).as_py() or 0),
                "wall_sec": round(time.monotonic() - t0, 3),
                "wave_dir": wave_dir,
            }

        routed = self._routed = {"links": 0, "retries": 0}
        self.wave_metrics: list[dict] = getattr(self, "wave_metrics", [])

        def absorb(futs):
            for fut in futs:
                c = fut.result()
                del inflight[fut]
                self.wave_metrics.append(c)
                self.stats.visited += c["visited"]
                self.stats.collected += c["ok"]
                routed["links"] += c["links"]
                if cfg.retry_policy != "no":
                    self.stats.retries += c["timeout"]
                    routed["retries"] += c["timeout"]
                else:
                    self.stats.errors += c["timeout"]
                self.stats.errors += c["error"]

        _t = {"drain": 0.0, "settle": 0.0, "wait": 0.0, "loops": 0}
        # drains are PREFETCHED: the next wave's frontier drain runs while
        # current waves execute, so drain latency (actor queueing under a
        # busy node) never sits on the dispatch critical path. Limit runs
        # stay synchronous so the budget sees fresh collected counts.
        use_prefetch = cfg.limit is None
        prefetch = None  # (now_ms, [drain futures])
        pending: list = []  # coalesced small drains awaiting critical mass

        def start_drain():
            budget = cfg.wave_size()
            if cfg.limit is not None:
                budget = max(1, min(budget, cfg.limit - self.stats.collected))
            per_shard = max(1, budget // cfg.num_frontier_shards)
            now_ms = time.monotonic() * 1000.0
            return (
                now_ms,
                [
                    f.drain.remote(per_shard, now_ms, cfg.max_per_host_per_wave)
                    for f in self.frontier
                ],
            )

        while True:
            _t["loops"] += 1
            absorb([f for f in list(inflight) if f.done()])

            closed = (
                cfg.limit is not None
                and self.stats.collected > 0
                and self.stats.collected >= cfg.limit
            )
            can_submit = (
                not closed
                and not self._stop_requested
                and (max_waves is None or self.wave < max_waves)
                and len(inflight) < n_inflight
            )

            entries = []
            if can_submit:
                if prefetch is None:
                    prefetch = start_drain()
                now_ms, futs = prefetch
                prefetch = None
                _t0 = time.monotonic()
                drains = ray.get(futs)
                entries = pending + [e for d in drains for e in d]
                pending = []
                _dt = time.monotonic() - _t0
                _t["drain"] += _dt
                if _dt > 0.2 and os.environ.get("DOONOP_WAVE_TIMING"):
                    print(f"SLOWDRAIN {_dt:.2f}s n={len(entries)} inflight={len(inflight)}",
                          flush=True)
                if (entries and inflight and cfg.limit is None
                        and len(entries) < cfg.min_wave_size):
                    # tail coalescing: a tiny wave would pay full dataset
                    # startup; hold it until a running wave lands (more
                    # links/retries arrive meanwhile) — when nothing is in
                    # flight it submits regardless, so no livelock
                    pending = entries
                    entries = []
                    fwait(list(inflight), return_when=FIRST_COMPLETED)
                    continue

            if entries:
                fut = executor.submit(run_wave, entries, self.wave, now_ms)
                inflight[fut] = self.wave
                self.wave += 1
                if use_prefetch and prefetch is None and (
                    max_waves is None or self.wave < max_waves
                ):
                    prefetch = start_drain()
                if cfg.checkpoint_dir and (
                    self.wave % cfg.checkpoint_every_waves == 0
                ):
                    # checkpoint barrier: quiesce so the snapshot is a
                    # consistent cut across frontier + seen + artifacts
                    fwait(list(inflight))
                    absorb(list(inflight))
                    self._write_checkpoint(ray, wave_done=self.wave - 1)
                continue

            if inflight:
                _t0 = time.monotonic()
                fwait(list(inflight), return_when=FIRST_COMPLETED)
                _t["wait"] += time.monotonic() - _t0
                continue
            # nothing in flight and nothing drained: finish or spin once
            if closed or self._stop_requested or (
                max_waves is not None and self.wave >= max_waves
            ):
                break
            # settle the fire-and-forget routing: every candidate link and
            # retry emitted by completed waves must have reached its shard
            # (and seen→frontier forwards must have landed) before
            # is_empty can be trusted
            _t0 = time.monotonic()
            ingested = sum(ray.get([s_.flush.remote() for s_ in self.seen]))
            retry_rcvd = sum(
                ray.get([f.retry_received.remote() for f in self.frontier])
            )
            if ingested < routed["links"] or retry_rcvd < routed["retries"]:
                _t["settle"] += time.monotonic() - _t0
                time.sleep(0.02)
                continue
            empty = all(ray.get([f.is_empty.remote() for f in self.frontier]))
            _t["settle"] += time.monotonic() - _t0
            if empty:
                break

        executor.shutdown(wait=True)
        if pending:
            # coalesced-but-unsubmitted entries go back to their shards so
            # a graceful stop / final checkpoint never loses them (attempt
            # counts already live in the frontier's retry state)
            per: dict[int, list[tuple[str, int]]] = {}
            for url, _attempt, depth in pending:
                per.setdefault(
                    shard_of(url, cfg.num_frontier_shards), []
                ).append((url, depth))
            ray.get([
                self.frontier[f].push.remote(it) for f, it in per.items()
            ])
            pending = []
        if self._stop_requested and cfg.checkpoint_dir and self.wave > 0:
            # graceful-shutdown checkpoint (T12 analog, main.rs:41-48 /
            # workload.rs:191-195: drain in-flight, persist, exit)
            self._write_checkpoint(ray, wave_done=self.wave - 1)
        self._write_metrics()
        if os.environ.get("DOONOP_WAVE_TIMING"):
            print(f"LOOP {_t}", flush=True)
        return self.stats

    # ------------------------------------------------------------------
    def request_stop(self):
        """Graceful shutdown: stop dispatching, drain in-flight waves,
        checkpoint, return (the reference's ctrl-c path, T12)."""
        self._stop_requested = True

    def install_signal_checkpoint(self):
        """Route SIGINT/SIGTERM to request_stop(); returns a restore fn."""
        import signal

        prev_int = signal.getsignal(signal.SIGINT)
        prev_term = signal.getsignal(signal.SIGTERM)

        def handler(signum, frame):
            self.request_stop()

        signal.signal(signal.SIGINT, handler)
        signal.signal(signal.SIGTERM, handler)

        def restore():
            signal.signal(signal.SIGINT, prev_int)
            signal.signal(signal.SIGTERM, prev_term)

        return restore

    @staticmethod
    def export_jsonl(artifact_dir: str, dest_dir: str) -> None:
        """K1 analog (main.rs:36-38): export collected artifacts as JSON
        lines via a streaming Dataset (completion ORDER is a j=1 notion;
        run_conformance returns the ordered data list for that mode)."""
        import ray.data as rd

        ds = rd.read_parquet(artifact_dir)
        ds.write_json(dest_dir)

    def _write_metrics(self):
        """Per-wave lineage + metrics rows (north_rule): which wave dir
        holds which rows, with status counts and wall time — the audit
        trail a resume inspects alongside the checkpoint manifests."""
        if not self.wave_metrics:
            return
        rows = sorted(self.wave_metrics, key=lambda r: r["wave"])
        t = pa.table(
            {
                "wave": pa.array([r["wave"] for r in rows], pa.int32()),
                "visited": pa.array([r["visited"] for r in rows], pa.int64()),
                "collected": pa.array([r["ok"] for r in rows], pa.int64()),
                "timeouts": pa.array([r["timeout"] for r in rows], pa.int64()),
                "errors": pa.array([r["error"] for r in rows], pa.int64()),
                "links_routed": pa.array([r["links"] for r in rows], pa.int64()),
                "wall_sec": pa.array([r["wall_sec"] for r in rows], pa.float64()),
                "wave_dir": pa.array([r["wave_dir"] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(self.out_dir, "_wave_metrics.parquet"))

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
        # settle the fire-and-forget routing before snapshotting: Ray
        # gives no cross-caller actor-task ordering, so links/retries
        # emitted by completed waves can still be in transit when the
        # quiesce barrier passes. Loop on the same routed-counter
        # settlement the terminal drain uses — otherwise a resume from
        # this checkpoint silently drops the in-transit URLs (absent
        # from both the seen set and the frontier).
        routed = getattr(self, "_routed", None)
        while True:
            ingested = sum(ray.get([s.flush.remote() for s in self.seen]))
            if routed is None:
                break
            retry_rcvd = sum(
                ray.get([f.retry_received.remote() for f in self.frontier])
            )
            if (ingested >= routed["links"]
                    and retry_rcvd >= routed["retries"]):
                break
            time.sleep(0.02)
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
                    robots_map: dict[str, str], world_seed: int = 42,
                    img_bounds: tuple[int, int] = (16, 40)):
    """Single-in-flight crawl using the engine's own operator classes
    (FrontierCore + SeenCore + RobotsCache + Fetcher + Validator batch
    fns applied inline) — produces the reference's exact j=1 order."""
    filters = FilterSpec(tuple(cfg.ignore_regexes), cfg.allow_domains)
    fetcher = Fetcher(pages, filters, cfg.extractor)
    validator = Validator(images, world_seed, img_min=img_bounds[0], img_max=img_bounds[1])
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
