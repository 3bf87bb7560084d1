"""Flagship crawl pipelines parameterized by scale factor — the
queries()-facing entry points for the crawl engine itself.

The synthetic world is deterministic in (seed=42, scale tier) and cached
under /tmp so repeated queries()/bench calls don't regenerate it. Scale
tiers map the driver's sf dirs onto world sizes (FIXTURES.md §7):
sf0.001 → tiny, sf0.01 → small, sf0.1 → bench.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..synth import World, WorldParams, build_world, read_world

# bench tier ("0.1") uses larger images so the per-page decode+validate
# compute matches a realistic image-crawl payload (scaling evidence needs
# compute-dominated waves, BASELINE.md)
_TIERS = {
    "0.001": dict(n_hosts=8, pages_per_host=30, img=(16, 40)),
    "0.01": dict(n_hosts=16, pages_per_host=150, img=(16, 40)),
    "0.1": dict(n_hosts=40, pages_per_host=600, img=(56, 72)),
    # 4x world for the two-cluster-size scaling evidence: enough backlog
    # that wave pipelines stay overlapped and compute-dominated
    "scale": dict(n_hosts=80, pages_per_host=1200, img=(56, 72)),
    # heavy-image variant: per-page decode+validate compute dominates the
    # coordination floor, so the two-parallelism comparison measures the
    # pipeline rather than the scheduler
    "scaleh": dict(n_hosts=80, pages_per_host=1200, img=(96, 128)),
    # quarter-size heavy world for the BURST scaling protocol (round-5):
    # small enough that a full 8-way + 32-way timed pair fits inside one
    # of this host's sub-minute calm windows, heavy enough to stay
    # compute-dominated (see tools/burst_scaling.py)
    "scalehq": dict(n_hosts=40, pages_per_host=600, img=(96, 128)),
    # skew-adversarial twin of the bench tier: SAME total page count
    # and payload sizes as "0.1", but host 0 holds 50% of all pages
    # (and, via intra-host links, ~40%+ of all link targets) — the
    # measured evidence that salted host expansion + politeness bound
    # the hot reducer (bench.py --skew reports skew/uniform wall-time)
    "skew": dict(n_hosts=40, pages_per_host=600, img=(56, 72), hot=0.5),
}
_WORLD_CACHE_VERSION = 6  # v6: cheap-truth expected_pixels/_caption rewrite
_CACHE: dict[str, World] = {}
# shared session marker (ops.common.session_put owns the state machine;
# the alias keeps the mutable list poke-able for the stale-session test)
from ..ops.common import _SPUT_SESSION as _REF_SESSION  # noqa: E402

_REF_TOKENS = iter(range(1, 1 << 62))


def _next_ref_token() -> int:
    return next(_REF_TOKENS)


def _ref_for(tier: str, w, table: str):
    """Session-cached ``ray.put`` ref of ONE (pre-combined) world table.

    Lazy per table — an image-only session must not pay object-store
    residency for the pages table (GBs at the scale tiers). Session
    validity / dangling-ref invalidation lives in the shared
    ``ops.common.session_put`` state machine. The key carries the
    World's build token (a process-monotonic counter stamped by
    ``world_for``) so a World REBUILT for the same tier within one Ray
    session (e.g. a cleared ``_CACHE`` in tests) mints a fresh ref
    instead of serving the stale broadcast."""
    from ..ops.common import session_put

    tok = getattr(w, "_ref_token", None)
    if tok is None:
        tok = _next_ref_token()
        w._ref_token = tok
    # evict_prefix_len=3: a rebuilt World (fresh token) for the same
    # (tier, table) evicts the previous build's broadcast ref
    return session_put(("world", tier, table, tok),
                       lambda: getattr(w, table), evict_prefix_len=3)


def _refs_for(tier: str, w):
    """(pages_ref, images_ref) — both tables, for the crawl path."""
    return _ref_for(tier, w, "pages"), _ref_for(tier, w, "images")


def tier_of(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name in ("scale", "scaleh", "scalehq", "skew"):
        return name
    sf = name.replace("sf", "") if name.startswith("sf") else "0.001"
    return sf if sf in _TIERS else "0.001"


def world_params(tier: str) -> WorldParams:
    t = _TIERS[tier]
    return WorldParams(
        seed=42,
        n_hosts=t["n_hosts"],
        pages_per_host=t["pages_per_host"],
        fanout=6,
        p_cross=0.3,
        p_dead=0.03,
        p_invalid=0.03,
        n_seeds=t["n_hosts"],
        img_min=t["img"][0],
        img_max=t["img"][1],
        hot_host_frac=t.get("hot"),
    )


def world_for(sf_dir: str, cache_root: str = "/tmp/doonop_worlds") -> World:
    tier = tier_of(sf_dir)
    if tier in _CACHE:
        return _CACHE[tier]
    path = os.path.join(cache_root, f"tier_{tier}_v{_WORLD_CACHE_VERSION}")
    marker = os.path.join(path, "_complete")
    if os.path.exists(marker):
        w = read_world(path)
        w.params = world_params(tier)
    else:
        w = build_world(world_params(tier))
        w.write(path)
        with open(marker, "w") as fh:
            fh.write("ok")
    from ..stages.fetch import prep_images_table

    w.pages = w.pages.combine_chunks()
    w.images = prep_images_table(w.images)
    _CACHE[tier] = w
    return w


def _crawl_cfg(w: World, tier: str, **kw) -> CrawlConfig:
    scale = {"0.001": (4, 64, 16), "0.01": (8, 512, 64),
             "0.1": (32, 8192, 512), "scale": (32, 16384, 512),
             "scaleh": (32, 16384, 512), "scalehq": (32, 8192, 512),
             "skew": (32, 8192, 512)}[tier]
    engines, wave, batch = scale
    base = dict(
        seeds=w.seeds.column("url").to_pylist(),
        use_robots=True,
        retry_threshold_ms=0,
        engines=engines,
        wave_budget=wave,
        fetch_batch_size=batch,
        num_seen_shards=max(1, engines // 8),
        num_frontier_shards=max(1, engines // 8),
        max_inflight_waves=4,  # organic ramp benefits from deeper overlap
        streaming=True,  # round-2: one long-lived chunk-task loop (limit
                         # runs auto-fall back to wave mode)
        # collect_artifact_meta stays at its scale-safe default (False):
        # results come from the partitioned parquet the chunks persist —
        # a 10^10-visit crawl must not concatenate artifact columns on
        # the driver (round-2 VERDICT #2)
    )
    base.update(kw)
    return CrawlConfig(**base)


def _run_crawl(sf_dir: str, out_dir: str | None, bulk_seed: bool,
               **cfg_kw):
    """Run the flagship crawl, returning (crawler, out_dir) without
    reading the artifact output back — consumers that keep processing
    distributed (e.g. ``build_training_dataset``) read the partitioned
    parquet themselves."""
    tier = tier_of(sf_dir)
    w = world_for(sf_dir)
    out_dir = out_dir or f"/tmp/doonop_out/flagship_{tier}_{os.getpid()}"
    seeds_ds = None
    if bulk_seed:
        # full frontier from wave 0 (reference EP3 / sitemap bulk path):
        # the seed list is fed as a DATASET and the crawler seeds its
        # shards distributed — no driver-side url list (round-2 VERDICT #3)
        import ray.data as rd

        url_tbl = w.pages.select(["url"])
        step = 8192
        seeds_ds = rd.from_arrow(
            [url_tbl.slice(i, step) for i in range(0, len(url_tbl), step)])
        cfg_kw.setdefault("wave_budget", len(url_tbl) + 1024)
        cfg_kw.setdefault("max_inflight_waves", 2)
        cfg_kw.setdefault("seeds_canonical", True)
    cfg = _crawl_cfg(w, tier, **cfg_kw)
    from .crawler import RayCrawler

    pages_ref, images_ref = _refs_for(tier, w)
    crawler = RayCrawler(cfg, w.pages, w.images, w.robots_map(), out_dir,
                         world_seed=w.params.seed,
                         img_bounds=(w.params.img_min, w.params.img_max),
                         pages_ref=pages_ref, images_ref=images_ref,
                         seeds_ds=seeds_ds)
    crawler.run()
    return crawler, out_dir


_ART_COLS = ["url", "depth", "status", "image_id", "caption_ok",
             "pixel_ok", "psnr_db"]


class _ArtifactReader:
    """Incremental reader of the crawl's persisted artifact parts.

    The streaming crawler publishes each chunk's part file with an
    atomic rename, so any visible ``part-*.parquet`` is complete; this
    thread polls the out dir during the crawl and reads new parts as
    they appear, overlapping the (formerly post-crawl) result read with
    the tail of the crawl itself (round-2 VERDICT scaling item: overlap
    the final artifact read with the tail window). ``finish()`` does one
    last full scan — catching wave-mode files too, which don't match the
    streaming part naming — after all writers have stopped."""

    def __init__(self, out_dir: str, columns: list[str]):
        import threading

        self.out_dir = out_dir
        self.columns = columns
        self.tables: dict[str, object] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._poll, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _scan(self, pattern_only: bool = True):
        for dp, _, fs in os.walk(self.out_dir):
            for f in fs:
                # skip metadata/hidden files (_wave_metrics.parquet etc.
                # — same convention pyarrow dataset discovery applies)
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                if pattern_only and not f.startswith("part-"):
                    continue
                p = os.path.join(dp, f)
                if p in self.tables:
                    continue
                try:
                    self.tables[p] = pq.read_table(p, columns=self.columns)
                except Exception:
                    if pattern_only:
                        self.tables.pop(p, None)  # retry next scan
                    else:
                        raise

    def _poll(self):
        while not self._stop.wait(0.05):
            self._scan()

    def finish(self):
        self._stop.set()
        self._thread.join()
        self._scan(pattern_only=False)  # post-run: all writers stopped
        import pyarrow as pa

        if not self.tables:
            return None
        return pa.concat_tables(self.tables.values())


def flagship_crawl(sf_dir: str, out_dir: str | None = None,
                   bulk_seed: bool = False, **cfg_kw) -> pd.DataFrame:
    """Scaled crawl of the tier's world: fetch → decode+validate →
    link routing; returns the per-visit artifact table.

    ``bulk_seed=True`` seeds the frontier with every page URL (the
    sitemap bulk-seeding path, reference EP3 / scripts/sitemap.sh) —
    the steady-state full-frontier throughput mode the 10^10-URL
    metric describes; the default organic mode grows the frontier from
    per-host seeds.
    """
    out_dir = out_dir or \
        f"/tmp/doonop_out/flagship_{tier_of(sf_dir)}_{os.getpid()}"
    # pre-clean so the incremental reader can never pick up a stale run's
    # files (the crawler's own fresh-run rmtree would race the reader)
    if os.path.isdir(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    # no incremental reader when the chunks carry the meta themselves —
    # it would read (and hold) the whole artifact table a second time
    want_reader = not cfg_kw.get("collect_artifact_meta", False)
    reader = (_ArtifactReader(out_dir, _ART_COLS).start()
              if want_reader else None)
    try:
        crawler, out_dir = _run_crawl(sf_dir, out_dir, bulk_seed, **cfg_kw)
    except BaseException:
        if reader is not None:
            reader._stop.set()
        raise
    import pyarrow as pa

    meta = getattr(crawler, "_artifact_meta", None)
    if meta:  # opt-in (collect_artifact_meta=True): columns rode the chunks
        reader._stop.set()
        t = pa.concat_tables(meta)
    else:  # scale-safe default: the overlapped read of the partitioned output
        if reader is None:
            # meta was requested but the run produced none (e.g. a limit
            # run falls back to wave mode): one-shot post-run scan
            reader = _ArtifactReader(out_dir, _ART_COLS)
            reader._stop.set()
            reader._thread.start()
        t = reader.finish()
        if t is None:  # empty run: typed empty artifact table
            t = pa.table({
                "url": pa.array([], pa.string()),
                "depth": pa.array([], pa.int32()),
                "status": pa.array([], pa.string()),
                "image_id": pa.array([], pa.string()),
                "caption_ok": pa.array([], pa.bool_()),
                "pixel_ok": pa.array([], pa.bool_()),
                "psnr_db": pa.array([], pa.float64()),
            })
    df = t.to_pandas()
    return df.sort_values(["url", "status"], kind="mergesort").reset_index(drop=True)


def conformance_order(sf_dir: str) -> pd.DataFrame:
    """Reference-exact j=1 crawl order of the tiny world: (seq, url)."""
    w = world_for("sf0.001")  # conformance is pinned at the tiny tier
    from .crawler import run_conformance

    cfg = _crawl_cfg(w, "0.001")
    res = run_conformance(cfg, w.pages, w.images, w.robots_map(), w.params.seed,
                          img_bounds=(w.params.img_min, w.params.img_max))
    return pd.DataFrame(
        {"seq": range(len(res["order"])), "url": res["order"]}
    )


def image_validate(sf_dir: str) -> pd.DataFrame:
    """Decode + validate every image of the tier's world through the Ray
    pipeline (the minimum slice: read → map_batches(validate) → table)."""
    import ray
    import ray.data as rd

    from ..stages.fetch import make_validate_fn

    w = world_for(sf_dir)
    images_ref = ray.put(w.images)
    ids = w.images.select(["image_id"])
    n_blocks = max(1, min(32, len(ids) // 256))
    step = -(-len(ids) // n_blocks)
    import pyarrow as pa

    blocks = []
    for i in range(0, len(ids), step):
        sl = ids.slice(i, step)
        blocks.append(
            pa.table(
                {
                    "url": pa.array([""] * len(sl)),
                    "depth": pa.array([0] * len(sl), pa.int32()),
                    "status": pa.array(["ok"] * len(sl)),
                    "image_id": sl.column("image_id"),
                }
            )
        )
    out = (
        rd.from_arrow(blocks)
        .map_batches(make_validate_fn(images_ref, w.params.seed,
                                      img_min=w.params.img_min,
                                      img_max=w.params.img_max),
                     batch_format="pyarrow", batch_size=256)
        .to_pandas()[["image_id", "fmt", "caption_ok", "pixel_ok", "psnr_db"]]
    )
    return out.sort_values("image_id", kind="mergesort").reset_index(drop=True)


def crawl_host_counts(sf_dir: str) -> pd.DataFrame:
    """groupby(host) over the flagship artifacts — the wave-expansion
    aggregate shape (north_star: per-host counts/budgets drive politeness;
    skewed hosts are the politeness cap's target). Vectorized host
    extraction + groupby; rows-only check (artifacts are not a DuckDB
    view)."""
    import pyarrow.compute as pcmp
    from ray.data.aggregate import Count, Sum

    import ray.data as rd

    tier = tier_of(sf_dir)
    out_dir = f"/tmp/doonop_out/flagship_{tier}_{os.getpid()}"
    if not os.path.isdir(out_dir):
        flagship_crawl(sf_dir, out_dir=out_dir)

    def add_host(t):
        host = pcmp.extract_regex(t["url"], r"^https?://(?P<host>[^/]+)/")
        return t.append_column(
            "host", pcmp.struct_field(host, "host")
        ).append_column(
            "is_ok", pcmp.cast(pcmp.equal(t["status"], "ok"), "int64")
        )

    df = (
        rd.read_parquet(out_dir, columns=["url", "status"])
        .map_batches(add_host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="n_visits"), Sum("is_ok", alias_name="n_ok"))
        .to_pandas()
    )
    return df.sort_values("host", kind="mergesort").reset_index(drop=True)


def image_phash_neardup(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """Near-duplicate image pairs by perceptual hash: band the 64-bit
    phash into 4x16-bit keys (a pair within hamming<=6 collides on >=1
    band unless all differing bits straddle bands), then verify exact
    hamming INSIDE each colliding bucket.

    Round-2: fully distributed — each band row carries the image's
    phash, and ``grouped_apply`` (sort + block-local bucket detection)
    skips singleton buckets for free and runs the O(bucket²) popcount
    verify only where >=2 images collide. Nothing bucket- or
    corpus-sized reaches the driver; the final cross-band pair dedup is
    O(output). SURVEY §2d extension enabled by the input_hint phash
    column."""
    import numpy as np
    import pandas as pd_
    import pyarrow as pa

    import ray.data as rd

    from ..ops.common import grouped_apply

    w = world_for(sf_dir)
    ids_tbl = w.images.select(["image_id", "phash"])

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("image_id").combine_chunks()
        ph = t.column("phash").to_numpy().view(np.uint64)
        n = len(t)
        keys = np.empty((4, n), dtype=np.uint64)
        for b in range(4):
            keys[b] = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)) \
                | (np.uint64(b) << np.uint64(16))
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 4))
        return pa.table({
            "image_id": ids.take(idx),
            "key": pa.array(keys.reshape(-1), pa.uint64()),
            "phash": pa.array(np.tile(ph, 4), pa.uint64()),
        })

    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "hamming": pa.array([], pa.int64())})

    def bucket_verify(g: pa.Table) -> pa.Table:
        ph_of: dict[str, int] = {}
        for i, d in zip(g["image_id"].to_pylist(),
                        g["phash"].to_numpy(zero_copy_only=False)):
            ph_of.setdefault(i, int(d))
        ids = sorted(ph_of)
        out_a, out_b, out_h = [], [], []
        for i, a in enumerate(ids):
            pa_ = ph_of[a]
            for b in ids[i + 1:]:
                d = bin(pa_ ^ ph_of[b]).count("1")
                if d <= max_hamming:
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(d)
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string()),
                         "hamming": pa.array(out_h, pa.int64())})

    out = grouped_apply(
        rd.from_arrow(ids_tbl).map_batches(band_rows, batch_format="pyarrow"),
        "key", bucket_verify, empty, min_group_size=2,
    ).to_pandas()
    if out.empty:
        return pd_.DataFrame({"a": pd_.Series([], dtype="str"),
                              "b": pd_.Series([], dtype="str"),
                              "hamming": pd_.Series([], dtype="int64")})
    out = out.drop_duplicates(subset=["a", "b"])
    out["hamming"] = out["hamming"].astype("int64")
    return out.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)


def crawl_polite(sf_dir: str) -> pd.DataFrame:
    """Flagship crawl with per-host politeness token buckets engaged
    (north_rule politeness budget; over-cap URLs defer, never drop).
    Uses the TIME-BASED token buckets, whose semantics are identical in
    wave and streaming mode (round-2 VERDICT #6: the per-wave cap
    silently weakened to a per-poll cap under streaming); generous
    rate/burst so the politeness machinery is exercised without making
    the query wall-time rate-bound. Returns the artifact table;
    rows-only check — pinned against the politeness unit tests +
    set-equality in tests/."""
    return flagship_crawl(
        sf_dir,
        out_dir=f"/tmp/doonop_out/polite_{tier_of(sf_dir)}_{os.getpid()}",
        host_rate_per_sec=2000.0, host_burst=64.0,
    )


def frontier_host_budgets(sf_dir: str, per_host_budget: int = 64,
                          salt_k: int = 8) -> pd.DataFrame:
    """The north_star wave-expansion shuffle, stated explicitly: explode
    candidate links → groupby(SALTED host) partial counts → merge salt
    buckets → sort desc → per-host release budgets. Salting key
    (host, crc32(url) % k) bounds any single reducer's share of a
    Zipf-hot host; the merge of k salt partials is tiny. Rows-only
    (validated against a driver-side count in tests)."""
    import zlib as _z

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..url import host_of, make_absolute

    w = world_for(sf_dir)

    def explode_salted(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        links = t.column("links").to_pylist()
        hosts, salts = [], []
        for base, ls in zip(urls, links):
            for href in ls:
                a = make_absolute(base, href)
                if a is None:
                    continue
                h = host_of(a)
                if h:
                    hosts.append(h)
                    salts.append(_z.crc32(a.encode()) % salt_k)
        tt = pa.table({"host": pa.array(hosts, pa.string()),
                       "salt": pa.array(salts, pa.int32())})
        # partial aggregation inside the batch BEFORE the shuffle
        return tt.group_by(["host", "salt"]).aggregate([([], "count_all")])

    salted = (
        rd.from_arrow(w.pages.select(["url", "links"]))
        .map_batches(explode_salted, batch_format="pyarrow", batch_size=4096)
        .groupby(["host", "salt"])
        .aggregate(Sum("count_all", alias_name="n"))
    )
    merged = (
        salted.groupby("host")
        .aggregate(Sum("n", alias_name="n_candidates"))
        .to_pandas()
    )
    merged = merged.sort_values(["n_candidates", "host"],
                                ascending=[False, True], kind="mergesort")
    merged["budget"] = merged["n_candidates"].clip(upper=per_host_budget)
    return merged.reset_index(drop=True)


def build_training_dataset(sf_dir: str, out_root: str | None = None) -> pd.DataFrame:
    """The north_star's END PRODUCT: crawl → decode → validate → write
    the VALIDATED image+caption pairs as a training dataset in the
    input_hint schema (image_id, bytes, w, h, fmt, caption, phash),
    stored through the Lance-seam storage layer (``io.py`` — Lance when
    importable, parquet otherwise; identical Arrow schema either way).

    Pipeline (end-to-end distributed — round-2 VERDICT #3: no driver-side
    id list): crawl persists partitioned artifacts → ``read_parquet``
    filters the validated rows per batch → ``grouped_aggregate`` dedups
    the ids (one all-to-all on the short id key) → an actor-pool
    ShardWriter slices each id batch's payloads out of the broadcast
    images table (zero-copy) and writes one dataset file per batch with
    a content-deterministic name (a re-run or task retry overwrites the
    same shard instead of duplicating it — resumable layout). Returns
    the per-shard manifest (path + rows) — the dataset itself lives
    under ``out_root``.
    """
    import pyarrow as pa
    import pyarrow.compute as pcmp
    import ray.data as rd

    from ..io import dataset_path, write_table
    from ..ops.common import grouped_aggregate

    tier = tier_of(sf_dir)
    out_root = out_root or f"/tmp/doonop_out/training_{tier}_{os.getpid()}"
    os.makedirs(out_root, exist_ok=True)

    _run_crawl(sf_dir, f"{out_root}/_crawl", bulk_seed=True)

    def keep_validated(t: pa.Table) -> pa.Table:
        m = pcmp.and_(
            pcmp.and_(pcmp.equal(t["status"], "ok"),
                      pcmp.is_valid(t["image_id"])),
            pcmp.and_(t["caption_ok"], t["pixel_ok"]),
        )
        return pa.table({"image_id": t.filter(m)["image_id"]})

    ids_ds = rd.read_parquet(
        f"{out_root}/_crawl",
        columns=["image_id", "status", "caption_ok", "pixel_ok"],
    ).map_batches(keep_validated, batch_format="pyarrow")
    # retries/revisits can emit an id twice — exact dedup on the short id
    # key (sort-cogroup, nothing corpus-sized on the driver)
    uniq = grouped_aggregate(
        ids_ds, "image_id", [("image_id", "count")]
    ).map_batches(lambda t: t.select(["image_id"]),
                  batch_format="pyarrow").materialize()
    n_ids = uniq.count()
    if n_ids == 0:
        # zero validated ids (ADVICE round-2): typed empty manifest
        return pd.DataFrame({"shard": pd.Series([], dtype="str"),
                             "rows": pd.Series([], dtype="int64")})
    # DETERMINISTIC sharding: shard membership is a pure function of
    # (image_id, n_ids) — physical batch/block boundaries vary run to
    # run, so batch-digest names would rename shards on every rerun.
    # grouped_apply co-locates each shard's full id set; the per-group
    # writer emits shard-{id:05d} with content sorted by image_id.
    n_shards = max(1, -(-n_ids // 4096))

    w = world_for(sf_dir)
    images_ref = _refs_for(tier, w)[1]

    def assign_shard(t):
        import zlib

        import pyarrow as pa_

        sids = [zlib.crc32(s.encode()) % n_shards
                for s in t["image_id"].to_pylist()]
        return t.append_column("shard_id", pa_.array(sids, pa_.int32()))

    def write_shard(g):
        import pyarrow as pa_
        import pyarrow.compute as pc_

        from ..stages.fetch import _deref

        tab = _deref(images_ref)
        ids = g["image_id"].combine_chunks().sort()
        idx = pc_.index_in(ids, value_set=tab.column("image_id"))
        rows = tab.take(idx)
        sid = int(g["shard_id"][0].as_py())
        path = dataset_path(out_root, f"shard-{sid:05d}")
        written = write_table(rows, path)
        return pa_.table({
            "shard": pa_.array([written], pa_.string()),
            "rows": pa_.array([len(rows)], pa_.int64()),
        })

    from ..ops.common import grouped_apply

    empty = pa.table({"shard": pa.array([], pa.string()),
                      "rows": pa.array([], pa.int64())})
    manifest = grouped_apply(
        uniq.map_batches(assign_shard, batch_format="pyarrow"),
        "shard_id", write_shard, empty,
    ).to_pandas()
    return manifest.sort_values("shard").reset_index(drop=True)


def training_dataset_stats(sf_dir: str) -> pd.DataFrame:
    """CONSUMER of the crawl's end product: builds (or reuses) the
    training dataset, reads the shards back distributed through the
    Lance-seam reader (``io.ray_read``), and aggregates per-format
    row counts + payload/pixel stats — the shape a training-side data
    loader's sanity pass takes. Verifies end-product integrity: the
    aggregated row count must equal the manifest's."""
    import pyarrow as pa
    import pyarrow.compute as pcmp
    from ray.data.aggregate import Max, Min, Sum

    from ..io import ray_read

    tier = tier_of(sf_dir)
    out_root = f"/tmp/doonop_out/training_{tier}_{os.getpid()}"
    manifest_rows = None
    if not os.path.isdir(out_root) or not any(
            f.startswith("shard-") for f in os.listdir(out_root)):
        manifest = build_training_dataset(sf_dir, out_root=out_root)
        manifest_rows = int(manifest["rows"].sum())
    if not any(f.startswith("shard-") for f in os.listdir(out_root)):
        # zero validated images: no shards to read — empty stats frame
        return pd.DataFrame({
            "fmt": pd.Series([], dtype="str"),
            "total_bytes": pd.Series([], dtype="int64"),
            "total_px": pd.Series([], dtype="int64"),
            "min_px": pd.Series([], dtype="int64"),
            "max_px": pd.Series([], dtype="int64"),
            "n_rows": pd.Series([], dtype="int64"),
        })

    def partial(t: pa.Table) -> pa.Table:
        nbytes = pcmp.cast(pcmp.binary_length(t["bytes"]), pa.int64())
        px = pcmp.multiply(pcmp.cast(t["w"], pa.int64()),
                           pcmp.cast(t["h"], pa.int64()))
        return pa.table({
            "fmt": t["fmt"], "nbytes": nbytes, "px": px,
        }).group_by("fmt").aggregate(
            [("nbytes", "sum"), ("px", "sum"), ("px", "min"),
             ("px", "max"), ("nbytes", "count")])

    out = (
        ray_read(out_root)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("nbytes_sum", alias_name="total_bytes"),
            Sum("px_sum", alias_name="total_px"),
            Min("px_min", alias_name="min_px"),
            Max("px_max", alias_name="max_px"),
            Sum("nbytes_count", alias_name="n_rows"),
        )
        .to_pandas()
    )
    if manifest_rows is not None:
        assert int(out["n_rows"].sum()) == manifest_rows, \
            "training dataset rows != manifest rows"
    return out.sort_values("fmt", kind="mergesort").reset_index(drop=True)


def _image_suffix(image_id: str) -> int:
    """Numeric node id of an image id ("<prefix>-<idx>", synth.py).
    ONE convention everywhere — element 1 of a split on '-' — matching
    ``_image_suffix_arr``; a prefix that ever grows a dash fails LOUDLY
    (int() raises) instead of silently desynchronizing the id spaces."""
    return int(image_id.split("-")[1])


def _image_suffix_arr(col):
    """Vectorized ``_image_suffix`` (same element-1 convention; a dashed
    prefix fails the int cast loudly)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(pc.list_element(pc.split_pattern(col, "-"), 1),
                   pa.int64())


def image_dedup_corpus(sf_dir: str, max_hamming: int = 6,
                       method: str = "auto",
                       unionfind_max_edges: int = 2_000_000
                       ) -> pd.DataFrame:
    """End-to-end IMAGE near-duplicate corpus dedup — the image-side
    twin of ``neardup_dedup_corpus``: phash-banded near-dup pairs →
    connected components → keep ONE representative per cluster (the
    numerically smallest image id) → emit the surviving images with
    their cluster size.

    Scale shape: pairs come from the banded ``image_phash_neardup``
    (grouped_apply buckets, nothing corpus-sized on the driver). The
    EDGE set is dedup-output-sized, not corpus-sized, so components
    size-route (``method="auto"``, same pattern as pagerank and the
    O(N²) dedup twins): below ``unionfind_max_edges`` a driver-side
    union-find over the already-driver-resident pairs is exact and
    O(edges α) (~16 B/edge — phash chains give the propagation CC a
    large diameter, measured 95 s → ~3 s at sf0.1); above it,
    ``ops.graph.connected_components`` (min-label propagation,
    edge-pinned bucketed path above the node threshold). Both paths
    pinned equal in tests. Survivors ride a value_set filter over a
    streaming map_batches of the id table (swap for a semi
    ``bucketed_join`` when the survivor set is corpus-sized). Rows-only
    for the driver; also rechecked by the one-sided
    ``image_dedup_violations`` degree/conservation invariants."""
    import numpy as np
    import pandas as pd_
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    if method not in ("auto", "unionfind", "cc"):
        raise ValueError(f"method={method!r}")
    pairs = image_phash_neardup(sf_dir, max_hamming)
    w = world_for(sf_dir)
    ids_tbl = w.images.select(["image_id"])

    ea = np.array([_image_suffix(s) for s in pairs["a"]], dtype=np.int64)
    eb = np.array([_image_suffix(s) for s in pairs["b"]], dtype=np.int64)

    if method == "unionfind" or (
            method == "auto" and len(ea) <= unionfind_max_edges):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(ea, eb):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # min-id root == representative
        # nodes untouched by any edge are their own singleton clusters
        touched = set(map(int, ea)) | set(map(int, eb))
        size_of: dict[int, int] = {}
        non_reps: list[int] = []
        for x in touched:
            r = find(x)
            size_of[r] = size_of.get(r, 0) + 1
            if r != x:
                non_reps.append(x)
        drop = pa.array(np.array(non_reps, dtype=np.int64), pa.int64())
        reps_arr = rd.from_arrow(ids_tbl).map_batches(
            lambda t: pa.table({"node": pc.filter(
                (sfx := _image_suffix_arr(t["image_id"].combine_chunks())),
                pc.invert(pc.is_in(sfx, value_set=drop)))}),
            batch_format="pyarrow").to_pandas()
        if not len(reps_arr.columns):
            reps_arr = pd_.DataFrame({"node": pd_.Series([], dtype="int64")})
        keep = pa.array(reps_arr["node"].to_numpy(dtype="int64"),
                        pa.int64())
    else:
        from ..ops.common import _ensure_cols, grouped_aggregate
        from ..ops.graph import connected_components

        nodes = rd.from_arrow(ids_tbl).map_batches(
            lambda t: pa.table(
                {"node": _image_suffix_arr(t["image_id"].combine_chunks())}),
            batch_format="pyarrow")
        edges = rd.from_arrow(pa.table({
            "a": pa.array(ea, pa.int64()),
            "b": pa.array(eb, pa.int64()),
        }))
        comp = connected_components(nodes, edges)
        comp = comp.materialize()  # consumed twice below (sizes + reps)
        sizes = grouped_aggregate(
            comp.map_batches(
                lambda t: pa.table({"component": t["component"],
                                    "one": pa.array(
                                        np.ones(len(t), np.int64))}),
                batch_format="pyarrow"),
            "component", [("one", "sum")]).to_pandas()
        sizes = _ensure_cols(sizes,
                             {"component": "int64", "one_sum": "int64"})
        size_of = dict(zip(sizes["component"].astype("int64"),
                           sizes["one_sum"].astype("int64")))
        # representatives filter runs worker-side; only the (smaller)
        # rep set reaches the driver, not the corpus-sized
        # (node, component) table
        reps_df = comp.map_batches(
            lambda t: t.filter(pc.equal(t["node"], t["component"])),
            batch_format="pyarrow").to_pandas()
        if not len(reps_df.columns):
            reps_df = pd_.DataFrame({"node": pd_.Series([], dtype="int64")})
        keep = pa.array(reps_df["node"].to_numpy(dtype="int64"),
                        pa.int64())

    out = rd.from_arrow(ids_tbl).map_batches(
        lambda t: t.filter(pc.is_in(
            _image_suffix_arr(t["image_id"].combine_chunks()),
            value_set=keep)),
        batch_format="pyarrow").to_pandas()
    if not len(out.columns):
        out = pd_.DataFrame({"image_id": pd_.Series([], dtype="str")})
    out["cluster_size"] = [
        int(size_of.get(_image_suffix(s), 1)) for s in out["image_id"]]
    out = out.astype({"cluster_size": "int64"})
    return out.sort_values("image_id", kind="mergesort").reset_index(
        drop=True)
