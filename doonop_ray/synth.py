"""Deterministic synthetic world generator.

Replaces the reference's live WebDriver + fixture web site
(/root/reference/tests/www, docker-compose.yml) with seeded synthetic
tables matching FIXTURES.md:

- ``pages``  — the web graph: one row per fetchable URL, links in
  on-page document order (order matters: backend.rs:89-111 harvests
  hrefs in DOM order and frontier order depends on it).
- ``images`` — image+caption payload table with the authoritative
  input_hint schema (image_id, bytes, w, h, fmt, caption, phash).
- ``robots`` — robots.txt bodies per host (fixture for robots.rs:35-51).
- ``seeds``  — raw seed list incl. duplicates (cfg.rs:185-213).

Everything is a pure function of (seed, params): expected pixels and
captions are regenerable per image_id, so validation stages need no side
channel. Host sizes are Zipf-skewed to exercise hot-host salting.
"""

from __future__ import annotations

import functools
import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import encode_image, phash64
from .robots import FETCH_ERROR_MARKER

CAPTION_WORDS = (
    "amber basalt cedar dune ember fjord grove harbor iris juniper "
    "kelp lagoon mesa nectar onyx prairie quartz reef sierra tundra"
).split()


@dataclass
class WorldParams:
    seed: int = 42
    n_hosts: int = 4
    pages_per_host: int = 8          # mean; per-host sizes are Zipf-skewed
    zipf_s: float = 1.2
    # skew-adversarial worlds: host 0 takes this fraction of ALL pages
    # (None = pure Zipf). Exercises the salted groupby(host) expansion
    # and per-host politeness under a single dominating host.
    hot_host_frac: float | None = None
    fanout: int = 3
    p_relative: float = 0.35
    p_cross: float = 0.2
    p_dead: float = 0.05
    p_invalid: float = 0.04
    p_image: float = 0.9
    img_min: int = 16
    img_max: int = 40
    p_jpeg: float = 0.5
    p_timeout: float = 0.06
    p_error: float = 0.04
    max_fail: int = 3
    p_robots_host: float = 0.5
    p_robots_err_host: float = 0.1
    robots_disallow_frac: float = 0.15
    n_seeds: int = 3
    with_images: bool = True


def host_name(h: int) -> str:
    return f"h{h:03d}.example.com"


def page_url(h: int, i: int) -> str:
    return f"https://{host_name(h)}/p/{i}"


def expected_pixels(image_id: str, seed: int, img_min: int = 16,
                    img_max: int = 40) -> np.ndarray:
    """Regenerate the ground-truth pixels for an image_id — a pure
    function of (image_id, seed, size bounds).

    Deliberately cheap and allocation-light: at bench scale the
    validator regenerates truth for every page, and this stand-in must
    not drown the *real* work (entropy decode + PSNR) it harnesses.
    The round-3 profile on the heavy world measured the original
    per-channel float outer-product + bounded-rejection noise sampler
    at ~430-500 us/row vs ~315 us/row for the actual PNG/JPEG decode,
    so this is now engineered down to ~235 us/row without losing any
    workload realism:

    - texture is a SUM of two per-channel sinusoidal gradients (a
      separable uint8 broadcast add in channel-major layout — no
      float (h,w,3) temp; the old product form forced a 150 KB float32
      temp whose alloc+astype dominated);
    - full-resolution 2D noise comes from raw SFC64 generator bytes
      masked to 3 bits (bounded-rejection 0..9 draws cost 122 us/row;
      2D noise is kept so PNG/JPEG blob entropy stays realistic);
    - the HWC transpose is fused into the noise add (the standalone
      ascontiguousarray gather was 123 us/row);
    - ramps are lru_cached (np.linspace pays an errstate context
      manager per call) and the bit generator is SFC64 (~2x PCG64 raw
      byte rate; determinism per (image_id, seed) is unchanged)."""
    idx = int(image_id.split("-")[1])
    rng = np.random.Generator(np.random.SFC64([seed, 7919, idx]))
    w = int(rng.integers(img_min, img_max + 1))
    h = int(rng.integers(img_min, img_max + 1))
    f = rng.uniform(1, 5, (3, 2)).astype(np.float32)
    p = rng.uniform(0, 2 * np.pi, (3, 2)).astype(np.float32)
    two_pi = np.float32(2 * np.pi)
    ay = (np.float32(61.0) + np.float32(45.0) * np.sin(
        two_pi * f[:, :1] * _ramp(h)[None, :] + p[:, :1])).astype(np.uint8)
    bx = (np.float32(61.0) + np.float32(45.0) * np.cos(
        two_pi * f[:, 1:] * _ramp(w)[None, :] + p[:, 1:])).astype(np.uint8)
    # (3,h,w) contiguous broadcast add: ay in [16,106] + bx in [16,106]
    # -> [32,212]; +7 noise max 219, no saturation pass needed
    chw = np.add(ay[:, :, None], bx[:, None, :])
    noise = np.frombuffer(rng.bytes(h * w * 3), dtype=np.uint8)
    out = noise.reshape(h, w, 3) & 7
    out += chw.transpose(1, 2, 0)  # fused gather+add, contiguous write
    return out


@functools.lru_cache(maxsize=1024)
def _ramp(n: int) -> np.ndarray:
    return np.linspace(0.0, 0.5, n, dtype=np.float32)


def expected_caption(image_id: str, seed: int) -> str:
    """Pure function of (image_id, seed); blake2b word picks instead of
    a numpy Generator — the per-row RNG construction alone cost 23 us
    and the validator pays this once per page (4 us now)."""
    idx = int(image_id.split("-")[1])
    d = hashlib.blake2b(b"%d:%d" % (seed, idx), digest_size=12).digest()
    nw = len(CAPTION_WORDS)
    words = [CAPTION_WORDS[int.from_bytes(d[i:i + 2], "little") % nw]
             for i in range(0, 12, 2)]
    return f"caption {image_id}: " + " ".join(words)


@dataclass
class World:
    params: WorldParams
    pages: pa.Table
    images: pa.Table
    robots: pa.Table
    seeds: pa.Table
    host_sizes: list[int] = field(default_factory=list)

    def pages_by_url(self) -> dict[str, dict]:
        return {r["url"]: r for r in self.pages.to_pylist()}

    def robots_map(self) -> dict[str, str]:
        return dict(zip(
            self.robots.column("host").to_pylist(),
            self.robots.column("robots_txt").to_pylist(),
        ))

    def write(self, out_dir: str) -> None:
        import dataclasses
        import json
        import os

        os.makedirs(out_dir, exist_ok=True)
        for name in ("pages", "images", "robots", "seeds"):
            pq.write_table(getattr(self, name), f"{out_dir}/{name}.parquet")
        # persist params: readers regenerate pixel ground truth from
        # (world_seed, img bounds) — a world written with non-default
        # params would otherwise validate against the wrong truth
        with open(f"{out_dir}/params.json", "w") as fh:
            json.dump(dataclasses.asdict(self.params), fh)


def _host_sizes(p: WorldParams, rng: np.random.Generator) -> list[int]:
    w = 1.0 / np.arange(1, p.n_hosts + 1) ** p.zipf_s
    if p.hot_host_frac is not None and p.n_hosts > 1:
        # host 0 pinned to the requested share; the rest split the
        # remainder Zipf-style
        rest = w[1:] / w[1:].sum() * (1.0 - p.hot_host_frac)
        w = np.concatenate(([p.hot_host_frac], rest))
    else:
        w /= w.sum()
    total = p.n_hosts * p.pages_per_host
    sizes = np.maximum(1, np.round(w * total)).astype(int)
    return sizes.tolist()


def build_world(params: WorldParams | None = None, **kw) -> World:
    p = params or WorldParams(**kw)
    rng = np.random.default_rng([p.seed, 13])
    sizes = _host_sizes(p, rng)
    all_pages = [(h, i) for h in range(p.n_hosts) for i in range(sizes[h])]
    n = len(all_pages)

    urls, hosts, paths, links_col, image_ids, datas = [], [], [], [], [], []
    lat, fmode, fcount = [], [], []
    img_rows = []
    img_counter = 0

    for h, i in all_pages:
        url = page_url(h, i)
        urls.append(url)
        hosts.append(host_name(h))
        paths.append(f"/p/{i}")

        k = int(rng.integers(0, p.fanout + 1))
        links = []
        for _ in range(k):
            r = rng.random()
            if r < p.p_invalid:
                links.append(rng.choice(["http://", "http://[bad", ""]))
                continue
            if r < p.p_invalid + p.p_dead:
                links.append(f"/dead/{int(rng.integers(0, 10_000))}")
                continue
            if rng.random() < p.p_cross and p.n_hosts > 1:
                th = int(rng.integers(0, p.n_hosts))
            else:
                th = h
            ti = int(rng.integers(0, sizes[th]))
            if th == h and rng.random() < p.p_relative:
                links.append(
                    f"/p/{ti}" if rng.random() < 0.5 else f"../p/{ti}"
                )
            else:
                links.append(page_url(th, ti))
        links_col.append(links)

        if p.with_images and rng.random() < p.p_image:
            image_id = f"img-{img_counter:07d}"
            img_counter += 1
            pix = expected_pixels(image_id, p.seed, p.img_min, p.img_max)
            fmt = "jpeg" if rng.random() < p.p_jpeg else "png"
            img_rows.append(
                {
                    "image_id": image_id,
                    "bytes": encode_image(pix, fmt),
                    "w": pix.shape[1],
                    "h": pix.shape[0],
                    "fmt": fmt,
                    "caption": expected_caption(image_id, p.seed),
                    "phash": phash64(pix),
                }
            )
            image_ids.append(image_id)
        else:
            image_ids.append(None)

        datas.append(json.dumps({"u": url, "h": h, "i": i}, sort_keys=True))
        lat.append(int(rng.integers(1, 40)))
        r = rng.random()
        if r < p.p_timeout:
            fmode.append("timeout")
            fcount.append(int(rng.integers(1, p.max_fail + 1)))
        elif r < p.p_timeout + p.p_error:
            fmode.append("error")
            fcount.append(1)
        else:
            fmode.append("")
            fcount.append(0)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "path": pa.array(paths, pa.string()),
            "links": pa.array(links_col, pa.list_(pa.string())),
            "image_id": pa.array(image_ids, pa.string()),
            "data": pa.array(datas, pa.string()),
            "latency_ms": pa.array(lat, pa.int32()),
            "fail_mode": pa.array(fmode, pa.string()),
            "fail_count": pa.array(fcount, pa.int32()),
        }
    )

    images = pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in img_rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in img_rows], pa.binary()),
            "w": pa.array([r["w"] for r in img_rows], pa.int32()),
            "h": pa.array([r["h"] for r in img_rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in img_rows], pa.string()),
            "caption": pa.array([r["caption"] for r in img_rows], pa.string()),
            "phash": pa.array([r["phash"] for r in img_rows], pa.int64()),
        }
    )

    # robots fixtures
    rb_hosts, rb_bodies = [], []
    for h in range(p.n_hosts):
        r = rng.random()
        if r < p.p_robots_err_host:
            rb_hosts.append(host_name(h))
            rb_bodies.append(FETCH_ERROR_MARKER)
        elif r < p.p_robots_err_host + p.p_robots_host:
            # cap at a realistic rule count (real robots.txt files have
            # tens of rules; an O(pages) rule list is a fixture artifact)
            n_block = min(50, max(1, int(sizes[h] * p.robots_disallow_frac)))
            blocked = sorted(
                int(x) for x in rng.choice(sizes[h], size=min(n_block, sizes[h]), replace=False)
            )
            body = ["User-agent: DoonopRobot"]
            body += [f"Disallow: /p/{b}$" for b in blocked]
            body += ["", "User-agent: *", "Disallow: /private"]
            rb_hosts.append(host_name(h))
            rb_bodies.append("\n".join(body))
        # else: no row → 404 → empty rules → allow all
    robots = pa.table(
        {
            "host": pa.array(rb_hosts, pa.string()),
            "robots_txt": pa.array(rb_bodies, pa.string()),
        }
    )

    # seed list: random pages + one duplicate + one dead URL
    seed_urls = [page_url(h, 0) for h in range(min(p.n_seeds, p.n_hosts))]
    if seed_urls:
        seed_urls.append(seed_urls[0])  # duplicate → dedup in clean_urls
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "order": pa.array(range(len(seed_urls)), pa.int32()),
        }
    )

    return World(p, pages, images, robots, seeds, host_sizes=sizes)


def read_world(in_dir: str) -> World:
    import json
    import os

    t = {n: pq.read_table(f"{in_dir}/{n}.parquet") for n in ("pages", "images", "robots", "seeds")}
    params = WorldParams()
    pfile = os.path.join(in_dir, "params.json")
    if os.path.exists(pfile):
        with open(pfile) as fh:
            saved = json.load(fh)
        known = {f.name for f in __import__("dataclasses").fields(WorldParams)}
        params = WorldParams(**{k: v for k, v in saved.items() if k in known})
    return World(params, t["pages"], t["images"], t["robots"], t["seeds"])
