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

    Deliberately cheap and allocation-light (separable float32 waves +
    small uniform noise): at bench scale the validator regenerates truth
    for every page, and this stand-in must not drown the *real* work
    (entropy decode + PSNR) in memory traffic."""
    idx = int(image_id.split("-")[1])
    rng = np.random.default_rng([seed, 7919, idx])
    w = int(rng.integers(img_min, img_max + 1))
    h = int(rng.integers(img_min, img_max + 1))
    ramp_y = np.linspace(0.0, 0.5, h, dtype=np.float32)
    ramp_x = np.linspace(0.0, 0.5, w, dtype=np.float32)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        f1, f2 = rng.uniform(1, 5, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        wy = np.sin(np.float32(2 * np.pi * f1) * ramp_y + np.float32(p1))
        wx = np.cos(np.float32(2 * np.pi * f2) * ramp_x + np.float32(p2))
        # separable outer product; one float32 HxW temp per channel
        chan = np.float32(122.0) + np.float32(90.0) * np.outer(wy, wx)
        out[:, :, c] = chan.astype(np.uint8)
    # small uint8 noise, saturating via minimum (stays cheap on memory)
    noise = rng.integers(0, 10, (h, w, 3), dtype=np.uint8)
    np.minimum(out, 245, out=out)
    out += noise
    return out


def expected_caption(image_id: str, seed: int) -> str:
    idx = int(image_id.split("-")[1])
    rng = np.random.default_rng([seed, 104729, idx])
    words = [CAPTION_WORDS[i] for i in rng.integers(0, len(CAPTION_WORDS), 6)]
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
