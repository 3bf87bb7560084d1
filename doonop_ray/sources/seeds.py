"""Seed sources — the reference's S1/S2/S6 operators.

- CLI seeds: `CrawlConfig.seeds` (cfg.rs:96-98,200-204).
- Seed file: one URL per line (cfg.rs:185-198) — `load_seed_file` for
  the driver-side path and `seed_dataset` for a Ray Data read_text
  pipeline over many/large seed files (the 10^10-frontier bulk path).
- Sitemap seeder: robots.txt `Sitemap:` lines → `<loc>` URLs
  (scripts/sitemap.sh:1-24), against the robots fixture table.
"""

from __future__ import annotations

import re

_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S)


def parse_seed_lines(lines: list[str]) -> list[str]:
    """Non-empty, non-comment lines, whitespace-stripped."""
    out = []
    for line in lines:
        u = line.strip()
        if u and not u.startswith("#"):
            out.append(u)
    return out


def load_seed_file(path: str) -> list[str]:
    with open(path) as fh:
        return parse_seed_lines(fh.readlines())


def seed_dataset(paths: str | list[str]):
    """Ray Data variant: read_text → parse/canonicalize per batch.

    Returns a Dataset with one canonical-URL column ``url`` (invalid
    lines dropped); dedup/sort happen at frontier seeding.
    """
    import pyarrow as pa
    import ray.data as rd

    from ..url import canonicalize

    def parse(batch: pa.Table) -> pa.Table:
        urls = []
        for line in batch.column("text").to_pylist():
            u = line.strip()
            if not u or u.startswith("#"):
                continue
            c = canonicalize(u)
            if c is not None:
                urls.append(c)
        return pa.table({"url": pa.array(urls, pa.string())})

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")


def sitemap_urls_from_robots(robots_txt: str,
                             sitemap_bodies: dict[str, str]) -> list[str]:
    """scripts/sitemap.sh semantics: `Sitemap:` lines in robots.txt name
    sitemap documents; every `<loc>` in them is a seed (document order).
    ``sitemap_bodies`` maps sitemap URL → XML body (fixture-backed; at
    the live web this is an HTTP fetch)."""
    seeds: list[str] = []
    for line in robots_txt.splitlines():
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            body = sitemap_bodies.get(val.strip())
            if body:
                seeds.extend(_LOC_RE.findall(body))
    return seeds
