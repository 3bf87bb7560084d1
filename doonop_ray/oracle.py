"""Pure-Python oracle replaying the reference scheduler semantics.

A deliberately direct, single-threaded transliteration of the behavior of
/root/reference/src/workload.rs + retry.rs (NOT shared with the Ray
engine's implementation — the two are compared in tests):

- seed cleaning: sort + dedup + filter (cfg.rs:338-342) — the
  lexicographically greatest seed is crawled first (LIFO pop);
- frontier: LIFO stack, links appended in on-page order
  (workload.rs:230,246-249);
- seen set: insert at discovery time, first discovery wins
  (workload.rs:202-211);
- robots check at dispatch; errors/disallow drop silently, URL stays
  seen (workload.rs:100-105);
- retry: timeout-only, attempt counting with give-up at retry_count
  (retry.rs:24-36), fire threshold with force-when-pool-empty
  (retry.rs:38-55), policy no/first/last (workload.rs:228-240);
- limit quirk: checked after the push, so limit=0 still collects one
  artifact (workload.rs:213-222); after the limit closes, dispatch
  stops but in-flight results still land (workload.rs:127-131);
- stats: visited on every fetch result, collected on success, retries
  on timeout-with-retry, errors otherwise (workload.rs:120-148).

Single-engine (j=1) execution gives the reference's deterministic order
(lib.rs:117-134 pins it); this oracle models exactly that. Retry time is
a virtual clock advanced by each page's latency_ms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .filters import FilterSpec
from .robots import RobotsCache, make_table_fetcher
from .url import canonicalize, host_of, make_absolute, path_of


@dataclass
class OracleResult:
    order: list[str] = field(default_factory=list)       # fetch order (every dispatch, incl. retries)
    collected: list[str] = field(default_factory=list)   # data JSON strings, completion order
    collected_images: list[str | None] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    visited: int = 0
    collected_n: int = 0
    errors: int = 0
    retries: int = 0

    def stats(self) -> dict[str, int]:
        return {
            "visited": self.visited,
            "collected": self.collected_n,
            "errors": self.errors,
            "retries": self.retries,
        }


class SyntheticBackend:
    """Deterministic fetch against the pages table.

    ``fetch(url, attempt)`` → dict(links, data, image_id) or raises.
    A page with fail_mode="timeout" fails its first ``fail_count``
    attempts with a (retryable) timeout; "error" pages raise a
    non-retryable error; unknown URLs are non-retryable errors.
    """

    def __init__(self, pages_by_url: dict[str, dict]):
        self.pages = pages_by_url

    def fetch(self, url: str, attempt: int) -> dict:
        page = self.pages.get(url)
        if page is None:
            raise FetchError(url, "not_found")
        if page["fail_mode"] == "timeout" and attempt < page["fail_count"]:
            raise FetchTimeout(url, page["latency_ms"])
        if page["fail_mode"] == "error" and attempt < page["fail_count"]:
            raise FetchError(url, "error")
        return page


class FetchError(Exception):
    def __init__(self, url: str, kind: str):
        super().__init__(f"{kind}: {url}")
        self.url = url
        self.kind = kind


class FetchTimeout(FetchError):
    def __init__(self, url: str, latency_ms: int):
        super().__init__(url, "timeout")
        self.latency_ms = latency_ms


def clean_seeds(raw: list[str], filters: FilterSpec) -> list[str]:
    """cfg.rs:338-342: sort, dedup, drop ignored; drop unparseable."""
    canon = [c for u in raw if (c := canonicalize(u)) is not None]
    canon = sorted(set(canon))
    return [u for u in canon if not filters.is_ignored(u)]


def run_oracle(cfg: CrawlConfig, pages_by_url: dict[str, dict],
               robots_map: dict[str, str]) -> OracleResult:
    filters = FilterSpec(tuple(cfg.ignore_regexes), cfg.allow_domains)
    backend = SyntheticBackend(pages_by_url)
    robots = RobotsCache(make_table_fetcher(robots_map))
    res = OracleResult()

    pool: list[str] = []
    # retry lane: list of (ready_at_ms, seq, url); attempt counts per url
    retry_pool: list[tuple[float, int, str]] = []
    retry_count: dict[str, int] = {}
    clock_ms = 0.0
    rseq = 0

    def keep_urls(urls: list[str]) -> None:
        for u in urls:
            if u not in res.seen:
                res.seen.add(u)
                pool.append(u)

    def retry_get(force: bool) -> str | None:
        # retry.rs:38-55 — earliest bucket only, gated by fire threshold
        if not retry_pool:
            return None
        ready_at, _, url = retry_pool[0]
        if clock_ms > ready_at or force:
            retry_pool.pop(0)
            return url
        return None

    def get_url() -> str | None:
        if cfg.retry_policy == "no":
            return pool.pop() if pool else None
        if cfg.retry_policy == "first":
            u = retry_get(force=not pool)
            if u is not None:
                return u
            return pool.pop() if pool else None
        # "last"
        if pool:
            return pool.pop()
        return retry_get(force=True)

    seeds = clean_seeds(cfg.seeds, filters)
    if not seeds:
        return res
    keep_urls(seeds)

    limit_left = cfg.limit
    is_closed = False

    while not is_closed:
        # dispatch next URL (robots-gated, workload.rs:92-110)
        url = None
        while True:
            candidate = get_url()
            if candidate is None:
                break
            if cfg.use_robots:
                verdict = robots.is_allowed(cfg.robot, host_of(candidate), path_of(candidate))
                if verdict is True:
                    url = candidate
                    break
                # fetch error (None) or disallowed (False): drop silently
                continue
            url = candidate
            break
        if url is None:
            break

        # fetch (single engine → sequential); clock advances by page latency
        res.order.append(url)
        res.visited += 1
        attempt = retry_count.get(url, 0)
        raw_page = pages_by_url.get(url)
        clock_ms += raw_page["latency_ms"] if raw_page is not None else 1.0
        try:
            page = backend.fetch(url, attempt)
        except FetchTimeout:
            if cfg.retry_policy != "no":
                res.retries += 1
                c = retry_count.get(url, 0) + 1
                retry_count[url] = c
                if c < cfg.retry_count:
                    retry_pool.append((clock_ms + cfg.retry_threshold_ms, rseq, url))
                    rseq += 1
                # give-up: mark_visited (no-op — already seen)
            else:
                res.errors += 1
            continue
        except FetchError:
            res.errors += 1
            continue

        # link validation (engine.rs:46-57) before the UDF so the
        # extractor context carries validated links, mirroring Fetcher
        new_urls = []
        for href in page["links"]:
            a = make_absolute(url, href)
            if a is not None and not filters.is_ignored(a):
                new_urls.append(a)

        data = page["data"]
        if cfg.extractor is not None:
            # per-URL error lane (workload.rs:145-148): a failed script
            # run errors the page — nothing collected, no links kept
            import pyarrow as pa

            from .functions.checkfile import CheckFileError

            row = pa.table({
                "url": pa.array([url], pa.string()),
                "data": pa.array([data], pa.string()),
                "links": pa.array([new_urls], pa.list_(pa.string())),
                "image_id": pa.array([page.get("image_id")], pa.string()),
            })
            try:
                out = cfg.extractor(row)
                data = (out.to_pylist() if hasattr(out, "to_pylist")
                        else list(out))[0]
            except CheckFileError:
                res.errors += 1
                continue

        res.collected.append(data)
        res.collected_images.append(page.get("image_id"))
        res.collected_n += 1
        # limit check AFTER the push (workload.rs:127-131,213-222)
        if limit_left is not None:
            if limit_left == 0:
                is_closed = True
            else:
                limit_left -= 1
                if limit_left == 0:
                    is_closed = True

        # discovery-time dedup
        keep_urls(new_urls)

    return res
