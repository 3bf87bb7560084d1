"""Fetch stage — the reference's Engine/Backend re-expressed as a Ray
Data actor-pool `map_batches` callable.

Reference mapping:
- engine session construction happens once per engine
  (/root/reference/src/engine_builder.rs:93-136, engine_ring.rs:32-49)
  → here: ``Fetcher.__init__`` runs once per actor (index build /
  session setup), ``__call__`` per Arrow batch;
- `Backend::search` fetches one page and harvests `<a href>` in DOM
  order (/root/reference/src/backend.rs:84-111) → here: a lookup into
  the broadcast synthetic pages table (at web scale this is the real
  HTTP/browser client; the batch contract is identical);
- link absolutize + filter (/root/reference/src/engine.rs:44-68) is
  vectorized: one flat absolutize pass + one vectorized filter mask per
  batch.

Batch contract (all Arrow):
  in : url:string, attempt:int32, depth:int32
  out: url, depth:int32, status:string (ok|timeout|error),
       data:string?, links:list<string> (validated canonical),
       image_id:string?, latency_ms:int32
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..filters import FilterSpec
from ..url import make_absolute


def _deref(maybe_ref):
    """Accept a plain object or a Ray ObjectRef (broadcast via ray.put)."""
    try:
        import ray

        if isinstance(maybe_ref, ray.ObjectRef):
            return ray.get(maybe_ref)
    except ImportError:
        pass
    return maybe_ref


class Fetcher:
    """Callable class for ``map_batches(Fetcher, concurrency=N, ...)``.

    ``pages`` is broadcast once with ``ray.put`` and dereferenced
    zero-copy in each actor's ``__init__`` (NOT re-shipped per batch).
    """

    def __init__(self, pages, filters: FilterSpec):
        t = _deref(pages)
        self.filters = filters
        urls = t.column("url").to_pylist()
        self.index = {u: i for i, u in enumerate(urls)}
        self.links = t.column("links").to_pylist()
        self.data = t.column("data").to_pylist()
        self.image_id = t.column("image_id").to_pylist()
        self.latency = t.column("latency_ms").to_numpy()
        self.fail_mode = t.column("fail_mode").to_pylist()
        self.fail_count = t.column("fail_count").to_numpy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        attempts = batch.column("attempt").to_numpy()
        depths = batch.column("depth").to_numpy()

        n = len(urls)
        status = [""] * n
        datas: list[str | None] = [None] * n
        image_ids: list[str | None] = [None] * n
        latency = np.ones(n, dtype=np.int32)
        raw_links: list[list[str]] = [[] for _ in range(n)]

        for i, u in enumerate(urls):
            j = self.index.get(u)
            if j is None:
                status[i] = "error"
                continue
            latency[i] = self.latency[j]
            fm = self.fail_mode[j]
            if fm and attempts[i] < self.fail_count[j]:
                status[i] = "timeout" if fm == "timeout" else "error"
                continue
            status[i] = "ok"
            datas[i] = self.data[j]
            image_ids[i] = self.image_id[j]
            raw_links[i] = self.links[j]

        # absolutize all links of the batch flat, then one vectorized
        # filter mask (engine.rs:51-57 semantics: drop unparseable, drop
        # if any filter ignores)
        flat: list[str] = []
        offsets = [0]
        for i in range(n):
            if status[i] == "ok":
                base = urls[i]
                for href in raw_links[i]:
                    a = make_absolute(base, href)
                    if a is not None:
                        flat.append(a)
            offsets.append(len(flat))
        if flat:
            keep = ~self.filters.ignored_mask(flat)
        else:
            keep = np.zeros(0, dtype=bool)
        links_out: list[list[str]] = []
        for i in range(n):
            s, e = offsets[i], offsets[i + 1]
            links_out.append([flat[k] for k in range(s, e) if keep[k]])

        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "depth": pa.array(depths, pa.int32()),
                "status": pa.array(status, pa.string()),
                "data": pa.array(datas, pa.string()),
                "links": pa.array(links_out, pa.list_(pa.string())),
                "image_id": pa.array(image_ids, pa.string()),
                "latency_ms": pa.array(latency, pa.int32()),
            }
        )


# ---------------------------------------------------------------------------
# Task-based variants with per-worker-process state caching.
#
# Ray worker processes persist across Datasets, so a module-level cache
# keyed by the broadcast ObjectRef amortizes the index build across ALL
# waves — unlike an actor pool created per wave, which pays actor startup
# + index build every wave. The broadcast table itself is zero-copy from
# the local object store.
# ---------------------------------------------------------------------------

_STATE_CACHE: dict = {}


def _cached(key, build):
    st = _STATE_CACHE.get(key)
    if st is None:
        # one world per kind per worker — evict stale same-kind entries
        for k in [k for k in _STATE_CACHE if k[0] == key[0]]:
            del _STATE_CACHE[k]
        st = build()
        _STATE_CACHE[key] = st
    return st


def make_fetch_fn(pages_ref, filters: FilterSpec):
    key = ("fetch", getattr(pages_ref, "hex", lambda: id(pages_ref))())

    def fetch_fn(batch: pa.Table) -> pa.Table:
        fetcher = _cached(key, lambda: Fetcher(pages_ref, filters))
        return fetcher(batch)

    return fetch_fn


def make_validate_fn(images_ref, world_seed: int, emit_bytes: bool = False):
    key = ("validate", getattr(images_ref, "hex", lambda: id(images_ref))())

    def validate_fn(batch: pa.Table) -> pa.Table:
        v = _cached(key, lambda: Validator(images_ref, world_seed, emit_bytes))
        return v(batch)

    return validate_fn


class Validator:
    """Decode + validate the image payload of fetched rows (actor pool —
    the images index is built once per actor from a broadcast table).

    Emits the per-row invariant columns required by BASELINE.json:
    caption equality and decoded-pixel PSNR (>=40 dB for lossy fmts,
    exact for png), plus the image metadata columns of the input_hint
    schema. ``emit_bytes=True`` carries the encoded payload through to
    the sink (dataset-building mode).
    """

    def __init__(self, images, world_seed: int, emit_bytes: bool = False,
                 psnr_min: float = 40.0):
        from ..codec import decode_image, psnr
        from ..synth import expected_caption, expected_pixels

        t = _deref(images)
        self._decode = decode_image
        self._psnr = psnr
        self._exp_pix = expected_pixels
        self._exp_cap = expected_caption
        self.seed = world_seed
        self.emit_bytes = emit_bytes
        self.psnr_min = psnr_min
        ids = t.column("image_id").to_pylist()
        self.img = {
            iid: (b, f, c, ph)
            for iid, b, f, c, ph in zip(
                ids,
                t.column("bytes").to_pylist(),
                t.column("fmt").to_pylist(),
                t.column("caption").to_pylist(),
                t.column("phash").to_pylist(),
            )
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        n = len(ids)
        caption_ok = np.zeros(n, dtype=bool)
        pixel_ok = np.zeros(n, dtype=bool)
        psnr_db = np.full(n, np.nan)
        captions: list[str | None] = [None] * n
        fmts: list[str | None] = [None] * n
        phashes = np.zeros(n, dtype=np.int64)
        blobs: list[bytes | None] = [None] * n

        for i, iid in enumerate(ids):
            if iid is None or iid not in self.img:
                continue
            blob, fmt, caption, ph = self.img[iid]
            try:
                pix = self._decode(blob, fmt)
            except Exception:
                continue
            truth = self._exp_pix(iid, self.seed)
            p = self._psnr(truth, pix)
            psnr_db[i] = p if np.isfinite(p) else 999.0
            pixel_ok[i] = p >= self.psnr_min
            caption_ok[i] = caption == self._exp_cap(iid, self.seed)
            captions[i] = caption
            fmts[i] = fmt
            phashes[i] = ph
            if self.emit_bytes:
                blobs[i] = blob

        cols = dict(zip(batch.column_names, batch.columns))
        cols["caption"] = pa.array(captions, pa.string())
        cols["fmt"] = pa.array(fmts, pa.string())
        cols["phash"] = pa.array(phashes, pa.int64())
        cols["caption_ok"] = pa.array(caption_ok)
        cols["pixel_ok"] = pa.array(pixel_ok)
        cols["psnr_db"] = pa.array(psnr_db, pa.float64())
        if self.emit_bytes:
            cols["bytes"] = pa.array(blobs, pa.binary())
        return pa.table(cols)
