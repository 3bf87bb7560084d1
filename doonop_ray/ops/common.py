"""Shared helpers for the operator suite over the driver's testdata
tables (TESTDATA.md: region nation customer supplier part orders
lineitem events documents embeddings).

Conventions that make the DuckDB-oracle value-hash comparison exact:
- prune columns at the read (`columns=[...]`);
- name every computed/aggregate column identically in Ray and SQL;
- round float aggregates to 4 decimals on BOTH sides (block-order
  nondeterminism perturbs the last ulp of float sums);
- integer/count/min/max aggregates stay exact, prefer them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..compat import install as _install_compat

_install_compat()


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    """read_parquet with column pruning and a metadata-free projected
    schema: the testdata files carry ``b'pandas'`` metadata that makes
    ``hash(pa.Schema)`` raise in pyarrow 16, which defeats Ray's
    schema-dedup fast path and spams "Failed to hash the schemas"
    warnings from every reduce task."""
    import pyarrow.parquet as pq
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    pf = pq.ParquetFile(path)
    full = pf.schema_arrow.remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    if pf.metadata.num_rows == 0:
        # a zero-row read produces ZERO blocks: downstream map_batches
        # never runs and to_pandas() silently drops every column (the
        # empty-corpus crash class tools/empty_world_sweep.py hunts).
        # One explicit typed empty block keeps the schema end-to-end.
        return rd.from_arrow(schema.empty_table())
    return rd.read_parquet(path, columns=columns, schema=schema)


def table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer only (no data read) — the
    ``size_hint`` source for row-preserving pipelines over a base table,
    so corpus-scale inputs stream into the sort without the
    materialize-probe pin (see ``_small_route``)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def read_arrow(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


_BCAST_CACHE: dict = {}


def bcast_get(ref):
    """Per-worker-process cache of a deserialized broadcast object.

    ``ray.get`` inside a batch fn re-deserializes dicts/sets/tuples on
    EVERY batch (only Arrow/numpy are zero-copy); worker processes persist
    across Datasets, so caching by ObjectRef hex amortizes the cost to
    once per worker — same pattern as ``stages.fetch._STATE_CACHE``.
    """
    import ray

    key = getattr(ref, "hex", lambda: id(ref))()
    obj = _BCAST_CACHE.get(key)
    if obj is None:
        if len(_BCAST_CACHE) > 16:
            _BCAST_CACHE.clear()
        obj = ray.get(ref)
        _BCAST_CACHE[key] = obj
    return obj


def _collect_blocks(ds) -> pa.Table | None:
    """Gather a (small) Dataset's blocks into one driver-side Table.
    Empty blocks come back schema-less — dropped before the concat."""
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
    if not parts:
        return None
    return pa.concat_tables(parts).combine_chunks()


def r4(x):
    """Round to 4 decimals, half AWAY from zero — DuckDB ROUND semantics
    (numpy's np.round is half-even and diverges on exact .5 boundaries
    such as 1/32 = 0.03125)."""
    a = np.asarray(x, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * 1e4 + 0.5) / 1e4


# Inputs at or below these bounds skip the distributed sort pipeline
# (its fixed ~0.5 s exchange dwarfs a one-task C++ sort at such sizes)
# and aggregate/apply in a single task instead. The bounds cap that
# task's memory; the scale path above them is unchanged. Tests force
# the scale path by monkeypatching SMALL_SORT_MAX_ROWS to 0.
SMALL_SORT_MAX_ROWS = 65536
SMALL_SORT_MAX_BYTES = 128 << 20


def _small_route(ds, size_hint=None):
    """Decide whether ``ds`` takes the single-task route.

    ``size_hint`` — "large" (caller KNOWS the input is corpus-sized), a
    row-count estimate (e.g. the source read's metadata count carried
    through row-preserving maps), or None — and plan-metadata row counts
    (from_arrow / plain reads) let known-large inputs stream straight
    into the sort. Only when the count is unknowable without execution
    do we materialize-and-inspect: the sort is an all-to-all barrier, so
    the input reaches the object store either way — the cost of the pin
    is that consumed blocks can't be released mid-shuffle, a transient
    ~1x-input peak (spill traffic, not OOM) the hints avoid at scale."""
    if size_hint == "large":
        return ds, False
    n = size_hint if isinstance(size_hint, (int, np.integer)) else None
    if n is None:
        try:
            n = ds._meta_count()
        except Exception:
            n = None
    if n is not None and n > SMALL_SORT_MAX_ROWS:
        return ds, False
    mat = ds.materialize()
    try:
        small = (mat.count() <= SMALL_SORT_MAX_ROWS
                 and (mat.size_bytes() or 0) <= SMALL_SORT_MAX_BYTES)
    except Exception:
        small = False
    return mat, small


def _empty_table_like(ds) -> pa.Table | None:
    """Typed empty table carrying ``ds``'s schema, or None if the
    (zero-block) dataset lost it. A zero-row Dataset materializes to NO
    blocks, so any downstream ``map_batches``/``to_pandas`` silently
    drops the schema — the empty-corpus crash class the empty-world
    sweep (tools/empty_world_sweep.py) hunts."""
    try:
        sch = ds.schema(fetch_if_missing=False)
    except Exception:
        return None
    if sch is None:
        return None
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table()
    try:
        return pa.schema(
            [(n, t) for n, t in zip(sch.names, sch.types)]).empty_table()
    except Exception:
        return None


def grouped_apply(ds, keys, fn, empty: pa.Table, min_group_size: int = 1,
                  size_hint=None):
    """Per-group apply for HIGH-CARDINALITY keys.

    ``Dataset.groupby().map_groups()`` pays ~100µs of block machinery per
    group — ruinous at 10^5+ distinct keys (measured 23 s for an 80k-key
    count that this shape does in ~2 s). Instead: one global sort, then a
    map_batches pass that detects group boundaries vectorized inside each
    sorted block and calls ``fn`` as a plain Python call per group; only
    the first/last key-group of every block (the ones that may straddle a
    block boundary) are routed through a second, tiny groupby pass —
    O(blocks × group size) rows, independent of corpus size.

    ``fn``: pa.Table (one whole group) -> pa.Table with ``empty``'s
    schema. Groups smaller than ``min_group_size`` are skipped entirely
    (cheap early-out for e.g. LSH buckets of size 1).
    """
    if isinstance(keys, str):
        keys = [keys]

    def _bounds(t: pa.Table):
        n = len(t)
        change = np.zeros(n - 1, dtype=bool)
        for k in keys:
            col = t[k].combine_chunks()
            change |= pc.not_equal(
                col.slice(1), col.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n]))
        return starts, ends

    def interior(t: pa.Table, keep_edges: bool = False) -> pa.Table:
        n = len(t)
        if n == 0:
            return empty
        starts, ends = _bounds(t)
        outs = [
            fn(t.slice(s, e - s))
            for s, e in zip(starts, ends)
            if (keep_edges or (s != 0 and e != n)) and e - s >= min_group_size
        ]
        return pa.concat_tables([empty] + outs).combine_chunks()

    def edges(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        starts, ends = _bounds(t)
        first = t.slice(0, ends[0])
        if len(starts) == 1:
            return first
        last = t.slice(starts[-1], n - starts[-1])
        return pa.concat_tables([first, last])

    mat, small = _small_route(ds, size_hint)
    if small:
        import ray.data as rd

        if mat.count() == 0:
            # a zero-row Dataset has no blocks — map_batches would never
            # run and the schema (hence the caller's columns) would drop
            return rd.from_arrow(empty)
        sort_keys = [(k, "ascending") for k in keys]
        return mat.repartition(1).map_batches(
            lambda t: interior(t.sort_by(sort_keys), keep_edges=True),
            batch_format="pyarrow", batch_size=None)
    sorted_ds = mat.sort(keys).materialize()
    nb = sorted_ds.num_blocks()
    if nb <= 1:
        # no block boundary to straddle — one pass handles every group
        return sorted_ds.map_batches(
            lambda t: interior(t, keep_edges=True),
            batch_format="pyarrow", batch_size=None)
    interior_out = sorted_ds.map_batches(
        interior, batch_format="pyarrow", batch_size=None)
    # the edge branch is tiny (O(blocks × straddling-group size),
    # corpus-independent) — apply fn driver-side instead of paying a
    # groupby pipeline's all-to-all barrier (~0.5 s fixed per call)
    edge_tbl = _collect_blocks(
        sorted_ds.map_batches(edges, batch_format="pyarrow",
                              batch_size=None))
    if edge_tbl is None or len(edge_tbl) == 0:
        return interior_out
    import ray.data as rd

    # rows of one key may arrive from two adjacent blocks: re-sort, then
    # reuse the same boundary-detect + per-group fn as the interior pass
    edge_tbl = edge_tbl.sort_by([(k, "ascending") for k in keys])
    edge_out = interior(edge_tbl, keep_edges=True)
    return interior_out.union(rd.from_arrow(edge_out))


def grouped_aggregate(ds, keys, aggs: list[tuple[str, str]],
                      size_hint=None):
    """Vectorized aggregate for HIGH-CARDINALITY keys.

    ``Dataset.groupby().aggregate()`` pays per-group Python in its
    reduce (measured 5–23 s for an 80k-distinct-key count). Here the
    whole reduce is vectorized: one global sort, then each sorted block
    aggregates itself with ``pa.TableGroupBy`` (C++, first-appearance
    order with ``use_threads=False``, so on sorted input rows 0 and -1
    of the block aggregate are the groups that may straddle a block
    boundary); those two emit PARTIAL rows that one tiny merge pass
    re-aggregates. Requires re-aggregable aggs: sum/min/max/count
    (count partials merge as sum).

    ``aggs``: [(column, fn)] with fn in {sum, min, max, count}; output
    columns are named ``{column}_{fn}`` (pyarrow convention), matching
    ``Table.group_by().aggregate()``.
    """
    if isinstance(keys, str):
        keys = [keys]
    remerge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, fn in aggs:
        if fn not in remerge:
            raise ValueError(f"{fn!r} is not re-aggregable")
    out_cols = [f"{c}_{fn}" for c, fn in aggs]

    def block_agg(t: pa.Table) -> pa.Table:
        return t.group_by(keys, use_threads=False).aggregate(aggs)

    def interior(t: pa.Table) -> pa.Table:
        agged = block_agg(t)
        if len(agged) <= 2:
            # every group touches a block edge → all rows go via edges()
            return agged.slice(0, 0)
        return agged.slice(1, len(agged) - 2)

    def edges(t: pa.Table) -> pa.Table:
        agged = block_agg(t)
        if len(agged) <= 2:
            return agged
        return pa.concat_tables(
            [agged.slice(0, 1), agged.slice(len(agged) - 1, 1)])

    def edge_merge(t: pa.Table) -> pa.Table:
        merged = t.group_by(keys, use_threads=False).aggregate(
            [(oc, remerge[fn]) for oc, (_, fn) in zip(out_cols, aggs)])
        # pyarrow names re-aggregated columns "{col}_{fn}_{fn2}"; restore
        name_map = {f"{oc}_{remerge[fn]}": oc
                    for oc, (_, fn) in zip(out_cols, aggs)}
        return merged.rename_columns(
            [name_map.get(c, c) for c in merged.column_names])

    mat, small = _small_route(ds, size_hint)
    if small:
        if mat.count() == 0:
            et = _empty_table_like(mat)
            if et is not None:
                import ray.data as rd

                return rd.from_arrow(block_agg(et))
        # single-task exact aggregate — no sort needed at all
        return mat.repartition(1).map_batches(
            block_agg, batch_format="pyarrow", batch_size=None)
    sorted_ds = mat.sort(keys).materialize()
    if sorted_ds.num_blocks() <= 1:
        return sorted_ds.map_batches(
            block_agg, batch_format="pyarrow", batch_size=None)
    interior_out = sorted_ds.map_batches(
        interior, batch_format="pyarrow", batch_size=None)
    # boundary partials: ≤2 rows per block, corpus-independent — merge
    # driver-side instead of paying a repartition(1) barrier pipeline
    # (~0.5 s fixed per call)
    edge_tbl = _collect_blocks(
        sorted_ds.map_batches(edges, batch_format="pyarrow",
                              batch_size=None))
    if edge_tbl is None or len(edge_tbl) == 0:
        return interior_out
    import ray.data as rd

    return interior_out.union(rd.from_arrow(edge_merge(edge_tbl)))


def _ensure_cols(df: pd.DataFrame, cols: dict[str, str]) -> pd.DataFrame:
    """An all-empty Ray-native groupby/map_groups result loses its
    schema in to_pandas (zero output blocks carry no columns); rebuild a
    typed empty frame so downstream column access and the oracle compare
    see the declared schema. No-op whenever any column survived."""
    if len(df.columns):
        return df
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


def finish(df: pd.DataFrame, sort_by: list[str] | None = None) -> pd.DataFrame:
    """Deterministic small-result finish: stable sort + fresh index."""
    if sort_by:
        df = df.sort_values(sort_by, kind="mergesort")
    return df.reset_index(drop=True)


_SPUT_CACHE: dict = {}  # key -> ObjectRef, valid for _SPUT_SESSION[0]
_SPUT_SESSION: list = [""]  # Ray job id the cached refs belong to


def session_put(key, build, evict_prefix_len: int | None = None):
    """Session-cached ``ray.put``: one broadcast ref per ``key`` per Ray
    session. A fresh put per call would mint a new ref — re-shipping
    the object AND rotating every downstream per-worker ``_cached``
    state key, evicting the very state those wrappers reuse. The cache
    is invalidated when the Ray job id changes: refs minted under a
    previous ``ray.init`` are dangling after a shutdown/restart in the
    same process, and handing one to a worker raises owner-died instead
    of recomputing. Shared by ``flagship._ref_for`` (world tables) and
    ``multimodal._session_put`` (model checkpoints) — one copy of the
    invalidation state machine."""
    import ray

    if ray.is_initialized():
        job = ray.get_runtime_context().get_job_id()
        if job != _SPUT_SESSION[0]:
            _SPUT_CACHE.clear()
            _SPUT_SESSION[0] = job
    else:
        # no live session: any cached refs are dangling; the ray.put
        # below auto-initializes (the package never calls ray.init)
        _SPUT_CACHE.clear()
        _SPUT_SESSION[0] = ""
    if key not in _SPUT_CACHE:
        if evict_prefix_len is not None:
            # same-kind eviction (mirrors stages.fetch._cached): a caller
            # whose key carries a rebuild token would otherwise leave the
            # previous build's broadcast pinned for the session's lifetime
            # — an object-store residency leak in long-lived sessions
            pfx = key[:evict_prefix_len]
            for k in [k for k in _SPUT_CACHE
                      if k[:evict_prefix_len] == pfx and k != key]:
                del _SPUT_CACHE[k]
        _SPUT_CACHE[key] = ray.put(build())
        if not _SPUT_SESSION[0]:
            _SPUT_SESSION[0] = ray.get_runtime_context().get_job_id()
    return _SPUT_CACHE[key]
