"""Distributed connected components over an edge Dataset.

Iterative min-label propagation (Hash-to-Min family): every node starts
labeled with itself; each round every node pushes its current label to
its neighbors and keeps the minimum it hears. Labels are monotonically
non-increasing, so the global label sum strictly decreases until the
fixed point — the loop's convergence check is a single cheap ``sum``
aggregate, no driver-side graph structure of any size.

Round shape (all through ``grouped_apply`` — sort + block-local group
detection, no per-group block machinery, so 10^8-node label tables are
fine):
1. union(label rows, symmetric edge rows) co-grouped by node: each
   group = one label row + that node's out-edges → emit (neighbor,
   label) messages plus (self, label);
2. min per node over the received messages → next label table.

Converges in O(max component diameter) rounds — near-dup clusters are
shallow (cliques-ish), so 2-4 rounds in practice. For adversarial
long-path graphs switch to large-star/small-star; the loop structure
is identical.

Reference parity note: the reference engine has no graph operator —
this is part of the training-data-pipeline suite (duplicate-cluster
assignment over near-dup edges; SURVEY.md §2d extension).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import grouped_apply


def connected_components(nodes_ds, edges_ds, max_iters: int = 50,
                         method: str = "auto",
                         bucket_threshold: int = 200_000,
                         n_buckets: int = 32):
    """(node:int64) + (a:int64, b:int64) datasets → (node, component)
    Dataset, component = min node id reachable. Nodes absent from every
    edge keep themselves as component.

    ``method``: "cogroup" (default below ``bucket_threshold`` nodes —
    the union-sort shape described above), or "bucketed" — the same
    edge-pinned layout as ``pagerank``: edges/labels hash-bucketed to
    storage once, each round exchanges only node-sized (node, label)
    messages and the convergence check is one node-sized column scan.
    "auto" routes by node count. Both paths pinned equal in tests,
    including edge endpoints absent from ``nodes_ds`` (both treat them
    as implicit nodes) and duplicate node rows (both emit one row per
    node)."""
    if method not in ("auto", "cogroup", "bucketed"):
        raise ValueError(f"method={method!r}")
    if method == "auto":
        # materialize once so the routing count does not re-execute the
        # caller's upstream pipeline in the chosen path (review round-3)
        nodes_ds = nodes_ds.materialize()
    if method == "bucketed" or (
            method == "auto" and nodes_ds.count() > bucket_threshold):
        return _cc_bucketed(nodes_ds, edges_ds, max_iters, n_buckets)

    def init_labels(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks()
        return pa.table({
            "key": node,
            "label": node,
            "dst": pa.nulls(len(t), pa.int64()),
        })

    def sym_edges(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({
            "key": pa.concat_arrays([a, b]),
            "label": pa.nulls(2 * len(t), pa.int64()),
            "dst": pa.concat_arrays([b, a]),
        })

    labels = nodes_ds.map_batches(
        init_labels, batch_format="pyarrow").materialize()
    edges = edges_ds.map_batches(
        sym_edges, batch_format="pyarrow").materialize()

    msg_empty = pa.table({"key": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
    lab_empty = pa.table({"key": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})

    def push(g: pa.Table) -> pa.Table:
        labs = g["label"].drop_null()
        lbl = int(np.min(labs.to_numpy(zero_copy_only=False))) if len(labs) \
            else int(g["key"][0].as_py())
        dsts = g["dst"].drop_null().combine_chunks()
        key = pa.concat_arrays([dsts, pa.array([g["key"][0].as_py()], pa.int64())])
        return pa.table({
            "key": key,
            "label": pa.array([lbl] * len(key), pa.int64()),
        })

    def min_label(g: pa.Table) -> pa.Table:
        lbl = int(np.min(g["label"].to_numpy(zero_copy_only=False)))
        return pa.table({
            "key": g["key"].slice(0, 1),
            "label": pa.array([lbl], pa.int64()),
            "dst": pa.nulls(1, pa.int64()),
        })

    def coalesce(ds):
        """Bound block growth: each round's union adds blocks, and sort
        fan-out scales with input block count — without this the task
        count grows quadratically over iterations. Target ~64k rows per
        block (tiny graphs collapse to one block and take
        grouped_apply's single-block fast path)."""
        target = max(1, ds.count() // 65536 + 1)
        if ds.num_blocks() > target:
            ds = ds.repartition(target).materialize()
        return ds

    labels = coalesce(labels)
    prev_sum = None
    for _ in range(max_iters):
        msgs = grouped_apply(labels.union(edges), "key", push, msg_empty)
        labels = coalesce(
            grouped_apply(msgs, "key", min_label, lab_empty).materialize())
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["key"], "component": t["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def pagerank(edges_ds, n_iters: int = 5, damping: float = 0.85,
             fast_threshold: int = 200_000, method: str = "auto",
             n_buckets: int = 32):
    """Distributed PageRank over a SYMMETRIZED (src:int64, dst:int64)
    edge Dataset — the canonical iterative-algorithm shape on Ray Data.

    Per iteration (same cogroup trick as ``connected_components`` — no
    driver-side graph structure, no per-iteration join build):
    union(rank rows, edge rows) co-grouped by node emits
    (dst, rank/outdeg) contribution messages (outdeg = the group's own
    out-edge count, so no separate degree table or join is needed),
    then one ``grouped_aggregate`` sum per destination yields
    rank' = (1-d)/n + d * Σ contrib. Because the caller symmetrizes,
    every node has in- and out-edges: no dangling-mass term.

    Size routing (the repo's established twin pattern): when the NODE
    set fits comfortably in memory (n <= ``fast_threshold``), the rank
    vector is broadcast per iteration and each round is ONE streaming
    map over the static edge table with per-batch bincount partials —
    zero sorts per iteration instead of two. Above the threshold the
    BUCKETED path runs (``method="auto"``): edges are hash-bucketed to
    storage ONCE by src; each iteration exchanges only node-sized
    (node, value) rows through two ``bucket_dataset`` writes — the
    edge table never moves again and no iteration pays a sort. The
    original union-cogroup path (two sorts of ranks+edges per
    iteration) remains as ``method="cogroup"`` — the no-precomputation
    twin, hash-matched against the same oracle. All paths compute the
    same fixed point (float sum order differs at the last ulp —
    callers round).

    Fixed ``n_iters`` (not convergence-tested) so an unrolled SQL
    oracle computes the identical fixed-point prefix. Returns a
    (node:int64, rank:float64) Dataset with Σ rank = 1."""
    from .common import grouped_aggregate, grouped_apply

    if method not in ("auto", "broadcast", "bucketed", "cogroup"):
        raise ValueError(f"method={method!r}")

    def coalesce(ds):
        """Sort fan-out scales with input block count; pack the edge
        and rank tables into ~64k-row blocks (same trick as
        ``connected_components``) so each iteration's two sorts pay
        for data, not for block-count scheduling."""
        target = max(1, ds.count() // 65536 + 1)
        if ds.num_blocks() > target:
            ds = ds.repartition(target).materialize()
        return ds

    edges = coalesce(edges_ds.map_batches(
        lambda t: pa.table({
            "key": t["src"].combine_chunks().cast(pa.int64()),
            "rank": pa.nulls(len(t), pa.float64()),
            "dst": t["dst"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow").materialize())
    nodes = grouped_aggregate(
        edges.map_batches(lambda t: pa.table({"key": t["key"]}),
                          batch_format="pyarrow"),
        "key", [("key", "count")]).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    if method == "broadcast" or (method == "auto" and n <= fast_threshold):
        return _pagerank_broadcast(edges, nodes, n, n_iters, damping)
    if method in ("auto", "bucketed"):
        return _pagerank_bucketed(edges, nodes, n, n_iters, damping,
                                  n_buckets)
    init = 1.0 / n
    base = (1.0 - damping) / n

    ranks = nodes.map_batches(
        lambda t: pa.table({
            "key": t["key"],
            "rank": pa.array([init] * len(t), pa.float64()),
            "dst": pa.nulls(len(t), pa.int64()),
        }),
        batch_format="pyarrow").materialize()

    msg_empty = pa.table({"key": pa.array([], pa.int64()),
                          "contrib": pa.array([], pa.float64())})

    def push(g: pa.Table) -> pa.Table:
        r = g["rank"].drop_null()
        dsts = g["dst"].drop_null().combine_chunks()
        if not len(r) or not len(dsts):
            return msg_empty
        contrib = float(r[0].as_py()) / len(dsts)
        return pa.table({
            "key": dsts,
            "contrib": pa.array([contrib] * len(dsts), pa.float64()),
        })

    for _ in range(n_iters):
        msgs = grouped_apply(ranks.union(edges), "key", push, msg_empty)
        ranks = coalesce(grouped_aggregate(
            msgs, "key", [("contrib", "sum")]).map_batches(
            lambda t: pa.table({
                "key": t["key"],
                "rank": pc.add(pa.scalar(base),
                               pc.multiply(pa.scalar(damping),
                                           t["contrib_sum"])),
                "dst": pa.nulls(len(t), pa.int64()),
            }),
            batch_format="pyarrow").materialize())

    return ranks.map_batches(
        lambda t: pa.table({"node": t["key"], "rank": t["rank"]}),
        batch_format="pyarrow")


def pagerank_customer_supplier(sf_dir: str, n_iters: int = 5,
                               damping: float = 0.85,
                               fast_threshold: int = 200_000,
                               method: str = "auto",
                               n_buckets: int = 32):
    """PageRank over the customer–supplier trading graph: one node per
    customer (2*c_custkey) and per supplier (2*s_suppkey+1), an
    undirected edge per DISTINCT (customer, supplier) trading pair
    (derived from orders ⋈ lineitem — a ``shuffle_join`` on the
    corpus-growing orderkey, then a composite-key ``grouped_aggregate``
    dedup). Returns per-node rank × n (relative-to-uniform centrality,
    ~1.0 scale), rounded to 4dp — hash-matched against an UNROLLED
    5-iteration SQL oracle."""
    import pandas as pd

    from .common import finish, grouped_aggregate, r4
    from ..ops.bucket import _read_bucket, map_buckets
    from .relational import _li_buckets, _ord_buckets

    # edge derivation through the persisted orderkey buckets: the
    # lineitem ⋈ orders join is orderkey-local, so each bucket task
    # joins via pc.index_in and pre-dedups its (c, s) pairs — the only
    # exchange left is the global pair dedup on the composite key
    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    pair_schema = pa.schema([("c", pa.int64()), ("s", pa.int64())])

    def bucket_pairs(k: int) -> pa.Table | None:
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_suppkey"])
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_custkey"])
        if lt is None or ot is None or len(lt) == 0:
            return None
        idx = pc.index_in(lt["l_orderkey"],
                          value_set=ot["o_orderkey"].combine_chunks())
        ok = pc.is_valid(idx)
        lt, idx = lt.filter(ok), idx.filter(ok)
        return pa.table({
            "c": pc.cast(ot["o_custkey"].take(idx), pa.int64()),
            "s": pc.cast(lt["l_suppkey"], pa.int64()),
        }).group_by(["c", "s"], use_threads=False).aggregate([])

    pairs = map_buckets(n_buckets, bucket_pairs, pair_schema.empty_table())
    dedup = grouped_aggregate(pairs, ["c", "s"], [("c", "count")])

    def sym(t: pa.Table) -> pa.Table:
        c = pc.multiply(t["c"].combine_chunks(), 2)
        s = pc.add(pc.multiply(t["s"].combine_chunks(), 2), 1)
        return pa.table({"src": pa.concat_arrays([c, s]),
                         "dst": pa.concat_arrays([s, c])})

    edges = dedup.map_batches(sym, batch_format="pyarrow")
    out = pagerank(edges, n_iters=n_iters, damping=damping,
                   fast_threshold=fast_threshold, method=method,
                   n_buckets=n_buckets).to_pandas()
    if out.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rank_rel": pd.Series([], dtype="float64")})
    n = len(out)
    out["rank_rel"] = r4(out["rank"].to_numpy() * n)
    out["node"] = out["node"].astype("int64")
    return finish(out[["node", "rank_rel"]], ["node"])


def _pagerank_broadcast(edges, nodes, n: int, n_iters: int,
                        damping: float):
    """Bounded-node fast path: the rank vector (n floats) broadcasts
    per iteration; each round is one streaming ``map_batches`` over the
    STATIC edge table — per batch: searchsorted src→rank/outdeg lookup,
    bincount partial sums over the batch's destinations (emitting only
    the touched node ids, so partial rows ≤ batch rows) — merged
    driver-side into the next vector. Zero sorts per iteration; the
    edge table never moves after its one materialize."""
    import ray

    from .common import bcast_get

    nd = nodes.to_pandas()  # gated: n <= fast_threshold
    node_ids = np.sort(nd["key"].to_numpy().astype(np.int64))
    outdeg_by_id = nd.set_index("key")["key_count"].astype(np.int64)
    outdeg = outdeg_by_id.reindex(node_ids).to_numpy().astype(np.float64)
    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n)
    # the static id array broadcasts ONCE; only the per-iteration
    # contribution vector re-ships (review: re-putting node_ids each
    # round serialized n*8 B x iters and churned the per-worker cache)
    ids_ref = ray.put(node_ids)
    fanin = 8

    def combine(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        sums = np.bincount(i, weights=s, minlength=n)
        nz = np.flatnonzero(sums)
        return pa.table({"i": pa.array(nz, pa.int64()),
                         "s": pa.array(sums[nz], pa.float64())})

    for _ in range(n_iters):
        ref = ray.put(ranks / outdeg)

        def contrib_partial(t: pa.Table) -> pa.Table:
            ids = bcast_get(ids_ref)
            contrib = bcast_get(ref)
            src = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = contrib[np.searchsorted(ids, src)]
            di = np.searchsorted(ids, dst)
            sums = np.bincount(di, weights=c, minlength=len(ids))
            nz = np.flatnonzero(sums)
            return pa.table({"i": pa.array(nz, pa.int64()),
                             "s": pa.array(sums[nz], pa.float64())})

        # intermediate tree-combine (review: the raw partial merge
        # scaled with EDGE count — blocks x <=n rows straight onto the
        # driver; repartition to `fanin` blocks and bincount-combine
        # each, so the driver reads <= fanin x n rows no matter how
        # many edges there are)
        parts = (edges.map_batches(contrib_partial,
                                   batch_format="pyarrow",
                                   batch_size=None)
                 .repartition(fanin)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=None)
                 .to_pandas())
        agg = np.zeros(n)
        np.add.at(agg, parts["i"].to_numpy(), parts["s"].to_numpy())
        ranks = base + damping * agg

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node": pa.array(node_ids, pa.int64()),
        "rank": pa.array(ranks, pa.float64())}))

def _bucketed_rounds(edir, sdir, n_buckets: int, msg_fn, reduce_fn,
                     msg_empty: pa.Table, state_empty: pa.Table,
                     max_rounds: int, read_back, stop_fn=None):
    """Per-round scaffold shared by the edge-pinned iterative kernels
    (``_pagerank_bucketed`` / ``_cc_bucketed``): each round runs

    1. ``msg_fn(k, sdir)`` per bucket task (joins the state bucket to the
       pinned edge bucket) → one node-keyed ``bucket_dataset`` exchange;
    2. ``reduce_fn(k, mdir, sdir)`` per bucket task → the next state dir
       (rows are already home-bucketed: a local partitioned write);

    then deletes the consumed message + superseded state dirs so disk
    stays O(1) dirs. ``stop_fn(sdir)`` (optional) ends early — it sees
    the NEW state dir after each round. ``read_back(sdir)`` produces the
    return value before the ``finally`` cleanup removes everything."""
    import shutil

    from .bucket import bucket_dataset, map_buckets

    stale = [edir, sdir]
    try:
        for _ in range(max_rounds):
            mdir = bucket_dataset(
                map_buckets(n_buckets,
                            lambda k, sdir=sdir: msg_fn(k, sdir),
                            msg_empty),
                "node", n_buckets, schema=msg_empty.schema)
            stale.append(mdir)
            sdir_next = bucket_dataset(
                map_buckets(n_buckets,
                            lambda k, mdir=mdir, sdir=sdir:
                                reduce_fn(k, mdir, sdir),
                            state_empty),
                "node", n_buckets, schema=state_empty.schema)
            stale.append(sdir_next)
            shutil.rmtree(mdir, ignore_errors=True)
            shutil.rmtree(sdir, ignore_errors=True)
            stale = [edir, sdir_next]
            sdir = sdir_next
            if stop_fn is not None and stop_fn(sdir):
                break
        return read_back(sdir)
    finally:
        for d in stale:
            shutil.rmtree(d, ignore_errors=True)


def _pagerank_bucketed(edges, nodes, n: int, n_iters: int,
                       damping: float, n_buckets: int):
    """Edge-pinned scale path: the symmetrized edge table is hash-
    bucketed to storage ONCE by src (the classic edge-partitioned
    PageRank layout); rank rows (node, rank, outdeg) live in a
    node-bucketed dir ALIGNED with the edge buckets (same key domain,
    same hash). Each iteration is two streaming pipelines and zero
    sorts:

    1. contrib: per bucket task — join rank→edges via ``pc.index_in``
       (every src's rank row is in the same bucket by construction),
       emit per-task (dst, Σ rank/outdeg) partials, exchange them by
       dst through one narrow ``bucket_dataset`` write (node-sized
       rows, never edges);
    2. reduce: per bucket task — sum the bucket's complete contribution
       set per node, attach the static outdeg from the current rank
       bucket, write the next rank dir (rows are already in their home
       bucket, so this "exchange" is a local partitioned write).

    Scale properties: the only edge-sized I/O after the one-time
    bucketing is the per-iteration LOCAL bucket read; everything
    exchanged is O(nodes). Skew caveat (as ``bucket.py``): a node with
    a corpus-sized neighborhood lands its edges in one bucket."""
    import ray.data as rd

    from .bucket import _read_bucket, bucket_dataset

    init = 1.0 / n
    base = (1.0 - damping) / n
    rank_schema = pa.schema([("node", pa.int64()), ("rank", pa.float64()),
                             ("outdeg", pa.float64())])
    contrib_schema = pa.schema([("node", pa.int64()), ("c", pa.float64())])

    edir = bucket_dataset(
        edges.map_batches(
            lambda t: pa.table({"src": t["key"], "dst": t["dst"]}),
            batch_format="pyarrow"),
        "src", n_buckets,
        schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]))
    rdir = bucket_dataset(
        nodes.map_batches(
            lambda t: pa.table({
                "node": t["key"],
                "rank": pa.array([init] * len(t), pa.float64()),
                "outdeg": pc.cast(t["key_count"], pa.float64())}),
            batch_format="pyarrow"),
        "node", n_buckets, schema=rank_schema)

    def contrib(k: int, rdir: str) -> pa.Table | None:
        et = _read_bucket(edir, k, drop_key="bucket",
                          columns=["src", "dst"])
        rt = _read_bucket(rdir, k, drop_key="bucket",
                          columns=["node", "rank", "outdeg"])
        if et is None or rt is None or len(et) == 0:
            return None
        rate = (rt["rank"].to_numpy(zero_copy_only=False)
                / rt["outdeg"].to_numpy(zero_copy_only=False))
        idx = pc.index_in(et["src"],
                          value_set=rt["node"].combine_chunks())
        c = rate[idx.to_numpy(zero_copy_only=False)]
        g = pa.table({"node": et["dst"],
                      "c": pa.array(c, pa.float64())}).group_by(
            "node", use_threads=False).aggregate([("c", "sum")])
        return pa.table({"node": g["node"], "c": g["c_sum"]})

    def reduce_(k: int, cdir: str, rdir: str) -> pa.Table | None:
        ct = _read_bucket(cdir, k, drop_key="bucket",
                          columns=["node", "c"])
        rt = _read_bucket(rdir, k, drop_key="bucket",
                          columns=["node", "outdeg"])
        if ct is None or rt is None or len(ct) == 0:
            return None
        g = ct.group_by("node", use_threads=False).aggregate(
            [("c", "sum")])
        idx = pc.index_in(g["node"],
                          value_set=rt["node"].combine_chunks())
        rank = pc.add(pa.scalar(base),
                      pc.multiply(pa.scalar(damping), g["c_sum"]))
        return pa.table({"node": g["node"], "rank": rank,
                         "outdeg": rt["outdeg"].take(idx)})

    return _bucketed_rounds(
        edir, rdir, n_buckets, contrib, reduce_,
        contrib_schema.empty_table(), rank_schema.empty_table(),
        max_rounds=n_iters,
        read_back=lambda d: rd.read_parquet(
            d, columns=["node", "rank"],
            file_extensions=["parquet"]).materialize())

def _cc_bucketed(nodes_ds, edges_ds, max_iters: int, n_buckets: int):
    """Edge-pinned connected components (the ``pagerank`` bucketed
    layout applied to min-label propagation): symmetric edges bucket to
    storage ONCE by src; labels live in an aligned node-bucketed dir.
    Per round — two streaming pipelines, zero sorts:

    1. msg: per bucket task, join labels→edges via ``pc.index_in`` and
       emit per-task min label per DESTINATION; exchange the node-sized
       (node, lbl) messages by dst through one ``bucket_dataset`` write;
    2. reduce: per bucket task, min(own label, received mins) — nodes
       with no messages (isolated, or already at the fixed point of
       their neighborhood) keep their own label — written as the next
       label dir (rows already in their home bucket: local write).

    Convergence = unchanged label sum, read from the new dir's label
    column (node-sized scan, no driver graph structure). Consumed dirs
    are deleted every round (O(1) dirs on disk)."""
    import shutil

    import ray.data as rd

    from .bucket import _read_bucket, bucket_dataset, map_buckets

    lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    edges_ds = edges_ds.materialize()  # consumed twice: edges + endpoints

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edir = bucket_dataset(
        edges_ds.map_batches(sym, batch_format="pyarrow"),
        "src", n_buckets,
        schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]))

    # label universe = nodes ∪ edge endpoints (cogroup parity: endpoints
    # absent from nodes_ds are implicit nodes), deduped per bucket so
    # duplicate node rows emit one output row — both review round-3
    def as_node(col):
        return lambda t: pa.table({"node": pc.cast(t[col], pa.int64())})

    raw = bucket_dataset(
        nodes_ds.map_batches(as_node("node"), batch_format="pyarrow")
        .union(edges_ds.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays([
                t["a"].combine_chunks().cast(pa.int64()),
                t["b"].combine_chunks().cast(pa.int64())])}),
            batch_format="pyarrow")),
        "node", n_buckets,
        schema=pa.schema([("node", pa.int64())]))

    def init_bucket(k: int) -> pa.Table | None:
        nt = _read_bucket(raw, k, drop_key="bucket", columns=["node"])
        if nt is None or len(nt) == 0:
            return None
        u = nt.group_by("node", use_threads=False).aggregate([])
        return pa.table({"node": u["node"], "label": u["node"]})

    ldir = bucket_dataset(
        map_buckets(n_buckets, init_bucket, lbl_schema.empty_table()),
        "node", n_buckets, schema=lbl_schema)
    shutil.rmtree(raw, ignore_errors=True)

    def msg(k: int, ldir: str) -> pa.Table | None:
        et = _read_bucket(edir, k, drop_key="bucket",
                          columns=["src", "dst"])
        lt = _read_bucket(ldir, k, drop_key="bucket",
                          columns=["node", "label"])
        if et is None or lt is None or len(et) == 0:
            return None
        idx = pc.index_in(et["src"],
                          value_set=lt["node"].combine_chunks())
        g = pa.table({"node": et["dst"],
                      "label": lt["label"].take(idx)}).group_by(
            "node", use_threads=False).aggregate([("label", "min")])
        return pa.table({"node": g["node"], "label": g["label_min"]})

    def reduce_(k: int, mdir: str, ldir: str) -> pa.Table | None:
        lt = _read_bucket(ldir, k, drop_key="bucket",
                          columns=["node", "label"])
        if lt is None or len(lt) == 0:
            return None
        mt = _read_bucket(mdir, k, drop_key="bucket",
                          columns=["node", "label"])
        if mt is None or len(mt) == 0:
            return lt
        g = mt.group_by("node", use_threads=False).aggregate(
            [("label", "min")])
        idx = pc.index_in(lt["node"],
                          value_set=g["node"].combine_chunks())
        heard = g["label_min"].take(idx)
        new = pc.min_element_wise(
            lt["label"], pc.fill_null(heard, np.iinfo(np.int64).max))
        return pa.table({"node": lt["node"], "label": new})

    prev_sum = [None]

    def converged(ldir: str) -> bool:
        cur_sum = rd.read_parquet(
            ldir, columns=["label"],
            file_extensions=["parquet"]).sum("label")
        if cur_sum == prev_sum[0]:
            return True
        prev_sum[0] = cur_sum
        return False

    return _bucketed_rounds(
        edir, ldir, n_buckets, msg, reduce_,
        lbl_schema.empty_table(), lbl_schema.empty_table(),
        max_rounds=max_iters, stop_fn=converged,
        read_back=lambda d: rd.read_parquet(
            d, columns=["node", "label"],
            file_extensions=["parquet"]).map_batches(
            lambda t: pa.table({"node": t["node"],
                                "component": t["label"]}),
            batch_format="pyarrow").materialize())


def _copurchase_pair_counts(sf_dir: str):
    """(a, b, n_orders) co-purchase weights over the part catalog —
    parts a < b that appear in the same order, weighted by how many
    orders share them.  One ``grouped_apply`` exchange on l_orderkey
    (per-order completeness) emits canonical pairs, then one
    ``grouped_aggregate`` on the packed (a<<32|b) key sums them; both
    exchanges are key-hash shuffles of short int rows, nothing
    corpus-sized leaves the workers."""
    from .common import grouped_aggregate, read

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    empty = pa.table({"ek": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        parts = np.unique(g["l_partkey"].to_numpy())
        if len(parts) < 2:
            return empty
        i, j = np.triu_indices(len(parts), k=1)
        ek = (parts[i].astype(np.int64) << np.int64(32)) | parts[j]
        return pa.table({"ek": pa.array(ek, pa.int64()),
                         "c": pa.array(np.ones(len(ek), np.int64))})

    pair_rows = grouped_apply(li, "l_orderkey", pairs, empty,
                              min_group_size=2)
    return grouped_aggregate(pair_rows, "ek", [("c", "sum")])


def _unpack_edges(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ek = t["ek"].to_numpy()
    return ek >> np.int64(32), ek & np.int64(0xFFFFFFFF)


def top_copurchased_parts(sf_dir: str, k: int = 20):
    """Top-k co-purchased part pairs by shared-order count (tie-break
    (a, b) ascending) — partial top-k per block after the pair-count
    reduce, tiny driver merge."""
    import pandas as pd

    from .common import _ensure_cols, finish

    counts = _copurchase_pair_counts(sf_dir)

    def block_topk(t: pa.Table) -> pa.Table:
        a, b = _unpack_edges(t)
        df = pd.DataFrame({"a": a, "b": b,
                           "n_orders": t["c_sum"].to_numpy()})
        df = df.sort_values(["n_orders", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = counts.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    parts = _ensure_cols(parts, {"a": "int64", "b": "int64",
                                 "n_orders": "int64"})
    parts = parts.sort_values(["n_orders", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)
    return finish(parts.astype({"a": "int64", "b": "int64",
                                "n_orders": "int64"}))


def part_copurchase_triangles(sf_dir: str,
                              broadcast_edge_limit: int = 4_000_000):
    """Distributed triangle count over the part co-purchase graph —
    the classic degree-ordered algorithm (Cohen / Suri-Vassilvitskii
    MapReduce form):

    1. distinct edges from ``_copurchase_pair_counts`` (weights
       dropped);
    2. per-vertex degrees via one grouped_aggregate over the exploded
       endpoints;
    3. orient every edge from the (degree, id)-SMALLER endpoint to the
       larger — each triangle then has exactly ONE vertex with two
       out-edges, so step 4 emits each triangle exactly once and the
       per-vertex wedge work is bounded by the oriented out-degree
       (O(m^1.5) total, independent of hub skew);
    4. wedges per source vertex via grouped_apply (canonical (min,max)
       keys), then ONE semi shuffle_join of the wedge rows against the
       canonical edge set — surviving wedges ARE the triangles;
    5. count distributed (per-block partial sums).

    The degree map is vertex-sized and broadcast once via ray.put
    (the part catalog is a bounded dimension at any corpus scale — the
    same assumption the relational suite documents for part/nation
    broadcasts); the edge/wedge sides stream through shuffles only.
    Returns one row: n_triangles (full three-way-self-join SQL
    oracle)."""
    import pandas as pd
    import ray

    from .common import bcast_get, grouped_aggregate, read  # noqa: F401
    from .join import shuffle_join

    # edge-sized (O(E) short int rows): materialize ONCE — three
    # consumers below (degrees, orientation, membership) would otherwise
    # re-execute the pair-emit exchange three times
    counts = _copurchase_pair_counts(sf_dir).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        a, b = _unpack_edges(t)
        return pa.table({"v": pa.array(np.concatenate([a, b]), pa.int64()),
                         "d": pa.array(np.ones(2 * len(a), np.int64))})

    deg = grouped_aggregate(
        counts.map_batches(endpoints, batch_format="pyarrow"),
        "v", [("d", "sum")]).to_pandas()
    if deg.empty:
        return pd.DataFrame({"n_triangles": pd.Series([0], dtype="int64")})
    deg = deg.sort_values("v", kind="mergesort")
    deg_ref = ray.put((deg["v"].to_numpy(np.int64),
                       deg["d_sum"].to_numpy(np.int64)))

    def orient(t: pa.Table) -> pa.Table:
        vs, ds = bcast_get(deg_ref)
        a, b = _unpack_edges(t)
        da = ds[np.searchsorted(vs, a)]
        db = ds[np.searchsorted(vs, b)]
        fwd = (da < db) | ((da == db) & (a < b))
        src = np.where(fwd, a, b)
        dst = np.where(fwd, b, a)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    oriented = counts.map_batches(orient, batch_format="pyarrow")
    wempty = pa.table({"ek": pa.array([], pa.int64())})

    def wedges(g: pa.Table) -> pa.Table:
        nbrs = np.unique(g["dst"].to_numpy())
        if len(nbrs) < 2:
            return wempty
        i, j = np.triu_indices(len(nbrs), k=1)
        ek = (nbrs[i].astype(np.int64) << np.int64(32)) | nbrs[j]
        return pa.table({"ek": pa.array(ek, pa.int64())})

    wedge_ds = grouped_apply(oriented, "src", wedges, wempty,
                             min_group_size=2)
    n_edges = counts.count()
    if n_edges <= broadcast_edge_limit:
        # small/medium graphs: the canonical edge-key set is a few MB —
        # broadcast it sorted and membership-test each wedge block
        # in place (zero extra exchange; the 19M-wedge semi-join shuffle
        # at sf0.1 cost ~3x the rest of the kernel combined)
        ek_sorted = np.sort(np.concatenate(
            [b["ek"].to_numpy() for b in
             counts.iter_batches(batch_format="pyarrow")]
            or [np.array([], np.int64)]))
        ek_ref = ray.put(ek_sorted)

        def member_count(t: pa.Table) -> pa.Table:
            eks = bcast_get(ek_ref)
            w = t["ek"].to_numpy()
            pos = np.searchsorted(eks, w)
            pos[pos >= len(eks)] = max(len(eks) - 1, 0)
            hit = int((eks[pos] == w).sum()) if len(eks) else 0
            return pa.table({"n": pa.array([hit], pa.int64())})

        parts = wedge_ds.map_batches(
            member_count, batch_format="pyarrow").to_pandas()
    else:
        # scale twin: edge sets too large to broadcast go through the
        # exact semi shuffle join (pinned equal to the broadcast path
        # in tests)
        edge_keys = counts.map_batches(
            lambda t: pa.table({"ek": t["ek"]}), batch_format="pyarrow")
        tri = shuffle_join(wedge_ds, edge_keys, "ek", [], [], how="semi",
                           left_types={}, right_types={})
        parts = tri.map_batches(
            lambda t: pa.table({"n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})
