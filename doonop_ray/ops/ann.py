"""Approximate-nearest-neighbor search over the ``embeddings`` table.

- ``ann_topk_cosine``: brute-force exact top-k — per-batch float64
  matmul against a broadcast query matrix, per-batch partial top-k,
  driver-side merge of the tiny partials. This is the correctness
  baseline; at 100 TB the same stage runs behind an IVF/LSH pre-filter.
- ``ann_topk_lsh``: the scale path — random-hyperplane LSH buckets
  shrink the candidate set before exact re-scoring; recall measured in
  tests against the brute-force baseline.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import finish, read, read_arrow


def _queries(sf_dir: str, n_queries: int):
    emb = read_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    qids = ids[order][:n_queries]
    q = mat[order][:n_queries]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    return qids, q / qn[:, None]


def ann_topk_cosine(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vec_ids.

    Returns (query_id, rank, neighbor_id) with rank 1..k ordered by
    similarity desc, neighbor_id asc on ties; self-matches excluded.
    """
    import ray

    qids, qmat = _queries(sf_dir, n_queries)
    ref = ray.put((qids, qmat))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        sims = qmat @ (v / n[:, None]).T  # (nq, batch)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]
            cand_ids = ids[mask]
            cand_s = s[mask]
            top = min(k, len(cand_ids))
            if top == 0:
                continue
            idx = np.argpartition(-cand_s, top - 1)[:top]
            out_q.extend([int(qids[qi])] * top)
            out_id.extend(cand_ids[idx].tolist())
            out_s.extend(cand_s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.sim, r.neighbor_id))
        for rank, r in enumerate(top, 1):
            rows.append((int(qid), rank, int(r.neighbor_id)))
    out = pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])
    return finish(out, ["query_id", "rank"])


def ann_topk_lsh(sf_dir: str, k: int = 10, n_queries: int = 5,
                 n_planes: int = 6, n_probe_bits: int = 2,
                 seed: int = 17) -> pd.DataFrame:
    """LSH-bucketed ANN: random-hyperplane signatures partition the
    corpus; queries probe their bucket plus all buckets within
    ``n_probe_bits`` Hamming distance, then re-score exactly."""
    import itertools

    import ray

    qids, qmat = _queries(sf_dir, n_queries)
    rng = np.random.default_rng(seed)
    dim = qmat.shape[1]
    planes = rng.standard_normal((n_planes, dim))

    def sig_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0) @ (1 << np.arange(n_planes))

    qsigs = sig_of(qmat)
    probe_sets = []
    for s in qsigs:
        probes = {int(s)}
        for r in range(1, n_probe_bits + 1):
            for bits in itertools.combinations(range(n_planes), r):
                flip = 0
                for b in bits:
                    flip |= 1 << b
                probes.add(int(s) ^ flip)
        probe_sets.append(probes)
    ref = ray.put((qids, qmat, planes, probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        qids, qmat, planes, probe_sets = ray.get(ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        vn = v / n[:, None]
        sigs = ((vn @ planes.T) > 0) @ (1 << np.arange(planes.shape[0]))
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qids)):
            cand = np.fromiter(
                (int(s) in probe_sets[qi] for s in sigs), bool, len(sigs)
            )
            cand &= ids != qids[qi]
            if not cand.any():
                continue
            sims = vn[cand] @ qmat[qi]
            cids = ids[cand]
            top = min(k, len(cids))
            idx = np.argpartition(-sims, top - 1)[:top]
            out_q.extend([int(qids[qi])] * top)
            out_id.extend(cids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        top = heapq.nsmallest(min(k, len(g)), g.itertuples(index=False),
                              key=lambda r: (-r.sim, r.neighbor_id))
        for rank, r in enumerate(top, 1):
            rows.append((int(qid), rank, int(r.neighbor_id)))
    out = pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])
    return finish(out, ["query_id", "rank"])


def ann_topk_ivf(sf_dir: str, k: int = 10, n_queries: int = 5,
                 n_cells: int = 16, n_probe: int = 4,
                 kmeans_iters: int = 5, seed: int = 23) -> pd.DataFrame:
    """IVF ANN (the scale path): k-means-lite centroids partition the
    corpus into inverted lists; queries probe the n_probe nearest cells
    and re-score exactly inside them. Centroids train on a sample
    driver-side (at 100 TB: map_batches partial-assign + mergeable
    centroid sums per iteration); assignment + probing are map_batches.
    Recall measured against the brute-force baseline in tests."""
    import ray

    qids, qmat = _queries(sf_dir, n_queries)
    emb = read_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    mat = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    matn = mat / n[:, None]

    rng = np.random.default_rng(seed)
    cents = matn[rng.choice(len(matn), size=min(n_cells, len(matn)),
                            replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(matn @ cents.T, axis=1)  # cosine on unit vecs
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = matn[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    probe_cells = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qmat, cents, probe_cells))

    def partial(t: pa.Table) -> pa.Table:
        qids, qmat, cents, probe_cells = ray.get(ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        nn = np.linalg.norm(v, axis=1)
        nn[nn == 0] = 1.0
        vn = v / nn[:, None]
        cell = np.argmax(vn @ cents.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qids)):
            cand = np.isin(cell, probe_cells[qi]) & (ids != qids[qi])
            if not cand.any():
                continue
            sims = vn[cand] @ qmat[qi]
            cids = ids[cand]
            top = min(k, len(cids))
            idx = np.argpartition(-sims, top - 1)[:top]
            out_q.extend([int(qids[qi])] * top)
            out_id.extend(cids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        top = heapq.nsmallest(min(k, len(g)), g.itertuples(index=False),
                              key=lambda r: (-r.sim, r.neighbor_id))
        for rank, r in enumerate(top, 1):
            rows.append((int(qid), rank, int(r.neighbor_id)))
    out = pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])
    return finish(out, ["query_id", "rank"])
