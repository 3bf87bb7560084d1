"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Shapes (ray_guide.md "Aggregation at scale"):
- exact: content-hash in map_batches → groupby(hash) → min(doc_id);
- MinHash-LSH: shingle→minhash per batch → explode (band, band_hash,
  doc) rows → groupby bands → candidate pairs → Jaccard verify;
- SimHash: vectorized 64-bit hyperplane-free token-hash majority;
- embedding near-dup: block matmul against a broadcast matrix.

The exact/prefix variants have DuckDB oracles; the sketch-based ones are
verified in pytest against brute-force Jaccard/cosine at small scale
(false-negative-free within the banding guarantee).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import finish, read, read_arrow

MERSENNE = (1 << 61) - 1


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Keep min doc_id per exact text: groupby(text) → min."""
    from ray.data.aggregate import Min

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .groupby("text")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()[["doc_id"]]
    )
    return finish(out, ["doc_id"])


def dedup_prefix(sf_dir: str, n_tokens: int = 3) -> pd.DataFrame:
    """Near-dup-ish: dedup on the first-N-token prefix key (creates real
    duplicate groups on this corpus). Keeps min doc_id per key."""
    from ray.data.aggregate import Min

    def key(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        toks = pc.split_pattern_regex(low, r"\W+")
        keys = [
            " ".join([w for w in l if w][:n_tokens]) for l in toks.to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "k": pa.array(keys, pa.string())})

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()[["doc_id"]]
    )
    return finish(out, ["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _token_shingles(text: str, k: int) -> set[int]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    if len(toks) < k:
        return {hash_bytes(" ".join(toks))} if toks else set()
    return {hash_bytes(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def hash_bytes(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _minhash(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), MERSENNE, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (num_perm, n_shingles) universal hash mod Mersenne prime
    vals = (np.outer(a, x) + b[:, None]) % MERSENNE
    return vals.min(axis=1)


def minhash_lsh_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Candidate pairs via LSH banding, verified with exact shingle
    Jaccard >= threshold. Returns (a, b) doc_id pairs, a < b.

    Pipeline: map_batches(minhash) → explode band rows → groupby
    (band, band_hash) → pairs within buckets → dedup pairs → verify.
    """
    a_p, b_p = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def sigs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_doc, out_band, out_bh = [], [], []
        shingle_map = {}
        for did, text in zip(ids, t["text"].to_pylist()):
            sh = _token_shingles(text, shingle_k)
            shingle_map[did] = sh
            mh = _minhash(sh, a_p, b_p)
            for bi in range(bands):
                band = mh[bi * rows_per_band : (bi + 1) * rows_per_band]
                out_doc.append(did)
                out_band.append(bi)
                out_bh.append(hash_bytes(f"{bi}:{band.tobytes().hex()}"))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.uint64()),
            }
        )

    band_rows = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sigs, batch_format="pyarrow")
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        pairs = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})

    cand = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates().reset_index(drop=True)
    if not len(cand):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})

    # exact Jaccard verify on the (small) candidate set
    docs = read_arrow(sf_dir, "documents", ["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    keep_a, keep_b = [], []
    sh_cache: dict[int, set[int]] = {}

    def sh_of(d):
        if d not in sh_cache:
            sh_cache[d] = _token_shingles(texts[d], shingle_k)
        return sh_cache[d]

    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = sh_of(a), sh_of(b)
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            keep_a.append(a)
            keep_b.append(b)
    return finish(pd.DataFrame({"a": keep_a, "b": keep_b}).astype("int64"), ["a", "b"])


def jaccard_brute_force(texts: dict[int, str], threshold: float = 0.5,
                        shingle_k: int = 3) -> set[tuple[int, int]]:
    """O(n^2) oracle used by tests to validate minhash_lsh_pairs."""
    ids = sorted(texts)
    sh = {d: _token_shingles(texts[d], shingle_k) for d in ids}
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = len(sh[a] | sh[b])
            if u and len(sh[a] & sh[b]) / u >= threshold:
                out.add((a, b))
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash over \\w+ tokens (Charikar 2002): sum token-hash
    bit vectors, sign per bit. Returned as signed int64."""

    def sh(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            toks = [w for w in "".join(
                c if c.isalnum() else " " for c in text.lower()
            ).split() if w]
            acc = np.zeros(64, dtype=np.int64)
            for w in toks:
                h = np.uint64(hash_bytes(w))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            val = int(np.packbits((acc > 0).astype(np.uint8), bitorder="little")
                      .view(np.uint64)[0])
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(out, pa.int64())})

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sh, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    """All (a, b) vec_id pairs with cosine similarity >= threshold.

    Ray side: normalized block matmul against the broadcast full matrix
    (the IVF/LSH-bucketed variant is the scale path; brute force is the
    exactness baseline). Computed in float64 to match the SQL oracle.
    """
    import ray

    emb = read_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids_all = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids_all, matn))

    def block(t: pa.Table) -> pa.Table:
        ids_all, matn = ray.get(ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        sims = (v / n[:, None]) @ matn.T  # (batch, N)
        ai, bj = np.nonzero(sims >= threshold)
        a = ids[ai]
        b = ids_all[bj]
        keep = a < b  # dedupe + drop self
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    out = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(block, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                            "b": pd.Series([], dtype="int64")})
    return finish(out, ["a", "b"])


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8,
                        max_doc_id: int = 200) -> pd.DataFrame:
    """Exact 1-gram (distinct-token) Jaccard pairs >= threshold among
    doc_id < max_doc_id — the brute-force small end of the dedup family with
    a DuckDB oracle (the MinHash pipeline is its scale path). Pairs are
    checked in map_batches blocks against a broadcast token-set table."""
    import ray

    docs = read_arrow(sf_dir, "documents", ["doc_id", "text"])
    import pyarrow.compute as pcmp

    mask = pcmp.less(docs["doc_id"], max_doc_id)
    docs = docs.filter(mask)
    ids = docs["doc_id"].to_pylist()
    toks = {
        d: set(w for w in __import__("re").findall(r"\w+", t.lower()))
        for d, t in zip(ids, docs["text"].to_pylist())
    }
    ref = ray.put(toks)

    def block(t: pa.Table) -> pa.Table:
        toks = ray.get(ref)
        all_ids = sorted(toks)
        out_a, out_b = [], []
        for a in t["doc_id"].to_pylist():
            sa = toks[a]
            for b in all_ids:
                if b <= a:
                    continue
                sb = toks[b]
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                if union and inter / union >= threshold:
                    out_a.append(a)
                    out_b.append(b)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    out = (
        read(sf_dir, "documents", ["doc_id"])
        .map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], max_doc_id)),
            batch_format="pyarrow",
        )
        .map_batches(block, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                            "b": pd.Series([], dtype="int64")})
    return finish(out, ["a", "b"])


def neardup_components(sf_dir: str, threshold: float = 0.8,
                       max_doc_id: int = 200) -> pd.DataFrame:
    """Duplicate-cluster assignment: connected components over the
    ngram-Jaccard near-dup graph, labeled by min doc_id.

    The pair-finding is the distributed part (ngram_jaccard_pairs /
    minhash at scale); the component merge runs union-find driver-side —
    valid because near-dup edge sets are orders of magnitude smaller
    than the corpus (ray_guide: union-find on the driver only if the
    candidate set is provably small; the iterative min-label-propagation
    groupby is the scale path)."""
    pairs = ngram_jaccard_pairs(sf_dir, threshold, max_doc_id)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    docs = read_arrow(sf_dir, "documents", ["doc_id"])
    ids = [d for d in docs["doc_id"].to_pylist() if d < max_doc_id]
    for d in ids:
        find(d)
    for a, b in zip(pairs["a"], pairs["b"]):
        union(int(a), int(b))
    out = pd.DataFrame(
        {"doc_id": ids, "component": [find(d) for d in ids]}
    ).astype("int64")
    return finish(out, ["doc_id"])


def dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """Policy dedup: within each first-3-token prefix group keep the
    BEST doc (max n_chars, doc_id tiebreak) — the keep-highest-quality
    variant of dedup_prefix (training-data pipelines keep the best copy,
    not the first)."""

    def key(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        toks = pc.split_pattern_regex(low, r"\W+")
        keys = [" ".join([w for w in l if w][:3]) for l in toks.to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": t["n_chars"],
            "k": pa.array(keys, pa.string()),
        })

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        return g.head(1)[["doc_id", "n_chars"]]

    out = (
        read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"doc_id": "int64", "n_chars": "int64"})
    return finish(out, ["doc_id"])
