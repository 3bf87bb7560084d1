"""Mergeable sketches (ray_guide "Aggregation at scale": emit one
serialized sketch per batch, merge in a tiny second stage).

HyperLogLog (Flajolet et al. 2007) with p=12 (4096 registers, ~1.6%
standard error): per-batch register arrays are elementwise-max-merged —
the canonical mergeable-sketch shape for 100 TB distinct counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import finish, r4, read

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(v.encode(), digest_size=8).digest(), "big"
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _registers(values: list[str]) -> np.ndarray:
    regs = np.zeros(M, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)
    # rank = leading zeros of the remaining 64-P bits, +1
    lz = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    for r in range(64 - P + 1):
        hit = (cur & mask) != 0
        lz[(lz == 0) & hit] = r + 1
        cur = cur << np.uint64(1)
    np.maximum.at(regs, idx, lz)
    return regs


def _estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # small-range correction
    return float(est)


def hll_distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id per event_type: per-batch HLL
    register partials -> elementwise-max merge -> estimate. Accuracy
    pinned vs exact distinct counts in tests (~1.6% stderr at p=12)."""

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-type grouping (round-2 VERDICT: the pandas
        # conversion here was the only non-Arrow hop in the stage):
        # distinct (type, user) pairs via C++ group_by, then one pass
        # over the sorted pairs slices each type's user run
        import pyarrow.compute as pc_

        pairs = t.select(["event_type", "user_id"]).group_by(
            ["event_type", "user_id"], use_threads=False).aggregate([])
        pairs = pairs.sort_by("event_type")
        et = pairs["event_type"].combine_chunks()
        users = pairs["user_id"].combine_chunks()
        types, blobs = [], []
        n = len(pairs)
        if n:
            change = np.flatnonzero(np.asarray(
                pc_.not_equal(et.slice(1), et.slice(0, n - 1)),
                dtype=bool))
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((starts[1:], [n]))
            for s, e in zip(starts, ends):
                types.append(et[int(s)].as_py())
                blobs.append(_registers(
                    [str(u) for u in users.slice(s, e - s).to_pylist()]
                ).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    partials = (
        read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for et, g in partials.groupby("event_type"):
        merged = np.zeros(M, dtype=np.uint8)
        for blob in g["regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
        rows.append((et, int(round(_estimate(merged)))))
    out = pd.DataFrame(rows, columns=["event_type", "approx_users"])
    return finish(out, ["event_type"])


def exact_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    nbins: int = 4096, collect_cap: int = 65536) -> pd.DataFrame:
    """EXACT global quantiles of events.value without a global sort —
    iterative histogram refinement (the classic distributed
    selection-by-binning algorithm):

    pass 0: per-batch (min, max, count) partials, merged via Ray's
            bounded aggregate;
    pass k: per-batch fixed-bin histogram partials over the current
            [lo, hi) candidate range (bin index = floor((v-lo)/width),
            IDENTICAL formula in the build and filter passes so binning
            is exact) -> ≤``nbins`` merged counts on the driver ->
            cumulative counts locate the bin holding each target rank;
    final:  once a quantile's candidate bin holds ≤``collect_cap`` rows
            it is collected, sorted, and indexed exactly.

    Rank definition (matches the SQL oracle): the value at 1-based rank
    ``ceil(q*n)`` of the ascending sort. Every pass is a pruned
    single-column scan with mergeable partials — no corpus-sized
    state anywhere; the number of refine passes is
    O(log_nbins(n/collect_cap)) ≈ 2 even at 10^12 rows.

    All quantiles refine TOGETHER: each round runs ONE scan computing
    the histograms of every active candidate range (deduplicated — in
    round 1 all quantiles share [gmin, gmax], so the old
    one-scan-per-quantile loop rescanned the corpus len(qs) times for
    the identical histogram), and the final collection is likewise one
    combined scan. Scan count is O(passes + 1), independent of
    len(qs); per-quantile binning arithmetic is bit-identical to the
    sequential form."""
    import math

    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read(sf_dir, "events", ["value"])
    g = ds.aggregate(Min("value"), Max("value"), Count())
    n = int(g["count()"])
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    gmin, gmax = float(g["min(value)"]), float(g["max(value)"])

    def _hist_multi(ranges: list[tuple[float, float, bool]]) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy(zero_copy_only=False)
            bins_out, cnt_out = [], []
            for j, (lo, hi, last) in enumerate(ranges):
                width = (hi - lo) / nbins
                # values == hi belong to the bin beyond the candidate
                # range unless hi is the global max (match collect)
                vv = v[(v >= lo) & ((v <= hi) if last else (v < hi))]
                if not len(vv):
                    continue
                b = np.minimum(((vv - lo) / width).astype(np.int64),
                               nbins - 1)
                counts = np.bincount(b, minlength=nbins)
                nz = np.flatnonzero(counts)
                bins_out.append(nz + j * nbins)
                cnt_out.append(counts[nz])
            if not bins_out:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({
                "bin": pa.array(np.concatenate(bins_out), pa.int64()),
                "cnt": pa.array(np.concatenate(cnt_out), pa.int64())})

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
        dense = np.zeros((len(ranges), nbins), dtype=np.int64)
        if len(rows):
            b = rows["bin"].to_numpy()
            dense[b // nbins, b % nbins] = rows["cnt"].to_numpy()
        return dense

    def _collect_multi(
            ranges: list[tuple[float, float, bool]]) -> list[np.ndarray]:
        def keep(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy(zero_copy_only=False)
            out_j, out_v = [], []
            for j, (lo, hi, last) in enumerate(ranges):
                vv = v[(v >= lo) & ((v <= hi) if last else (v < hi))]
                if len(vv):
                    out_j.append(np.full(len(vv), j, dtype=np.int64))
                    out_v.append(vv)
            if not out_j:
                return pa.table({"j": pa.array([], pa.int64()),
                                 "value": pa.array([], pa.float64())})
            return pa.table({
                "j": pa.array(np.concatenate(out_j), pa.int64()),
                "value": pa.array(
                    np.concatenate(out_v).astype(np.float64),
                    pa.float64())})

        df = ds.map_batches(keep, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
        js = df["j"].to_numpy()
        vs = df["value"].to_numpy()
        return [np.sort(vs[js == j]) for j in range(len(ranges))]

    # per-quantile refinement state; `val` set = resolved
    st = {q: {"lo": gmin, "hi": gmax, "r": int(math.ceil(q * n)),
              "val": None, "collect": False} for q in qs}
    for _ in range(8):
        act = []
        for q, s in st.items():
            if s["val"] is not None or s["collect"]:
                continue
            if s["hi"] <= s["lo"]:
                s["val"] = s["lo"]  # degenerate range resolves exactly
            else:
                act.append(q)
        if not act:
            break
        uniq: dict[tuple[float, float], list] = {}
        for q in act:
            uniq.setdefault((st[q]["lo"], st[q]["hi"]), []).append(q)
        keys = list(uniq)
        dense = _hist_multi([(lo, hi, hi >= gmax) for lo, hi in keys])
        for j, key in enumerate(keys):
            lo, hi = key
            width = (hi - lo) / nbins
            cum = np.cumsum(dense[j])
            for q in uniq[key]:
                s = st[q]
                b = int(np.searchsorted(cum, s["r"]))
                in_bin = int(dense[j][b])
                s["r"] -= int(cum[b - 1]) if b else 0
                s["lo"] = lo + b * width
                s["hi"] = hi if b == nbins - 1 else lo + (b + 1) * width
                if in_bin <= collect_cap:
                    s["collect"] = True

    need = [q for q, s in st.items() if s["val"] is None]
    if need:
        uniq = {}
        for q in need:
            s = st[q]
            if s["hi"] <= s["lo"]:
                s["val"] = s["lo"]
            else:
                uniq.setdefault((s["lo"], s["hi"]), []).append(q)
        if uniq:
            keys = list(uniq)
            vals = _collect_multi([(lo, hi, hi >= gmax) for lo, hi in keys])
            for j, key in enumerate(keys):
                for q in uniq[key]:
                    st[q]["val"] = float(vals[j][st[q]["r"] - 1])

    out = pd.DataFrame([(float(q), st[q]["val"]) for q in qs],
                       columns=["q", "value"])
    return finish(out, ["q"])


def _stratified_compact(v: np.ndarray, w: np.ndarray, m: int):
    """Weighted rank-stratified compaction: collapse a sorted-by-value
    (v, w) summary to ``m`` entries, placing one representative at each
    weighted rank (i+0.5)*W/m and assigning it that stratum's weight.
    Deterministic; total weight is preserved exactly (last stratum
    absorbs rounding)."""
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) <= m:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(m) + 0.5) * (total / m)
    idx = np.searchsorted(cw, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    out_w = np.full(m, total / m)
    out_w[-1] = total - (m - 1) * (total / m)
    return v[idx], out_w


def quantile_sketch(sf_dir: str,
                    qs: tuple[float, ...] = (0.01, 0.1, 0.25, 0.5,
                                             0.75, 0.9, 0.99),
                    m: int = 2048, fanin: int = 8) -> pd.DataFrame:
    """MERGEABLE approximate quantiles of events.value in ONE streaming
    pass (the sketch counterpart of ``exact_quantiles``' multi-pass
    exact selection — use this when the data can only be seen once or
    pass count is precious):

    1. per-batch: sort the batch, keep ``m`` rank-stratified
       representatives each weighing n/m rows (rank error ≤ n/(2m)
       per batch, additive across batches);
    2. intermediate combine: repartition the (value, weight) summaries
       to ``fanin`` blocks and compact each block back to ``m`` weighted
       entries — the tree-merge level that keeps the driver read
       bounded at fanin × m rows no matter the corpus size;
    3. driver: final compact + weighted-rank lookup per quantile.

    Deterministic (no randomness), mergeable (weighted summaries concat
    then re-compact), bounded memory (m floats per task). Accuracy is
    enforced by the one-sided ``quantile_sketch_violations`` check:
    every estimate's true rank must sit within eps·N of its target."""
    import ray.data  # noqa: F401  (Dataset ops on the read)

    def partial(t: pa.Table) -> pa.Table:
        v = np.sort(t["value"].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        if n <= m:
            return pa.table({"v": v, "w": np.ones(n)})
        idx = np.floor((np.arange(m) + 0.5) * (n / m)).astype(np.int64)
        w = np.full(m, n / m)
        w[-1] = n - (m - 1) * (n / m)
        return pa.table({"v": v[idx], "w": w})

    def combine(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        cv, cw = _stratified_compact(v, w, m)
        return pa.table({"v": cv, "w": cw})

    summary = (read(sf_dir, "events", ["value"])
               .map_batches(partial, batch_format="pyarrow")
               .repartition(fanin)
               .map_batches(combine, batch_format="pyarrow",
                            batch_size=None)
               .to_pandas())
    if summary.empty:
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "est": pd.Series([], dtype="float64")})
    v = summary["v"].to_numpy()
    w = summary["w"].to_numpy()
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    ests = [float(v[np.searchsorted(cw, q * total, side="left")
                    .clip(0, len(v) - 1)]) for q in qs]
    return pd.DataFrame({"q": list(qs), "est": ests})


# Count-min sketch (Cormode & Muthukrishnan 2005): d=4 double-hashed
# counter rows of w=2^15 int64 counters — 1 MiB per partial, elementwise
# ADD-mergeable (the frequency counterpart of HLL's max-merge). Point
# estimates NEVER underestimate (each counter only over-counts via
# collisions) and overestimate by more than e/w x N with probability
# <= e^-d per probe — both sides enforced by cms_accuracy_violations.
CMS_D = 4
CMS_W = 1 << 15
# fixed probe set: point queries a pipeline would ask of the sketch —
# drawn from the synthetic corpus's stable vocabulary plus absent
# tokens (est must be ~0), deterministic and corpus-INDEPENDENT in the
# sense that no exact top-k pass picks them (no circularity)
CMS_PROBES = ("join", "hash", "row", "batch", "scan", "filter",
              "the", "a", "data", "table", "stream", "window",
              "lorem", "notaword9")
# pd.util.hash_array keys are exactly 16 bytes
_CMS_KEYS = tuple(f"doonopcmshash{i:03d}" for i in range(CMS_D))


def _cms_positions(tokens: np.ndarray, w: int) -> np.ndarray:
    """(CMS_D, n) counter columns — one independent fixed-key 64-bit
    hash per row, reduced mod w (deterministic across processes)."""
    return np.stack([
        pd.util.hash_array(tokens, hash_key=k) % np.uint64(w)
        for k in _CMS_KEYS])


def cms_build(sf_dir: str, w: int = CMS_W, fanin: int = 8) -> np.ndarray:
    """Build the (CMS_D, w) count-min sketch of ALL document-token
    occurrences in one streaming pass: per-batch token counts via the
    C++ group_by (hash unique tokens once, weight by count), bincount
    into a local sketch, emit it as ONE binary blob row; blobs tree-add
    through a ``fanin`` repartition so the driver reads fanin blobs
    (d x w x 8 B each) regardless of corpus size."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        flat = pc.list_flatten(pc.split_pattern_regex(low, r"\W+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        cnt = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        toks = np.asarray(cnt["token"].to_pylist(), dtype=object)
        weights = cnt["count_all"].to_numpy().astype(np.int64)
        sk = np.zeros((CMS_D, w), dtype=np.int64)
        if len(toks):
            pos = _cms_positions(toks, w)
            for r in range(CMS_D):
                sk[r] += np.bincount(pos[r].astype(np.int64),
                                     weights=weights,
                                     minlength=w).astype(np.int64)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.large_binary())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros(CMS_D * w, dtype=np.int64)
        for blob in t["sk"]:
            acc += np.frombuffer(blob.as_py(), dtype=np.int64)
        return pa.table({"sk": pa.array([acc.tobytes()], pa.large_binary())})

    parts = (read(sf_dir, "documents", ["text"])
             .map_batches(partial, batch_format="pyarrow")
             .repartition(fanin)
             .map_batches(combine, batch_format="pyarrow", batch_size=None)
             .to_pandas())
    sk = np.zeros(CMS_D * w, dtype=np.int64)
    for blob in parts["sk"]:
        sk += np.frombuffer(blob, dtype=np.int64)
    return sk.reshape(CMS_D, w)


def cms_estimate(sk: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point estimates: min over the d counter rows per token."""
    pos = _cms_positions(np.asarray(tokens, dtype=object), sk.shape[1])
    return np.stack([sk[r, pos[r].astype(np.int64)]
                     for r in range(sk.shape[0])]).min(axis=0)


def cms_token_frequency(sf_dir: str,
                        tokens: tuple[str, ...] = CMS_PROBES,
                        w: int = CMS_W) -> pd.DataFrame:
    """Approximate corpus frequency of the probe tokens from ONE
    mergeable count-min pass (use when the vocabulary is too large /
    the stream too wide for an exact per-token groupby). Error bounds
    enforced by ``cms_accuracy_violations``."""
    sk = cms_build(sf_dir, w=w)
    probes = sorted(tokens)
    est = cms_estimate(sk, probes)
    return pd.DataFrame({"token": pd.Series(probes, dtype="str"),
                         "est": pd.Series(est, dtype="int64")})


def sorted_range_shards(sf_dir: str, shards: int = 8) -> pd.DataFrame:
    """Balanced RANGE partitioning of orders by (o_totalprice,
    o_orderkey) — the TeraSort partitioner shape: pick exact splitter
    keys at the NTILE(shards) rank boundaries, then assign every row
    its shard in one vectorized map. No global sort anywhere; this is
    the primitive a 100 TB sorted-output writer or range-pruned layout
    builds on.

    Exact NTILE semantics (the SQL oracle): with n rows, the first
    n % shards shards get one extra row; order is (price, orderkey).
    Splitters are found by the same distributed selection-by-binning as
    ``exact_quantiles`` (histogram partials -> candidate bins ->
    collect (price, key) pairs of only those bins), so ties in price
    resolve exactly by key. Returns per-shard (shard, n_rows,
    min_price, max_price).

    Scale shape: pass 1 = min/max/count aggregate; pass 2 = one
    histogram partial scan (+ one refine scan per extra 4096× data
    factor); pass 3 = candidate-bin collect (bounded by bin width);
    pass 4 = assignment + per-shard (count,min,max) partials, merged
    driver-side (O(shards)). Nothing corpus-sized leaves the workers.
    """
    import math

    from ray.data.aggregate import Count, Max, Min

    from .common import read, table_rows

    n = table_rows(sf_dir, "orders")
    empty = pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                          "n_rows": pd.Series([], dtype="int64"),
                          "min_price": pd.Series([], dtype="float64"),
                          "max_price": pd.Series([], dtype="float64")})
    if n == 0:
        return empty
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    g = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    gmin, gmax = float(g["min(o_totalprice)"]), float(g["max(o_totalprice)"])

    # 1-based start rank of each NON-EMPTY shard s >= 2 (NTILE sizing:
    # size = q + 1 for s <= r, q otherwise — when q == 0 only the first
    # r shards exist, so s must stop at r)
    q, r = divmod(n, shards)
    cut_ranks = [(s - 1) * q + min(s - 1, r) + 1
                 for s in range(2, shards + 1) if q or s <= r]

    nbins, collect_cap = 4096, 65536

    # Selection levels: chain[d] = (lo_d, width_d, chosen_bin_d). A
    # row's membership at the current depth is "its bin equals the
    # chosen bin at every level" — bin ids are clipped floors of a
    # monotone pure function of price, so the IDENTICAL arithmetic runs
    # in the histogram, collect, and bookkeeping passes (a value
    # compare against lo + b*width would disagree at float ulp edges
    # and shift ranks by one).
    chain: list[tuple[float, float, int]] = []

    def level_params() -> tuple[float, float]:
        if not chain:
            return gmin, max((gmax - gmin) / nbins, 5e-324)
        clo, cw, cb = chain[-1]
        return clo + cb * cw, max(cw / nbins, 5e-324)

    def select_and_bin(v: np.ndarray):
        m = np.ones(len(v), dtype=bool)
        for clo, cw, cb in chain:
            b = np.clip(((v - clo) / cw).astype(np.int64), 0, nbins - 1)
            m &= b == cb
        lo_cur, w_cur = level_params()
        bb = np.clip(((v - lo_cur) / w_cur).astype(np.int64), 0, nbins - 1)
        return m, bb

    def hist() -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            v = t["o_totalprice"].to_numpy(zero_copy_only=False)
            m, bb = select_and_bin(v)
            if not m.any():
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            counts = np.bincount(bb[m], minlength=nbins)
            nz = np.flatnonzero(counts)
            return pa.table({"bin": pa.array(nz, pa.int64()),
                             "cnt": pa.array(counts[nz], pa.int64())})

        from ray.data.aggregate import Sum

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
        dense = np.zeros(nbins, dtype=np.int64)
        if len(rows.columns) and len(rows):
            dense[rows["bin"].to_numpy()] = rows["cnt"].to_numpy()
        return dense

    if not cut_ranks:  # n == 1 or shards == 1: everything is shard 1
        bps_a = np.zeros(0, dtype=np.float64)
        bks_a = np.zeros(0, dtype=np.int64)
    else:
        below = 0  # rows whose bin precedes the selected chain
        dense = hist()
        cum = np.cumsum(dense)
        for _ in range(3):
            bins = [int(np.searchsorted(cum, rk - below))
                    for rk in cut_ranks]
            worst = max(dense[b] for b in set(bins))
            if worst <= collect_cap or len(set(bins)) > 1:
                break
            # every cut sits in ONE oversized bin: zoom into it
            b = bins[0]
            lo_cur, w_cur = level_params()
            below += int(cum[b - 1]) if b else 0
            chain.append((lo_cur, w_cur, b))
            dense = hist()
            cum = np.cumsum(dense)
            if int(dense.max()) >= worst:  # all-equal values: no split
                break
        cand_bins = sorted({int(np.searchsorted(cum, rk - below))
                            for rk in cut_ranks})

        def collect(t: pa.Table) -> pa.Table:
            v = t["o_totalprice"].to_numpy(zero_copy_only=False)
            k = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(
                zero_copy_only=False)
            m, bb = select_and_bin(v)
            m &= np.isin(bb, cand_bins)
            return pa.table({"p": pa.array(v[m], pa.float64()),
                             "k": pa.array(k[m], pa.int64()),
                             "b": pa.array(bb[m], pa.int64())})

        cand = ds.map_batches(collect, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
        cp = cand["p"].to_numpy() if len(cand.columns) else np.array([])
        ck = cand["k"].to_numpy() if len(cand.columns) else np.array([])
        cb = cand["b"].to_numpy() if len(cand.columns) else np.array([])
        # (bin, p, k) sort == (p, k) sort (binning is monotone in p and
        # equal prices share a bin); the earlier-bin offset is counted
        # by BIN id — the same partition the histogram used
        order = np.lexsort((ck, cp, cb))
        cp, ck, cb = cp[order], ck[order], cb[order]
        # exact splitter per cut rank: local index inside its candidate
        # bin
        bps, bks = [], []
        for rk in cut_ranks:
            b = int(np.searchsorted(cum, rk - below))
            before_bin = below + (int(cum[b - 1]) if b else 0)
            earlier = int(np.searchsorted(cb, b, side="left"))
            idx = earlier + (rk - before_bin) - 1
            bps.append(float(cp[idx]))
            bks.append(int(ck[idx]))
        bps_a = np.array(bps, dtype=np.float64)
        bks_a = np.array(bks, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        k = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        # shard = 1 + #{splitters <= (p, k)} (composite lexicographic)
        s = np.searchsorted(bps_a, v, side="left").astype(np.int64)
        for j in range(len(bps_a)):
            s += ((v == bps_a[j]) & (k >= bks_a[j])).astype(np.int64)
        shard = s + 1
        cnt = np.bincount(shard - 1, minlength=len(bps_a) + 1)
        mn = np.full(len(bps_a) + 1, np.inf)
        mx = np.full(len(bps_a) + 1, -np.inf)
        np.minimum.at(mn, shard - 1, v)
        np.maximum.at(mx, shard - 1, v)
        return pa.table({
            "shard": pa.array(np.arange(1, len(bps_a) + 2), pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "mn": pa.array(mn, pa.float64()),
            "mx": pa.array(mx, pa.float64()),
        })

    parts = ds.map_batches(assign, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    agg = parts.groupby("shard", as_index=False).agg(
        n_rows=("n", "sum"), min_price=("mn", "min"), max_price=("mx", "max"))
    agg = agg[agg["n_rows"] > 0]
    out = pd.DataFrame({
        "shard": agg["shard"].astype("int64"),
        "n_rows": agg["n_rows"].astype("int64"),
        "min_price": agg["min_price"].astype("float64"),
        "max_price": agg["max_price"].astype("float64"),
    })
    return finish(out, ["shard"])


def _group_value_stats(sf_dir: str):
    """One scan → per-event_type (min, max, n) of events.value; None on
    an empty corpus."""
    ds = read(sf_dir, "events", ["event_type", "value"])

    def gstats(t: pa.Table) -> pa.Table:
        return (pa.table({"g": t["event_type"], "value": t["value"]})
                .group_by("g", use_threads=False)
                .aggregate([("value", "min"), ("value", "max"),
                            ([], "count_all")]))

    parts = ds.map_batches(gstats, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return None
    return parts.groupby("g").agg(mn=("value_min", "min"),
                                  mx=("value_max", "max"),
                                  n=("count_all", "sum"))


def _grouped_rank_select(sf_dir: str, targets: dict, stats,
                         nbins: int = 4096,
                         collect_cap: int = 65536,
                         center: dict | None = None) -> dict:
    """Distributed multiplexed selection-by-binning: resolve, for every
    target ``key -> (group, rank)`` (1-based ascending rank within the
    group's events.value), the exact order statistic — ONE pruned scan
    per refinement round no matter how many (group, rank) targets are
    active (a per-target loop would rescan the corpus; grouped_apply
    would ship whole per-group columns to single tasks — wrong at
    10^11 rows / a handful of groups). Driver state is O(|targets|);
    partials are O(active ranges × nbins) counts per batch.

    ``center`` (optional, per-group float) switches the selected
    variable to the absolute deviation |value − center[g]| — the MAD
    transform — without a materialized derived column: the transform is
    applied inside each batch kernel, bounds derive from the group's
    own min/max."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "value"])
    if center is None:
        bounds = {g: (float(r["mn"]), float(r["mx"]))
                  for g, r in stats.iterrows()}
    else:
        bounds = {g: (0.0, max(center[g] - float(r["mn"]),
                               float(r["mx"]) - center[g]))
                  for g, r in stats.iterrows()}
    gmax_of = {g: hi for g, (lo, hi) in bounds.items()}

    def _gv(gcol, v, g):
        m = gcol == g
        vv = v[m]
        if center is not None:
            vv = np.abs(vv - center[g])
        return vv

    st: dict = {}
    for key, (g, rank) in targets.items():
        lo, hi = bounds[g]
        # a group whose WHOLE value set fits the collection cap skips
        # the histogram rounds: one collection scan resolves it (same
        # memory bound as an in-cap bin; at scale n_g > cap refines
        # as before)
        st[key] = {"g": g, "lo": lo, "hi": hi,
                   "r": int(rank), "val": None,
                   "collect": int(stats.loc[g, "n"]) <= collect_cap}

    def _hist_multi(ranges: list):
        def partial(t: pa.Table) -> pa.Table:
            gcol = t["event_type"].to_numpy(zero_copy_only=False)
            v = t["value"].to_numpy(zero_copy_only=False)
            bins_out, cnt_out = [], []
            for j, (g, lo, hi, last) in enumerate(ranges):
                width = (hi - lo) / nbins
                gv = _gv(gcol, v, g)
                vv = gv[(gv >= lo) & ((gv <= hi) if last else (gv < hi))]
                if not len(vv):
                    continue
                b = np.minimum(((vv - lo) / width).astype(np.int64),
                               nbins - 1)
                counts = np.bincount(b, minlength=nbins)
                nz = np.flatnonzero(counts)
                bins_out.append(nz + j * nbins)
                cnt_out.append(counts[nz])
            if not bins_out:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({
                "bin": pa.array(np.concatenate(bins_out), pa.int64()),
                "cnt": pa.array(np.concatenate(cnt_out), pa.int64())})

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
        dense = np.zeros((len(ranges), nbins), dtype=np.int64)
        if len(rows):
            b = rows["bin"].to_numpy()
            dense[b // nbins, b % nbins] = rows["cnt"].to_numpy()
        return dense

    for _ in range(8):
        act = [k for k, s in st.items()
               if s["val"] is None and not s["collect"]]
        for k in list(act):
            s = st[k]
            if s["hi"] <= s["lo"]:
                s["val"] = s["lo"]
                act.remove(k)
        if not act:
            break
        uniq: dict = {}
        for k in act:
            uniq.setdefault(
                (st[k]["g"], st[k]["lo"], st[k]["hi"]), []).append(k)
        keys = list(uniq)
        dense = _hist_multi(
            [(g, lo, hi, hi >= gmax_of[g]) for g, lo, hi in keys])
        for j, (g, lo, hi) in enumerate(keys):
            width = (hi - lo) / nbins
            cum = np.cumsum(dense[j])
            for k in uniq[(g, lo, hi)]:
                s = st[k]
                b = int(np.searchsorted(cum, s["r"]))
                in_bin = int(dense[j][b])
                s["r"] -= int(cum[b - 1]) if b else 0
                s["lo"] = lo + b * width
                s["hi"] = hi if b == nbins - 1 else lo + (b + 1) * width
                if in_bin <= collect_cap:
                    s["collect"] = True

    need = [k for k, s in st.items() if s["val"] is None]
    if need:
        uniq = {}
        for k in need:
            s = st[k]
            if s["hi"] <= s["lo"]:
                s["val"] = s["lo"]
            else:
                uniq.setdefault((s["g"], s["lo"], s["hi"]), []).append(k)
        if uniq:
            keys = list(uniq)
            ranges = [(g, lo, hi, hi >= gmax_of[g]) for g, lo, hi in keys]

            def keep(t: pa.Table) -> pa.Table:
                gcol = t["event_type"].to_numpy(zero_copy_only=False)
                v = t["value"].to_numpy(zero_copy_only=False)
                out_j, out_v = [], []
                for j, (g, lo, hi, last) in enumerate(ranges):
                    gv = _gv(gcol, v, g)
                    vv = gv[(gv >= lo)
                            & ((gv <= hi) if last else (gv < hi))]
                    if len(vv):
                        out_j.append(np.full(len(vv), j, dtype=np.int64))
                        out_v.append(vv)
                if not out_j:
                    return pa.table({"j": pa.array([], pa.int64()),
                                     "value": pa.array([], pa.float64())})
                return pa.table({
                    "j": pa.array(np.concatenate(out_j), pa.int64()),
                    "value": pa.array(
                        np.concatenate(out_v).astype(np.float64),
                        pa.float64())})

            df = ds.map_batches(keep, batch_format="pyarrow",
                                batch_size=65536).to_pandas()
            js = df["j"].to_numpy()
            vs = df["value"].to_numpy()
            for j, key in enumerate(keys):
                vals = np.sort(vs[js == j])
                for k in uniq[key]:
                    st[k]["val"] = float(vals[st[k]["r"] - 1])

    return {k: s["val"] for k, s in st.items()}


def events_type_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9),
                          nbins: int = 4096,
                          collect_cap: int = 65536) -> pd.DataFrame:
    """EXACT per-group quantiles (events.value per event_type) — the
    grouped twin of ``exact_quantiles``: distributed
    selection-by-binning with the refinement targets multiplexed over
    (group, q) pairs so every round is still ONE pruned scan no matter
    how many groups refine (see ``_grouped_rank_select``).

    Rank definition matches ``exact_quantiles`` and the SQL oracle:
    value at 1-based rank ceil(q * n_g) of the group's ascending
    sort."""
    import math

    stats = _group_value_stats(sf_dir)
    if stats is None:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="str"),
            "q": pd.Series([], dtype="float64"),
            "value": pd.Series([], dtype="float64")})
    targets = {(g, q): (g, int(math.ceil(q * int(stats.loc[g, "n"]))))
               for g in stats.index for q in qs}
    vals = _grouped_rank_select(sf_dir, targets, stats, nbins,
                                collect_cap)
    out = pd.DataFrame(
        [(g, float(q), vals[(g, q)])
         for g in stats.index for q in qs],
        columns=["event_type", "q", "value"])
    return finish(out, ["event_type", "q"])


def events_percentiles_cont(sf_dir: str,
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                            nbins: int = 4096,
                            collect_cap: int = 65536) -> pd.DataFrame:
    """Interpolated per-group percentiles — SQL PERCENTILE_CONT
    semantics (h = q·(n−1); linear interpolation between the order
    statistics at ranks ⌊h⌋+1 and ⌊h⌋+2), sharing the same multiplexed
    distributed selection as ``events_type_quantiles``: BOTH bracketing
    ranks of every (group, q) ride one target set, so the whole result
    still costs one pruned scan per refinement round."""
    import math

    stats = _group_value_stats(sf_dir)
    if stats is None:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="str"),
            "q": pd.Series([], dtype="float64"),
            "value": pd.Series([], dtype="float64")})
    targets: dict = {}
    plan: dict = {}
    for g in stats.index:
        n = int(stats.loc[g, "n"])
        for q in qs:
            h = q * (n - 1)
            k1 = int(math.floor(h)) + 1
            frac = h - math.floor(h)
            plan[(g, q)] = (k1, frac)
            targets[(g, q, 1)] = (g, k1)
            if frac > 0.0 and k1 < n:
                targets[(g, q, 2)] = (g, k1 + 1)
    vals = _grouped_rank_select(sf_dir, targets, stats, nbins,
                                collect_cap)
    rows = []
    for g in stats.index:
        for q in qs:
            k1, frac = plan[(g, q)]
            v1 = vals[(g, q, 1)]
            v2 = vals.get((g, q, 2), v1)
            rows.append((g, float(q), float(r4(v1 + frac * (v2 - v1)))))
    out = pd.DataFrame(rows, columns=["event_type", "q", "value"])
    return finish(out, ["event_type", "q"])


def events_value_mad(sf_dir: str, nbins: int = 4096,
                     collect_cap: int = 65536) -> pd.DataFrame:
    """Robust per-group statistics: interpolated median and median
    absolute deviation (MAD) of events.value per event_type — the
    outlier-resistant twin of mean/stddev. Two chained distributed
    selections: pass 1 resolves each group's PERCENTILE_CONT median;
    pass 2 selects the median of |value − median| via the selection
    core's batch-side ``center`` transform, so the deviation column is
    never materialized and both passes stay one-pruned-scan-per-round
    regardless of group count."""
    import math

    stats = _group_value_stats(sf_dir)
    if stats is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype="str"),
                             "med": pd.Series([], dtype="float64"),
                             "mad": pd.Series([], dtype="float64")})

    def cont_targets(tag: str):
        t: dict = {}
        plan: dict = {}
        for g in stats.index:
            n = int(stats.loc[g, "n"])
            h = 0.5 * (n - 1)
            k1 = int(math.floor(h)) + 1
            frac = h - math.floor(h)
            plan[g] = (k1, frac)
            t[(g, tag, 1)] = (g, k1)
            if frac > 0.0 and k1 < n:
                t[(g, tag, 2)] = (g, k1 + 1)
        return t, plan

    t1, plan1 = cont_targets("med")
    v1 = _grouped_rank_select(sf_dir, t1, stats, nbins, collect_cap)
    med = {}
    for g in stats.index:
        _, frac = plan1[g]
        a = v1[(g, "med", 1)]
        b = v1.get((g, "med", 2), a)
        med[g] = a + frac * (b - a)

    t2, plan2 = cont_targets("mad")
    v2 = _grouped_rank_select(sf_dir, t2, stats, nbins, collect_cap,
                              center=med)
    rows = []
    for g in stats.index:
        _, frac = plan2[g]
        a = v2[(g, "mad", 1)]
        b = v2.get((g, "mad", 2), a)
        rows.append((g, float(r4(med[g])),
                     float(r4(a + frac * (b - a)))))
    out = pd.DataFrame(rows, columns=["event_type", "med", "mad"])
    return finish(out, ["event_type"])
