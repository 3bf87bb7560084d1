"""Streaming-window operators: stateful key-sharded actors fed a
time-ordered micro-batch stream.

Ray Data has no native event-time streaming; the reference engine has
none either. This module supplies the missing operator class the
training-data brief asks for: a STREAMING window whose state lives in a
pool of key-hash-sharded actors — the same pattern as the crawler's
frontier/seen shards — while the data plane stays a Dataset (global
time-order sort, then ordered micro-batches).

Shape:
1. ``events.sort(ts)`` — one all-to-all; after it the driver's
   ``iter_batches`` yields globally time-ordered micro-batches (the
   stand-in for a live stream's arrival order);
2. each micro-batch hash-partitions by user to the session actors
   (every user's events visit ONE actor, in time order — actor message
   order from a single caller is FIFO);
3. actors fold events into open sessions, closing a session when the
   gap exceeds the threshold; ``finish()`` flushes the still-open ones.

The driver is the single stream pump here; at 10^10 events the pump
shards by time-range partition (one pump per disjoint time range whose
key spaces are merged at the end) — the actor protocol is unchanged.

Semantics match the batch `user_sessions` query exactly, so the same
DuckDB LAG-gap oracle hash-checks this operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import finish, read


class SessionShard:
    """Per-shard session state: user -> (last_ts, n_events, n_sessions).
    Decorate with ray.remote at the use site (module stays importable
    without a Ray session)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        self.state: dict[int, list] = {}

    def ingest(self, users: list[int], ts_us: list[int]) -> int:
        st = self.state
        gap = self.gap_us
        for u, t in zip(users, ts_us):
            s = st.get(u)
            if s is None:
                st[u] = [t, 1, 1]
            else:
                if t - s[0] > gap:
                    s[2] += 1
                s[0] = t
                s[1] += 1
        return len(users)

    def finish(self) -> dict:
        return {
            "user_id": list(self.state.keys()),
            "n_events": [s[1] for s in self.state.values()],
            "n_sessions": [s[2] for s in self.state.values()],
        }


def streaming_user_sessions(sf_dir: str, gap_minutes: int = 30,
                            num_shards: int = 4,
                            batch_rows: int = 4096) -> pd.DataFrame:
    """Sessionization as a STREAM: time-ordered micro-batches folded
    into key-sharded session actors (see module docstring). Returns
    (user_id, n_sessions, n_events) — hash-checked against the same
    DuckDB oracle as the batch ``user_sessions``."""
    import ray

    shard_cls = ray.remote(SessionShard)
    gap_us = gap_minutes * 60 * 1_000_000
    shards = [shard_cls.remote(gap_us) for _ in range(num_shards)]

    ds = read(sf_dir, "events", ["user_id", "ts"]).sort("ts")
    pending: list = []
    for batch in ds.iter_batches(batch_size=batch_rows,
                                 batch_format="pyarrow"):
        users = np.asarray(batch.column("user_id").to_pylist(),
                           dtype=np.int64)
        ts_us = batch.column("ts").cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        shard_of = users % num_shards
        for sid in range(num_shards):
            m = shard_of == sid
            if m.any():
                pending.append(shards[sid].ingest.remote(
                    users[m].tolist(), ts_us[m].tolist()))
        if len(pending) >= 4 * num_shards:
            # bounded in-flight ingest: FIFO per actor keeps per-user
            # time order; the wait only applies backpressure
            ray.get(pending)
            pending = []
    ray.get(pending)

    parts = ray.get([s.finish.remote() for s in shards])
    out = pd.concat([pd.DataFrame(p) for p in parts], ignore_index=True)
    out = out.astype({"user_id": "int64", "n_events": "int64",
                      "n_sessions": "int64"})
    return finish(out[["user_id", "n_sessions", "n_events"]], ["user_id"])
