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

from .common import grouped_apply


def connected_components(nodes_ds, edges_ds, max_iters: int = 50):
    """(node:int64) + (a:int64, b:int64) datasets → (node, component)
    Dataset, component = min node id reachable. Nodes absent from every
    edge keep themselves as component."""

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
