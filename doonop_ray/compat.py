"""Compatibility shims for Ray Data 2.49's empty-block schema loss.

Zero-row inputs are routine at 100 TB scale — an all-filtered
partition, a resumed run's first empty shard, an empty ingest batch —
but stock Ray Data 2.49 loses the schema whenever every block of a
Dataset is empty, which turns those runs into ``KeyError`` crashes
instead of typed empty results. Three distinct mechanisms, each
verified by tools/empty_world_sweep.py (every queries() entry over a
world of zero-row tables):

1. ``BlocksToBatchesMapTransformFn`` collapses an all-empty input to
   ``BlockAccessor.for_block(first).builder().build()`` — an empty
   block with the right FORMAT but a fresh builder's EMPTY SCHEMA, so
   the input schema dies at the first map stage.
2. The ``map_batches`` UDF wrapper deliberately skips the user fn for
   empty batches (an upstream workaround for schema-less all-to-all
   output blocks) and passes the input batch through — so even with a
   typed empty batch the OUTPUT schema of the stage is never
   established.
3. ``Dataset.to_pandas()`` is built on ``iter_batches()``, which
   silently skips empty blocks — a zero-row result comes back as a
   columnless ``pd.DataFrame()``.

``install()`` patches each in the narrowest possible way; every
non-empty code path is byte-identical to stock Ray. It runs on the
driver at ``doonop_ray.ops.common`` import (before any plan is built)
and — because every operator's batch closures live in doonop modules —
re-runs inside each Ray worker when the UDF deserializes, so the
class-level patch (1) is in place before any map task iterates.
Idempotent; pinned to the Ray 2.49 internals present in this
environment (guarded imports — on a future Ray without these symbols
the shim degrades to the ``to_pandas`` wrapper alone).
"""

from __future__ import annotations

import collections.abc
from types import GeneratorType

import pyarrow as pa

_INSTALLED = False


def _batch_columns(b) -> int:
    import pandas as pd

    if isinstance(b, pa.Table):
        return b.num_columns
    if isinstance(b, pd.DataFrame):
        return b.shape[1]
    return 0


def _make_schema_keeping_cls():
    """Subclass of ``BlocksToBatchesMapTransformFn`` whose all-empty
    fallback keeps the first block's schema (``slice(0, 0)`` instead of
    a fresh builder's schema-less build). Substituted at the single
    construction site in ``plan_udf_map_op`` — instances pickle BY
    REFERENCE to this module, so Ray workers run the fixed ``__call__``
    without any worker-side installation step (batch closures pickle by
    value and never import this package on the worker)."""
    import itertools

    from ray.data._internal.block_batching.block_batching import (
        batch_blocks,
    )
    from ray.data._internal.execution.operators import map_transformer as mt
    from ray.data.block import BlockAccessor

    class SchemaKeepingBlocksToBatches(mt.BlocksToBatchesMapTransformFn):
        def __call__(self, blocks, _):
            block_iter = iter(blocks)
            first = next(block_iter, None)
            if first is None:
                return []
            blocks = itertools.chain([first], block_iter)
            # stock ray: BlockAccessor.for_block(first).builder().build()
            # (right format, EMPTY schema); slice keeps the columns
            empty_block = BlockAccessor.for_block(first).slice(0, 0, True)
            first = None
            formatted_batch_iter = batch_blocks(
                blocks=blocks, stats=None, batch_size=self._batch_size,
                batch_format=self._batch_format,
                ensure_copy=self._ensure_copy)
            first = next(formatted_batch_iter, None)
            if first is None:
                return [empty_block]
            return itertools.chain([first], formatted_batch_iter)

    return SchemaKeepingBlocksToBatches


try:
    SchemaKeepingBlocksToBatches = _make_schema_keeping_cls()
except Exception:  # future-ray guard: degrade to the to_pandas wrapper
    SchemaKeepingBlocksToBatches = None


def _patch_blocks_to_batches() -> None:
    """(1) Swap the construction site to the schema-keeping subclass."""
    if SchemaKeepingBlocksToBatches is None:
        return
    from ray.data._internal.planner import plan_udf_map_op as pm

    pm.BlocksToBatchesMapTransformFn = SchemaKeepingBlocksToBatches


def _patch_map_batches_empty_udf() -> None:
    """(2) Run the user fn on TYPED empty batches so the stage's output
    schema is established (falling back to stock passthrough if the fn
    cannot handle zero rows). Schema-less empty batches keep the stock
    passthrough — they are the case the upstream skip exists for."""
    from ray.data._internal.planner import plan_udf_map_op as pm
    from ray.data.block import BlockAccessor

    if getattr(pm._generate_transform_fn_for_map_batches,
               "_doonop_keep_schema", False):
        return
    orig_gen = pm._generate_transform_fn_for_map_batches

    def gen(fn):
        inner = orig_gen(fn)
        if pm._is_async_udf(fn):
            return inner

        def transform_fn(batches, ctx):
            for b in batches:
                if (not isinstance(b, collections.abc.Mapping)
                        and _batch_columns(b) > 0
                        and BlockAccessor.for_block(b).num_rows() == 0):
                    try:
                        res = fn(b)
                        if isinstance(res, GeneratorType):
                            res = list(res)
                        else:
                            res = [res]
                        for ob in res:
                            pm._validate_batch_output(ob)
                    except Exception:
                        res = [b]  # stock behavior: pass through
                    yield from res
                else:
                    yield from inner([b], ctx)

        return transform_fn

    gen._doonop_keep_schema = True
    pm._generate_transform_fn_for_map_batches = gen


def install() -> None:
    global _INSTALLED
    if _INSTALLED:
        return
    try:
        _patch_blocks_to_batches()
        _patch_map_batches_empty_udf()
    except Exception:  # future-ray guard: degrade to the wrapper below
        pass
    from ray.data import Dataset

    orig = Dataset.to_pandas
    if getattr(orig, "_doonop_keep_schema", False):  # re-import race
        _INSTALLED = True
        return

    def to_pandas(self, limit=None):
        df = orig(self, limit)
        if df.shape[1] > 0:
            return df
        # cached-schema path first: schema(fetch_if_missing=False) costs
        # nothing and avoids re-executing the (already consumed) plan
        try:
            sch = self.schema(fetch_if_missing=False)
            base = getattr(sch, "base_schema", None)
            if isinstance(base, pa.Schema) and len(base.names):
                return base.empty_table().to_pandas()
        except Exception:
            pass
        try:
            import ray

            parts = [t for t in ray.get(self.to_arrow_refs())
                     if isinstance(t, pa.Table) and t.num_columns > 0]
            if not parts:
                return df
            return pa.concat_tables(parts).to_pandas()
        except Exception:
            return df

    to_pandas._doonop_keep_schema = True
    to_pandas.__doc__ = (orig.__doc__ or "") + (
        "\n\n    Patched by doonop_ray.compat: preserves the schema of "
        "all-empty results\n    (stock iter_batches skips empty blocks, "
        "dropping every column)."
    )
    Dataset.to_pandas = to_pandas
    _INSTALLED = True
