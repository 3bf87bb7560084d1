"""Table storage layer — Lance layout with Parquet fallback.

The north_star stores image+caption tables in Lance at 10^10-frontier
scale. The ``lance`` package is not installed in this sandbox, so this
module is the single seam: ``write_table``/``read_table``/``scan`` use
Lance when importable and fall back to Parquet otherwise, preserving
the identical Arrow schema either way. Everything else in the repo goes
through arrow tables, so flipping the backend is transparent.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def dataset_path(base: str, name: str) -> str:
    ext = "lance" if HAVE_LANCE else "parquet"
    return os.path.join(base, f"{name}.{ext}")


def write_table(table: pa.Table, path: str) -> str:
    """Write an Arrow table; returns the path actually written."""
    if HAVE_LANCE and path.endswith(".lance"):
        lance.write_dataset(table, path, mode="overwrite")
        return path
    if path.endswith(".lance"):
        path = path[: -len(".lance")] + ".parquet"
    pq.write_table(table, path)
    return path


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    if HAVE_LANCE and path.endswith(".lance"):
        return lance.dataset(path).to_table(columns=columns)
    if path.endswith(".lance") and not os.path.exists(path):
        path = path[: -len(".lance")] + ".parquet"
    return pq.read_table(path, columns=columns)


def ray_read(path: str, columns: list[str] | None = None):
    """ray.data reader for the stored layout (read_lance when present)."""
    import ray.data as rd

    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)
