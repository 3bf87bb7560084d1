"""Generic table sources: read a documents/events-style table from
parquet, JSONL or CSV through Ray Data with format sniffing — the
"another source format" path for corpora that arrive as line-delimited
exports rather than parquet (the reference's own inputs are formatless
seed lists, cfg.rs:185-198; the rebuild's operator suite is
table-driven, so this seam is where external formats enter).

All readers return a Dataset of the same Arrow schema so every
operator downstream is format-agnostic; schema divergence (JSON/CSV
type inference) is normalized by casting to a reference schema when
one is supplied.
"""

from __future__ import annotations

import os


def sniff_format(path: str) -> str:
    """Format by extension, falling back to content sniffing for
    extensionless paths: parquet magic 'PAR1', else '{'-led → jsonl,
    else csv."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        return "parquet"
    if ext in (".jsonl", ".json", ".ndjson"):
        return "jsonl"
    if ext in (".csv", ".tsv"):
        return "csv"
    with open(path, "rb") as fh:
        head = fh.read(4)
    if head == b"PAR1":
        return "parquet"
    if head[:1] == b"{":
        return "jsonl"
    return "csv"


def read_table_auto(path: str, columns: list[str] | None = None,
                    schema=None):
    """Ray Data read of ``path`` in whatever format it is.

    ``schema`` (a pyarrow.Schema) normalizes inferred JSON/CSV types to
    the reference parquet schema (e.g. CSV int columns that inferred as
    int64 when the parquet uses int32) via one vectorized cast per
    batch; ``columns`` prunes at the read where the format supports it
    (parquet) or right after (jsonl/csv).

    Timestamp caveat: export timestamps as ISO-8601 STRINGS (both
    readers parse those correctly). An epoch-integer column cast to
    timestamp would be interpreted in the TARGET unit — silently wrong
    by the unit ratio — so no implicit epoch handling is attempted.
    """
    import pyarrow as pa
    import ray.data as rd

    fmt = sniff_format(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "jsonl":
        ds = rd.read_json(path)
    else:
        ds = rd.read_csv(path)

    if columns or schema is not None:
        target = None
        if schema is not None:
            cols = columns or schema.names
            target = pa.schema([schema.field(c) for c in cols])

        def project(t: pa.Table) -> pa.Table:
            if columns:
                t = t.select(columns)
            if target is not None:
                t = t.cast(target)
            return t

        ds = ds.map_batches(project, batch_format="pyarrow")
    return ds
