"""Empty-input robustness sweep: run EVERY queries() entry against a
world of zero-row tables (identical schemas to the driver testdata) and
report crashes. Empty corpora are what a resumable 100 TB pipeline sees
on its first shard and after an all-filtered partition — no operator may
crash on them. Compare against the DuckDB oracle where one exists (both
sides must produce the same empty/near-empty result).

Usage: PYTHONPATH=/root/repo python tools/empty_world_sweep.py [names...]
Owns its Ray session (standalone tool, not the driver path).
"""

import os
import sys
import tempfile
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SRC = "/root/testdata/sf0.001"


def build_empty_world() -> str:
    out = tempfile.mkdtemp(prefix="empty_world_")
    for f in sorted(os.listdir(SRC)):
        schema = pq.read_schema(os.path.join(SRC, f)).remove_metadata()
        pq.write_table(schema.empty_table(), os.path.join(out, f))
    return out


def main() -> int:
    import warnings

    import duckdb
    import ray

    from selfcheck import compare, to_pandas

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    sf_dir = build_empty_world()
    con = duckdb.connect()
    for f in sorted(os.listdir(sf_dir)):
        t = f.removesuffix(".parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{f}'")

    qs, sql = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    failures = []
    for name in names:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                df = to_pandas(qs[name](sf_dir))
            status = f"{len(df)} rows"
            if name in sql:
                oracle = con.sql(sql[name]).df()
                err = compare(df, oracle)
                if err is not None:
                    failures.append((name, f"oracle mismatch: {err}"))
                    print(f"MISMATCH {name}: {status}  ({err})", flush=True)
                    continue
                status += "  == oracle"
            print(f"ok   {name}: {status}", flush=True)
        except Exception:
            failures.append((name, traceback.format_exc().strip()
                             .splitlines()[-1]))
            print(f"FAIL {name}: "
                  f"{traceback.format_exc().strip().splitlines()[-1]}",
                  flush=True)
    print(f"\nFAILURES: {len(failures)}")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
