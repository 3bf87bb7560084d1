"""Cluster job entrypoint — the north_rule's `ray job submit` surface.

On a real fixed-size multi-node cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/ray_job_entry.py --sf-dir s3://bucket/world \
            --out s3://bucket/artifacts --pipeline crawl

The script NEVER starts its own cluster when submitted: inside a Ray
job, ``RAY_ADDRESS`` is set by the job supervisor and ``ray.init
(address="auto")`` attaches to the running cluster. Outside a job
(local smoke run, this sandbox) it falls back to a local session so
the same file is testable end-to-end.

Pipelines:
  crawl   — flagship bulk-frontier crawl; writes the per-shard
            validated-artifact parquet under --out (resumable layout:
            deterministic part names, finished parts skipped on rerun)
            plus a one-row metrics parquet (visited/validated/sec).
  query   — any ``__ray_entry__.queries()`` entry by --name; result
            parquet under --out.

Exit code 0 on success; metrics echoed as one JSON line on stdout so
`ray job logs` / the submitting CI can scrape it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline", choices=["crawl", "query"],
                    default="crawl")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="world/testdata directory (local or object store)")
    ap.add_argument("--out", required=True,
                    help="output directory for artifacts + metrics")
    ap.add_argument("--name", default="q1_pricing_summary",
                    help="queries() key when --pipeline=query")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="LOCAL fallback only; ignored on a cluster")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_JOB_ID"):
            # submitted via `ray job submit`: attach to the cluster
            ray.init(address="auto")
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.makedirs(args.out, exist_ok=True)
    t0 = time.monotonic()
    if args.pipeline == "crawl":
        from doonop_ray.pipelines.flagship import flagship_crawl

        df = flagship_crawl(args.sf_dir, bulk_seed=True,
                            out_dir=os.path.join(args.out, "artifacts"))
        sec = time.monotonic() - t0
        ok = df[df["status"] == "ok"]
        metrics = {
            "pipeline": "crawl",
            "visited": int(len(df)),
            "validated": int((ok["caption_ok"] & ok["pixel_ok"]).sum()),
            "sec": round(sec, 3),
            "pages_per_sec": round(len(df) / sec, 1),
        }
    else:
        import __ray_entry__ as e

        res = e.queries()[args.name](args.sf_dir)
        sec = time.monotonic() - t0
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, pd.DataFrame):
            out_df = res
        elif isinstance(res, pa.Table):
            out_df = res.to_pandas()
        else:
            out_df = res.to_pandas()
        out_df.to_parquet(os.path.join(args.out, f"{args.name}.parquet"))
        metrics = {"pipeline": "query", "name": args.name,
                   "rows": int(len(out_df)), "sec": round(sec, 3)}

    import pandas as pd

    pd.DataFrame([metrics]).to_parquet(
        os.path.join(args.out, "metrics.parquet"))
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
