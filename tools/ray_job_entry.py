"""Cluster job entrypoint — the north_rule's `ray job submit` surface.

On a real fixed-size multi-node cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/ray_job_entry.py --sf-dir /mnt/shared/world \
            --out /mnt/shared/artifacts --pipeline crawl

The script NEVER starts its own cluster when attached: inside a Ray
job (``RAY_JOB_ID`` set by the supervisor) or when ``RAY_ADDRESS``
points at a live cluster, ``ray.init(address="auto")`` attaches.
Otherwise (local smoke run, this sandbox, where RAY_ADDRESS=local) it
falls back to a fresh local session so the same file is testable
end-to-end. Paths are plain-filesystem (node-local or shared NFS);
object-store URIs would need an fsspec-backed storage layer this
sandbox cannot exercise.

Pipelines:
  crawl   — flagship bulk-frontier crawl; writes the per-shard
            validated-artifact parquet under --out (deterministic
            chunk-level part names, so a mid-run task retry overwrites
            rather than duplicates; a full RERUN with the same --out
            starts clean — use the CLI's --checkpoint/--resume surface
            for kill-resume) plus a one-row metrics parquet
            (visited/validated/sec).
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
        addr = os.environ.get("RAY_ADDRESS", "")
        if os.environ.get("RAY_JOB_ID") or (addr and addr != "local"):
            # submitted via `ray job submit`, or RAY_ADDRESS points at a
            # live cluster: attach, never boot a private one
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

        out_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
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
