"""Probe-gated scaling campaign: loop `machine_ceiling` probes and fire
ONE full `bench.py --scaling` run (standard bracketed protocol,
untouched) the moment the host shows a qualifying parallel-capacity
window. Evidence either way: a qualifying run if the window holds, or
a timestamped probe log proving no qualifying window occurred.

Usage:
  python tools/probe_gate_campaign.py [--gate 0.78] [--max-minutes 120]
        [--world scaleh] [--interval 150]

Writes one JSON line per probe and the final scaling JSON (if fired)
to stdout; exits 0 after firing once or when the time budget ends.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=0.78)
    ap.add_argument("--max-minutes", type=float, default=120.0)
    ap.add_argument("--world", default="scaleh")
    ap.add_argument("--interval", type=float, default=150.0,
                    help="seconds between probes (plus probe cost)")
    args = ap.parse_args()

    from machine_ceiling import probe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t_end = time.monotonic() + args.max_minutes * 60.0
    n = 0
    while time.monotonic() < t_end:
        n += 1
        p = probe(reps=3, small=8, large=32)
        print(json.dumps({"probe": n, "ts": time.time(),
                          "ceiling": p["ceiling"]}), flush=True)
        if p["ceiling"] >= args.gate:
            print(json.dumps({"fired_at": p["ceiling"]}), flush=True)
            env = dict(os.environ, GRAFT_SCALING_WORLD=args.world)
            out = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py"),
                 "--scaling"],
                env=env, capture_output=True, text=True,
            )
            print(out.stdout.strip().splitlines()[-1] if out.stdout
                  else json.dumps({"error": out.stderr[-500:]}),
                  flush=True)
            return
        time.sleep(args.interval)
    print(json.dumps({"campaign": "no qualifying window",
                      "probes": n, "gate": args.gate}), flush=True)


if __name__ == "__main__":
    main()
